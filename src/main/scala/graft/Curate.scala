package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation CLI — the LLM-pipeline
  * counterpart of [[Migrate]]: where Migrate drives the reference's
  * schema+data migration surface, Curate composes the beyond-reference
  * corpus operators into the program a pretraining data team actually
  * runs:
  *
  *   read corpus → exact dedup → near-dup clusters (SimHash + connected
  *   components) → quality gate → leakage-free split → per-split
  *   sequence packing → curated parquet + manifest + summary.
  *
  * Usage: runMain graft.Curate <sfDir> <outDir> [minTokens]
  *        runMain graft.Curate <batchDir> <outDir> <minTokens> <baseDir>
  *
  * The 4-arg form is the INCREMENTAL mode: curate a new batch against a
  * previous run's output (baseDir). The base corpus always wins — a
  * batch doc identical to (dup_of_base) or SimHash-near (near_dup_base)
  * any base doc is dropped before the batch-local rules run. The probe
  * joins only the batch's digests/fingerprints against the maintained
  * `index.parquet` (doc_id, digest, fp, split of every kept doc) — the
  * base corpus TEXT is never re-read, which is what makes daily
  * ingestion O(batch) instead of O(corpus).
  *
  * Verdict rules (first applicable reason wins, so per-doc verdicts are
  * a partition and the summary's counts reconcile exactly):
  *   dup_of_base   batch doc's digest already in the base index
  *   near_dup_base batch doc's fp within hamming 2 of a base fp
  *   exact_dup     not the min doc_id of its (batch) md5(text) group
  *   near_dup      c01 cluster verdict keep=0 (non-canonical member)
  *   low_quality   fewer than minTokens whitespace tokens (default 5)
  *   kept          everything else; assigned a split by md5 of its
  *                 dup-cluster id (c12 rule: near-dups never straddle
  *                 splits, singletons hash their own id)
  *
  * Artifacts written to outDir:
  *   curated.parquet   kept docs (doc_id, text, lang, source, split),
  *                     partitioned by split
  *   verdicts.parquet  every doc's (doc_id, verdict, split)
  *   packing.parquet   per (split, shard, seq) L=512 packing manifest
  *                     over kept docs (c09 semantics, shard-local)
  *   index.parquet     corpus index for future incremental runs —
  *                     base index ∪ this run's kept docs
  *   summary.json      one JSON object: totals per verdict + split
  *
  * doc_id is the corpus-wide identity: incremental batches must carry
  * ids disjoint from the base corpus (as any append-log does).
  *
  * 100 TB shape: every stage is doc-parallel — the digest groupBy
  * shuffles 16-byte digests, the cluster pipeline is c01's contracted
  * CC, the incremental probes are id+digest/fp joins against the index
  * (never corpus text), split assignment is a per-row md5 plus one
  * doc-keyed left join, and packing windows are (split, shard)-local so
  * the corpus packs as thousands of independent sorts. Nothing collects
  * to the driver but the summary counts.
  */
object Curate {

  final case class Result(counts: Map[String, Long], splits: Map[String, Long])

  private val toks = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"

  /** Fresh full-corpus curation. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      minTokens: Int = 5): Result =
    curate(spark, queries.QueryDef.spread(spark, sfDir, "documents"),
      baseIndex = None, outDir, minTokens)

  /** Incremental curation of a new batch against a prior run's outDir. */
  def runIncremental(spark: SparkSession, batchDir: String, baseDir: String,
      outDir: String, minTokens: Int = 5): Result =
    curate(spark, queries.QueryDef.spread(spark, batchDir, "documents"),
      baseIndex = Some(spark.read.parquet(s"$baseDir/index.parquet")),
      outDir, minTokens)

  private def curate(spark: SparkSession, docs: DataFrame,
      baseIndex: Option[DataFrame], outDir: String, minTokens: Int): Result = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val digests = docs.select(col("doc_id"), md5(col("text")).as("digest"))

    // exact-dup losers: every doc_id of a digest group except the min.
    // Shaped as digest-frame + groupBy + join back (16-byte shuffle
    // rows, no per-group array — a degenerate million-copy group stays
    // O(1) per row)
    val exactLosers = digests
      .join(digests.groupBy("digest").agg(min("doc_id").as("keep_id")),
        Seq("digest"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit("exact_dup").as("v_exact"))

    // fingerprints are consumed by the cluster pipeline, the index
    // artifact, and (incrementally) the base probe — one persist
    val fps = queries.TextMedia.simhashFingerprintsOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // base-corpus verdicts (incremental mode only): digest probe +
    // banded fp probe against the index, priority to the exact match
    val baseVerdicts: Option[DataFrame] = baseIndex.map { base =>
      val b = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dupOfBase = digests
        .join(b.select("digest").distinct(), Seq("digest"))
        .select(col("doc_id"), lit(0).as("pri"))
      val baseBands = queries.TextMedia
        .fpBands(b.filter(col("fp").isNotNull)
          .select(col("doc_id").as("base_id"), col("fp")), "base_id")
        .select(col("fp").as("fp_b"), col("bi").as("bi2"), col("bv").as("bv2"))
      val nearBase = queries.TextMedia.fpBands(fps, "doc_id")
        .join(baseBands,
          col("bi") === col("bi2") && col("bv") === col("bv2") &&
            expr("bit_count(fp ^ fp_b)") <= 2)
        .select(col("doc_id"), lit(1).as("pri"))
      queries.QueryDef.deferCleanup(() => { b.unpersist(false); () })
      dupOfBase.union(nearBase)
        .groupBy("doc_id").agg(min("pri").as("pri"))
        .select(col("doc_id"),
          when(col("pri") === 0, lit("dup_of_base"))
            .otherwise(lit("near_dup_base")).as("v_base"))
    }

    // near-dup cluster verdicts over THIS corpus (persisted +
    // materialized inside dupClustersOf)
    val clusters = queries.TextMedia.dupClustersOf(fps)

    val joined = docs
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        expr(s"cast(size($toks) as bigint)").as("n_tok"))
      .join(exactLosers, Seq("doc_id"), "left")
      .join(clusters.select(col("doc_id"), col("cluster_id"), col("keep")),
        Seq("doc_id"), "left")
    val withBase = baseVerdicts
      .map(bv => joined.join(bv, Seq("doc_id"), "left"))
      .getOrElse(joined.withColumn("v_base", lit(null).cast("string")))

    val verdicts = withBase
      .withColumn("verdict", expr(s"""
        CASE WHEN v_base IS NOT NULL THEN v_base
             WHEN v_exact IS NOT NULL THEN 'exact_dup'
             WHEN keep = 0 THEN 'near_dup'
             WHEN n_tok < $minTokens THEN 'low_quality'
             ELSE 'kept' END"""))
      .withColumn("split_cluster", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", expr("""
        CASE WHEN substring(md5(cast(split_cluster as string)), 1, 1) = 'f' THEN 'test'
             WHEN substring(md5(cast(split_cluster as string)), 1, 1) IN ('d', 'e') THEN 'val'
             ELSE 'train' END"""))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    verdicts.select("doc_id", "verdict", "split")
      .write.mode("overwrite").parquet(s"$outDir/verdicts.parquet")

    val kept = verdicts.filter(col("verdict") === "kept")
    kept.select("doc_id", "text", "lang", "source", "split")
      .write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/curated.parquet")

    // corpus index for future incremental runs: base ∪ this run's kept
    val keptIndex = kept.select(col("doc_id"), col("split"))
      .join(digests, Seq("doc_id"))
      .join(fps, Seq("doc_id"), "left")
      .select(col("doc_id"), col("digest"), col("fp"), col("split"))
    baseIndex.map(b => b.select("doc_id", "digest", "fp", "split").union(keptIndex))
      .getOrElse(keptIndex)
      .write.mode("overwrite").parquet(s"$outDir/index.parquet")

    writePacking(kept, s"$outDir/packing.parquet")

    val counts = verdicts.groupBy("verdict").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val splits = kept.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    verdicts.unpersist(false)
    fps.unpersist(false)
    queries.QueryDef.drainCleanups() // releases the cluster + base frames

    def obj(m: Map[String, Long]) =
      m.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/summary.json"),
      s"""{"verdicts":${obj(counts)},"splits":${obj(splits)},"min_tokens":$minTokens}\n""")
    Result(counts, splits)
  }

  /** c09 packing per (split, shard): kept docs only, L=512. */
  private def writePacking(kept: DataFrame, path: String): Unit = {
    val L = 512
    val packed = kept
      .select(col("split"), col("doc_id"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 16")
          .as("shard"),
        col("n_tok"))
      .filter(col("n_tok") > 0)
    val w = Window.partitionBy("split", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed
      .withColumn("fin", sum("n_tok").over(w))
      .withColumn("st", col("fin") - col("n_tok"))
      .select(col("split"), col("shard"), col("st"), col("fin"),
        explode(expr(s"sequence(st div $L, (fin - 1) div $L)")).as("seq"))
      .groupBy("split", "shard", "seq")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("fin"), (col("seq") + 1) * L) -
          greatest(col("st"), col("seq") * L)).cast("long").as("n_tokens"))
      .write.mode("overwrite").parquet(path)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_curate"
    val minTokens = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession.build("graft-curate")
    val r =
      if (args.length > 3) runIncremental(spark, sfDir, args(3), outDir, minTokens)
      else run(spark, sfDir, outDir, minTokens)
    println(s"[curate] verdicts=${r.counts} splits=${r.splits} -> $outDir")
    spark.stop()
  }
}
