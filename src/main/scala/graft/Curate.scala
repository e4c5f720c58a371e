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
  *
  * Verdict rules (first applicable reason wins, so per-doc verdicts are
  * a partition and the summary's counts reconcile exactly):
  *   exact_dup   not the min doc_id of its md5(text) group
  *   near_dup    c01 cluster verdict keep=0 (non-canonical member)
  *   low_quality fewer than minTokens whitespace tokens (default 5)
  *   kept        everything else; assigned a split by md5 of its
  *               dup-cluster id (c12 rule: near-dups can never straddle
  *               splits, singletons hash their own id)
  *
  * Artifacts written to outDir:
  *   curated.parquet        kept docs (doc_id, text, lang, source, split),
  *                          partitioned by split
  *   verdicts.parquet       every doc's (doc_id, verdict, split)
  *   packing.parquet        per (split, shard, seq) L=512 packing manifest
  *                          over kept docs (c09 semantics, shard-local)
  *   summary.json           one JSON object: totals per verdict + split
  *
  * 100 TB shape: every stage is doc-parallel — the digest groupBy
  * shuffles 16-byte digests, the cluster pipeline is c01's contracted
  * CC, split assignment is a per-row md5 plus one doc-keyed left join,
  * and packing windows are (split, shard)-local so the corpus packs as
  * thousands of independent sorts. Nothing collects to the driver but
  * the summary counts.
  */
object Curate {

  final case class Result(counts: Map[String, Long], splits: Map[String, Long])

  private val toks = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"

  def run(spark: SparkSession, sfDir: String, outDir: String,
      minTokens: Int = 5): Result = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val docs = queries.QueryDef.spread(spark, sfDir, "documents")

    // exact-dup losers: every doc_id of a digest group except the min.
    // Shaped as digest-frame + groupBy + join back (16-byte shuffle
    // rows, no per-group array — a degenerate million-copy group stays
    // O(1) per row)
    val digests = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val exactLosers = digests
      .join(digests.groupBy("h").agg(min("doc_id").as("keep_id")), Seq("h"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit("exact_dup").as("v_exact"))

    // near-dup cluster verdicts (persisted + already materialized)
    val clusters = queries.TextMedia.dupClusters(spark, sfDir)

    val verdicts = docs
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        expr(s"cast(size($toks) as bigint)").as("n_tok"))
      .join(exactLosers, Seq("doc_id"), "left")
      .join(clusters.select(col("doc_id"), col("cluster_id"), col("keep")),
        Seq("doc_id"), "left")
      .withColumn("verdict", expr(s"""
        CASE WHEN v_exact IS NOT NULL THEN 'exact_dup'
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

    // c09 packing per (split, shard): kept docs only, L=512
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
      .write.mode("overwrite").parquet(s"$outDir/packing.parquet")

    val counts = verdicts.groupBy("verdict").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val splits = kept.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    verdicts.unpersist(false)
    queries.QueryDef.drainCleanups() // releases the cluster frame

    def obj(m: Map[String, Long]) =
      m.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/summary.json"),
      s"""{"verdicts":${obj(counts)},"splits":${obj(splits)},"min_tokens":$minTokens}\n""")
    Result(counts, splits)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_curate"
    val minTokens = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession.build("graft-curate")
    val r = run(spark, sfDir, outDir, minTokens)
    println(s"[curate] verdicts=${r.counts} splits=${r.splits} -> $outDir")
    spark.stop()
  }
}
