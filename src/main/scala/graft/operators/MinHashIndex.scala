package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band index + incremental near-duplicate probe —
  * the text-side sibling of [[IvfIndex]] (vectors) and of
  * `c10_incremental_dedup` (exact digests): an ingestion pipeline keeps
  * the corpus's band buckets and shingle signatures as parquet tables
  * and answers "which existing documents is this NEW batch a near-copy
  * of" by joining the batch against the index — never recomputing
  * corpus LSH, never touching corpus text.
  *
  * Scheme: exactly m01's (word 3-gram shingles → 6 seeded-md5 MinHashes
  * → 3 bands of 2) — and not by coincidence: this object holds the ONE
  * definition ([[shingleExpr]]/[[bands]]), which `Similarity` and the
  * streaming verify companions alias, so the batch query, the stream,
  * and the persisted index cannot drift. [[MinHashIndexSpec]] still
  * pins the band frame against `Similarity.minhashBands` as a
  * delegation regression check.
  *
  * Layout under `indexDir` (all Spark parquet — FS-portable by
  * construction):
  *   - `bands/`       (bi INT, bh STRING, doc_id LONG) — candidate keys
  *   - `signatures/`  (doc_id LONG, sh ARRAY<STRING>) — rerank payload
  *   - `meta.json`    written LAST via
  *     [[graft.util.Fs.writeStringAtomic]]: its presence marks a
  *     complete build.
  * Two append disciplines share this layout: the flat batch API
  * ([[write]]/[[append]] — a crash mid-append followed by a retry can
  * leave bit-identical duplicate rows, which [[probe]] collapses by
  * deduplicating its output pair set) and the streaming [[appendBatch]] (per-batch partition
  * subdirs, idempotent overwrite, meta as the single atomic commit —
  * see its Scaladoc). The two must not mix on one index dir and
  * reject each other.
  *
  * 100 TB judgment: candidate generation joins ~50-byte (bi, bh, id)
  * rows against the batch's bands — the corpus-side shuffle is bounded
  * by the INDEX key table, not the corpus text; signatures join back
  * once per DISTINCT candidate pair (the m01 rerank shape); `append` is
  * an O(batch) parquet append. Bucketing `bands/` by bh (BucketedSink)
  * is the zero-shuffle refinement when the index outgrows broadcast.
  */
object MinHashIndex {

  /** THE definition of the m01 shingle scheme (word 3-grams, distinct;
    * short docs fall back to their distinct token set) — Similarity and
    * the streaming verify companions alias it from here, so the scheme
    * that keys persisted indexes cannot drift from the batch query. */
  private val tk = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"
  private[graft] val shingleExpr =
    s"""CASE WHEN size($tk) >= 3
          THEN array_distinct(transform(sequence(1, size($tk) - 2),
               i -> concat_ws(' ', slice($tk, i, 3))))
          ELSE array_distinct($tk) END"""
  private def mh(k: Int) =
    s"array_min(transform(sh, s -> md5(concat('$k:', s))))"

  /** (doc_id, sh) signature frame of a documents frame. */
  def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(shingleExpr).as("sh"))

  /** (doc_id, bi, bh) band-bucket frame of a signature frame. */
  def bands(sigs: DataFrame): DataFrame =
    sigs
      .withColumn("mh", expr(s"array(${(0 until 6).map(mh).mkString(",")})"))
      .select(col("doc_id"), posexplode(expr(
        "array(md5(concat(mh[0], mh[1])), md5(concat(mh[2], mh[3])), md5(concat(mh[4], mh[5])))"))
        .as(Seq("bi", "bh")))

  /** Build the index from scratch (overwrites `indexDir`). */
  def write(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val c = spark.sessionState.newHadoopConf()
    graft.util.Fs.deleteTree(indexDir, c)
    val sigs = signatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.write.mode("overwrite").parquet(s"$indexDir/signatures")
      bands(sigs).write.mode("overwrite").parquet(s"$indexDir/bands")
      writeMeta(spark, indexDir, c)
    } finally { sigs.unpersist(false); () }
  }

  /** Append a new batch without rebuilding: O(batch) signature/band
    * appends, then the meta rewrite (last — see layout doc). */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val c = spark.sessionState.newHadoopConf()
    require(graft.util.Fs.exists(s"$indexDir/meta.json", c),
      s"$indexDir is not a complete MinHash index (no meta.json)")
    require(!graft.util.Fs.readString(s"$indexDir/meta.json", c).contains("last_batch"),
      s"$indexDir is a streaming-layout index (batch-partitioned dirs); " +
        "use appendBatch — flat-file append would break partition discovery")
    val sigs = signatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.write.mode("append").parquet(s"$indexDir/signatures")
      bands(sigs).write.mode("append").parquet(s"$indexDir/bands")
      writeMeta(spark, indexDir, c)
    } finally { sigs.unpersist(false); () }
  }

  private def writeMeta(spark: SparkSession, indexDir: String,
      c: org.apache.hadoop.conf.Configuration): Unit = {
    val n = spark.read.parquet(s"$indexDir/signatures").count()
    graft.util.Fs.writeStringAtomic(s"$indexDir/meta.json",
      s"""{"scheme":"minhash-3gram-6x3","n_docs":$n}""", c)
  }

  /** Replay-safe micro-batch ingestion (the StreamingIndexProbe
    * append). Layout differs from [[write]]/[[append]]'s flat files:
    * each batch OWNS a partition subdirectory
    * (`signatures/batch_id=N`, `bands/batch_id=N`) written with
    * OVERWRITE semantics, and `meta.json` — carrying
    * `{"scheme", "n_docs", "last_batch"}` — is the single atomic
    * commit point, written last. The consequences, in order:
    *
    *   - re-delivery of an uncommitted batch rewrites its OWN dirs and
    *     then commits — idempotent by construction, no fence to race
    *     (a crash anywhere mid-append is healed by the rewrite);
    *   - re-delivery of the COMMITTED last batch writes nothing
    *     (returns false);
    *   - a batch id BELOW the committed last batch fails loudly: ids
    *     restarted (fresh checkpoint over a grown index, or two
    *     queries sharing one indexDir) — silently overwriting old
    *     batches would corrupt the corpus;
    *   - `n_docs` advances incrementally (previous meta + this batch),
    *     so per-batch cost never grows with corpus size.
    *
    * Takes the SIGNATURE frame (callers probe with the same frame —
    * the expensive shingle/minhash work runs once per batch). The two
    * layouts must not mix: appending onto a [[write]]-built index (or
    * vice versa) is rejected. */
  def appendBatch(spark: SparkSession, sigs: DataFrame, indexDir: String,
      batchId: Long): Boolean = {
    val c = spark.sessionState.newHadoopConf()
    val metaPath = s"$indexDir/meta.json"
    val (nDocs, last) =
      if (!graft.util.Fs.exists(metaPath, c)) (0L, -1L)
      else {
        val m = graft.util.Fs.readString(metaPath, c)
        val lastB = """"last_batch":(-?\d+)""".r.findFirstMatchIn(m)
          .map(_.group(1).toLong)
        require(lastB.isDefined,
          s"$indexDir is a batch-API index (no last_batch in meta.json); " +
            "streaming appendBatch and write/append layouts must not mix")
        val n = """"n_docs":(\d+)""".r.findFirstMatchIn(m)
          .map(_.group(1).toLong).getOrElse(0L)
        (n, lastB.get)
      }
    if (batchId < last)
      throw new IllegalStateException(
        s"appendBatch($batchId) but $indexDir already committed batch $last: " +
          "the micro-batch id space restarted (fresh checkpoint dir over an " +
          "existing index, or two queries sharing it) — use a new indexDir " +
          "or restore the original checkpoint")
    if (batchId == last) return false // committed replay: data is complete
    val n = sigs.count()
    sigs.write.mode("overwrite").parquet(s"$indexDir/signatures/batch_id=$batchId")
    bands(sigs).write.mode("overwrite").parquet(s"$indexDir/bands/batch_id=$batchId")
    graft.util.Fs.writeStringAtomic(metaPath,
      s"""{"scheme":"minhash-3gram-6x3","n_docs":${nDocs + n},"last_batch":$batchId}""", c)
    true
  }

  /** Near-duplicates of `batchSigs` (a [[signatures]] frame — the
    * caller persists it if it also feeds other work) against the
    * persisted index: (batch_id, base_id, jaccard_permille), true
    * Jaccard ≥ `minPermille`, self-pairs excluded so an appended batch
    * can be probed against its own index. */
  def probe(spark: SparkSession, indexDir: String, batchSigs: DataFrame,
      minPermille: Int = 500): DataFrame = {
    val idxBands = spark.read.parquet(s"$indexDir/bands")
    val idxSigs = spark.read.parquet(s"$indexDir/signatures")
    val cand = bands(batchSigs)
      .select(col("doc_id").as("batch_id"), col("bi"), col("bh"))
      .join(idxBands.select(col("doc_id").as("base_id"),
        col("bi").as("bi2"), col("bh").as("bh2")),
        col("bi") === col("bi2") && col("bh") === col("bh2") &&
          col("batch_id") =!= col("base_id"))
      .select("batch_id", "base_id")
      .distinct()
    cand
      .join(idxSigs.select(col("doc_id").as("base_id"), col("sh").as("sh_a")), "base_id")
      .join(batchSigs.select(col("doc_id").as("batch_id"), col("sh").as("sh_b")), "batch_id")
      // same fence as m01: the intersect — the expensive op — must run
      // exactly once per distinct pair, not re-inlined into the filter
      .select(col("batch_id"), col("base_id"),
        graft.functions.OptimizerBarrier.fence(
          expr("size(array_intersect(sh_a, sh_b))").cast("bigint")).as("common"),
        expr("size(sh_a)").cast("bigint").as("na"),
        expr("size(sh_b)").cast("bigint").as("nb"))
      .select(col("batch_id"), col("base_id"),
        expr("common * 1000 div (na + nb - common)").as("jaccard_permille"))
      .filter(col("jaccard_permille") >= minPermille)
      // flat-append crash hardening: a batch-API append that crashed
      // between its data writes and the meta rewrite, then was retried,
      // leaves DUPLICATE signature/band rows for the re-appended docs.
      // Candidates already collapse (the .distinct above), but each
      // duplicated index signature would re-emit its pairs — dedup the
      // OUTPUT pair set (tiny: only verified near-dups shuffle) rather
      // than the index signatures (a corpus-sized shuffle per probe).
      // The duplicated rows are bit-identical, so this is exact.
      .dropDuplicates("batch_id", "base_id")
  }
}
