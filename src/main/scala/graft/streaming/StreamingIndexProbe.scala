package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.MinHashIndex
import graft.util.Fs

/** Streaming corpus ingestion with near-dedup against the PERSISTED
  * MinHash index — the continuous form of m04, and the missing piece
  * between the two existing streaming postures:
  * [[StreamingMinHash]]/[[StreamingNearDup]] dedupe a stream against
  * ITSELF inside a keyed-state horizon; this operator dedupes each
  * arriving micro-batch against the ENTIRE corpus ingested so far,
  * with the corpus living in the index's parquet tables instead of
  * stream state — so "state" is unbounded corpus-shaped data on
  * storage, not memory, and a restart resumes from disk.
  *
  * Per micro-batch (foreachBatch — the standard Structured Streaming
  * pattern for joining a stream against a mutable batch artifact):
  *
  *   1. probe the batch's signatures against the index →
  *      (batch_id, base_id, jaccard_permille) pairs vs all EARLIER
  *      batches (within-batch pairs are [[StreamingMinHash]]'s job);
  *   2. hand the verified pairs to the caller's sink callback;
  *   3. append the batch to the index so later batches see it.
  *
  * Replay safety: foreachBatch re-delivers a micro-batch after a
  * failure/restart. The append is FENCED on the batch id — a
  * `last_batch.json` sidecar (atomic rename, like the index meta)
  * records the highest appended id, and a replayed batch re-probes
  * (idempotent reads) but skips the append instead of double-inserting
  * its documents. One sidecar write per micro-batch, no coordination.
  */
object StreamingIndexProbe {

  /** Start the ingestion query over a streaming (doc_id, text) frame.
    * `onPairs` receives each micro-batch's verified near-dup pairs
    * (possibly empty). */
  def start(docs: DataFrame, indexDir: String, checkpointDir: String,
      onPairs: DataFrame => Unit, minPermille: Int = 500): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onPairs(processBatch(batch.sparkSession, indexDir, batch, batchId,
          minPermille))
      }
      .start()

  /** One micro-batch: probe (vs earlier batches), fence-checked append.
    * Returns the pairs frame, ALREADY MATERIALIZED (the caller's sink
    * must see pre-append results even though it runs after the append,
    * and the probe plan is lazy over index files the append mutates). */
  private[streaming] def processBatch(spark: SparkSession, indexDir: String,
      batch: DataFrame, batchId: Long, minPermille: Int): DataFrame = {
    import spark.implicits._
    val c = Fs.conf()
    val sigs = MinHashIndex.signatures(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val hasIndex = Fs.exists(s"$indexDir/meta.json", c)
      val pairs =
        if (hasIndex)
          MinHashIndex.probe(spark, indexDir, sigs, minPermille)
            .collect().toSeq
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        else Seq.empty[(Long, Long, Long)]
      val appended = lastAppended(indexDir, c)
      if (batchId > appended) {
        if (hasIndex) MinHashIndex.append(spark, batch, indexDir)
        else MinHashIndex.write(spark, batch, indexDir)
        Fs.writeStringAtomic(s"$indexDir/last_batch.json",
          s"""{"batch_id":$batchId}""", c)
      }
      pairs.toDF("batch_id", "base_id", "jaccard_permille")
    } finally { sigs.unpersist(false); () }
  }

  private def lastAppended(indexDir: String,
      c: org.apache.hadoop.conf.Configuration): Long =
    if (!Fs.exists(s"$indexDir/last_batch.json", c)) -1L
    else {
      val s = Fs.readString(s"$indexDir/last_batch.json", c)
      """-?\d+""".r.findFirstIn(s).map(_.toLong).getOrElse(-1L)
    }
}
