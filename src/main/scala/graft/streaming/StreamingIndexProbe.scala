package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{MaintenancePolicy, MinHashIndex}
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
  *   3. append the batch via [[MinHashIndex.appendBatch]] so later
  *      batches see it.
  *
  * Replay safety is structural, not fenced: each batch owns a
  * partition subdirectory written with overwrite semantics and the
  * meta commit is one atomic rename (see appendBatch's Scaladoc), so a
  * re-delivered batch heals any partial write instead of
  * double-inserting; batch-id-space restarts fail loudly. Because a
  * replayed (or partially-appended) batch's own documents may already
  * sit in the index, the probe result additionally EXCLUDES pairs
  * whose base is in the current batch — within-batch near-dups never
  * leak into the output, first delivery or replay.
  */
object StreamingIndexProbe {

  /** Start the ingestion query over a streaming (doc_id, text) frame.
    * `onPairs` receives each micro-batch's verified near-dup pairs
    * (possibly empty); the frame is released after the callback
    * returns.
    *
    * `maintenance` makes the ingest SELF-MAINTAINING
    * ([[StreamingIvfProbe.start]]'s contract on the text side): every
    * `policy.checkEvery` batches, health is evaluated and at most one
    * [[MinHashIndex.foldStreaming]] fires — folding tombstone debt,
    * duplicate rows, signature↔band inconsistencies, and the
    * accumulated per-batch small files, while the stream keeps
    * appending. Inside foreachBatch ⇒ maintenance and appends never
    * overlap (the single-maintainer contract by construction). Actions
    * report through `onMaintain(batchId, action)`. */
  def start(docs: DataFrame, indexDir: String, checkpointDir: String,
      onPairs: DataFrame => Unit, minPermille: Int = 500,
      maintenance: Option[MaintenancePolicy] = None,
      onMaintain: (Long, String) => Unit = (_, _) => ()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pairs = processBatch(batch.sparkSession, indexDir, batch, batchId,
          minPermille)
        try onPairs(pairs) finally { pairs.unpersist(false); () }
        maintenance.foreach { p =>
          if ((batchId + 1) % p.checkEvery == 0) {
            val act = MinHashIndex.maintain(batch.sparkSession, indexDir, p)
            if (act != "none") onMaintain(batchId, act)
          }
        }
      }
      .start()

  /** One micro-batch: probe (vs earlier batches), idempotent append.
    * Returns the pairs frame PERSISTED AND MATERIALIZED — the caller's
    * sink must see pre-append results even though it runs after the
    * append mutates the index files the lazy probe plan reads; kept
    * distributed (no driver collect — a batch matching a heavily
    * duplicated corpus region can emit arbitrarily many pairs). The
    * caller releases it. */
  private[graft] def processBatch(spark: SparkSession, indexDir: String,
      batch: DataFrame, batchId: Long, minPermille: Int): DataFrame = {
    import spark.implicits._
    val sigs = MinHashIndex.signatures(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val raw =
        if (Fs.exists(s"$indexDir/meta.json", spark.sessionState.newHadoopConf()))
          MinHashIndex.probe(spark, indexDir, sigs, minPermille)
        else
          Seq.empty[(Long, Long, Long)]
            .toDF("batch_id", "base_id", "jaccard_permille")
      // replay hardening: exclude pairs whose base is THIS batch — on
      // first delivery the batch isn't indexed yet (no-op), on replay
      // after a crash its docs are, and within-batch pairs must not
      // leak (same-id self-pairs are already excluded by probe)
      val pairs = raw
        .join(sigs.select(col("doc_id").as("base_id")), Seq("base_id"), "left_anti")
        .select("batch_id", "base_id", "jaccard_permille")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count() // materialize BEFORE the append mutates the index
      MinHashIndex.appendBatch(spark, sigs, indexDir, batchId)
      pairs
    } finally { sigs.unpersist(false); () }
  }
}
