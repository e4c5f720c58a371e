package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{IvfIndex, MaintenancePolicy}
import graft.util.Fs

/** Streaming EMBEDDING ingestion with exact kNN against the persisted
  * IVF index — [[StreamingIndexProbe]]'s design carried to the vector
  * side: each arriving micro-batch of (vec_id, embedding) rows is
  * answered with its top-k nearest EARLIER vectors (provably exact —
  * IvfIndex's Cauchy-Schwarz bound), then appended so later batches
  * see it. The corpus lives in the index's cluster-partitioned parquet,
  * not in stream state; a restart resumes from disk.
  *
  * Per micro-batch (foreachBatch):
  *
  *   1. search the batch frame against the index
  *      ([[IvfIndex.searchExactFrame]], or `searchApproxFrame` when an
  *      `nprobe` dial is passed — the recall/cost trade for corpora
  *      where the exact bound's fan-out isn't worth it) with the batch
  *      itself EXCLUDED
  *      from the candidate side — on first delivery that is a no-op
  *      (the batch isn't indexed yet), on replay after a crash it
  *      makes the output bit-identical to the first delivery even
  *      though the batch's vectors already sit in the index (the
  *      exclusion subtracts their cluster counts from the pruning
  *      stats, so the bound stays a proof over the reduced set);
  *   2. hand the (query_id, cand_id, dot, rnk) pairs to the caller's
  *      sink callback;
  *   3. append via [[IvfIndex.appendBatch]] — per-batch partition dir,
  *      bounds-lead-data meta staging, last_batch as the single commit
  *      fence (see its Scaladoc for the crash-point walk).
  *
  * The index must exist before the stream starts
  * ([[IvfIndex.initStreaming]] trains the frozen centroids from a
  * bootstrap corpus); assignment quality under drift is the usual IVF
  * re-train decision, never a correctness one. */
object StreamingIvfProbe {

  /** Start the ingestion query over a streaming (vec_id, embedding)
    * frame. `onPairs` receives each micro-batch's exact top-k pairs
    * (possibly empty); the frame is released after the callback
    * returns.
    *
    * `maintenance` makes the ingest SELF-MAINTAINING: every
    * `policy.checkEvery` batches (after the batch commits and its
    * pairs are delivered) the index's health is evaluated against the
    * policy's dials and at most one layout-preserving action fires —
    * [[IvfIndex.foldStreaming]] for tombstone/duplicate debt,
    * [[IvfIndex.retrainStreaming]] for cluster-size drift (which the
    * frozen assignment otherwise accumulates forever). Running inside
    * foreachBatch keeps the single-maintainer contract by
    * construction: maintenance and appends never overlap. Actions are
    * reported through `onMaintain(batchId, action)`; a replayed check
    * after a crash re-measures a healthy index and no-ops. If a
    * previous run of this stream died INSIDE its own fold, the next
    * batch first converges the crashed fold ([[IvfIndex.recoverFold]];
    * reported as `"recover-fold"`/`"recover-compact"`) instead of
    * refusing forever on the FOLDING fence; an interrupted RETRAIN
    * still refuses loudly — that recovery stays an operator call. */
  def start(embeddings: DataFrame, indexDir: String, checkpointDir: String,
      onPairs: DataFrame => Unit, topK: Int = 10,
      nprobe: Option[Int] = None,
      maintenance: Option[MaintenancePolicy] = None,
      onMaintain: (Long, String) => Unit = (_, _) => ()): StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // self-recovery before anything reads meta: a crash inside our
        // OWN foldStreaming leaves the FOLDING marker, and the replayed
        // batch's search/append would refuse forever on restart — but
        // this foreachBatch IS the single maintainer entitled to run
        // the documented recovery (the fold re-run). A RETRAINING
        // marker still refuses loudly (recoverFold throws): re-firing
        // a re-cluster implicitly at every restart could loop a
        // deterministic failure forever, so that stays an operator call.
        val rec = IvfIndex.recoverFold(batch.sparkSession, indexDir)
        // "compact" means the crash was an END-OF-STREAM compact that
        // had already finalized the layout (last_batch dropped): the
        // INDEX is now converged and searchable, but no recovery can
        // let this stream keep appending to it — stop with the real
        // diagnosis instead of reporting success and then tripping
        // appendBatch's generic layouts-must-not-mix rejection
        if (rec == "compact")
          throw new IllegalStateException(
            s"$indexDir: recovered a crashed END-OF-STREAM compact — the " +
              "index is finalized into the batch layout and converged, but " +
              "a finalized index cannot take further streamed batches; " +
              "retire this stream (its corpus is fully indexed) or " +
              "initStreaming a new directory")
        if (rec != "none") onMaintain(batchId, s"recover-$rec")
        val pairs = processBatch(batch.sparkSession, indexDir, batch, batchId,
          topK, nprobe)
        try onPairs(pairs) finally { pairs.unpersist(false); () }
        maintenance.foreach { p =>
          if ((batchId + 1) % p.checkEvery == 0) {
            val act = IvfIndex.maintain(batch.sparkSession, indexDir, p)
            if (act != "none") onMaintain(batchId, act)
          }
        }
      }
      .start()

  /** One micro-batch: exact search (vs earlier batches only), then the
    * idempotent append. Returns the pairs frame PERSISTED AND
    * MATERIALIZED — the caller's sink must see pre-append results even
    * though it runs after the append mutates the files the lazy search
    * plan reads; kept distributed (no driver collect). The caller
    * releases it. */
  private[graft] def processBatch(spark: SparkSession, indexDir: String,
      batch: DataFrame, batchId: Long, topK: Int,
      nprobe: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val vecs = batch.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val raw =
        if (Fs.exists(s"$indexDir/data", spark.sessionState.newHadoopConf()))
          nprobe match {
            case None => IvfIndex.searchExactFrame(spark, indexDir, vecs, topK,
              excludeCands = Some(vecs))
            case Some(np) => IvfIndex.searchApproxFrame(spark, indexDir, vecs,
              topK, np, excludeCands = Some(vecs))
          }
        else // no batch committed yet: nothing earlier to be near
          Seq.empty[(Long, Long, Long, Long)]
            .toDF("query_id", "cand_id", "dot", "rnk")
      val pairs = raw
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count() // materialize BEFORE the append mutates the index
      IvfIndex.appendBatch(spark, vecs, indexDir, batchId)
      pairs
    } finally { vecs.unpersist(false); () }
  }
}
