package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Curate
import graft.util.Fs

/** Continuous corpus curation — [[graft.Curate]]'s incremental mode
  * driven by Structured Streaming (foreachBatch, the same posture as
  * [[StreamingIndexProbe]]/[[StreamingIvfProbe]]): every micro-batch of
  * documents becomes one curation GENERATION chained onto the previous
  * one, so the full dedup/quality/split/packing pipeline — including
  * cross-batch dup suppression through the maintained `index.parquet` —
  * runs against an append-only document stream with O(batch) work per
  * batch (the base corpus text is never re-read; only its compacted
  * digest/fingerprint index is).
  *
  * Layout under `rootDir` (all Hadoop-FS paths):
  *   - `gen_<batchId>/`    one complete Curate output per committed
  *     batch (curated/verdicts/index/packing/summary/card) — the audit
  *     trail a data-governance pipeline wants anyway;
  *   - `batch_<batchId>/`  the batch's raw documents.parquet (what the
  *     generation was curated FROM);
  *   - `LATEST`            atomic pointer `{"gen":"gen_N","batch":N}` —
  *     the ONE commit point, written last.
  *
  * Replay discipline (the other streaming loops', applied at pipeline
  * granularity):
  *   - a re-delivered COMMITTED batch (id == LATEST.batch) is a no-op —
  *     its generation is already complete and later batches chain off
  *     it;
  *   - a crashed partial generation leaves LATEST on the previous
  *     generation; re-delivery deletes the partial dir and re-runs the
  *     whole generation (convergent — each generation is a pure
  *     function of (previous generation, batch documents));
  *   - a batch id BELOW the committed fence fails loudly: the
  *     checkpoint/id space restarted over an existing root, and
  *     silently re-curating history would fork the chain.
  *
  * doc_ids must be disjoint across batches (the incremental-mode
  * append-log contract). Old generations are not needed for future
  * work — only LATEST is ever read — so [[prune]] can bound the trail.
  */
object StreamingCurate {

  /** Start continuous curation over a streaming (doc_id, text, lang,
    * source) frame. `onResult` sees each committed generation's verdict
    * and split totals. */
  def start(docs: DataFrame, rootDir: String, checkpointDir: String,
      cfg: Curate.Config = Curate.Config(),
      onResult: Curate.Result => Unit = _ => ()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, rootDir, batchId, cfg)
          .foreach(onResult)
      }
      .start()

  /** One micro-batch → one generation. Returns None for a committed
    * replay (nothing ran), Some(result) otherwise. Exposed for direct
    * testing, like the other streaming loops. */
  def processBatch(spark: SparkSession, batch: DataFrame, rootDir: String,
      batchId: Long, cfg: Curate.Config = Curate.Config())
      : Option[Curate.Result] = {
    val hc = spark.sessionState.newHadoopConf()
    Fs.mkdirs(rootDir, hc)
    val latest = readLatest(spark, rootDir)
    latest match {
      case Some((_, committed)) if batchId == committed =>
        return None // committed replay: the generation is complete
      case Some((_, committed)) if batchId < committed =>
        throw new IllegalStateException(
          s"StreamingCurate batch $batchId but $rootDir already committed " +
            s"generation $committed: the micro-batch id space restarted " +
            "(fresh checkpoint over an existing root) — use a new rootDir " +
            "or restore the original checkpoint")
      case _ => ()
    }
    val batchDir = s"$rootDir/batch_$batchId"
    val genDir = s"$rootDir/gen_$batchId"
    // re-delivery of an UNcommitted batch heals by full re-run: both
    // dirs are owned by this batch id, so deleting them cannot touch
    // committed state
    Fs.deleteTree(batchDir, hc)
    Fs.deleteTree(genDir, hc)
    batch.write.mode("overwrite").parquet(s"$batchDir/documents.parquet")
    val r = latest match {
      case Some((prevGen, _)) =>
        Curate.runIncremental(spark, batchDir, s"$rootDir/$prevGen", genDir, cfg)
      case None =>
        Curate.run(spark, batchDir, genDir, cfg)
    }
    // the ONE commit point — atomic rename; a crash before this line
    // leaves LATEST on the previous generation and the re-run converges
    Fs.writeStringAtomic(s"$rootDir/LATEST",
      s"""{"gen":"gen_$batchId","batch":$batchId}""" + "\n", hc)
    Some(r)
  }

  /** The committed (generation dir name, batch id), if any. */
  def readLatest(spark: SparkSession, rootDir: String)
      : Option[(String, Long)] = {
    val hc = spark.sessionState.newHadoopConf()
    if (!Fs.exists(s"$rootDir/LATEST", hc)) None
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Fs.readString(s"$rootDir/LATEST", hc))
      Some((node.get("gen").asText(), node.get("batch").asLong()))
    }
  }

  /** Bound the generation trail: drop all but the newest `keep`
    * committed generations (and their batch inputs). The chain only
    * ever reads LATEST, so pruning is safe at keep >= 1; the committed
    * generation itself is never deleted. */
  def prune(spark: SparkSession, rootDir: String, keep: Int = 2): Unit = {
    require(keep >= 1, s"keep $keep must retain at least the committed gen")
    val hc = spark.sessionState.newHadoopConf()
    readLatest(spark, rootDir) match {
      case None => ()
      case Some((_, committed)) =>
        val p = new org.apache.hadoop.fs.Path(rootDir)
        val fs = p.getFileSystem(hc)
        val gens = fs.listStatus(p).toSeq.map(_.getPath.getName)
          .flatMap { n =>
            if (n.startsWith("gen_")) n.stripPrefix("gen_").toLongOption
            else None
          }
          .filter(_ <= committed).sorted.reverse
        gens.drop(keep).foreach { g =>
          Fs.deleteTree(s"$rootDir/gen_$g", hc)
          Fs.deleteTree(s"$rootDir/batch_$g", hc)
        }
    }
  }
}
