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
  *     batch (curated/verdicts/index/packing/summary/card, plus — for
  *     every chained generation — `drift.json`, the DataCard.drift
  *     composition report vs the previous generation, and
  *     `churn.json`, the DataCard.churn row-level
  *     added/removed/changed/unchanged audit) — the audit
  *     trail a data-governance pipeline wants anyway;
  *   - `batch_<batchId>/`  the batch's raw documents.parquet (what the
  *     generation was curated FROM);
  *   - `LATEST`            atomic pointer `{"gen":"gen_N","batch":N}` —
  *     the ONE commit point, written last.
  *
  * Replay discipline (the other streaming loops', applied at pipeline
  * granularity):
  *   - a re-delivered COMMITTED batch (id == LATEST.batch) runs
  *     nothing but RE-EMITS the generation's totals (at-least-once
  *     onResult — a crash between the LATEST commit and the stream
  *     checkpoint must not swallow a committed callback);
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
    * source) frame. `onResult(generationId, result)` sees each
    * committed generation's verdict and split totals. Delivery is
    * AT-LEAST-ONCE (a committed replay re-emits the totals — see
    * [[processBatch]]); the generation id is the idempotence token: a
    * re-emission carries the SAME id as first delivery, so a consumer
    * aggregating totals dedups on it instead of double-counting.
    *
    * `pruneKeep` makes the chain SELF-BOUNDING (the index probes'
    * maintenance posture applied to the audit trail): after each
    * commit, [[prune]] drops all but the newest `pruneKeep` committed
    * generations and their batch inputs. Without it a year-long stream
    * accumulates a full artifact set per micro-batch — unbounded
    * storage for a chain that only ever READS the latest generation.
    * Pruning inside foreachBatch serializes it against commits (the
    * single-maintainer posture); the committed generation itself is
    * never deleted, so a crash mid-prune converges on re-run. */
  def start(docs: DataFrame, rootDir: String, checkpointDir: String,
      cfg: Curate.Config = Curate.Config(),
      onResult: (Long, Curate.Result) => Unit = (_, _) => (),
      pruneKeep: Option[Int] = None): StreamingQuery = {
    pruneKeep.foreach(k => require(k >= 1,
      s"pruneKeep $k must retain at least the committed generation"))
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, rootDir, batchId, cfg)
          .foreach(r => onResult(batchId, r))
        pruneKeep.foreach(k => prune(batch.sparkSession, rootDir, k))
      }
      .start()
  }

  /** One micro-batch → one generation. A COMMITTED replay runs nothing
    * but still returns the generation's totals (rebuilt from its
    * summary.json), so `onResult` delivery is at-least-once — a crash
    * between the LATEST commit and Spark's checkpoint commit must not
    * silently swallow a committed generation's callback (the other
    * streaming loops' replay posture). Exposed for direct testing. */
  def processBatch(spark: SparkSession, batch: DataFrame, rootDir: String,
      batchId: Long, cfg: Curate.Config = Curate.Config())
      : Option[Curate.Result] = {
    val hc = spark.sessionState.newHadoopConf()
    Fs.mkdirs(rootDir, hc)
    val latest = readLatest(spark, rootDir)
    latest match {
      case Some((gen, committed)) if batchId == committed =>
        // committed replay: nothing runs; re-emit the totals
        return Some(readResult(spark, s"$rootDir/$gen"))
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
        val res = Curate.runIncremental(spark, batchDir,
          s"$rootDir/$prevGen", genDir, cfg)
        // composition drift vs the previous generation — an ARTIFACT of
        // the new generation (drift.json beside summary.json), not a
        // callback: written BEFORE the LATEST commit so every committed
        // chained generation carries it (replay-safe), and computed
        // while the previous generation is still guaranteed on disk
        // (prune runs only after the commit). The oracle-coupled
        // DataCard.drift relation; an empty side (a generation that
        // kept nothing) records a skip marker instead of failing the
        // stream — no composition exists to compare against
        writeDrift(spark, s"$rootDir/$prevGen", genDir)
        writeChurn(spark, s"$rootDir/$prevGen", genDir)
        res
      case None =>
        // first generation: nothing to compare against — no drift.json
        Curate.run(spark, batchDir, genDir, cfg)
    }
    // the ONE commit point — atomic rename; a crash before this line
    // leaves LATEST on the previous generation and the re-run converges
    Fs.writeStringAtomic(s"$rootDir/LATEST",
      s"""{"gen":"gen_$batchId","batch":$batchId}""" + "\n", hc)
    Some(r)
  }

  /** Per-generation drift artifact: DataCard.drift of the previous
    * generation's curated corpus vs the new one, as sorted JSON rows.
    * Exposed for direct testing. */
  private[streaming] def writeDrift(spark: SparkSession, prevGenDir: String,
      genDir: String): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    // a generation that kept NOTHING writes a partitioned dir with no
    // part files — schema inference fails, which is the same "empty
    // snapshot" case as zero rows
    def readCurated(dir: String) =
      try {
        val df = spark.read.parquet(s"$dir/curated.parquet")
        if (df.isEmpty) None else Some(df)
      } catch {
        case _: org.apache.spark.sql.AnalysisException => None
      }
    val prev = readCurated(prevGenDir)
    val cur = readCurated(genDir)
    // jackson builds the document (the readResult/DataCard.write
    // dependency — no hand-rolled string escaping to drift from it)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    if (prev.isEmpty || cur.isEmpty)
      root.put("skipped", "empty snapshot — no composition to compare")
    else {
      val arr = root.putArray("rows")
      graft.report.DataCard.drift(prev.get, cur.get).collect().foreach { r =>
        val n = arr.addObject()
        n.put("lang", r.getString(0))
        n.put("old_n", r.getLong(1)); n.put("new_n", r.getLong(2))
        n.put("old_ppm", r.getLong(3)); n.put("new_ppm", r.getLong(4))
        n.put("delta_ppm", r.getLong(5))
      }
    }
    Fs.writeStringAtomic(s"$genDir/drift.json",
      mapper.writeValueAsString(root) + "\n", hc)
  }

  /** Per-generation churn artifact beside drift.json: the row-level
    * added/removed/changed/unchanged audit (DataCard.churn — ONE
    * definition with the oracled c23) of the previous generation's
    * curated corpus vs the new one. Unlike drift, ONE empty side is a
    * legitimate comparison (everything added or removed), so only a
    * both-empty pair records the skip marker; the unreadable empty
    * dir is stood in by the other side's zero-row frame. */
  private[streaming] def writeChurn(spark: SparkSession, prevGenDir: String,
      genDir: String): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    def readCurated(dir: String) =
      try {
        val df = spark.read.parquet(s"$dir/curated.parquet")
        if (df.isEmpty) None else Some(df)
      } catch {
        case _: org.apache.spark.sql.AnalysisException => None
      }
    val prev = readCurated(prevGenDir)
    val cur = readCurated(genDir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    (prev, cur) match {
      case (None, None) =>
        root.put("skipped", "both snapshots empty — nothing churned")
      case _ =>
        val o = prev.orElse(cur.map(_.limit(0))).get
        val n = cur.orElse(prev.map(_.limit(0))).get
        val arr = root.putArray("rows")
        graft.report.DataCard.churn(o, n).collect().foreach { r =>
          val node = arr.addObject()
          node.put("status", r.getString(0))
          node.put("n", r.getLong(1))
          node.put("chars_old", r.getLong(2))
          node.put("chars_new", r.getLong(3))
        }
    }
    Fs.writeStringAtomic(s"$genDir/churn.json",
      mapper.writeValueAsString(root) + "\n", hc)
  }

  /** A committed generation's Result, rebuilt from its summary.json
    * (the artifact curate wrote at commit time — replays must re-emit
    * exactly what the first delivery reported). */
  private def readResult(spark: SparkSession, genDir: String)
      : Curate.Result = {
    val hc = spark.sessionState.newHadoopConf()
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Fs.readString(s"$genDir/summary.json", hc))
    import scala.jdk.CollectionConverters._
    def toMap(node: com.fasterxml.jackson.databind.JsonNode) =
      node.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    Curate.Result(toMap(root.get("verdicts")), toMap(root.get("splits")))
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
        val names = fs.listStatus(p).toSeq.map(_.getPath.getName)
        def ids(prefix: String) = names.flatMap { n =>
          if (n.startsWith(prefix)) n.stripPrefix(prefix).toLongOption
          else None
        }
        val gens = ids("gen_").filter(_ <= committed).sorted.reverse
        val doomed = gens.drop(keep).toSet
        // batch inputs delete FIRST (a crash between the two deletes
        // must not orphan the raw documents — the content prune was
        // asked to drop), and batch dirs whose generation is already
        // gone (a previous prune's crash window) are swept too
        val keptGens = gens.take(keep).toSet
        (ids("batch_").filter(b => b <= committed && !keptGens.contains(b))
          .toSet ++ doomed).foreach { g =>
          Fs.deleteTree(s"$rootDir/batch_$g", hc)
        }
        doomed.foreach(g => Fs.deleteTree(s"$rootDir/gen_$g", hc))
    }
  }
}
