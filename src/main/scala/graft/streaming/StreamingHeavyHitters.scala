package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.HeavyHitters
import graft.util.Fs

/** Streaming twin of d29's exact heavy hitters
  * ([[graft.operators.HeavyHitters]]): a continuously-ingesting corpus
  * keeps a capacity-bounded Misra–Gries candidate summary PLUS a
  * persisted per-batch count corpus, and query time runs the exact
  * pass + soundness gate over them — same proof posture as the batch
  * operator (never an approximate-and-silent answer), but the sketch
  * state survives restarts on storage, not in executor memory.
  *
  * Per micro-batch (foreachBatch — [[StreamingIndexProbe]]'s posture):
  *
  *   1. per-partition MG summaries of the batch's keys (the SAME
  *      kernel as the batch operator, [[HeavyHitters.mgSummary]]),
  *      collected (≤ capacity·partitions rows) and merged into the
  *      standing summary with [[HeavyHitters.mgMerge]] — MG summaries
  *      are MERGEABLE with additive error, total ≤ N/(capacity+1);
  *   2. the batch's per-key counts land in `corpus/batch=<id>/`
  *      (overwrite semantics — replay-idempotent);
  *   3. meta.json (n, last_batch, summary pointer) commits atomically
  *      LAST, so a crash anywhere replays into the same state.
  *
  * Replay safety: a re-delivered batch (batchId ≤ last_batch) heals
  * its corpus directory and SKIPS the summary merge — double-merging
  * would inflate candidate estimates (harmless for soundness, which
  * rides exact counts, but it burns capacity), and double-counting n
  * would tighten the gate incorrectly in the REFUSING direction only;
  * the skip keeps replays bit-identical instead.
  *
  * Query time ([[topK]]): exact counts of the ≤ capacity candidates
  * from the persisted corpus (map-side-combined sum over pre-aggregated
  * per-batch counts restricted to batch ≤ the committed last_batch —
  * an in-flight batch's corpus dir lands before its meta flip and must
  * stay invisible), then the batch operator's gate adapted to the
  * mergeable bound — sound iff the candidates cover the whole corpus
  * or the k-th candidate's exact count EXCEEDS N/(capacity+1); a
  * too-flat stream refuses loudly with the sufficient capacity named.
  * The capacity is PERSISTED in meta.json at ingest (the bound is a
  * property of the state; a restart re-dialing it is refused) and the
  * immediately superseded summary generation is retained one commit
  * interval so queries racing a commit never read a deleted path.
  *
  * 100 TB shape: per batch, the shuffle is one per-key count aggregate
  * of the BATCH (not the standing corpus) plus a ≤ capacity·P driver
  * collect; the standing corpus is append-only parquet the query-time
  * pass aggregates with map-side combine. Summary state is O(capacity)
  * whatever the vocabulary.
  */
object StreamingHeavyHitters {

  /** Meta: total non-null keys streamed, last committed batch, and the
    * CAPACITY the standing summary was built with — persisted because
    * the soundness bound N/(capacity+1) is a property of the state,
    * not of the query: a topK assuming a larger capacity than the
    * ingest used would "prove" with a bound the summary never met. */
  private final case class Meta(n: Long, lastBatch: Long, capacity: Int)

  private def readMeta(dir: String,
      c: org.apache.hadoop.conf.Configuration): Option[Meta] = {
    val p = s"$dir/meta.json"
    if (!Fs.exists(p, c)) None
    else {
      val s = Fs.readString(p, c)
      def f(k: String) =
        s"""\"$k\"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
      Some(Meta(f("n"), f("last_batch"), f("capacity").toInt))
    }
  }

  private def writeMeta(dir: String, m: Meta,
      c: org.apache.hadoop.conf.Configuration): Unit =
    Fs.writeStringAtomic(s"$dir/meta.json",
      s"""{"n": ${m.n}, "last_batch": ${m.lastBatch}, """ +
        s""""capacity": ${m.capacity}}""", c)

  /** Start ingestion over a streaming single-string-column frame.
    * `onBatch(batchId, totalN)` reports each commit. */
  def start(keys: DataFrame, dir: String, checkpointDir: String,
      capacity: Int = 4096,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    keys.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = processBatch(batch.sparkSession, dir, batch, batchId, capacity)
        onBatch(batchId, n)
      }
      .start()

  /** One micro-batch; returns the committed total N. */
  private[graft] def processBatch(spark: SparkSession, dir: String,
      batch: DataFrame, batchId: Long, capacity: Int): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val keyCol = batch.columns.head
    val keys = batch.select(col(keyCol).cast("string").as("key")).na.drop()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val meta = readMeta(dir, conf)
      // mixed-capacity merges void the mergeable bound (the error sum
      // is only ≤ N/(cap+1) for the capacity every merge used) —
      // refuse a restart that re-dials it rather than silently
      // weakening the gate's proof
      meta.foreach(m => require(m.capacity == capacity,
        s"StreamingHeavyHitters: state at $dir was built with " +
          s"capacity=${m.capacity}, got $capacity — the mergeable " +
          "soundness bound does not survive mixed capacities; resume " +
          "with the original dial or start a fresh directory"))
      // (2) corpus append FIRST (idempotent overwrite of this batch's
      // directory) — pre-aggregated per-key counts, the exact pass's
      // input; a crash before the meta commit replays into overwrite
      keys.groupBy("key").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$dir/corpus/batch=$batchId")
      meta match {
        case Some(m) if batchId <= m.lastBatch =>
          m.n // replay: corpus healed, summary/meta untouched
        case _ =>
          // (1) batch MG summary, distributed kernel + driver merge
          val partials = keys.mapPartitions { it =>
            HeavyHitters.mgSummary(it.map(_.getString(0)), capacity).iterator
          }(org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.STRING,
            org.apache.spark.sql.Encoders.scalaLong)).collect()
          val batchN = keys.count()
          val standing: Iterator[(String, Long)] = meta match {
            case Some(m) =>
              spark.read.parquet(s"$dir/summary_${m.lastBatch}")
                .collect().iterator.map(r => (r.getString(0), r.getLong(1)))
            case None => Iterator.empty
          }
          val merged = HeavyHitters
            .mgMerge(standing ++ partials.iterator, capacity)
          import spark.implicits._
          // VERSIONED summary + atomic meta commit: the new summary
          // lands under its own batch-stamped name and meta flips to
          // it last — a crash anywhere leaves meta pointing at the
          // intact previous summary (a delete-then-rename swap would
          // have a window that silently DROPS standing candidates,
          // voiding the mergeable-error bound the gate's proof rides
          // on). Cleanup keeps the CURRENT and the immediately
          // SUPERSEDED generation (deleting the superseded one right
          // after the flip would race a concurrent topK that read the
          // old meta moments earlier — its candidate read needs the
          // old summary for one more commit interval); anything older
          // is unreferenced junk, deleted here.
          merged.toSeq.toDF("key", "c").coalesce(1)
            .write.mode("overwrite").parquet(s"$dir/summary_$batchId")
          val total = meta.map(_.n).getOrElse(0L) + batchN
          writeMeta(dir, Meta(total, batchId, capacity), conf)
          meta.foreach { m =>
            val base = new org.apache.hadoop.fs.Path(dir)
            val fs = base.getFileSystem(conf)
            fs.listStatus(base).foreach { st =>
              val nm = st.getPath.getName
              if (nm.startsWith("summary_") &&
                  nm.stripPrefix("summary_").toLongOption
                    .exists(b => b != batchId && b != m.lastBatch))
                Fs.deleteTree(st.getPath.toString, conf)
            }
          }
          total
      }
    } finally { keys.unpersist(false); () }
  }

  /** Exact top-k over everything streamed so far — the d29 relation
    * with the streaming state as candidate source. Refuses (the batch
    * operator's posture) when the candidates cannot be PROVEN to
    * contain the true top-k. Output (key, n) ordered (n DESC, key). */
  def topK(spark: SparkSession, dir: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val conf = spark.sessionState.newHadoopConf()
    val meta = readMeta(dir, conf).getOrElse(
      throw new IllegalStateException(
        s"no streaming heavy-hitters state at $dir (meta.json missing)"))
    val capacity = meta.capacity
    // candidates COLLECTED eagerly (≤ capacity rows): the query's
    // execution must not re-list the summary path later, when a
    // concurrently committing batch may have superseded it (the
    // retained previous generation covers the readMeta→here window)
    import spark.implicits._
    val candKeys = spark.read.parquet(s"$dir/summary_${meta.lastBatch}")
      .select(col("key")).collect().map(_.getString(0)).toSeq
    val cands = candKeys.toDF("key")
    // corpus restricted to COMMITTED batches: an in-flight (or
    // crash-orphaned) corpus/batch=<id> dir lands BEFORE its meta flip
    // by design, and mixing its rows in would count candidates against
    // an N that excludes them — the gate would refuse spuriously, or
    // worse pass against no consistent snapshot
    val counts = spark.read.parquet(s"$dir/corpus")
      .filter(col("batch") <= meta.lastBatch)
      .join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key").agg(sum("n").as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val top = counts.orderBy(col("n").desc, col("key").asc).limit(k).collect()
      val candTotal = {
        val r = counts.agg(sum("n")).head
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      // mergeable-MG soundness: every key absent from the summary has
      // true count <= N/(capacity+1) (error adds across merges); the
      // result is the true top-k iff candidates cover the corpus or
      // the k-th exact count exceeds that bound — BigInt, the gate IS
      // the proof
      if (candTotal != meta.n) {
        val kth = if (top.length >= k) top(k - 1).getLong(1) else 0L
        if (top.length < k || BigInt(kth) * (capacity + 1) <= BigInt(meta.n))
          throw new IllegalStateException(
            s"StreamingHeavyHitters.topK: candidates cover $candTotal of " +
              s"${meta.n} rows and the k-th count $kth does not exceed " +
              s"N/(capacity+1) = ${meta.n}/${capacity + 1} — too flat for " +
              s"capacity=$capacity; retry with capacity > " +
              s"${if (kth > 0) meta.n / kth else meta.n}")
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(top.toSeq, 1),
        new org.apache.spark.sql.types.StructType()
          .add("key", org.apache.spark.sql.types.StringType)
          .add("n", org.apache.spark.sql.types.LongType))
    } finally { counts.unpersist(false); () }
  }
}
