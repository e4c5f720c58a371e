package graft.streaming

import graft.GraftSession
import graft.operators.{IvfIndex, MaintenancePolicy, MinHashIndex}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The health()→maintain() loop wired into the streaming probes: a
  * long-running ingest whose index accumulates tombstone debt or
  * cluster drift must trigger EXACTLY ONE layout-preserving
  * maintenance action at the next policy check, health must return to
  * clean, and — the part that distinguishes these from the finalizing
  * compact/compactStreaming — the stream must keep appending to the
  * same index afterwards. */
class StreamingMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private def tmp(stem: String) =
    java.nio.file.Files.createTempDirectory(stem).toString

  /** Two tight blobs on orthogonal axes (StreamingIvfProbeSpec's
    * fixture): assignment structure is obvious by construction. */
  private def vec(axis: Int, jitter: Double): Seq[Double] =
    (0 until 4).map(d => if (d == axis) 10.0 + jitter else 0.1 * jitter)

  private def bootstrap(mixed: Boolean): String = {
    import spark.implicits._
    val dir = tmp("maintboot")
    (0 until 8).map(i => (100L + i, vec(if (mixed) i % 2 else 0, 0.01 * i)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("IVF: tombstone debt triggers exactly one mid-stream fold; ingest continues") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("maintivf") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(mixed = true), idx, k = 2)
    val in = MemoryStream[(Long, Seq[Double])]
    val actions = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    // imbalance dial effectively off (k=2 caps the factor at 2.0);
    // tombstone dial at 20% — tripped by the delete below, and by
    // nothing else in this run
    val policy = MaintenancePolicy(checkEvery = 1, maxTombstonePermille = 200,
      maxDuplicatePermille = 1000, maxImbalance = 100.0, minRows = 1)
    val q = StreamingIvfProbe.start(
      in.toDF.toDF("vec_id", "embedding"), idx, tmp("maintivfchk"),
      _ => (), topK = 1, maintenance = Some(policy),
      onMaintain = (b, a) => { actions += ((b, a)); () })
    try {
      in.addData((0 until 10).map(i => (i.toLong, vec(i % 2, 0.1 * i))): _*)
      q.processAllAvailable()
      assert(actions.isEmpty, "a healthy index must not be rewritten")
      // a takedown lands between micro-batches: 4 of 10 rows (40%)
      IvfIndex.delete(spark, idx,
        Seq(0L, 2L, 4L, 6L).toDF("vec_id"))
      in.addData((20L, vec(0, 0.95)), (21L, vec(1, 0.95)))
      q.processAllAvailable()
      assert(actions.toSeq === Seq((1L, "compact")),
        s"exactly one fold at the batch-1 check, got $actions")
      // health is clean again and the meta stayed streaming
      val h = IvfIndex.health(spark, idx)
      assert(h.tombstones === 0L && h.duplicateIds === 0L)
      assert(h.rows === 8L && h.publishedCount === 8L)
      val meta = IvfIndex.readMeta(idx, spark.sessionState.newHadoopConf())
      assert(meta.lastBatch === Some(1L), "fold must keep the stream fence")
      // the stream keeps appending to the folded index — and the new
      // batch's nearest neighbor is a SURVIVOR, not a deleted id
      val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      in.addData((30L, vec(0, 0.96)))
      q.processAllAvailable()
      assert(IvfIndex.readMeta(idx, spark.sessionState.newHadoopConf())
        .lastBatch === Some(2L))
      val res = IvfIndex.searchExactFrame(spark, idx,
        Seq((99L, vec(0, 0.955))).toDF("vec_id", "embedding"), topK = 12)
        .collect().map(_.getLong(1)).toSet
      assert(res.intersect(Set(0L, 2L, 4L, 6L)).isEmpty,
        s"deleted ids resurfaced after the fold: $res")
      assert(res.contains(30L), "post-fold batches must be searchable")
      got.clear()
    } finally q.stop()
  }

  test("IVF: cluster drift triggers exactly one mid-stream retrain; pruning rebalances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("maintdrift") + "/idx"
    // centroids trained on TWO blobs; the stream then delivers ONLY
    // axis-0 vectors — all land in one frozen cluster, imbalance → 2.0
    // (the k=2 maximum), the definition of drift
    IvfIndex.initStreaming(spark, bootstrap(mixed = true), idx, k = 2)
    val in = MemoryStream[(Long, Seq[Double])]
    val actions = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val policy = MaintenancePolicy(checkEvery = 1, maxTombstonePermille = 1000,
      maxDuplicatePermille = 1000, maxImbalance = 1.8, minRows = 1)
    val q = StreamingIvfProbe.start(
      in.toDF.toDF("vec_id", "embedding"), idx, tmp("maintdriftchk"),
      _ => (), topK = 1, maintenance = Some(policy),
      onMaintain = (b, a) => { actions += ((b, a)); () })
    try {
      in.addData((0 until 12).map(i => (i.toLong, vec(0, 0.2 * i))): _*)
      q.processAllAvailable()
      assert(actions.toSeq === Seq((0L, "retrain")),
        s"drifted batch must trigger exactly one retrain, got $actions")
      val hc = spark.sessionState.newHadoopConf()
      val meta = IvfIndex.readMeta(idx, hc)
      assert(meta.k === 2, "a policy retrain must not reshape the index")
      assert(meta.lastBatch === Some(0L), "retrain must keep the stream fence")
      assert(IvfIndex.health(spark, idx).imbalance <= 1.8,
        "re-clustering must rebalance the lists")
      // the stream continues: the next batch assigns against the NEW
      // centroids (appendBatch re-reads meta) and is searchable. The
      // new vector carries the largest axis value so it is the
      // max-inner-product winner for ANY axis-0 probe — MIP favors
      // norm, so "nearest" must be pinned by construction.
      in.addData((50L, vec(0, 2.5)))
      q.processAllAvailable()
      assert(actions.size === 1, s"no further action on a healthy index: $actions")
      assert(IvfIndex.readMeta(idx, hc).lastBatch === Some(1L))
      val res = IvfIndex.searchExactFrame(spark, idx,
        Seq((99L, vec(0, 2.6))).toDF("vec_id", "embedding"), topK = 1)
        .collect().map(_.getLong(1)).toSet
      assert(res === Set(50L), s"nearest must be the post-retrain vector: $res")
    } finally q.stop()
  }

  test("IVF: the fixed-list-size dial re-dials k mid-stream; search stays exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("maintlist") + "/idx"
    // bootstrap freezes k=2; the stream then grows the corpus past
    // 2·L·k = 16 rows, so a frozen k would let per-probe candidate
    // volume grow with the corpus — the dial retrains at k = ⌈rows/L⌉
    IvfIndex.initStreaming(spark, bootstrap(mixed = true), idx, k = 2)
    val in = MemoryStream[(Long, Seq[Double])]
    val actions = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val policy = MaintenancePolicy(checkEvery = 1,
      maxTombstonePermille = 1000, maxDuplicatePermille = 1000,
      maxImbalance = 100.0, minRows = 1, targetListSize = Some(4L))
    val q = StreamingIvfProbe.start(
      in.toDF.toDF("vec_id", "embedding"), idx, tmp("maintlistchk"),
      _ => (), topK = 1, maintenance = Some(policy),
      onMaintain = (b, a) => { actions += ((b, a)); () })
    try {
      in.addData((0 until 24).map(i => (i.toLong, vec(i % 4, 0.2 * i))): _*)
      q.processAllAvailable()
      assert(actions.toSeq === Seq((0L, "retrain")),
        s"exceeding 2·L lists must trigger exactly one retrain, got $actions")
      val hc = spark.sessionState.newHadoopConf()
      val meta = IvfIndex.readMeta(idx, hc)
      assert(meta.k === 6, // ⌈24/4⌉ — the re-dialed cluster count
        s"the dial must re-dial k to rows/L, got ${meta.k}")
      assert(meta.lastBatch === Some(0L), "retrain must keep the stream fence")
      // mean list is back at L: a replayed check is idempotent — the
      // next (small) batch must not retrain again
      in.addData((30L, vec(0, 5.0))) // axis-0 value 15.0 — above the
      q.processAllAvailable()        // batch's max (id 20 at 14.0)
      assert(actions.size === 1, s"no further action under 2·L·k: $actions")
      // and the re-dialed index still searches exactly: the new vector
      // carries the largest axis-0 value, so MIP pins it for an axis-0
      // probe (the drift test's construction)
      val res = IvfIndex.searchExactFrame(spark, idx,
        Seq((99L, vec(0, 5.1))).toDF("vec_id", "embedding"), topK = 1)
        .collect().map(_.getLong(1)).toSet
      assert(res === Set(30L), s"nearest must be the post-retrain vector: $res")
    } finally q.stop()
  }

  test("IVF: the stream converges its own crashed fold instead of refusing forever") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("maintrecov") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(mixed = true), idx, k = 2)
    val in = MemoryStream[(Long, Seq[Double])]
    val actions = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    // NO maintenance policy: recovery is not gated on one — the fence
    // blocks appendBatch/search regardless, so the stream must converge
    // its own crashed fold before processing either way
    val q = StreamingIvfProbe.start(
      in.toDF.toDF("vec_id", "embedding"), idx, tmp("maintrecovchk"),
      _ => (), topK = 1,
      onMaintain = (b, a) => { actions += ((b, a)); () })
    try {
      in.addData((0L, vec(0, 0.1)), (1L, vec(1, 0.1)))
      q.processAllAvailable()
      // the maintainer dies mid-fold between batches: FOLDING remains.
      // Without self-recovery the next batch's readMeta refuses and the
      // stream fails permanently — for a state its own maintenance
      // slot created and can converge
      graft.util.Fs.writeStringAtomic(s"$idx/FOLDING", "crashed\n",
        spark.sessionState.newHadoopConf())
      in.addData((2L, vec(0, 0.2)))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream failed: ${q.exception}")
      assert(actions.toSeq === Seq((1L, "recover-fold")), s"got $actions")
      assert(!new java.io.File(s"$idx/FOLDING").exists())
      val h = IvfIndex.health(spark, idx)
      assert(h.rows === 3L && h.publishedCount === 3L)
      assert(IvfIndex.readMeta(idx, spark.sessionState.newHadoopConf())
        .lastBatch === Some(1L), "the stream fence must keep advancing")
      // a RETRAINING fence is NOT self-recovered: the stream refuses
      // loudly rather than implicitly re-firing a re-cluster forever
      graft.util.Fs.writeStringAtomic(s"$idx/RETRAINING", "crashed\n",
        spark.sessionState.newHadoopConf())
      in.addData((3L, vec(1, 0.3)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(e.getMessage.contains("RETRAINING"), e.getMessage)
    } finally q.stop()
  }

  test("IVF: a crashed END-OF-STREAM compact converges the index but stops the stream loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hc = spark.sessionState.newHadoopConf()
    val idx = tmp("maintfinal") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(mixed = true), idx, k = 2)
    IvfIndex.appendBatch(spark,
      (0 until 6).map(i => (i.toLong, vec(i % 2, 0.1 * i)))
        .toDF("vec_id", "embedding"), idx, 0L)
    // the retiring compact finalized the layout (last_batch dropped)
    // but died before clearing its FOLDING marker
    IvfIndex.compact(spark, idx)
    graft.util.Fs.writeStringAtomic(s"$idx/FOLDING", "crashed\n", hc)
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingIvfProbe.start(
      in.toDF.toDF("vec_id", "embedding"), idx, tmp("maintfinalchk"),
      _ => (), topK = 1)
    try {
      in.addData((50L, vec(0, 0.5)))
      // the stream must NOT report a recovery success and then trip
      // appendBatch's generic layout rejection: it converges the index
      // and stops with the real diagnosis
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(e.getMessage.contains("finalized"), e.getMessage)
      assert(!new java.io.File(s"$idx/FOLDING").exists(),
        "the index itself must converge (marker cleared)")
      // and it is searchable again — the recovery was real
      assert(IvfIndex.searchExact(spark, idx, col("vec_id") < 2)
        .collect().nonEmpty)
    } finally q.stop()
  }

  test("MinHash: tombstone debt triggers exactly one mid-stream fold; probes stay exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("maintmh") + "/idx"
    val in = MemoryStream[(Long, String)]
    val actions = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val pairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val policy = MaintenancePolicy(checkEvery = 1, maxTombstonePermille = 200,
      maxDuplicatePermille = 1000, minRows = 1)
    val q = StreamingIndexProbe.start(
      in.toDF.toDF("doc_id", "text"), idx, tmp("maintmhchk"),
      p => { pairs ++= p.collect().map(r => (r.getLong(0), r.getLong(1))); () },
      maintenance = Some(policy),
      onMaintain = (b, a) => { actions += ((b, a)); () })
    val texts = (1 to 8).map(i =>
      (i.toLong, (1 to 20).map(j => s"w${i}_$j").mkString(" ")))
    try {
      in.addData(texts: _*)
      q.processAllAvailable()
      assert(actions.isEmpty, "a healthy index must not be rewritten")
      // takedown of 3 of 8 docs (37%) between batches
      MinHashIndex.delete(spark, idx, Seq(1L, 2L, 3L).toDF("doc_id"))
      in.addData((10L, "filler a b c d e f g h"))
      q.processAllAvailable()
      assert(actions.toSeq === Seq((1L, "compact")),
        s"exactly one fold at the batch-1 check, got $actions")
      val h = MinHashIndex.health(spark, idx)
      assert(h.tombstones === 0L && h.duplicateRows === 0L)
      assert(h.orphanBandDocs === 0L && h.missingBandDocs === 0L)
      assert(h.docs === 6L && h.publishedDocs === 6L)
      assert(h.streaming, "fold must keep the streaming layout")
      // the stream continues, and probes answer over the FOLDED corpus:
      // a near-copy of a surviving doc matches; a near-copy of a
      // deleted doc matches nothing
      pairs.clear()
      in.addData(
        (11L, (1 to 20).map(j => s"w4_$j").mkString(" ") + " tail"),
        (12L, (1 to 20).map(j => s"w1_$j").mkString(" ") + " tail"))
      q.processAllAvailable()
      assert(pairs.toSet === Set((11L, 4L)),
        s"survivor matches, deleted doc stays deleted: $pairs")
    } finally q.stop()
  }
}
