package graft.streaming

import graft.GraftSession
import graft.operators.HeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming heavy-hitters twin against the batch operator: a
  * corpus streamed in micro-batches answers the SAME exact top-k as
  * d29's one-shot operator (the merged MG summaries keep every
  * provably-heavy key as a candidate; the exact pass + gate do the
  * rest), committed replays are bit-identical no-ops, and a too-flat
  * stream refuses loudly instead of answering approximately. */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private def tmp(stem: String) =
    java.nio.file.Files.createTempDirectory(stem).toString

  /** Skewed corpus: 5 heads well above the mergeable bound plus a
    * distinct-singleton tail, dealt round-robin into `parts` slices so
    * every batch carries a share of each head. */
  private def skewed(parts: Int): Seq[Seq[String]] = {
    val heads = Seq("h1" -> 400, "h2" -> 300, "h3" -> 200, "h4" -> 150,
      "h5" -> 100)
    val all = heads.flatMap { case (k, n) => Seq.fill(n)(k) } ++
      (0 until 200).map(i => s"tail$i")
    all.zipWithIndex.groupBy(_._2 % parts).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
  }

  test("stream topK equals the batch operator over the full corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("shh")
    val in = MemoryStream[String]
    val batches = skewed(3)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StreamingHeavyHitters.start(in.toDF.toDF("key"), dir,
      tmp("shhchk"), capacity = 64,
      onBatch = (id, n) => { seen += ((id, n)); () })
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(seen.map(_._1) === Seq(0L, 1L, 2L))
    assert(seen.last._2 === batches.map(_.size).sum.toLong)

    val streamTop = StreamingHeavyHitters.topK(spark, dir, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batchTop = HeavyHitters.topK(spark,
        batches.flatten.toDF("key"), "key", k = 5, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamTop === batchTop)
    assert(streamTop === Seq("h1" -> 400L, "h2" -> 300L, "h3" -> 200L,
      "h4" -> 150L, "h5" -> 100L))
  }

  test("a replayed committed batch heals the corpus and changes nothing") {
    import spark.implicits._
    val dir = tmp("shhr")
    val b0 = skewed(2).head.toDF("key")
    val b1 = skewed(2)(1).toDF("key")
    val n0 = StreamingHeavyHitters.processBatch(spark, dir, b0, 0L, 64)
    val n1 = StreamingHeavyHitters.processBatch(spark, dir, b1, 1L, 64)
    val before = StreamingHeavyHitters.topK(spark, dir, 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // re-delivery of the committed batch 1 (crash/restart): total N is
    // unchanged (no double count), the summary is untouched, and the
    // answer is bit-identical
    val nReplay = StreamingHeavyHitters.processBatch(spark, dir, b1, 1L, 64)
    assert(nReplay === n1)
    assert(n1 > n0)
    val after = StreamingHeavyHitters.topK(spark, dir, 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(after === before)
  }

  test("uncommitted in-flight corpus batches stay invisible to topK") {
    import spark.implicits._
    val dir = tmp("shhv")
    skewed(2).zipWithIndex.foreach { case (b, i) =>
      StreamingHeavyHitters.processBatch(spark, dir, b.toDF("key"), i.toLong,
        64)
    }
    val committed = StreamingHeavyHitters.topK(spark, dir, 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // simulate the mid-commit window: a new batch's corpus dir lands
    // BEFORE its meta flip (processBatch's documented step order) —
    // its counts must not leak into the exact pass, in either gate
    // direction (h1 inflated, or candTotal exceeding the committed N)
    Seq.fill(100000)("h1").toDF("key")
      .groupBy("key").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$dir/corpus/batch=2")
    val during = StreamingHeavyHitters.topK(spark, dir, 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(during === committed)
  }

  test("a restart re-dialing capacity refuses; topK rides the stored dial") {
    import spark.implicits._
    val dir = tmp("shhc")
    val b = skewed(1).head.toDF("key")
    StreamingHeavyHitters.processBatch(spark, dir, b, 0L, capacity = 64)
    // the mergeable bound N/(capacity+1) is a property of the state:
    // merging a batch under a different dial would silently weaken it
    val ex = intercept[IllegalArgumentException] {
      StreamingHeavyHitters.processBatch(spark, dir,
        Seq("x").toDF("key"), 1L, capacity = 128)
    }
    assert(ex.getMessage.contains("capacity=64"))
    // topK needs no caller-supplied capacity — and so cannot be handed
    // a larger one that the summary never met
    val top = StreamingHeavyHitters.topK(spark, dir, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top.head === ("h1" -> 400L))
  }

  test("a flat stream refuses loudly at query time, naming the capacity") {
    import spark.implicits._
    val dir = tmp("shhf")
    val flat = (0 until 500).map(i => s"k$i").toDF("key")
    StreamingHeavyHitters.processBatch(spark, dir, flat, 0L, capacity = 16)
    val ex = intercept[IllegalStateException] {
      StreamingHeavyHitters.topK(spark, dir, k = 3)
    }
    assert(ex.getMessage.contains("too flat"))
    // querying a dir with no committed state refuses too
    val ex2 = intercept[IllegalStateException] {
      StreamingHeavyHitters.topK(spark, tmp("shhempty"), k = 3)
    }
    assert(ex2.getMessage.contains("meta.json missing"))
  }
}
