package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion against the persisted MinHash index: each
  * micro-batch dedupes against everything ingested before it, the index
  * grows batch by batch, and replayed batches re-probe but never
  * double-append. */
class StreamingIndexProbeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private def tmp(stem: String) =
    java.nio.file.Files.createTempDirectory(stem).toString

  private val t1 = (1 to 20).map(i => s"w$i").mkString(" ")
  private val other = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"

  test("batches dedupe against ALL earlier batches via the index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("sip") + "/idx"
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = StreamingIndexProbe.start(
      in.toDF.toDF("doc_id", "text"), idx, tmp("sipchk"),
      pairs => { got ++= pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))); () })
    try {
      in.addData((1L, t1), (2L, other))
      q.processAllAvailable()
      assert(got.isEmpty, "first batch has no earlier corpus to match")
      in.addData((3L, t1), (4L, "z1 z2 z3 z4 z5"))
      q.processAllAvailable()
      assert(got.toSet === Set((3L, 1L, 1000L)), "copy of a batch-1 doc")
      got.clear()
      // a copy of a BATCH-2 doc: proves batch 2 was appended, i.e. the
      // probe target is the whole ingested corpus, not the seed build
      in.addData((5L, "z1 z2 z3 z4 z5 extra"))
      q.processAllAvailable()
      assert(got.map(p => (p._1, p._2)).toSet === Set((5L -> 4L)))
    } finally q.stop()
  }

  test("a replayed batch id re-probes but never double-appends") {
    import spark.implicits._
    val idx = tmp("sipf") + "/idx"
    val b0 = Seq((1L, t1), (2L, other)).toDF("doc_id", "text")
    val b1 = Seq((3L, t1)).toDF("doc_id", "text")
    StreamingIndexProbe.processBatch(spark, idx, b0, 0L, 500)
    val first = StreamingIndexProbe.processBatch(spark, idx, b1, 1L, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first === Set((3L, 1L)))
    val countAfter = spark.read.parquet(s"$idx/signatures").count()
    // replay of batch 1 (failure/restart re-delivery): same pairs out,
    // no new rows in — the fence skips the append
    val replay = StreamingIndexProbe.processBatch(spark, idx, b1, 1L, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay === first)
    assert(spark.read.parquet(s"$idx/signatures").count() === countAfter)
    // and the NEXT batch id still appends normally
    StreamingIndexProbe.processBatch(spark, idx,
      Seq((4L, "y1 y2 y3")).toDF("doc_id", "text"), 2L, 500)
    assert(spark.read.parquet(s"$idx/signatures").count() === countAfter + 1)
  }
}
