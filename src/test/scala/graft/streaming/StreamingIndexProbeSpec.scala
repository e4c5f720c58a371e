package graft.streaming

import graft.GraftSession
import graft.operators.MinHashIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion against the persisted MinHash index: each
  * micro-batch dedupes against everything ingested before it, the index
  * grows batch by batch, replays heal instead of double-inserting,
  * within-batch pairs never leak (first delivery or replay), and
  * batch-id-space restarts fail loudly. */
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

  test("a replayed committed batch re-probes but writes nothing") {
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
    // no new rows in — appendBatch sees the committed id and skips
    val replay = StreamingIndexProbe.processBatch(spark, idx, b1, 1L, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay === first)
    assert(spark.read.parquet(s"$idx/signatures").count() === countAfter)
    // and the NEXT batch id still appends normally
    StreamingIndexProbe.processBatch(spark, idx,
      Seq((4L, "y1 y2 y3")).toDF("doc_id", "text"), 2L, 500)
    assert(spark.read.parquet(s"$idx/signatures").count() === countAfter + 1)
  }

  test("within-batch near-dups never leak, even on replay") {
    import spark.implicits._
    val idx = tmp("sipw") + "/idx"
    val t2 = (1 to 20).map(i => s"v$i").mkString(" ")
    StreamingIndexProbe.processBatch(spark, idx,
      Seq((1L, t1)).toDF("doc_id", "text"), 0L, 500)
    // batch 1 carries two copies of a NEW text: no pairs on first
    // delivery (the batch isn't indexed while it probes) ...
    val b1 = Seq((7L, t2), (8L, t2)).toDF("doc_id", "text")
    assert(StreamingIndexProbe.processBatch(spark, idx, b1, 1L, 500)
      .count() === 0L)
    // ... and none on replay either, although docs 7/8 now ARE in the
    // index — the base-in-batch exclusion catches what the probe's
    // same-id self-pair filter cannot
    assert(StreamingIndexProbe.processBatch(spark, idx, b1, 1L, 500)
      .count() === 0L)
    // an uncommitted partial append (crash window) is healed by the
    // overwrite: rewriting the same batch dirs leaves one copy
    assert(spark.read.parquet(s"$idx/signatures")
      .where("doc_id IN (7, 8)").count() === 2L)
  }

  test("a restarted batch-id space fails loudly instead of corrupting") {
    import spark.implicits._
    val idx = tmp("sipr") + "/idx"
    StreamingIndexProbe.processBatch(spark, idx,
      Seq((1L, t1)).toDF("doc_id", "text"), 0L, 500)
    StreamingIndexProbe.processBatch(spark, idx,
      Seq((2L, other)).toDF("doc_id", "text"), 1L, 500)
    val e = intercept[IllegalStateException] {
      StreamingIndexProbe.processBatch(spark, idx,
        Seq((9L, "n1 n2 n3")).toDF("doc_id", "text"), 0L, 500)
    }
    assert(e.getMessage.contains("restarted"))
    // the flat batch-API append is also rejected on this layout
    val e2 = intercept[IllegalArgumentException] {
      MinHashIndex.append(spark, Seq((9L, "n1 n2 n3")).toDF("doc_id", "text"), idx)
    }
    assert(e2.getMessage.contains("streaming-layout"))
  }
}
