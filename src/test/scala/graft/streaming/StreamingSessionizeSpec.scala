package graft.streaming

import graft.GraftSession
import graft.queries.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Native session_window sessionization: ONE gap definition across
  * batch and stream, gated three ways — the session_window batch form
  * reproduces q14's lag-window counts on the real events table, the
  * STREAM replay emits exactly the batch sessions, and the gap
  * boundary behaves like the batch rule on both sides (gap == 30 min
  * merges, one microsecond more splits). */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.001"

  /** Fold per-session rows to q14's per-user (n_sessions, n_events). */
  private def perUser(sessions: org.apache.spark.sql.DataFrame) =
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("sessionsBatch reproduces q14's lag-window session counts") {
    val ev = QueryDef.events(spark, dir).select("user_id", "ts", "event_id")
    val got = perUser(StreamingSessionize.sessionsBatch(ev))
    val want = graft.queries.Relational.defs("q14_sessionize")
      .build(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty && got === want)
  }

  test("stream replay emits exactly the batch sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = QueryDef.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val rows = ev.collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxUs = rows.map(_._2).max
    val in = MemoryStream[(Long, Long)]
    val stream = StreamingSessionize.sessions(
      in.toDF.toDF("user_id", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us"),
      watermarkDelay = "0 seconds")
    val q = stream.writeStream.format("memory")
      .queryName("sessionize_test").outputMode("append").start()
    try {
      in.addData(rows.toSeq: _*)
      q.processAllAvailable()
      // a far-future sentinel on a reserved user pushes the watermark
      // past every real session's end so Append mode releases them
      in.addData((-1L, maxUs + 10L * StreamingSessionize.GapUs))
      q.processAllAvailable()
      val got = perUser(spark.table("sessionize_test")
        .filter(col("user_id") =!= -1L))
      val want = perUser(StreamingSessionize.sessionsBatch(
        QueryDef.events(spark, dir).select("user_id", "ts")))
      assert(got.nonEmpty && got === want)
    } finally q.stop()
  }

  test("gap boundary matches the batch rule on both sides") {
    import spark.implicits._
    val g = StreamingSessionize.GapUs
    // user 1: second event at EXACTLY +30:00 — q14's rule (gap >
    // threshold splits) keeps one session; user 2: +30:00.000001 splits
    val ev = Seq(
      (1L, 0L), (1L, g),
      (2L, 0L), (2L, g + 1L))
      .toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = perUser(StreamingSessionize.sessionsBatch(ev))
    assert(got === Map(1L -> ((1L, 2L)), 2L -> ((2L, 2L))))
  }
}
