package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.GraftSession
import java.sql.Timestamp

/** Structured Streaming pipeline tests via MemoryStream: incremental
  * windowed aggregation, session merging, and watermark-driven state
  * closure (late data dropped). */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourly tumbling counts accumulate incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF.toDF("ts", "event_type", "value")
    val q = EventStream.hourlyCounts(df).writeStream
      .format("memory").queryName("hourly").outputMode("complete").start()
    try {
      in.addData((ts(5), "click", 1.5), (ts(20), "click", 2.0), (ts(65), "view", 3.25))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM hourly ORDER BY hour_us, event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000
      val h1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime * 1000
      assert(rows.toSeq === Seq((h0, "click", 2L, 3500000L), (h1, "view", 1L, 3250000L)))
      // a second batch lands in the same windows incrementally
      in.addData((ts(30), "click", 0.5))
      q.processAllAvailable()
      val n = spark.sql("SELECT n FROM hourly WHERE event_type = 'click'")
        .collect().head.getLong(0)
      assert(n === 3L)
    } finally q.stop()
  }

  test("session windows merge events within the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF.toDF("ts", "user_id")
    val q = EventStream.sessionize(df).writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    try {
      // user 1: events at 0, 10, 25 min (one session: gaps < 30min),
      // then 90 min (new session). user 2: one event.
      in.addData((ts(0), 1L), (ts(10), 1L), (ts(25), 1L), (ts(90), 1L), (ts(40), 2L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events FROM sessions ORDER BY user_id, session_start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((1L, 3L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("watermark: events later than 1 hour behind the max ts are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF.toDF("ts", "event_type", "value")
    // append mode: windows emit only when the watermark passes them
    val q = EventStream.hourlyCounts(df).writeStream
      .format("memory").queryName("wm").outputMode("append").start()
    try {
      in.addData((ts(5), "click", 1.0))
      q.processAllAvailable()
      // advance event time far enough to close the first window
      in.addData((ts(200), "view", 1.0))
      q.processAllAvailable()
      // this event is >1h older than the watermark → dropped
      in.addData((ts(10), "click", 99.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, total_value FROM wm ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // first window emitted with only the on-time event
      assert(rows.toSeq === Seq(("click", 1L, 1000000L)))
    } finally q.stop()
  }

  test("stream-stream join: clicks attribute to views within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.clickAttribution(
      views.toDF.toDF("ts", "user_id", "page"),
      clicks.toDF.toDF("ts", "user_id", "target"),
      windowMin = 10).writeStream
      .format("memory").queryName("attrib").outputMode("append").start()
    try {
      views.addData((ts(0), 1L, "home"), (ts(30), 2L, "docs"))
      clicks.addData(
        (ts(5), 1L, "signup"),   // 5 min after user 1's view → attributed
        (ts(20), 1L, "pricing"), // 20 min after → outside the window
        (ts(35), 2L, "api"),     // 5 min after user 2's view → attributed
        (ts(5), 3L, "nothing"))  // no view for user 3 → inner drop
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, view_page, click_target FROM attrib ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(rows.toSeq === Seq((1L, "home", "signup"), (2L, "docs", "api")))
      // a later view opens a NEW attribution window for the same user
      views.addData((ts(60), 1L, "blog"))
      clicks.addData((ts(65), 1L, "share"))
      q.processAllAvailable()
      val n = spark.sql("SELECT COUNT(*) FROM attrib").collect().head.getLong(0)
      assert(n === 3L)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unattributed clicks after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.clickAttributionOuter(
      views.toDF.toDF("ts", "user_id", "page"),
      clicks.toDF.toDF("ts", "user_id", "target"),
      windowMin = 10).writeStream
      .format("memory").queryName("attrib_outer").outputMode("append").start()
    try {
      views.addData((ts(0), 1L, "home"))
      clicks.addData((ts(5), 1L, "signup"), (ts(5), 9L, "orphan"))
      q.processAllAvailable()
      // the attributed row can emit immediately; the orphan cannot —
      // a qualifying view for user 9 could still arrive
      val early = spark.sql("SELECT user_id FROM attrib_outer")
        .collect().map(_.getLong(0)).toSet
      assert(early === Set(1L))
      // advance BOTH watermarks far past the orphan's join window:
      // now Spark can prove no match will come, and the null row emits
      views.addData((ts(600), 8L, "later"))
      clicks.addData((ts(600), 8L, "later"))
      q.processAllAvailable()
      views.addData((ts(1200), 8L, "later2"))
      clicks.addData((ts(1200), 8L, "later2"))
      q.processAllAvailable()
      val orphan = spark.sql(
        "SELECT view_page, click_target FROM attrib_outer WHERE user_id = 9")
        .collect()
      assert(orphan.length === 1)
      assert(orphan.head.isNullAt(0))
      assert(orphan.head.getString(1) === "orphan")
    } finally q.stop()
  }

  test("stream-static enrichment joins the dimension without join state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "free"), (2L, "pro"), (3L, "pro"))
      .toDF("user_id", "segment")
    val in = MemoryStream[(Timestamp, Long, Double)]
    val df = in.toDF.toDF("ts", "user_id", "value")
    val q = EventStream.enrichedHourlyBySegment(df, dim).writeStream
      .format("memory").queryName("enriched").outputMode("complete").start()
    try {
      in.addData((ts(5), 1L, 1.0), (ts(10), 2L, 2.0), (ts(20), 3L, 0.5),
        (ts(30), 9L, 100.0)) // user 9 not in the dimension → dropped (inner)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT segment, n, total_value FROM enriched ORDER BY segment")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq === Seq(("free", 1L, 1000000L), ("pro", 2L, 2500000L)))
      // a later micro-batch enriches against the same static snapshot
      in.addData((ts(40), 1L, 4.0))
      q.processAllAvailable()
      val free = spark.sql(
        "SELECT n, total_value FROM enriched WHERE segment = 'free'")
        .collect().head
      assert((free.getLong(0), free.getLong(1)) === ((2L, 5000000L)))
    } finally q.stop()
  }
}
