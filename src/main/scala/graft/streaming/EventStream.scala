package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming event pipelines — the online counterpart of the
  * q13/q14 batch queries. The reference is strictly batch (SURVEY §2.7;
  * its whitepaper lists online migration as aspiration only), so this is
  * the Spark-native extension of the surface: the same declarative
  * transforms run incrementally with watermarked state.
  *
  * Scale shape: tumbling/session windows keyed by (window, type) /
  * (user, session) shuffle once per trigger onto state-store partitions;
  * watermarks bound state size (late events beyond the watermark are
  * dropped instead of growing state forever) — that bound is what makes
  * a 100 TB/day stream sustainable.
  */
object EventStream {

  /** Streaming q13: hourly tumbling counts + value sums per event type,
    * tolerating 1 hour of lateness. Output column shapes match the batch
    * query (epoch-µs BIGINT + minor units) so downstream consumers can't
    * tell replay from live. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n"),
        (col("sum_value") * 1000000).cast("bigint").as("total_value"))

  /** Streaming q14: per-user session windows with a 30-minute gap —
    * `session_window` keeps one merging state entry per open session,
    * closed by the watermark. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))

  /** Stream-static enrichment: the streaming q05 shape — each event
    * joins a static user dimension (user_id → segment) and rolls up
    * value per (hour, segment). The static side BROADCASTS under every
    * micro-batch (stream-static joins keep no join state — the
    * watermark bounds only the window aggregation), which is exactly
    * the dimension-join posture at 100 TB/day: the stream shuffles
    * once for the windowed aggregate, the dimension never shuffles.
    * Output shapes match the batch minor-unit conventions. */
  def enrichedHourlyBySegment(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .join(broadcast(userDim), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("segment"), col("n"),
        (col("sum_value") * 1000000).cast("bigint").as("total_value"))

  /** Stream-STREAM join: click attribution — each click joins the view
    * by the same user that happened within the preceding `windowMin`
    * minutes. The time-bound predicate is what makes unbounded streams
    * joinable: with both sides watermarked, Spark derives the state
    * watermark from the bound and EVICTS view/click state older than
    * the join window + lateness — state stays proportional to the
    * window, not the stream. Inner join: a click with no recent view
    * simply never emits (the unattributable-click report is the
    * left-outer variant of the same plan, which emits nulls once the
    * watermark proves no match can arrive). */
  def clickAttribution(views: DataFrame, clicks: DataFrame,
      windowMin: Int = 10): DataFrame = {
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("page").as("view_page"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("target").as("click_target"))
    c.join(v,
      col("c_user") === col("v_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMin MINUTES"))
      .select(col("c_user").as("user_id"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("click_ts")).as("click_us"),
        col("view_page"), col("click_target"))
  }

  /** Left-outer variant of [[clickAttribution]]: every click emits —
    * attributed rows as soon as the view matches, UNattributed rows
    * (null view columns) only once the click-side state passes the
    * watermark, i.e. when Spark can PROVE no qualifying view can still
    * arrive. That proof-delay is the semantic difference from batch
    * left joins and why the outer side needs both watermarks. */
  def clickAttributionOuter(views: DataFrame, clicks: DataFrame,
      windowMin: Int = 10): DataFrame = {
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("page").as("view_page"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("target").as("click_target"))
    c.join(v,
      col("c_user") === col("v_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMin MINUTES"),
      "left_outer")
      .select(col("c_user").as("user_id"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("click_ts")).as("click_us"),
        col("view_page"), col("click_target"))
  }

  /** File-source entry: stream the events table as if it were arriving
    * (one real deployment shape: parquet drops in a landing dir). */
  def fromParquetDir(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}
