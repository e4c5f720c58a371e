package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — q14's batch operator (30-minute-gap
  * sessions per user) running continuously on Spark's NATIVE
  * `session_window` aggregation: gap-merged event-time windows in the
  * state store, closed and emitted in Append mode once the watermark
  * passes a session's end. No custom state machine: the built-in
  * operator merges overlapping windows per key inside the state store
  * (codegen'd, spillable), which is the Spark-first answer to session
  * windows — `flatMapGroupsWithState` is reserved for semantics the
  * built-ins genuinely can't express (StatefulDedup's cross-batch
  * first-wins identity).
  *
  * 100 TB shape: state holds OPEN sessions only — bounded by users
  * active inside the watermark horizon, not by stream length; output
  * is append-only (a session emits exactly once, when it closes), so
  * downstream sinks never rewrite. One shuffle on user_id into the
  * stateful aggregation, exactly like the batch query's one shuffle.
  *
  * Boundary parity with q14: the batch rule starts a new session when
  * the gap EXCEEDS the threshold (gap > 30 min), i.e. a gap of exactly
  * 30:00.000000 continues the session. `session_window`'s merge is
  * INCLUSIVE at the open window's end (an event at exactly
  * start + gap extends the session — measured, and pinned both ways
  * by StreamingSessionizeSpec's exact-boundary case), so a gap
  * duration of exactly 30 minutes reproduces the batch rule on every
  * microsecond-grained input: gap == 30:00 merges, 30:00.000001
  * splits.
  */
object StreamingSessionize {

  /** q14's session gap: events further apart than this start a new
    * session (microseconds). */
  val GapUs: Long = 1800L * 1000000L

  // a STRING gap (parsed to CalendarIntervalType) — an INTERVAL
  // literal arrives as DayTimeIntervalType, which session_window
  // refuses
  private val gapStr = s"$GapUs microseconds"

  /** Per-session rows from a STREAMING (user_id, ts) frame:
    * (user_id, session_start, session_end, n_events). Append mode —
    * rows surface once the watermark passes session end + gap. The
    * watermark delay is a dial: late events inside it still merge into
    * their session; beyond it they are dropped (the documented
    * lateness contract of every watermarked aggregation). */
  def sessions(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gapStr))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** The SAME session relation over a batch frame — one definition of
    * the gap/boundary semantics for both execution modes, so the spec
    * can gate stream ≡ batch ≡ q14's lag-window form on identical
    * input. (In batch, session_window needs no watermark.) */
  def sessionsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gapStr))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
