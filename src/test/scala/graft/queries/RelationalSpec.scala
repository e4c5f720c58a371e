package graft.queries

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Known-answer checks for the relational/events queries whose DuckDB
  * oracle only proves cross-engine agreement, not intent. */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  test("q21: funnel counts strictly-ordered first events only") {
    import spark.implicits._
    val t0 = 1700000000000000L // epoch micros
    def ts(k: Long) = new java.sql.Timestamp((t0 + k * 1000000L) / 1000L)
    // user 1: full ordered funnel; user 2: view BEFORE signup (stops at
    // s1); user 3: signup only; user 4: no click, so purchase can't
    // count either; user 5: view at the SAME instant as signup — the
    // strictly-after rule rejects it
    val rows = Seq(
      (1L, ts(0), 1L, "signup"), (2L, ts(1), 1L, "view"),
      (3L, ts(2), 1L, "click"), (4L, ts(3), 1L, "purchase"),
      (5L, ts(0), 2L, "view"), (6L, ts(1), 2L, "signup"),
      (7L, ts(0), 3L, "signup"),
      (8L, ts(0), 4L, "signup"), (9L, ts(1), 4L, "view"),
      (10L, ts(2), 4L, "purchase"),
      (11L, ts(0), 5L, "signup"), (12L, ts(0), 5L, "view"))
    val dir = Files.createTempDirectory("graft_q21").toString
    try {
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = Relational.defs("q21_funnel").build(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out === Map("s1_signup" -> 5L, "s2_view" -> 2L,
        "s3_click" -> 1L, "s4_purchase" -> 1L))
    } finally {
      val p = java.nio.file.Paths.get(dir)
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
  }

  private def withEventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, String)])(
      body: String => Unit): Unit = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rel").toString
    try {
      rows.toDF("event_id", "ts", "user_id", "event_type", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      body(dir)
    } finally {
      val p = java.nio.file.Paths.get(dir)
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
  }

  test("q41: JSON extraction drops malformed/missing k from the k aggregates only") {
    val t = new java.sql.Timestamp(1700000000000L)
    withEventsDir(Seq(
      (1L, t, 1L, "click", """{"k": 7}"""),
      (2L, t, 1L, "click", """{"k": 11}"""),
      (3L, t, 1L, "click", """not json at all"""), // malformed → NULL k
      (4L, t, 1L, "click", """{"other": 3}"""), // no k field → NULL k
      (5L, t, 2L, "view", """{"k": -4}"""))) { dir =>
      val out = Relational.defs("q41_props_json").build(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      // n counts every row; n_with_k / sum / min / max see only parsed ks
      assert(out("click") === ((4L, 2L, 18L, 7L, 11L)))
      assert(out("view") === ((1L, 1L, -4L, -4L, -4L)))
    }
  }

  test("q43: only first-view→first-purchase users count; exact ranks") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    val t0 = 1700000000000000L
    withEventsDir(Seq(
      // user 1 converts after 100 ms (first view / first purchase win;
      // java.sql.Timestamp is ms-grained, so gaps must be >= 1 ms)
      (1L, ts(t0), 1L, "view", "{}"), (2L, ts(t0 + 100000), 1L, "purchase", "{}"),
      (3L, ts(t0 + 999000), 1L, "purchase", "{}"),
      // user 2 converts after 300 ms
      (4L, ts(t0), 2L, "view", "{}"), (5L, ts(t0 + 300000), 2L, "purchase", "{}"),
      // user 3 purchased BEFORE viewing → excluded
      (6L, ts(t0 + 50000), 3L, "view", "{}"), (7L, ts(t0), 3L, "purchase", "{}"),
      // user 4 never purchases → excluded
      (8L, ts(t0), 4L, "view", "{}"))) { dir =>
      val out = Relational.defs("q43_time_to_convert").build(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // n = 2 converters: ranks (q·1) div 1000 → 0,0,0,1
      assert(out === Map(
        0L -> ((0L, 100000L, 2L)), 500L -> ((0L, 100000L, 2L)),
        900L -> ((0L, 100000L, 2L)), 1000L -> ((1L, 300000L, 2L))))
    }
  }

  test("q44: trailing window counts distinct users; weeks with no activity vanish") {
    val wk = 604800000000L
    val w0 = (1700000000000000L / wk) * wk
    def ts(week: Long) = new java.sql.Timestamp((w0 + week * wk) / 1000L)
    withEventsDir(Seq(
      // week 0: users 1, 2; week 1: user 1 (twice — dedup); week 4: user 3
      (1L, ts(0), 1L, "view", "{}"), (2L, ts(0), 2L, "view", "{}"),
      (3L, ts(1), 1L, "view", "{}"), (4L, ts(1), 1L, "click", "{}"),
      (5L, ts(4), 3L, "view", "{}"))) { dir =>
      val base = w0 / wk
      val out = Relational.defs("q44_stickiness").build(spark, dir)
        .collect()
        .map(r => (r.getLong(0) - base) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // w0: wau {1,2}=2, window [w-3,w0] = {1,2} → 1e6
      // w1: wau {1}=1, window [w-2,w1] ⊇ weeks 0,1 = {1,2} → 500000
      // w4: wau {3}=1, window [1,4] = weeks 1,4 = {1,3} → 500000
      // weeks 2, 3 had no activity → no rows
      assert(out === Map(
        0L -> ((2L, 2L, 1000000L)),
        1L -> ((1L, 2L, 500000L)),
        4L -> ((1L, 2L, 500000L))))
    }
  }

  test("q42: cohort = first epoch-week, offsets count distinct users") {
    val wk = 604800000000L // µs per week
    // epoch-week boundary alignment is irrelevant; pick week w0 inside
    // a single bucket and step whole weeks from it
    val w0 = (1700000000000000L / wk) * wk
    def ts(week: Long) = new java.sql.Timestamp((w0 + week * wk) / 1000L)
    withEventsDir(Seq(
      // user 1: weeks 0,1,3 — cohort 0, offsets 0,1,3
      (1L, ts(0), 1L, "view", "{}"), (2L, ts(1), 1L, "view", "{}"),
      (3L, ts(3), 1L, "view", "{}"),
      // user 2: two events in week 0 (dedup to one active week)
      (4L, ts(0), 2L, "view", "{}"), (5L, ts(0), 2L, "click", "{}"),
      // user 3: cohort week 1, active weeks 1,2
      (6L, ts(1), 3L, "view", "{}"), (7L, ts(2), 3L, "view", "{}"))) { dir =>
      val base = w0 / wk
      val out = Relational.defs("q42_retention_cohorts").build(spark, dir)
        .collect().map(r => (r.getLong(0) - base, r.getLong(1)) -> r.getLong(2)).toMap
      assert(out === Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
        (1L, 0L) -> 1L, (1L, 1L) -> 1L))
    }
  }
}
