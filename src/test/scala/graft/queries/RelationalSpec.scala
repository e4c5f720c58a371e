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
}
