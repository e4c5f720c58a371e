package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The binned band join against the naive predicate, exactly —
  * boundary inclusivity, bucket-edge pairs (the ±1 replication), the
  * keyed variant, negative timestamps (floor- vs truncate-division),
  * and the plan promise: no nested-loop join in the physical plan. */
class BandJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def naive(l: Seq[(Long, Long)], r: Seq[Long], band: Long) =
    (for { (id, lt) <- l; rt <- r if math.abs(lt - rt) <= band }
      yield (id, lt, rt)).toSet

  test("equals the naive cross filter incl. exact-band and bucket-edge pairs") {
    import spark.implicits._
    val band = 100L
    // pairs straddling bucket edges (99→101), at exactly the band
    // (0→100, inclusive), one past it (0→101 excluded), and far apart
    val lRows = Seq((1L, 0L), (2L, 99L), (3L, 250L), (4L, 1000L))
    val rRows = Seq(100L, 101L, 199L, 350L, 5000L)
    val got = BandJoin.pairs(
        lRows.toDF("id", "ts"), rRows.toDF("rts"),
        leftTs = "ts", rightTs = "rts", band = band)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive(lRows, rRows, band))
    assert(got.contains((1L, 0L, 100L)) && !got.exists(p => p._1 == 1L && p._3 == 101L))
  }

  test("negative timestamps bucket by FLOOR division, not truncation") {
    import spark.implicits._
    // −1 and 1 are 2 apart (≤ band) but truncate-division puts both in
    // bucket 0 of their own sign — floor division must pair them
    val got = BandJoin.pairs(
        Seq((1L, -1L)).toDF("id", "ts"), Seq(1L, -150L).toDF("rts"),
        leftTs = "ts", rightTs = "rts", band = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === Set((1L, 1L)))
  }

  test("keyCols restrict pairs to the equi-key") {
    import spark.implicits._
    val got = BandJoin.pairs(
        Seq((1L, 10L, 100L), (2L, 20L, 100L)).toDF("k", "id", "ts"),
        Seq((1L, 90L), (2L, 500L)).toDF("k", "rts"),
        leftTs = "ts", rightTs = "rts", band = 50L, keyCols = Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L))) // key 2's only candidate is out of band
  }

  test("the physical plan is an equi-join — no nested loop, no cartesian") {
    import spark.implicits._
    val df = BandJoin.pairs(
      Seq((1L, 0L)).toDF("id", "ts"), Seq(1L).toDF("rts"),
      leftTs = "ts", rightTs = "rts", band = 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("overlapping non-key columns refuse loudly") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      BandJoin.pairs(Seq((1L, 2L)).toDF("ts", "v"),
        Seq((3L, 4L)).toDF("rts", "v"),
        leftTs = "ts", rightTs = "rts", band = 10L)
    }
    assert(ex.getMessage.contains("alias"))
  }

  test("nearest equals the naive per-left top-k with deterministic ties") {
    import spark.implicits._
    val band = 100L
    val lRows = Seq((1L, 0L), (2L, 99L), (3L, 250L), (4L, 1000L))
    // includes equidistant before/after candidates for the tie path
    val rRows = Seq((10L, 100L), (11L, -100L), (12L, 50L), (13L, 149L),
      (14L, 199L), (15L, 260L), (16L, 240L), (17L, 5000L))
    val got = BandJoin.nearest(
        lRows.toDF("id", "ts"), rRows.toDF("eid", "rts"),
        leftId = "id", leftTs = "ts", rightTs = "rts", band = band,
        k = 2, tieBreak = Seq("eid"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    val naiveTopK = (for ((id, lt) <- lRows) yield {
      rRows.filter { case (_, rt) => math.abs(lt - rt) <= band }
        .sortBy { case (eid, rt) => (math.abs(lt - rt), eid, rt) }
        .take(2).zipWithIndex
        .map { case ((eid, _), i) => (id, eid, i + 1L) }
    }).flatten.toSet
    assert(got === naiveTopK)
  }

  test("nearest: a planted dense window caps via PARTIAL WindowGroupLimit") {
    import spark.implicits._
    // one left row with 500 in-band candidates — pairs() would emit
    // 500 rows for it; nearest(k=3) must emit exactly 3, and the cap
    // must run in partial mode BELOW the window exchange so the dense
    // window's pair volume never crosses the shuffle
    val left = Seq((1L, 0L)).toDF("id", "ts")
    val right = (0 until 500).map(i => (100L + i, (i % 90).toLong - 45L))
      .toDF("eid", "rts")
    val df = BandJoin.nearest(left, right, leftId = "id",
      leftTs = "ts", rightTs = "rts", band = 50L, k = 3,
      tieBreak = Seq("eid"))
    val rows = df.collect()
    assert(rows.length === 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined,
      s"the cap must run below the exchange (partial mode):\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
