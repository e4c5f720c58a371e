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
}
