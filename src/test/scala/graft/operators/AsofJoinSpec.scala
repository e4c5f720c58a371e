package graft.operators

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed asof semantics: inclusive at equality, LEFT rows with
  * no at-or-before match keep NULLs, exact (key, ts) ties resolve by
  * the caller's tie-break, and right values attach ROW-level (a NULL
  * inside one right column must not splice in an older row's value). */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  test("latest at-or-before right row attaches; no match leaves NULL") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "payload")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 9L, 900L))
      .toDF("k", "rts", "v")
    val got = AsofJoin.asof(left, right, key = "k",
        leftTs = "ts", rightTs = "rts", rightVals = Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // (1,10) matches the EQUAL-ts right row (inclusive >=);
    // (1,25) takes the latest earlier row; (2,5) has none — NULL
    assert(got === Set((1L, 10L, "a", 100L), (1L, 25L, "b", 200L),
      (2L, 5L, "c", -1L)))
  }

  test("exact (key, ts) ties resolve by the tie-break column") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7L, "lo"), (1L, 10L, 9L, "hi"))
      .toDF("k", "rts", "eid", "v")
    val got = AsofJoin.asof(left, right, key = "k",
        leftTs = "ts", rightTs = "rts", rightVals = Seq("v"),
        tieBreak = Seq("eid"))
      .collect().map(_.getString(2))
    assert(got.toSeq === Seq("hi"), "the largest tie-break value wins")
  }

  test("right values attach row-level: a NULL column never splices rows") {
    import spark.implicits._
    val left = Seq((1L, 30L)).toDF("k", "ts")
    // newest right row has v2 = NULL; value-level recency would pull
    // v2 from the OLDER row while v1 comes from the newer — wrong row
    val right = Seq(
      (1L, 10L, Some(11L), Some(12L)),
      (1L, 20L, Some(21L), None))
      .toDF("k", "rts", "v1", "v2")
    val r = AsofJoin.asof(left, right, key = "k",
        leftTs = "ts", rightTs = "rts", rightVals = Seq("v1", "v2"))
      .collect().head
    assert(r.getLong(2) === 21L)
    assert(r.isNullAt(3), "v2 must be the NEWEST row's NULL, not an older value")
  }

  test("NULL right keys/timestamps never match — SQL asof semantics") {
    import spark.implicits._
    val left = Seq((1L, 50L)).toDF("k", "ts")
    // a NULL-ts right row would sort NULLS FIRST and act as ts = −∞;
    // a NULL-key right row would meet a NULL-key left partition —
    // both must be invisible, like `r.ts <= l.ts` / an equi-join
    val right = Seq(
      (Option(1L), Option.empty[Long], 99L),
      (Option.empty[Long], Option(10L), 88L))
      .toDF("k", "rts", "v")
    val r = AsofJoin.asof(left, right, key = "k",
        leftTs = "ts", rightTs = "rts", rightVals = Seq("v"))
      .collect().head
    assert(r.isNullAt(2), "NULL-ts/key right rows must never attach")
  }

  test("reserved helper and colliding output names refuse loudly") {
    import spark.implicits._
    val left = Seq((1L, 10L, 5L)).toDF("k", "ts", "v")
    val right = Seq((1L, 5L, 6L)).toDF("k", "rts", "v")
    val ex = intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, "k", "ts", "rts", Seq("v"))
    }
    assert(ex.getMessage.contains("collide"))
  }
}
