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
    // helper names routed via rightVals/tieBreak must refuse too — they
    // would otherwise build a nested helper struct instead of failing
    val right2 = Seq((1L, 5L, 6L)).toDF("k", "rts", "__asof_r")
    val ex2 = intercept[IllegalArgumentException] {
      AsofJoin.asof(left.drop("v"), right2, "k", "ts", "rts", Seq("__asof_r"))
    }
    assert(ex2.getMessage.contains("reserved"))
  }

  /** Skewed corpus: key 1L carries 80% of both sides, timestamps span
    * the whole domain. Deterministic pseudo-random ts via a multiplier
    * mod a prime so every shard gets both carry-only and mixed cases. */
  private def skewCorpus = {
    import spark.implicits._
    val hotL = (0 until 800).map(i => (1L, (i * 131L) % 997L, i.toLong))
    val coldL = (0 until 200).map(i => ((2 + i % 9).toLong, (i * 173L) % 997L, 1000L + i))
    val left = (hotL ++ coldL).toDF("k", "ts", "lid")
    val hotR = (0 until 400).map(i => (1L, (i * 211L) % 991L, 10000L + i, i * 3L))
    val coldR = (0 until 100).map(i => ((2 + i % 9).toLong, (i * 193L) % 991L, 20000L + i, i * 7L))
    val right = (hotR ++ coldR).toDF("k", "rts", "eid", "v")
    (left, right)
  }

  test("sharded plan equals the single window on a hot-key corpus (80% one key)") {
    val (left, right) = skewCorpus
    val base = AsofJoin.asof(left, right, "k", "ts", "rts",
      Seq("v", "eid"), tieBreak = Seq("eid"))
    val sharded = AsofJoin.asof(left, right, "k", "ts", "rts",
      Seq("v", "eid"), tieBreak = Seq("eid"), shards = 8)
    def key(r: org.apache.spark.sql.Row) =
      (0 until r.length).map(i => if (r.isNullAt(i)) "∅" else r.get(i).toString)
        .mkString("|")
    assert(sharded.collect().map(key).sorted.toSeq ===
      base.collect().map(key).sorted.toSeq)
    // the skew pin: the running-last window partitions by (key, shard),
    // so the hot key is `shards` independent sorted runs, not one task
    val plan = sharded.queryExecution.executedPlan.toString
    assert(plan.contains("__asof_shard"), plan)
    val winLines = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("__asof_r"))
      .toSeq
    // nonEmpty first: forall over an empty filter would pass vacuously
    // if Spark's plan rendering ever stops matching the line filter
    assert(winLines.nonEmpty,
      s"no running-last window line found in plan rendering:\n$plan")
    assert(winLines.forall(_.contains("__asof_shard")),
      s"running-last window must partition on the shard:\n$plan")
    // and the crafted hot key genuinely spans > 1 shard: ts covers
    // [0, 996] of a [0, 996] domain, so with 8 shards the first and
    // last hot timestamps cannot share a bucket
    val hotTs = (0 until 800).map(i => (i * 131L) % 997L)
    assert(hotTs.min == 0L && hotTs.max >= 900L)
  }

  test("sharded: carry-in crosses empty shards; degenerate domains stay exact") {
    import spark.implicits._
    // ONE right row at t=0, left rows far later — every left shard but
    // the first needs the carry-in, and intermediate shards are empty
    val left = Seq((1L, 500L), (1L, 700L), (1L, 999L)).toDF("k", "ts")
    val right = Seq((1L, 0L, 42L)).toDF("k", "rts", "v")
    val got = AsofJoin.asof(left, right, "k", "ts", "rts", Seq("v"),
        shards = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((500L, 42L), (700L, 42L), (999L, 42L)))
    // width-0 domain (all timestamps equal): everything in shard 0
    val l2 = Seq((1L, 10L)).toDF("k", "ts")
    val r2 = Seq((1L, 10L, 5L)).toDF("k", "rts", "v")
    val one = AsofJoin.asof(l2, r2, "k", "ts", "rts", Seq("v"), shards = 4)
      .collect().head
    assert(one.getLong(2) === 5L)
    // NULL left ts under sharding keeps NULL right values
    val l3 = Seq((Option(1L), Option.empty[Long])).toDF("k", "ts")
    val n = AsofJoin.asof(l3, r2, "k", "ts", "rts", Seq("v"), shards = 4)
      .collect().head
    assert(n.isNullAt(2))
    // all-NULL ts everywhere: sharded path returns all-left with NULLs
    val rEmpty = Seq((Option(1L), Option.empty[Long], Option(5L)))
      .toDF("k", "rts", "v")
    val e = AsofJoin.asof(l3, rEmpty, "k", "ts", "rts", Seq("v"), shards = 4)
      .collect().head
    assert(e.isNullAt(2))
  }
}
