package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Known-answer checks for the global exact-quantile fold. */
class ExactQuantilesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  // tests release the histogram cache eagerly — at spec scale the
  // persist's job-sharing doesn't matter, leak-freedom does
  private val noop: (() => Unit) => Unit = f => { f(); () }

  private def valsDf(vs: Seq[Long]) = {
    import spark.implicits._
    vs.toDF("x")
  }

  private def qmap(vs: Seq[Long], qs: Seq[Int]): Map[Long, (Long, Long, Long)] =
    ExactQuantiles.of(valsDf(vs), "x", qs)(noop).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("five-number summary on 10..19: exact lower discrete quantiles") {
    // n = 10; rank(q) = (q·9) div 1000 → q0→0, q500→4, q900→8, q1000→9
    val got = qmap((10L to 19L), Seq(0, 500, 900, 1000))
    assert(got === Map(
      0L -> ((0L, 10L, 10L)),
      500L -> ((4L, 14L, 10L)),
      900L -> ((8L, 18L, 10L)),
      1000L -> ((9L, 19L, 10L))))
  }

  test("ties collapse into one histogram row but keep exact ranks") {
    // [5,5,5,9]: median rank (500·3) div 1000 = 1 → 5; max rank 3 → 9
    val got = qmap(Seq(5L, 5L, 5L, 9L), Seq(500, 1000))
    assert(got === Map(500L -> ((1L, 5L, 4L)), 1000L -> ((3L, 9L, 4L))))
  }

  test("NULLs are excluded from ranks AND from n") {
    import spark.implicits._
    // [1, 2, NULL]: an unfiltered NULL histogram row would count into
    // n (=3) and shift the shard offsets (NULLS FIRST) while never
    // surviving the shard equi-join — q=0 would vanish entirely
    val got = Seq(Some(1L), Some(2L), Option.empty[Long]).toDF("x")
    val m = ExactQuantiles.of(got, "x", Seq(0, 1000))(noop).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m === Map(0L -> ((0L, 1L, 2L)), 1000L -> ((1L, 2L, 2L))))
  }

  test("negative values, single value, empty input, bad args") {
    // min-shifted shard key keeps the prefix order for negatives
    val got = qmap(Seq(-7L, -3L, 11L), Seq(0, 500, 1000))
    assert(got === Map(0L -> ((0L, -7L, 3L)), 500L -> ((1L, -3L, 3L)),
      1000L -> ((2L, 11L, 3L))))
    assert(qmap(Seq(42L), Seq(0, 1000)) ===
      Map(0L -> ((0L, 42L, 1L)), 1000L -> ((0L, 42L, 1L))))
    assert(ExactQuantiles.of(valsDf(Seq.empty), "x", Seq(500))(noop)
      .collect().isEmpty)
    intercept[IllegalArgumentException](
      ExactQuantiles.of(valsDf(Seq(1L)), "x", Seq.empty)(noop))
    intercept[IllegalArgumentException](
      ExactQuantiles.of(valsDf(Seq(1L)), "x", Seq(1001))(noop))
    intercept[IllegalArgumentException](
      ExactQuantiles.of(valsDf(Seq(1L)), "x", Seq(500, 500))(noop))
  }

  test("a value domain wider than a signed Long refuses loudly") {
    // hi − lo wraps negative for this pair; an unguarded shard width
    // would be negative/garbled and the quantiles silently wrong
    val wide = valsDf(Seq(Long.MinValue + 1, Long.MaxValue - 1))
    val ex = intercept[Exception](
      ExactQuantiles.of(wide, "x", Seq(0, 1000))(noop).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("ExactQuantiles")), ex.toString)
    // ...while a domain that exactly fits still works
    val edge = qmap(Seq(Long.MinValue, -1L), Seq(0, 1000))
    assert(edge === Map(0L -> ((0L, Long.MinValue, 2L)),
      1000L -> ((1L, -1L, 2L))))
  }

  test("the histogram feeds its four branches from ONE cache") {
    val thunks = scala.collection.mutable.Buffer.empty[() => Unit]
    val df = ExactQuantiles.of(valsDf(Seq(1L, 2L, 3L)), "x",
      Seq(500))(thunks.append(_))
    // exactly one release thunk, and every downstream branch reads the
    // cached histogram — measured unpersisted, exchange reuse does NOT
    // dedupe the branches (q45's fact join ran 4×), so the source scan
    // must appear only under InMemoryRelation's build plan
    assert(thunks.size === 1)
    val opt = df.queryExecution.optimizedPlan
    val caches = opt.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r }
    assert(caches.size >= 4, s"expected >=4 cache reads:\n$opt")
    assert(df.collect().map(_.getLong(2)).toSeq === Seq(2L))
    thunks.foreach(_())
  }

  test("agrees with a single-partition row_number oracle on a random-ish spread") {
    // deterministic pseudo-random longs (hash of 1..500), incl. dup
    // collisions; compare every permille decile against the textbook
    // rank definition computed driver-side
    val vs = (1L to 500L).map(i => (i * 2654435761L) % 1000L)
    val sorted = vs.sorted
    val qs = (0 to 1000 by 100)
    val got = qmap(vs, qs)
    qs.foreach { q =>
      val idx = (q.toLong * (vs.size - 1)) / 1000L
      assert(got(q.toLong) === ((idx, sorted(idx.toInt), vs.size.toLong)),
        s"q=$q")
    }
  }
}
