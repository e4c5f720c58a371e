package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** The Morton-interleave kernel and the layout property it buys:
  * contiguous z-ranges bound BOTH dimensions (the data-skipping
  * argument c24 audits), where a single-column order bounds one. */
class ZValueSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  test("hand-computed interleaves, kernel ≡ SQL form ≡ Column form") {
    // (3, 5): x bits 011 → positions 0,2; y bits 101 → positions 1,5
    // → 1 + 4 + 2 + 32 = 39
    assert(ZValue.compute(0L, 0L) === 0L)
    assert(ZValue.compute(1L, 0L) === 1L)
    assert(ZValue.compute(0L, 1L) === 2L)
    assert(ZValue.compute(3L, 5L) === 39L)
    // full 31-bit fans: x fills the even positions, y the odd
    assert(ZValue.compute((1L << 31) - 1, 0L) === 0x1555555555555555L)
    assert(ZValue.compute(0L, (1L << 31) - 1) === 0x2aaaaaaaaaaaaaaaL)
    val viaSql = spark.sql("SELECT zvalue(3L, 5L)").collect()(0).getLong(0)
    assert(viaSql === 39L)
    import spark.implicits._
    val viaCol = Seq((3L, 5L)).toDF("x", "y")
      .select(ZValue.of(col("x"), col("y"))).collect()(0).getLong(0)
    assert(viaCol === 39L)
  }

  test("out-of-range coordinates refuse loudly, never mask") {
    import spark.implicits._
    def z(x: Long, y: Long) = Seq((x, y)).toDF("x", "y")
      .select(ZValue.of(col("x"), col("y"))).collect()
    val e1 = intercept[Exception](z(-1L, 0L))
    assert(e1.getMessage.contains("zvalue") ||
      e1.getCause != null && e1.getCause.getMessage.contains("zvalue"))
    intercept[Exception](z(0L, 1L << 31))
    // NULL propagates (null-intolerant binary expression), no error
    val n = Seq((Some(3L), Option.empty[Long])).toDF("x", "y")
      .select(ZValue.of(col("x"), col("y"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("z-range tiles bound BOTH dims; row-major order leaves one unbounded") {
    // the full 64×64 grid: z is then a bijection onto 0..4095, so
    // grouping by z div 256 models 16 parquet files each holding an
    // exact contiguous z-range (sampling-free — this is the footer
    // stats argument, not a repartition test)
    val grid = spark.range(4096).select(
      expr("id div 64").as("x"), pmod(col("id"), lit(64)).as("y"),
      col("id"))
    val zspans = grid
      .withColumn("z", ZValue.of(col("x"), col("y")))
      .groupBy(expr("z div 256"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(zspans.length === 16)
    // every z file is an exact 16×16 tile: both envelopes tight
    zspans.foreach { r =>
      assert(r.getLong(1) === 15L && r.getLong(2) === 15L, r.toString) }
    // the row-major layout (order by id): x envelopes are tight but
    // every file spans the FULL y axis — a y predicate prunes nothing
    val idspans = grid.groupBy(expr("id div 256"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(idspans.forall(_.getLong(2) === 63L))
  }

  test("layout() clusters files on both dims and drops its key") {
    val grid = spark.range(4096).select(
      expr("id div 64").as("x"), pmod(col("id"), lit(64)).as("y"))
    val laid = ZValue.layout(grid, col("x"), col("y"), 16)
    assert(laid.columns.toSeq === Seq("x", "y"), laid.columns.toSeq)
    assert(laid.count() === 4096L)
    // per output partition ("file"), both envelopes are narrow —
    // sampled range boundaries can merge two z-adjacent tiles, and a
    // boundary tile pair straddling the major-axis midpoint wraps the
    // minor axis, so the guarantee is "well under the full span" (≤
    // half), not the exact-tile 15 of the bijective grouping above
    val spans = laid
      .groupBy(spark_partition_id().as("p"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.nonEmpty)
    val avgX = spans.map(_.getLong(1)).sum.toDouble / spans.length
    val avgY = spans.map(_.getLong(2)).sum.toDouble / spans.length
    assert(avgX <= 32.0 && avgY <= 32.0, s"avg spans: $avgX, $avgY")
  }

  test("layout() preserves a caller column named __graft_z") {
    // withColumn REPLACES an existing column — an unguarded sort key
    // would overwrite (then drop) the caller's data
    val df = spark.range(8).select(col("id").as("x"), col("id").as("y"),
      (col("id") * 100).as("__graft_z"))
    val laid = ZValue.layout(df, col("x"), col("y"), 2)
    assert(laid.columns.toSeq === Seq("x", "y", "__graft_z"))
    assert(laid.select(sum("__graft_z")).head.getLong(0) === 2800L)
  }
}
