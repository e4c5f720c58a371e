package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.GraftSession

/** ArrayDot / ArrayL2Sq parity with the higher-order-function
  * formulation they replaced in the embedding hot loops: same values,
  * same fold order, same null contract — pinned against the live HOF
  * expressions on the same frame, so any Spark-side semantic drift in
  * zip_with/aggregate would surface here, not in an oracle mismatch. */
class ArrayMathSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def hofDot(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
  private def hofDotD(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
  private def hofL2(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)"

  test("long dot: parity with the HOF fold on random vectors") {
    ArrayMath.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextLong() % 1000000L),
        Array.fill(64)(rnd.nextLong() % 1000000L))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      expr("array_dot(a, b)").as("native"),
      expr(hofDot("a", "b")).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("long dot: overflow wraps exactly like SQL * and +") {
    ArrayMath.register(spark)
    import spark.implicits._
    val big = Array(Long.MaxValue / 2, Long.MaxValue / 2, 123456789L)
    val df = Seq((big, big)).toDF("a", "b")
    val r = df.select(expr("array_dot(a, b)").as("native"),
      expr(hofDot("a", "b")).as("hof")).head
    assert(r.getLong(0) === r.getLong(1))
  }

  test("double dot + l2sq: bit-identical fold order") {
    ArrayMath.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      expr("array_dot(a, b)").as("nd"), expr(hofDotD("a", "b")).as("hd"),
      expr("array_l2sq(a, b)").as("nl"), expr(hofL2("a", "b")).as("hl")).collect()
    out.foreach { r =>
      // exact equality, not tolerance: identical operation order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("null contract: null array, length mismatch, null element") {
    ArrayMath.register(spark)
    val df = spark.sql("""
      SELECT * FROM VALUES
        (cast(null as array<bigint>), array(1L, 2L)),
        (array(1L, 2L), cast(null as array<bigint>)),
        (array(1L, 2L), array(1L, 2L, 3L)),
        (array(1L, cast(null as bigint)), array(1L, 2L)),
        (array(), array()),
        (array(2L, 3L), array(4L, 5L)) AS t(a, b)""")
    val out = df.select(expr("array_dot(a, b)").as("native"),
      expr(hofDot("a", "b")).as("hof")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null parity broke: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
    // and the specific expectations, independent of the HOF model
    assert(out.take(4).forall(_.isNullAt(0)))
    assert(out(4).getLong(0) === 0L)
    assert(out(5).getLong(0) === 23L)
  }

  test("interpreted eval matches codegen (literal fold constant-folds)") {
    ArrayMath.register(spark)
    // ConstantFolding evaluates foldable expressions via eval() — the
    // interpreted path — while the frame column goes through codegen.
    val r = spark.sql(
      "SELECT array_dot(array(2L, 3L), array(4L, 5L)) AS v").head
    assert(r.getLong(0) === 23L)
    val d = spark.sql(
      "SELECT array_l2sq(array(1D, 2D), array(4D, 6D)) AS v").head
    assert(d.getDouble(0) === 25.0)
  }

  test("property: arbitrary lengths, values, and null elements match the HOF") {
    ArrayMath.register(spark)
    import org.scalacheck.{Gen, rng}
    def samples[T](gen: Gen[T], n: Int): Seq[T] =
      (0 until n).flatMap(i => gen.apply(Gen.Parameters.default,
        rng.Seed(91L + i)))
    val elem: Gen[java.lang.Long] = Gen.frequency(
      9 -> Gen.chooseNum(-1000000L, 1000000L).map(java.lang.Long.valueOf),
      1 -> Gen.const(null: java.lang.Long))
    val arr: Gen[Seq[java.lang.Long]] = Gen.chooseNum(0, 9)
      .flatMap(n => Gen.listOfN(n, elem))
    val pair = for { a <- arr; b <- arr } yield (a, b)
    val rows = samples(pair, 60)
    val sql = rows.map { case (a, b) =>
      def lit(x: Seq[java.lang.Long]) =
        x.map(v => if (v == null) "cast(null as bigint)" else s"${v}L")
          .mkString("array(", ", ", ")")
      s"SELECT ${lit(a)} AS a, ${lit(b)} AS b"
    }.mkString(" UNION ALL ")
    val out = spark.sql(
      s"SELECT array_dot(a, b) AS native, ${hofDot("a", "b")} AS hof FROM ($sql)")
      .collect()
    assert(out.length === rows.length)
    out.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null parity broke: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("type check rejects mismatched element types") {
    ArrayMath.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT array_dot(array(1L), array(1.5D))").head
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
