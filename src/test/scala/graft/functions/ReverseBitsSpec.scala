package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

class ReverseBitsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  test("reverse_bits matches java.lang.Long.reverse and keeps codegen") {
    import spark.implicits._
    ReverseBits.register(spark)
    val in = Seq(0L, 1L, 2L, 3L, 42L, Long.MaxValue, Long.MinValue, -1L)
    val out = in.toDF("x").selectExpr("reverse_bits(x) AS r")
      .collect().map(_.getLong(0)).toSeq
    assert(out === in.map(java.lang.Long.reverse))
    // synthetic sequence 0,1,2,3 scatters across the key space exactly
    // like the reference's bits.Reverse64 counter
    assert(out.take(4) === Seq(0L, Long.MinValue, 4611686018427387904L,
      Long.MinValue + 4611686018427387904L))
  }

  test("withSynthPk yields unique scattered ids") {
    import spark.implicits._
    val df = (1 to 10000).toDF("v").repartition(8)
    val ids = ReverseBits.withSynthPk(spark, df).select("synth_id")
      .collect().map(_.getLong(0))
    assert(ids.distinct.length === ids.length, "ids must be unique")
  }
}
