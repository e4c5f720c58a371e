package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-shuffle top-k against the full groupBy, exactly — on
  * real corpus tokens and on a crafted skew; plus the soundness
  * refusal on a distribution too flat for the capacity. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def full(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("equals the full groupBy top-k on real corpus tokens") {
    val tokens = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(expr(
        "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"))
        .as("token"))
    val got = HeavyHitters.topK(spark, tokens, "token", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === full(tokens, 10))
  }

  test("survives capacity far below the cardinality when heads dominate") {
    import spark.implicits._
    // 5 heavy keys (1000 each) among 2000 singletons; capacity 64 ≪
    // 2005 distinct keys — MG must still surface every head
    val rows = (0 until 5).flatMap(h => Seq.fill(1000)(s"head$h")) ++
      (0 until 2000).map(i => s"tail$i")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("token")
    val got = HeavyHitters.topK(spark, df, "token", k = 5, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === (0 until 5).map(h => (s"head$h", 1000L)).toSet)
  }

  test("fewer than k distinct keys is fine when candidates cover the corpus") {
    import spark.implicits._
    // 3 distinct keys, k = 5: full coverage (candTotal == n) proves
    // nothing was dropped, so the short result is exact, not a refusal
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c"))
      .toDF("token")
    val got = HeavyHitters.topK(spark, df, "token", k = 5, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 30L), ("b", 20L), ("c", 10L)))
  }

  test("a too-flat distribution refuses instead of answering approximately") {
    import spark.implicits._
    val df = spark.sparkContext
      .parallelize((0 until 5000).map(i => s"k$i"), 8).toDF("token")
    val ex = intercept[IllegalStateException] {
      HeavyHitters.topK(spark, df, "token", k = 5, capacity = 32)
    }
    assert(ex.getMessage.contains("soundness"))
  }
}
