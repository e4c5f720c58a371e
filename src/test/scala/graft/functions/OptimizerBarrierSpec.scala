package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Pins the OptimizerBarrier contract from both sides: the sanctioned
  * use (fencing a Project-computed flag consumed by a Filter) works and
  * is a pure pass-through, and the sharp edge the fence's
  * deterministic=false creates — a fence expression reaching a join
  * condition or aggregate is REJECTED at analysis with Spark's
  * nondeterministic-expression error — is documented here so the
  * confusing failure mode has a test to land on. */
class OptimizerBarrierSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  test("sanctioned use: Project-computed fenced flag + Filter, value is pass-through") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "s")
      .select(col("id"), OptimizerBarrier.fence(col("s").isNull).as("__bad"))
    // value semantics identical to the unfenced expression
    assert(df.filter(!col("__bad")).select("id").as[Long].collect().sorted
      === Array(1L, 3L))
    assert(df.filter(col("__bad")).select("id").as[Long].collect() === Array(2L))
    // and filtering on the ATTRIBUTE of a fenced alias is fine — the
    // nondeterminism lives in the Project, where Spark allows it
    assert(df.select("__bad").count() === 3)
  }

  test("guard: a fence expression in a join condition fails analysis") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("x")
    val b = Seq(1L, 2L).toDF("y")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      a.join(b, OptimizerBarrier.fence(col("x")) === col("y")).collect()
    }
    // Spark's INVALID_NON_DETERMINISTIC_EXPRESSIONS — confusing in
    // context (the value IS deterministic; only the optimizer's view
    // isn't), hence this pin: fence flags, not join keys
    assert(e.getMessage.toLowerCase.replace("-", "").contains("deterministic"),
      e.getMessage)
  }

  test("guard: a fence expression as an aggregate grouping key is rejected (INTERNAL_ERROR)") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L).toDF("x")
    // worse than the join case: Spark's PullOutNondeterministic doesn't
    // fire for this shape and the plan dies later with an INTERNAL_ERROR
    // SparkException — pinned here so the failure mode is documented
    val e = intercept[org.apache.spark.SparkException] {
      df.groupBy(OptimizerBarrier.fence(col("x"))).count().collect()
    }
    assert(e.getMessage.toLowerCase.replace("-", "").contains("deterministic"),
      e.getMessage)
  }
}
