package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Physical-plan shape assertions — the "would this survive 100×"
  * properties that row counts can't see. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.001"

  test("q19 CMS build scans events exactly once") {
    val df = Relational.defs("q19_cms_sketch").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"expected one events scan, plan had $scans:\n$plan")
  }

  test("q18 bucketed range join emits no duplicate pairs without a distinct") {
    val df = Relational.defs("q18_range_join").build(spark, dir)
    // no dedup operator in the plan...
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Deduplicate"), plan)
    // ...and the result is duplicate-free anyway: each pair matches in
    // exactly one exploded bucket
    val n = df.count()
    assert(n === df.dropDuplicates("err_id", "click_id").count())
    assert(n > 0, "fixture range join should produce pairs")
  }
}
