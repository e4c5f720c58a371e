package graft.sink

import graft.GraftSession
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join contract: two tables bucketed the same way join with
  * ZERO exchanges — the pattern that amortizes one write-time shuffle
  * over every downstream join at 100 TB. Pinned against the physical
  * plan, not just results. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def exchanges(plan: SparkPlan): Seq[Exchange] =
    plan.collect { case e: Exchange => e }

  /** The in-memory catalog forgets tables across JVMs but their
    * warehouse directories survive; clear both before writing. */
  private def reset(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val dir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (dir.exists()) rm(dir)
  }

  test("same-bucketing join plans with no Exchange on either side") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
    val dims = (0L until 100L).map(i => (i, s"dim$i")).toDF("k", "name")
    reset("bk_facts", "bk_dims")
    BucketedSink.writeBucketed(facts, "bk_facts", "k", 8)
    BucketedSink.writeBucketed(dims, "bk_dims", "k", 8)

    // disable the broadcast fallback (the test exercises the co-located
    // SMJ path) and AQE (AdaptiveSparkPlanExec hides the inner tree from
    // plan collection until execution)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("bk_facts").join(spark.table("bk_dims"), "k")
      val plan = joined.queryExecution.executedPlan
      assert(exchanges(plan).isEmpty, plan.toString)
      assert(plan.toString.contains("SortMergeJoin"), plan.toString)
      assert(joined.count() === 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("mismatched bucket counts shuffle only the smaller side") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
    val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")
    reset("bk_facts16", "bk_dims4")
    BucketedSink.writeBucketed(facts, "bk_facts16", "k", 16)
    BucketedSink.writeBucketed(dims, "bk_dims4", "k", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("bk_facts16").join(spark.table("bk_dims4"), "k")
      val ex = exchanges(joined.queryExecution.executedPlan)
      assert(ex.length === 1, joined.queryExecution.executedPlan.toString)
      assert(joined.count() === 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
