package graft.tools

/** Scratch diagnostic: run a query to completion and dump its EXECUTED
  * (AQE-final) plan — `graft.Explain` prints the pre-execution plan,
  * which hides runtime stage reuse. Usage: runMain graft.tools.ExecPlan
  * <sfDir> <query> */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("graft-execplan")
    val defs = graft.SparkEntry.queries
    val df = defs(args(1))(spark, args(0))
    df.collect()
    val ep = df.queryExecution.executedPlan.toString
    println(ep)
    println("REUSED_EXCHANGES=" + "ReusedExchange".r.findAllIn(ep).size)
    println("SCANS=" + "Scan parquet".r.findAllIn(ep).size)
    graft.queries.QueryDef.drainCleanups()
    spark.stop()
  }
}
