package graft

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line with per-query wall seconds.
  *
  * Each query is forced through the `noop` sink: unlike `.count()`, which
  * lets Catalyst prune away unused projections (a windowed column feeding
  * nothing would simply not be computed), noop materializes every output
  * row of the optimized plan — the honest cost of the query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")

    def run(name: String): Double = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      try df.write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.headlines
    // one warm-up pass at sf-independent cost amortization (JIT, codegen
    // cache, parquet footer cache), then the measured pass
    names.foreach(run)
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
