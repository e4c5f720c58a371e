package graft.tools

/** Generic fresh-JVM timing probe for the scale sweep: runs named
  * SparkEntry queries against an arbitrary data dir (e.g. a ScaleUp
  * 10× replica) with Bench's warm-up + 3-measured-passes protocol and
  * prints one line per query. Not a board entry — a measurement tool
  * for slope questions ("is this query's 10× wall-time ~linear?").
  *
  * Usage: runMain graft.tools.QueryProbe <dataDir> <query> [query ...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe <dataDir> <query> [query ...]")
    val dir = args.head
    val spark = graft.GraftSession.build("graft-queryprobe")
    args.tail.foreach { name =>
      val build = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = build(spark, dir).count()
        graft.queries.QueryDef.drainCleanups()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warm-up
      System.gc()
      val runs = (1 to 3).map(_ => once())
      val med = runs.map(_._1).sorted.apply(1)
      println(f"[queryprobe] dir=$dir query=$name rows=${runs.head._2} " +
        f"median=$med%.2f runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
