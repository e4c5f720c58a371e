package graft.tools

/** Scratch dial sweep: edge recall of IvfAnn.knnGraph(k=sqrt(n),
  * nprobe) against the exact graph, for several fixed nprobe values.
  * Usage: runMain graft.tools.RecallSweep <sfDir> <np1> <np2> ... */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.GraftSession.build("graft-recallsweep")
    val dir = args(0)
    val exact = graft.operators.IvfAnn.knnExact(spark, dir, lit(true), topK = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val k = math.max(1, math.sqrt(n.toDouble).toInt)
    args.drop(1).map(_.toInt).foreach { np =>
      val t0 = System.nanoTime()
      val ap = graft.operators.IvfAnn.knnGraph(spark, dir, 5, k, np)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val rec = exact.count(ap.contains).toDouble / exact.size
      println(f"SWEEP k=$k nprobe=$np recall=$rec%.4f secs=$secs%.2f")
    }
    spark.stop()
  }
}
