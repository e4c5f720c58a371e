package graft.tools

/** One-off dial probe for the scale sweep: times IvfAnn.knnGraph on a
  * corpus under EXPLICIT dials, so the sweep can demonstrate the
  * documented scale path (k ∝ √n, fixed nprobe — per-probe candidates
  * Θ(nprobe·n/k) = Θ(√n), total Θ(n^1.5)) instead of the bench
  * entry's fixed sf0.1 dials (nprobe/k = 75% of the corpus per probe,
  * Θ(n²) by dial choice). Not a board query — a measurement tool.
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> <k> <nprobe> [topK=5]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, kS, npS) = args.take(3)
    val topK = args.lift(3).map(_.toInt).getOrElse(5)
    val (k, np) = (kS.toInt, npS.toInt)
    val spark = graft.GraftSession.build("graft-scaleprobe")
    // warm-up pass then 3 measured (Bench's protocol)
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.IvfAnn.knnGraph(spark, dir, topK, k, np).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    once()
    val runs = (1 to 3).map(_ => once())
    val med = runs.map(_._1).sorted.apply(1)
    println(f"[scaleprobe] dir=$dir k=$k nprobe=$np topK=$topK " +
      f"rows=${runs.head._2} median=$med%.2f runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    spark.stop()
  }
}
