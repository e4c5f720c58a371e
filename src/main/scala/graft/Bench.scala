package graft

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line with per-query wall seconds.
  *
  * Each query is forced through the `noop` sink: unlike `.count()`, which
  * lets Catalyst prune away unused projections (a windowed column feeding
  * nothing would simply not be computed), noop materializes every output
  * row of the optimized plan — the honest cost of the query.
  *
  * Failure discipline: a failed query is NEVER folded into the total (a
  * -1 sentinel would make the bench report a better number than a passing
  * run). Failures are listed in "failed" and the process exits nonzero.
  * The JSON line is also written to $SPARK_GRAFT_OUT (or
  * /root/repo/bench_out.json) so the driver can parse it even if a
  * launcher prefixes stdout.
  *
  * Noise discipline: one measured pass is hostage to whatever else the
  * box is doing in that window (round 7's snapshot inflated untouched
  * scan-aggs 2.5-3x under contention). After the warm-up pass each query
  * runs PASSES measured times and the reported number is the per-query
  * MEDIAN; min/max land in a "spread" side field so a contended run is
  * visible instead of silently inverting a round-over-round comparison.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")

    def run(name: String): Either[String, Double] = {
      try {
        // time build + materialize: build is pure plan construction for
        // declarative queries (≈0), but iterative operators (c01's label
        // propagation) run their convergence loop inside build — timing
        // only the final write would hide their real cost
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Left(e.getClass.getSimpleName)
      } finally {
        // release build-registered caches (dump-line scans) so pass N+1
        // measures the same cold-cache plan as pass N instead of warming
        // up against N's leftover block-manager storage
        graft.queries.QueryDef.drainCleanups()
        // r10 bisect: with 32 executor threads in one 8g JVM, query N's
        // surviving garbage (codegen classes, shuffle buffers, freed
        // cache blocks) lands as GC pauses inside query N+1's timing —
        // measured c01 3.34 s isolated vs 4.73 s in-set on the same box.
        // Collect between queries so each number charges a query for its
        // OWN allocation, not its predecessor's. Harness-only hygiene:
        // production pipelines don't interleave 17 unrelated queries in
        // a fixed order inside one driver JVM.
        System.gc()
      }
    }

    // SPARK_GRAFT_BENCH_QUERIES: comma-separated subset filter, for
    // isolating one query's cost in a fresh JVM (bench-drift bisects)
    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(filter) =>
        val want = filter.split(',').map(_.trim).filter(_.nonEmpty).toSet
        SparkEntry.headlines.filter(want)
      case None => SparkEntry.headlines
    }
    // one warm-up pass at sf-independent cost amortization (JIT, codegen
    // cache, parquet footer cache), then PASSES measured passes
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").flatMap(_.toIntOption).getOrElse(3)
    names.foreach(run)
    // pass-major order (full query set per pass, not 3x back-to-back per
    // query) so a transient contention window degrades one pass of many
    // queries — which the median rejects — rather than all passes of one
    val samples: Seq[Seq[(String, Either[String, Double])]] =
      (1 to passes).map(_ => names.map(n => n -> run(n)))
    val byName: Seq[(String, Seq[Either[String, Double]])] =
      names.map(n => n -> samples.map(_.collectFirst { case (`n`, r) => r }.get))
    // a query that failed ANY pass is failed: partial timings of a flaky
    // query are not a number worth reporting
    val failed = byName.collect { case (n, rs) if rs.exists(_.isLeft) => n }
    val ok = byName.collect { case (n, rs) if rs.forall(_.isRight) =>
      val ts = rs.collect { case Right(s) => s }.sorted
      (n, ts(ts.size / 2), ts.head, ts.last)
    }
    val qs = ok.map { case (k, med, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spread = ok.map { case (k, _, mn, mx) => "\"" + k + "\":[" + mn + "," + mx + "]" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"passes":$passes,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_OUT", "/root/repo/bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: ${e.getMessage}") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
