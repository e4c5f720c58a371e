package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory for the Verify/Bench mains and tests.
  *
  * Configuration is the 100-TB design scaled to local mode:
  *   - AQE on (runtime partition coalescing, skew-join splitting) —
  *     on a real cluster this is what turns the static shuffle.partitions
  *     into a per-stage decision;
  *   - shuffle partitions sized to cores, not the 200 default;
  *   - UTC session timezone for DuckDB-oracle parity;
  *   - legacy nanosAsLong so the TIMESTAMP(NANOS) events table is
  *     readable (normalized back to µs by QueryDef.events).
  */
object GraftSession {
  def cpus: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
    .getOrElse(Runtime.getRuntime.availableProcessors())

  private val drainHookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Stop active streams, cancel all jobs, and wait (bounded) for the
    * scheduler to drain. Safe to call any time; used as a pre-stop
    * shutdown hook so SparkContext.stop() never terminates the local
    * executor pool while a task set is still being offered — that race
    * makes LocalEndpoint.reviveOffers throw RejectedExecutionException
    * in the dispatcher thread, and Spark's uncaught-exception handler
    * then flips the JVM exit code even though every test passed.
    */
  def drainBeforeStop(): Unit = {
    SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession).foreach { s =>
      val sc = s.sparkContext
      if (!sc.isStopped) {
        try s.streams.active.foreach { q => try q.stop() catch { case _: Throwable => () } }
        catch { case _: Throwable => () }
        try {
          sc.cancelAllJobs()
          val deadline = System.nanoTime() + 8L * 1000L * 1000L * 1000L
          while (sc.statusTracker.getActiveJobIds.nonEmpty && System.nanoTime() < deadline)
            Thread.sleep(50)
        } catch { case _: Throwable => () }
      }
    }
  }

  /** Hadoop's ShutdownHookManager runs hooks in decreasing priority;
    * Spark's own hook bundle (which stops the SparkContext) registers at
    * priority 40, so 90 runs strictly before it.
    */
  private def installDrainHook(): Unit =
    if (drainHookInstalled.compareAndSet(false, true)) {
      org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
        new Runnable { def run(): Unit = drainBeforeStop() }, 90)
    }

  def build(appName: String): SparkSession = {
    val n = cpus
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", n.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Permissive (null-on-error) cast semantics: the cast library
      // (graft.cast) converts untrusted source-dump strings and routes
      // failures to the bad-row quarantine; integer-overflow wrap is
      // prevented by explicit range gates in Casts.int64.
      .config("spark.sql.ansi.enabled", "false")
      // Kryo for the few RDD-shuffle paths (iterative connected
      // components): Java serialization of boxed Tuple2[Long,Long] was
      // the dominant cost of the edge-partitioning shuffle. DataFrame
      // shuffles use Tungsten's UnsafeRow and don't care.
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // Generated methods between the JVM JIT's 8 KB HugeMethodLimit
      // and Janino's 64 KB hard cap compile fine but run in the
      // BYTECODE INTERPRETER — measured 6× slower than Spark's own
      // non-codegen fallback on the dump-cast stage. Capping at the JIT
      // limit makes Spark fall back instead of shipping an
      // uncompilable-by-JIT method; stages are kept under the cap by
      // construction (compact custom expressions + the OptimizerBarrier
      // split in convertTable), so this is the backstop, not the plan.
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    installDrainHook()
    // the library's SQL functions (array_dot/array_l2sq kernels,
    // copy_unescape, optimizer_barrier) are usable from plain
    // spark.sql on this session, not only through the operator entry
    // points that lazily self-register them. All idempotent.
    graft.functions.ArrayMath.register(spark)
    graft.functions.CopyUnescape.register(spark)
    graft.functions.OptimizerBarrier.register(spark)
    graft.functions.ZValue.register(spark)
    spark
  }
}
