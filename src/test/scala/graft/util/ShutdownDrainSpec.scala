package graft.util

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** The JVM-exit race behind VERIFY_r20's tests_ok=false: Spark's shutdown
  * hook stops the local executor pool while a job is still being offered
  * tasks, the dispatcher thread throws RejectedExecutionException, and the
  * uncaught-exception handler flips the exit code. GraftSession now drains
  * (stop streams, cancel jobs, await quiescence) in a higher-priority hook
  * before SparkContext.stop() runs; this spec exercises the drain directly.
  */
class ShutdownDrainSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  test("drainBeforeStop cancels in-flight jobs and leaves the session usable") {
    import spark.implicits._
    val slow = new Thread(() => {
      try {
        spark.range(0, 256, 1, 32).map { i => Thread.sleep(500); i }
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => () } // cancellation is the expected outcome
    })
    slow.setDaemon(true)
    slow.start()
    val visible = System.nanoTime() + 10L * 1000L * 1000L * 1000L
    while (spark.sparkContext.statusTracker.getActiveJobIds.isEmpty &&
           System.nanoTime() < visible) Thread.sleep(10)
    assert(spark.sparkContext.statusTracker.getActiveJobIds.nonEmpty)

    GraftSession.drainBeforeStop()
    assert(spark.sparkContext.statusTracker.getActiveJobIds.isEmpty)
    slow.join(10000)

    // the session survives the drain and schedules new work normally
    assert(spark.range(10).count() == 10)
  }

  test("drainBeforeStop is a no-op on a quiescent session") {
    GraftSession.drainBeforeStop()
    GraftSession.drainBeforeStop()
    assert(spark.range(3).count() == 3)
  }
}
