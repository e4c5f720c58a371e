package graft.report

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import scala.collection.mutable

/** Console progress meter for the migration CLI (reference:
  * internal/progress.go:24-85 — a per-task percent line that only prints
  * when the integer percentage advances, and always closes at 100%).
  *
  * Spark shape: the reference counts bytes read off its single-threaded
  * reader; a distributed pass has no such serial counter, so progress is
  * task completion within each labeled Spark job — the caller labels
  * work with `spark.sparkContext.setJobDescription("Writing data for
  * table X")` and every job whose description matches `prefix` gets a
  * meter. Listener events arrive on the async listener bus, so lines can
  * trail the job slightly; `drain()` in tests waits for the terminal
  * 100% line.
  */
final class ProgressReporter(prefix: String, out: String => Unit = println)
    extends SparkListener {

  private final class Job(val message: String, val total: Int) {
    var done = 0
    // 0 even for zero-task jobs: onJobEnd's pct<100 guard then emits the
    // closing 100% line, keeping the always-closes contract
    var pct = 0
  }

  private val jobs = mutable.Map.empty[Int, Job]      // jobId → state
  private val stageToJob = mutable.Map.empty[Int, Int]
  private var started = 0                             // metered jobs seen

  override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
    val desc = Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description")))
      .getOrElse("")
    if (desc.startsWith(prefix)) {
      val total = js.stageInfos.map(_.numTasks).sum
      jobs(js.jobId) = new Job(desc, total)
      started += 1
      js.stageIds.foreach(stageToJob(_) = js.jobId)
      out(s"$desc:  0%")
    }
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
    for {
      jobId <- stageToJob.get(te.stageId)
      j <- jobs.get(jobId)
    } {
      j.done += 1
      // integer-pct gating like Progress.MaybeReport (progress.go:42-64)
      val pct = math.min(100, if (j.total > 0) j.done * 100 / j.total else 100)
      if (pct > j.pct) {
        j.pct = pct
        out(s"${j.message}: ${pct}%")
      }
    }
  }

  override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
    jobs.remove(je.jobId).foreach { j =>
      if (j.pct < 100) out(s"${j.message}: 100%") // Done() (progress.go:66-69)
      stageToJob.filterInPlace((_, v) => v != je.jobId)
    }
  }

  /** Listener-bus delivery is async; wait (bounded) for `expectedJobs`
    * metered jobs to have both started and finished before the caller
    * deregisters the listener. */
  def drain(expectedJobs: Int, timeoutMs: Long = 5000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (synchronized(started < expectedJobs || jobs.nonEmpty) &&
        System.nanoTime() < deadline)
      Thread.sleep(10)
  }
}
