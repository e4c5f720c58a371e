package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round measurement probe (not a board entry): times the
  * sub-phases of the most expensive headline queries, per guide §1
  * (measure first, empirical loop). Attaches a job listener so every
  * Spark job's wall time and call site are printed — the map from
  * bench seconds to pipeline stages.
  *
  * Usage: runMain graft.tools.OptProbe [sfDir] [mode]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("curate")
    val spark = graft.GraftSession.build("graft-optprobe")
    def t[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[opt] $name: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // job listener: print every job's duration + call site
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("?")
          starts.put(js.jobId, (js.time, site))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
            val ms = je.time - t0
            if (ms >= 80)
              println(f"[job] ${je.jobId}%4d ${ms / 1000.0}%7.2f s  $site")
          }
        }
      })

    mode match {
      case "curate" =>
        val out = java.nio.file.Files
          .createTempDirectory("graft_optprobe_curate_").toString
        t("c14: Curate.run (warm-up)")(graft.Curate.run(spark, dir, out + "/a"))
        println("[opt] ---- measured pass ----")
        t("c14: Curate.run")(graft.Curate.run(spark, dir, out + "/b"))
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(out))
      case "curparts" =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        t("warm docs count")(docs.count())
        val digests = docs.select(col("doc_id"), md5(col("text")).as("digest"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("digests count")(digests.count())
        val fps = graft.queries.TextMedia.simhashFingerprintsOf(docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("fps count")(fps.count())
        val cleanups = scala.collection.mutable.ArrayBuffer[() => Unit]()
        val clusters = t("dupClustersOf")(
          graft.queries.TextMedia.dupClustersOf(fps, f => cleanups += f))
        t("clusters count")(clusters.count())
        t("DataCard.metricsOf")(graft.report.DataCard.metricsOf(docs))
        t("DataCard.metricsOf (2nd)")(graft.report.DataCard.metricsOf(docs))
        cleanups.foreach(_())
        digests.unpersist(false); fps.unpersist(false)
      case "d17" =>
        t("d17 (warm-up)")(
          graft.SparkEntry.queries("d17_bpe_train")(spark, dir).count())
        graft.queries.QueryDef.drainCleanups()
        println("[opt] ---- measured pass ----")
        t("d17")(graft.SparkEntry.queries("d17_bpe_train")(spark, dir).count())
        graft.queries.QueryDef.drainCleanups()
      case q =>
        t(s"$q (warm-up)")(
          graft.SparkEntry.queries(q)(spark, dir).count())
        graft.queries.QueryDef.drainCleanups()
        println("[opt] ---- measured pass ----")
        t(q)(graft.SparkEntry.queries(q)(spark, dir).count())
        graft.queries.QueryDef.drainCleanups()
    }
    spark.stop()
  }
}
