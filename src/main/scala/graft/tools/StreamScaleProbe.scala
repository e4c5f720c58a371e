package graft.tools

import org.apache.spark.sql.functions._

/** Streaming per-batch cost probe — measures what the streaming specs
  * only PIN structurally: that a micro-batch's cost against a standing
  * index/base is O(batch), not O(corpus). Seed a standing artifact
  * from one corpus dir, then time fixed-size probe batches against it;
  * running the same probe against a 1×, 10×, and 100× standing corpus
  * should read flat per-batch wall (± ambient). Not a board entry — a
  * measurement tool (QueryProbe's protocol: warm-up batch, then 3
  * timed).
  *
  * Modes:
  *   minhash — StreamingIndexProbe.processBatch vs a MinHash index
  *             seeded through appendBatch (batch 0 = the whole
  *             standing corpus, the streaming layout's own growth
  *             path)
  *   ivf     — StreamingIvfProbe.processBatch vs an initStreaming +
  *             appendBatch IVF index
  *   curate  — Curate.runIncremental generation against a Curate.run
  *             base (the StreamingCurate per-generation unit)
  *
  * Probe batches draw from batchSrcDir with ids shifted by 10^12 and
  * strided 10^10 PER BATCH — the stride exceeds any source id range
  * the replica tools produce (ScaleUp shifts replicas by i·10^7), so
  * batches can never collide with each other or the standing corpus
  * and skew the per-batch measurement.
  *
  * Usage: runMain graft.tools.StreamScaleProbe
  *          <standingSrcDir> <batchSrcDir> <minhash|ivf|ivfapprox|ivfdial|curate>
  *          [batchRows=500]
  */
object StreamScaleProbe {
  private val IdShift = 1000000000000L
  // per-batch id stride; must exceed the largest possible source id
  // (ScaleUp's 100x replicas top out below 10^9)
  private val BatchStride = 10000000000L

  def main(args: Array[String]): Unit = {
    val Array(standingDir, batchDir, mode) = args.take(3)
    val batchRows = args.lift(3).map(_.toInt).getOrElse(500)
    val spark = graft.GraftSession.build("graft-streamscaleprobe")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_streamprobe_").toString
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def report(runs: Seq[Double], standing: Long): Unit =
      println(f"[streamscaleprobe] mode=$mode standing=$standing " +
        f"batchRows=$batchRows median=${runs.sorted.apply(runs.size / 2)}%.2f " +
        f"runs=${runs.map(r => f"$r%.2f").mkString(",")}")

    mode match {
      case "minhash" =>
        val idx = s"$scratch/mh"
        val docs = spark.read.parquet(s"$standingDir/documents.parquet")
          .select("doc_id", "text")
        val standing = docs.count()
        graft.operators.MinHashIndex.appendBatch(spark,
          graft.operators.MinHashIndex.signatures(docs), idx, 0L)
        val src = spark.read.parquet(s"$batchDir/documents.parquet")
          .select("doc_id", "text").limit(4 * batchRows).collect()
        def batch(i: Int) = {
          import spark.implicits._
          src.slice(i * batchRows, (i + 1) * batchRows)
            .map(r => (r.getLong(0) + IdShift + i * BatchStride, r.getString(1)))
            .toSeq.toDF("doc_id", "text")
        }
        val runs = (0 to 3).map { i =>
          timed {
            val p = graft.streaming.StreamingIndexProbe
              .processBatch(spark, idx, batch(i), i + 1L, 500)
            p.unpersist(false)
          }
        }
        report(runs.drop(1), standing) // first batch = warm-up
      case "ivf" | "ivfapprox" | "ivfdial" =>
        val idx = s"$scratch/ivf"
        val emb = spark.read.parquet(s"$standingDir/embeddings.parquet")
        val standing = emb.count()
        // seed at the scale dial k = sqrt(n): a constant cluster count
        // would under-cluster the bigger standings and measure weak
        // pruning instead of the per-batch slope. "ivfdial" instead
        // seeds at the FIXED-LIST-SIZE dial k = n/L (L = 500,
        // MaintenancePolicy.targetListSize's steady state): fixed-
        // nprobe candidates are then nprobe·L per probe — a CONSTANT
        // in corpus size, the truly flat per-batch path the r18 sweep
        // showed neither sqrt(n)-k nor frozen-k delivers.
        val k =
          if (mode == "ivfdial") math.max(16, (standing / 500L).toInt)
          else math.max(16, math.sqrt(standing.toDouble).toInt)
        graft.operators.IvfIndex.initStreaming(spark, standingDir, idx, k = k)
        graft.operators.IvfIndex.appendBatch(spark,
          emb.select("vec_id", "embedding"), idx, 0L)
        val src = spark.read.parquet(s"$batchDir/embeddings.parquet")
          .limit(4 * batchRows)
          .select("vec_id", "embedding").collect()
        val schema = spark.read.parquet(s"$batchDir/embeddings.parquet")
          .select("vec_id", "embedding").schema
        def batch(i: Int) = {
          val rows = src.slice(i * batchRows, (i + 1) * batchRows).map { r =>
            org.apache.spark.sql.Row(
              r.getLong(0) + IdShift + i * BatchStride, r.get(1))
          }
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toSeq), schema)
        }
        // "ivf" = the exact per-batch search (candidate volume tracks
        // how well the corpus clusters — on random vectors it grows
        // with the standing corpus, the documented exactness price);
        // "ivfapprox"/"ivfdial" = the fixed-nprobe recall dial —
        // candidates nprobe·n/k per probe, constant only under
        // ivfdial's k = n/L seeding
        val np = if (mode == "ivfapprox" || mode == "ivfdial") Some(36) else None
        val runs = (0 to 3).map { i =>
          timed {
            val p = graft.streaming.StreamingIvfProbe
              .processBatch(spark, idx, batch(i), i + 1L, 5, np)
            p.unpersist(false)
          }
        }
        report(runs.drop(1), standing)
      case "curate" =>
        val base = s"$scratch/base"
        val standing = spark.read
          .parquet(s"$standingDir/documents.parquet").count()
        graft.Curate.run(spark, standingDir, base)
        val src = spark.read.parquet(s"$batchDir/documents.parquet")
          .limit(4 * batchRows)
        val runs = (0 to 3).map { i =>
          val bdir = s"$scratch/batch$i"
          src.filter(pmod(col("doc_id"), lit(4)) === i)
            .withColumn("doc_id", col("doc_id") + IdShift + i * BatchStride)
            .write.mode("overwrite").parquet(s"$bdir/documents.parquet")
          val prev = if (i == 0) base else s"$scratch/gen${i - 1}"
          timed {
            graft.Curate.runIncremental(spark, bdir, prev, s"$scratch/gen$i")
          }
        }
        report(runs.drop(1), standing)
      case other =>
        throw new IllegalArgumentException(s"unknown mode $other")
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(scratch))
    spark.stop()
  }
}
