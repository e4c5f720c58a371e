package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** PqIndex: the persisted IVF-PQ layout must (a) answer exactly —
  * searchExact equals the in-memory IvfPq.knnExact (and hence the e01
  * brute force, the e19 oracle) — and (b) actually deliver the PQ
  * memory claim: the ADC scoring scan reads the codes columns WITHOUT
  * the embedding column, which is the entire point of persisting
  * codes beside the vectors in a columnar format. */
class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.001"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_pqindex_").toString

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete(); ()
    }
    go(new java.io.File(path))
  }

  test("searchExact over the written index equals the in-memory IvfPq exact search") {
    val out = tmpDir()
    try {
      PqIndex.write(spark, dir, out)
      val fromIndex = PqIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val inMemory = IvfPq.knnExact(spark, dir, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(fromIndex.nonEmpty)
      assert(fromIndex.toSeq === inMemory.toSeq)
    } finally rm(out)
  }

  test("meta.json round-trips centroids, stats, and every codebook bit-exactly") {
    val out = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val cents = IvfAnn.trainCentroids(emb)
      val stats = IvfAnn.clusterStats(emb, cents)
      val cb = IvfPq.trainCodebooks(emb)
      PqIndex.write(spark, dir, out)
      val meta = PqIndex.readMeta(out, spark.sessionState.newHadoopConf())
      assert(meta.centroids.map(_.toSeq) === cents.map(_.toSeq))
      assert(meta.radius.toSeq === stats.radius.toSeq)
      assert(meta.counts.toSeq === stats.count.toSeq)
      assert(meta.maxNorm === stats.maxNorm)
      assert(meta.books.m === cb.m && meta.books.k === cb.k &&
        meta.books.subDim === cb.subDim)
      assert(meta.books.books.map(_.map(_.toSeq)) === cb.books.map(_.map(_.toSeq)))
    } finally rm(out)
  }

  test("approximate search at full fan-out + wide shortlist equals searchExact") {
    val out = tmpDir()
    try {
      PqIndex.write(spark, dir, out)
      val meta = PqIndex.readMeta(out, spark.sessionState.newHadoopConf())
      val exact = PqIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // nprobe = all lists and a corpus-wide shortlist: the candidate
      // pool is the whole corpus, so the exact re-rank must reproduce
      // searchExact bit-exactly (e14's posture)
      val approx = PqIndex.search(spark, out, col("vec_id") < 8,
        nprobe = meta.centroids.length, shortlistFactor = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(approx.toSeq === exact.toSeq)
      // the production dial still returns k rows per probe (recall is
      // a dial on the near-random corpus; exactness is searchExact's)
      val dialed = PqIndex.search(spark, out, col("vec_id") < 8)
      assert(dialed.groupBy("query_id").count()
        .collect().forall(_.getLong(1) === 10L))
    } finally rm(out)
  }

  test("the ADC scoring scan never reads the embedding column") {
    val out = tmpDir()
    try {
      PqIndex.write(spark, dir, out)
      val plan = PqIndex.searchExact(spark, out, col("vec_id") < 8)
        .queryExecution.executedPlan.toString
      val dataScans = plan.linesIterator
        .filter(l => l.contains("FileScan parquet") && l.contains(out)).toSeq
      assert(dataScans.nonEmpty, plan)
      // at least one scan carries codes WITHOUT embedding — the ADC
      // pass; probe and re-rank scans legitimately read the vectors
      assert(dataScans.exists(l =>
        l.contains("codes") && !l.contains("embedding")),
        s"ADC pass read the embedding column:\n${dataScans.mkString("\n")}")
      // and the cluster partition filter is literal (static pruning)
      assert(plan.contains("PartitionFilters"), plan)
    } finally rm(out)
  }
}
