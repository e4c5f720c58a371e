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

  test("REBUILDING fence: a crashed re-derive refuses until a write re-run clears it") {
    val out = tmpDir()
    try {
      PqIndex.write(spark, dir, out)
      // simulate the crash window: marker present over a complete index
      // (the dangerous state is data committed, meta stale — readers
      // cannot tell, so the marker must refuse unconditionally)
      val hc = spark.sessionState.newHadoopConf()
      graft.util.Fs.writeStringAtomic(s"$out/REBUILDING", "", hc)
      val e = intercept[IllegalStateException](
        PqIndex.searchExact(spark, out, col("vec_id") < 8).collect())
      assert(e.getMessage.contains("REBUILDING"), e.getMessage)
      assert(e.getMessage.contains("re-run PqIndex.write"), e.getMessage)
      // the documented recovery converges and clears the fence
      PqIndex.write(spark, dir, out)
      assert(!graft.util.Fs.exists(s"$out/REBUILDING", hc))
      assert(PqIndex.searchExact(spark, out, col("vec_id") < 8)
        .count() === 80L)
    } finally rm(out)
  }

  test("shortlist fence: an over-contract probe set refuses before a driver-sized collect") {
    val out = tmpDir()
    try {
      PqIndex.write(spark, dir, out)
      // 8 probes × 10·topK shortlist rows ≫ maxShortlist=5: the refusal
      // must fire (IllegalArgumentException from require), and it must
      // fire from the fenced LIMIT collect — the driver held at most
      // maxShortlist+1 pairs when it did
      val e = intercept[IllegalArgumentException](
        PqIndex.search(spark, out, col("vec_id") < 8, maxShortlist = 5))
      assert(e.getMessage.contains("maxShortlist=5"), e.getMessage)
      assert(e.getMessage.contains("narrow probePred"), e.getMessage)
      // same fence on the exact path
      val e2 = intercept[IllegalArgumentException](
        PqIndex.searchExact(spark, out, col("vec_id") < 8, maxShortlist = 5))
      assert(e2.getMessage.contains("maxShortlist=5"), e2.getMessage)
      // a compliant call under the default dial still serves
      assert(PqIndex.searchExact(spark, out, col("vec_id") < 8)
        .count() === 80L)
    } finally rm(out)
  }

  test("staleness: health flags a moved source and a verifying search refuses") {
    val out = tmpDir()
    val movedSrc = tmpDir()
    try {
      PqIndex.write(spark, dir, out)
      // fresh: fingerprint matches the corpus the codes were derived from
      val fresh = PqIndex.health(spark, out, dir)
      assert(!fresh.stale && fresh.fp.contains(fresh.src))
      assert(PqIndex.searchExact(spark, out, col("vec_id") < 8,
        verifySrcDir = Some(dir)).count() === 80L)
      // the corpus moves on (an append the derived index cannot see)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.union(emb.limit(3).withColumn("vec_id", col("vec_id") + 1000000L))
        .write.mode("overwrite").parquet(s"$movedSrc/embeddings.parquet")
      val stale = PqIndex.health(spark, out, movedSrc)
      assert(stale.stale)
      assert(stale.src.rows === fresh.src.rows + 3)
      val e = intercept[IllegalStateException](
        PqIndex.searchExact(spark, out, col("vec_id") < 8,
          verifySrcDir = Some(movedSrc)))
      assert(e.getMessage.contains("stale PqIndex"), e.getMessage)
      assert(e.getMessage.contains("re-run PqIndex.write"), e.getMessage)
      // a pre-fingerprint index (no src_rows in meta.json) is treated
      // as stale — unknown provenance is the unsafe direction
      val hc = spark.sessionState.newHadoopConf()
      val metaJson = graft.util.Fs.readString(s"$out/meta.json", hc)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(metaJson)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      root.remove("src_rows"); root.remove("src_max_id")
      graft.util.Fs.writeStringAtomic(s"$out/meta.json",
        mapper.writeValueAsString(root), hc)
      assert(PqIndex.health(spark, out, dir).stale)
      intercept[IllegalStateException](
        PqIndex.searchExact(spark, out, col("vec_id") < 8,
          verifySrcDir = Some(dir)))
      // an un-verified search still serves (opt-in gate, not a lockout)
      assert(PqIndex.searchExact(spark, out, col("vec_id") < 8)
        .count() === 80L)
    } finally { rm(out); rm(movedSrc) }
  }

  test("ADC scan never reads embeddings; re-rank scan is id-pushed and cluster-pruned") {
    val out = tmpDir()
    // the shortlist collects inside searchExact (driver-sized by the
    // probe-set contract), so the ADC subtree executes as its own job
    // — capture every execution's plan via a listener instead of
    // inspecting only the returned frame's (re-rank) plan
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      PqIndex.write(spark, dir, out)
      PqIndex.searchExact(spark, out, col("vec_id") < 8).collect()
      def dataScans = plans.synchronized {
        plans.flatMap(_.linesIterator)
          .filter(l => l.contains("FileScan parquet") && l.contains(out)).toSeq
      }
      // the listener bus is async — poll until BOTH executions' plans
      // (the internal ADC job AND the returned re-rank frame) arrive;
      // waiting for only the first made the second assert flake under
      // full-suite listener-bus load
      def adcSeen = dataScans.exists(l =>
        l.contains("codes") && !l.contains("embedding"))
      def rerankSeen = dataScans.exists(l => l.contains("In(vec_id") &&
        l.contains("PartitionFilters: [cluster"))
      var tries = 0
      while (tries < 300 && !(adcSeen && rerankSeen)) {
        Thread.sleep(100); tries += 1
      }
      val scans = dataScans
      // the ADC pass reads codes WITHOUT the embedding column — the PQ
      // memory claim; probe and re-rank scans legitimately read vectors
      assert(scans.exists(l => l.contains("codes") && !l.contains("embedding")),
        s"ADC pass read the embedding column:\n${scans.mkString("\n")}")
      // the re-rank vectors scan carries the pushed shortlist-id filter
      // AND the literal cluster partition filter — only shortlist rows
      // surface from the wide column
      assert(scans.exists(l => l.contains("In(vec_id") &&
        l.contains("PartitionFilters: [cluster")),
        s"re-rank scan missing id pushdown / cluster pruning:\n${scans.mkString("\n")}")
    } finally {
      spark.listenerManager.unregister(listener)
      rm(out)
    }
  }
}
