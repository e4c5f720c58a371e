package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** IvfIndex: the persisted cluster-partitioned layout must (a) answer
  * exactly — searchExact over the written index equals the in-memory
  * exact search (and hence the e01 brute force) — and (b) actually
  * prune: the corpus scan carries a cluster partition filter, and on a
  * clustered corpus the needed-cluster union is a strict subset of the
  * lists, which is the entire point of paying the layout write. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ivfindex_").toString
    d
  }

  /** Live tombstone part files (snapshot clears FILES, never the dir —
    * a concurrent delete's later file must survive a compact). */
  private def tombstoneParts(idxDir: String): Int =
    Option(new java.io.File(s"$idxDir/tombstones").listFiles())
      .map(_.count(_.getName.startsWith("part-"))).getOrElse(0)

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete(); ()
    }
    go(new java.io.File(path))
  }

  test("searchExact over the written index equals the in-memory exact search") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      IvfIndex.write(spark, dir, out)
      val fromIndex = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val inMemory = IvfAnn.knnExact(spark, dir, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(fromIndex.nonEmpty)
      assert(fromIndex.toSeq === inMemory.toSeq)
    } finally rm(out)
  }

  test("multi-partition corpus: the rebalanced write stays one-file-per-cluster and exact") {
    // the r21 §6 layout change: with a multi-partition source the
    // zero-shuffle write used to emit one file per (partition × cluster)
    // — k × tasks fragments; the cluster-keyed REBALANCE bounds data
    // files near the cluster count. This is the only test that takes
    // that branch (bench corpora are single-partition), so it also
    // proves the hint RESOLVES (an unresolved hint is silently ignored
    // and the old fragmented layout would come back).
    val dir = "/root/testdata/sf0.001"
    val src = tmpDir()
    val out = tmpDir()
    try {
      spark.read.parquet(s"$dir/embeddings.parquet").repartition(8)
        .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
      IvfIndex.write(spark, src, out, k = 16)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out, "data"))
        .filter(p => p.toString.endsWith(".parquet")).count()
      // unfragmented: at most ~one file per non-empty cluster (16), far
      // below the 8 × 16 = 128 the per-task layout would produce
      assert(files <= 20, s"expected ≈k data files, got $files")
      val fromIndex = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val inMemory = IvfAnn.knnExact(spark, dir, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(fromIndex.nonEmpty && fromIndex.toSeq === inMemory.toSeq)
    } finally { rm(src); rm(out) }
  }

  test("big-k index (k > LiteralKCeiling): row-form probe stages stay exact") {
    // the k = sqrt(n) dial's whole lifecycle — join-trained centroids,
    // join assignment, row-form exact/range/nearest probe stages —
    // against independently computed brute force (no shared machinery)
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      val k = IvfAnn.LiteralKCeiling + 8
      IvfIndex.write(spark, dir, out, k = k)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val qv = emb.select(col("vec_id"), expr(IvfAnn.quant).as("qv"))
      val probes = qv.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("qv").as("pq"))
      val pairs = probes.crossJoin(
          qv.select(col("vec_id").as("cand_id"), col("qv")))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          IvfAnn.qdot("pq", "qv").as("dot"),
          IvfAnn.qdot("pq", "pq").as("qself"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("dot").desc, col("cand_id"))
      val bruteTop = pairs
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 5)
        .select("query_id", "cand_id", "dot", "rnk")
        .collect().map(_.toSeq).toSeq
      val gotTop = IvfIndex.searchExact(spark, out, col("vec_id") < 8, topK = 5)
        .collect().map(_.toSeq).toSeq
      assert(gotTop.nonEmpty && gotTop === bruteTop)
      // range: 4·dot >= qself, the default fraction
      val bruteRange = pairs.filter(col("dot") * 4 >= col("qself"))
        .select("query_id", "cand_id", "dot")
        .orderBy("query_id", "cand_id").collect().map(_.toSeq).toSeq
      val gotRange = IvfIndex.searchRange(spark, out, col("vec_id") < 8)
        .collect().map(_.toSeq).toSeq
      assert(gotRange === bruteRange)
      // approx at full fan-out scans every list — identical to exact
      val gotApprox = IvfIndex.searchApprox(spark, out, col("vec_id") < 8,
        topK = 5, nprobe = k).collect().map(_.toSeq).toSeq
      assert(gotApprox === gotTop)
    } finally rm(out)
  }

  test("searchRange equals the in-memory range search; deletes drop qualifying candidates") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      IvfIndex.write(spark, dir, out)
      val fromIndex = IvfIndex.searchRange(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val inMemory = IvfAnn.rangeSearch(spark, dir, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(fromIndex.nonEmpty)
      assert(fromIndex.toSeq === inMemory.toSeq)
      // tombstone a qualifying candidate: it must vanish from the
      // range result while everything else is untouched (m06 posture;
      // the fixed threshold reads no counts, so nothing else can move)
      val victim = fromIndex.head._2
      IvfIndex.delete(spark, out, Seq(victim).toDF("vec_id"))
      val after = IvfIndex.searchRange(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(!after.exists(_._2 == victim))
      assert(after.toSeq === fromIndex.filterNot(_._2 == victim).toSeq)
    } finally rm(out)
  }

  test("sampled training (trainSampleFraction) keeps searchExact provably exact and deterministic") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir(); val out2 = tmpDir()
    try {
      // centroids are a free choice: exactness comes from full-corpus
      // radius/count stats, so a 25%-sample-trained index must still
      // reproduce the brute force bit-exactly
      IvfIndex.write(spark, dir, out, trainSampleFraction = 0.25)
      val fromIndex = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val brute = IvfAnn.knnExact(spark, dir, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(fromIndex.nonEmpty)
      assert(fromIndex.toSeq === brute.toSeq)
      // deterministic: a second sampled write produces identical meta
      IvfIndex.write(spark, dir, out2, trainSampleFraction = 0.25)
      val hc = spark.sessionState.newHadoopConf()
      assert(graft.util.Fs.readString(s"$out/meta.json", hc) ===
        graft.util.Fs.readString(s"$out2/meta.json", hc))
      // and the sample really is a strict subset: sampled centroids
      // differ from full-corpus-trained ones (training saw less data)
      IvfIndex.write(spark, dir, out2)
      assert(graft.util.Fs.readString(s"$out/meta.json", hc) !==
        graft.util.Fs.readString(s"$out2/meta.json", hc))
    } finally { rm(out); rm(out2) }
  }

  test("searchDiverse over the index equals the oracled e18 MMR trajectory") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      IvfIndex.write(spark, dir, out)
      val viaIndex = IvfIndex.searchDiverse(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val viaQuery = graft.queries.Similarity.defs("e18_mmr_rerank")
        .build(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(viaIndex.nonEmpty)
      assert(viaIndex.toSeq === viaQuery.toSeq)
      // the diversity term must be LIVE on this corpus: the MMR
      // selection differs from the plain top-k head for at least one
      // probe (otherwise the kernel parity above proves nothing about
      // the similarity penalty)
      val topk = IvfIndex.searchExact(spark, out, col("vec_id") < 8, topK = 8)
        .select("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val mmrSel = viaIndex.map(t => (t._1, t._3)).toSet
      assert(mmrSel !== topk,
        "MMR never diverged from plain top-k — diversity term inert on the fixture")
      // the approximate variant at full fan-out reproduces the exact
      // trajectory bit-exactly (e14's nprobe = k-lists posture)
      val meta = IvfIndex.readMeta(out, spark.sessionState.newHadoopConf())
      val viaApprox = IvfIndex.searchDiverseApprox(spark, out,
        col("vec_id") < 8, nprobe = meta.centroids.length)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(viaApprox.toSeq === viaIndex.toSeq)
    } finally {
      rm(out)
      graft.queries.QueryDef.drainCleanups()
    }
  }

  test("meta.json round-trips centroids and pruning stats bit-exactly") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val cents = IvfAnn.trainCentroids(emb)
      val stats = IvfAnn.clusterStats(emb, cents)
      IvfIndex.write(spark, dir, out)
      val meta = IvfIndex.readMeta(out, spark.sessionState.newHadoopConf())
      assert(meta.centroids.map(_.toSeq) === cents.map(_.toSeq))
      assert(meta.radius.toSeq === stats.radius.toSeq)
      assert(meta.counts.toSeq === stats.count.toSeq)
      assert(meta.maxNorm === stats.maxNorm)
    } finally rm(out)
  }

  test("append grows the index exactly: search over the union stays exact") {
    // split the corpus: build from the even vec_ids, append the odds —
    // searchExact over the appended index must equal brute force over
    // the FULL corpus (the updated radii keep the bound a proof)
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    val evenSrc = tmpDir()
    val oddSrc = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.filter(col("vec_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$evenSrc/embeddings.parquet")
      emb.filter(col("vec_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$oddSrc/embeddings.parquet")
      IvfIndex.write(spark, evenSrc, out)
      val before = IvfIndex.readMeta(out, spark.sessionState.newHadoopConf())
      IvfIndex.append(spark, oddSrc, out)
      val after = IvfIndex.readMeta(out, spark.sessionState.newHadoopConf())
      assert(after.counts.sum === before.counts.sum + emb.filter(col("vec_id") % 2 === 1).count())
      assert(after.radius.zip(before.radius).forall { case (a, b) => a >= b })
      // exactness over the grown corpus vs in-memory exact over ALL rows
      val fromIndex = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().map(_.toSeq)
      val inMemory = IvfAnn.knnExact(spark, dir, col("vec_id") < 8)
        .collect().map(_.toSeq)
      assert(fromIndex.toSeq === inMemory.toSeq)
    } finally { rm(out); rm(evenSrc); rm(oddSrc) }
  }

  test("searchApprox: recall dial — IvfAnnSpec's floor at the default, exact at nprobe=k") {
    val dir = "/root/testdata/sf0.01"
    val out = tmpDir()
    try {
      IvfIndex.write(spark, dir, out)
      val exact = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // default nprobe=4 of k=16 searches ~25% of a NEAR-RANDOM corpus
      // (the adversarial case) — same ≥0.5 floor IvfAnnSpec pins for
      // the in-memory dial; real clustered corpora sit far higher
      val approx = IvfIndex.searchApprox(spark, out, col("vec_id") < 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact & approx).size.toDouble / exact.size
      assert(recall >= 0.5, s"recall $recall")
      // corpus-independent contract: probing every list IS exact search
      val full = IvfIndex.searchApprox(spark, out, col("vec_id") < 8, nprobe = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(full === exact)
    } finally rm(out)
  }

  test("index dir accepts an explicit Hadoop-scheme path (file:)") {
    // deployment shape: a 100 TB index lives on HDFS/S3, addressed by
    // scheme. Every non-Spark file op (meta sidecar, compact swap) goes
    // through path.getFileSystem(conf), so a `file:` URI exercises the
    // same code path as an object-store one end-to-end:
    // write → readMeta → append → compact → searchExact.
    val dir = "/root/testdata/sf0.001"
    val local = tmpDir()
    val out = s"file:$local/idx"
    val oddSrc = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.filter(col("vec_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$oddSrc/embeddings.parquet")
      IvfIndex.write(spark, dir, out)
      val meta = IvfIndex.readMeta(out, spark.sessionState.newHadoopConf())
      assert(meta.counts.sum === emb.count())
      IvfIndex.append(spark, oddSrc, out)
      IvfIndex.compact(spark, out)
      val fromIndex = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().map(_.toSeq)
      assert(fromIndex.nonEmpty)
      // meta.json written atomically: no temp sibling left behind
      assert(!new java.io.File(s"$local/idx/.meta.json.tmp").exists())
      assert(!new java.io.File(s"$local/idx/data_old").exists())
      assert(!new java.io.File(s"$local/idx/data_compacting").exists())
    } finally { rm(local); rm(oddSrc) }
  }

  test("compact refuses the interrupted-swap crash state instead of destroying it") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      IvfIndex.write(spark, dir, out)
      // simulate a crash between compact's two renames: data/ gone,
      // the only complete copy sits in data_old
      assert(new java.io.File(s"$out/data")
        .renameTo(new java.io.File(s"$out/data_old")))
      val e = intercept[IllegalStateException](IvfIndex.compact(spark, out))
      assert(e.getMessage.contains("interrupted compact"))
      // the recovery the message names actually works
      assert(new java.io.File(s"$out/data_old")
        .renameTo(new java.io.File(s"$out/data")))
      IvfIndex.compact(spark, out)
      assert(IvfIndex.searchExact(spark, out, col("vec_id") < 4)
        .collect().nonEmpty)
    } finally rm(out)
  }

  test("compact merges append files per list; results are unchanged") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    val oddSrc = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.filter(col("vec_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$oddSrc/embeddings.parquet")
      IvfIndex.write(spark, dir, out)
      IvfIndex.append(spark, oddSrc, out) // duplicate odd ids: more files
      def parquetFiles(): Int = {
        def go(f: java.io.File): Int =
          if (f.isDirectory) Option(f.listFiles()).map(_.map(go).sum).getOrElse(0)
          else if (f.getName.endsWith(".parquet")) 1 else 0
        go(new java.io.File(s"$out/data"))
      }
      val filesBefore = parquetFiles()
      IvfIndex.compact(spark, out)
      val filesAfter = parquetFiles()
      assert(filesAfter < filesBefore,
        s"compact did not shrink: $filesBefore -> $filesAfter")
      // the duplicate-id append (a crash-retry's fingerprint) made the
      // pre-compact search emit duplicate candidate rows; compact HEALS
      // it — post-compact, the search is exactly the brute force over
      // the distinct corpus and every id has one row again
      val data = spark.read.parquet(s"$out/data")
      assert(data.groupBy("vec_id").count().filter(col("count") > 1)
        .count() === 0, "compact must collapse duplicate-id rows")
      val after = IvfIndex.searchExact(spark, out, col("vec_id") < 4)
        .collect().map(_.toSeq)
      assert(after.nonEmpty && after.toSeq.distinct === after.toSeq,
        "post-compact search must not emit duplicate candidates")
      assert(!new java.io.File(s"$out/data_old").exists())
      assert(!new java.io.File(s"$out/data_compacting").exists())
    } finally { rm(out); rm(oddSrc) }
  }

  /** Brute-force quantized-dot top-k over an embedding frame — the
    * delete tests' independent reference (e01's shape, no index). */
  private def brute(emb: org.apache.spark.sql.DataFrame,
      topK: Int = 10): Seq[Seq[Any]] = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.select(col("vec_id"), expr(IvfAnn.quant).as("qv"))
    val probes = q.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("qv").as("pq"))
    val dots = q.join(broadcast(probes), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        IvfAnn.qdot("pq", "qv").as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
    dots.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= topK).orderBy("query_id", "rnk")
      .collect().toSeq.map(_.toSeq)
  }

  test("delete retracts vectors exactly; compact folds the tombstones") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      import spark.implicits._
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      IvfIndex.write(spark, dir, out)
      val hc = spark.sessionState.newHadoopConf()
      val countsBefore = IvfIndex.readMeta(out, hc).counts.sum
      // delete every 7th vector (includes probe id 3 — deleted probes
      // stop being queries too) + an unknown id (must be a no-op)
      val doomed = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
      IvfIndex.delete(spark, out, doomed)
      IvfIndex.delete(spark, out, Seq(99999999L).toDF("vec_id"))
      IvfIndex.delete(spark, out, doomed) // re-delete: idempotent
      val expected = brute(emb.filter(col("vec_id") % 7 =!= 3))
      val got = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      assert(got === expected, "post-delete exact search != brute force " +
        "over the surviving corpus")
      // approx at nprobe=k is exhaustive — must agree post-delete too
      val k = IvfIndex.readMeta(out, hc).k
      val approx = IvfIndex.searchApprox(spark, out, col("vec_id") < 8,
        nprobe = k).collect().toSeq.map(_.toSeq)
      assert(approx === expected)
      // counts are untouched until compact (search subtracts on the fly)
      assert(IvfIndex.readMeta(out, hc).counts.sum === countsBefore)
      IvfIndex.compact(spark, out)
      assert(tombstoneParts(out) === 0,
        "compact must clear the folded tombstone files")
      val deleted = doomed.count()
      assert(IvfIndex.readMeta(out, hc).counts.sum === countsBefore - deleted,
        "compact must republish exact reduced counts")
      val after = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      assert(after === expected, "compaction changed the search result")
    } finally rm(out)
  }

  test("deleteVectors (O(batch), no corpus scan) matches the id-only delete") {
    val dir = "/root/testdata/sf0.001"
    val a = tmpDir(); val b = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val doomed = emb.filter(col("vec_id") % 5 === 2)
      IvfIndex.write(spark, dir, a)
      IvfIndex.write(spark, dir, b)
      IvfIndex.delete(spark, a, doomed.select("vec_id"))
      IvfIndex.deleteVectors(spark, b, doomed.select("vec_id", "embedding"))
      // identical tombstone sets (assignment against the frozen
      // centroids IS how the index placed the rows) ...
      val ta = spark.read.parquet(s"$a/tombstones")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val tb = spark.read.parquet(s"$b/tombstones")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(ta === tb)
      // ... hence identical searches
      val ra = IvfIndex.searchExact(spark, a, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      val rb = IvfIndex.searchExact(spark, b, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      assert(ra === rb && ra.nonEmpty)
    } finally { rm(a); rm(b) }
  }

  test("health reports rows/counts/tombstones/dups — and compact resets them") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    val oddSrc = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val odds = emb.filter(col("vec_id") % 2 === 1)
      odds.write.mode("overwrite").parquet(s"$oddSrc/embeddings.parquet")
      IvfIndex.write(spark, dir, out)
      val h1 = IvfIndex.health(spark, out)
      assert(h1.rows === emb.count() && h1.publishedCount === h1.rows)
      assert(h1.tombstones === 0L && h1.duplicateIds === 0L)
      assert(h1.imbalance >= 1.0)
      // a duplicate append + a pending takedown show up as the
      // maintenance signals they are
      IvfIndex.append(spark, oddSrc, out)
      IvfIndex.delete(spark, out,
        emb.filter(col("vec_id") % 9 === 2).select("vec_id"))
      val h2 = IvfIndex.health(spark, out)
      assert(h2.duplicateIds === odds.count())
      assert(h2.tombstones === emb.filter(col("vec_id") % 9 === 2).count())
      // compact folds + heals; the published counts match the rows again
      IvfIndex.compact(spark, out)
      val h3 = IvfIndex.health(spark, out)
      assert(h3.duplicateIds === 0L && h3.tombstones === 0L)
      assert(h3.publishedCount === h3.rows)
      assert(h3.rows === emb.count() - h2.tombstones)
    } finally { rm(out); rm(oddSrc) }
  }

  test("retrain re-clusters the drifted corpus; search stays exact") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    val evenSrc = tmpDir()
    val oddSrc = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.filter(col("vec_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$evenSrc/embeddings.parquet")
      emb.filter(col("vec_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$oddSrc/embeddings.parquet")
      // drift: centroids trained on the evens only, odds appended under
      // the frozen assignment; plus a pending takedown to fold
      IvfIndex.write(spark, evenSrc, out)
      IvfIndex.append(spark, oddSrc, out)
      IvfIndex.delete(spark, out,
        emb.filter(col("vec_id") % 7 === 3).select("vec_id"))
      IvfIndex.retrain(spark, out)
      val hc = spark.sessionState.newHadoopConf()
      assert(tombstoneParts(out) === 0,
        "retrain must fold pending tombstone files")
      val meta = IvfIndex.readMeta(out, hc)
      val kept = emb.filter(col("vec_id") % 7 =!= 3)
      assert(meta.counts.sum === kept.count(),
        "published counts must total the surviving corpus")
      assert(meta.lastBatch.isEmpty)
      // the retrained stats + assignment keep exact search exact
      val expected = brute(kept)
      val got = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      assert(got === expected)
      // and the leftovers of the staged swap are gone
      assert(!new java.io.File(s"$out/data_old").exists())
      assert(!new java.io.File(s"$out/data_compacting").exists())
    } finally { rm(out); rm(evenSrc); rm(oddSrc) }
  }

  test("corpus scan is partition-pruned; clustered corpora prune strictly") {
    // seeded clustered fixture: 4 tight blobs far apart — the adaptive
    // bound needs only the probe's own blob (plus ties), so the needed
    // union must be a strict subset of the k=8 lists
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val blobs = for {
      b <- 0 until 4
      i <- 0 until 50
    } yield {
      val base = Array.tabulate(64)(d => if (d % 4 == b) 10f else 0f)
      ((b * 50 + i).toLong,
        base.map(x => x + 0.01f * (rnd.nextFloat() * 2f - 1f)))
    }
    val src = tmpDir()
    val out = tmpDir()
    try {
      blobs.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
      IvfIndex.write(spark, src, out, k = 8)
      val res = IvfIndex.searchExact(spark, out, col("vec_id") < 3, topK = 5)
      val plan = res.queryExecution.executedPlan.toString
      // the literal IN filter must reach the partition level of the scan
      assert(plan.contains("PartitionFilters"), plan)
      assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).isDefined, plan)
      // exactness on the fixture: equals brute force
      val brute = {
        val e = spark.read.parquet(s"$src/embeddings.parquet")
          .select(col("vec_id"), expr(
            "transform(embedding, x -> cast(floor(cast(x as double) * 1048576D) as bigint))").as("qv"))
        val p = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("qv").as("pq"))
        val dots = e.crossJoin(p).filter(col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            graft.functions.ArrayMath.dot(col("pq"), col("qv")).as("dot"))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
        dots.withColumn("rnk", row_number().over(w).cast("bigint"))
          .filter(col("rnk") <= 5).orderBy("query_id", "rnk")
      }
      assert(res.collect().toSeq.map(_.toSeq) === brute.collect().toSeq.map(_.toSeq))
      // strict pruning: probes in blob 0 must not need every list
      val meta = IvfIndex.readMeta(out, spark.sessionState.newHadoopConf())
      val listed = new java.io.File(s"$out/data").listFiles()
        .count(_.getName.startsWith("cluster="))
      assert(listed === meta.counts.count(_ > 0))
      // the corpus scan's partition filter is the bracket that names
      // `cluster` — the probe-side scan renders FIRST with an empty
      // `PartitionFilters: []`, which is exactly what the pre-r12
      // first-bracket regex latched onto (vacuously passing). The
      // needed-list renders as `cluster IN (a,b,…)`, or `cluster = a`
      // when one list suffices; every shape must be FOUND before it is
      // counted so a plan-rendering change fails loudly instead of
      // silently untesting the pruning guarantee.
      val scannedParts =
        "PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\]".r.findFirstIn(plan)
      assert(scannedParts.isDefined, s"no cluster partition filter\n$plan")
      val n = "IN \\(([0-9, ]+)\\)".r.findFirstMatchIn(scannedParts.get)
        .map(_.group(1).split(',').length)
        .orElse("= ([0-9]+)".r.findFirstMatchIn(scannedParts.get).map(_ => 1))
      assert(n.isDefined, s"unrecognized partition-filter shape\n${scannedParts.get}")
      assert(n.get < listed, s"no pruning: needed ${n.get} of $listed lists\n${scannedParts.get}")
    } finally { rm(src); rm(out) }
  }

  test("bare retrain preserves the cluster count; explicit k reshapes") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      val hc = spark.sessionState.newHadoopConf()
      IvfIndex.write(spark, dir, out, k = 8)
      IvfIndex.retrain(spark, out) // maintenance call: no shape change
      assert(IvfIndex.readMeta(out, hc).k === 8,
        "a bare retrain() must not reshape the index")
      IvfIndex.retrain(spark, out, k = 4) // explicit resize
      val meta = IvfIndex.readMeta(out, hc)
      assert(meta.k === 4 && meta.counts.length === 4)
      // still exact after both
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val got = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      assert(got === brute(emb))
    } finally rm(out)
  }

  test("RETRAINING marker fences every entry point until a re-run clears it") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      import spark.implicits._
      val hc = spark.sessionState.newHadoopConf()
      IvfIndex.write(spark, dir, out)
      // simulate a retrain that died between its data swap and its
      // marker clear: the data/meta pair may be mixed-generation
      graft.util.Fs.writeStringAtomic(s"$out/RETRAINING", "crashed\n", hc)
      def refuses(body: => Any): Unit = {
        val e = intercept[IllegalStateException](body)
        assert(e.getMessage.contains("RETRAINING"), e.getMessage)
      }
      refuses(IvfIndex.readMeta(out, hc))
      refuses(IvfIndex.searchExact(spark, out, col("vec_id") < 8).collect())
      refuses(IvfIndex.searchApprox(spark, out, col("vec_id") < 8).collect())
      refuses(IvfIndex.delete(spark, out, Seq(1L).toDF("vec_id")))
      refuses(IvfIndex.compact(spark, out))
      refuses(IvfIndex.health(spark, out))
      // the documented recovery: re-run retrain — it converges and
      // clears the marker, restoring exact search
      IvfIndex.retrain(spark, out)
      assert(!new java.io.File(s"$out/RETRAINING").exists())
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val got = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      assert(got === brute(emb))
    } finally rm(out)
  }

  test("lifecycle: append×2 → delete → retrain matches a fresh rebuild's approx recall") {
    // e14's recall gate holds at BUILD time (the searchApprox test
    // above); this walks the full maintenance cycle a deployment
    // actually runs — appends under the frozen assignment (drift),
    // a takedown, then the retrain that answers the drift — and
    // re-measures nprobe-default recall at the END. Append's frozen
    // assignment and retrain's re-clustering move recall in opposite
    // directions; the floor must survive their composition.
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    val parts = (0 until 3).map(_ => tmpDir())
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      (0 until 3).foreach { m =>
        emb.filter(col("vec_id") % 3 === m)
          .write.mode("overwrite").parquet(s"${parts(m)}/embeddings.parquet")
      }
      IvfIndex.write(spark, parts(0), out)      // build on a third
      IvfIndex.append(spark, parts(1), out)     // drift in two appends
      IvfIndex.append(spark, parts(2), out)
      IvfIndex.delete(spark, out,               // ~11% takedown
        emb.filter(col("vec_id") % 9 === 2).select("vec_id"))
      IvfIndex.retrain(spark, out)
      def recallOf(idx: String): Double = {
        val exact = IvfIndex.searchExact(spark, idx, col("vec_id") < 8)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val approx = IvfIndex.searchApprox(spark, idx, col("vec_id") < 8)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(exact.nonEmpty)
        (exact & approx).size.toDouble / exact.size
      }
      val after = recallOf(out)
      // the honest comparator is a FRESH build over the SAME survivors:
      // it isolates "what maintenance cost" from "what this corpus's
      // clustering gives" (absolute recall on the near-random driver
      // corpus wobbles a few points between equally-good clusterings —
      // retrain ≈ rebuild up to FP-sum combine order in Lloyd's avg)
      val kept = emb.filter(col("vec_id") % 9 =!= 2)
      val freshSrc = tmpDir()
      val fresh = tmpDir()
      try {
        kept.write.mode("overwrite").parquet(s"$freshSrc/embeddings.parquet")
        IvfIndex.write(spark, freshSrc, fresh)
        val rebuilt = recallOf(fresh)
        info(f"post-maintenance recall $after%.3f vs fresh-rebuild $rebuilt%.3f")
        assert(after >= rebuilt - 0.05,
          f"maintenance cost recall: $after%.3f vs fresh rebuild $rebuilt%.3f")
        assert(after >= 0.4, f"recall $after%.3f below the sanity floor")
      } finally { rm(freshSrc); rm(fresh) }
      // and the exact path stayed a proof across the whole cycle
      assert(IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq) === brute(kept))
    } finally { rm(out); parts.foreach(rm) }
  }

  test("FOLDING marker fences readers; a fold re-run converges and clears it") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    val src = tmpDir()
    try {
      val hc = spark.sessionState.newHadoopConf()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.write.mode("overwrite").parquet(s"$src/embeddings.parquet")
      IvfIndex.initStreaming(spark, src, out, k = 4)
      IvfIndex.appendBatch(spark, emb, out, 0L)
      // the SAME vec_ids land again in a later batch: the streaming
      // layout double-counts them — exactly the debt whose fold-crash
      // window the marker fences
      IvfIndex.appendBatch(spark, emb.filter(col("vec_id") % 2 === 1), out, 1L)
      // simulate a foldStreaming that died between its swap and its
      // counts publish
      graft.util.Fs.writeStringAtomic(s"$out/FOLDING", "crashed\n", hc)
      val e = intercept[IllegalStateException](IvfIndex.readMeta(out, hc))
      assert(e.getMessage.contains("FOLDING"), e.getMessage)
      intercept[IllegalStateException](
        IvfIndex.searchExact(spark, out, col("vec_id") < 8).collect())
      // the documented recovery: re-run the fold — it tolerates its own
      // marker, converges, and clears it
      IvfIndex.foldStreaming(spark, out)
      assert(!new java.io.File(s"$out/FOLDING").exists())
      val h = IvfIndex.health(spark, out)
      assert(h.duplicateIds === 0L && h.publishedCount === h.rows)
      assert(h.streaming, "fold must keep the streaming layout")
      // compact (the finalizing fold) is the other documented recovery:
      // crash it again and recover through compact
      graft.util.Fs.writeStringAtomic(s"$out/FOLDING", "crashed\n", hc)
      IvfIndex.compact(spark, out)
      assert(!new java.io.File(s"$out/FOLDING").exists())
      assert(!IvfIndex.health(spark, out).streaming, "compact finalizes")
      val got = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      assert(got === brute(emb))
    } finally { rm(out); rm(src) }
  }

  test("retrain is a real convergence path for a crashed fold: it clears FOLDING") {
    // readMeta's FOLDING recovery names "foldStreaming (or compact, or
    // retrain)" — following it with a retrain must actually converge:
    // the retrain completes (it reads meta raw), republishes exact
    // counts, and must NOT leave the stale fold fence behind (which
    // would keep every reader refusing after a successful recovery,
    // with retrain re-runs looping forever)
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    val src = tmpDir()
    try {
      val hc = spark.sessionState.newHadoopConf()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.write.mode("overwrite").parquet(s"$src/embeddings.parquet")
      IvfIndex.initStreaming(spark, src, out, k = 4)
      IvfIndex.appendBatch(spark, emb, out, 0L)
      graft.util.Fs.writeStringAtomic(s"$out/FOLDING", "crashed\n", hc)
      IvfIndex.retrainStreaming(spark, out)
      assert(!new java.io.File(s"$out/FOLDING").exists(),
        "a completed retrain must clear the fold fence it resolves")
      assert(!new java.io.File(s"$out/RETRAINING").exists())
      val h = IvfIndex.health(spark, out) // readMeta no longer refuses
      assert(h.publishedCount === h.rows && h.streaming)
    } finally { rm(out); rm(src) }
  }

  test("fold-class pre-flight names the interrupted-swap recovery despite live tombstones") {
    // a crash between stagedDataSwap's two renames leaves data/ missing
    // beside a complete data_old. With live tombstones, the would-empty
    // check reads data/ as parquet BEFORE the swap's own audit — without
    // the pre-flight that read crashes with an unable-to-infer-schema
    // error instead of naming the one recovering rename
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      val hc = spark.sessionState.newHadoopConf()
      IvfIndex.write(spark, dir, out, k = 4)
      IvfIndex.delete(spark, out, Seq(1L).toDF("vec_id")) // live tombstone
      graft.util.Fs.rename(s"$out/data", s"$out/data_old", hc)
      val e = intercept[IllegalStateException](IvfIndex.compact(spark, out))
      assert(e.getMessage.contains("rename"), e.getMessage)
      // recover exactly as instructed, then the fold completes
      graft.util.Fs.rename(s"$out/data_old", s"$out/data", hc)
      IvfIndex.compact(spark, out)
      assert(IvfIndex.health(spark, out).tombstones === 0L)
    } finally rm(out)
    // same window on the streaming fold
    val sOut = tmpDir()
    try {
      val hc = spark.sessionState.newHadoopConf()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      IvfIndex.initStreaming(spark, dir, sOut, k = 4)
      IvfIndex.appendBatch(spark, emb, sOut, 0L)
      IvfIndex.delete(spark, sOut, Seq(1L).toDF("vec_id"))
      graft.util.Fs.rename(s"$sOut/data", s"$sOut/data_old", hc)
      val e = intercept[IllegalStateException](IvfIndex.foldStreaming(spark, sOut))
      assert(e.getMessage.contains("rename"), e.getMessage)
      graft.util.Fs.rename(s"$sOut/data_old", s"$sOut/data", hc)
      IvfIndex.foldStreaming(spark, sOut)
      assert(IvfIndex.health(spark, sOut).tombstones === 0L)
    } finally rm(sOut)
  }

  test("retrain pre-flight failures refuse BEFORE fencing — the index stays readable") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val hc = spark.sessionState.newHadoopConf()
    // (a) a streaming index before its first batch: nothing to retrain
    val empty = tmpDir()
    try {
      IvfIndex.initStreaming(spark, dir, empty, k = 4)
      intercept[IllegalArgumentException](IvfIndex.retrainStreaming(spark, empty))
      assert(!new java.io.File(s"$empty/RETRAINING").exists(),
        "a deterministic pre-flight failure must not brick the index")
      IvfIndex.readMeta(empty, hc) // still readable
    } finally rm(empty)
    // (b) a fully-tombstoned corpus: nothing to re-cluster. The corpus
    // also carries crash-retry DUPLICATE rows (append of the same src),
    // so raw row count exceeds the tombstone count — the count proxy
    // that would let this state slip into the refusal crash; the exact
    // anti-join check must still classify it as empty
    val out = tmpDir()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      IvfIndex.write(spark, dir, out, k = 4)
      IvfIndex.append(spark, dir, out) // duplicates every vec_id
      IvfIndex.delete(spark, out, emb.select("vec_id"))
      val e = intercept[IllegalStateException](IvfIndex.retrain(spark, out))
      assert(e.getMessage.contains("tombstoned"), e.getMessage)
      assert(!new java.io.File(s"$out/RETRAINING").exists())
      IvfIndex.readMeta(out, hc) // still readable
      // and searches over the emptied corpus still answer (exactly:
      // zero candidates), because nothing was fenced
      assert(IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().isEmpty)
      // compact refuses too — folding to zero rows would write a
      // parquet-less data/ that every later read crashes on — and the
      // maintenance policy SKIPS the state instead of tripping it (a
      // self-maintaining stream must not crash on full retraction)
      val e2 = intercept[IllegalStateException](IvfIndex.compact(spark, out))
      assert(e2.getMessage.contains("would empty"), e2.getMessage)
      assert(IvfIndex.maintain(spark, out,
        MaintenancePolicy(maxTombstonePermille = 1, minRows = 1)) === "none")
      IvfIndex.readMeta(out, hc) // the index survived all of it
    } finally rm(out)
    // (c) FOREIGN-id tombstones (deleteVectors of never-ingested
    // vectors) inflate the tombstone count past the live-row count —
    // the proxy that would permanently LATCH the maintenance skip.
    // With survivors present, maintenance must still act.
    val out2 = tmpDir()
    try {
      import spark.implicits._
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      IvfIndex.write(spark, dir, out2, k = 4)
      // foreign set larger than the corpus (ids offset out of range)
      IvfIndex.deleteVectors(spark, out2, emb
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      IvfIndex.delete(spark, out2, // plus a REAL 20% takedown
        emb.filter(col("vec_id") % 5 === 0).select("vec_id"))
      val h = IvfIndex.health(spark, out2)
      assert(h.tombstones > h.rows, s"fixture must inflate tombstones: $h")
      assert(IvfIndex.maintain(spark, out2,
        MaintenancePolicy(maxTombstonePermille = 100, minRows = 1)) === "compact",
        "foreign tombstones must not latch the maintenance skip")
      val h2 = IvfIndex.health(spark, out2)
      assert(h2.tombstones === 0L &&
        h2.rows === n - emb.filter(col("vec_id") % 5 === 0).count())
    } finally rm(out2)
  }

  test("a delete racing a retrain is re-derived under the NEW clustering") {
    val dir = "/root/testdata/sf0.001"
    val out = tmpDir()
    try {
      import spark.implicits._
      val hc = spark.sessionState.newHadoopConf()
      IvfIndex.write(spark, dir, out, k = 8)
      val target = 17L
      // the lateWindow seam lands a tombstone exactly where a real
      // concurrent delete() could: committed after retrain's snapshot
      // (so not folded), carrying a cluster id of the WRONG clustering
      IvfIndex.retrainHooked(spark, out, 0, 2, () => {
        val newCluster = spark.read.parquet(s"$out/data")
          .filter(col("vec_id") === target).select("cluster")
          .collect().head.getInt(0)
        Seq((target, (newCluster + 1) % 8))
          .toDF("vec_id", "cluster")
          .coalesce(1).write.mode("append").parquet(s"$out/tombstones")
      })
      // re-resolution rewrote the tombstone with the cluster the NEW
      // data actually holds the row in — the count subtraction lands on
      // the right list, keeping the pruning bound a proof
      val tomb = spark.read.parquet(s"$out/tombstones").collect()
      assert(tomb.length === 1 && tomb.head.getLong(0) === target)
      val newCluster = spark.read.parquet(s"$out/data")
        .filter(col("vec_id") === target).select("cluster")
        .collect().head.getInt(0)
      assert(tomb.head.getInt(1) === newCluster,
        s"tombstone cluster ${tomb.head.getInt(1)} != data cluster $newCluster")
      // and the deleted row is excluded from search, exactly
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val got = IvfIndex.searchExact(spark, out, col("vec_id") < 8)
        .collect().toSeq.map(_.toSeq)
      assert(got === brute(emb.filter(col("vec_id") =!= target)))
    } finally rm(out)
  }
}
