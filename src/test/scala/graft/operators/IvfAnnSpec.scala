package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** IVF ANN quality: deterministic training, full coverage of the corpus
  * by inverted lists, and recall@10 against the exact brute-force
  * baseline (e01 semantics) at sf0.01. */
class IvfAnnSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.01"

  test("training is deterministic and centroids have the right shape") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val c1 = IvfAnn.trainCentroids(emb, k = 8, iters = 1)
    val c2 = IvfAnn.trainCentroids(emb, k = 8, iters = 1)
    assert(c1.length === 8)
    assert(c1.head.length === 64)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  test("knnExact on a corpus smaller than topK returns every neighbor") {
    // regression: the prune upper bound is NULL when cluster counts
    // can't cover topK+1 rows — that must mean "scan everything", not
    // "prune everything" (which silently returned zero rows)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_small").toString
    try {
      val rnd = new scala.util.Random(3)
      (0 until 6).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      val out = IvfAnn.knnExact(spark, tmp, col("vec_id") < 2, topK = 10, k = 4)
        .collect()
      // 2 probes × all 5 other vectors each
      assert(out.length === 10, out.mkString("\n"))
    } finally {
      val p = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
    }
  }

  test("rangeSearch equals the brute-force threshold filter on a clustered corpus") {
    import spark.implicits._
    // clustered corpus: 4 tight balls far apart — probes' qualifying
    // neighbors live in the probe's own ball, so the fixed-threshold
    // Cauchy-Schwarz bound must prune the other balls' clusters
    val tmp = java.nio.file.Files.createTempDirectory("graft_range").toString
    try {
      val rnd = new scala.util.Random(11)
      val centers = Array.fill(4)(Array.fill(64)(rnd.nextDouble() * 8d - 4d))
      (0 until 200).map { i =>
        val c = centers(i % 4)
        (i.toLong, c.map(x => (x + rnd.nextDouble() * 0.1d - 0.05d).toFloat))
      }.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

      val got = IvfAnn.rangeSearch(spark, tmp, col("vec_id") < 8,
          num = 1, den = 2, k = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      // brute force over the SAME quantization: every pair with
      // 2·qdot >= qself, no pruning anywhere
      val q = spark.read.parquet(s"$tmp/embeddings.parquet")
        .select(col("vec_id"), expr(IvfAnn.quant).as("qv"))
      val probes = q.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("qv").as("pq"),
          graft.functions.ArrayMath.dot(col("qv"), col("qv")).as("qself"))
      val want = q.join(broadcast(probes), col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"),
          graft.functions.ArrayMath.dot(col("pq"), col("qv")).as("dot"),
          col("qself"))
        .filter(col("dot") * 2 >= col("qself"))
        .select("query_id", "cand_id", "dot")
        .orderBy("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      assert(got.nonEmpty, "threshold returned no rows — corpus not clustered?")
      assert(got.toSeq === want.toSeq)
      // in-ball neighbors only: ~49 same-ball candidates per probe
      assert(got.groupBy(_._1).values.forall(g => g.length >= 40), got.length)
    } finally {
      val p = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
    }
  }

  test("recall@10 vs exact brute force") {
    val ivf = IvfAnn.knn(spark, dir, col("vec_id") < 8,
        topK = 10, k = 16, nprobe = 4)
      .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("cand_id")))).toSet
    val exact = graft.queries.Similarity.defs("e01_knn_dot")
      .build(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("cand_id")))).toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // nprobe=4 of k=16 lists ⇒ searching ~25% of the corpus; on the
    // synthetic clustered embeddings this recovers most true neighbors
    assert(recall >= 0.5, s"recall@10 = $recall")
    // every probe produced a full top-10
    assert(ivf.size === exact.size)
  }

  test("big-k assignment (broadcast join) is bit-identical to the literal form") {
    // above LiteralKCeiling, assign/clusterStats dispatch to the
    // broadcast min_by form — the k = sqrt(n) dial's path. Parity with
    // the k×dim-literal expressions (same doubles, same tie order) is
    // what lets every index layout keep its exactness proofs at big k
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val k = IvfAnn.LiteralKCeiling + 8 // join path; literal still fine at spec scale
    val cents = IvfAnn.trainCentroids(emb, k = k, iters = 2)
    assert(cents.size === k)
    val viaJoin = IvfAnn.assign(emb, cents)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLiteral = emb
      .withColumn("dists", IvfAnn.distArray(cents))
      .withColumn("label",
        element_at(IvfAnn.nearestClusters(cents.length, 1), 1).cast("long"))
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaJoin.nonEmpty && viaJoin === viaLiteral)
    // clusterStats' big-k branch carries the min d² instead of
    // re-indexing the literal dist array — same radius/count/maxNorm
    val stats = IvfAnn.clusterStats(emb, cents)
    val small = cents.take(IvfAnn.LiteralKCeiling) // literal branch
    val statsSmall = IvfAnn.clusterStats(emb, small)
    assert(stats.count.sum === statsSmall.count.sum) // every vector assigned once
    assert(math.abs(stats.maxNorm - statsSmall.maxNorm) < 1e-12)
    // distToAssigned's join branch ≡ the literal element_at lookup
    val assigned = IvfAnn.assign(emb, cents)
    val viaJoinD = IvfAnn.distToAssigned(assigned, cents)
      .select("vec_id", "d").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val litArr = array(cents.map(c => array(c.map(lit(_)): _*)): _*)
    val viaLitD = assigned.withColumn("d",
        sqrt(graft.functions.ArrayMath.l2sq(
          col("embedding").cast("array<double>"),
          element_at(litArr, col("label").cast("int") + 1))))
      .select("vec_id", "d").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaJoinD.nonEmpty && viaJoinD === viaLitD)
  }

  test("big-k assign matches the literal form on degenerate rows") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val k = IvfAnn.LiteralKCeiling + 8
    val cents = IvfAnn.trainCentroids(emb, k = k, iters = 1)
    // NULL embedding: literal form propagates a NULL label; the join
    // form must not hand the row an arbitrary min_by centroid
    val withNullEmb = emb.limit(5).withColumn("embedding",
      when(col("vec_id") === emb.select(min("vec_id")).head.getLong(0),
        lit(null)).otherwise(col("embedding")))
    val lbls = IvfAnn.assign(withNullEmb, cents)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(lbls.size === 5)
    assert(lbls.values.count(_.isEmpty) === 1) // exactly the nulled row
    // NULL vec_id: the join-back would silently drop the row — the
    // big-k form refuses it in-plan instead of flipping behavior at
    // the k = LiteralKCeiling boundary
    val withNullId = emb.limit(5).withColumn("vec_id",
      when(col("vec_id") === emb.select(min("vec_id")).head.getLong(0),
        lit(null)).otherwise(col("vec_id")))
    val ex = intercept[Exception] {
      IvfAnn.assign(withNullId, cents).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("NULL vec_id")))
  }
}
