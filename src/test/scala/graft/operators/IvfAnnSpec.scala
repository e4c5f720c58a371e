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
}
