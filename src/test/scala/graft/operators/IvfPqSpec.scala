package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ quality: deterministic codebooks, valid code shape, and
  * recall@10 vs the exact brute-force baseline (e01 semantics) — PQ's
  * ADC shortlist + exact re-rank should lose little recall vs plain
  * IVF while moving only M-byte codes per candidate. */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.01"

  test("codebook training is deterministic with the right shape") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb1 = IvfPq.trainCodebooks(emb, m = 4, k = 8, iters = 1)
    val cb2 = IvfPq.trainCodebooks(emb, m = 4, k = 8, iters = 1)
    assert(cb1.books.length === 4)
    assert(cb1.books.forall(_.length === 8))
    assert(cb1.subDim === 16) // dim 64 / M 4
    cb1.books.zip(cb2.books).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("recall@10 vs exact brute force") {
    val pq = IvfPq.knn(spark, dir, col("vec_id") < 8,
        topK = 10, coarseK = 16, nprobe = 4, m = 8, pqK = 16)
      .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("cand_id")))).toSet
    val exact = graft.queries.Similarity.defs("e01_knn_dot")
      .build(spark, dir)
      .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("cand_id")))).toSet
    val recall = exact.count(pq.contains).toDouble / exact.size
    // PQ shares IVF's candidate pool (nprobe=4 of k=16 lists), so IVF's
    // recall is PQ's ceiling — the metric that matters is how much of it
    // the 8-byte codes preserve while never joining full vectors per
    // candidate
    val ivf = IvfAnn.knn(spark, dir, col("vec_id") < 8,
        topK = 10, k = 16, nprobe = 4)
      .collect().map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("cand_id")))).toSet
    val ivfRecall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.9 * ivfRecall,
      s"recall@10 = $recall vs IVF ceiling $ivfRecall")
    assert(recall >= 0.4, s"recall@10 = $recall") // absolute floor
    assert(pq.size === exact.size) // full top-10 per probe
  }
}
