package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** The e12 recall contract: the fixed-nprobe approximate kNN graph
  * (IvfAnn.knnGraph, broadcast-centroid plan) must recover ≥ 0.95 of the
  * exact top-5 graph edges on the driver's sf0.01 corpus — near-random
  * vectors, i.e. the ADVERSARIAL case for IVF pruning (real embedding
  * corpora cluster tighter, which only raises recall). Dial sweep that
  * chose (k=32, nprobe=24): recall 0.58–0.99 over k∈{16,32,64} ×
  * nprobe/k∈{0.25,0.5,0.75}; the default is the smallest dial clearing
  * the gate with margin (0.977 measured). */
class KnnGraphApproxSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.01"

  test("recall >= 0.95 vs the exact graph at the default dials") {
    val exact = IvfAnn.knnExact(spark, dir, lit(true), topK = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfAnn.knnGraph(spark, dir, topK = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
    // the approximate graph is still a top-5 graph: every query holds
    // at most 5 edges, and edges it shares with the exact graph carry
    // the same exact-integer dot (the re-rank is exact; only the
    // candidate pool is approximate)
    val perQuery = approx.groupBy(_._1).map(_._2.size)
    assert(perQuery.max <= 5)
  }

  test("scale dial (k=sqrt(n), fixed nprobe): recall >= 0.95 at sf0.1") {
    // gated at sf0.1 deliberately: with n=2000, k=44 > nprobe=24 the
    // dial genuinely approximates (at sf0.01 sqrt(500)=22 <= nprobe, so
    // every cluster is probed and the graph is trivially exact)
    val d1 = "/root/testdata/sf0.1"
    val exact = IvfAnn.knnExact(spark, d1, lit(true), topK = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfAnn.knnGraphScaled(spark, d1, topK = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.95, f"scale-dial recall $recall%.4f < 0.95")
    assert(approx.groupBy(_._1).map(_._2.size).max <= 5)
  }

  test("broadcast-join training matches the literal-expression training") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val viaJoin = IvfAnn.trainCentroidsJoin(spark, emb, k = 16, iters = 2)
    val viaLits = IvfAnn.trainCentroids(emb, k = 16, iters = 2)
    assert(viaJoin.size === viaLits.size)
    viaJoin.zip(viaLits).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.toSeq === b.toSeq, s"centroid $i drifted between plans")
    }
  }
}
