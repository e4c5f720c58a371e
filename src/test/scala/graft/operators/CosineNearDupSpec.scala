package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.GraftSession

/** Non-vacuous verification for the sign-bucketed cosine near-dup
  * operator. The driver's synthetic embeddings contain NO cos≥0.9 pairs
  * (max pairwise cosine ≈ 0.51 at every sf), so its oracle check passes
  * on 0==0; this spec seeds a fixture that DOES contain true near-dups
  * (perturbed copies, cos ≈ 0.999) and asserts containment + recall
  * against the exact all-pairs ground truth. */
class CosineNearDupSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  /** 40 random base vectors + a perturbed near-copy of the first 25
    * (±0.05 per component → cosine ≈ 0.999). Fixed seed: deterministic. */
  private lazy val fixture: DataFrame = {
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val bases = (0 until 40).map(i => (i.toLong, vec()))
    val dups = (0 until 25).map { i =>
      val d = bases(i)._2.map(x => x + 0.05f * (rnd.nextFloat() * 2f - 1f))
      ((100 + i).toLong, d)
    }
    import spark.implicits._
    (bases ++ dups).toDF("vec_id", "embedding")
  }

  private def pairSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed pairs ⊆ exact all-pairs truth, recall ≥ 0.75, truth non-empty") {
    val got = pairSet(CosineNearDup.pairs(fixture))
    val truth = pairSet(CosineNearDup.bruteForce(fixture))
    assert(truth.size >= 20, s"seeded fixture must contain near-dup pairs, got ${truth.size}")
    assert(got.subsetOf(truth),
      s"verified pairs must be true cos≥0.9 pairs; extras: ${got -- truth}")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.75,
      s"sign-bucket recall $recall (${got.size}/${truth.size})")
  }

  test("scores agree exactly with brute force on shared pairs") {
    val got = CosineNearDup.pairs(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val bf = CosineNearDup.bruteForce(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got.foreach { case (k, v) =>
      assert(bf(k) === v, s"dot/norm mismatch for $k")
    }
  }

  test("driver testdata really has no true pairs (documents the 0-row oracle)") {
    val truth = pairSet(CosineNearDup.bruteForce(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")))
    assert(truth.isEmpty)
  }
}
