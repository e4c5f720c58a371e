package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** ScaleUp is a measurement instrument — its replication must have the
  * LINEAR shape of a larger crawl or the scale sweep measures the
  * wrong thing: dup families and vocab must scale in COUNT (×N), not
  * in size, and vector geometry must be norm-preserved. */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.001"

  test("documents replicate with decorrelated text: families x N, sizes constant") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rep = ScaleUp.replicateDocs(docs, 3)
    val n = docs.count()
    assert(rep.count() === 3 * n)
    // ids unique across replicas
    assert(rep.select("doc_id").distinct().count() === 3 * n)
    // exact-dup structure scales in family COUNT: distinct texts x3
    // exactly (translation is a bijection on text, so same-replica
    // dups stay dups and no NEW cross-replica dups appear)
    val d0 = docs.select(countDistinct("text")).head.getLong(0)
    assert(rep.select(countDistinct("text")).head.getLong(0) === 3 * d0)
    // token lengths preserved (BPE/window shapes intact): the
    // per-replica length histogram equals the original's
    val hist = docs.select(length(col("text")).as("l"))
      .groupBy("l").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val histR = rep.filter(col("doc_id") >= 10000000L && col("doc_id") < 20000000L)
      .select(length(col("text")).as("l")).groupBy("l").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(histR === hist)
    // replica 0 is the original verbatim
    assert(rep.filter(col("doc_id") < 10000000L)
      .except(docs).count() === 0)
  }

  test("embeddings replicate norm-preserved and id-unique") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val rep = ScaleUp.replicateEmbeddings(emb, 3)
    val n = emb.count()
    assert(rep.count() === 3 * n)
    assert(rep.select("vec_id").distinct().count() === 3 * n)
    // rotation preserves the float MULTISET exactly (the norm is the
    // same mathematical value; an ordered FP sum may differ in the
    // last ulp, so the bit-exact claim is sorted-array equality)
    val sortedExpr = sort_array(col("embedding"))
    val base = emb.select(col("vec_id"), sortedExpr.as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rep.filter(col("vec_id") >= 20000000L)
      .select((col("vec_id") - 20000000L).as("vec_id"), sortedExpr.as("s"))
      .collect().foreach { r =>
        assert(r.getSeq[Float](1) === base(r.getLong(0)),
          s"float multiset moved for ${r.getLong(0)}")
      }
    // and the rotated vector is NOT the original (decorrelated)
    val same = rep.filter(col("vec_id") >= 20000000L)
      .select((col("vec_id") - 20000000L).as("vec_id"),
        col("embedding").as("e2"))
      .join(emb, "vec_id")
      .filter(col("e2") === col("embedding")).count()
    assert(same === 0L)
  }

  test("affine permutations stay distinct way past the old factor-13 alias") {
    // the single-rotation scheme repeated at i+13 — cross-replica
    // exact dups. Affine pairs must be pairwise distinct across the
    // whole documented range, and each must be a bijection
    val pairs = (0 until ScaleUp.MaxDocReplicas).map(ScaleUp.affinePair)
    assert(pairs.distinct.size === ScaleUp.MaxDocReplicas)
    assert(ScaleUp.affinePair(0) === ((1, 0))) // replica 0 verbatim
    pairs.foreach { case (a, b) =>
      val img = (0 until 26).map(p => (a * p + b) % 26)
      assert(img.distinct.size === 26, s"($a,$b) is not a bijection")
    }
    // and any two agree on at most 2 letter positions — shingles
    // cannot survive translation between replicas
    for (i <- 0 until 40; j <- (i + 1) until 40) {
      val ((a1, b1), (a2, b2)) = (pairs(i), pairs(j))
      val agree = (0 until 26).count(p =>
        (a1 * p + b1) % 26 == (a2 * p + b2) % 26)
      assert(agree <= 2, s"replicas $i,$j share $agree letters")
    }
    intercept[IllegalArgumentException](
      ScaleUp.affinePair(ScaleUp.MaxDocReplicas))
  }

  test("cross-replica text distinctness holds at the old alias points") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(50)
    // replicas 1, 13, 14, 27 all carry mutually distinct translations:
    // distinct-text count is exactly replicas x originals
    val rep = ScaleUp.replicateDocs(docs, 28)
    val d0 = docs.select(countDistinct("text")).head.getLong(0)
    assert(rep.select(countDistinct("text")).head.getLong(0) === 28 * d0)
  }

  test("embedding replicas past one rotation lap negate (and still norm-preserve)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(5)
    val d = emb.select(size(col("embedding"))).head.getInt(0)
    val rep = ScaleUp.replicateEmbeddings(emb, d + 1)
    // replica d is the NEGATED original — distinct from replica 0 but
    // with the same squared norm
    val baseNorm = emb.select(col("vec_id"),
      expr("aggregate(embedding, 0D, (s, x) -> s + x * x)").as("n2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lap = rep.filter(col("vec_id") >= d.toLong * 10000000L)
      .select((col("vec_id") - d.toLong * 10000000L).as("vec_id"),
        expr("aggregate(embedding, 0D, (s, x) -> s + x * x)").as("n2"),
        col("embedding").as("e2"))
      .join(emb, "vec_id")
    lap.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - baseNorm(r.getLong(0))) < 1e-6)
      val (e2, e1) = (r.getSeq[Float](2), r.getSeq[Float](3))
      assert(e2 === e1.map(x => -x), s"replica $d is not the negation")
    }
    intercept[IllegalArgumentException](
      ScaleUp.replicateEmbeddings(emb, 2 * d + 1))
  }
}
