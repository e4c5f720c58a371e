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
}
