package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import org.apache.spark.sql.functions._

/** Persisted MinHash band index: scheme parity with m01, probe
  * correctness on a hand-built fixture, append ≡ rebuild, self-pair
  * exclusion, incomplete-index refusal. */
class MinHashIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private def tmp() =
    java.nio.file.Files.createTempDirectory("mhidx").toString + "/idx"

  /** base: d1 (20 distinct tokens), d2 unrelated; batch: d3 = exact copy
    * of d1, d4 = d1 with the LAST token changed — only the final one of
    * the 18 3-gram shingles contains it, so 17 shingles are shared →
    * jaccard 17/19 = 894 permille; d5 unrelated. */
  private def fixture = {
    import spark.implicits._
    val t1 = (1 to 20).map(i => s"w$i").mkString(" ")
    val t4 = ((1 to 19).map(i => s"w$i") :+ "zz").mkString(" ")
    (Seq((1L, t1), (2L, "x1 x2 x3 x4 x5")),
      Seq((3L, t1), (4L, t4), (5L, "y1 y2 y3 y4 y5")),
      Seq.empty[(Long, String)])
  }

  // NOTE this is a DELEGATION check, not independent scheme pinning:
  // Similarity.minhashBands routes through MinHashIndex.bands (one
  // definition by design), so both sides run the same code — what this
  // pins is the plumbing/spread wiring. Independent pinning of the
  // scheme itself rests on m01/m04's DuckDB oracles.
  test("Similarity.minhashBands delegates to MinHashIndex.bands (plumbing pin)") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mine = MinHashIndex.bands(MinHashIndex.signatures(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val m01 = graft.queries.Similarity.minhashBands(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    graft.queries.QueryDef.drainCleanups()
    assert(mine === m01)
    assert(mine.nonEmpty)
  }

  test("probe answers a new batch from the persisted index") {
    import spark.implicits._
    val (base, batch, _) = fixture
    val idx = tmp()
    MinHashIndex.write(spark, base.toDF("doc_id", "text"), idx)
    val got = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(batch.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // d3 = exact copy of d1: identical signature, every band collides,
    // jaccard exactly 1000. d4's 894-permille edit also lands in a
    // shared band for these fixed strings (md5 is deterministic — this
    // is LSH recall on pinned inputs, not luck per run). d2/d5 pair
    // with nothing.
    assert(got === Set((3L, 1L, 1000L), (4L, 1L, 894L)))
  }

  test("append-then-probe equals a one-shot rebuild") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val a = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 =!= 0)
    val batch = MinHashIndex.signatures(docs.filter(col("doc_id") % 5 === 0))

    val incr = tmp()
    MinHashIndex.write(spark, a, incr)
    MinHashIndex.append(spark, b, incr)
    val oneShot = tmp()
    MinHashIndex.write(spark, a.unionByName(b), oneShot)

    def pairs(idx: String) = MinHashIndex.probe(spark, idx, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val p1 = pairs(incr)
    assert(p1 === pairs(oneShot))
    assert(p1.nonEmpty, "cross-split fixture should contain near-dups")
    // meta counts the union after the append
    val meta = graft.util.Fs.readString(s"$incr/meta.json", graft.util.Fs.conf())
    assert(meta.contains(s""""n_docs":${a.count() + b.count()}"""))
  }

  test("probing already-indexed docs never reports self-pairs") {
    import spark.implicits._
    val (base, batch, _) = fixture
    val all = (base ++ batch).toDF("doc_id", "text")
    val idx = tmp()
    MinHashIndex.write(spark, all, idx)
    val got = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(batch.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (b2, a2) => b2 != a2 })
    // the twins still find EACH OTHER (both directions live in the index)
    assert(got.contains((3L, 1L)))
  }

  test("append refuses a directory without a complete build") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      MinHashIndex.append(spark,
        Seq((1L, "a b c")).toDF("doc_id", "text"), tmp())
    }
    assert(e.getMessage.contains("meta.json"))
  }
}
