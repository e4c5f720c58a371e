package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Pins the oracle-mode ANN paths (the e03/e05/e06 query entries) to
  * EXACT equality with the e01 brute force — full rows (query_id,
  * cand_id, dot, rnk), not just recall — at both driver verify scales.
  *
  *   - e05 (IvfAnn.knnExact) and e06 (IvfPq.knnExact) are exact by
  *     construction (triangle-inequality cluster pruning; Cauchy-Schwarz
  *     ADC bounds): this spec is the regression tripwire for the bound
  *     arithmetic.
  *   - e03 (AnnLsh at tables=40, bits=4) has no mathematical guarantee —
  *     LSH is probabilistic — but hyperplanes are seeded and the corpus
  *     is fixed, so green here IS the proof that the bucket union covers
  *     every true top-10 the driver will check.
  */
class AnnOracleParitySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("query_id")),
      r.getLong(r.fieldIndex("cand_id")),
      r.getLong(r.fieldIndex("dot")),
      r.getLong(r.fieldIndex("rnk")))).toSeq

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")) {
    lazy val exact = rows(graft.queries.Similarity.defs("e01_knn_dot").build(spark, dir))

    test(s"e05 exact-pruned IVF equals brute force at $dir") {
      assert(rows(graft.queries.Similarity.defs("e05_ann_ivf").build(spark, dir)) === exact)
    }
    test(s"e06 exact-shortlist IVF-PQ equals brute force at $dir") {
      assert(rows(graft.queries.Similarity.defs("e06_ann_ivfpq").build(spark, dir)) === exact)
    }
    test(s"e03 oracle-mode LSH equals brute force at $dir") {
      assert(rows(graft.queries.Similarity.defs("e03_ann_lsh").build(spark, dir)) === exact)
    }
  }
}
