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

  test("knnExact is exact on random corpora of arbitrary norms (property, 3 seeds)") {
    // the exactness argument is mathematical (Cauchy-Schwarz cluster
    // pruning for MIPS; PQ adds the reconstruction-error ADC bound) and
    // makes NO norm assumption — exercise it beyond the fixed driver
    // corpus on seeded raw Gaussian vectors, scaled per-vector by a
    // random factor in [0.5, 4) so norms vary widely, against a
    // driver-side brute force
    import spark.implicits._
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until 48).map { i =>
        val scale = 0.5 + 3.5 * rnd.nextDouble()
        (i.toLong, Array.fill(64)((rnd.nextGaussian() * scale).toFloat))
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_ann_prop").toString
      try {
        vecs.toDF("vec_id", "embedding")
          .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
        // driver-side brute force with the operators' own quantization
        def qv(e: Array[Float]) = e.map(x => math.floor(x.toDouble * 1048576d).toLong)
        val expected = vecs.filter(_._1 < 4).flatMap { case (q, qe) =>
          vecs.filter(_._1 != q)
            .map { case (c, ce) =>
              (c, qv(qe).zip(qv(ce)).map { case (a, b) => a * b }.sum) }
            .sortBy { case (c, d) => (-d, c) }
            .take(5).zipWithIndex
            .map { case ((c, d), i) => (q, c, d, (i + 1).toLong) }
        }.toSet
        def got(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got(IvfAnn.knnExact(spark, tmp, col("vec_id") < 4,
          topK = 5, k = 6)) === expected, s"IVF seed $seed")
        assert(got(IvfPq.knnExact(spark, tmp, col("vec_id") < 4,
          topK = 5, coarseK = 6, m = 8, pqK = 8)) === expected, s"PQ seed $seed")
      } finally {
        val p = java.nio.file.Paths.get(tmp)
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
      }
    }
  }

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
