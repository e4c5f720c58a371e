package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** operators.Mmr — the greedy MMR kernel under e18_mmr_rerank and
  * IvfIndex.searchDiverse. The fixture trajectory is hand-computed so
  * a regression in the fold (scores, exclusion, tie-breaks, the
  * empty-selection first step) fails against arithmetic done on paper,
  * not against the kernel's own output. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  /** One query, four 2-dim candidates. Relevance: A=100 B=95 C=90
    * D=85. qv: A=[10,0], B=[9,1], C=[0,10], D=[1,9] — B near A, D
    * near C. λ=7/10 trajectory, on paper:
    *   step1 A (relevance argmax);
    *   step2: B 7·95−3·sim(B,A)=665−3·90=395, C 630−0=630,
    *          D 595−3·10=565 → C;
    *   step3: B 665−3·max(90,10)=395, D 595−3·max(10,90)=325 → B;
    *   step4: D 595−3·max(10,90,18)=325.
    * MMR flips B and C relative to plain top-k — the diversity term
    * is live in this fixture, not inert. */
  test("greedy trajectory matches the hand-computed MMR recurrence") {
    import spark.implicits._
    val cands = Seq(
      (1L, 10L, 100L, Seq(10L, 0L)),
      (1L, 11L, 95L, Seq(9L, 1L)),
      (1L, 12L, 90L, Seq(0L, 10L)),
      (1L, 13L, 85L, Seq(1L, 9L))
    ).toDF("query_id", "cand_id", "dot", "qv")
    val got = Mmr.rerank(cands, k = 4, lamNum = 7, lamDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 1L, 10L, 700L),
      (1L, 2L, 12L, 630L),
      (1L, 3L, 11L, 395L),
      (1L, 4L, 13L, 325L)))
  }

  test("score ties break to the smaller cand_id") {
    import spark.implicits._
    // two orthogonal equal-relevance candidates: identical step-2
    // scores, so the pick must be the smaller id
    val cands = Seq(
      (1L, 20L, 100L, Seq(10L, 0L, 0L)),
      (1L, 22L, 90L, Seq(0L, 10L, 0L)),
      (1L, 21L, 90L, Seq(0L, 0L, 10L))
    ).toDF("query_id", "cand_id", "dot", "qv")
    val got = Mmr.rerank(cands, k = 3, lamNum = 7, lamDen = 10)
      .collect().map(r => (r.getLong(2), r.getLong(1)))
    assert(got.toSeq === Seq((20L, 1L), (21L, 2L), (22L, 3L)))
  }

  test("a query with fewer candidates than k yields that many steps; queries stay independent") {
    import spark.implicits._
    val cands = Seq(
      (1L, 10L, 100L, Seq(10L, 0L)),
      (2L, 30L, 50L, Seq(5L, 5L)),
      (2L, 31L, 40L, Seq(5L, 4L))
    ).toDF("query_id", "cand_id", "dot", "qv")
    val got = Mmr.rerank(cands, k = 4, lamNum = 7, lamDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1L, 10L), (2L, 1L, 30L), (2L, 2L, 31L)))
  }

  test("duplicate candidate rows (crash-retry appends) don't punch holes in the selection") {
    import spark.implicits._
    val cands = Seq(
      (1L, 10L, 100L, Seq(10L, 0L)),
      (1L, 10L, 100L, Seq(10L, 0L)), // duplicate of the same candidate
      (1L, 11L, 90L, Seq(0L, 10L))
    ).toDF("query_id", "cand_id", "dot", "qv")
    // without the pool dedup, size(cands)=3 > size(sel)=2 at step 3
    // and the exhaustion guard admits a NULL pick into the output
    val got = Mmr.rerank(cands, k = 3, lamNum = 7, lamDen = 10).collect()
    assert(got.forall(r => !r.isNullAt(2)), "NULL hole in the selection")
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 10L), (2L, 11L)))
  }

  test("lambda=1 degenerates to plain relevance order") {
    import spark.implicits._
    val cands = Seq(
      (1L, 10L, 100L, Seq(10L, 0L)),
      (1L, 11L, 95L, Seq(9L, 1L)),
      (1L, 12L, 90L, Seq(0L, 10L))
    ).toDF("query_id", "cand_id", "dot", "qv")
    val got = Mmr.rerank(cands, k = 3, lamNum = 1, lamDen = 1)
      .collect().map(r => r.getLong(2))
    assert(got.toSeq === Seq(10L, 11L, 12L))
  }
}
