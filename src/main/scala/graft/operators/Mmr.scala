package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998) —
  * the greedy diversity-aware selection rule: from a per-query
  * candidate pool, repeatedly pick
  *
  *   argmax_c  λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * so the chosen k aren't k copies of the same neighborhood. Used by
  * diverse sampling in curation and by retrieval stages that feed
  * de-duplicated context windows.
  *
  * Determinism contract (the e18 oracle's): relevance and similarity
  * are the EXACT integer quantized dot products (IvfAnn.quant), λ is
  * the integer ratio lamNum/lamDen (score = lamNum·rel − (lamDen −
  * lamNum)·maxSim — same argmax as the λ∈[0,1] form, no float), ties
  * break to the smaller cand_id, and the first pick (empty selected
  * set, maxSim ≡ 0) is the plain relevance argmax. The greedy
  * trajectory is therefore engine-exact — `e18_mmr_rerank` pins it
  * against a relational unrolled-CTE derivation in DuckDB.
  *
  * 100 TB shape: the corpus pays only whatever produced the top-M pool
  * (a broadcast-probe scan or a pruned index search); the greedy
  * O(k·M·dim) inner loop runs per QUERY ROW as one chain of
  * higher-order-function projections over the collected candidate
  * array — embarrassingly parallel across queries, nothing wide after
  * the top-M. M and k are caller dials; the greedy loop is a RUNTIME
  * aggregate fold over sequence(2, k), so the expression tree stays
  * constant-size whatever k is (see the note inside rerank — a
  * plan-time unrolling is a Catalyst tree bomb).
  */
object Mmr {

  /** Greedy-select `k` of each query's candidates.
    *
    * @param cands (query_id, cand_id, dot, qv) rows — the per-query
    *              candidate pool, ALREADY bounded to top-M (this
    *              operator collects each query's pool into one array
    *              row; an unbounded pool would be a driver-scale bug
    *              in the caller, not here). `dot` is the exact integer
    *              relevance, `qv` the quantized vector
    *              (array<bigint>) used for pairwise similarity.
    * @return (query_id, step, cand_id, mmr_score) — one row per
    *         selection step in trajectory order; a query with fewer
    *         than k candidates yields that many steps.
    */
  def rerank(cands: DataFrame, k: Int, lamNum: Int, lamDen: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lamDen > 0 && lamNum >= 0 && lamNum <= lamDen,
      s"lambda must be a ratio in [0,1]: $lamNum/$lamDen")
    val rel = lamNum
    val div = lamDen - lamNum
    import org.apache.spark.sql.expressions.Window
    // rank-sort the collected array so cands[0] IS the relevance
    // argmax (ties to smaller cand_id) — step 1 needs no
    // empty-selection special case, and the array order is
    // deterministic whatever order collect_list saw the rows in.
    // Dedup (query, cand) FIRST: a duplicate candidate row (e.g. a
    // crashed-retry append in an un-compacted index fanning a join
    // out) would overcount size(cands), defeat the exhaustion guard
    // below, and append the inner aggregate's NULL init as a hole in
    // the selection. Duplicates of a real candidate carry the same
    // (dot, qv), so which row survives is immaterial; the pool is
    // top-M-bounded, so the dedup is cheap
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("cand_id"))
    val grouped = cands
      .dropDuplicates("query_id", "cand_id")
      .withColumn("mmr_rnk", row_number().over(w))
      .groupBy("query_id")
      .agg(expr("array_sort(collect_list(struct(mmr_rnk, cand_id, dot, qv)))")
        .as("ranked"))
      .withColumn("cands", expr(
        "transform(ranked, c -> struct(c.cand_id AS cand_id, c.dot AS dot, c.qv AS qv))"))
      .drop("ranked")
    // The greedy loop is ONE runtime fold — aggregate over
    // sequence(2, k) — NOT k unrolled withColumn steps. Unrolling
    // looks equivalent but is a plan-compile bomb: each step
    // references the previous selection several times, so Catalyst's
    // project collapsing/traversals grow the tree ~3^k — measured
    // minutes of driver CPU at k=8 before any task ran. As a fold the
    // expression tree is constant-size and the iteration happens per
    // row at execution time, O(k·M·dim) integer ops.
    //
    // groupBy emits no row for a candidate-less query, so cands is
    // never empty and the step-1 seed (the relevance argmax, = the
    // rank-sorted array's head) is total. A pool exhausted before k
    // (size(sel) = size(cands)) keeps sel as-is — that query simply
    // yields fewer steps. The inner aggregate's NULL init never
    // survives: the guarded branch only runs with ≥1 remaining
    // candidate.
    val seed = s"""array(struct(
          cands[0].cand_id AS cand_id, CAST(1 AS BIGINT) AS step,
          $rel * cands[0].dot AS score, cands[0].qv AS qv))"""
    // sequence(2, k) needs k >= 2 (Spark's sequence runs BACKWARDS
    // when start > stop — it would not be empty for k = 1)
    val selExpr = if (k == 1) seed else s"""
      aggregate(
        sequence(2, $k),
        $seed,
        (sel, i) -> CASE WHEN size(sel) >= size(cands) THEN sel
          ELSE array_append(sel,
            aggregate(
              transform(
                filter(cands, c -> NOT exists(sel, s -> s.cand_id = c.cand_id)),
                c -> struct(c.cand_id AS cand_id, CAST(i AS BIGINT) AS step,
                  $rel * c.dot - $div * coalesce(array_max(transform(sel, s ->
                    aggregate(zip_with(c.qv, s.qv, (x, y) -> x * y),
                      CAST(0 AS BIGINT), (a, v) -> a + v))),
                    CAST(0 AS BIGINT)) AS score,
                  c.qv AS qv)),
              CAST(NULL AS struct<cand_id: bigint, step: bigint, score: bigint, qv: array<bigint>>),
              (best, c) -> CASE
                WHEN best IS NULL THEN c
                WHEN c.score > best.score
                  OR (c.score = best.score AND c.cand_id < best.cand_id) THEN c
                ELSE best END))
          END)"""
    grouped.withColumn("sel", expr(selExpr))
      .select(col("query_id"), explode(col("sel")).as("s"))
      .select(col("query_id"), col("s.step").as("step"),
        col("s.cand_id").as("cand_id"), col("s.score").as("mmr_score"))
      .orderBy("query_id", "step")
  }
}
