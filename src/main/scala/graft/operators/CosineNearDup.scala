package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate pairs, sign-bucketed.
  *
  * Candidate generation: vectors that share the 8-bit sign pattern of
  * their first 8 dimensions meet in a bucket (near-identical vectors
  * almost always do; a production variant unions several sign bands for
  * recall). Verification is exact integer arithmetic on ×2^20-quantized
  * components — power-of-two scaling is exact in double, so both engines
  * and the spec's brute force agree bit-for-bit:
  *   cos ≥ pct/100  ⇔  dot > 0 ∧ 10000·dot² ≥ pct²·|a|²·|b|²
  * squared in DECIMAL so nothing overflows (|x|≤1 ⇒ dot ≤ 64·2^40 <
  * 10^14 ⇒ dot² < 10^28 ⇒ ·10^4 < 10^32, within DECIMAL(38)).
  *
  * 100 TB shape: the join key is a single integer bucket and rows carry
  * (id, qv, norm2) only; no all-pairs product anywhere. The bucket count
  * (256) is small, so at real scale you'd widen to more sign bits or an
  * LSH band union — the shape (bucket equi-join + exact verify) stays.
  *
  * Note on test data: the driver's synthetic embeddings are near-random
  * (max pairwise cosine ≈ 0.51 at every sf), so this operator correctly
  * returns 0 rows there; the DuckDB oracle is the NAIVE ALL-PAIRS cosine
  * (proving the bucketed plan loses nothing vs the relation), and
  * CosineNearDupSpec drives a seeded fixture with true near-dup pairs
  * for a non-vacuous recall/containment check.
  */
object CosineNearDup {

  private val quant =
    "transform(embedding, x -> cast(floor(cast(x as double) * 1048576D) as bigint))"
  private val qdot =
    "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  /** Quantized vectors + squared norm (+ sign bucket when asked). */
  private def prepared(emb: DataFrame, withBucket: Boolean): DataFrame = {
    val base = emb
      .select(col("vec_id"), expr(quant).as("qv"))
      .withColumn("norm2", expr(
        "aggregate(transform(qv, x -> x * x), 0L, (acc, v) -> acc + v)"))
    if (withBucket) base.withColumn("bucket", expr(
      (1 to 8).map(i => s"(case when qv[${i - 1}] >= 0 then ${1 << i} else 0 end)")
        .mkString(" + ")))
    else base
  }

  /** Exact-integer cosine test above a candidate join. The dot fold is
    * FENCED (graft.functions.OptimizerBarrier, its sanctioned
    * Project-alias pattern): without the fence, PushDownPredicates
    * inlines the aliased fold into the join condition where it appears
    * three times (dot > 0, dot·dot), so every candidate pair pays the
    * 64-element fold 3× — fenced, the join stays a pure equi-join +
    * id inequality and the fold runs once in the projection above, in
    * the same codegen stage (no extra materialization). */
  private def verified(cand: DataFrame, pct: Int): DataFrame =
    cand
      .select(col("vec_a"), col("vec_b"),
        graft.functions.OptimizerBarrier.fence(expr(qdot)).as("dot"),
        col("na"), col("nb"))
      .filter(col("dot") > 0 &&
        expr(s"cast(dot as decimal(14,0)) * cast(dot as decimal(14,0)) * 10000") >=
        expr(s"cast(na as decimal(14,0)) * cast(nb as decimal(14,0)) * ${pct * pct}"))
      .select(col("vec_a"), col("vec_b"), col("dot"), col("na"), col("nb"))
      .orderBy("vec_a", "vec_b")

  /** Sign-bucketed near-dup pairs with cosine ≥ pct/100 over a frame of
    * (vec_id, embedding). */
  def pairs(emb: DataFrame, pct: Int = 90): DataFrame = {
    val e = prepared(emb, withBucket = true)
    val a = e.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
      col("norm2").as("na"), col("bucket"))
    val b = e.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
      col("norm2").as("nb"), col("bucket").as("bucket2"))
    verified(
      a.join(b, col("bucket") === col("bucket2") && col("vec_a") < col("vec_b")),
      pct)
  }

  /** SemDeDup-style semantic dedup: per-vector keep/drop verdicts where
    * candidates are confined to the vector's CLUSTER (the `label`
    * column — in production the k-means assignment the SemDeDup recipe
    * prescribes; [[graft.operators.IvfAnn.assign]] produces exactly
    * this, and CosineNearDupSpec pins the composition). A vector is
    * dropped iff some same-label vector with a SMALLER id has cosine ≥
    * pct/100 — the greedy keep-lowest-index rule, which is
    * order-independent and needs no iteration: each pair (a < b)
    * condemns b and never a, so verdicts are a single relational pass.
    *
    * Verification reuses the exact ×2^20-quantized integer cosine test
    * (same algebra as [[pairs]]), so both engines agree bit-for-bit.
    *
    * 100 TB shape: the candidate join is a label equi-join carrying
    * (id, qv, norm2) rows — within-cluster pairs only, never all-pairs;
    * cluster populations are bounded by the k-means k chosen at index
    * build (and a skewed hot cluster is AQE's skew-join case or a
    * salting candidate). The verdict join back to ids is doc-keyed and
    * broadcast-able when the dropped set is small.
    */
  def semanticDedup(emb: DataFrame, pct: Int = 40): DataFrame = {
    val e = emb.select(col("vec_id"), col("label").cast("long").as("label"),
      expr(quant).as("qv"))
      .withColumn("norm2", expr(
        "aggregate(transform(qv, x -> x * x), 0L, (acc, v) -> acc + v)"))
    val a = e.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
      col("norm2").as("na"), col("label"))
    val b = e.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
      col("norm2").as("nb"), col("label").as("label2"))
    val dropped = a
      .join(b, col("label") === col("label2") && col("vec_a") < col("vec_b"))
      // fenced for the same single-evaluation reason as [[verified]]
      .select(col("vec_b"),
        graft.functions.OptimizerBarrier.fence(expr(qdot)).as("dot"),
        col("na"), col("nb"))
      .filter(col("dot") > 0 &&
        expr("cast(dot as decimal(14,0)) * cast(dot as decimal(14,0)) * 10000") >=
        expr(s"cast(na as decimal(14,0)) * cast(nb as decimal(14,0)) * ${pct * pct}"))
      .select(col("vec_b").as("vec_id"))
      .distinct()
    e.select(col("vec_id"), col("label"))
      .join(dropped.withColumn("dropped", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        col("dropped").isNull.cast("long").as("keep"))
      .orderBy("vec_id")
  }

  /** Exact all-pairs ground truth (O(n²) — spec/fixture scale only). */
  def bruteForce(emb: DataFrame, pct: Int = 90): DataFrame = {
    val e = prepared(emb, withBucket = false)
    val a = e.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
      col("norm2").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
      col("norm2").as("nb"))
    verified(a.crossJoin(b).filter(col("vec_a") < col("vec_b")), pct)
  }
}
