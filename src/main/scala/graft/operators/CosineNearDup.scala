package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate pairs via a multi-band hyperplane-
  * sign LSH union.
  *
  * Candidate generation: each vector gets `tables` independent bucket
  * ids, one per band of `bits` seeded Gaussian hyperplane signs (the
  * AnnLsh machinery — hyperplanes enter the plan as codegen'd array
  * literals). Candidates are the UNION of within-band collisions,
  * deduped to one row per distinct pair before verification. Missing a
  * true cos≥0.9 pair requires ALL `tables` bands to split it: a pair at
  * angle θ flips one sign bit with probability θ/π, so a band agrees
  * with probability (1−θ/π)^bits and the miss rate is
  * (1−(1−θ/π)^bits)^tables — at the defaults (16 bands × 10 bits) that
  * is < 1e-14 for cos 0.999 (the fixture dups) and ≈ 2% even at the 0.90
  * threshold edge. Verification is exact integer arithmetic on
  * ×2^20-quantized components — power-of-two scaling is exact in double,
  * so both engines and the spec's brute force agree bit-for-bit:
  *   cos ≥ pct/100  ⇔  dot > 0 ∧ 10000·dot² ≥ pct²·|a|²·|b|²
  * squared in DECIMAL so nothing overflows (|x|≤1 ⇒ dot ≤ 64·2^40 <
  * 10^14 ⇒ dot² < 10^28 ⇒ ·10^4 < 10^32, within DECIMAL(38)).
  *
  * 100 TB shape: the band join moves (id, band, bucket) rows only —
  * ~20 bytes — and vectors join back once per DISTINCT surviving pair.
  * Expected occupancy of one band's bucket is n/2^bits on near-random
  * data, so within-band candidate volume is ~tables·n²/2^(bits+1):
  * unlike the former fixed 256-bucket sign pattern, `bits` is a free
  * dial (hyperplanes are generated per bits), so bucket count is kept
  * proportional to n — bits ≈ log2(n/B) holds expected bucket size at a
  * constant B as the corpus grows, with `tables` restoring recall.
  * A pile of exact duplicates still lands in one bucket (necessarily —
  * they must be compared), which is AQE's skew-join case on ids-only
  * rows.
  *
  * Note on test data: the driver's synthetic embeddings are near-random
  * (max pairwise cosine ≈ 0.51 at every sf), so this operator correctly
  * returns 0 rows there; the DuckDB oracle is the NAIVE ALL-PAIRS cosine
  * (proving the bucketed plan loses nothing vs the relation), and
  * CosineNearDupSpec drives a seeded fixture with true near-dup pairs
  * for a non-vacuous recall/containment check — including a pair every
  * single band splits that only the union catches.
  */
object CosineNearDup {

  private val quant =
    "transform(embedding, x -> cast(floor(cast(x as double) * 1048576D) as bigint))"
  private def qdot: org.apache.spark.sql.Column =
    graft.functions.ArrayMath.dot(col("qa"), col("qb"))

  /** Quantized vectors + squared norm. */
  private def prepared(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), expr(quant).as("qv"))
      .withColumn("norm2",
        graft.functions.ArrayMath.dot(col("qv"), col("qv")))

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
        graft.functions.OptimizerBarrier.fence(qdot).as("dot"),
        col("na"), col("nb"))
      .filter(col("dot") > 0 &&
        expr(s"cast(dot as decimal(14,0)) * cast(dot as decimal(14,0)) * 10000") >=
        expr(s"cast(na as decimal(14,0)) * cast(nb as decimal(14,0)) * ${pct * pct}"))
      .select(col("vec_a"), col("vec_b"), col("dot"), col("na"), col("nb"))
      .orderBy("vec_a", "vec_b")

  /** Multi-band LSH near-dup pairs with cosine ≥ pct/100 over a frame of
    * (vec_id, embedding): union of within-band collisions (ids only),
    * one exact-integer verify per distinct pair. */
  def pairs(emb: DataFrame, pct: Int = 90, tables: Int = 16, bits: Int = 10,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val banded = AnnLsh.withBuckets(emb, tables, bits, dim, seed)
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("band", "bucket")))
    val cand = banded
      .select(col("vec_id").as("vec_a"), col("band"), col("bucket"))
      .join(banded.select(col("vec_id").as("vec_b"),
          col("band").as("band2"), col("bucket").as("bucket2")),
        col("band") === col("band2") && col("bucket") === col("bucket2") &&
          col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    val e = prepared(emb)
    verified(
      cand
        .join(e.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
          col("norm2").as("na")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
          col("norm2").as("nb")), "vec_b"),
      pct)
  }

  /** Cross-corpus variant of [[pairs]]: near-dup pairs with one side in
    * `aEmb` (e.g. the train corpus) and the other in `bEmb` (e.g. an
    * eval benchmark) — the semantic level of the contamination-screen
    * family (exact n-grams → c03/c18, fuzzy text → m07, embeddings →
    * here). The band join is RESTRICTED to a×b, so within-corpus
    * pairs never form and candidate volume is cross-corpus collisions
    * only; benchmark-sized b sides broadcast. No id inequality — the
    * two corpora are distinct tables, so equal ids are distinct
    * documents and a legitimate pair. Same seeded hyperplanes and
    * exact-integer verify as [[pairs]]: a pair in the output satisfies
    * the cosine threshold bit-for-bit on any engine. */
  def crossPairs(aEmb: DataFrame, bEmb: DataFrame, pct: Int = 90,
      tables: Int = 16, bits: Int = 10, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    def banded(e: DataFrame, as: String, b: String, bk: String) =
      AnnLsh.withBuckets(e, tables, bits, dim, seed)
        .select(col("vec_id").as(as),
          posexplode(col("buckets")).as(Seq(b, bk)))
    val cand = banded(aEmb, "vec_a", "band", "bucket")
      .join(banded(bEmb, "vec_b", "band2", "bucket2"),
        col("band") === col("band2") && col("bucket") === col("bucket2"))
      .select("vec_a", "vec_b")
      .distinct()
    val ea = prepared(aEmb)
    val eb = prepared(bEmb)
    verified(
      cand
        .join(ea.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
          col("norm2").as("na")), "vec_a")
        .join(eb.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
          col("norm2").as("nb")), "vec_b"),
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
      .withColumn("norm2",
        graft.functions.ArrayMath.dot(col("qv"), col("qv")))
    val a = e.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
      col("norm2").as("na"), col("label"))
    val b = e.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
      col("norm2").as("nb"), col("label").as("label2"))
    val dropped = a
      .join(b, col("label") === col("label2") && col("vec_a") < col("vec_b"))
      // fenced for the same single-evaluation reason as [[verified]]
      .select(col("vec_b"),
        graft.functions.OptimizerBarrier.fence(qdot).as("dot"),
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
    val e = prepared(emb)
    val a = e.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
      col("norm2").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
      col("norm2").as("nb"))
    verified(a.crossJoin(b).filter(col("vec_a") < col("vec_b")), pct)
  }
}
