package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.GraftSession

/** Non-vacuous verification for the multi-band LSH cosine near-dup
  * operator. The driver's synthetic embeddings contain NO cos≥0.9 pairs
  * (max pairwise cosine ≈ 0.51 at every sf), so its oracle check passes
  * on 0==0; this spec seeds a fixture that DOES contain true near-dups
  * (perturbed copies, cos ≈ 0.999, plus one borderline cos ≈ 0.91 pair
  * that defeats single-band bucketing) and asserts containment + recall
  * against the exact all-pairs ground truth. */
class CosineNearDupSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  /** 40 random base vectors + a perturbed near-copy of the first 25
    * (±0.05 per component → cosine ≈ 0.999), plus one BORDERLINE pair
    * (200, 201): a heavier ±0.45 perturbation lands just above the 0.90
    * threshold, where sign bits flip often enough that a single band
    * usually splits the pair — the union-of-bands regression case.
    * Fixed seed: deterministic. */
  private lazy val fixture: DataFrame = {
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val bases = (0 until 40).map(i => (i.toLong, vec()))
    val dups = (0 until 25).map { i =>
      val d = bases(i)._2.map(x => x + 0.05f * (rnd.nextFloat() * 2f - 1f))
      ((100 + i).toLong, d)
    }
    val borderBase = vec()
    val border = Seq(
      (200L, borderBase),
      (201L, borderBase.map(x => x + 0.45f * (rnd.nextFloat() * 2f - 1f))))
    import spark.implicits._
    (bases ++ dups ++ border).toDF("vec_id", "embedding")
  }

  private def pairSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded pairs ⊆ exact all-pairs truth, full recall, truth non-empty") {
    val got = pairSet(CosineNearDup.pairs(fixture))
    val truth = pairSet(CosineNearDup.bruteForce(fixture))
    assert(truth.size >= 20, s"seeded fixture must contain near-dup pairs, got ${truth.size}")
    assert(got.subsetOf(truth),
      s"verified pairs must be true cos≥0.9 pairs; extras: ${got -- truth}")
    // 16 bands × 10 bits: miss probability < 1e-14 at the fixture's
    // cos ≈ 0.999 dups and ~2% at the 0.90 edge — on the fixed seed the
    // union recovers the whole relation
    assert(got === truth, s"missed: ${truth -- got}")
  }

  test("union catches a borderline pair that a single band splits") {
    val truth = pairSet(CosineNearDup.bruteForce(fixture))
    assert(truth.contains((200L, 201L)),
      "borderline fixture pair must be a true cos>=0.9 pair; retune the perturbation")
    val singleBand = pairSet(CosineNearDup.pairs(fixture, tables = 1))
    assert(!singleBand.contains((200L, 201L)),
      "borderline pair should defeat a single 10-bit band; reseed if this fails")
    assert(pairSet(CosineNearDup.pairs(fixture)).contains((200L, 201L)))
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

  test("e04b oracle-mode dial recovers the full cos>=0.40 relation on driver data") {
    // The data-calibrated query entry (TextMedia e04b): threshold 0.40,
    // tables=64 x bits=3 — miss probability ~9e-9 per threshold-edge
    // pair, and the seeded hyperplanes make it deterministic. Pin full
    // parity with the all-pairs definition on the real sf0.001 corpus,
    // where the relation is non-empty (66 pairs) — the non-vacuous
    // counterpart of the driver's sf0.01 oracle row.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = pairSet(CosineNearDup.pairs(emb, pct = 40, tables = 64, bits = 3))
    val truth = pairSet(CosineNearDup.bruteForce(emb, pct = 40))
    assert(truth.nonEmpty, "calibrated threshold must yield real pairs")
    assert(got === truth, s"missed: ${truth -- got}; extras: ${got -- truth}")
  }

  test("crossPairs: exactly the cross-quadrant slice of the full relation") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // the fixture's (base, dup) pairs are (i, 100+i) — same parity, so
    // split train/eval by id range instead: bases+border vs dups
    val train = fixture.filter(col("vec_id") < 100 || col("vec_id") >= 200)
    val eval = fixture.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    val got = pairSet(CosineNearDup.crossPairs(train, eval))
    // truth = the all-pairs relation restricted to one id per side
    val truth = pairSet(CosineNearDup.bruteForce(fixture))
      .filter { case (a, b) => (a < 100 || a >= 200) && (b >= 100 && b < 200) }
    assert(truth.nonEmpty, "the seeded dups must cross the split")
    assert(got === truth, s"missed: ${truth -- got}; extras: ${got -- truth}")
    // and the within-corpus borderline pair (200, 201) must NOT appear
    assert(!got.exists { case (a, b) => a >= 200 && b >= 200 })
    // calibrated driver-data parity (e24's dials), cross-parity split
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val gotCal = pairSet(CosineNearDup.crossPairs(
      emb.filter(pmod(col("vec_id"), lit(2)) === 0),
      emb.filter(pmod(col("vec_id"), lit(2)) === 1),
      pct = 40, tables = 64, bits = 3))
    val truthCal = pairSet(CosineNearDup.bruteForce(emb, pct = 40))
      .flatMap { case (a, b) =>
        // bruteForce emits a<b; orient to (even, odd) and drop same-parity
        if (a % 2 == 0 && b % 2 == 1) Some((a, b))
        else if (a % 2 == 1 && b % 2 == 0) Some((b, a))
        else None
      }
    assert(truthCal.nonEmpty && gotCal === truthCal,
      s"missed: ${truthCal -- gotCal}; extras: ${gotCal -- truthCal}")
  }

  test("driver testdata really has no true pairs (documents the 0-row oracle)") {
    val truth = pairSet(CosineNearDup.bruteForce(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")))
    assert(truth.isEmpty)
  }

  test("semanticDedup: within-label dup drops the higher id; cross-label twin survives") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val v0 = vec(); val v1 = vec(); val v2 = vec()
    val rows = Seq(
      // label 0: 10 and 11 are near-identical -> 11 dropped, 10 kept
      (10L, v0, 0), (11L, v0.map(x => x + 0.01f), 0),
      // labels 1 vs 2: 20 and 30 are near-identical but in DIFFERENT
      // clusters -> both kept (SemDeDup only dedups within a cluster)
      (20L, v1, 1), (30L, v1.map(x => x + 0.01f), 2),
      // label 3: an unrelated singleton
      (40L, v2, 3))
    val out = CosineNearDup.semanticDedup(
      rows.toDF("vec_id", "embedding", "label"), pct = 90)
    val keep = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(keep === Map(10L -> 1L, 11L -> 0L, 20L -> 1L, 30L -> 1L, 40L -> 1L))
  }

  test("semanticDedup composes with IvfAnn.assign as the clustering step") {
    // the full SemDeDup recipe: k-means (IvfAnn) -> within-cluster
    // cosine dedup. Near-identical vectors share a nearest centroid, so
    // planted dups co-cluster and the higher id of each pair drops.
    val labeled = IvfAnn.assign(fixture, IvfAnn.trainCentroids(fixture, k = 4))
    val out = CosineNearDup.semanticDedup(labeled, pct = 90)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val labels = labeled.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val planted = (0 until 25).map(i => (i.toLong, (100 + i).toLong))
    val coClustered = planted.filter { case (a, b) => labels(a) == labels(b) }
    assert(coClustered.size >= planted.size / 2,
      s"expected most planted dup pairs to co-cluster, got ${coClustered.size}/25")
    coClustered.foreach { case (a, b) =>
      assert(out(b) === 0L, s"dup $b of $a should drop in cluster ${labels(a)}")
    }
    // a dup (higher id) can never condemn its base, and random bases
    // are nowhere near cos 0.9 of each other -> every base keeps
    planted.foreach { case (a, _) => assert(out(a) === 1L, s"base $a dropped") }
  }

  test("semanticDedup under a dominant cluster: verdicts exact, join skew-splittable") {
    // The Scaladoc's hot-cluster case: 90% of the corpus lands in ONE
    // k-means label. Two assertions: (a) verdicts still equal the
    // definition (driver-side within-label brute force over the
    // fixture); (b) with broadcast disabled — the 100 TB regime, where
    // neither side fits an executor — the label self-join plans as a
    // shuffle join, the shape AQE's skew-join splitting applies to
    // (GraftSession ships adaptive.enabled; skewJoin.enabled is its
    // default-on companion), so the dominant label splits into bounded
    // tasks instead of pinning one reducer.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val hotBases = (0 until 90).map(i => (i.toLong, vec(), 0))
    val hotDups = (0 until 15).map { i =>
      ((100 + i).toLong, hotBases(i)._2.map(x => x + 0.01f), 0)
    }
    val cold = (0 until 10).map(i => ((200 + i).toLong, vec(), 1 + i % 3))
    val rows = hotBases ++ hotDups ++ cold
    assert(rows.count(_._3 == 0) * 10 >= rows.size * 9) // ≥90% in label 0

    // driver-side definition: dropped iff a smaller-id same-label vector
    // has exact-integer cos ≥ 0.9 (the operator's own algebra)
    def qv(e: Array[Float]) = e.map(x => math.floor(x.toDouble * 1048576d).toLong)
    def cosGe(a: Array[Float], b: Array[Float], pct: Int): Boolean = {
      val (qa, qb) = (qv(a), qv(b))
      val dot = qa.zip(qb).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val na = qa.map(x => BigInt(x) * x).sum
      val nb = qb.map(x => BigInt(x) * x).sum
      dot > 0 && dot * dot * 10000 >= na * nb * pct * pct
    }
    val expected = rows.map { case (id, e, l) =>
      id -> (if (rows.exists { case (id2, e2, l2) =>
        l2 == l && id2 < id && cosGe(e2, e, 90) }) 0L else 1L)
    }.toMap

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = CosineNearDup.semanticDedup(
        rows.toSeq.toDF("vec_id", "embedding", "label"), pct = 90)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"label self-join must be a skew-splittable shuffle join:\n$plan")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean)
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expected)
      assert(got.values.count(_ == 0L) >= 15) // the planted hot-label dups all drop
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("semanticDedup: greedy rule condemns every non-minimal member of a dup chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    // three near-identical vectors in one label: only the min id survives
    val rows = Seq((5L, base, 0),
      (6L, base.map(x => x + 0.005f), 0),
      (7L, base.map(x => x - 0.005f), 0))
    val out = CosineNearDup.semanticDedup(
      rows.toDF("vec_id", "embedding", "label"), pct = 90)
    val keep = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(keep === Map(5L -> 1L, 6L -> 0L, 7L -> 0L))
  }
}
