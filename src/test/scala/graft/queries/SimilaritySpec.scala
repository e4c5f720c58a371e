package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.AnnLsh

/** Recall/containment contracts between the approximate (LSH) operators
  * and their exact baselines — the checks the DuckDB oracle can't do. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.001"

  test("minhash-lsh near-dup pairs ⊆ ground-truth jaccard pairs, recall ≥ 0.6") {
    val lsh = Similarity.defs("m01_minhash_lsh_neardup").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Similarity.defs("m02_ngram_jaccard_pairs").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain near-dup pairs")
    assert(lsh.subsetOf(truth),
      s"LSH-verified pairs must be true pairs; extras: ${lsh -- truth}")
    val recall = lsh.size.toDouble / truth.size
    assert(recall >= 0.6, s"LSH recall $recall (${lsh.size}/${truth.size})")
  }

  test("m03 containment finds a subset-dup that symmetric jaccard misses") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_m03").toString
    // doc 2 = doc 1's text embedded whole in a 10x larger document:
    // every shingle of 1 appears in 2 (containment 1000‰) but the
    // union is dominated by 2's extra shingles (jaccard ~100‰)
    val small = (1 to 12).map(i => s"w$i").mkString(" ")
    val big = small + " " + (13 to 120).map(i => s"w$i").mkString(" ")
    val other = (200 to 260).map(i => s"z$i").mkString(" ")
    try {
      Seq((1L, small, "en", "s"), (2L, big, "en", "s"), (3L, other, "en", "s"))
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val cont = Similarity.defs("m03_containment_pairs").build(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(5), r.getLong(6)))).toMap
      assert(cont.keySet === Set((1L, 2L)))
      assert(cont((1L, 2L))._1 === 1000L, "A fully contained in B")
      assert(cont((1L, 2L))._2 < 900L)
      val jacc = Similarity.defs("m02_ngram_jaccard_pairs").build(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!jacc.contains((1L, 2L)),
        "the containment pair must be invisible to symmetric jaccard")
      QueryDef.drainCleanups()
    } finally {
      val p = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
    }
  }

  test("LSH ANN top-10 recall ≥ 0.5 vs brute force") {
    val ann = AnnLsh.knn(spark, dir, col("vec_id") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.defs("e01_knn_dot").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.size === 80, "8 probes × top-10")
    val recall = (ann intersect bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"ANN recall $recall (|ann|=${ann.size})")
  }

  test("ANN scores agree with brute force on shared pairs") {
    val ann = AnnLsh.knn(spark, dir, col("vec_id") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bf = Similarity.defs("e01_knn_dot").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val shared = ann.keySet intersect bf.keySet
    assert(shared.nonEmpty)
    shared.foreach { k => assert(ann(k) === bf(k), s"dot mismatch at $k") }
  }

  test("e08 hard negatives: full top-5 per probe, never a same-label candidate") {
    val out = Similarity.defs("e08_hard_negatives").build(spark, dir).collect()
    assert(out.length === 40, "8 probes × top-5")
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("label").longValue).toMap
    out.foreach { r =>
      val (q, c) = (r.getLong(0), r.getLong(1))
      assert(labels(q) !== labels(c), s"same-label candidate $c for probe $q")
    }
    // scoring is e01's: any (probe, cand) pair present in both rankings
    // carries the identical exact-integer dot
    val bf = Similarity.defs("e01_knn_dot").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1)))
        .foreach(d => assert(d === r.getLong(2)))
    }
  }

  test("e10 knn-classify: majority label of the exact top-10, deterministic ties") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576d).toLong).toArray,
        r.getAs[Number]("label").longValue))
    def predict(q: (Long, Array[Long], Long)): (Long, Long) = {
      val top = emb.filter(_._1 != q._1)
        .map(c => (c._3, c._1,
          c._2.zip(q._2).map { case (a, b) => a * b }.sum))
        .sortBy { case (_, id, d) => (-d, id) }.take(10)
      val votes = top.groupBy(_._1).view.mapValues(_.size).toSeq
        .sortBy { case (l, v) => (-v, l) }
      (votes.head._1, votes.head._2.toLong)
    }
    val out = Similarity.defs("e10_knn_classify").build(spark, dir).collect()
    assert(out.length === 32, "one verdict per probe")
    out.foreach { r =>
      val q = emb.find(_._1 == r.getLong(0)).get
      val (pl, v) = predict(q)
      assert(r.getLong(1) === q._3, s"true_label of probe ${q._1}")
      assert(r.getLong(2) === pl, s"pred_label of probe ${q._1}")
      assert(r.getLong(3) === v, s"votes of probe ${q._1}")
      assert(r.getLong(4) === (if (pl == q._3) 1L else 0L))
    }
  }

  test("e11 int8 knn equals a re-derived int8 brute force; codes bounded") {
    // mirror of the query's quantization: maxabs / ·127 / division are
    // single correctly-rounded IEEE double ops, rounding is HALF_UP on
    // the exact binary expansion (Spark Round semantics)
    val codes = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val xs = r.getSeq[Float](1).map(_.toDouble).toArray
        val m = xs.map(math.abs).max
        r.getLong(0) -> (if (m == 0d) xs.map(_ => 0L)
          else xs.map(x => new java.math.BigDecimal(x * 127d / m)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact))
      }
    codes.foreach { case (id, cs) =>
      assert(cs.forall(c => c >= -127L && c <= 127L), s"codes of $id in int8 range")
    }
    val expected = codes.filter(_._1 < 8).flatMap { case (q, pc) =>
      codes.filter(_._1 != q)
        .map { case (c, cc) =>
          (q, c, pc.zip(cc).map { case (a, b) => a * b }.sum) }
        .sortBy { case (_, id, d) => (-d, id) }.take(10)
        .zipWithIndex.map { case ((_, c, d), i) => (q, c, d, i + 1L) }
    }.toSet
    val got = Similarity.defs("e11_int8_knn").build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("m07 cross-corpus screen: only train×eval pairs, matches ⊆ m01's near-dups") {
    val rows = Similarity.defs("m07_cross_corpus_neardup").build(spark, dir)
      .collect()
    assert(rows.nonEmpty, "the parity stand-in should surface contamination")
    // the join is RESTRICTED to train×eval: every reported eval doc is
    // odd, every best match even — a within-corpus pair leaking in
    // would violate one of these
    rows.foreach { r =>
      assert(r.getLong(0) % 2 === 1L, s"even eval_id: $r")
      assert(r.getLong(2) % 2 === 0L, s"odd train_id: $r")
      assert(r.getLong(3) >= 500L && r.getLong(1) >= 1L, r.toString)
    }
    // every (eval, best-train) pair is one of m01's within-corpus
    // near-dup pairs (same scheme, same threshold — m07 is m01's
    // band join restricted to the cross-corpus quadrant)
    val m01Pairs = Similarity.defs("m01_minhash_lsh_neardup")
      .build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (e, t) = (r.getLong(0), r.getLong(2))
      val key = if (t < e) (t, e) else (e, t)
      assert(m01Pairs.contains(key), s"pair $key not in m01's near-dups")
    }
    graft.queries.QueryDef.drainCleanups()
  }
}
