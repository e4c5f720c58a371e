package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest neighbor: the memory-bound scale path.
  *
  * IVF alone (IvfAnn) still joins real vectors back for every candidate
  * — at 100 TB the candidate join-back moves dim×8 bytes per pair.
  * Product quantization compresses each corpus vector to M one-byte
  * codes (dim 64 → 8 bytes, 64× smaller): split the vector into M
  * subvectors, per subspace train a K-codeword codebook (the same
  * seedless md5-init + exact-average Lloyd as the coarse quantizer, so
  * training is deterministic), store each subvector as its nearest
  * codeword index.
  *
  * Search is asymmetric distance computation (ADC): each probe
  * precomputes its dot product against all M×K codewords ONCE (an M×K
  * table, data-dependent so it travels as an array column, not a
  * literal), then scoring a candidate is M table lookups — codegen'd
  * `element_at` over the codes array, no vector arithmetic per pair.
  * The ADC shortlist then re-ranks by exact quantized dot (e01's
  * scoring) over real vectors, so only shortlistFactor·k vectors per
  * probe are ever touched.
  *
  * Pipeline shape: candidates meet through IVF inverted lists (ids
  * only), ADC scores flow through a codes join (M bytes per candidate),
  * exact re-rank joins vectors once per surviving candidate. Nothing
  * all-pairs, nothing driver-side except the k×dim + M×K×(dim/M)
  * codebooks.
  */
object IvfPq {

  /** Per-subspace codebooks: books(m)(k) = codeword vector (dim/M). */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
      books: Seq[Seq[Array[Double]]])

  /** Train M independent K-codeword codebooks by running the coarse
    * quantizer's deterministic Lloyd on each subvector slice. */
  def trainCodebooks(emb: DataFrame, m: Int = 8, k: Int = 16,
      iters: Int = 2, sampleFraction: Double = 1.0): Codebooks = {
    val dim = emb.selectExpr("size(embedding)").head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val subDim = dim / m
    val books = (0 until m).map { mi =>
      val sub = emb.select(col("vec_id"),
        expr(s"slice(cast(embedding as array<double>), ${mi * subDim + 1}, $subDim)")
          .as("embedding"))
      // codewords are a free choice like coarse centroids: ADC bounds
      // reason from each vector's OWN reconstruction error (rerr is
      // per-vector, full-corpus), so sampled codebook training keeps
      // knnExact provably exact — only shortlist width suffers
      IvfAnn.trainCentroids(sub, k, iters, sampleFraction)
    }
    Codebooks(m, k, subDim, books)
  }

  /** PQ codes column: array<int> of M nearest-codeword indices. Ties
    * break on the lower index (struct sort), so encoding is
    * deterministic. */
  private[operators] def codesCol(cb: Codebooks): Column = {
    val perSub = (0 until cb.m).map { mi =>
      val sub = s"slice(cast(embedding as array<double>), ${mi * cb.subDim + 1}, ${cb.subDim})"
      val dists = cb.books(mi).zipWithIndex.map { case (cw, ki) =>
        val lits = cw.map(v => s"${v}D").mkString("array(", ", ", ")")
        s"struct(array_l2sq($sub, $lits) as d, $ki as i)"
      }.mkString("array(", ", ", ")")
      s"element_at(transform(array_sort($dists), x -> x.i), 1)"
    }
    expr(perSub.mkString("array(", ", ", ")"))
  }

  /** Probe-side ADC table: flat array of M×K dot products between the
    * probe's m-th subvector and codeword k (index m*K + k). */
  private[operators] def adcTableCol(cb: Codebooks): Column = {
    val entries = for {
      mi <- 0 until cb.m
      ki <- 0 until cb.k
    } yield {
      val sub = s"slice(cast(embedding as array<double>), ${mi * cb.subDim + 1}, ${cb.subDim})"
      val lits = cb.books(mi)(ki).map(v => s"${v}D").mkString("array(", ", ", ")")
      s"array_dot($sub, $lits)"
    }
    expr(entries.mkString("array(", ", ", ")"))
  }

  /** Approximate dot of a probe (ADC table) against a candidate (codes):
    * sum over subspaces of table[m*K + code[m]]. */
  private[operators] def adcScore(k: Int): Column =
    expr(s"aggregate(zip_with(codes, sequence(0, size(codes) - 1), " +
      s"(c, m) -> element_at(adc, m * $k + c + 1)), 0D, (a, v) -> a + v)")

  /** Per-vector PQ reconstruction error ‖c − q(c)‖ (sqrt of the summed
    * per-subspace min quantization distances) — computed once at encode
    * time, stored beside the codes. Cauchy-Schwarz turns it into a hard
    * ADC error bound: |dot(p,c) − dot(p,q(c))| ≤ ‖p‖·‖c−q(c)‖, which is
    * what lets [[knnExact]] shortlist with a guarantee instead of a
    * fixed factor. */
  private[operators] def reconErrCol(cb: Codebooks): Column = {
    val perSub = (0 until cb.m).map { mi =>
      val sub = s"slice(cast(embedding as array<double>), ${mi * cb.subDim + 1}, ${cb.subDim})"
      val dists = cb.books(mi).zipWithIndex.map { case (cw, ki) =>
        val lits = cw.map(v => s"${v}D").mkString("array(", ", ", ")")
        s"array_l2sq($sub, $lits)"
      }.mkString("array(", ", ", ")")
      s"array_min($dists)"
    }
    expr(s"sqrt(${perSub.mkString(" + ")})")
  }

  /** The PROOF-CARRYING ADC shortlist — ONE definition, shared by
    * [[knnExact]] and PqIndex.searchExact so the two "provably exact"
    * paths cannot drift: score every candidate by ADC, bound the true
    * dot in [approx − ‖p‖·rerr − eps, approx + ‖p‖·rerr + eps]
    * (Cauchy-Schwarz over the reconstruction error; eps absorbs double
    * round-off plus the double-vs-quantized-integer ranking
    * discrepancy, scaled by the magnitudes in play — see
    * IvfAnn.PruneEps; slack only widens the shortlist, never loses a
    * true neighbor), and keep every candidate whose UPPER bound meets
    * the topK-th largest LOWER bound of its probe. Probes with < topK
    * candidates keep everything (null threshold).
    *
    * @param pairsWithCodes (query_id, cand_id, codes, rerr) candidate rows
    * @param probeTables    (query_id, adc, pnorm) — bounded, broadcast
    * @return (query_id, cand_id) rows provably containing every true
    *         top-k member */
  private[operators] def boundedShortlist(pairsWithCodes: DataFrame,
      probeTables: DataFrame, pqK: Int, maxNorm: Double,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eps = lit(IvfAnn.PruneEps) *
      (lit(1.0) + col("pnorm") + lit(maxNorm))
    val w = Window.partitionBy("query_id")
    val bounded = pairsWithCodes
      .join(broadcast(probeTables), "query_id")
      .select(col("query_id"), col("cand_id"),
        adcScore(pqK).as("approx"), (col("pnorm") * col("rerr")).as("berr"),
        eps.as("eps"))
      .select(col("query_id"), col("cand_id"),
        (col("approx") - col("berr") - col("eps")).as("lo"),
        (col("approx") + col("berr") + col("eps")).as("hi"))
    bounded.withColumn("lrk",
        row_number().over(w.orderBy(col("lo").desc, col("cand_id"))))
      .withColumn("thr", max(when(col("lrk") === topK, col("lo"))).over(w))
      .filter(col("thr").isNull || col("hi") >= col("thr"))
      .select("query_id", "cand_id")
  }

  /** EXACT top-k: adaptive-pruned IVF candidates (IvfAnn.exactCandidatePairs,
    * provably a superset of the true top-k) + PQ-ADC scoring with the
    * Cauchy-Schwarz error bound above. A candidate is dropped only when
    * its ADC upper bound (approx + ‖p‖·err) falls below the topK-th
    * largest lower bound (approx − ‖p‖·err) of its probe — so the exact
    * re-rank provably sees every true top-k member and the output equals
    * the e01 brute force, while still moving only M-byte codes per
    * candidate through the scoring join. [[knn]] keeps the fixed
    * shortlistFactor dial for corpora where the guarantee isn't needed. */
  def knnExact(spark: SparkSession, dir: String, probePred: Column,
      topK: Int = 10, coarseK: Int = 16, m: Int = 8, pqK: Int = 16,
      iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.ArrayMath.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = trainCodebooks(emb, m, pqK, iters)
    val cents = IvfAnn.trainCentroids(emb, coarseK, iters)
    // one shared assignment pass feeds stats AND the inverted-list
    // side of the candidate join (r21 — IvfIndex.write's fusion)
    val (stats, corpus) = IvfAnn.clusterStatsAndCorpus(emb, cents)
    val pairs = IvfAnn.exactCandidatePairs(emb, cents, stats, probePred, topK,
      Some(corpus))

    val codes = emb.select(col("vec_id").as("cand_id"), codesCol(cb).as("codes"),
      reconErrCol(cb).as("rerr"))
    val probeTables = emb.filter(probePred)
      .select(col("vec_id").as("query_id"), adcTableCol(cb).as("adc"),
        expr("sqrt(array_dot(cast(embedding as array<double>), cast(embedding as array<double>)))")
          .as("pnorm"))
    val shortlist = boundedShortlist(pairs.join(codes, "cand_id"),
      probeTables, cb.k, stats.maxNorm, topK)
    val w = Window.partitionBy("query_id")
    val qvs = emb.select(col("vec_id"), expr(IvfAnn.quant).as("qv"))
    val rer = shortlist
      .join(qvs.select(col("vec_id").as("query_id"), col("qv").as("pq")), "query_id")
      .join(qvs.select(col("vec_id").as("cand_id"), col("qv")), "cand_id")
      .select(col("query_id"), col("cand_id"), IvfAnn.qdot("pq", "qv").as("dot"))
    rer.withColumn("rnk", row_number().over(
        w.orderBy(col("dot").desc, col("cand_id"))).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }

  /** Top-k approximate neighbors via IVF lists + PQ-ADC scoring + exact
    * re-rank of the ADC top-(shortlistFactor·k). The shortlist factor is
    * the recall/IO dial: candidates are cheap to ADC-score (table
    * lookups), so over-shortlisting costs only re-rank join width. */
  def knn(spark: SparkSession, dir: String, probePred: Column, topK: Int = 10,
      coarseK: Int = 16, nprobe: Int = 4, m: Int = 8, pqK: Int = 16,
      iters: Int = 2, shortlistFactor: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.ArrayMath.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = trainCodebooks(emb, m, pqK, iters)

    // coarse IVF lists (ids only) — same candidate generation as e05
    val cents = IvfAnn.trainCentroids(emb, coarseK, iters)
    val corpus = IvfAnn.assign(emb, cents)
      .select(col("vec_id"), col("label").cast("int").as("cluster"))
    val probeClusters = IvfAnn
      .probeClustersNearest(emb.filter(probePred), cents, nprobe)
      .select(col("vec_id").as("query_id"), col("cluster"))
    val pairs = probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"))
      .distinct()

    // ADC scoring: probes carry their M×K table, candidates their M codes
    val codes = emb.select(col("vec_id").as("cand_id"), codesCol(cb).as("codes"))
    val probeTables = emb.filter(probePred)
      .select(col("vec_id").as("query_id"), adcTableCol(cb).as("adc"))
    val w = Window.partitionBy("query_id")
    val shortlist = pairs
      .join(codes, "cand_id")
      .join(broadcast(probeTables), "query_id") // probe set is bounded
      .select(col("query_id"), col("cand_id"), adcScore(cb.k).as("approx"))
      .withColumn("ark", row_number().over(
        w.orderBy(col("approx").desc, col("cand_id"))))
      .filter(col("ark") <= shortlistFactor * topK)
      .select("query_id", "cand_id")

    // exact re-rank (e01 scoring) over only the shortlist's vectors
    val qvs = emb.select(col("vec_id"), expr(IvfAnn.quant).as("qv"))
    val rer = shortlist
      .join(qvs.select(col("vec_id").as("query_id"), col("qv").as("pq")), "query_id")
      .join(qvs.select(col("vec_id").as("cand_id"), col("qv")), "cand_id")
      .select(col("query_id"), col("cand_id"), IvfAnn.qdot("pq", "qv").as("dot"))
    rer.withColumn("rnk", row_number().over(
        w.orderBy(col("dot").desc, col("cand_id"))).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }
}
