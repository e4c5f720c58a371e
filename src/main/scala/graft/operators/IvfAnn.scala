package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the clustering
  * counterpart of the sign-LSH path (AnnLsh): train k coarse centroids,
  * assign every vector to its nearest centroid (the inverted lists),
  * then search only the `nprobe` lists closest to each probe.
  *
  * Scale design: the corpus shuffles once on cluster id (the inverted
  * index build — at 100 TB this is the partitioning you persist);
  * queries touch nprobe/k of the corpus. Candidate generation joins ids
  * only; vectors join back once per candidate pair for exact re-ranking
  * with the same quantized dot product as the e01 brute-force baseline.
  *
  * Determinism: centroid init picks the k vectors with the smallest
  * md5(vec_id) (a seedless, engine-independent shuffle), and Lloyd
  * iterations are exact averages — same result every run.
  */
object IvfAnn {

  /** THE e01 quantization contract, shared with IvfPq AND the query
    * surface (Similarity aliases it, MinHashIndex.shingleExpr's
    * pattern) — any drift here breaks the cross-operator recall
    * comparisons and the brute-force oracles in one stroke. */
  private[graft] val quant =
    "transform(embedding, x -> cast(floor(cast(x as double) * 1048576D) as bigint))"
  private[graft] def qdot(a: String, b: String): Column =
    graft.functions.ArrayMath.dot(col(a), col(b))

  /** Squared L2 distance from the embedding column to a centroid literal
    * (codegen-friendly; no UDF). */
  private def dist2(centroid: Array[Double]): Column = {
    val lits = array(centroid.map(lit(_)): _*)
    graft.functions.ArrayMath.l2sq(
      col("embedding").cast("array<double>"), lits)
  }

  /** `dists` array column over all centroids. */
  private[operators] def distArray(cents: Seq[Array[Double]]): Column =
    array(cents.map(dist2): _*)

  /** Double dot product of the embedding column with a centroid literal. */
  private def dotTo(centroid: Array[Double]): Column = {
    val lits = array(centroid.map(lit(_)): _*)
    graft.functions.ArrayMath.dot(
      col("embedding").cast("array<double>"), lits)
  }

  /** `cdots` array column: dot(embedding, μⱼ) over all centroids — the
    * probe-side input of the MIPS pruning bound. */
  private[operators] def dotArray(cents: Seq[Array[Double]]): Column =
    array(cents.map(dotTo): _*)

  /** Cluster ids of the `nprobe` nearest centroids, nearest first
    * (struct sort on (distance, index) — deterministic ties). */
  private[operators] def nearestClusters(k: Int, nprobe: Int): Column =
    expr(s"slice(transform(array_sort(transform(sequence(0, ${k - 1}), " +
      s"i -> struct(element_at(dists, i + 1) as d, i as i))), x -> x.i), 1, $nprobe)")

  /** Deterministic Lloyd training: init = k smallest-md5(vec_id) vectors,
    * then `iters` exact assign/average rounds (each round: one narrow
    * assign pass + one (cluster, dim) aggregation; centroids collect to
    * the driver — k×dim doubles). Empty clusters keep their centroid. */
  /** Deterministic hash sample: keeps the rows whose md5(vec_id) prefix
    * falls under `fraction` of the 32-bit space — one narrow filter, no
    * sort, no shuffle, identical row set every run and on every engine.
    * This is the 100 TB training posture: Lloyd iterations cost
    * O(passes × corpus); the centroids they produce are a FREE CHOICE
    * (the Cauchy-Schwarz exactness bound holds for ANY centroid set
    * whose radius/count stats are computed over the FULL corpus), so
    * training on a sample trades nothing but clustering tightness —
    * searchExact stays provably exact, searchApprox recall is the only
    * dial affected (IvfIndexSpec pins both). */
  private[operators] def hashSample(emb: DataFrame, fraction: Double): DataFrame =
    if (fraction >= 1.0) emb
    else emb.filter(
      expr(s"conv(substring(md5(cast(vec_id as string)), 1, 8), 16, 10)")
        .cast("long") < math.floor(fraction * 4294967296d).toLong)

  /** Above this k the k×dim-literal expression trees (distArray /
    * dotArray / centLit) stop being "one codegen pass" and start being
    * the cost — measured on knnGraph, k=32 turned a seconds-scale job
    * into ~25 s of mostly plan/codegen, and a k=√n dial at corpus
    * scale (k≈450 at 200k vectors) never finishes planning. Training
    * and assignment therefore DISPATCH to the broadcast-join forms
    * beyond it — bit-identical results (same double arithmetic, same
    * (distance, index) tie order; KnnGraphApproxSpec pins training
    * parity, IvfAnnSpec pins assignment parity). */
  private[operators] val LiteralKCeiling = 32

  // ------------------------------------------------- narrow literal form
  // A THIRD evaluation strategy for centroid scoring (r20 optimization):
  // the k×dim-literal problem above is the EXPRESSION TREE (k×dim lit()
  // nodes), not the data volume — one typedLit of array<array<double>>
  // is a SINGLE Literal node at any k, and `transform` over it computes
  // the per-centroid distance array in one narrow pass: no broadcast
  // build, no n×k crossJoin rows, no window exchange for probe lists.
  // Arithmetic is the same ArrayMath kernel (interpreted inside the HOF
  // lambda — a tight primitive loop over ArrayData, no boxing), and the
  // (distance, index) tie order is nearestClusters' own, so results are
  // bit-identical to both older forms (OptProbe measured parity;
  // KnnGraphApproxSpec / IvfAnnSpec / the e12b & e23b oracles gate it).
  //
  // Ceiling: the literal ships inside the serialized plan/task binary,
  // so it must stay metadata-sized. 2^20 cells (8 MB of doubles) covers
  // every k=√n dial up to n≈2.7e8 at dim=64; beyond it the broadcast
  // crossJoin forms remain the plan (a 100 TB corpus at dim=1024 would
  // put k·dim ≈ 4.6e7 cells — dispatched to the join form).
  private[operators] val LiteralCellCeiling: Long = 1L << 20

  private[operators] def fitsLiteralCells(cents: Seq[Array[Double]]): Boolean =
    cents.nonEmpty &&
      cents.length.toLong * cents.head.length <= LiteralCellCeiling

  /** All centroids as ONE array<array<double>> literal node. */
  private[operators] def centsArrayLit(cents: Seq[Array[Double]]): Column =
    typedLit(cents.map(_.toSeq))

  /** `dists` over an `e` (array<double>) column via the single-literal
    * transform — [[distArray]]'s plan-cheap equivalent (same kernel,
    * same element order). Callers MUST bind the result behind an
    * [[graft.functions.OptimizerBarrier]] fence: consumers like
    * [[nearestClusters]] read the array k times (one element_at per
    * cluster), and CollapseProject would otherwise inline — and so
    * re-evaluate — the full k×dim scan per read (measured 3× on the
    * sf0.1 graph build). */
  private def distArrayNarrowRaw: Seq[Array[Double]] => Column =
    cents => transform(centsArrayLit(cents),
      c => graft.functions.ArrayMath.l2sq(col("e"), c))

  /** Fenced `dists` column for the narrow literal form. */
  private[operators] def distArrayNarrow(cents: Seq[Array[Double]]): Column =
    graft.functions.OptimizerBarrier.fence(distArrayNarrowRaw(cents))

  def trainCentroids(emb: DataFrame, k: Int = 16, iters: Int = 2,
      sampleFraction: Double = 1.0): Seq[Array[Double]] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0, sampleFraction)
    val train = hashSample(emb, sampleFraction)
    if (k > LiteralKCeiling)
      return trainCentroidsJoin(train.sparkSession, train, k, iters)
    var cents: Seq[Array[Double]] = train
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h").limit(k)
      .collect().map(_.getSeq[Double](1).toArray).toSeq
    // dim from the collected init vectors — one fewer driver job than
    // a size() probe (r20; same convention as trainCentroidsJoin)
    val dim = cents.headOption.map(_.length)
      .getOrElse(emb.selectExpr("size(embedding)").head.getInt(0))
    for (_ <- 0 until iters) {
      val assigned = train
        .withColumn("dists", distArray(cents))
        .withColumn("cluster", element_at(nearestClusters(cents.length, 1), 1))
      val sums = assigned
        .select(col("cluster"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos").agg(avg("v").as("m"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCluster.get(ci) match {
          case Some(rows) =>
            val a = new Array[Double](dim)
            rows.foreach(r => a(r.getInt(1)) = r.getDouble(2))
            a
          case None => old // empty cluster
        }
      }
    }
    cents
  }

  /** Nearest-centroid cluster assignment: the input frame plus a
    * `label` column (LongType). This is the k-means step of the
    * SemDeDup recipe — its labels feed CosineNearDup.semanticDedup
    * directly (IvfPqSpec-style composition pinned in
    * CosineNearDupSpec). One narrow codegen pass; centroids are
    * driver-held literals (k×dim doubles), so assignment needs no
    * join and no shuffle. */
  def assign(emb: DataFrame, cents: Seq[Array[Double]]): DataFrame =
    if (cents.length <= LiteralKCeiling)
      emb
        .withColumn("dists", distArray(cents))
        .withColumn("label",
          element_at(nearestClusters(cents.length, 1), 1).cast("long"))
        .drop("dists")
    else {
      // big-k form (k = √n dials): centroids broadcast as a k-row
      // frame, nearest = min_by over (d², cid) — the same tie order as
      // nearestClusters' (distance, index) struct sort. Needs a vec_id
      // column to join the label back (every index/dedup caller has
      // one — it IS the row identity), so the two degenerate inputs
      // the literal form tolerates must not DIVERGE silently here:
      //   - NULL vec_id: the join-back would silently drop the row —
      //     refused in-plan (raise_error costs nothing until a null
      //     actually flows; no extra validation pass);
      //   - NULL embedding: the literal form yields a NULL label
      //     (null distances all the way down) while min_by would pick
      //     an arbitrary centroid — nulled out below to match.
      val guarded = emb.withColumn("vec_id",
        when(col("vec_id").isNull, raise_error(lit(
          "IvfAnn.assign: NULL vec_id above LiteralKCeiling — the " +
            "big-k form joins labels back by row identity")))
          .otherwise(col("vec_id")))
      val lbl = guarded
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .crossJoin(broadcast(centFrame(emb.sparkSession, cents)))
        .select(col("vec_id"), col("cid"), centDist2.as("d2"))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").cast("long").as("label"))
      // the literal branch's withColumn REPLACES a pre-existing label
      // column (the testdata generator ships one) — match it
      val base =
        if (guarded.columns.contains("label")) guarded.drop("label")
        else guarded
      base.join(lbl, "vec_id")
        .withColumn("label", when(col("embedding").isNull,
          lit(null).cast("long")).otherwise(col("label")))
    }

  /** (…, embedding, label) frame plus `d` = distance to the ASSIGNED
    * centroid — the append paths' stats input. Literal element_at
    * lookup below [[LiteralKCeiling]]; a broadcast join on the label
    * above it (identical arithmetic — IvfAnnSpec pins parity). */
  private[operators] def distToAssigned(frame: DataFrame,
      cents: Seq[Array[Double]]): DataFrame =
    if (cents.length <= LiteralKCeiling)
      frame.withColumn("d", sqrt(graft.functions.ArrayMath.l2sq(
        col("embedding").cast("array<double>"),
        element_at(array(cents.map(c => array(c.map(lit(_)): _*)): _*),
          col("label").cast("int") + 1))))
    else
      frame.join(
          broadcast(centFrame(frame.sparkSession, cents)
            .select(col("cid").cast("long").as("label"), col("cvec"))),
          "label")
        .withColumn("d", sqrt(graft.functions.ArrayMath.l2sq(
          col("embedding").cast("array<double>"), col("cvec"))))
        .drop("cvec")

  /** Per-cluster pruning metadata: radius (max member distance to its
    * centroid), member count, and the corpus-wide max member norm (the
    * quantization-slack scale). k rows + one double — driver-held like
    * the centroids themselves (O(metadata), not data). */
  final case class ClusterStats(radius: Array[Double], count: Array[Long],
      maxNorm: Double)

  private[operators] def clusterStats(emb: DataFrame,
      cents: Seq[Array[Double]]): ClusterStats = {
    val perVec =
      if (cents.length <= LiteralKCeiling)
        emb
          .withColumn("dists", distArray(cents))
          .withColumn("cluster", element_at(nearestClusters(cents.length, 1), 1))
          .select(col("cluster"),
            sqrt(element_at(col("dists"), col("cluster") + 1)).as("d"),
            sqrt(graft.functions.ArrayMath.dot(
              col("embedding").cast("array<double>"),
              col("embedding").cast("array<double>"))).as("nrm"))
      else
        // big-k form: assign's broadcast min_by, carrying the winning
        // d² so the radius needs no second distance pass
        emb
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
          .crossJoin(broadcast(centFrame(emb.sparkSession, cents)))
          .select(col("vec_id"), col("e"), col("cid"), centDist2.as("d2"))
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("cid"))).as("m"),
            first(col("e")).as("e"))
          .select(col("m.cid").as("cluster"), sqrt(col("m.d2")).as("d"),
            sqrt(graft.functions.ArrayMath.dot(col("e"), col("e"))).as("nrm"))
    statsFromPerVec(perVec, cents.length)
  }

  /** Aggregate a (cluster, d, nrm) per-vector frame into [[ClusterStats]]
    * — shared by [[clusterStats]] and [[clusterStatsAndCorpus]]. */
  private def statsFromPerVec(perVec: DataFrame, k: Int): ClusterStats = {
    val rows = perVec
      .groupBy("cluster").agg(max("d").as("r"), max("nrm").as("mx"),
        org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect()
    val radius = new Array[Double](k)
    val members = new Array[Long](k)
    var maxNorm = 0.0
    rows.foreach { r =>
      radius(r.getInt(0)) = r.getDouble(1); members(r.getInt(0)) = r.getLong(3)
      maxNorm = math.max(maxNorm, r.getDouble(2))
    }
    ClusterStats(radius, members, maxNorm)
  }

  /** ONE corpus assignment pass serving BOTH the pruning stats and the
    * (vec_id, cluster) inverted-list frame — IvfIndex.write's r20
    * fusion applied to the in-memory exact-search family (r21, guide
    * §1.2: knnExact/rangeSearch ran clusterStats' full k-distance pass
    * and then RE-ASSIGNED the whole corpus inside the candidate join).
    * The per-vector frame is eagerly localCheckpointed (four narrow
    * columns, two orders below the embedding payload), so the stats
    * aggregate and the candidate join both read the checkpointed
    * blocks. The cluster/d/nrm expressions are the very ones the
    * separate passes evaluate — assignments, tie order, and stats are
    * bit-identical by construction (AnnOracleParitySpec and the
    * e01-family oracles gate it). Above [[LiteralKCeiling]] the
    * separate passes remain: assign's degenerate-input guards (NULL
    * vec_id/embedding) live there and must stay authoritative. */
  private[operators] def clusterStatsAndCorpus(emb: DataFrame,
      cents: Seq[Array[Double]]): (ClusterStats, DataFrame) =
    if (cents.length > LiteralKCeiling)
      (clusterStats(emb, cents),
        assign(emb, cents)
          .select(col("vec_id"), col("label").cast("int").as("cluster")))
    else {
      val perVec = emb
        .withColumn("dists", distArray(cents))
        .withColumn("cluster", element_at(nearestClusters(cents.length, 1), 1))
        .select(col("vec_id"), col("cluster"),
          sqrt(element_at(col("dists"), col("cluster") + 1)).as("d"),
          sqrt(graft.functions.ArrayMath.dot(
            col("embedding").cast("array<double>"),
            col("embedding").cast("array<double>"))).as("nrm"))
        .localCheckpoint(true)
      (statsFromPerVec(perVec.select("cluster", "d", "nrm"), cents.length),
        perVec.select(col("vec_id"), col("cluster").cast("int").as("cluster")))
    }

  /** Base double-fp slack on the pruning bounds, scaled at use sites by
    * (1 + ‖p‖ + maxNorm). Has to dominate two error sources: (a) double
    * round-off in the dot/radius arithmetic (~1e-13 relative) and
    * (b) the discrepancy between the double dots the bounds reason
    * about and the quantized-integer dot the final ranking uses —
    * floor(x·2^20) perturbs dot(x,y) by at most (‖x‖₁+‖y‖₁)·2⁻²⁰ ≤
    * 8(‖x‖+‖y‖)·2⁻²⁰ in 64 dims, i.e. ≲ 8e-6 per unit of vector norm.
    * The scaled 1e-3·(1+‖p‖+maxNorm) dominates both by two orders at
    * any corpus magnitude; the only cost of slack is a slightly wider
    * candidate set. */
  private[operators] val PruneEps = 1e-3

  /** The adaptive probe list that makes IVF search EXACT for maximum
    * inner product on ANY corpus (no norm assumption): every member c
    * of cluster j is within radius(j) of μⱼ, so by Cauchy-Schwarz
    *   |dot(p,c) − dot(p,μⱼ)| ≤ ‖p‖·radius(j)
    * and cluster j's dots all lie in [cdⱼ − ‖p‖rⱼ, cdⱼ + ‖p‖rⱼ] where
    * cdⱼ = dot(p, μⱼ). Scanning clusters by their LOWER bound
    * descending until member counts cover topK+1 rows yields a
    * threshold `thr` that at least topK+1 candidates provably meet
    * (+1 absorbs the probe meeting itself); any cluster whose UPPER
    * bound falls below thr contains no top-k member and is skipped.
    * This is what lets e05/e06/e09 hash-match the e01 brute-force
    * oracle instead of sitting at `no_oracle` recall gates. Fixed-
    * nprobe `knn` remains the recall/cost dial for corpora where the
    * guarantee isn't worth the adaptive fan-out. */
  private def metaSql(cents: Seq[Array[Double]], stats: ClusterStats): String =
    cents.indices.map { j =>
      s"struct(element_at(cdots, ${j + 1}) as cd, " +
        s"${stats.radius(j)}D as r, ${stats.count(j)}L as n, $j as i)"
    }.mkString("array(", ", ", ")")

  /** thr column: the guaranteed-met dot threshold (see above). NULL
    * when the whole corpus has ≤ topK vectors — the prune test treats
    * that as "no bound", scanning every cluster, which is both correct
    * and exactly what a ≤topK corpus needs. Computed ONCE per probe row
    * as its own column; inlining it into the per-cluster lambda would
    * re-sort the k-struct array k times per row. */
  private[operators] def pruneThreshold(cents: Seq[Array[Double]],
      stats: ClusterStats, topK: Int): Column =
    expr(s"""aggregate(
      array_sort(transform(${metaSql(cents, stats)},
        x -> struct(-(x.cd - pnorm * x.r) as nlb, x.n as n))),
      struct(0L as cum, cast(null as double) as thr),
      (acc, x) -> if(acc.thr is not null, acc,
        struct(acc.cum + x.n as cum,
               if(acc.cum + x.n >= ${topK + 1}, -x.nlb, acc.thr) as thr)),
      acc -> acc.thr)""")

  /** Pruned probe list over a frame carrying `cdots`, `pnorm`, `thr`. */
  private[operators] def exactClusterList(cents: Seq[Array[Double]],
      stats: ClusterStats): Column =
    expr(s"filter(transform(${metaSql(cents, stats)}, " +
      s"x -> if(thr is null or x.cd + pnorm * x.r >= thr - " +
      s"$PruneEps * (1D + pnorm + ${stats.maxNorm}D), x.i, -1)), i -> i >= 0)")

  /** [[exactClusterList]]'s fixed-threshold sibling over a frame
    * carrying `cdots`, `pnorm`, `tdot` (the probe's double-image
    * threshold): keep cluster j iff its dot upper bound cdⱼ + ‖p‖·rⱼ
    * (plus the [[PruneEps]] quantization slack) reaches tdot — the
    * range-search prune, ONE definition shared by [[rangeSearch]] and
    * IvfIndex.searchRange. Unlike the top-k bound it reads NO counts:
    * a fixed threshold is known before any candidate is seen, so
    * deletions can never loosen or tighten it. */
  private[operators] def rangeClusterList(cents: Seq[Array[Double]],
      stats: ClusterStats): Column =
    expr(s"filter(transform(${metaSql(cents, stats)}, " +
      s"x -> if(x.cd + pnorm * x.r >= tdot - " +
      s"$PruneEps * (1D + pnorm + ${stats.maxNorm}D), x.i, -1)), i -> i >= 0)")

  // ------------------------------------------------------ probe stages
  // The three probe-list generators, each with TWO bit-identical plans:
  // the k×dim-literal expression stack below LiteralKCeiling (unchanged
  // plans at the default dials every oracle runs at) and a broadcast
  // ROW form above it — per-(probe, cluster) rows against a k-row
  // centroid/stats frame, so a k = √n dial plans in milliseconds
  // instead of drowning in literal tree nodes. Contract: input needs
  // (vec_id, embedding); output is exactly (vec_id, embedding, cluster),
  // one row per unpruned (probe, cluster).

  /** Centroids + per-cluster stats as a broadcastable k-row frame. */
  private def centStatsFrame(spark: SparkSession, cents: Seq[Array[Double]],
      stats: ClusterStats): DataFrame = {
    import spark.implicits._
    cents.indices.map(i => (i, cents(i).toSeq, stats.radius(i), stats.count(i)))
      .toDF("cid", "cvec", "r", "n")
  }

  /** Probe clusters under the EXACT top-k Cauchy-Schwarz bound. Row
    * form: lb/ub per (probe, cluster) row; thr = the lb of the first
    * cluster (by lb descending) whose running member count reaches
    * topK+1 — provably tie-order-invariant (equal-lb clusters yield the
    * same thr value wherever the crossing lands inside the tie group),
    * so the window's (lb desc, cid) order and the literal fold's
    * (lb desc, n) order compute the same threshold. Zero-count clusters
    * stay in the list exactly like the literal filter keeps them (their
    * counts may be clamped understatements — dropping them could drop
    * real candidates). */
  private[operators] def probeClustersExact(probes: DataFrame,
      cents: Seq[Array[Double]], stats: ClusterStats, topK: Int): DataFrame =
    if (cents.length <= LiteralKCeiling)
      probes
        .withColumn("cdots", dotArray(cents))
        .withColumn("pnorm", sqrt(graft.functions.ArrayMath.dot(
          col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"))))
        .withColumn("thr", pruneThreshold(cents, stats, topK))
        .select(col("vec_id"), col("embedding"),
          explode(exactClusterList(cents, stats)).as("cluster"))
    else {
      import org.apache.spark.sql.expressions.Window
      val base = probes
        .select(col("vec_id"), col("embedding"),
          col("embedding").cast("array<double>").as("__e"))
        .withColumn("__pnorm", sqrt(
          graft.functions.ArrayMath.dot(col("__e"), col("__e"))))
        .crossJoin(broadcast(
          centStatsFrame(probes.sparkSession, cents, stats)))
        .withColumn("__cd",
          graft.functions.ArrayMath.dot(col("__e"), col("cvec")))
        .withColumn("__lb", col("__cd") - col("__pnorm") * col("r"))
      val wRun = Window.partitionBy("vec_id")
        .orderBy(col("__lb").desc, col("cid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("vec_id")
      base
        .withColumn("__cum", sum("n").over(wRun))
        .withColumn("__thr", max(when(col("__cum") >= topK + 1 &&
          col("__cum") - col("n") < topK + 1, col("__lb"))).over(wAll))
        .filter(col("__thr").isNull ||
          col("__cd") + col("__pnorm") * col("r") >=
            col("__thr") - lit(PruneEps) *
              (lit(1d) + col("__pnorm") + lit(stats.maxNorm)))
        .select(col("vec_id"), col("embedding"), col("cid").as("cluster"))
    }

  /** Probe clusters under the FIXED-threshold range bound (tdot derived
    * per probe from its quantized self-dot — no counts read, so the
    * prune is deletion-invariant in both forms). */
  private[operators] def probeClustersRange(probes: DataFrame,
      cents: Seq[Array[Double]], stats: ClusterStats, num: Int,
      den: Int): DataFrame =
    if (cents.length <= LiteralKCeiling)
      probes
        .withColumn("cdots", dotArray(cents))
        .withColumn("pnorm", sqrt(graft.functions.ArrayMath.dot(
          col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"))))
        .withColumn("tdot",
          graft.functions.ArrayMath.dot(expr(quant), expr(quant))
            .cast("double") * (num.toDouble / den) / math.pow(2, 40))
        .select(col("vec_id"), col("embedding"),
          explode(rangeClusterList(cents, stats)).as("cluster"))
    else
      probes
        .select(col("vec_id"), col("embedding"),
          col("embedding").cast("array<double>").as("__e"))
        .withColumn("__pnorm", sqrt(
          graft.functions.ArrayMath.dot(col("__e"), col("__e"))))
        .withColumn("__tdot",
          graft.functions.ArrayMath.dot(expr(quant), expr(quant))
            .cast("double") * (num.toDouble / den) / math.pow(2, 40))
        .crossJoin(broadcast(
          centStatsFrame(probes.sparkSession, cents, stats)))
        .withColumn("__cd",
          graft.functions.ArrayMath.dot(col("__e"), col("cvec")))
        .filter(col("__cd") + col("__pnorm") * col("r") >=
          col("__tdot") - lit(PruneEps) *
            (lit(1d) + col("__pnorm") + lit(stats.maxNorm)))
        .select(col("vec_id"), col("embedding"), col("cid").as("cluster"))

  /** The nprobe NEAREST clusters per probe (the recall-dial list). Row
    * form ranks (d², cid) — nearestClusters' exact tie order. */
  private[operators] def probeClustersNearest(probes: DataFrame,
      cents: Seq[Array[Double]], nprobe: Int): DataFrame =
    if (cents.length <= LiteralKCeiling)
      probes
        .withColumn("dists", distArray(cents))
        .select(col("vec_id"), col("embedding"),
          explode(nearestClusters(cents.length, nprobe)).as("cluster"))
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("vec_id").orderBy(col("__d2"), col("cid"))
      probes
        .select(col("vec_id"), col("embedding"),
          col("embedding").cast("array<double>").as("__e"))
        .crossJoin(broadcast(centFrame(probes.sparkSession, cents)))
        .withColumn("__d2",
          graft.functions.ArrayMath.l2sq(col("__e"), col("cvec")))
        .withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") <= nprobe)
        .select(col("vec_id"), col("embedding"), col("cid").as("cluster"))
    }

  /** (query_id, cand_id) candidate pairs whose union provably contains
    * every probe's true top-k (see [[pruneThreshold]]) — ids only, the
    * shared candidate generator of [[knnExact]] and [[IvfPq.knnExact]]. */
  private[operators] def exactCandidatePairs(emb: DataFrame,
      cents: Seq[Array[Double]], stats: ClusterStats, probePred: Column,
      topK: Int, corpusOpt: Option[DataFrame] = None): DataFrame = {
    // the corpus inverted list normally arrives pre-assigned from
    // [[clusterStatsAndCorpus]]'s shared pass; the fallback re-assigns
    val corpus = corpusOpt.getOrElse(assign(emb, cents)
      .select(col("vec_id"), col("label").cast("int").as("cluster")))
    val probeClusters =
      probeClustersExact(emb.filter(probePred), cents, stats, topK)
        .select(col("vec_id").as("query_id"), col("cluster"))
    probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"))
      .distinct()
  }

  /** EXACT range (radius) search by inner product: every (probe, cand)
    * pair with den·qdot(p,c) ≥ num·qdot(p,p) — a per-probe RELATIVE
    * threshold (a fraction of the probe's self-dot), because an
    * absolute dot floor is corpus-magnitude-fragile the way absolute
    * row floors are SF-fragile (q33's lesson). The comparison is exact
    * integer arithmetic on both engines; the threshold never leaves
    * the integer domain.
    *
    * Pruning is the fixed-threshold degenerate case of the top-k
    * Cauchy-Schwarz bound: cluster j's dots all lie at or below
    * cdⱼ + ‖p‖·rⱼ, so a cluster whose upper bound (plus the documented
    * [[PruneEps]] quantization slack) falls below the probe's double
    * threshold (num/den)·qself/2⁴⁰ provably contains no qualifying
    * member and is never joined. No adaptive scan is needed — the
    * threshold is known before any candidate is seen, which makes
    * range search CHEAPER to prune than top-k at 100 TB: the probe
    * list is one filter over cluster metadata, zero extra passes.
    *
    * Output (query_id, cand_id, dot), the pair list a SemDeDup-style
    * pipeline consumes ("everything ≥ τ·self-similarity"), ordered
    * deterministically. */
  def rangeSearch(spark: SparkSession, dir: String, probePred: Column,
      num: Int = 1, den: Int = 4, k: Int = 16, iters: Int = 2): DataFrame = {
    require(num >= 0 && den > 0, s"threshold fraction $num/$den")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = trainCentroids(emb, k, iters)
    val (stats, corpus) = clusterStatsAndCorpus(emb, cents)
    // per-probe integer threshold (qself) + its double image (tdot,
    // derived inside the probe stage; 2^40 is the quantized-dot scale)
    val probeClusters =
      probeClustersRange(emb.filter(probePred), cents, stats, num, den)
        .select(col("vec_id").as("query_id"),
          graft.functions.ArrayMath.dot(expr(quant), expr(quant)).as("qself"),
          col("cluster"))
    val qvs = emb.select(col("vec_id"), expr(quant).as("qv"))
    probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("qself"), col("vec_id").as("cand_id"))
      .join(qvs.select(col("vec_id").as("query_id"), col("qv").as("pq")),
        "query_id")
      .join(qvs.select(col("vec_id").as("cand_id"), col("qv")), "cand_id")
      .select(col("query_id"), col("cand_id"), qdot("pq", "qv").as("dot"),
        col("qself"))
      .filter(col("dot") * den >= col("qself") * num)
      .select("query_id", "cand_id", "dot")
      .orderBy("query_id", "cand_id")
  }

  /** EXACT top-k by max inner product via IVF inverted lists with
    * adaptive cluster pruning — same pipeline shape as [[knn]]
    * (ids-only candidate join, one exact integer re-rank per
    * candidate), but the probe list comes from the Cauchy-Schwarz
    * bound above, so the output provably equals the e01 brute force on
    * any corpus, any norms (AnnOracleParitySpec pins both the driver
    * corpus and random seeded ones). */
  def knnExact(spark: SparkSession, dir: String, probePred: Column,
      topK: Int = 10, k: Int = 16, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = trainCentroids(emb, k, iters)
    val (stats, corpus) = clusterStatsAndCorpus(emb, cents)
    val pairs = exactCandidatePairs(emb, cents, stats, probePred, topK,
      Some(corpus))
    val qvs = emb.select(col("vec_id"), expr(quant).as("qv"))
    val cands = pairs
      .join(qvs.select(col("vec_id").as("query_id"), col("qv").as("pq")), "query_id")
      .join(qvs.select(col("vec_id").as("cand_id"), col("qv")), "cand_id")
      .select(col("query_id"), col("cand_id"), qdot("pq", "qv").as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }

  /** Whole-corpus APPROXIMATE kNN graph — the fixed-nprobe scale dial
    * the [[knnExact]] Scaladoc promises for corpora where the adaptive
    * exact pruning degrades toward all-pairs (near-random vectors, wide
    * cluster radii). Same output schema as the exact graph; recall is a
    * dial, not a guarantee — KnnGraphApproxSpec pins ≥ 0.95 at the
    * default (k=32, nprobe=24) against [[knnExact]] on the driver's
    * unclustered sf0.01 corpus, the adversarial case (real embedding
    * corpora cluster tighter, which only helps).
    *
    * Plan shape, deliberately different from [[knn]]'s literal-array
    * expressions: [[distArray]] inlines k centroids × dim literals into
    * ONE expression, which blows past the JIT/codegen comfort zone
    * right when the graph case wants bigger k (measured: k=32 turns a
    * seconds-scale sf0.01 graph into ~25 s of mostly plan/codegen).
    * Here centroids are a BROADCAST k-row frame: corpus × centroids is
    * a broadcast nested-loop producing n·k (id, cid, d²) rows with one
    * fixed-size codegen fold, cluster assignment is a map-side-partial
    * min_by aggregation, probe lists are one window pass, and the
    * candidate join needs NO distinct (each candidate lives in exactly
    * one inverted list, so a pair can only arise once). One shuffle for
    * the n·k ranking, one for the per-query top-k — at 1000 executors
    * the broadcast is k·dim doubles and everything else partitions by
    * vec_id/query_id. */
  def knnGraph(spark: SparkSession, dir: String, topK: Int = 5, k: Int = 32,
      nprobe: Int = 24, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = trainCentroidsJoin(spark, emb, k, iters)
    val cands =
      if (fitsLiteralCells(cents)) {
        // narrow literal form (r20): each row computes its own fenced
        // dists array and probe list in place — the n·k scoring rows,
        // their window exchange, and the two post-pair qv-attach joins
        // all disappear. The quantized vector rides the (much smaller)
        // probe/corpus frames into the cid join, which computes the
        // exact dot inline; fences pin qv/lst to one evaluation each
        // (CollapseProject would otherwise re-inline them per pair —
        // measured 3× slower). Plan: 2 narrow scans → 1 equi-join →
        // top-k window; the rank filter compiles to a partial
        // WindowGroupLimit below the window exchange, so at most
        // topK+1 rows per (query, map partition) are ever shuffled.
        val fence = graft.functions.OptimizerBarrier.fence _
        val narrow = emb.select(col("vec_id"),
            fence(expr(quant)).as("qv"),
            col("embedding").cast("array<double>").as("e"))
          .withColumn("dists", distArrayNarrow(cents))
          .withColumn("lst",
            fence(nearestClusters(cents.length, math.max(1, nprobe))))
          .select(col("vec_id"), col("qv"), col("lst"))
        val probes = narrow.select(col("vec_id").as("query_id"),
          col("qv").as("pq"), explode(col("lst")).as("cid"))
        // corpus assignment = the probe list's head: same (d², cid)
        // tie order as the old rnk=1 window row
        val corpus = narrow.select(col("vec_id").as("cand_id"),
          col("qv"), element_at(col("lst"), 1).as("cid"))
        probes.join(corpus,
            probes("cid") === corpus("cid") &&
              col("query_id") =!= col("cand_id"))
          .select(col("query_id"), col("cand_id"), qdot("pq", "qv").as("dot"))
      } else {
        // broadcast row form: centroids too large for a plan literal
        // (k·dim beyond LiteralCellCeiling) — score via the broadcast
        // crossJoin, rank probe lists in one window pass
        val e = emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("e"))
        val scored = e.crossJoin(broadcast(centFrame(spark, cents)))
          .select(col("vec_id"), col("cid"), centDist2.as("d2"))
        val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
        val ranked = scored.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= math.max(1, nprobe))
        val corpus = ranked.filter(col("rnk") === 1)
          .select(col("vec_id").as("cand_id"), col("cid"))
        val probes = ranked.select(col("vec_id").as("query_id"), col("cid"))
        val pairs = probes.join(corpus,
            probes("cid") === corpus("cid") &&
              col("query_id") =!= col("cand_id"))
          .select(col("query_id"), col("cand_id"))
        val qvs = emb.select(col("vec_id"), expr(quant).as("qv"))
        pairs
          .join(qvs.select(col("vec_id").as("query_id"), col("qv").as("pq")),
            "query_id")
          .join(qvs.select(col("vec_id").as("cand_id"), col("qv")), "cand_id")
          .select(col("query_id"), col("cand_id"), qdot("pq", "qv").as("dot"))
      }
    val wk = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
    cands.withColumn("rnk", row_number().over(wk).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }

  /** [[knnGraph]] under the DOCUMENTED scale dial: k = ⌊√n⌋ centroids
    * (clamped to ≥ 1), nprobe fixed — per-probe candidates
    * Θ(nprobe·n/k) = Θ(√n), total work Θ(n^1.5), versus Θ(n²) when the
    * dials are frozen as corpus share (e12's continuity entry covers
    * nprobe/k = 75% of the corpus per probe at sf0.1). Measured by
    * tools/ScaleProbe: 6.0× wall for 10× data vs 37× for the fixed
    * dial. The k-probe job pays ONE extra metadata count of the
    * embeddings table to size k. On corpora small enough that
    * ⌊√n⌋ ≤ nprobe every cluster is probed and the graph is exact —
    * the dial only starts trading recall (≥ 0.95, gated by
    * KnnGraphApproxSpec at sf0.1) once n outgrows nprobe². Default
    * nprobe = 36 is the smallest sweep point clearing the gate with
    * margin on the near-random sf0.1 corpus (measured recall at
    * k=⌊√n⌋=44: nprobe 24 → 0.885, 28 → 0.927, 32 → 0.958,
    * 36 → 0.981, 40 → 0.994); on a random corpus recall at FIXED
    * nprobe decays as coverage nprobe/√n shrinks — that is the
    * documented trade (real embedding corpora cluster, which is what
    * the prune exploits), and the dial to turn is nprobe, not k. */
  def knnGraphScaled(spark: SparkSession, dir: String, topK: Int = 5,
      nprobe: Int = 36, iters: Int = 2): DataFrame = {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val k = math.max(1, math.sqrt(n.toDouble).toInt)
    knnGraph(spark, dir, topK, k, nprobe, iters)
  }

  /** Centroids as a k-row broadcastable frame. */
  private def centFrame(spark: SparkSession,
      cents: Seq[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toDF("cid", "cvec")
  }

  /** Squared L2 distance between the `e` and `cvec` array columns —
    * identical arithmetic (and thus identical assignments/ties) to
    * [[dist2]]'s literal form. */
  private def centDist2: Column =
    graft.functions.ArrayMath.l2sq(col("e"), col("cvec"))

  /** Lloyd training with a join-free assignment where the centroid set
    * is literal-sized ([[fitsLiteralCells]]): one narrow pass computes
    * every row's fenced `dists` array and its argmin cluster via
    * [[nearestClusters]] — no broadcast build, no n×k crossJoin rows,
    * no per-row groupBy — then the per-dimension averages aggregate as
    * before. Beyond the ceiling the broadcast min_by form remains.
    * Same deterministic init (k smallest md5(vec_id)), same double
    * arithmetic and (distance, index) tie order as [[trainCentroids]],
    * so results match bit-for-bit across all three forms
    * (KnnGraphApproxSpec pins parity). `dim` comes from the collected
    * init vectors — one fewer driver job than a size() probe. */
  private[operators] def trainCentroidsJoin(spark: SparkSession,
      emb: DataFrame, k: Int, iters: Int): Seq[Array[Double]] = {
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    var cents: Seq[Array[Double]] = e
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h").limit(k)
      .collect().map(_.getSeq[Double](1).toArray).toSeq
    val dim = cents.headOption.map(_.length)
      .getOrElse(emb.selectExpr("size(embedding)").head.getInt(0))
    for (_ <- 0 until iters) {
      val assigned =
        if (fitsLiteralCells(cents))
          e.withColumn("dists", distArrayNarrow(cents))
            .withColumn("cluster",
              element_at(nearestClusters(cents.length, 1), 1))
            .select(col("cluster"), col("e"))
        else
          e.crossJoin(broadcast(centFrame(spark, cents)))
            .select(col("vec_id"), col("e"), col("cid"), centDist2.as("d2"))
            .groupBy("vec_id")
            .agg(min(struct(col("d2"), col("cid"))).as("m"),
              first(col("e")).as("e"))
            .select(col("m.cid").as("cluster"), col("e"))
      val sums = assigned
        .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos").agg(avg("v").as("m"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCluster.get(ci) match {
          case Some(rows) =>
            val a = new Array[Double](dim)
            rows.foreach(r => a(r.getInt(1)) = r.getDouble(2))
            a
          case None => old // empty cluster
        }
      }
    }
    cents
  }

  /** Top-k approximate neighbors for `probes` out of the embeddings
    * table via nprobe-list IVF search, re-ranked by exact quantized dot. */
  def knn(spark: SparkSession, dir: String, probePred: Column, topK: Int = 10,
      k: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = trainCentroids(emb, k, iters)
    // inverted lists: every vector in exactly one cluster
    val corpus = assign(emb, cents)
      .select(col("vec_id"), col("label").cast("int").as("cluster"))
    // probes search their nprobe nearest lists
    val probeClusters =
      probeClustersNearest(emb.filter(probePred), cents, nprobe)
        .select(col("vec_id").as("query_id"), col("cluster"))
    val pairs = probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"))
      .distinct()
    val qvs = emb.select(col("vec_id"), expr(quant).as("qv"))
    val cands = pairs
      .join(qvs.select(col("vec_id").as("query_id"), col("qv").as("pq")), "query_id")
      .join(qvs.select(col("vec_id").as("cand_id"), col("qv")), "cand_id")
      .select(col("query_id"), col("cand_id"), qdot("pq", "qv").as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }
}
