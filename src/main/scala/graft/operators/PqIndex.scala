package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Fs

/** Persisted IVF-PQ layout — [[IvfPq]]'s memory-bound search over an
  * on-disk index ([[IvfIndex]]'s cluster-partitioned posture):
  *
  *   data/cluster=<j>/…  (vec_id, embedding, codes, rerr) rows
  *   meta.json           coarse centroids + pruning stats + the M×K
  *                       PQ codebooks (atomic write, torn-read-free)
  *
  * What the layout buys at 100 TB: the ADC scoring pass reads ONLY the
  * (vec_id, codes, rerr) columns — parquet is columnar, so the wide
  * embedding column never leaves disk for candidates that the PQ
  * bound screens out; real vectors are read once, for the provably-
  * sufficient shortlist, under the same cluster partition filter. The
  * cluster partition filter itself is the literal static pruning of
  * IvfIndex.searchExact, so skipped clusters' files are never opened
  * at all.
  *
  * [[searchExact]] is PROVABLY the e01 brute force (the e19 query runs
  * it against e01's DuckDB oracle): candidate clusters come from
  * IvfAnn's Cauchy-Schwarz bound, the ADC shortlist keeps every
  * candidate whose upper bound (approx + ‖p‖·rerr + eps) meets the
  * topK-th lower bound — IvfPq.knnExact's argument over the persisted
  * codes — and the exact integer re-rank runs on the shortlist's real
  * vectors. [[search]] is the fixed-nprobe + fixed-shortlist dial for
  * corpora where the guarantee isn't worth the adaptive fan-out.
  *
  * Maintenance posture: the PQ index is a DERIVED artifact — codes are
  * a pure function of (embedding, codebooks) and carry no bookkeeping
  * of their own — so there is deliberately no append/delete/retrain
  * surface here. A corpus that mutates lives in [[IvfIndex]] (which
  * has the full tombstone/fold/retrain machinery); re-run [[write]]
  * to re-derive the PQ artifact when the corpus or its drift warrants
  * it. Training is deterministic (seedless md5-init Lloyd for both
  * the coarse quantizer and every codebook), so a re-run over the
  * same corpus is bit-identical.
  */
object PqIndex {

  /** Source-corpus fingerprint captured at [[write]] time: row count +
    * max vec_id of the embeddings the codes were derived from. Cheap
    * (one agg over a column parquet already exposes in stats), and it
    * catches the two mutations a derived index actually suffers in
    * practice — appends (rows/maxId grow) and deletes (rows shrink).
    * It deliberately does NOT hash content: an in-place overwrite of
    * an embedding at a stable vec_id is invisible to it, which is the
    * documented residual risk (see [[health]]). */
  final case class SrcFp(rows: Long, maxId: Long)

  /** [[health]]'s verdict: the stored fingerprint vs the source NOW.
    * `stale` = the corpus moved since the codes were derived; `fp` is
    * None for a pre-fingerprint index (treat as unknown → re-derive). */
  final case class Health(fp: Option[SrcFp], src: SrcFp, stale: Boolean)

  final case class Meta(coarseK: Int, dim: Int, maxNorm: Double,
      centroids: Seq[Array[Double]], radius: Array[Double],
      counts: Array[Long], books: IvfPq.Codebooks,
      srcFp: Option[SrcFp] = None)

  /** Driver-materialization ceiling for the re-rank shortlist, in
    * (query, cand) pairs — ~64 MB of longs at the default. The
    * shortlist is bounded BY CONTRACT (bounded probe set × per-probe
    * shortlist), but nothing upstream enforces the contract on a
    * caller's probePred; this dial makes a violation fail loudly
    * (BpeTrainer's maxPairs posture) via a PRE-FLIGHT probe-count
    * require that rides the needed-cluster job — the refusal fires
    * before the ADC job runs, and the normal path pays zero extra
    * work — plus a post-collect backstop for searchExact's
    * data-dependent per-probe width. Raise it deliberately for a
    * genuinely larger bounded probe set. */
  val DefaultMaxShortlist: Int = 4 << 20

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The in-progress-(re)build fence: present from just before the
    * data overwrite until after the meta publish. The documented
    * maintenance path is "re-run write to re-derive" — on an EXISTING
    * index that overwrites data/ (new assignments, new codes) before
    * meta.json, so a crash in the window leaves new partitions and
    * codes under STALE centroids/codebooks: pruning bounds are wrong
    * and ADC decodes against the wrong codewords — silent inexactness,
    * the same hazard IvfIndex fences with RETRAINING. readMeta refuses
    * while the marker exists; a write re-run converges (training is
    * deterministic) and clears it. */
  private def rebuildMarker(indexDir: String) = s"$indexDir/REBUILDING"

  /** Build + persist: coarse-assign every vector, encode its M PQ
    * codes and reconstruction error, write cluster-partitioned.
    * Safe to re-run over an existing index (the re-derive maintenance
    * path) — the REBUILDING fence covers the data-before-meta window. */
  def write(spark: SparkSession, srcDir: String, indexDir: String,
      coarseK: Int = 16, m: Int = 8, pqK: Int = 16, iters: Int = 2,
      trainSampleFraction: Double = 1.0): Unit = {
    graft.functions.ArrayMath.register(spark)
    val c = spark.sessionState.newHadoopConf()
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    // sampled training (IvfAnn.hashSample): coarse centroids AND
    // codebooks may train on a fraction; stats and per-vector rerr stay
    // full-corpus, so searchExact's proof is untouched
    val cents = IvfAnn.trainCentroids(emb, coarseK, iters, trainSampleFraction)
    val cb = IvfPq.trainCodebooks(emb, m, pqK, iters, trainSampleFraction)
    val fp = srcFingerprint(emb)
    Fs.mkdirs(indexDir, c)
    Fs.writeStringAtomic(rebuildMarker(indexDir), "", c)
    // ONE assignment pass feeds both the data write and the pruning
    // stats (r21 — IvfIndex.write's r20 fusion: clusterStats ran its
    // own full assignment pass and assign a second one). Bit-identical
    // meta: distToAssigned evaluates the same l2sq kernel on the same
    // operands, and max/count aggregates are order-insensitive on
    // exact doubles (PqIndexSpec's exactness gates pin it).
    val assigned = IvfAnn.distToAssigned(IvfAnn.assign(emb, cents), cents)
      .withColumn("nrm", sqrt(graft.functions.ArrayMath.dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      assigned
        .select(col("vec_id"), col("embedding"),
          IvfPq.codesCol(cb).as("codes"), IvfPq.reconErrCol(cb).as("rerr"),
          col("label").cast("int").as("cluster"))
        .write.mode("overwrite").partitionBy("cluster")
        .parquet(s"$indexDir/data")
      val rows = assigned.groupBy(col("label").cast("int").as("cluster"))
        .agg(max("d").as("r"), max("nrm").as("mx"), count(lit(1)).as("n"))
        .collect()
      val radius = new Array[Double](cents.length)
      val counts = new Array[Long](cents.length)
      var maxNorm = 0.0
      rows.foreach { r =>
        radius(r.getInt(0)) = r.getDouble(1); counts(r.getInt(0)) = r.getLong(3)
        maxNorm = math.max(maxNorm, r.getDouble(2))
      }
      writeMeta(indexDir, Meta(coarseK, cents.head.length, maxNorm,
        cents, radius, counts, cb, Some(fp)), c)
    } finally { assigned.unpersist(false); () }
    Fs.deleteTree(rebuildMarker(indexDir), c)
  }

  /** One count/max agg over the id column — parquet answers it from
    * footer stats, no data pages. maxId is -1 for an empty corpus. */
  private def srcFingerprint(emb: DataFrame): SrcFp = {
    val r = emb.agg(count(lit(1)).cast("long"),
      coalesce(max(col("vec_id")).cast("long"), lit(-1L))).head()
    SrcFp(r.getLong(0), r.getLong(1))
  }

  /** Staleness check for the derived artifact: compares the
    * fingerprint recorded at [[write]] time against `srcDir` NOW.
    * A PqIndex has no append/delete surface by design, so a corpus
    * that moved on (appends grow rows/maxId, deletes shrink rows)
    * silently under-serves until someone re-derives — this makes the
    * divergence observable ([[IvfIndex]].health's posture for the
    * mutable sibling). An index written before fingerprints (fp None)
    * reports stale: unknown provenance is treated as the unsafe
    * direction. In-place overwrites at stable vec_ids are NOT caught
    * (fingerprint is count+maxId, not a content hash — see [[SrcFp]]). */
  def health(spark: SparkSession, indexDir: String, srcDir: String): Health = {
    val meta = readMeta(indexDir, spark.sessionState.newHadoopConf())
    val src = srcFingerprint(
      spark.read.parquet(s"$srcDir/embeddings.parquet"))
    Health(meta.srcFp, src, stale = !meta.srcFp.contains(src))
  }

  /** Loud freshness gate for the search paths: a search that names its
    * source corpus refuses to serve from a stale derivation. */
  private def requireFresh(spark: SparkSession, indexDir: String,
      meta: Meta, srcDir: String): Unit = {
    val src = srcFingerprint(
      spark.read.parquet(s"$srcDir/embeddings.parquet"))
    if (!meta.srcFp.contains(src))
      throw new IllegalStateException(
        s"$indexDir: stale PqIndex — derived from ${meta.srcFp.getOrElse("<no fingerprint (pre-r17 index)>")} " +
          s"but $srcDir is now $src; codes are a derived artifact, " +
          "re-run PqIndex.write to re-derive (deterministic) before serving")
  }

  /** One job over the probe-cluster frame returning BOTH the distinct
    * probe count (the pre-flight contract variable) and the sorted
    * needed-cluster literals — the fence costs zero extra passes
    * because it rides the collect the partition pruning already pays. */
  private def neededWithProbeCount(
      probeClusters: DataFrame): (Long, IndexedSeq[Integer]) = {
    val r = probeClusters
      .agg(countDistinct(col("query_id")),
        sort_array(collect_set(col("cluster")))).head()
    (r.getLong(0),
      r.getSeq[Int](1).map(Integer.valueOf).toIndexedSeq)
  }

  /** EXACT top-k max-inner-product search (= the e01 brute force, see
    * the object doc). Probe rows are read with `probePred` pushed to
    * parquet; the ADC pass reads only (vec_id, codes, rerr) under the
    * bound's literal cluster filter; real vectors are read for the
    * shortlist only (its ids pushed into the scan — see [[rerank]]).
    * NOTE: building the returned frame RUNS the ADC job (the shortlist
    * collects on the driver, like the needed-cluster literals); the
    * returned frame itself contains only the re-rank.
    *
    * `verifySrcDir`: when given, refuse to serve from an index whose
    * source corpus moved since derivation (see [[health]]).
    * `maxShortlist`: loud ceiling on the driver-collected shortlist —
    * see [[DefaultMaxShortlist]]. */
  def searchExact(spark: SparkSession, indexDir: String, probePred: Column,
      topK: Int = 10, verifySrcDir: Option[String] = None,
      maxShortlist: Int = DefaultMaxShortlist): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.ArrayMath.register(spark)
    val meta = readMeta(indexDir, spark.sessionState.newHadoopConf())
    verifySrcDir.foreach(requireFresh(spark, indexDir, meta, _))
    val stats = IvfAnn.ClusterStats(meta.radius, meta.counts, meta.maxNorm)
    val data = spark.read.parquet(s"$indexDir/data")
    val probes = data.filter(probePred)
    val pnormCol = sqrt(graft.functions.ArrayMath.dot(
      col("embedding").cast("array<double>"),
      col("embedding").cast("array<double>")))
    val probeClusters = IvfAnn
      .probeClustersExact(probes, meta.centroids, stats, topK)
      .select(col("vec_id").as("query_id"), col("cluster"))
    // bounded probe set ⇒ the needed-list union is driver metadata;
    // literals guarantee static partition pruning (IvfIndex's pattern).
    // The probe count rides the SAME job (zero extra passes) and gates
    // the contract BEFORE the ADC job runs: the exact shortlist keeps
    // at least topK rows per probe, so more probes than
    // maxShortlist/topK cannot fit the dial even in the best case —
    // an over-contract probePred refuses here, before any driver-sized
    // work (the post-collect require in [[rerank]] backstops the
    // adaptive residual).
    val (nProbes, neededLits) = neededWithProbeCount(probeClusters)
    require(nProbes <= maxShortlist / math.max(1, topK),
      s"PqIndex probe set ($nProbes probes) cannot fit " +
        s"maxShortlist=$maxShortlist pairs at topK=$topK — " +
        "narrow probePred or raise maxShortlist deliberately")
    // ADC pass: the narrow columns ONLY — never the embedding
    val codes = data.filter(col("cluster").isin(neededLits: _*))
      .select(col("vec_id").as("cand_id"), col("codes"), col("rerr"),
        col("cluster"))
    val pairs = probeClusters.join(codes,
        probeClusters("cluster") === codes("cluster") &&
          col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("codes"), col("rerr"))
    val probeTables = probes
      .select(col("vec_id").as("query_id"),
        IvfPq.adcTableCol(meta.books).as("adc"), pnormCol.as("pnorm"))
    // the proof-carrying shortlist bound is ONE definition with the
    // in-memory path (IvfPq.boundedShortlist) — the two "provably
    // exact" implementations cannot drift
    val shortlist = IvfPq.boundedShortlist(pairs, probeTables,
      meta.books.k, meta.maxNorm, topK)
    rerank(spark, data, probes, shortlist, neededLits, topK, maxShortlist)
  }

  /** Fixed-nprobe + fixed-shortlist APPROXIMATE search — IvfPq.knn's
    * dials over the persisted layout. `verifySrcDir`/`maxShortlist`
    * as on [[searchExact]]. */
  def search(spark: SparkSession, indexDir: String, probePred: Column,
      topK: Int = 10, nprobe: Int = 4, shortlistFactor: Int = 10,
      verifySrcDir: Option[String] = None,
      maxShortlist: Int = DefaultMaxShortlist): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.ArrayMath.register(spark)
    val meta = readMeta(indexDir, spark.sessionState.newHadoopConf())
    verifySrcDir.foreach(requireFresh(spark, indexDir, meta, _))
    val data = spark.read.parquet(s"$indexDir/data")
    val probes = data.filter(probePred)
    val probeClusters = IvfAnn
      .probeClustersNearest(probes, meta.centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("cluster"))
    // fixed dials bound the shortlist EXACTLY: ≤ shortlistFactor·topK
    // per probe — the pre-flight (same job as the needed-cluster
    // collect) refuses an over-contract probePred before the ADC runs
    val (nProbes, neededLits) = neededWithProbeCount(probeClusters)
    require(nProbes * shortlistFactor.toLong * topK <= maxShortlist,
      s"PqIndex probe set ($nProbes probes × ${shortlistFactor}x$topK " +
        s"shortlist rows) exceeds maxShortlist=$maxShortlist pairs — " +
        "narrow probePred or raise maxShortlist deliberately")
    val codes = data.filter(col("cluster").isin(neededLits: _*))
      .select(col("vec_id").as("cand_id"), col("codes"), col("cluster"))
    val pairs = probeClusters.join(codes,
        probeClusters("cluster") === codes("cluster") &&
          col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("codes"))
    val probeTables = probes.select(col("vec_id").as("query_id"),
      IvfPq.adcTableCol(meta.books).as("adc"))
    val w = Window.partitionBy("query_id")
    val shortlist = pairs
      .join(broadcast(probeTables), "query_id")
      .select(col("query_id"), col("cand_id"),
        IvfPq.adcScore(meta.books.k).as("approx"))
      .withColumn("ark", row_number().over(
        w.orderBy(col("approx").desc, col("cand_id"))))
      .filter(col("ark") <= shortlistFactor * topK)
      .select("query_id", "cand_id")
    rerank(spark, data, probes, shortlist, neededLits, topK, maxShortlist)
  }

  /** Exact integer re-rank of a shortlist. The shortlist is
    * driver-sized BY CONSTRUCTION (bounded probe set × per-probe
    * shortlist — the same contract that already collects the needed
    * cluster literals), so it is collected once: its (query, cand)
    * pairs re-enter as a broadcast local frame (the ADC subtree runs
    * ONCE, not once for the collect and once for a join), and its
    * candidate ids become an isin predicate on the vectors scan —
    * cluster-partition pruning narrows to the bound's clusters,
    * row-group stats + the pushed id filter narrow WITHIN them, so
    * only shortlist rows surface from the scan (page IO stays
    * row-group granular, as with any columnar store). Probe vectors
    * read via the pushed probe predicate.
    *
    * The fence is two-stage: the callers' PRE-FLIGHT probe-count
    * require (riding the needed-cluster job — zero extra passes, and
    * it fires before the ADC job even runs) catches an over-contract
    * probePred, and the post-collect require here backstops the
    * adaptive residual (searchExact's per-probe ADC width is
    * data-dependent). A LIMIT on the collect was measured ~20% slower
    * on e19 (CollectLimitExec serializes the final stage), so the
    * normal path stays a plain fully-parallel collect. */
  private def rerank(spark: SparkSession, data: DataFrame, probes: DataFrame,
      shortlist: DataFrame, neededLits: IndexedSeq[Integer],
      topK: Int, maxShortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairsLocal = shortlist
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(pairsLocal.length <= maxShortlist,
      s"PqIndex re-rank shortlist exceeded maxShortlist=$maxShortlist " +
        "(query,cand) pairs — the probe predicate selects more probes " +
        "than the bounded-probe-set contract allows; narrow probePred " +
        "or raise maxShortlist deliberately (driver cost is " +
        "~16 bytes/pair)")
    import spark.implicits._
    val local = broadcast(
      spark.createDataset(pairsLocal.toSeq).toDF("query_id", "cand_id"))
    val candIds = pairsLocal.map(_._2).distinct.sorted
      .map(java.lang.Long.valueOf).toIndexedSeq
    // an empty probe set yields an empty shortlist — isin() with zero
    // values is malformed, so short-circuit the filter instead
    val idFilter =
      if (candIds.isEmpty) lit(false)
      else col("vec_id").isin(candIds: _*)
    val qvs = data
      .filter(col("cluster").isin(neededLits: _*) && idFilter)
      .select(col("vec_id").as("cand_id"), expr(IvfAnn.quant).as("qv"))
    val pqs = probes
      .select(col("vec_id").as("query_id"), expr(IvfAnn.quant).as("pq"))
    val w = Window.partitionBy("query_id")
    local
      .join(broadcast(pqs), "query_id")
      .join(qvs, "cand_id")
      .select(col("query_id"), col("cand_id"),
        IvfAnn.qdot("pq", "qv").as("dot"))
      .withColumn("rnk", row_number().over(
        w.orderBy(col("dot").desc, col("cand_id"))).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }

  private def writeMeta(indexDir: String, meta: Meta, c: Configuration): Unit = {
    val root = mapper.createObjectNode()
    root.put("coarse_k", meta.coarseK)
    root.put("dim", meta.dim)
    IndexMetaJson.putCommon(root, meta.maxNorm, meta.centroids,
      meta.radius, meta.counts)
    root.put("pq_m", meta.books.m)
    root.put("pq_k", meta.books.k)
    root.put("pq_subdim", meta.books.subDim)
    meta.srcFp.foreach { fp =>
      root.put("src_rows", fp.rows)
      root.put("src_max_id", fp.maxId)
    }
    val bn = root.putArray("codebooks")
    meta.books.books.foreach { book =>
      val ba = bn.addArray()
      book.foreach { cw => val a = ba.addArray(); cw.foreach(a.add) }
    }
    Fs.writeStringAtomic(s"$indexDir/meta.json",
      mapper.writeValueAsString(root), c)
  }

  def readMeta(indexDir: String, c: Configuration): Meta = {
    if (Fs.exists(rebuildMarker(indexDir), c))
      throw new IllegalStateException(
        s"$indexDir: interrupted PqIndex.write (REBUILDING marker present) " +
          "— data and meta may be mixed-generation (codes under stale " +
          "codebooks prune incorrectly); re-run PqIndex.write to converge " +
          "(training is deterministic) before searching")
    val root = mapper.readTree(Fs.readString(s"$indexDir/meta.json", c))
    val bn = root.get("codebooks")
    val books = (0 until bn.size()).map { mi =>
      val ba = bn.get(mi)
      (0 until ba.size()).map(ki => IndexMetaJson.doubles(ba.get(ki))).toSeq
    }.toSeq
    val srcFp =
      if (root.has("src_rows") && root.has("src_max_id"))
        Some(SrcFp(root.get("src_rows").asLong(),
          root.get("src_max_id").asLong()))
      else None // pre-fingerprint index: health()/requireFresh treat as stale
    Meta(root.get("coarse_k").asInt(), root.get("dim").asInt(),
      root.get("maxNorm").asDouble(), IndexMetaJson.centroids(root),
      IndexMetaJson.doubles(root.get("radius")),
      IndexMetaJson.longs(root.get("counts")),
      IvfPq.Codebooks(root.get("pq_m").asInt(), root.get("pq_k").asInt(),
        root.get("pq_subdim").asInt(), books), srcFp)
  }
}
