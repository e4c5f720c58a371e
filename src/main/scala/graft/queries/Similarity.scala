package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection and similarity search — the scale-critical
  * LLM-pipeline operators (none exist in the reference; SURVEY.md §2.7).
  *
  * Shuffle-bounded designs (the 100 TB contract):
  *   - MinHash-LSH (m01): per-doc signatures are per-row expressions;
  *     candidate generation joins on (band, band-hash) — only documents
  *     sharing a band bucket ever meet. No all-pairs product anywhere.
  *   - Inverted-index Jaccard (m02): pairs meet through a shared shingle
  *     (explode + self-join on the shingle), so complexity is bounded by
  *     shingle-bucket sizes, not n².
  *   - KNN (e01): the probe set is a bounded constant — explicitly
  *     broadcast; the corpus side streams. One pass, one shuffle for the
  *     per-probe top-k.
  *   - Centroids (e02): posexplode + groupBy(label, dim) with map-side
  *     combine — the IVF build step at scale.
  *
  * Determinism: all similarity math is exact-integer. Embeddings are
  * quantized floor(x·2^20) (power-of-two scaling is exact in double, so
  * both engines floor the same value); jaccard is integer permille;
  * MinHash uses md5 hex, identical across engines.
  */
object Similarity {
  import QueryDef.table

  /** The m01 shingle/minhash/band scheme is defined ONCE, in
    * [[graft.operators.MinHashIndex]] (it also keys that operator's
    * persisted artifacts); this alias keeps the streaming operators'
    * batch-verify companions (StreamingMinHash.verifyCollisions) on
    * the same definition. */
  private[graft] def shingles: String =
    graft.operators.MinHashIndex.shingleExpr

  /** Quantized embedding — floor(x·2^20) per element, exact in double.
    * ONE definition, owned by [[graft.operators.IvfAnn]] (the
    * shingleExpr pattern): the queries here are the ORACLES of the IVF
    * operators, so the two sides must be structurally unable to drift. */
  private def quant: String = graft.operators.IvfAnn.quant

  /** e21's arithmetic — ONE definition shared with
    * [[graft.report.DataCard.embeddingDrift]] (driftFromCounts'
    * pattern: the oracled query and the two-snapshot API cannot
    * drift). Input: (is_old: boolean, embedding) rows; output: per-dim
    * quantized means + signed delta, exact integers (integer MEANS,
    * not cross products — BIGINT-safe to ~4·10¹² vectors). One scan →
    * posexplode → dim-keyed map-side-combined aggregate. */
  private[graft] def embeddingDriftCore(
      tagged: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    tagged.select(col("is_old"),
        posexplode(expr(quant)).as(Seq("pos", "v")))
      .groupBy((col("pos") + 1).as("dim"))
      .agg(sum(when(col("is_old"), col("v")).otherwise(0L)).as("old_sum"),
        sum(when(!col("is_old"), col("v")).otherwise(0L)).as("new_sum"),
        sum(when(col("is_old"), 1L).otherwise(0L)).as("old_n"),
        sum(when(!col("is_old"), 1L).otherwise(0L)).as("new_n"))
      .select(col("dim").cast("bigint").as("dim"),
        expr("""cast(CASE WHEN old_n > 0 THEN old_sum div old_n
                          ELSE 0 END as bigint)""").as("old_mean_q"),
        expr("""cast(CASE WHEN new_n > 0 THEN new_sum div new_n
                          ELSE 0 END as bigint)""").as("new_mean_q"),
        expr("""cast((CASE WHEN new_n > 0 THEN new_sum div new_n ELSE 0 END)
                   - (CASE WHEN old_n > 0 THEN old_sum div old_n ELSE 0 END)
                    as bigint)""").as("delta_q"))
      .orderBy("dim")
  /** Exact integer dot product of two quantized vectors. */
  private def qdot(a: String, b: String): org.apache.spark.sql.Column =
    graft.operators.IvfAnn.qdot(a, b)

  /** Brute-force top-10-by-quantized-dot for the 8 fixed probes — the
    * shared DuckDB oracle of e01 and of the exact-mode ANN paths
    * (e03/e05/e06), whose outputs provably (e05/e06) or spec-pinnedly
    * (e03) equal it. */
  private val knnOracle = """
        WITH q AS (
          SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        probes AS (SELECT vec_id AS query_id, qv AS pq FROM q WHERE vec_id < 8),
        dots AS (
          SELECT query_id, c.vec_id AS cand_id,
                 CAST(list_sum([pq[i] * c.qv[i] for i in range(1, len(pq)+1)]) AS BIGINT) AS dot
          FROM probes p JOIN q c ON p.query_id <> c.vec_id)
        SELECT query_id, cand_id, dot,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS rnk
        FROM dots QUALIFY rnk <= 10 ORDER BY query_id, rnk"""

  /** Brute-force "all candidates with 4·dot ≥ self-dot" for the 8
    * fixed probes — the shared oracle of e20 (in-memory rangeSearch)
    * and e22 (persisted IvfIndex.searchRange), both provably this
    * filter. */
  private val rangeOracle = """
        WITH q AS (
          SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        probes AS (
          SELECT vec_id AS query_id, qv AS pq,
                 CAST(list_sum([qv[i] * qv[i] for i in range(1, len(qv)+1)]) AS BIGINT) AS qself
          FROM q WHERE vec_id < 8)
        SELECT query_id, c.vec_id AS cand_id,
               CAST(list_sum([pq[i] * c.qv[i] for i in range(1, len(pq)+1)]) AS BIGINT) AS dot
        FROM probes p JOIN q c ON p.query_id <> c.vec_id
        WHERE 4 * CAST(list_sum([pq[i] * c.qv[i] for i in range(1, len(pq)+1)]) AS BIGINT) >= qself
        ORDER BY query_id, cand_id"""

  /** Shared shingle-set frame: doc_id, sh. */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    QueryDef.spread(spark, dir, "documents").select(col("doc_id"), expr(shingles).as("sh"))

  /** Candidate-pair stats (doc_a, doc_b, common, na, nb) over the shared
    * shingle inverted index — the skeleton of both m02 (symmetric
    * Jaccard) and m03 (asymmetric containment): docs meet only through
    * a shared shingle, never an all-pairs product. The shingle frame is
    * consumed three times (explode + both size joins) — persisted once,
    * released by the harness. */
  private def ngramPairStats(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    QueryDef.deferCleanup(() => { sh.unpersist(blocking = true); () })
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    ex.as("x").join(ex.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sh.select(col("doc_id").as("doc_a"),
        expr("size(sh)").cast("bigint").as("na")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"),
        expr("size(sh)").cast("bigint").as("nb")), "doc_b")
  }

  /** (doc_id, bi, bh) band-bucket frame of the m01 LSH scheme — the
    * candidate-generation key, SQL side. Exposed so the streaming
    * operator's Scala re-implementation can be parity-pinned against it
    * (StreamingMinHashSpec). */
  private[graft] def minhashBands(spark: SparkSession, dir: String): DataFrame =
    graft.operators.MinHashIndex.bands(shingled(spark, dir))

  /** Shared bench-scratch helpers (ONE definition across the query
    * modules — see QueryDef). */
  /** ONE definition of the verified cross-corpus near-dup PAIR
    * relation (eval_id, train_id, j) — the oracled m07 aggregates it
    * per eval doc and `Curate --decontaminate` flips the train ids it
    * names, so the screening rule and the query cannot drift. Inputs
    * are (doc_id, text) frames; the scheme is m01's
    * (MinHashIndex.signatures/bands), the band join is restricted to
    * train×eval, and the Jaccard verify is fenced so array_intersect
    * runs once per distinct pair (m01's lesson). `cleanup` receives
    * the persisted signature frames' release thunks (the dupClustersOf
    * convention — queries defer to the harness, Curate to its own
    * cleanup list). */
  private[graft] def crossNearDupPairs(train: DataFrame, eval: DataFrame,
      cleanup: (() => Unit) => Unit): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shT = graft.operators.MinHashIndex.signatures(train).persist(lvl)
    val shE = graft.operators.MinHashIndex.signatures(eval).persist(lvl)
    cleanup(() => { shT.unpersist(blocking = true); () })
    cleanup(() => { shE.unpersist(blocking = true); () })
    val tb = graft.operators.MinHashIndex.bands(shT)
      .select(col("doc_id").as("train_id"), col("bi"), col("bh"))
    val eb = graft.operators.MinHashIndex.bands(shE)
      .select(col("doc_id").as("eval_id"),
        col("bi").as("bi2"), col("bh").as("bh2"))
    val pairs = tb.join(eb,
        col("bi") === col("bi2") && col("bh") === col("bh2"))
      .select("eval_id", "train_id").distinct()
    pairs
      .join(shE.select(col("doc_id").as("eval_id"), col("sh").as("sh_e")),
        "eval_id")
      .join(shT.select(col("doc_id").as("train_id"), col("sh").as("sh_t")),
        "train_id")
      .select(col("eval_id"), col("train_id"),
        graft.functions.OptimizerBarrier.fence(
          expr("size(array_intersect(sh_e, sh_t))").cast("bigint"))
          .as("common"),
        expr("size(sh_e)").cast("bigint").as("ne"),
        expr("size(sh_t)").cast("bigint").as("nt"))
      .select(col("eval_id"), col("train_id"),
        expr("common * 1000 div (ne + nt - common)").as("j"))
      .filter(col("j") >= 500)
  }

  /** e09's oracle: the all-pairs exact kNN graph in the same quantized
    * integer arithmetic as the Spark side. ALSO the oracle for e12b: at
    * the driver's gate SF (sf0.01, n = 500 embeddings) the scale dial
    * is provably exact — k = ⌊√500⌋ = 22 centroids ≤ nprobe = 36, so
    * every probe visits every inverted list and the "approximate" graph
    * IS the exact one (KnnGraphApproxSpec asserts the bit-equality; the
    * oracle makes a dial regression driver-visible too). At SFs where
    * ⌊√n⌋ > nprobe the dial genuinely prunes and this SQL would NOT
    * match — the correctness gate runs at sf0.01 by contract. */
  private val knnGraphOracle: String = """
        WITH q AS (
          SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        dots AS (
          SELECT p.vec_id AS query_id, c.vec_id AS cand_id,
                 CAST(list_sum([p.qv[i] * c.qv[i] for i in range(1, len(p.qv)+1)]) AS BIGINT) AS dot
          FROM q p JOIN q c ON p.vec_id <> c.vec_id)
        SELECT query_id, cand_id, dot,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS rnk
        FROM dots QUALIFY rnk <= 5 ORDER BY query_id, rnk"""

  /** e23's oracle: e09's all-pairs exact kNN graph, then 10 unrolled
    * MATERIALIZED PageRank rounds (the closureCtes technique). Every
    * aggregate is CAST (DuckDB SUM(BIGINT) promotes to HUGEINT — the
    * d25 lesson) and `//` matches Spark's `div` truncation exactly. */
  private val pagerankOracle: String = {
    val rounds = 10
    val steps = (1 to rounds).map { i =>
      s"""
        s$i AS MATERIALIZED (
          SELECT n.vec_id,
                 150000 + CAST(COALESCE(SUM(p.score // d.deg), 0) AS BIGINT)
                   * 17 // 20 AS score
          FROM n
          LEFT JOIN e ON e.dst = n.vec_id
          LEFT JOIN s${i - 1} p ON p.vec_id = e.src
          LEFT JOIN deg d ON d.src = e.src
          GROUP BY n.vec_id)"""
    }.mkString(",")
    s"""
        WITH q AS MATERIALIZED (
          SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        g AS MATERIALIZED (
          SELECT query_id, cand_id FROM (
            SELECT p.vec_id AS query_id, c.vec_id AS cand_id,
                   CAST(list_sum([p.qv[i] * c.qv[i] for i in range(1, len(p.qv)+1)]) AS BIGINT) AS dot
            FROM q p JOIN q c ON p.vec_id <> c.vec_id)
          QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) <= 5),
        e AS MATERIALIZED (SELECT query_id AS src, cand_id AS dst FROM g),
        deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
        n AS MATERIALIZED (SELECT DISTINCT src AS vec_id FROM e),
        s0 AS MATERIALIZED (SELECT vec_id, CAST(1000000 AS BIGINT) AS score FROM n),$steps
        SELECT vec_id, CAST(score AS BIGINT) AS score FROM s$rounds ORDER BY vec_id"""
  }

  private def rmTree(path: String): Unit = QueryDef.rmTree(path)

  /** Build (once per process per sf dir) the persisted IVF index used
    * by the prebuilt-index entries (e13b/e14/e17) — p03's generate-once
    * pattern: e13 pays the build every pass by design (the honest
    * end-to-end), these entries measure what the layout amortizes to.
    * The index lives in a PROCESS-OWNED temp directory (removed on JVM
    * exit) so other processes can never serve or collide with it, and
    * the cache key carries the source table's file stamp so a
    * regeneration WITHIN this JVM rebuilds instead of serving stale —
    * e14 is rows-only, so staleness would be silently wrong, not
    * oracle-red. */
  private val benchIndexDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def benchIndex(spark: SparkSession, dir: String): String =
    QueryDef.cachedArtifact(benchIndexDirs, dir, "embeddings",
      "graft_ivfindex_bench_") { out =>
      graft.operators.IvfIndex.write(spark, dir, out)
    }

  /** Prebuilt persisted IVF index under the SCALE dial (k = ⌊√n⌋
    * clusters — e12b's seeding applied to the persisted layout),
    * benchIndex's generate-once pattern. e14 searches it with the
    * fixed production nprobe: while ⌊√n⌋ ≤ nprobe every inverted list
    * is probed and searchApprox is PROVABLY searchExact (which is
    * provably the brute force), so the e01 oracle is a true gate at
    * sf0.01 — the e12b promotion trick; above that the dial genuinely
    * prunes (oracleMaxSf + IvfIndexSpec's recall floor take over). */
  private val benchScaleIndexDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def benchScaleIndex(spark: SparkSession, dir: String): String =
    QueryDef.cachedArtifact(benchScaleIndexDirs, dir, "embeddings",
      "graft_ivfindex_scale_bench_") { out =>
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val k = math.max(1, math.sqrt(n.toDouble).toInt)
      graft.operators.IvfIndex.write(spark, dir, out, k = k)
    }

  /** Prebuilt persisted IVF-PQ index (operators.PqIndex), benchIndex's
    * generate-once pattern: e19 measures the amortized exact PQ search
    * — the narrow-column ADC scan + bounded shortlist re-rank a
    * deployment pays per query once the codes artifact exists. */
  private val benchPqIndexDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def benchPqIndex(spark: SparkSession, dir: String): String =
    QueryDef.cachedArtifact(benchPqIndexDirs, dir, "embeddings",
      "graft_pqindex_bench_") { out =>
      graft.operators.PqIndex.write(spark, dir, out)
    }

  /** Prebuilt MinHash band index over the m04 base split (doc_id % 5
    * != 0), benchIndex's generate-once pattern for the text side: m04
    * pays build+probe every pass (the honest one-off), m04b measures
    * what the persisted BUCKETED layout amortizes to — the per-batch
    * probe cost a continuously-ingesting deployment actually pays. */
  private val benchMhIndexDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def benchMhIndex(spark: SparkSession, dir: String): String =
    QueryDef.cachedArtifact(benchMhIndexDirs, dir, "documents",
      "graft_mhindex_bench_once_", suffix = "/idx") { out =>
      graft.operators.MinHashIndex.write(spark,
        QueryDef.spread(spark, dir, "documents")
          .filter(col("doc_id") % 5 =!= 0), out)
    }

  /** Local recursive dir copy for the compaction bench entries: each
    * pass compacts a FRESH copy of the process-cached streamed index
    * (compaction converts the layout in place, so the cached original
    * must stay streamed). Bench/verify scratch is local-FS by
    * construction (same posture as every temp-dir pattern here). */
  private def copyTree(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    // Files.walk holds open directory handles until CLOSED — leaked
    // per bench pass they accumulate toward fd caps on CI hosts
    val walk = java.nio.file.Files.walk(s)
    try walk.forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t)
        ()
      }
    } finally walk.close()
  }

  /** Process-cached STREAMING-layout IVF index over the full embeddings
    * table, ingested in 3 micro-batches — the fixture the e16
    * compaction entry copies and finalizes each pass. Centroids train
    * on the same corpus as [[benchIndex]], so the compacted index is
    * the batch-layout index e13 builds directly. */
  private val benchStreamedIvfDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def benchStreamedIvfIndex(spark: SparkSession, dir: String): String =
    QueryDef.cachedArtifact(benchStreamedIvfDirs, dir, "embeddings",
      "graft_ivfstream_bench_", suffix = "/idx") { out =>
      graft.operators.IvfIndex.initStreaming(spark, dir, out)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      (0 to 2).foreach { b =>
        graft.operators.IvfIndex.appendBatch(spark,
          emb.filter(col("vec_id") % 3 === b), out, b.toLong)
      }
    }

  /** Process-cached STREAMING-layout MinHash index over the m04 base
    * split, ingested in 3 micro-batches — the m05 compaction fixture. */
  private val benchStreamedMhDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def benchStreamedMhIndex(spark: SparkSession, dir: String): String =
    QueryDef.cachedArtifact(benchStreamedMhDirs, dir, "documents",
      "graft_mhstream_bench_", suffix = "/idx") { out =>
      val base = QueryDef.spread(spark, dir, "documents")
        .filter(col("doc_id") % 5 =!= 0)
      (0 to 2).foreach { b =>
        graft.operators.MinHashIndex.appendBatch(spark,
          graft.operators.MinHashIndex.signatures(
            base.filter(col("doc_id") % 3 === b)), out, b.toLong)
      }
    }

  /** m04/m04b shared oracle: the DIRECT cross-split m01-scheme
    * computation — one definition, so the build+probe and probe-only
    * entries cannot drift. */
  private val m04Oracle = """
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        shn AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' ')))
            ELSE list_distinct(tk) END AS sh
          FROM tkn),
        mhs AS (
          SELECT doc_id, sh,
            [list_min(list_transform(sh, s -> md5(k || ':' || s))) for k in [0,1,2,3,4,5]] AS mh
          FROM shn),
        bands AS (
          SELECT doc_id, sh,
            unnest([md5(mh[1]||mh[2]), md5(mh[3]||mh[4]), md5(mh[5]||mh[6])]) AS bh,
            unnest([0,1,2]) AS bi
          FROM mhs),
        cand AS (
          SELECT DISTINCT b.doc_id AS batch_id, a.doc_id AS base_id,
                 len(list_intersect(a.sh, b.sh)) AS common,
                 len(a.sh) AS na, len(b.sh) AS nb
          FROM bands a JOIN bands b
            ON a.bi = b.bi AND a.bh = b.bh
           AND a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0)
        SELECT batch_id, base_id,
               CAST(common * 1000 // (na + nb - common) AS BIGINT) AS jaccard_permille
        FROM cand
        WHERE common * 1000 // (na + nb - common) >= 500
        ORDER BY batch_id, base_id"""

  val defs: Map[String, QueryDef] = Map(
    // ---------------------------------------------------------------- m01
    // MinHash-LSH near-dedup: 6 MinHashes → 3 bands of 2 → candidates
    // share a band bucket → verify true Jaccard ≥ 500 permille.
    "m01_minhash_lsh_neardup" -> QueryDef(
      build = (spark, dir) => {
        // Candidate generation joins (doc_id, band, band-hash) ONLY —
        // ~50-byte rows, so even a giant exact-duplicate bucket is a
        // cheap (AQE-splittable) skew, never a shuffle of document
        // content. Shingle sets are joined back in exactly once per
        // DISTINCT candidate pair, so the expensive array_intersect
        // runs once per pair instead of once per (pair × band).
        // Shingling (tokenize + 3-gram + distinct) is the CPU-dominant
        // step and the frame is consumed three times (band generation +
        // both sides of the verify join) — persist it once rather than
        // recompute; at scale this is the standard signature-table
        // materialization (MEMORY_AND_DISK spills instead of OOMing).
        val sh = shingled(spark, dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the returned plan is lazy over sh, so the release has to wait
        // for the caller's materialization — harness-drained cleanup
        QueryDef.deferCleanup(() => { sh.unpersist(blocking = true); () })
        val bands = graft.operators.MinHashIndex.bands(sh)
        val pairs = bands.select(col("doc_id").as("doc_a"), col("bi"), col("bh"))
          .join(bands.select(col("doc_id").as("doc_b"), col("bi").as("bi2"), col("bh").as("bh2")),
            col("bi") === col("bi2") && col("bh") === col("bh2") &&
              col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b")
          .distinct()
        pairs
          .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
          // `common` is FENCED (OptimizerBarrier's Project-alias
          // pattern): unfenced, the jaccard filter collapses into the
          // payload-join condition where array_intersect — the most
          // expensive op of the whole pipeline — is evaluated twice,
          // plus once more in the output projection. Fenced, the
          // intersect runs exactly once per distinct pair and the
          // filter tests the attribute in the same codegen stage.
          .select(col("doc_a"), col("doc_b"),
            graft.functions.OptimizerBarrier.fence(
              expr("size(array_intersect(sh_a, sh_b))").cast("bigint")).as("common"),
            expr("size(sh_a)").cast("bigint").as("na"),
            expr("size(sh_b)").cast("bigint").as("nb"))
          .select(col("doc_a"), col("doc_b"),
            expr("common * 1000 div (na + nb - common)").as("jaccard_permille"))
          .filter(col("jaccard_permille") >= 500)
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        shn AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' ')))
            ELSE list_distinct(tk) END AS sh
          FROM tkn),
        mhs AS (
          SELECT doc_id, sh,
            [list_min(list_transform(sh, s -> md5(k || ':' || s))) for k in [0,1,2,3,4,5]] AS mh
          FROM shn),
        bands AS (
          SELECT doc_id, sh,
            unnest([md5(mh[1]||mh[2]), md5(mh[3]||mh[4]), md5(mh[5]||mh[6])]) AS bh,
            unnest([0,1,2]) AS bi
          FROM mhs),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.sh, b.sh)) AS common,
                 len(a.sh) AS na, len(b.sh) AS nb
          FROM bands a JOIN bands b
            ON a.bi = b.bi AND a.bh = b.bh AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(common * 1000 // (na + nb - common) AS BIGINT) AS jaccard_permille
        FROM cand
        WHERE common * 1000 // (na + nb - common) >= 500
        ORDER BY doc_a, doc_b"""),
      headline = true),

    // ---------------------------------------------------------------- m02
    // Ground-truth n-gram Jaccard pairs via inverted index: documents
    // meet only through a shared shingle (no all-pairs). The LSH recall
    // spec (SimilaritySpec) checks m01 against this.
    // ---------------------------------------------------------------- m07
    // Cross-corpus near-dup contamination: which EVAL documents have a
    // near-duplicate in the TRAIN corpus — the fuzzy-level complement
    // of c03/c18's exact 13-gram screens (a paraphrased or
    // lightly-edited benchmark item passes an exact n-gram screen but
    // not this one). Same LSH scheme as m01 (ONE definition via
    // MinHashIndex.bands) with the band join RESTRICTED to
    // train×eval — within-corpus pairs never form, so the candidate
    // volume is driven by cross-corpus collisions only (in production
    // the eval side is benchmark-sized; this shape broadcasts it).
    // Output is per-eval-doc: match count + the best-matching train
    // doc (highest Jaccard, ties to the smaller id — c20's max(struct)
    // argmax, never a per-group window). The deterministic two-corpus
    // stand-in is the d25/c23 parity convention (even = train,
    // odd = eval).
    "m07_cross_corpus_neardup" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        val verified = crossNearDupPairs(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          f => QueryDef.deferCleanup(f))
        verified.groupBy("eval_id")
          .agg(count(lit(1)).as("n_train_matches"),
            max(struct(col("j"), (-col("train_id")).as("nid"))).as("best"))
          .select(col("eval_id"), col("n_train_matches"),
            (-col("best.nid")).as("best_train_id"),
            col("best.j").as("best_jaccard_permille"))
          .orderBy("eval_id")
      },
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        shn AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' ')))
            ELSE list_distinct(tk) END AS sh
          FROM tkn),
        mhs AS (
          SELECT doc_id, sh,
            [list_min(list_transform(sh, s -> md5(k || ':' || s))) for k in [0,1,2,3,4,5]] AS mh
          FROM shn),
        bands AS (
          SELECT doc_id, sh,
            unnest([md5(mh[1]||mh[2]), md5(mh[3]||mh[4]), md5(mh[5]||mh[6])]) AS bh,
            unnest([0,1,2]) AS bi
          FROM mhs),
        cand AS (
          SELECT DISTINCT b.doc_id AS eval_id, a.doc_id AS train_id,
                 len(list_intersect(a.sh, b.sh)) AS common,
                 len(a.sh) AS nt, len(b.sh) AS ne
          FROM bands a JOIN bands b
            ON a.bi = b.bi AND a.bh = b.bh
           AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
        ver AS (
          SELECT eval_id, train_id,
                 common * 1000 // (ne + nt - common) AS j
          FROM cand WHERE common * 1000 // (ne + nt - common) >= 500),
        r AS (
          SELECT eval_id, train_id, j,
                 ROW_NUMBER() OVER (PARTITION BY eval_id
                                    ORDER BY j DESC, train_id) AS rn
          FROM ver),
        agg AS (
          SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_train_matches
          FROM ver GROUP BY eval_id)
        SELECT agg.eval_id, agg.n_train_matches,
               r.train_id AS best_train_id,
               CAST(r.j AS BIGINT) AS best_jaccard_permille
        FROM agg JOIN r ON r.eval_id = agg.eval_id AND r.rn = 1
        ORDER BY agg.eval_id""")),

    "m02_ngram_jaccard_pairs" -> QueryDef(
      build = (spark, dir) =>
        ngramPairStats(spark, dir)
          .select(col("doc_a"), col("doc_b"),
            expr("common * 1000 div (na + nb - common)").as("jaccard_permille"))
          .filter(col("jaccard_permille") >= 500)
          .orderBy("doc_a", "doc_b"),
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        shn AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' ')))
            ELSE list_distinct(tk) END AS sh
          FROM tkn),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM shn),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               CAST(common * 1000 // (len(x.sh) + len(y.sh) - common) AS BIGINT) AS jaccard_permille
        FROM pairs JOIN shn x ON x.doc_id = doc_a JOIN shn y ON y.doc_id = doc_b
        WHERE common * 1000 // (len(x.sh) + len(y.sh) - common) >= 500
        ORDER BY doc_a, doc_b""")),

    // ---------------------------------------------------------------- m03
    // Asymmetric CONTAINMENT pairs (Broder's containment coefficient,
    // |A∩B|/|A| per direction): catches subset-duplication — a doc
    // quoted or embedded whole inside a larger one — which symmetric
    // Jaccard misses (a 10-shingle doc inside a 200-shingle doc has
    // containment 1.0 but Jaccard < 0.05). Same inverted-index shape
    // as m02 (docs meet only through shared shingles; no all-pairs).
    // On the driver's synthetic corpus near-dups are symmetric edits,
    // so m03's relation coincides with m02's there — the oracle proves
    // cross-engine parity, and SimilaritySpec's crafted contained-doc
    // fixture pins the asymmetric semantics Jaccard can't see.
    "m03_containment_pairs" -> QueryDef(
      build = (spark, dir) =>
        ngramPairStats(spark, dir)
          .select(col("doc_a"), col("doc_b"), col("common"), col("na"), col("nb"),
            expr("common * 1000 div na").as("cont_a"),
            expr("common * 1000 div nb").as("cont_b"))
          .filter(greatest(col("cont_a"), col("cont_b")) >= 900)
          .orderBy("doc_a", "doc_b"),
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        shn AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' ')))
            ELSE list_distinct(tk) END AS sh
          FROM tkn),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM shn),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sc AS (
          SELECT doc_a, doc_b, common,
                 CAST(len(x.sh) AS BIGINT) AS na, CAST(len(y.sh) AS BIGINT) AS nb,
                 CAST(common * 1000 // len(x.sh) AS BIGINT) AS cont_a,
                 CAST(common * 1000 // len(y.sh) AS BIGINT) AS cont_b
          FROM pairs JOIN shn x ON x.doc_id = doc_a JOIN shn y ON y.doc_id = doc_b)
        SELECT doc_a, doc_b, common, na, nb, cont_a, cont_b
        FROM sc WHERE greatest(cont_a, cont_b) >= 900
        ORDER BY doc_a, doc_b""")),

    // ---------------------------------------------------------------- m04
    // Incremental near-dedup against a PERSISTED MinHash band index
    // (operators/MinHashIndex.scala) — the near-dup sibling of c10
    // (incremental exact digests) and e13 (persisted vector index): the
    // corpus's band buckets and shingle signatures live as parquet
    // tables; a new batch (doc_id % 5 == 0 stands in, 20% of the
    // corpus) is answered by joining its bands against the index and
    // reranking candidates with true Jaccard — corpus LSH is never
    // recomputed and corpus text never moves. The oracle is the DIRECT
    // cross-split m01-scheme computation, so a green hash proves the
    // persisted round trip loses nothing. End-to-end by design (index
    // build + probe), like e13. Non-vacuous: 14 pairs at sf0.01 with
    // jaccard 900–989 permille (no trivial self-copies).
    "m04_incremental_neardup" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        // per-pass temp scratch (e13's pattern): no shared literal path
        // for concurrent drivers on one machine to collide on
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft_mhindex_bench_").toString + "/idx"
        QueryDef.deferCleanup(() => rmTree(new java.io.File(idxDir).getParent))
        graft.operators.MinHashIndex.write(spark,
          docs.filter(col("doc_id") % 5 =!= 0), idxDir)
        val batchSigs = graft.operators.MinHashIndex
          .signatures(docs.filter(col("doc_id") % 5 === 0))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        QueryDef.deferCleanup(() => { batchSigs.unpersist(blocking = true); () })
        graft.operators.MinHashIndex.probe(spark, idxDir, batchSigs)
          .orderBy("batch_id", "base_id")
      },
      oracle = Some(m04Oracle)),

    // ---------------------------------------------------------------- m04b
    // The AMORTIZED side of m04 (e13b's pattern on the text side):
    // probe-only against a PREBUILT persisted band index — built once
    // per process, bands bucketed by the full join key so the probe
    // never shuffles the index side. m04 times the honest one-off
    // (build + probe); this entry is the per-batch cost a continuously
    // ingesting deployment actually pays. Same oracle (the probe
    // result is a pure function of the corpus split).
    "m04b_incremental_neardup_probe_only" -> QueryDef(
      build = (spark, dir) => {
        val idxDir = benchMhIndex(spark, dir)
        val batchSigs = graft.operators.MinHashIndex
          .signatures(QueryDef.spread(spark, dir, "documents")
            .filter(col("doc_id") % 5 === 0))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        QueryDef.deferCleanup(() => { batchSigs.unpersist(blocking = true); () })
        graft.operators.MinHashIndex.probe(spark, idxDir, batchSigs)
          .orderBy("batch_id", "base_id")
      },
      oracle = Some(m04Oracle),
      headline = true),

    // ---------------------------------------------------------------- m05
    // The MAINTENANCE cost a streaming MinHash deployment pays
    // periodically: compactStreaming converts the per-batch-dir layout
    // (the idempotent-commit trade) into the bucketed batch layout,
    // collapsing accumulated small files and buying every later probe
    // its shuffle-free index side. Each pass copies the process-cached
    // streamed index (3 micro-batches over the m04 base split; the
    // copy is the cheap part) and times compact + one probe. The probe
    // result is the same pure function of the corpus split as m04, so
    // the same oracle proves the compaction lost nothing.
    "m05_mhindex_compact_probe" -> QueryDef(
      build = (spark, dir) => {
        val streamed = benchStreamedMhIndex(spark, dir)
        val scratch = java.nio.file.Files
          .createTempDirectory("graft_mhcompact_bench_").toString
        QueryDef.deferCleanup(() => rmTree(scratch))
        val idx = s"$scratch/idx"
        copyTree(streamed, idx)
        graft.operators.MinHashIndex.compactStreaming(spark, idx)
        val batchSigs = graft.operators.MinHashIndex
          .signatures(QueryDef.spread(spark, dir, "documents")
            .filter(col("doc_id") % 5 === 0))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        QueryDef.deferCleanup(() => { batchSigs.unpersist(blocking = true); () })
        graft.operators.MinHashIndex.probe(spark, idx, batchSigs)
          .orderBy("batch_id", "base_id")
      },
      oracle = Some(m04Oracle),
      headline = true),

    // ---------------------------------------------------------------- m06
    // Takedown path, text side: retract base docs (doc_id % 25 == 17 —
    // a subset of the base split, chosen to INTERSECT the m04 pair set
    // so the retraction is verified non-vacuously: 2 of the 14 sf0.01
    // pairs vanish) from a COPY of the prebuilt index
    // via tombstones, then probe. The oracle is m04's direct
    // computation with the retracted docs excluded from the base side
    // — a green hash proves the tombstone anti-join retracts exactly
    // (not one pair more or fewer). Not headline: delete cost is
    // O(takedown batch), the probe cost is m04b's.
    "m06_neardup_post_delete" -> QueryDef(
      build = (spark, dir) => {
        val streamed = benchMhIndex(spark, dir)
        val scratch = java.nio.file.Files
          .createTempDirectory("graft_mhdelete_bench_").toString
        QueryDef.deferCleanup(() => rmTree(scratch))
        val idx = s"$scratch/idx"
        copyTree(streamed, idx)
        val docs = QueryDef.spread(spark, dir, "documents")
        graft.operators.MinHashIndex.delete(spark, idx,
          docs.filter(col("doc_id") % 25 === 17).select("doc_id"))
        val batchSigs = graft.operators.MinHashIndex
          .signatures(docs.filter(col("doc_id") % 5 === 0))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        QueryDef.deferCleanup(() => { batchSigs.unpersist(blocking = true); () })
        graft.operators.MinHashIndex.probe(spark, idx, batchSigs)
          .orderBy("batch_id", "base_id")
      },
      oracle = Some(m04Oracle.replace(
        "a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0",
        "a.doc_id % 5 <> 0 AND a.doc_id % 25 <> 17 AND b.doc_id % 5 = 0"))),

    // ---------------------------------------------------------------- e17
    // Takedown path, vector side: tombstone vec_id % 7 == 3 in a copy
    // of the prebuilt IVF index, then exact-search. Deleted vectors
    // vanish as probes AND candidates, and the pruning counts are
    // subtracted from the tombstones' stored clusters — the oracle is
    // the brute force over the surviving corpus, so a green hash
    // proves the reduced-index search is still exact (the bound held
    // with the adjusted counts).
    "e17_knn_post_delete" -> QueryDef(
      build = (spark, dir) => {
        val base = benchIndex(spark, dir)
        val scratch = java.nio.file.Files
          .createTempDirectory("graft_ivfdelete_bench_").toString
        QueryDef.deferCleanup(() => rmTree(scratch))
        val idx = s"$scratch/idx"
        copyTree(base, idx)
        val emb = QueryDef.spread(spark, dir, "embeddings")
        graft.operators.IvfIndex.delete(spark, idx,
          emb.filter(col("vec_id") % 7 === 3).select("vec_id"))
        graft.operators.IvfIndex.searchExact(spark, idx, col("vec_id") < 8)
      },
      oracle = Some(knnOracle
        .replace("WHERE vec_id < 8", "WHERE vec_id < 8 AND vec_id % 7 <> 3")
        .replace("ON p.query_id <> c.vec_id",
          "ON p.query_id <> c.vec_id AND c.vec_id % 7 <> 3"))),

    // ---------------------------------------------------------------- c03
    // Benchmark-contamination check: which training docs share any word
    // 3-gram with the (stand-in) benchmark set — doc_id % 97 == 0 marks
    // probe docs here; a real run points the probe frame at the eval
    // suite. Inverted-index shape like m02: docs meet probes only
    // through a shared shingle. The probe shingle set is explicitly
    // broadcast — benchmark suites are bounded (MBs), the training
    // corpus is not, and without the hint a stats-blind join could
    // shuffle the 100 TB side.
    "c03_contamination" -> QueryDef(
      build = (spark, dir) => {
        val sh = shingled(spark, dir)
        val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
        val probeShingles = ex.filter(col("doc_id") % 97 === 0)
          .select("s").distinct()
        ex.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(probeShingles), "s")
          // shingle sets are distinct per doc, so count(*) = distinct
          // shared shingles
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        shn AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(range(1, len(tk)-1), i -> array_to_string(tk[i:i+2], ' ')))
            ELSE list_distinct(tk) END AS sh
          FROM tkn),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM shn),
        probe AS (SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0)
        SELECT doc_id, COUNT(*) AS n_shared
        FROM ex JOIN probe USING (s)
        WHERE doc_id % 97 <> 0
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- e01
    // Brute-force KNN by exact quantized dot product: bounded probe set
    // (8 vectors) broadcast against the streaming corpus; per-probe
    // top-10 via window rank over exact integers.
    "e01_knn_dot" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = QueryDef.spread(spark, dir, "embeddings")
          .select(col("vec_id"), expr(quant).as("qv"))
        val probes = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("qv").as("pq"))
        val dots = emb.join(broadcast(probes), col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            qdot("pq", "qv").as("dot"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("cand_id"))
        dots.withColumn("rnk", row_number().over(w).cast("bigint"))
          .filter(col("rnk") <= 10)
          .orderBy("query_id", "rnk")
      },
      oracle = Some(knnOracle),
      headline = true),

    // ---------------------------------------------------------------- e13
    // Persisted IVF index layout + partition-pruned exact search
    // (operators.IvfIndex): write the corpus cluster-PARTITIONED with
    // centroid/radius metadata (the one shuffle you persist at 100 TB),
    // then search by turning IvfAnn's exact Cauchy-Schwarz cluster
    // bound into a literal parquet PartitionFilter — skipped clusters'
    // files are never opened. The entry times the honest end-to-end
    // (index build + write + search, c14's posture) and the output is
    // provably the e01 brute force, so the same SQL oracle applies.
    // IvfIndexSpec pins bit-exact meta round-trip, parity with the
    // in-memory exact search, and strict pruning on a clustered corpus.
    "e13_ivf_index_search" -> QueryDef(
      build = (spark, dir) => {
        val out = java.nio.file.Files
          .createTempDirectory("graft_ivfindex_bench_").toString
        QueryDef.deferCleanup(() => rmTree(out))
        graft.operators.IvfIndex.write(spark, dir, out)
        graft.operators.IvfIndex.searchExact(spark, out, col("vec_id") < 8)
      },
      oracle = Some(knnOracle),
      headline = true),

    // ---------------------------------------------------------------- e13b
    // The AMORTIZED side of e13: search over a PREBUILT persisted index
    // (built once per process per sf dir, p03's generate-once pattern).
    // e13 times build+write+search — the honest one-off; this entry is
    // what the layout actually buys — every query after the first pays
    // only the partition-pruned scan. Same provably-exact search, same
    // brute-force oracle.
    "e13b_ivf_index_search_only" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.IvfIndex.searchExact(spark, benchIndex(spark, dir),
          col("vec_id") < 8),
      oracle = Some(knnOracle),
      headline = true),

    // ---------------------------------------------------------------- e14
    // The production DIAL of the persisted index: fixed-nprobe
    // approximate search (IvfIndex.searchApprox) over the SCALE-dial
    // layout (k = ⌊√n⌋ clusters, nprobe = 36 — e12b's dial pair
    // applied to the persisted index). DRIVER-ORACLED since r20 via
    // the e12b promotion trick: at the sf0.01 gate ⌊√500⌋ = 22 ≤ 36
    // probes every list, so the approx path (probeClustersNearest +
    // partition-pruned candidate join + top-k) provably reproduces the
    // e01 brute force and a searchApprox regression goes red at the
    // driver; at sf0.1 (⌊√5000⌋ = 70 > 36) the dial genuinely prunes —
    // oracleMaxSf degrades the sweep to rows-only there and
    // IvfIndexSpec's recall floor is the gate.
    "e14_ivf_index_search_approx" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.IvfIndex.searchApprox(spark,
          benchScaleIndex(spark, dir), col("vec_id") < 8, nprobe = 36),
      oracle = Some(knnOracle),
      oracleMaxSf = Some(0.01)),

    // ---------------------------------------------------------------- e16
    // IVF-side maintenance twin of m05: IvfIndex.compact finalizes a
    // streamed index (per-batch partition subtrees from 3 micro-batch
    // appends) into the one-file-per-cluster batch layout — the
    // small-files bill a streaming ANN deployment pays periodically.
    // Each pass copies the process-cached streamed index and times
    // compact + one exact search. Exact search is provably exact over
    // ANY index whose bounds cover its data (compact preserves rows
    // and bounds), so the e01 brute-force oracle applies unchanged.
    "e16_ivf_compact_search" -> QueryDef(
      build = (spark, dir) => {
        val streamed = benchStreamedIvfIndex(spark, dir)
        val scratch = java.nio.file.Files
          .createTempDirectory("graft_ivfcompact_bench_").toString
        QueryDef.deferCleanup(() => rmTree(scratch))
        val idx = s"$scratch/idx"
        copyTree(streamed, idx)
        graft.operators.IvfIndex.compact(spark, idx)
        graft.operators.IvfIndex.searchExact(spark, idx, col("vec_id") < 8)
      },
      oracle = Some(knnOracle),
      headline = true),

    // ---------------------------------------------------------------- e15
    // One distributed k-means (Lloyd) step over the quantized
    // embeddings — THE primitive under every clustering consumer here
    // (e05/e06 IVF training, e07 SemDeDup, e12/e13 partition
    // assignment), surfaced as an oracled query: assignment = argmin
    // exact integer L2² against the k=8 seed centroids (vec_id < 8,
    // ties to the smaller centroid id), update = per-cluster
    // PER-DIMENSION integer coordinate sums + member counts — the
    // map-side-combinable sufficient statistic a driver divides into
    // new centroids. Emitting the (cluster, dim, sum, n) relation
    // instead of float means keeps every output cell BIGINT, so the
    // cross-engine hash is exact where averaged centroids would not be.
    //
    // 100 TB shape: centroids broadcast (k rows), distances in the
    // ArrayMath codegen kernel, one shuffle of (cluster, dim) partial
    // sums — corpus vectors never move; k·d output rows.
    "e15_kmeans_step" -> QueryDef(
      build = (spark, dir) => {
        val emb = QueryDef.spread(spark, dir, "embeddings")
          .select(col("vec_id"), expr(quant).as("qv"))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("qv").as("cq"))
        val assign = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"),
            struct(graft.functions.ArrayMath.l2sq(col("qv"), col("cq"))
              .as("d"), col("cid")).as("dc"))
          .groupBy("vec_id")
          .agg(min(col("dc")).as("m"))
          .select(col("vec_id"), col("m.cid").as("cluster"))
        emb.join(assign, "vec_id")
          .select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "x")))
          .groupBy(col("cluster"), col("dim").cast("bigint").as("dim"))
          // each member contributes exactly one row per dimension, so
          // the group's row count IS the cluster's member count
          .agg(sum("x").as("coord_sum"),
            count(lit(1)).as("n_members"))
          .orderBy("cluster", "dim")
      },
      oracle = Some("""
        WITH q AS (
          SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        cents AS (SELECT vec_id AS cid, qv AS cq FROM q WHERE vec_id < 8),
        dists AS (
          SELECT q.vec_id, c.cid,
                 list_sum([(qv[i] - cq[i]) * (qv[i] - cq[i]) for i in range(1, len(qv) + 1)]) AS d
          FROM q CROSS JOIN cents c),
        assign AS (
          SELECT vec_id, cid AS cluster
          FROM (SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
                FROM dists)
          WHERE rn = 1),
        coords AS (
          SELECT a.cluster, CAST(i - 1 AS BIGINT) AS dim, q.qv[i] AS x
          FROM assign a JOIN q USING (vec_id), LATERAL unnest(range(1, len(q.qv) + 1)) AS t(i))
        SELECT cluster, dim, CAST(SUM(x) AS BIGINT) AS coord_sum,
               CAST(COUNT(*) AS BIGINT) AS n_members
        FROM coords GROUP BY cluster, dim ORDER BY cluster, dim""")),

    // ---------------------------------------------------------------- e03
    // LSH-bucketed ANN (see operators.AnnLsh). The hyperplane scheme is
    // inherently probabilistic, so the oracle-mode parameterization runs
    // enough 4-bit tables (40) that the bucket union covers every true
    // top-10 on the fixed test corpus — measured recall 1.0 at sf0.001/
    // 0.01/0.1 and pinned by AnnOracleParitySpec (deterministic seeded
    // hyperplanes on fixed data, so "measured" here means proven-by-
    // execution) — and the exact re-rank then reproduces the e01 brute
    // force, which is the DuckDB oracle below. The production dial
    // (fewer tables, more bits) stays on AnnLsh.knn's defaults with the
    // SimilaritySpec recall gate.
    "e03_ann_lsh" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.AnnLsh.knn(spark, dir, col("vec_id") < 8,
          tables = 40, bits = 4),
      oracle = Some(knnOracle)),

    // ---------------------------------------------------------------- e05
    // IVF ANN (see operators.IvfAnn). Oracle mode uses knnExact: the
    // adaptive Cauchy-Schwarz cluster pruning (|dot(p,c) − dot(p,μ)| ≤
    // ‖p‖·radius) makes the output PROVABLY equal to the e01 brute
    // force on any corpus, any norms — so the brute-force SQL is
    // a true oracle, not a recall hope. Lloyd training itself is
    // deterministic (md5 init + exact averages) but not SQL-expressible;
    // it only shapes WHICH clusters get pruned, never the result.
    // IvfAnnSpec keeps the recall gate on the fixed-nprobe production
    // dial.
    "e05_ann_ivf" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.IvfAnn.knnExact(spark, dir, col("vec_id") < 8),
      oracle = Some(knnOracle)),

    // ---------------------------------------------------------------- e06
    // IVF-PQ: inverted lists + product-quantized codes + ADC shortlist +
    // exact re-rank — the memory-bound ANN scale path (candidates move
    // 8-byte codes, not vectors). Oracle mode uses knnExact: exact-pruned
    // IVF candidates + the Cauchy-Schwarz ADC error bound make the
    // shortlist provably cover the true top-10, so the output equals the
    // e01 brute force. IvfPqSpec keeps the recall gate on the fixed
    // shortlistFactor production dial.
    "e06_ann_ivfpq" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.IvfPq.knnExact(spark, dir, col("vec_id") < 8),
      oracle = Some(knnOracle)),

    // ---------------------------------------------------------------- e09
    // Whole-corpus kNN GRAPH (every vector is a probe): the index-build
    // op behind dedup graphs, SemDeDup candidate generation, and graph
    // clustering. Runs IvfAnn.knnExact with the all-rows predicate —
    // the inverted lists become a cluster-bucketed SELF-join (ids only)
    // and the per-row adaptive pruning bound caps each vector's
    // candidate fan-out; output is provably the exact top-5 graph on
    // any corpus, so the DuckDB all-pairs oracle is a true
    // check, not a recall hope. Honest cost note: pruning effectiveness
    // tracks how clustered the corpus is — tight real-world embedding
    // clusters prune hard, while near-random vectors (this synthetic
    // corpus) have wide cluster radii and degrade toward the inherent
    // all-pairs cost of an EXACT graph; at 100 TB you either accept
    // that for exactness or swap the probe list for fixed-nprobe knn /
    // AnnLsh buckets and take the recall dial.
    // ---------------------------------------------------------------- e12
    // RETIRED from the entry set in r20 in favor of e12b (the r19
    // verdict's option 1c): the frozen-dial graph (k=32, nprobe=24 —
    // IvfAnn.knnGraph's defaults) covers nprobe/k = 75% of the corpus
    // per probe, Θ(n²) BY DIAL CHOICE, and nprobe < k makes it
    // genuinely approximate even at the sf0.01 gate, so it could never
    // be promoted to an oracle. The OPERATOR and its recall gate stay
    // (KnnGraphApproxSpec pins knnGraph's frozen dial ≥ 0.95 at the
    // default dials); e12b prices the dial that survives 100× and IS
    // oracled at the gate SF. Bench-set note: e12 was a headline —
    // BENCH_r20's headline set drops from 29 to 28 entries; compare
    // round-over-round totals on the comparable subset.
    // ---------------------------------------------------------------- e12b
    // e12 under the DOCUMENTED scale dial (k = ⌊√n⌋ centroids, nprobe
    // fixed): per-probe candidates Θ(nprobe·n/k) = Θ(√n), total
    // Θ(n^1.5) — the production dial for corpora where e12's frozen
    // (k=32, nprobe=24) would cover a constant corpus share per probe
    // and go Θ(n²) (measured 6.0× vs 37× wall for 10× data,
    // tools/ScaleProbe). Kept as a SEPARATE headline so e12's
    // cross-round continuity series stays untouched while the board
    // prices the dial that survives 100×. Recall contract ≥ 0.95 vs
    // the exact graph (KnnGraphApproxSpec — gated at sf0.1 where
    // ⌊√n⌋ = 44 > nprobe and the dial genuinely approximates); at the
    // sf0.01 correctness gate the dial is provably EXACT (⌊√n⌋ ≤
    // nprobe ⇒ all lists probed), so e09's brute-force SQL is a true
    // oracle there, not a recall hope — see knnGraphOracle's scaladoc.
    "e12b_knn_graph_scale" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.IvfAnn.knnGraphScaled(spark, dir, topK = 5),
      oracle = Some(knnGraphOracle),
      headline = true,
      oracleMaxSf = Some(0.01)),

    // ---------------------------------------------------------------- e23
    // PageRank centrality over the exact kNN graph — CC told us which
    // docs clump (c01/d11); this ranks how CENTRAL each embedding is
    // in the semantic neighborhood structure (graph-importance
    // weighting for training-mix selection). Exact integer ppm with
    // damping as the rational 17/20 (operators/PageRank — both
    // engines' integer division truncates toward zero, so 10 fixed
    // rounds are bit-reproducible cross-engine); the kNN graph has no
    // dangling nodes (every node emits exactly topK edges), which is
    // what makes the no-redistribution form exact. The edge frame is
    // persisted once and every round scans the cache; rounds chain
    // linearly in the plan (single back-reference per round — not an
    // e18-style unroll hazard).
    "e23_knn_pagerank" -> QueryDef(
      build = (spark, dir) => {
        val edges = graft.operators.IvfAnn
          .knnExact(spark, dir, lit(true), topK = 5)
          .select(col("query_id").as("src"), col("cand_id").as("dst"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        QueryDef.deferCleanup(() => { edges.unpersist(false); () })
        graft.operators.PageRank.scores(edges, rounds = 10)
      },
      oracle = Some(pagerankOracle)),

    // ---------------------------------------------------------------- e23b
    // e23's PRODUCTION path: the same exact-integer PageRank, but the
    // edge source is the fixed-nprobe approximate graph under the
    // scale dial (e12b's knnGraphScaled) instead of the exact kNN
    // graph — the graph build is what dominates e23's cost and goes
    // all-pairs on unclustered corpora, while PageRank itself is
    // linear in |E| per round. The approx graph can leave a vector
    // with no out-edges (a probe whose clusters hold no candidates),
    // which PageRank.scores refuses by contract (the node set is
    // DISTINCT src) — missing sources get (v, v) self-loops, the
    // operator's documented fill, so every embedding scores and no
    // received mass is dropped. PageRankSpec gates agreement with
    // e23's exact-graph scores (bit-equal at sf0.01 where sqrt(n) <=
    // nprobe makes the dial exact — every probe has all topK
    // candidates, so the self-loop fill is empty and the edge set IS
    // e23's, making e23's oracle valid at the gate SF; top-rank
    // overlap at sf0.1 where the dial genuinely prunes).
    "e23b_pagerank_approx_graph" -> QueryDef(
      build = (spark, dir) => {
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        // the union references the graph twice (edges + the anti-join's
        // src set) — persist it or the whole graph build runs twice
        val approx = graft.operators.IvfAnn
          .knnGraphScaled(spark, dir, topK = 5)
          .select(col("query_id").as("src"), col("cand_id").as("dst"))
          .persist(lvl)
        QueryDef.deferCleanup(() => { approx.unpersist(false); () })
        val loops = QueryDef.table(spark, dir, "embeddings")
          .select(col("vec_id").as("src"))
          .join(approx.select("src").distinct(), Seq("src"), "left_anti")
          .select(col("src"), col("src").as("dst"))
        val edges = approx.unionByName(loops).persist(lvl)
        QueryDef.deferCleanup(() => { edges.unpersist(false); () })
        graft.operators.PageRank.scores(edges, rounds = 10)
      },
      oracle = Some(pagerankOracle),
      headline = true,
      oracleMaxSf = Some(0.01)),

    "e09_knn_graph" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.IvfAnn.knnExact(spark, dir, lit(true), topK = 5),
      oracle = Some(knnGraphOracle)),

    // ---------------------------------------------------------------- e08
    // Hard-negative mining for contrastive training: per probe, the
    // top-5 HIGHEST-dot candidates with a DIFFERENT label — the
    // near-boundary negatives a contrastive or reranker objective
    // learns most from. Same bounded-probe-broadcast shape and exact
    // quantized scoring as e01 with the label complement in the join
    // predicate; at index scale the brute-force stream swaps for the
    // ANN candidate generators (AnnLsh/IvfAnn) filtered by label, the
    // ranking stays identical.
    "e08_hard_negatives" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = QueryDef.spread(spark, dir, "embeddings")
          .select(col("vec_id"), col("label").cast("bigint").as("label"),
            expr(quant).as("qv"))
        val probes = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("label").as("plabel"),
            col("qv").as("pq"))
        val dots = emb.join(broadcast(probes),
            col("query_id") =!= col("vec_id") && col("plabel") =!= col("label"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            qdot("pq", "qv").as("dot"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("cand_id"))
        dots.withColumn("rnk", row_number().over(w).cast("bigint"))
          .filter(col("rnk") <= 5)
          .orderBy("query_id", "rnk")
      },
      oracle = Some("""
        WITH q AS (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
                 [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        probes AS (SELECT vec_id AS query_id, label AS plabel, qv AS pq
                   FROM q WHERE vec_id < 8),
        dots AS (
          SELECT query_id, c.vec_id AS cand_id,
                 CAST(list_sum([pq[i] * c.qv[i] for i in range(1, len(pq)+1)]) AS BIGINT) AS dot
          FROM probes p JOIN q c ON p.query_id <> c.vec_id AND p.plabel <> c.label)
        SELECT query_id, cand_id, dot,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS BIGINT) AS rnk
        FROM dots QUALIFY rnk <= 5 ORDER BY query_id, rnk""")),

    // ---------------------------------------------------------------- e02
    // Per-label centroid accumulation (the IVF build step): exact integer
    // sums per (label, dimension); a downstream consumer divides s/n.
    "e02_label_centroids" -> QueryDef(
      build = (spark, dir) => {
        val emb = QueryDef.spread(spark, dir, "embeddings")
          .select(col("label").cast("bigint").as("label"), expr(quant).as("qv"))
        emb.select(col("label"), posexplode(col("qv")).as(Seq("pos", "q")))
          .groupBy(col("label"), (col("pos") + 1).cast("bigint").as("dim"))
          .agg(sum("q").as("s"), count(lit(1)).as("n"))
          .orderBy("label", "dim")
      },
      oracle = Some("""
        WITH q AS (
          SELECT CAST(label AS BIGINT) AS label,
                 [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings)
        SELECT label, CAST(i AS BIGINT) AS dim, CAST(SUM(qv[i]) AS BIGINT) AS s, COUNT(*) AS n
        FROM q, range(1, 65) r(i)
        GROUP BY label, i ORDER BY label, dim""")),

    // ---------------------------------------------------------------- e10
    // KNN majority-vote classification: each probe is labeled by the
    // majority label among its 10 nearest neighbors (exact quantized
    // dot, self excluded), ties broken toward the smaller label id —
    // the eval loop of every embedding-quality report. Same bounded
    // broadcast-probe shape as e01; the vote is a tiny per-probe
    // aggregate over the top-k frame, so the only material cost is the
    // neighbor search itself (swap in AnnLsh/IvfAnn at index scale).
    "e10_knn_classify" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = QueryDef.spread(spark, dir, "embeddings")
          .select(col("vec_id"), col("label").cast("bigint").as("label"),
            expr(quant).as("qv"))
        val probes = emb.filter(col("vec_id") < 32)
          .select(col("vec_id").as("query_id"), col("label").as("true_label"),
            col("qv").as("pq"))
        val dots = emb.join(broadcast(probes), col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("true_label"),
            col("label").as("cand_label"), col("vec_id").as("cand_id"),
            qdot("pq", "qv").as("dot"))
        val wTop = Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("cand_id"))
        val votes = dots.withColumn("rnk", row_number().over(wTop))
          .filter(col("rnk") <= 10)
          .groupBy("query_id", "true_label", "cand_label")
          .agg(count(lit(1)).as("votes"))
        val wVote = Window.partitionBy("query_id")
          .orderBy(col("votes").desc, col("cand_label"))
        votes.withColumn("vr", row_number().over(wVote))
          .filter(col("vr") === 1)
          .select(col("query_id"), col("true_label"),
            col("cand_label").as("pred_label"), col("votes"),
            when(col("true_label") === col("cand_label"), 1L).otherwise(0L)
              .as("correct"))
          .orderBy("query_id")
      },
      oracle = Some("""
        WITH q AS (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
                 [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        probes AS (SELECT vec_id AS query_id, label AS true_label, qv AS pq
                   FROM q WHERE vec_id < 32),
        dots AS (
          SELECT query_id, true_label, c.label AS cand_label, c.vec_id AS cand_id,
                 CAST(list_sum([pq[i] * c.qv[i] for i in range(1, len(pq)+1)]) AS BIGINT) AS dot
          FROM probes p JOIN q c ON p.query_id <> c.vec_id),
        topk AS (
          SELECT query_id, true_label, cand_label,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS rnk
          FROM dots QUALIFY rnk <= 10),
        votes AS (
          SELECT query_id, true_label, cand_label, COUNT(*) AS votes
          FROM topk GROUP BY 1, 2, 3)
        SELECT query_id, true_label, cand_label AS pred_label, votes,
               CASE WHEN true_label = cand_label THEN 1 ELSE 0 END AS correct
        FROM votes
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, cand_label) = 1
        ORDER BY query_id""")),

    // ---------------------------------------------------------------- e11
    // Int8 scalar-quantized KNN — the memory/bandwidth scale dial ANN
    // indexes actually ship (FAISS SQ8, reference-free): per-vector
    // symmetric quantization code[i] = round(x[i]·127/maxabs), dots in
    // pure int arithmetic over 1-byte codes (4× smaller than float32,
    // 8× smaller than the 2^20 fixed-point frame — at 100 TB the codes
    // fit where vectors don't). Determinism note: maxabs, the ·127
    // product, and the division are each single correctly-rounded IEEE
    // double ops, so both engines compute bit-identical doubles, and
    // round() is half-away-from-zero in both (Spark HALF_UP on the
    // exact binary expansion = DuckDB std::round). Top-10 per probe by
    // integer code dot, rank ties toward the smaller cand_id.
    "e11_int8_knn" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val maxabs = "array_max(transform(embedding, x -> abs(cast(x as double))))"
        val codes = s"""CASE WHEN $maxabs = 0D THEN transform(embedding, x -> 0L)
          ELSE transform(embedding,
            x -> cast(round(cast(x as double) * 127D / $maxabs, 0) as bigint)) END"""
        val emb = QueryDef.spread(spark, dir, "embeddings")
          .select(col("vec_id"), expr(codes).as("code"))
        val probes = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("code").as("pc"))
        val dots = emb.join(broadcast(probes), col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            qdot("pc", "code").as("dot8"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("dot8").desc, col("cand_id"))
        dots.withColumn("rnk", row_number().over(w).cast("bigint"))
          .filter(col("rnk") <= 10)
          .orderBy("query_id", "rnk")
      },
      oracle = Some("""
        WITH m AS (
          SELECT vec_id, list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
          FROM embeddings),
        q AS (
          SELECT e.vec_id,
                 CASE WHEN maxabs = 0 THEN [CAST(0 AS BIGINT) for x in embedding]
                 ELSE [CAST(round(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT) for x in embedding]
                 END AS code
          FROM embeddings e JOIN m ON e.vec_id = m.vec_id),
        probes AS (SELECT vec_id AS query_id, code AS pc FROM q WHERE vec_id < 8),
        dots AS (
          SELECT query_id, c.vec_id AS cand_id,
                 CAST(list_sum([pc[i] * c.code[i] for i in range(1, len(pc)+1)]) AS BIGINT) AS dot8
          FROM probes p JOIN q c ON p.query_id <> c.vec_id)
        SELECT query_id, cand_id, dot8,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot8 DESC, cand_id) AS BIGINT) AS rnk
        FROM dots QUALIFY rnk <= 10 ORDER BY query_id, rnk""")),

    // ---------------------------------------------------------------- e18
    // MMR diversity re-rank (Carbonell & Goldstein 1998) — the
    // selection rule diverse-sampling and retrieval stages use so the
    // chosen k aren't k copies of the same neighborhood: greedily pick
    // argmax of λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s). λ=0.7 in
    // integers (score = 7·dot_rel − 3·max_dot_sel over the exact
    // quantized dots — quant products stay ≤ 2^46, ×7 ≤ 2^49), ties to
    // the smaller cand_id, so the greedy trajectory is engine-exact.
    //
    // 100 TB shape: the corpus pays only e01's broadcast-probe scan +
    // partial top-M (M=24 per query); the greedy O(k·M) inner loop is
    // operators.Mmr — ONE definition, shared with
    // IvfIndex.searchDiverse so the oracled trajectory and the
    // index-backed path cannot drift. The oracle derives the same
    // trajectory RELATIONALLY: a materialized candidate-pair dot table
    // + k unrolled argmax CTE steps (d17b's unrolled-iteration
    // technique), so the array-fold implementation is checked against
    // the textbook recurrence, not a mirror of itself.
    "e18_mmr_rerank" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = QueryDef.spread(spark, dir, "embeddings")
          .select(col("vec_id"), expr(quant).as("qv"))
        val probes = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("qv").as("pq"))
        val dots = emb.join(broadcast(probes), col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"), col("qv"),
            qdot("pq", "qv").as("dot"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("cand_id"))
        val topm = dots.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 24)
          .select("query_id", "cand_id", "dot", "qv")
        graft.operators.Mmr.rerank(topm, k = 8, lamNum = 7, lamDen = 10)
      },
      oracle = Some {
        val steps = (2 to 8).map { i =>
          s"""
        s$i AS MATERIALIZED (
          SELECT query_id, cand_id, CAST($i AS BIGINT) AS step, score FROM (
            SELECT query_id, cand_id, score,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, cand_id) AS rn
            FROM (
              SELECT t.query_id, t.cand_id, 7 * t.dot - 3 * MAX(c.d) AS score
              FROM topm t
              JOIN cd c ON c.query_id = t.query_id AND c.ca = t.cand_id
              JOIN sel${i - 1} sl ON sl.query_id = c.query_id AND sl.cand_id = c.cb
              WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
                                WHERE x.query_id = t.query_id
                                  AND x.cand_id = t.cand_id)
              GROUP BY t.query_id, t.cand_id, t.dot))
          WHERE rn = 1),
        sel$i AS MATERIALIZED (
          SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM s$i)"""
        }.mkString(",")
        s"""
        WITH q AS (
          SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        probes AS (SELECT vec_id AS query_id, qv AS pq FROM q WHERE vec_id < 8),
        alldots AS (
          SELECT query_id, c.vec_id AS cand_id, c.qv,
                 CAST(list_sum([pq[i] * c.qv[i] for i in range(1, len(pq)+1)]) AS BIGINT) AS dot
          FROM probes p JOIN q c ON p.query_id <> c.vec_id),
        topm AS MATERIALIZED (
          SELECT query_id, cand_id, qv, dot FROM alldots
          QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dot DESC, cand_id) <= 24),
        cd AS MATERIALIZED (
          SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
                 CAST(list_sum([a.qv[i] * b.qv[i] for i in range(1, len(a.qv)+1)]) AS BIGINT) AS d
          FROM topm a JOIN topm b
            ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
        s1 AS MATERIALIZED (
          SELECT query_id, cand_id, CAST(1 AS BIGINT) AS step, 7 * dot AS score
          FROM topm
          QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dot DESC, cand_id) = 1),
        sel1 AS (SELECT * FROM s1),$steps
        SELECT query_id, step, cand_id, CAST(score AS BIGINT) AS mmr_score
        FROM sel8 ORDER BY query_id, step"""
      },
      headline = true),

    // ---------------------------------------------------------------- e19
    // PERSISTED IVF-PQ exact search (operators.PqIndex) — the
    // memory-bound index made durable: codes + reconstruction errors
    // live cluster-partitioned beside the vectors, the ADC scoring
    // pass reads ONLY the narrow columns (parquet columnar — the wide
    // embedding column never leaves disk for screened-out candidates,
    // PqIndexSpec pins the scan schema), and the Cauchy-Schwarz
    // shortlist bound makes the exact re-rank provably the e01 brute
    // force — so the same oracle applies (e06's posture on the e13b
    // amortized pattern: the index builds once per process, each pass
    // pays the search a deployment actually pays per query).
    "e19_pq_index_search" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.PqIndex.searchExact(spark, benchPqIndex(spark, dir),
          col("vec_id") < 8),
      oracle = Some(knnOracle),
      headline = true),

    // ---------------------------------------------------------------- e20
    // EXACT range (radius) search: every candidate whose quantized dot
    // reaches a quarter of the probe's self-dot (4·dot ≥ qself) — the
    // "all neighbors above τ" primitive a SemDeDup-style retention
    // policy consumes, vs the top-k surface of e01/e05/e13. The
    // threshold is per-probe RELATIVE (a fraction of self-similarity):
    // an absolute dot floor is corpus-magnitude-fragile the way
    // absolute row floors are SF-fragile (q33's lesson). Pruning is
    // the fixed-threshold degenerate case of the Cauchy-Schwarz top-k
    // bound — known before any candidate is seen, so the probe list is
    // one metadata filter, zero adaptive passes (IvfAnn.rangeSearch's
    // doc). Both engines compare exact integers; the brute-force
    // oracle mirrors the 4·dot ≥ self filter.
    "e20_range_search" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.IvfAnn.rangeSearch(spark, dir, col("vec_id") < 8),
      oracle = Some(rangeOracle)),

    // ---------------------------------------------------------------- e22
    // Range search over the PERSISTED index (IvfIndex.searchRange) —
    // e20's partition-pruned twin and the layout where the radius
    // query actually pays at 100 TB: the fixed-threshold prune becomes
    // literal cluster partition filters, so skipped clusters' files
    // are never opened (e13b's amortized prebuilt-index pattern; the
    // output provably equals the e20 brute-force filter, so the same
    // oracle applies).
    "e22_index_range_search" -> QueryDef(
      build = (spark, dir) =>
        graft.operators.IvfIndex.searchRange(spark, benchIndex(spark, dir),
          col("vec_id") < 8),
      oracle = Some(rangeOracle)),

    // ---------------------------------------------------------------- e21
    // Embedding-space drift between two snapshots — d25/d26's monitor
    // family on the VECTOR side: per-dimension quantized centroid
    // shift between the old and new snapshot (doc-parity stand-in,
    // d25's convention). The number an index operator actually reads
    // before deciding to retrain: a large per-dim shift means the
    // coarse centroids (IvfIndex/PqIndex meta) no longer sit where the
    // data is. Exact integers end-to-end: per-dim sums of the e01
    // quantization, means by integer div (deterministic truncation,
    // bit-equal both engines), delta = new_mean − old_mean. Integer
    // mean (not a cross-multiplied delta) keeps everything BIGINT-safe
    // to ~4·10¹² vectors; a cross product would wrap at ~2·10⁶ (q33's
    // overflow lesson).
    //
    // 100 TB shape: ONE corpus scan → posexplode → (dim) groupBy with
    // per-parity conditional sums, map-side combined so shuffle volume
    // is dim × partitions, not rows × dim; the ~dim-row result is
    // driver-sized by construction.
    // ---------------------------------------------------------------- e25
    // Embedding-norm distribution — the vector-intake QA check beside
    // e21's drift monitor: exact quantiles of the quantized squared
    // norm (array_dot(qv, qv) — e01's integers, so the report is
    // bit-reproducible). A collapsed p0/p50 (near-zero vectors) or an
    // exploded p100 flags a broken embedding job BEFORE the vectors
    // poison an index build; the IvfAnn/PqIndex pruning bounds assume
    // sane norms. ExactQuantiles' histogram reduction: norms are
    // high-cardinality, so the shuffle is the distinct-norm histogram
    // and the prefix sums shard on the norm order — no corpus-wide
    // window (q43's machinery, plan-pinned there).
    "e25_norm_quantiles" -> QueryDef(
      build = (spark, dir) => {
        val emb = QueryDef.spread(spark, dir, "embeddings")
          .select(col("vec_id"), expr(quant).as("qv"))
          .select(graft.functions.ArrayMath.dot(col("qv"), col("qv"))
            .as("norm2"))
        graft.operators.ExactQuantiles.of(
            emb, "norm2", Seq(0, 250, 500, 750, 1000))(QueryDef.deferCleanup)
          .withColumnRenamed("n", "n_vectors")
      },
      oracle = Some("""
        WITH q AS (
          SELECT vec_id,
                 [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        d AS (
          SELECT CAST(list_sum([x * x for x in qv]) AS BIGINT) AS norm2
          FROM q),
        r AS (
          SELECT norm2, ROW_NUMBER() OVER (ORDER BY norm2) AS rn,
                 COUNT(*) OVER () AS n
          FROM d),
        qs AS (SELECT q FROM (VALUES (0), (250), (500), (750), (1000)) t(q))
        SELECT CAST(q AS BIGINT) AS q_permille,
               CAST((q * (n - 1)) // 1000 AS BIGINT) AS rank_idx,
               norm2, CAST(n AS BIGINT) AS n_vectors
        FROM qs JOIN r ON rn = (q * (n - 1)) // 1000 + 1
        ORDER BY q""")),

    "e21_embedding_drift" -> QueryDef(
      build = (spark, dir) => {
        val emb = QueryDef.spread(spark, dir, "embeddings")
        embeddingDriftCore(emb.select(
          (col("vec_id") % 2 === 0).as("is_old"), col("embedding")))
      },
      oracle = Some("""
        WITH q AS (
          SELECT vec_id % 2 = 0 AS is_old,
                 [CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) for x in embedding] AS qv
          FROM embeddings),
        d AS (
          SELECT is_old,
                 unnest(range(1, len(qv) + 1)) AS dim,
                 unnest(qv) AS v
          FROM q),
        a AS (
          SELECT dim,
                 CAST(SUM(CASE WHEN is_old THEN v ELSE 0 END) AS BIGINT) AS old_sum,
                 CAST(SUM(CASE WHEN is_old THEN 0 ELSE v END) AS BIGINT) AS new_sum,
                 CAST(SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS old_n,
                 CAST(SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) AS new_n
          FROM d GROUP BY dim)
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(CASE WHEN old_n > 0 THEN old_sum // old_n ELSE 0 END AS BIGINT) AS old_mean_q,
               CAST(CASE WHEN new_n > 0 THEN new_sum // new_n ELSE 0 END AS BIGINT) AS new_mean_q,
               CAST((CASE WHEN new_n > 0 THEN new_sum // new_n ELSE 0 END)
                  - (CASE WHEN old_n > 0 THEN old_sum // old_n ELSE 0 END) AS BIGINT) AS delta_q
        FROM a ORDER BY dim"""))
  )
}
