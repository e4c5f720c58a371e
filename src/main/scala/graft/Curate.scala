package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation CLI — the LLM-pipeline
  * counterpart of [[Migrate]]: where Migrate drives the reference's
  * schema+data migration surface, Curate composes the beyond-reference
  * corpus operators into the program a pretraining data team actually
  * runs:
  *
  *   read corpus → exact dedup → near-dup clusters (SimHash + connected
  *   components) → quality gate → leakage-free split → per-split
  *   sequence packing → curated parquet + manifest + summary.
  *
  * Usage: runMain graft.Curate <sfDir> <outDir> [minTokens] [--rep=N] [--scrub-pii]
  *        runMain graft.Curate <batchDir> <outDir> <minTokens> <baseDir> [--rep=N] [--scrub-pii]
  *        runMain graft.Curate --takedown=<ids> <baseDir> <outDir>
  *
  * `--rep=N` (position-independent) switches on the d18-backed
  * repetition gate at N permille (Config.maxRep2gramPermille).
  * `--scrub-pii` switches on the d22-backed PII redaction at ingestion
  * (Config.scrubPii — keep it constant across an incremental chain).
  * `--strip-boilerplate=N` strips lines present in more than 1/N of the
  * batch's docs (Config.stripBoilerplateDenom, the d23 scheme; applied
  * after the scrub; same chain-consistency rule).
  * `--source-cap=N` caps each source at N permille of the run's kept
  * docs (Config.sourceCapPermille, the d24 scheme; applied after every
  * other verdict — see the Config doc for the per-generation semantics).
  * `--zorder-files=N` writes curated.parquet z-ordered into N
  * contiguous Morton-key ranges per split (Config.zorderFiles, c24's
  * layout — file footer stats then bound both n_chars AND doc_id).
  * `--decontaminate=<evalDir>` flips kept docs that MinHash-near-dup
  * any doc of the eval corpus to 'eval_contaminated' (the oracled m07
  * scheme, ONE definition — the fuzzy screen an exact n-gram
  * contamination check misses).
  *
  * The 4-arg form is the INCREMENTAL mode: curate a new batch against a
  * previous run's output (baseDir). The base corpus always wins — a
  * batch doc identical to (dup_of_base) or SimHash-near (near_dup_base)
  * any base doc is dropped before the batch-local rules run. The probe
  * joins only the batch's digests/fingerprints against the maintained
  * `index.parquet` (doc_id, digest, fp, split of every examined doc) — the
  * base corpus TEXT is never re-read, which is what makes daily
  * ingestion O(batch) instead of O(corpus).
  *
  * Verdict rules (first applicable reason wins, so per-doc verdicts are
  * a partition and the summary's counts reconcile exactly):
  *   dup_of_base   batch doc's digest already in the base index
  *   near_dup_base batch doc's fp within hamming ≤ cfg.baseHamming of a
  *                 base fp
  *   exact_dup     not the min doc_id of its (batch) md5(text) group
  *   near_dup      non-canonical member of a c01 dup cluster, where the
  *                 canonical is elected among the cluster's QUALITY-
  *                 PASSING members (text non-null, n_tok ≥ minTokens):
  *                 min doc_id by default, or the LONGEST member under
  *                 --keep-longest (c20's convention) — so a cluster
  *                 whose best candidate is low-quality still keeps its
  *                 best passing representative instead of losing every
  *                 member; a cluster with no quality-passing member
  *                 falls through to low_quality for all members
  *   low_quality   fewer than minTokens whitespace tokens (default 5),
  *                 or — when cfg.maxRep2gramPermille is set — d18's
  *                 duplicate-2gram occupancy above the ceiling
  *   eval_contaminated (only when cfg.decontaminateDir is set) a doc
  *                 that passed every rule above but near-dups a doc of
  *                 the external eval corpus (m07's verified Jaccard ≥
  *                 500‰); applied BEFORE the source cap so the cap
  *                 counts the clean kept set; its digest/fp rows stay
  *                 as NULL-split suppressors
  *   source_capped (only when cfg.sourceCapPermille is set) a doc that
  *                 passed every rule above but fell beyond its source's
  *                 relative cap — hash-ordered retention inside the
  *                 over-cap source, the d24 scheme; applied over the
  *                 kept set LAST so dedup/quality drops don't consume
  *                 cap slots
  *   kept          everything else; assigned a split by md5 of its
  *                 dup-cluster id (c12 rule: near-dups never straddle
  *                 splits, singletons hash their own id)
  *
  * Artifacts written to outDir:
  *   curated.parquet   kept docs (doc_id, text, lang, source, split),
  *                     partitioned by split
  *   verdicts.parquet  every doc's (doc_id, verdict, split)
  *   packing.parquet   per (split, shard, seq) packing manifest over
  *                     kept docs (c09 semantics, shard-local;
  *                     L = cfg.packLen, shard count = cfg.packShards or
  *                     derived from the kept-doc count)
  *   index.parquet     corpus index for future incremental runs — base
  *                     index ∪ every doc this run EXAMINED. Dropped
  *                     docs ride along with NULL split (their digests
  *                     and fps must keep suppressing redelivered
  *                     content, or a doc dropped as a near-dup would be
  *                     re-admitted the next day) but are COMPACTED to
  *                     one exemplar per distinct (digest, fp) — pure
  *                     redelivery (same content, fresh doc_ids every
  *                     day) therefore cannot grow the index: it is
  *                     bounded by distinct content, not docs-ever-
  *                     examined
  *   summary.json      one JSON object: totals per verdict + split
  *
  * doc_id is the corpus-wide identity: incremental batches must carry
  * ids disjoint from the base corpus (as any append-log does).
  *
  * 100 TB shape: every stage is doc-parallel — the digest groupBy
  * shuffles 16-byte digests, the cluster pipeline is c01's contracted
  * CC, the incremental probes are id+digest/fp joins against the index
  * (never corpus text), split assignment is a per-row md5 plus one
  * doc-keyed left join, and packing windows are (split, shard)-local so
  * the corpus packs as thousands of independent sorts (the shard count
  * scales with the kept corpus — see [[deriveShards]]). Nothing
  * collects to the driver but the summary counts.
  */
object Curate {

  /** Tuning knobs of a curation run. Defaults reproduce the historical
    * behavior (and the c09/c12 oracle semantics) exactly.
    *
    * @param minTokens      quality gate: docs under this many
    *                       whitespace tokens are low_quality
    * @param testSixteenths width of the test split in 16ths of the
    *                       md5-hex space (c12 rule: top hex chars)
    * @param valSixteenths  width of the val split, carved just below
    *                       test
    * @param baseHamming    incremental mode: batch fp within this
    *                       Hamming distance of a base fp ⇒ near_dup_base.
    *                       Capped at 3: the probe's candidate generation
    *                       is the 4×8-bit band join, which guarantees a
    *                       collision only while the differing bits can't
    *                       cover all 4 bands (pigeonhole) — a radius of
    *                       4+ would silently under-match
    * @param packLen        packing sequence length (c09's L)
    * @param packShards     packing shards per split; None derives from
    *                       the kept-doc count ([[deriveShards]]) so
    *                       packing parallelism scales with the corpus
    *                       instead of capping at a constant
    * @param maxRep2gramPermille opt-in Gopher-style repetition gate:
    *                       docs whose duplicate-2gram occupancy (the
    *                       oracle-verified d18 signal, SAME expression)
    *                       exceeds this permille are low_quality and
    *                       excluded from canonical election. None (the
    *                       default) reproduces historical behavior
    * @param scrubPii       opt-in PII redaction at INGESTION: every
    *                       downstream signal (digests, fingerprints,
    *                       token counts, verdicts, curated text,
    *                       packing) sees the redacted corpus — the
    *                       oracle-verified d22 scheme, SAME expression
    *                       ([[queries.Documents.scrubPii]]), so two
    *                       docs differing only in PII values dedup as
    *                       the exact copies they are. Keep the dial
    *                       constant across an incremental/streaming
    *                       chain: the base index's digests were
    *                       computed from the text the base run saw, so
    *                       flipping it mid-chain breaks redelivery
    *                       suppression (the minTokens consistency rule)
    * @param stripBoilerplateDenom opt-in boilerplate removal at
    *                       ingestion (after the PII scrub, so a footer
    *                       whose only variation was PII folds): lines
    *                       in MORE THAN 1/denom of the batch's docs are
    *                       stripped — the oracle-verified d23 scheme,
    *                       SAME definition
    *                       ([[queries.Documents.markedBoilerplateLines]]).
    *                       Docs differing only in boilerplate then
    *                       dedup exactly. Same keep-it-constant chain
    *                       rule as scrubPii — and note the floor is
    *                       relative to EACH RUN's batch, so what counts
    *                       as boilerplate legitimately depends on the
    *                       batch composition (document, don't surprise)
    * @param sourceCapPermille opt-in per-source contribution cap (the
    *                       C4/CCNet anti-spam rule, the oracle-verified
    *                       d24 scheme, SAME definition
    *                       ([[queries.Documents.sourceCapDrops]])):
    *                       after every other verdict, each source may
    *                       keep at most this permille of the run's KEPT
    *                       docs; hash-ordered survivors inside an
    *                       over-cap source, the rest flip to
    *                       'source_capped'. The cap base is each run's
    *                       kept set — in an incremental/streaming chain
    *                       it bounds every GENERATION's contribution,
    *                       not the all-time total (a global cap would
    *                       need cross-generation source counts the
    *                       O(batch) index deliberately doesn't carry)
    * @param zorderFiles    opt-in curated.parquet layout: when set,
    *                       the kept docs are range-partitioned into
    *                       this many contiguous z-ranges of the
    *                       Morton key zvalue(n_chars, doc_id mod 2³¹)
    *                       (functions/ZValue — c24's audited scheme)
    *                       before the split-partitioned write, so each
    *                       file's parquet footer stats bound BOTH
    *                       length and id and a range predicate on
    *                       either prunes files. doc_id is folded mod
    *                       2³¹ (zvalue refuses wider coordinates):
    *                       id-range pruning is exact for corpora under
    *                       2³¹ docs and degrades predictably — never
    *                       wrongly — beyond, since folding only
    *                       widens envelopes, it cannot exclude a
    *                       matching row's file
    * @param decontaminateDir opt-in external-benchmark screen: a dir
    *                       readable by the corpus loader (parquet or
    *                       JSONL); kept docs with a MinHash near-dup
    *                       (m01 scheme, Jaccard ≥ 500‰) in it flip to
    *                       'eval_contaminated'. The dir is an input,
    *                       not a dial — summary.json records the
    *                       boolean; keep the eval set constant across
    *                       a chain for a consistent audit record
    * @param keepLongest    canonical election rule for near-dup
    *                       clusters: false (default) keeps the min
    *                       doc_id among quality-passing members; true
    *                       keeps the LONGEST (max length of the live
    *                       post-ingestion text, ties to the smaller
    *                       doc_id) — the Dolma / Lee et al. 2022
    *                       convention, c20's oracled argmax. Advisory
    *                       chain rule: keep it constant so generations
    *                       elect representatives by one policy (flips
    *                       don't break suppression — every examined
    *                       doc's digest/fp is indexed either way) */
  final case class Config(
      minTokens: Int = 5,
      testSixteenths: Int = 1,
      valSixteenths: Int = 2,
      baseHamming: Int = 2,
      packLen: Int = 512,
      packShards: Option[Int] = None,
      maxRep2gramPermille: Option[Int] = None,
      scrubPii: Boolean = false,
      stripBoilerplateDenom: Option[Int] = None,
      sourceCapPermille: Option[Int] = None,
      keepLongest: Boolean = false,
      curriculum: Boolean = false,
      zorderFiles: Option[Int] = None,
      decontaminateDir: Option[String] = None) {
    require(minTokens >= 0, s"minTokens $minTokens")
    maxRep2gramPermille.foreach(t => require(t >= 0 && t <= 1000,
      s"maxRep2gramPermille must be a permille, got $t"))
    require(testSixteenths >= 0 && valSixteenths >= 0 &&
      testSixteenths + valSixteenths < 16,
      s"splits must leave room for train: test=$testSixteenths val=$valSixteenths")
    require(baseHamming >= 0 && baseHamming <= 3,
      s"baseHamming $baseHamming: the 4-band probe only guarantees " +
        "candidate collisions for Hamming <= 3")
    require(packLen > 0, s"packLen $packLen")
    require(packShards.forall(_ > 0), s"packShards $packShards")
    // denom 1 can never trip (a line's distinct-doc count nd <= total,
    // so nd * 1 > total is unsatisfiable) — asking for the stage and
    // silently stripping nothing is a misconfiguration; 0/negative
    // would invert the comparison entirely
    stripBoilerplateDenom.foreach(d => require(d >= 2,
      s"stripBoilerplateDenom must be >= 2, got $d"))
    // 1000 can never trip (every source is <= 1000 permille of the
    // corpus); 0/negative would cap everything — both are
    // misconfigurations, not dials
    sourceCapPermille.foreach(p => require(p >= 1 && p <= 999,
      s"sourceCapPermille must be in [1,999], got $p"))
    zorderFiles.foreach(n => require(n > 0,
      s"zorderFiles must be positive, got $n"))
  }

  /** Default shard count: one packing window per ~64k kept docs with a
    * floor of 16 — window sorts stay memory-bounded while packing
    * parallelism grows linearly with the corpus (the former fixed 16
    * capped the final stage at 16×splits tasks no matter the cluster). */
  private[graft] def deriveShards(kept: Long): Int =
    math.max(16L, math.min(1L << 20, (kept + 65535) / 65536)).toInt

  final case class Result(counts: Map[String, Long], splits: Map[String, Long])

  /** NULL-split suppressor compaction + index.parquet writer — ONE
    * definition shared by the fresh/incremental pipeline and the
    * takedown rewrite, so the invariant that keeps dropped and
    * taken-down content suppressed (kept rows verbatim; dropped rows
    * one exemplar per distinct (digest, fp)) can never diverge between
    * the two paths. */
  private def writeIndex(frame: DataFrame, path: String): Unit =
    frame.filter(col("split").isNotNull)
      .unionByName(frame.filter(col("split").isNull)
        .groupBy("digest", "fp").agg(min("doc_id").as("doc_id"))
        .select(col("doc_id"), col("digest"), col("fp"),
          lit(null).cast("string").as("split")))
      .write.mode("overwrite").parquet(path)

  /** Sorted-key JSON object over counter maps (summary/card sidecars). */
  private def jsonObj(m: Map[String, Long]): String =
    m.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  private def toks = queries.TextMedia.toks

  /** Fresh full-corpus curation. The input dir may hold either the
    * parquet documents table (`documents.parquet`, the testdata shape)
    * or a JSONL corpus drop (any other content — the shape releases
    * actually arrive in): JSONL goes through JsonlDocs' quarantine
    * read, and malformed-line counts surface on stderr rather than
    * becoming silent all-NULL docs. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      cfg: Config = Config()): Result =
    curate(spark, loadDocs(spark, sfDir), baseIndex = None, outDir, cfg)

  private[graft] def loadDocs(spark: SparkSession, inDir: String)
      : org.apache.spark.sql.DataFrame = {
    if (graft.util.Fs.exists(s"$inDir/documents.parquet",
        spark.sessionState.newHadoopConf()))
      queries.QueryDef.spread(spark, inDir, "documents")
    else {
      // readCounted: ONE whole-corpus parse yields both quarantine
      // counts (the separate bad.count()/good.count() guards used to
      // pay a full re-parse each)
      val (good, nGood, nBad) =
        sources.jsonl.JsonlDocs.readCounted(spark, inDir)
      if (nBad > 0) {
        System.err.println(s"[curate] quarantined $nBad malformed JSONL line(s) from $inDir")
        // fail-loud guard: a mistyped path or a dir of non-JSONL files
        // parses to ZERO good docs with everything quarantined —
        // curating an empty corpus to a normal-looking outDir would
        // hide that. An actually-empty input (no lines) still proceeds.
        require(nGood > 0,
          s"$inDir parsed 0 valid JSONL documents ($nBad quarantined) — " +
            "is this actually a JSONL corpus drop?")
      }
      val target = spark.sparkContext.defaultParallelism
      if (good.rdd.getNumPartitions < target) good.repartition(target) else good
    }
  }

  /** Incremental curation of a new batch against a prior run's outDir.
    * outDir must be a NEW directory (append-log style): writing into
    * baseDir would overwrite index.parquet while it is still the lazy
    * input of the index union — Spark's self-overwrite guard cannot see
    * the conflict through the persisted base frame, so the only copy of
    * the corpus index would be destroyed before the union reads it.
    *
    * Approximation note (deliberate): batch docs are suppressed only by
    * DIRECT digest/fp proximity to the base index. A transitive chain —
    * batch doc X near-dup of batch sibling Y, Y near-dup of a base doc,
    * X itself not within baseHamming of any base fp — is resolved by
    * the batch-local cluster rules (X and Y cluster together, one of
    * them survives base suppression only if neither is base-near), NOT
    * merged into the base doc's cluster. Incremental verdicts are
    * therefore an approximation of full re-curation of the combined
    * corpus: the direct near-dup-pair split invariant holds, but
    * chained near-dups can keep a representative a full re-run would
    * have folded into a base cluster. Daily ingestion trades that for
    * O(batch) cost; re-curate from scratch periodically if chain drift
    * matters. */
  def runIncremental(spark: SparkSession, batchDir: String, baseDir: String,
      outDir: String, cfg: Config = Config()): Result = {
    // CANONICAL paths, not just normalized strings: a symlinked local
    // outDir aliasing baseDir (a "latest" pointer) would pass a string
    // compare and still destroy the index (Fs.canonical resolves local
    // symlinks; remote schemes compare by qualified URI). outDir is
    // created first so it resolves.
    val hc = spark.sessionState.newHadoopConf()
    graft.util.Fs.mkdirs(outDir, hc)
    val basePath = graft.util.Fs.canonical(baseDir, hc)
    val outPath = graft.util.Fs.canonical(outDir, hc)
    require(basePath != outPath,
      s"incremental outDir must differ from baseDir ($basePath): " +
        "the run reads baseDir's index.parquet lazily and an in-place " +
        "overwrite would destroy it")
    curate(spark, loadDocs(spark, batchDir),
      baseIndex = Some(spark.read.parquet(s"$baseDir/index.parquet")),
      outDir, cfg)
  }

  /** Right-to-be-forgotten over a COMPLETED curation: rewrite baseDir's
    * artifacts into outDir with `ids` retracted. The verdict flips to
    * `taken_down`, the docs leave `curated.parquet` and the packing
    * (sequences are re-derived from the survivors — packed text must
    * not retain the content), and the split bookkeeping drops them —
    * but their `index.parquet` rows stay as NULL-split suppressors
    * (digest + simhash only, one-way hashes: no content is retained),
    * so a future incremental batch redelivering the same content can
    * NEVER re-admit it. Ids that are unknown or were already dropped
    * are no-ops (the suppressors they already had remain). O(corpus)
    * rewrite of the curated/packing artifacts, O(index) for the index —
    * all doc-parallel, the takedown set rides as one broadcast.
    *
    * Pack length and shard count are read back from baseDir's
    * `summary.json`, so the surviving sequences use the dials of the
    * original run without re-specifying them. */
  def runTakedown(spark: SparkSession, baseDir: String, outDir: String,
      ids: DataFrame): Result = {
    val hc = spark.sessionState.newHadoopConf()
    graft.util.Fs.mkdirs(outDir, hc)
    require(graft.util.Fs.canonical(baseDir, hc) !=
      graft.util.Fs.canonical(outDir, hc),
      "takedown outDir must differ from baseDir: the rewrite reads " +
        "baseDir's artifacts lazily")
    val summary = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.util.Fs.readString(s"$baseDir/summary.json", hc))
    val packLen = summary.path("pack_len").asInt(512)
    val packShards = summary.path("pack_shards").asInt(16)

    val takedown = ids.select(col("doc_id")).distinct()
      .withColumn("td", lit(1))
    // the verdict flips only from 'kept': a doc the original run already
    // dropped/shortened keeps its verdict (the documented no-op — its
    // content never reached the artifacts, so there is nothing to
    // retract and the summary's verdict histogram must not shift
    // between categories). The split clears only for the rows that
    // FLIPPED: verdicts.parquet carries the provisional split for
    // every doc (kept or not — curateInner assigns before verdicts
    // partition), so an ungated clear would mutate a non-kept doc's
    // row, contradicting the same no-op contract.
    val verdicts = spark.read.parquet(s"$baseDir/verdicts.parquet")
      .join(broadcast(takedown), Seq("doc_id"), "left")
      .withColumn("verdict",
        when(col("td") === 1 && col("verdict") === "kept", lit("taken_down"))
          .otherwise(col("verdict")))
      .withColumn("split",
        when(col("verdict") === "taken_down", lit(null).cast("string"))
          .otherwise(col("split")))
      .select("doc_id", "verdict", "split")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the two materializing writes fill disjoint persists (verdicts;
      // kept) and the artifacts after them are independent given those
      // caches — same concurrent-jobs posture as curateInner (guide
      // §2.6; results are byte-identical, only scheduling changes)
      val pool = artifactPool()
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val kept = spark.read.parquet(s"$baseDir/curated.parquet")
        .join(broadcast(takedown.select("doc_id")), Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val fVerdicts = Future {
          verdicts.write.mode("overwrite").parquet(s"$outDir/verdicts.parquet")
        }
        val fCurated = Future {
          zorderCurated(kept.select("doc_id", "text", "lang", "source", "split"),
              Some(summary.path("zorder_files").asInt(0)).filter(_ > 0))
            .write.mode("overwrite").partitionBy("split")
            .parquet(s"$outDir/curated.parquet")
        }
        // the fan-out below reads the persisted frames those two fill;
        // await them so nothing races a cold cache
        Await.result(fVerdicts, Duration.Inf)
        Await.result(fCurated, Duration.Inf)
        // index: retracted rows keep digest+fp but lose their split —
        // exactly the dropped-doc posture, including the one-exemplar
        // compaction per distinct (digest, fp)
        val fIndex = Future {
          val flipped = spark.read.parquet(s"$baseDir/index.parquet")
            .join(broadcast(takedown), Seq("doc_id"), "left")
            .withColumn("split",
              when(col("td") === 1, lit(null).cast("string"))
                .otherwise(col("split")))
            .select("doc_id", "digest", "fp", "split")
          writeIndex(flipped, s"$outDir/index.parquet")
        }
        val fPacking = Future {
          writePacking(
            kept.withColumn("n_tok", expr(s"cast(size($toks) as bigint)")),
            s"$outDir/packing.parquet", packLen, packShards)
        }
        // curriculum is a DERIVED artifact of the kept train set:
        // after a retraction the positions must be re-derived (they
        // are dense ranks — keeping the base file would leave holes
        // and leak that a doc existed), same dial as the base run
        val fCurriculum = Future {
          if (summary.path("curriculum").asBoolean(false))
            graft.queries.Documents.curriculumOrder(
                kept.filter(col("split") === "train").select("doc_id", "text"))
              .write.mode("overwrite").parquet(s"$outDir/curriculum.parquet")
        }
        val fCounts = Future {
          verdicts.groupBy("verdict").count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        val fSplits = Future {
          kept.groupBy("split").count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        val counts = Await.result(fCounts, Duration.Inf)
        val splits = Await.result(fSplits, Duration.Inf)
        Await.result(fIndex, Duration.Inf)
        Await.result(fPacking, Duration.Inf)
        Await.result(fCurriculum, Duration.Inf)
        // the ingestion dials carry through from the base summary: a
        // takedown output is a valid baseDir for later incremental
        // runs, and dropping the keys here would break the
        // keep-the-dial-constant audit record mid-chain
        graft.util.Fs.writeStringAtomic(s"$outDir/summary.json",
          s"""{"verdicts":${jsonObj(counts)},"splits":${jsonObj(splits)},""" +
            s""""min_tokens":${summary.path("min_tokens").asInt(5)},""" +
            s""""pack_len":$packLen,"pack_shards":$packShards,""" +
            s""""scrub_pii":${summary.path("scrub_pii").asBoolean(false)},""" +
            s""""strip_boilerplate":${summary.path("strip_boilerplate").asInt(0)},""" +
            s""""source_cap":${summary.path("source_cap").asInt(0)},""" +
            s""""keep_longest":${summary.path("keep_longest").asBoolean(false)},""" +
            s""""curriculum":${summary.path("curriculum").asBoolean(false)},""" +
            s""""zorder_files":${summary.path("zorder_files").asInt(0)},""" +
            s""""decontaminate":${summary.path("decontaminate").asBoolean(false)}}\n""",
          hc)
        // governance card over what SURVIVES — the numbers shipped with
        // the post-takedown artifacts. A takedown that retracts EVERY
        // kept doc is legal; the card degenerates to n_docs=0 instead
        // of tripping dataCard's aggregates-over-nothing NULLs.
        val cardMetrics =
          if (splits.values.sum == 0L) Map("n_docs" -> 0L)
          else graft.report.DataCard.metricsOf(kept)
        graft.util.Fs.writeStringAtomic(s"$outDir/card.json",
          jsonObj(cardMetrics) + "\n", hc)
        Result(counts, splits)
      } finally { kept.unpersist(blocking = true); pool.shutdown(); () }
    } finally { verdicts.unpersist(blocking = true); () }
  }

  /** The artifact fan-out's driver pool: four threads is enough to
    * back-fill stage tails without jobs fighting for executors (the
    * guide's 2-3-in-flight advice, plus one for the driver-side
    * collect chain). DAEMON threads: an exception on the main path may
    * skip the shutdown, and a leaked non-daemon pool would pin the CLI
    * JVM at exit. */
  private val ArtifactPoolSize = 4

  private def artifactPool(): java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(ArtifactPoolSize,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"curate-artifact-${n.incrementAndGet()}")
          t.setDaemon(true); t
        }
      })

  private def curate(spark: SparkSession, docs: DataFrame,
      baseIndex: Option[DataFrame], outDir: String, cfg: Config): Result = {
    graft.util.Fs.mkdirs(outDir, spark.sessionState.newHadoopConf())
    // Curate owns its frames' lifecycle: releases collect HERE and run
    // in a finally (a failed write must not pin MEMORY_AND_DISK frames
    // for the rest of the session) — never the process-global QueryDef
    // queue, which belongs to the query harnesses and may hold cleanups
    // of unrelated in-flight compositions
    val cleanups = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    try curateInner(spark, docs, baseIndex, outDir, cfg, cleanups)
    finally cleanups.foreach { f =>
      try f() catch { case e: Throwable =>
        System.err.println(s"[curate] cleanup: ${e.getMessage}") }
    }
  }

  private def curateInner(spark: SparkSession, docs0: DataFrame,
      baseIndex: Option[DataFrame], outDir: String, cfg: Config,
      cleanups: scala.collection.mutable.ArrayBuffer[() => Unit]): Result = {

    // PII redaction happens ONCE, at ingestion, so every signal below
    // operates on the corpus that will actually be trained on — the
    // d22-oracled scrub expression (shared definition, cannot drift).
    // A map-only column rewrite: no extra shuffle, pipelines into the
    // digest/fingerprint scans
    val scrubbed =
      if (cfg.scrubPii)
        docs0.withColumn("text", queries.Documents.scrubPii(col("text")))
      else docs0
    // boilerplate stripping AFTER the scrub (a footer whose only
    // variation was PII folds into one line and trips the floor) — the
    // d23-oracled scheme (shared definition). Unlike the scrub this
    // costs a line-count pass + a reassembly shuffle, and the result
    // feeds several consumers below (digests, fingerprints, verdict
    // projection, card metrics) — persist it or each consumer re-pays
    // the rewrite. When BOTH dials are on, the scrubbed input is
    // persisted too: the strip consumes it three times (line explode,
    // doc count, join-back), and each consumption would otherwise
    // re-run the corpus-scale regex rewrites
    val docs = cfg.stripBoilerplateDenom match {
      case None => scrubbed
      case Some(d) =>
        val src =
          if (cfg.scrubPii) {
            val p = scrubbed
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            cleanups += (() => { p.unpersist(false); () })
            p
          } else scrubbed
        val s = queries.Documents.stripBoilerplate(src, d, f => cleanups += f)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cleanups += (() => { s.unpersist(false); () })
        s
    }

    // digest frame is consumed by the exact-dup self-join, the index
    // artifact, and (incrementally) the base probe — persist the
    // 16-byte rows once rather than re-hashing all text per consumer
    val digests = docs.select(col("doc_id"), md5(col("text")).as("digest"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cleanups += (() => { digests.unpersist(false); () })

    // exact-dup losers: every doc_id of a digest group except the min.
    // Shaped as digest-frame + groupBy + join back (16-byte shuffle
    // rows, no per-group array — a degenerate million-copy group stays
    // O(1) per row)
    val exactLosers = digests
      .join(digests.groupBy("digest").agg(min("doc_id").as("keep_id")),
        Seq("digest"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit("exact_dup").as("v_exact"))

    // fingerprints are consumed by the cluster pipeline, the index
    // artifact, and (incrementally) the base probe — one persist
    val fps = queries.TextMedia.simhashFingerprintsOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cleanups += (() => { fps.unpersist(false); () })

    // base-corpus verdicts (incremental mode only): digest probe +
    // banded fp probe against the index, priority to the exact match.
    // The index holds every doc the pipeline ever EXAMINED (kept and
    // dropped), so redelivered content that was dropped before is
    // suppressed as dup_of_base/near_dup_base instead of re-admitted.
    val baseVerdicts: Option[DataFrame] = baseIndex.map { base =>
      val b = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cleanups += (() => { b.unpersist(false); () })
      val dupOfBase = digests
        .join(b.select("digest").distinct(), Seq("digest"))
        .select(col("doc_id"), lit(0).as("pri"))
      // distinct fps only (mirroring the digest probe's distinct): the
      // every-examined-doc index accumulates duplicate fps across
      // redeliveries, and the probe's fan-out must scale with distinct
      // content, not docs-ever-examined
      val baseBands = queries.TextMedia
        .fpBands(b.filter(col("fp").isNotNull).select("fp").distinct()
          .withColumn("fp_b", col("fp")), "fp_b")
        .select(col("fp_b"), col("bi").as("bi2"), col("bv").as("bv2"))
      val nearBase = queries.TextMedia.fpBands(fps, "doc_id")
        .join(baseBands,
          col("bi") === col("bi2") && col("bv") === col("bv2") &&
            expr("bit_count(fp ^ fp_b)") <= cfg.baseHamming)
        .select(col("doc_id"), lit(1).as("pri"))
      dupOfBase.union(nearBase)
        .groupBy("doc_id").agg(min("pri").as("pri"))
        .select(col("doc_id"),
          when(col("pri") === 0, lit("dup_of_base"))
            .otherwise(lit("near_dup_base")).as("v_base"))
    }

    // near-dup cluster verdicts over THIS corpus (persisted +
    // materialized inside dupClustersOf; release collected locally)
    val clusters = queries.TextMedia.dupClustersOf(fps, f => cleanups += f)

    // repetition signal only when the gate is on — the d18 expression
    // is per-row but not free (a sort over the doc's 2-grams)
    val repCol = cfg.maxRep2gramPermille match {
      case None => lit(0L)
      case Some(_) => expr(queries.Documents.dup2gramPermilleExpr)
    }
    val withCluster = docs
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        expr(s"cast(size($toks) as bigint)").as("n_tok"),
        repCol.as("rep2_permille"))
      .join(exactLosers, Seq("doc_id"), "left")
      .join(clusters.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
    // canonical election per dup cluster among QUALITY-PASSING members
    // (so a cluster whose best candidate flunks the quality gate still
    // keeps its best passing representative — previously the whole
    // cluster was lost: canonical → low_quality, everyone else →
    // near_dup). The election rule is a dial: min doc_id (historical
    // default) or keep-LONGEST (c20's convention — max length(text),
    // ties to the smaller doc_id; length is measured on the live
    // post-scrub/strip text, c20's n_chars semantics). Either way it is
    // one cluster-keyed map-side-combinable aggregation over cluster
    // members only, joined back on the cluster id — bounded by cluster
    // count, never corpus-wide, and never a per-cluster window (c20's
    // max(struct) argmax)
    val repCeil = cfg.maxRep2gramPermille.map(_.toLong).getOrElse(1001L)
    val qualified = withCluster
      .filter(col("cluster_id").isNotNull && col("text").isNotNull &&
        col("n_tok") >= cfg.minTokens && col("rep2_permille") <= repCeil)
    val canons =
      if (cfg.keepLongest)
        qualified.groupBy("cluster_id")
          .agg(max(struct(length(col("text")).as("l"),
            (-col("doc_id")).as("nid"))).as("best"))
          .select(col("cluster_id"), (-col("best.nid")).as("canon"))
      else
        qualified.groupBy("cluster_id").agg(min("doc_id").as("canon"))
    val joined = withCluster.join(canons, Seq("cluster_id"), "left")
    val withBase = baseVerdicts
      .map(bv => joined.join(bv, Seq("doc_id"), "left"))
      .getOrElse(joined.withColumn("v_base", lit(null).cast("string")))

    // NULL text is explicitly low_quality: md5/size/n_tok are all NULL
    // for it, so every other CASE test would be unknown and fall
    // through to 'kept' — quarantining nothing-to-train-on rows is the
    // only verdict that reconciles. A cluster with no quality-passing
    // member has canon NULL: no member is near_dup, all fall through to
    // low_quality
    val verdicts = withBase
      .withColumn("verdict", expr(s"""
        CASE WHEN v_base IS NOT NULL THEN v_base
             WHEN v_exact IS NOT NULL THEN 'exact_dup'
             WHEN cluster_id IS NOT NULL AND canon IS NOT NULL
                  AND doc_id != canon THEN 'near_dup'
             WHEN text IS NULL OR n_tok < ${cfg.minTokens}
                  OR rep2_permille > $repCeil THEN 'low_quality'
             ELSE 'kept' END"""))
      .withColumn("split_cluster", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", expr(queries.TextMedia.splitAssignExprN(
        "split_cluster", cfg.testSixteenths, cfg.valSixteenths)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cleanups += (() => { verdicts.unpersist(false); () })

    // per-source contribution cap LAST (opt-in): each source may keep
    // at most sourceCapPermille of THIS run's kept docs — the
    // d24-oracled scheme, SAME definition (sourceCapDrops), applied
    // over the kept set so dedup/quality drops don't consume cap
    // slots. Only previously-'kept' docs can flip (the drop list is
    // computed from the kept set), so every other verdict — and the
    // takedown no-op contract — is untouched. The flip happens BEFORE
    // any artifact is written: curated, packing, the index's
    // NULL-split suppressors, and the summary all see the capped
    // corpus. Persisted: four consumers below would otherwise re-run
    // the rank window per read.
    //
    // DELIBERATELY single-pass, not a fixed point: the cap is N
    // permille of the PRE-cap kept total, and the flips are not
    // re-normalized. A source that dominated the kept set (say 90%)
    // can therefore still exceed N permille of the FINAL kept set —
    // e.g. 100 kept docs, one source holding 90, cap 300‰: it keeps
    // 30 of 70 survivors ≈ 429‰. This matches the C4/CCNet posture
    // (the cap bounds a source's absolute volume against the
    // snapshot, a stable, order-independent base) and keeps the drop
    // list oracle-able (d24); iterating to a fixed point would make
    // each source's retention depend on every other source's, and the
    // result would no longer be a per-source rank cut.
    // external-benchmark decontamination (opt-in, BEFORE the source
    // cap so the cap counts the clean kept set): kept docs with a
    // MinHash near-dup in the eval corpus flip to 'eval_contaminated'
    // — the fuzzy-level screen c03/c18's exact n-grams miss, the SAME
    // definition as the oracled m07 (Similarity.crossNearDupPairs).
    // Only the KEPT set is screened (a dropped doc can't leak), and
    // flipped docs' digest/fp rows become NULL-split suppressors in
    // the index below — redelivered copies are never re-admitted, the
    // takedown posture.
    val screened = cfg.decontaminateDir match {
      case None => verdicts
      case Some(evalDir) =>
        val hits = queries.Similarity.crossNearDupPairs(
            verdicts.filter(col("verdict") === "kept")
              .select("doc_id", "text"),
            loadDocs(spark, evalDir).select("doc_id", "text"),
            f => cleanups += f)
          .select(col("train_id").as("doc_id")).distinct()
          .withColumn("contaminated", lit(true))
        val v = verdicts.join(hits, Seq("doc_id"), "left")
          .withColumn("verdict",
            when(col("contaminated"), lit("eval_contaminated"))
              .otherwise(col("verdict")))
          .drop("contaminated")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cleanups += (() => { v.unpersist(false); () })
        v
    }

    val finalVerdicts = cfg.sourceCapPermille match {
      case None => screened
      case Some(p) =>
        val drops = queries.Documents.sourceCapDrops(
            screened.filter(col("verdict") === "kept")
              .select("doc_id", "source"), p, f => cleanups += f)
          .select(col("doc_id"), lit(true).as("src_capped"))
        val v = screened.join(drops, Seq("doc_id"), "left")
          .withColumn("verdict",
            when(col("src_capped"), lit("source_capped"))
              .otherwise(col("verdict")))
          .drop("src_capped")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cleanups += (() => { v.unpersist(false); () })
        v
    }

    // the verdicts write runs FIRST and alone: it materializes the
    // finalVerdicts persist (and the digest/fp/cluster caches feeding
    // it) exactly once, so the concurrent consumers below read warm
    // caches instead of racing to compute the same cold lineage
    finalVerdicts.select("doc_id", "verdict", "split")
      .write.mode("overwrite").parquet(s"$outDir/verdicts.parquet")

    val kept = finalVerdicts.filter(col("verdict") === "kept")

    // The remaining artifacts are INDEPENDENT given the persisted
    // frames (finalVerdicts, digests, fps) and the raw corpus, so they
    // run as concurrent jobs from a small driver pool (guide §2.6 —
    // actions are only sequential because driver code calls them
    // sequentially): the curated/index/packing writes and the card's
    // corpus scan back-fill each other's scheduling gaps and stage
    // tails instead of paying ~each job's latency end to end. Results
    // are byte-identical — concurrency changes when jobs run, not what
    // any of them computes.
    val hc = spark.sessionState.newHadoopConf()
    val pool = artifactPool()
    val (counts, splits, cardMetrics) = try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)

      val fCurated = scala.concurrent.Future {
        zorderCurated(kept.select("doc_id", "text", "lang", "source", "split"),
            cfg.zorderFiles)
          .write.mode("overwrite").partitionBy("split")
          .parquet(s"$outDir/curated.parquet")
      }

      // corpus index for future incremental runs: base ∪ every doc this
      // run examined. Dropped docs carry a NULL split — their digests and
      // fingerprints still suppress redelivery, but they never influence
      // split bookkeeping. The dropped portion is COMPACTED to one
      // exemplar (min doc_id) per distinct (digest, fp): suppression only
      // tests digest membership and fp proximity, so duplicate
      // (digest, fp) rows add nothing, and without the compaction pure
      // redelivery (same content, fresh doc_ids daily) would grow the
      // index without bound. Kept rows stay un-compacted — split
      // bookkeeping needs every kept doc_id
      val fIndex = scala.concurrent.Future {
        val examinedIndex = finalVerdicts
          .select(col("doc_id"),
            when(col("verdict") === "kept", col("split"))
              .otherwise(lit(null).cast("string")).as("split"))
          .join(digests, Seq("doc_id"))
          .join(fps, Seq("doc_id"), "left")
          .select(col("doc_id"), col("digest"), col("fp"), col("split"))
        val fullIndex = baseIndex
          .map(b => b.select("doc_id", "digest", "fp", "split").union(examinedIndex))
          .getOrElse(examinedIndex)
        writeIndex(fullIndex, s"$outDir/index.parquet")
      }

      // summary maps → packing (needs the derived shard count) →
      // summary.json: one sequential chain inside its own future.
      // ONE aggregation feeds both maps (r20: the split histogram is
      // the verdict histogram's kept stratum)
      val fSummary = scala.concurrent.Future {
        val vsRows = finalVerdicts.groupBy("verdict", "split").count().collect()
        val cts = vsRows.groupBy(_.getString(0))
          .map { case (v, rs) => v -> rs.map(_.getLong(2)).sum }
        val spl = vsRows.filter(_.getString(0) == "kept")
          .map(r => r.getString(1) -> r.getLong(2)).toMap
        val shards = cfg.packShards.getOrElse(
          deriveShards(cts.getOrElse("kept", 0L)))
        writePacking(kept, s"$outDir/packing.parquet", cfg.packLen, shards)
        // the ingestion dials ride in the summary so a chain consumer can
        // AUDIT the keep-them-constant rule across generations (0 = off)
        graft.util.Fs.writeStringAtomic(s"$outDir/summary.json",
          s"""{"verdicts":${jsonObj(cts)},"splits":${jsonObj(spl)},""" +
            s""""min_tokens":${cfg.minTokens},"pack_len":${cfg.packLen},""" +
            s""""pack_shards":$shards,"scrub_pii":${cfg.scrubPii},""" +
            s""""strip_boilerplate":${cfg.stripBoilerplateDenom.getOrElse(0)},""" +
            s""""source_cap":${cfg.sourceCapPermille.getOrElse(0)},""" +
            s""""keep_longest":${cfg.keepLongest},""" +
            s""""curriculum":${cfg.curriculum},""" +
            s""""zorder_files":${cfg.zorderFiles.getOrElse(0)},""" +
            s""""decontaminate":${cfg.decontaminateDir.nonEmpty}}\n""",
          hc)
        (cts, spl)
      }

      // training order over the TRAIN split only (test/val are never
      // trained on) — c22's exact scheme via the shared definition, so
      // the artifact and the oracled query cannot drift. Positions are
      // dense 1..n_train and derive from doc_id + tier alone: a re-run
      // over the same kept set reproduces them bit-for-bit
      val fCurriculum = scala.concurrent.Future {
        if (cfg.curriculum)
          graft.queries.Documents.curriculumOrder(
              kept.filter(col("split") === "train").select("doc_id", "text"))
            .write.mode("overwrite").parquet(s"$outDir/curriculum.parquet")
      }

      // dataset card for the INPUT corpus this run examined — the same
      // oracle-checked c15 relation (report.DataCard), so the governance
      // numbers shipped with the artifacts can't drift from the verified
      // query
      val fCard = scala.concurrent.Future {
        graft.report.DataCard.metricsOf(docs)
      }

      import scala.concurrent.Await
      import scala.concurrent.duration.Duration
      val (cts, spl) = Await.result(fSummary, Duration.Inf)
      val card = Await.result(fCard, Duration.Inf)
      Await.result(fCurated, Duration.Inf)
      Await.result(fIndex, Duration.Inf)
      Await.result(fCurriculum, Duration.Inf)
      (cts, spl, card)
    } finally { pool.shutdown() }

    graft.util.Fs.writeStringAtomic(s"$outDir/card.json",
      jsonObj(cardMetrics) + "\n", hc)
    Result(counts, splits)
  }

  /** c09 packing per (split, shard): kept docs only. */
  private def writePacking(kept: DataFrame, path: String, L: Int,
      shards: Int): Unit = {
    val packed = kept
      .select(col("split"), col("doc_id"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)" +
          s" % $shards").as("shard"),
        col("n_tok"))
      .filter(col("n_tok") > 0)
    val w = Window.partitionBy("split", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed
      .withColumn("fin", sum("n_tok").over(w))
      .withColumn("st", col("fin") - col("n_tok"))
      .select(col("split"), col("shard"), col("st"), col("fin"),
        explode(expr(s"sequence(st div $L, (fin - 1) div $L)")).as("seq"))
      .groupBy("split", "shard", "seq")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("fin"), (col("seq") + 1) * L) -
          greatest(col("st"), col("seq") * L)).cast("long").as("n_tokens"))
      .write.mode("overwrite").parquet(path)
  }

  /** CLI argument split: `--key=value` flags (position-independent)
    * vs positionals. Supported flags: `--rep=<permille>` turns on the
    * d18-backed repetition gate ([[Config.maxRep2gramPermille]]);
    * `--scrub-pii` turns on the d22-backed PII redaction
    * ([[Config.scrubPii]] — keep it constant across a chain);
    * `--strip-boilerplate=<denom>` turns on the d23-backed boilerplate
    * line removal ([[Config.stripBoilerplateDenom]], same chain rule);
    * `--takedown=<ids>` switches the run to [[runTakedown]] (the
    * positionals become baseDir outDir; <ids> is a parquet dir with a
    * doc_id column, or a text file of one id per line). Unknown flags
    * fail loudly — a typo must not silently curate with default
    * dials. */
  private[graft] def parseArgs(args: Array[String])
      : (Array[String], Config, Option[String]) = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    var cfg = Config(minTokens = if (pos.length > 2) pos(2).toInt else 5)
    var takedown: Option[String] = None
    flags.foreach {
      case f if f.startsWith("--rep=") =>
        cfg = cfg.copy(maxRep2gramPermille = Some(f.stripPrefix("--rep=").toInt))
      case "--scrub-pii" =>
        cfg = cfg.copy(scrubPii = true)
      case f if f.startsWith("--strip-boilerplate=") =>
        cfg = cfg.copy(stripBoilerplateDenom =
          Some(f.stripPrefix("--strip-boilerplate=").toInt))
      case f if f.startsWith("--source-cap=") =>
        cfg = cfg.copy(sourceCapPermille =
          Some(f.stripPrefix("--source-cap=").toInt))
      case "--keep-longest" =>
        cfg = cfg.copy(keepLongest = true)
      case "--curriculum" =>
        cfg = cfg.copy(curriculum = true)
      case f if f.startsWith("--zorder-files=") =>
        cfg = cfg.copy(zorderFiles =
          Some(f.stripPrefix("--zorder-files=").toInt))
      case f if f.startsWith("--decontaminate=") =>
        cfg = cfg.copy(decontaminateDir =
          Some(f.stripPrefix("--decontaminate=")))
      case f if f.startsWith("--takedown=") =>
        takedown = Some(f.stripPrefix("--takedown="))
      case f => throw new IllegalArgumentException(
        s"unknown flag $f (supported: --rep=<permille>, --scrub-pii, " +
          "--strip-boilerplate=<denom>, --source-cap=<permille>, " +
          "--keep-longest, --curriculum, --zorder-files=<n>, " +
          "--decontaminate=<evalDir>, --takedown=<ids>)")
    }
    (pos, cfg, takedown)
  }

  /** The Config.zorderFiles layout, applied identically by run and
    * runTakedown (the dial must survive a takedown rewrite — the
    * summary carries it): Morton key over (n_chars, doc_id folded mod
    * 2³¹), ZValue.layout's range-partition + sort, None/0 = passthrough.
    * The coordinates are recomputed each write, never persisted — a
    * stored z key could silently go stale against an edited text. */
  private def zorderCurated(df: DataFrame,
      files: Option[Int]): DataFrame = files match {
    case Some(n) if n > 0 =>
      graft.functions.ZValue.layout(df,
        coalesce(length(col("text")).cast("long"), lit(0L)),
        pmod(col("doc_id"), lit(1L << 31)), n)
    case _ => df
  }

  /** Takedown id list: a parquet dir (doc_id column) or a text file of
    * one decimal id per line (comments/blanks skipped) — the shape a
    * legal request actually arrives in. */
  private[graft] def loadTakedownIds(spark: SparkSession,
      path: String): DataFrame = {
    import spark.implicits._
    val hc = spark.sessionState.newHadoopConf()
    if (graft.util.Fs.exists(s"$path/_SUCCESS", hc) ||
        path.endsWith(".parquet"))
      spark.read.parquet(path).select(col("doc_id").cast("long").as("doc_id"))
    else
      spark.read.textFile(path)
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(_.toLong).toDF("doc_id")
  }

  def main(args: Array[String]): Unit = {
    val (pos, cfg, takedown) = parseArgs(args)
    val spark = GraftSession.build("graft-curate")
    val r = takedown match {
      case Some(idsPath) =>
        require(pos.length >= 2,
          "takedown usage: Curate --takedown=<ids> <baseDir> <outDir>")
        runTakedown(spark, pos(0), pos(1), loadTakedownIds(spark, idsPath))
      case None =>
        val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.001")
        val outDir = if (pos.length > 1) pos(1) else "/tmp/graft_curate"
        if (pos.length > 3) runIncremental(spark, sfDir, pos(3), outDir, cfg)
        else run(spark, sfDir, outDir, cfg)
    }
    val outDir = takedown.map(_ => pos(1))
      .getOrElse(if (pos.length > 1) pos(1) else "/tmp/graft_curate")
    println(s"[curate] verdicts=${r.counts} splits=${r.splits} -> $outDir")
    spark.stop()
  }
}
