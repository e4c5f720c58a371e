package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data text pipeline over the `documents` table: exact
  * dedup, token statistics, quality scoring, content fingerprinting,
  * language histograms.
  *
  * These extend the reference's surface (harbourbridge has no text
  * analytics; SURVEY.md §2.7) with the operators a 100 TB pre-training
  * corpus pipeline needs. Every query is a declarative scan→agg pipeline:
  * dedup is hash-groupBy (map-side combine keeps shuffle volume at
  * |unique| not |rows|), fingerprinting is a deterministic per-row
  * expression, nothing collects to the driver.
  *
  * Determinism/oracle notes: tokenization splits on the EXPLICIT
  * whitespace class `[ \t\n\r\f]+` with empty tokens dropped — spelled
  * out because Java's `\s` (Spark) and RE2's `\s` (DuckDB) disagree on
  * U+000B, so the metacharacter is only parity-safe on ASCII-space-only
  * corpora while the explicit class is parity-safe everywhere; md5 hex
  * is identical across engines; ratios are integer permille
  * (x*1000 div y), never floats. Residual non-ASCII caveat: `lower()`
  * still follows each engine's Unicode tables (e.g. 'İ'), so queries
  * that lowercase before tokenizing keep an ASCII-letters assumption.
  */
object Documents {
  import QueryDef.table

  /** Whitespace tokens, empties dropped (parity: DuckDB
    * list_filter(string_split_regex(text,'[ \t\n\r\f]+'), t -> t <> '')).
    * Explicit class, not \s — see the object Scaladoc. */
  private val toks = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"
  private val stopArr = "array('the','a','of','to','and')"

  /** d18's 2-gram machinery, factored to shared pieces so the oracled
    * query and Curate's quality gate compute the SAME scheme. `tk` is
    * the bound token-array name, `s` the bound sorted-grams name. */
  private[graft] val sorted2GramsExpr =
    "array_sort(transform(sequence(0, size(tk) - 2), i -> concat(tk[i], ' ', tk[i + 1])))"
  private[graft] val gramSingletonCountExpr = """
    CAST(size(filter(sequence(0, size(s) - 1),
      i -> (i = 0 OR s[i] != s[i - 1])
       AND (i = size(s) - 1 OR s[i] != s[i + 1]))) AS BIGINT)"""

  /** Duplicate-2gram occupancy (d18's `dup2_permille`) as ONE
    * self-contained expression over `text` — integer permille, docs
    * under 2 tokens score 0 (no signal). The singleton-array transforms
    * are let-bindings: tk and s are bound once each, not recomputed per
    * reference. Built from the same shared pieces as the d18 QueryDef,
    * so the oracle-verified signal and any consumer (Curate's
    * repetition gate) cannot drift. */
  private[graft] val dup2gramPermilleExpr: String =
    s"""element_at(transform(array($toks), tk ->
          CASE WHEN size(tk) < 2 THEN CAST(0 AS BIGINT)
               ELSE element_at(transform(array($sorted2GramsExpr), s ->
                 (CAST(size(s) AS BIGINT) - $gramSingletonCountExpr)
                   * 1000 div CAST(size(s) AS BIGINT)), 1)
               END), 1)"""

  /** d22's PII scheme, factored like [[dup2gramPermilleExpr]] so the
    * oracled query and any consumer (Curate's `--scrub-pii` stage)
    * compute the SAME redaction. ASCII-explicit classes only — Java
    * regex (Spark) and RE2 (DuckDB) agree on every construct used; no
    * \d/\w/\b metacharacters. */
  private[graft] val piiEmailPattern =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val piiPhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact PII in place: emails first, then phones — one definition
    * of the order, because a pattern change that made them overlap
    * would otherwise produce consumer-dependent output. */
  private[graft] def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, piiEmailPattern, "<EMAIL>"),
      piiPhonePattern, "<PHONE>")

  /** d23's boilerplate scheme, factored like [[scrubPii]] so the
    * oracled query and any consumer (Curate's `--strip-boilerplate`
    * stage) mark the SAME lines: split on newline, key line-frequency
    * counts by md5(line) (fixed 32-char shuffle key instead of
    * arbitrary-length text), and flag lines present in MORE THAN
    * 1/denom of all docs — exact integer cross-multiplication, the
    * SF-invariant relative floor. EMPTY lines never qualify: in any
    * multi-paragraph corpus the "" separator trivially clears the
    * floor, and marking it would strip every paragraph break
    * corpus-wide (and fold docs differing only in break placement) —
    * the reason Dolma/CCNet-class schemes exclude empty/short lines
    * from the candidate set. Returns (doc_id, pos, line, b) with b
    * true on boilerplate rows; the qualifying set is structurally tiny
    * (> total/denom distinct docs per line caps it at denom x mean
    * lines-per-doc) and broadcasts. `registerCleanup` receives the
    * release of the internal lines persist — the frame feeds both the
    * frequency aggregation (the broadcast-side job) and the mark join,
    * and without the persist the doc scan + line explode + md5 run
    * once per job. */
  private[graft] def markedBoilerplateLines(docs: DataFrame,
      denom: Int = 40,
      registerCleanup: (() => Unit) => Unit = _ => ()): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .select(col("doc_id"), col("pos"), col("col").as("line"),
        md5(col("col")).as("lh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registerCleanup(() => { lines.unpersist(false); () })
    val total = docs.agg(count(lit(1)).as("n"))
    val boiler = lines.filter(col("line") =!= "").groupBy("lh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .crossJoin(broadcast(total))
      .filter(col("nd") * denom > col("n"))
      .select(col("lh"), lit(true).as("b"))
    lines.join(broadcast(boiler), Seq("lh"), "left")
      .select(col("doc_id"), col("pos"), col("line"), col("b"))
  }

  /** Strip boilerplate lines and reassemble each doc in original line
    * order, preserving every other column — the Curate ingestion
    * stage. A fully-boilerplate doc comes back as "" (its n_tok 0 then
    * fails any quality gate, the verdict that reconciles); a NULL-text
    * doc STAYS NULL (posexplode drops it, the left join misses, and
    * the text column is taken from the miss) — coalescing it to ""
    * would give every NULL-text doc the identical md5 digest and
    * reclassify the quarantine class as exact dups of each other.
    * Reassembly is the one corpus-scale shuffle (per-doc grouping
    * carries the kept text); the join back to `docs` is id-keyed. */
  private[graft] def stripBoilerplate(docs: DataFrame,
      denom: Int = 40,
      registerCleanup: (() => Unit) => Unit = _ => ()): DataFrame = {
    val cleaned = markedBoilerplateLines(docs, denom, registerCleanup)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(when(col("b").isNull,
          struct(col("pos"), col("line"))))),
        x => x.getField("line")), "\n").as("boiler_clean_text"))
    docs.join(cleaned, Seq("doc_id"), "left")
      .withColumn("text", col("boiler_clean_text"))
      .drop("boiler_clean_text")
  }

  /** d24's per-source contribution cap, factored to ONE definition so
    * the oracled query and Curate's --source-cap stage cannot drift:
    * each source may contribute at most `permille`/1000 of the INPUT
    * frame's rows; retention inside an over-cap source is hash-ordered
    * by md5(doc_id) (the c02 reproducible uniform down-sample — a
    * quality-ordered cut would bias the survivors). Returns the DROP
    * list (doc_id, source, rk, cap).
    *
    * Shuffle shape: ONE counting scan (the corpus total is the sum of
    * the source-sized per-source counts — persisted, released through
    * `registerCleanup`); only OVER-CAP sources join back by broadcast,
    * so under-cap sources never enter the rank window. The window's
    * dynamic (data-derived) threshold is why WindowGroupLimit cannot
    * pre-truncate it. rk is cast to BIGINT BEFORE the
    * cross-multiplication — row_number is a 32-bit int and rk*1000
    * wraps beyond ~2.1M docs in one source. */
  private[graft] def sourceCapDrops(docs: DataFrame, permille: Int,
      registerCleanup: (() => Unit) => Unit = _ => ()): DataFrame = {
    require(permille >= 1 && permille <= 999,
      s"source cap must be a permille in [1,999], got $permille")
    import org.apache.spark.sql.expressions.Window
    val perSrc = docs.groupBy("source")
      .agg(count(lit(1)).as("n_src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registerCleanup(() => { perSrc.unpersist(false); () })
    val total = perSrc.groupBy().agg(sum("n_src").as("n_total"))
    val overCap = perSrc
      .crossJoin(broadcast(total))
      .filter(expr(s"n_src * 1000 > n_total * $permille"))
      .select(col("source"), col("n_total"))
    docs.select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("hk"))
      .join(broadcast(overCap), Seq("source"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("hk")).cast("long"))
      .filter(expr(s"rk * 1000 > n_total * $permille"))
      .select(col("doc_id"), col("source"), col("rk"),
        expr(s"cast(n_total * $permille div 1000 as bigint)").as("cap"))
  }

  /** d25's drift arithmetic over a (lang, old_n, new_n) counts frame,
    * factored to ONE definition so the oracled query and the
    * generation-monitoring API (report.DataCard.drift) cannot drift:
    * per-language shares in exact ppm, signed deltas, and a '_TOTAL'
    * row whose delta is the total-variation distance. The CALLER
    * persists `perLang` — it feeds the shares branch, the 1-row
    * totals, and the summary's re-aggregation, and without the persist
    * whatever produced the counts re-runs once per branch. Output is
    * ordered by lang ('_' sorts before every lowercase lang code in
    * binary collation, so the summary row's position is
    * deterministic). */
  private[graft] def driftFromCounts(perLang: DataFrame): DataFrame = {
    val tot = perLang.groupBy()
      .agg(sum("old_n").as("old_t"), sum("new_n").as("new_t"))
    // an empty snapshot side (a <2-doc corpus under the parity split,
    // or a first generation) yields old_t/new_t = 0: Spark's div would
    // return NULL where DuckDB's // ERRORS — guard both engines to the
    // defined convention "share of an empty snapshot = 0 ppm"
    // (DataCard.drift additionally refuses empty sides up front; this
    // keeps the shared arithmetic total on degenerate input)
    val shares = perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("old_n"), col("new_n"),
        expr("CASE WHEN old_t > 0 THEN old_n * 1000000 div old_t " +
          "ELSE 0L END").as("old_ppm"),
        expr("CASE WHEN new_t > 0 THEN new_n * 1000000 div new_t " +
          "ELSE 0L END").as("new_ppm"))
      .withColumn("delta_ppm", col("new_ppm") - col("old_ppm"))
    val summary = shares.groupBy()
      .agg(sum("old_n").as("old_n"), sum("new_n").as("new_n"),
        sum(abs(col("delta_ppm"))).as("l1"))
      .select(lit("_TOTAL").as("lang"), col("old_n"), col("new_n"),
        lit(1000000L).as("old_ppm"), lit(1000000L).as("new_ppm"),
        expr("l1 div 2").as("delta_ppm"))
    shares.unionByName(summary).orderBy("lang")
  }

  /** c22's arithmetic — ONE definition shared with Curate's
    * --curriculum artifact (driftFromCounts' pattern). Input needs
    * (doc_id, text); output (doc_id, tier, pos) — d03's exact quality
    * tiers (good → fair → poor), md5 hash-shuffle within tier, and a
    * GLOBAL 1-based position computed WITHOUT a corpus-wide window:
    * rank windows are partitioned by (tier, first-md5-byte shard) —
    * shard is a PREFIX of the order key, so (shard, h) order ≡ h order
    * and ~768 windows run in parallel; global offsets come from one
    * cumulative sum over the tiny (tier, shard) count frame (the
    * single-partition window there is deliberate: ≤768 rows). */
  private[graft] def curriculumOrder(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tiered = docs.select(col("doc_id"),
        expr(s"size($toks)").cast("bigint").as("n_tokens"),
        expr(s"size(filter($toks, t -> array_contains($stopArr, t)))")
          .cast("bigint").as("n_stop"))
      .withColumn("stop_permille",
        when(col("n_tokens") > 0,
          expr("n_stop * 1000 div n_tokens")).otherwise(lit(0L)))
      .withColumn("tier",
        when(col("n_tokens") >= 40 &&
             col("stop_permille").between(20, 400), "good")
          .when(col("n_tokens") >= 15, "fair")
          .otherwise("poor"))
      .withColumn("tr",
        when(col("tier") === "good", 0).when(col("tier") === "fair", 1)
          .otherwise(2))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("shard", substring(col("h"), 1, 2))
    val ranked = tiered.withColumn("rk",
      row_number().over(Window.partitionBy("tr", "shard")
        .orderBy(col("h"), col("doc_id"))))
    val offsets = tiered.groupBy("tr", "shard")
      .agg(count(lit(1)).as("n"))
      .withColumn("off",
        sum("n").over(Window.orderBy(col("tr"), col("shard"))) - col("n"))
      .select("tr", "shard", "off")
    ranked.join(broadcast(offsets), Seq("tr", "shard"))
      .select(col("doc_id"), col("tier"),
        (col("off") + col("rk")).cast("bigint").as("pos"))
      .orderBy("pos")
  }

  /** d21's fixed merge list (learned order) — ONE constant feeds both
    * the Spark query and the generated oracle SQL, so the two cannot
    * drift. English-frequent pairs incl. two second-order merges
    * ("th"+"e", "an"+"d") that exercise merge-consumes-merge. */
  private val d21Merges = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"))
  /** d20's core, factored like [[ngramNovelty]] — its term-frequency
    * join is the second term-keyed hot-key site SkewJoinSpec covers.
    * The (doc, term) aggregate BEFORE the join collapses each doc's
    * occurrences of a hot term to one row (residual skew is
    * #docs-containing, never #occurrences), and the join itself is
    * salted — see the inline comment. */
  private[graft] def rareTokenFilter(docs: DataFrame,
      salts: Int = 8): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(expr(toks)).as("term"))
    val tf = tok.groupBy("term").agg(count(lit(1)).as("n"))
    val mx = tf.agg(max("n").as("mx"))
    // the tf join is term-keyed and function words are hot keys: every
    // (doc, "the") row hashes to one shuffle partition, and AQE cannot
    // split this SMJ (aggregates sit between the shuffle stages and
    // the join). SaltedJoin spreads each hot term over `salts`
    // reducers at the price of replicating the vocabulary-bounded tf
    // side `salts` times — the measured-skew fallback its Scaladoc
    // prescribes, pinned by SkewJoinSpec on a hot-term corpus.
    graft.operators.SaltedJoin.join(
        tok.groupBy("doc_id", "term").agg(count(lit(1)).as("c")),
        tf, "term", salts)
      .crossJoin(broadcast(mx))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        sum(when(col("n") * 30 < col("mx"), col("c")).otherwise(0L))
          .as("n_rare"))
      .select(col("doc_id"), col("n_tokens"), col("n_rare"),
        expr("n_rare * 1000 div n_tokens").as("rare_permille"))
      .orderBy("doc_id")
  }

  /** d19's core, factored so SkewJoinSpec can drive the production
    * pipeline over a deliberately skewed corpus. Deliberately JOIN-FREE
    * on the gram key: the naive shape joins the corpus gram frame back
    * to per-gram counts, and a corpus-scale stop-word gram ("of the
    * same …" in a billion docs) piles a billion probe rows onto ONE
    * shuffle partition — which AQE's skew rule cannot split here (it
    * needs bare shuffle stages under the join; the count aggregate in
    * between blocks the rewrite). Instead hot grams COLLAPSE in the
    * map-side partial aggregate (one row per gram per mapper reaches
    * the shuffle), singles carry their owning doc out of the same
    * aggregate, and the only join left is doc_id ⋈ doc_id — uniform by
    * construction. SkewJoinSpec pins the shape (no gram-keyed join)
    * and parity against the naive form on a hot-gram corpus. */
  private[graft] def ngramNovelty(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), expr(toks).as("tk"))
      .filter(expr("size(tk) >= 3"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(tk) - 3), i -> concat(tk[i], ' ', tk[i + 1], ' ', tk[i + 2])))")).as("g"))
    // per-doc distinct above ⇒ COUNT(*) = number of docs containing g.
    // JOIN-FREE on the gram key: hot grams collapse in this partial
    // aggregate, and an nd = 1 gram's min(doc_id) IS its owning doc,
    // so per-doc uniques come from a second uniform doc_id aggregate
    val uniq = grams.groupBy("g")
      .agg(count(lit(1)).as("nd"), min("doc_id").as("doc_id"))
      .filter(col("nd") === 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_unique"))
    grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(uniq, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_unique"))
      .select(col("doc_id"), col("n_grams"), col("n_unique"),
        expr("n_unique * 1000 div n_grams").as("novelty_permille"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for d21, generated from [[d21Merges]]: bracket every
    * character as chr(1)<c>chr(2), apply each merge as one replace()
    * (see the d21 QueryDef comment for the exactness argument), count
    * brackets. raw interpolation: the '[ \t...]' class must reach
    * DuckDB as backslash escapes, not literal newlines — SparkEntry
    * joins oracle SQL lines with spaces. */
  private val d21Oracle: String = {
    def b(sym: String) = s"chr(1) || '$sym' || chr(2)"
    val chain = d21Merges.foldLeft(
      raw"regexp_replace(term, '(.)', chr(1) || '\1' || chr(2), 'g')") {
      case (acc, (l, r)) => s"replace($acc, ${b(l)} || ${b(r)}, ${b(l + r)})"
    }
    raw"""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS term
        FROM documents),
      enc AS (SELECT doc_id, $chain AS s FROM toks)
      SELECT doc_id,
             CAST(SUM(length(s) - length(replace(s, chr(1), ''))) AS BIGINT) AS n_bpe_tokens
      FROM enc GROUP BY doc_id ORDER BY doc_id"""
  }
  /** How many leading merges d17b cross-checks in DuckDB. Each merge
    * unrolls to three MATERIALIZED CTEs — materialization matters:
    * scalar subqueries on b_i appear three times each, so
    * un-materialized CTEs re-expand the whole chain 3^K times
    * (measured as a too-many-open-files blowup). With MATERIALIZED
    * steps the chain is linear in K and cheap: measured 0.3 s at
    * K=16 and 0.56 s at K=24 on the sf0.01 gate (0.4 s at sf0.1).
    * d17b stays a small-K entry for fast per-round oracle wall; the
    * FULL run is certified by d17's own oracle at [[d17K]]. */
  private val d17bK = 24

  /** d17's merge ceiling — drives BOTH the trainer's nMerges and the
    * oracle's unroll depth, so the two sides structurally share one
    * stop bound. 110 exceeds the ≤ 107 merges this corpus's 31-term
    * vocabulary can ever produce (the trainer saturates at 89 at both
    * gate SFs), so the oracle's self-termination (an empty b_i NULLs
    * every later v_i via replace(s, NULL, ..) and yields no rows)
    * lands on exactly the trainer's stop point. If a regenerated
    * corpus ever admitted MORE than 110 merges both sides stop at 110
    * together; the failure direction of any drift is a red hash, never
    * a silent pass. Measured oracle wall at K=110: ~7 s at sf0.01 AND
    * sf0.1 (the chain is linear in K; steps past saturation run over
    * an all-NULL 31-row frame). */
  private val d17K = 110

  /** DuckDB oracle for d17/d17b: K iterations of BPE's (pair-count →
    * argmax → greedy merge) loop, unrolled. The vocabulary rides as
    * d21's bracketed-symbol strings (chr(1)<sym>chr(2)); per iteration
    * the adjacent-pair counts come from splitting on the bracket seam
    * (every adjacent occurrence counts, OVERLAPPING included — exactly
    * trainRescan's zip-with-tail statistic), the winner is argmax on
    * (count DESC, left, right) — DuckDB compares strings bytewise like
    * Spark's UTF8String binary order — and the merge applies as ONE
    * replace() (greedy leftmost-non-overlapping ≡ mergeOnce; d21's
    * exactness argument). The c >= 2 guard is train's minPairCount.
    * SELF-TERMINATING past the corpus's last merge: an empty b_i makes
    * the scalar subqueries NULL, replace(s, NULL, NULL) NULLs every
    * later v_i row, and `length(s) > 0` filters them — all later b_i
    * are empty and contribute no rows, so unrolling past saturation
    * is exact, not garbage. */
  private def bpeTrainOracle(k: Int): String = {
    def step(i: Int) = raw"""
      p$i AS MATERIALIZED (
        SELECT syms[CAST(u.i AS INT)] AS l, syms[CAST(u.i AS INT)+1] AS r,
               CAST(SUM(n) AS BIGINT) AS c
        FROM (SELECT n, string_split(s[2:length(s)-1], chr(2)||chr(1)) AS syms
              FROM v${i - 1} WHERE length(s) > 0) t,
             LATERAL unnest(range(1, len(syms))) AS u(i)
        GROUP BY 1, 2),
      b$i AS MATERIALIZED (
        SELECT l, r, c FROM p$i WHERE c >= 2 ORDER BY c DESC, l, r LIMIT 1),
      v$i AS MATERIALIZED (
        SELECT n, replace(s,
          chr(1)||(SELECT l FROM b$i)||chr(2)||chr(1)||(SELECT r FROM b$i)||chr(2),
          chr(1)||(SELECT l FROM b$i)||(SELECT r FROM b$i)||chr(2)) AS s
        FROM v${i - 1})"""
    val out = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, l AS left, r AS right, " +
        s"c AS pair_freq FROM b$i").mkString(" UNION ALL ")
    raw"""
      WITH tkn AS (
        SELECT unnest(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS term
        FROM documents),
      tf AS (SELECT term, COUNT(*) AS n FROM tkn GROUP BY 1),
      v0 AS MATERIALIZED (
        SELECT n, concat(chr(1),
                 array_to_string(list_transform(range(1, length(term)+1),
                   i -> term[CAST(i AS INT):CAST(i AS INT)]), chr(2)||chr(1)),
                 chr(2)) AS s
        FROM tf),""" + (1 to k).map(step).mkString(",") + s"""
      SELECT * FROM ($out) ORDER BY rank"""
  }

  /** Bag-of-words content fingerprint: md5 over the sorted distinct token
    * set — catches reordered/duplicated-content documents that raw-text
    * hashing misses. Pure per-row expression → embarrassingly parallel. */
  private val fingerprint =
    s"md5(concat_ws(' ', array_sort(array_distinct($toks))))"

  val defs: Map[String, QueryDef] = Map(
    // ---------------------------------------------------------------- d01
    // Exact dedup: hash-groupBy on content, first-winner (min doc_id).
    // At 100 TB: group by the 128-bit digest, never the text itself —
    // shuffle rows are (16B key, 8B id), not documents.
    "d01_exact_dedup" -> QueryDef(
      build = (spark, dir) => {
        val docs = table(spark, dir, "documents")
        docs.groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"),
            count(lit(1)).as("n_copies"))
          .orderBy("h")
      },
      oracle = Some("""
        SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY h"""),
      headline = true),

    // ---------------------------------------------------------------- d02
    // Token statistics per language: docs, tokens, chars, stopword counts.
    "d02_token_stats" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        docs.select(col("lang"),
            expr(s"size($toks)").cast("bigint").as("n_tokens"),
            length(col("text")).cast("bigint").as("n_chars"),
            expr(s"size(filter($toks, t -> array_contains($stopArr, t)))")
              .cast("bigint").as("n_stop"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            sum("n_chars").as("total_chars"),
            sum("n_stop").as("total_stop"),
            max("n_tokens").as("max_tokens"),
            min("n_tokens").as("min_tokens"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH t AS (
          SELECT lang,
                 CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS BIGINT) AS n_tokens,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                      t -> list_contains(['the','a','of','to','and'], t))) AS BIGINT) AS n_stop
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars, CAST(SUM(n_stop) AS BIGINT) AS total_stop,
               MAX(n_tokens) AS max_tokens, MIN(n_tokens) AS min_tokens
        FROM t GROUP BY lang ORDER BY lang""")),

    // ---------------------------------------------------------------- d03
    // Quality scoring: integer-permille stopword/punctuation ratios →
    // quality buckets, counted per (lang, bucket). Ratios stay in exact
    // integer arithmetic (x*1000 DIV y) so both engines agree bit-for-bit.
    "d03_quality_score" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        docs.select(col("lang"),
            expr(s"size($toks)").cast("bigint").as("n_tokens"),
            expr(s"size(filter($toks, t -> array_contains($stopArr, t)))")
              .cast("bigint").as("n_stop"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[.,;:!?]", "")))
              .cast("bigint").as("n_punct"))
          .withColumn("stop_permille",
            when(col("n_tokens") > 0,
              expr("n_stop * 1000 div n_tokens")).otherwise(lit(0L)))
          .withColumn("quality",
            when(col("n_tokens") >= 40 &&
                 col("stop_permille").between(20, 400), "good")
              .when(col("n_tokens") >= 15, "fair")
              .otherwise("poor"))
          .groupBy("lang", "quality")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            sum("n_punct").as("total_punct"))
          .orderBy("lang", "quality")
      },
      oracle = Some("""
        WITH t AS (
          SELECT lang,
                 CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                      t -> list_contains(['the','a','of','to','and'], t))) AS BIGINT) AS n_stop,
                 CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
          FROM documents),
        s AS (
          SELECT lang, n_tokens, n_punct,
                 CASE WHEN n_tokens > 0 THEN n_stop * 1000 // n_tokens ELSE 0 END AS stop_permille
          FROM t),
        b AS (
          SELECT lang, n_tokens, n_punct,
                 CASE WHEN n_tokens >= 40 AND stop_permille BETWEEN 20 AND 400 THEN 'good'
                      WHEN n_tokens >= 15 THEN 'fair'
                      ELSE 'poor' END AS quality
          FROM s)
        SELECT lang, quality, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_punct) AS BIGINT) AS total_punct
        FROM b GROUP BY lang, quality ORDER BY lang, quality""")),

    // ---------------------------------------------------------------- d04
    // Content-fingerprint dedup: md5 over the sorted distinct token set
    // groups documents whose content is a reorder/repeat of the same
    // vocabulary — the cheap first pass before MinHash near-dedup.
    "d04_fingerprint_dups" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        docs.groupBy(expr(fingerprint).as("fp"))
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
          .filter(col("n_docs") > 1)
          .orderBy("fp")
      },
      oracle = Some("""
        SELECT md5(array_to_string(list_sort(list_distinct(
                 list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> ''))), ' ')) AS fp,
               MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY fp""")),

    // ---------------------------------------------------------------- d05
    // Language × source histogram (the corpus-composition report).
    "d05_lang_source_hist" -> QueryDef(
      build = (spark, dir) => {
        val docs = table(spark, dir, "documents")
        docs.groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy("lang", "source")
      },
      oracle = Some("""
        SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang, source ORDER BY lang, source""")),

    // ---------------------------------------------------------------- c02
    // Deterministic stratified sampling for corpus curation: k docs per
    // (lang, source) stratum, chosen by hash order — the reproducible
    // "sample N per language" every training-mix pipeline needs (a
    // random() sample can't be re-derived or oracle-checked; a hash
    // order is a uniform permutation that every engine agrees on).
    // Scale shape: one shuffle by stratum; Spark's WindowGroupLimit
    // rewrites rk<=k into a per-partition partial top-k, so a giant
    // stratum never fully sorts — each task keeps a k-row heap.
    "c02_stratified_sample" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = table(spark, dir, "documents")
        docs
          .select(col("doc_id"), col("lang"), col("source"),
            md5(col("doc_id").cast("string")).as("hk"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("lang", "source").orderBy("hk")))
          .filter(col("rk") <= 10)
          .select(col("doc_id"), col("lang"), col("source"),
            col("rk").cast("long").as("rk"))
          .orderBy("lang", "source", "rk")
      },
      oracle = Some("""
        SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS rk FROM (
          SELECT doc_id, lang, source,
                 row_number() OVER (PARTITION BY lang, source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
          FROM documents)
        WHERE rk <= 10 ORDER BY lang, source, rk""")),

    // ---------------------------------------------------------------- c04
    // Training-mix allocation: split a global token budget across
    // languages proportionally to their corpus token mass, with
    // largest-remainder rounding so the integer allocations sum to the
    // budget EXACTLY (floor-only allocation under-spends by up to
    // |langs|-1 tokens; naive float rounding can over-spend). The
    // per-doc token count is a distributed scan→agg; the allocation
    // arithmetic runs on the per-language frame, which is stratum-sized
    // (tens of rows at any corpus scale), so its single-partition
    // windows are deliberate, not a scale bug.
    "c04_mix_allocation" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 1000000L
        val docs = QueryDef.spread(spark, dir, "documents")
        val tot = docs.groupBy("lang")
          .agg(sum(expr(s"size($toks)")).cast("long").as("n_tok"))
        val all = Window.partitionBy()
        // budget × n_tok runs in DECIMAL: at real corpus scale (1e13+
        // tokens) the Long product would exceed 2^63 and, with ANSI off,
        // silently wrap instead of erroring — decimal(21,0)×bigint stays
        // exact to 38 digits and div/% stay integral
        tot
          .withColumn("grand", sum("n_tok").over(all))
          .withColumn("base",
            expr(s"cast((cast($budget as decimal(21,0)) * n_tok) div grand as bigint)"))
          .withColumn("rem",
            expr(s"cast((cast($budget as decimal(21,0)) * n_tok) % grand as bigint)"))
          .withColumn("rk",
            row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
          .withColumn("deficit", expr(s"$budget - sum(base) over ()"))
          .select(col("lang"), col("n_tok"),
            (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
              .as("alloc_tokens"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH tot AS (
          SELECT lang, CAST(SUM(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                 t -> t <> ''))) AS BIGINT) AS n_tok
          FROM documents GROUP BY lang),
        calc AS (
          SELECT lang, n_tok,
                 CAST(1000000::HUGEINT * n_tok // SUM(n_tok) OVER () AS BIGINT) AS base,
                 CAST(1000000::HUGEINT * n_tok % SUM(n_tok) OVER () AS BIGINT) AS rem
          FROM tot),
        ranked AS (
          SELECT lang, n_tok, base,
                 row_number() OVER (ORDER BY rem DESC, lang) AS rk,
                 1000000 - SUM(base) OVER () AS deficit
          FROM calc)
        SELECT lang, n_tok,
               CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
                 AS alloc_tokens
        FROM ranked ORDER BY lang""")),

    // ---------------------------------------------------------------- c17
    // TEMPERATURE-weighted mix allocation — the formula multilingual
    // training mixes actually use (weight ∝ n^α, α<1, so low-resource
    // strata get up-sampled relative to proportional c04; α here is 0.5
    // DELIBERATELY: sqrt is the one power IEEE requires correctly
    // rounded, so Spark's Math.sqrt and DuckDB's libm sqrt produce the
    // identical double, and floor(sqrt(n)·10⁶) is the identical BIGINT
    // weight on both engines — a generic pow(n, 0.3) is NOT correctly
    // rounded and could flip largest-remainder ranks by an ulp). Same
    // exact largest-remainder machinery as c04 over the integer
    // weights: allocations sum to the budget exactly.
    "c17_temperature_mix" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 1000000L
        val docs = QueryDef.spread(spark, dir, "documents")
        val tot = docs.groupBy("lang")
          .agg(sum(expr(s"size($toks)")).cast("long").as("n_tok"))
          .withColumn("w", expr("cast(floor(sqrt(cast(n_tok as double)) * 1000000D) as bigint)"))
        val all = Window.partitionBy()
        tot
          .withColumn("grand", sum("w").over(all))
          .withColumn("base",
            expr(s"cast((cast($budget as decimal(21,0)) * w) div grand as bigint)"))
          .withColumn("rem",
            expr(s"cast((cast($budget as decimal(21,0)) * w) % grand as bigint)"))
          .withColumn("rk",
            row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
          .withColumn("deficit", expr(s"$budget - sum(base) over ()"))
          .select(col("lang"), col("n_tok"), col("w"),
            (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
              .as("alloc_tokens"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH tot AS (
          SELECT lang, CAST(SUM(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                 t -> t <> ''))) AS BIGINT) AS n_tok
          FROM documents GROUP BY lang),
        wt AS (
          SELECT lang, n_tok,
                 CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1000000) AS BIGINT) AS w
          FROM tot),
        calc AS (
          SELECT lang, n_tok, w,
                 CAST(1000000::HUGEINT * w // SUM(w) OVER () AS BIGINT) AS base,
                 CAST(1000000::HUGEINT * w % SUM(w) OVER () AS BIGINT) AS rem
          FROM wt),
        ranked AS (
          SELECT lang, n_tok, w, base,
                 row_number() OVER (ORDER BY rem DESC, lang) AS rk,
                 1000000 - SUM(base) OVER () AS deficit
          FROM calc)
        SELECT lang, n_tok, w,
               CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
                 AS alloc_tokens
        FROM ranked ORDER BY lang""")),

    // ---------------------------------------------------------------- c21
    // Token-budget EPOCH PLANNER — the step after c17's temperature
    // mix: a quota above a stratum's corpus mass means that stratum
    // REPEATS (the LLaMA/PaLM up-sampling schedule: low-resource
    // sources run multiple epochs while the head source runs a
    // fraction of one). For each language: the exact largest-remainder
    // quota under the sqrt-temperature weights (c17's machinery,
    // budget 100k tokens), the epoch count ceil(quota/n_tok), and how
    // much of the final epoch is consumed (integer permille; a quota
    // that divides exactly is a full last epoch). Everything integer:
    // ceil is (a+b-1) div b, the permille is cross-multiplication —
    // no float schedule math to drift cross-engine.
    //
    // 100 TB shape: identical to c04/c17 — one distributed scan→agg
    // for the per-language token masses; the planner arithmetic runs
    // on the language-sized frame where single-partition windows are
    // deliberate.
    "c21_epoch_plan" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 100000L
        val docs = QueryDef.spread(spark, dir, "documents")
        val tot = docs.groupBy("lang")
          .agg(sum(expr(s"size($toks)")).cast("long").as("n_tok"))
          .withColumn("w", expr(
            "cast(floor(sqrt(cast(n_tok as double)) * 1000000D) as bigint)"))
        val all = Window.partitionBy()
        tot
          .withColumn("grand", sum("w").over(all))
          .withColumn("base",
            expr(s"cast((cast($budget as decimal(21,0)) * w) div grand as bigint)"))
          .withColumn("rem",
            expr(s"cast((cast($budget as decimal(21,0)) * w) % grand as bigint)"))
          .withColumn("rk",
            row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
          .withColumn("deficit", expr(s"$budget - sum(base) over ()"))
          .withColumn("quota_tokens",
            col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .select(col("lang"), col("n_tok"), col("quota_tokens"),
            // n_tok = 0 (a language whose docs are all empty) can still
            // win quota 1 from largest-remainder — guard the division so
            // Spark's NULL and DuckDB's //-error both become a defined 0
            expr("""cast(CASE WHEN n_tok = 0 THEN 0
                              ELSE (quota_tokens + n_tok - 1) div n_tok
                         END as bigint)""").as("epochs"),
            expr("""cast(CASE WHEN n_tok = 0 THEN 0
                              WHEN quota_tokens = 0 THEN 0
                              WHEN quota_tokens % n_tok = 0 THEN 1000
                              ELSE (quota_tokens % n_tok) * 1000 div n_tok
                         END as bigint)""").as("last_epoch_permille"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH tot AS (
          SELECT lang, CAST(SUM(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                 t -> t <> ''))) AS BIGINT) AS n_tok
          FROM documents GROUP BY lang),
        wt AS (
          SELECT lang, n_tok,
                 CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1000000) AS BIGINT) AS w
          FROM tot),
        calc AS (
          SELECT lang, n_tok, w,
                 CAST(100000::HUGEINT * w // SUM(w) OVER () AS BIGINT) AS base,
                 CAST(100000::HUGEINT * w % SUM(w) OVER () AS BIGINT) AS rem
          FROM wt),
        ranked AS (
          SELECT lang, n_tok, base,
                 row_number() OVER (ORDER BY rem DESC, lang) AS rk,
                 100000 - SUM(base) OVER () AS deficit
          FROM calc),
        quota AS (
          SELECT lang, n_tok,
                 base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS quota_tokens
          FROM ranked)
        SELECT lang, n_tok, CAST(quota_tokens AS BIGINT) AS quota_tokens,
               CAST(CASE WHEN n_tok = 0 THEN 0
                         ELSE (quota_tokens + n_tok - 1) // n_tok
                    END AS BIGINT) AS epochs,
               CAST(CASE WHEN n_tok = 0 THEN 0
                         WHEN quota_tokens = 0 THEN 0
                         WHEN quota_tokens % n_tok = 0 THEN 1000
                         ELSE quota_tokens % n_tok * 1000 // n_tok
                    END AS BIGINT) AS last_epoch_permille
        FROM quota ORDER BY lang""")),

    // ---------------------------------------------------------------- c22
    // Deterministic curriculum order: the reproducible "which example
    // does the trainer see at step t" assignment — quality tiers first
    // (d03's exact tiering: good → fair → poor), a reproducible
    // hash-shuffle within each tier (md5 over doc_id, c02/d24's
    // convention — a length- or id-ordered curriculum would bias every
    // epoch the same way), and a GLOBAL 1-based position.
    //
    // 100 TB shape — the point of this query: a global position is
    // normally a global sort + one window over everything; here the
    // rank window is partitioned by (tier, shard) where shard is the
    // FIRST md5 BYTE, so md5-major order is preserved shard-locally
    // (global md5 order = shard-major then md5 within shard), ~768
    // independent windows run in parallel, and the global offset of
    // each (tier, shard) group comes from a cumulative sum over the
    // tiny 768-row count frame (single-partition window DELIBERATE
    // there). No corpus-wide single-partition window anywhere.
    "c22_curriculum_order" -> QueryDef(
      build = (spark, dir) =>
        curriculumOrder(QueryDef.spread(spark, dir, "documents")),
      oracle = Some("""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                      t -> list_contains(['the','a','of','to','and'], t))) AS BIGINT) AS n_stop
          FROM documents),
        s AS (
          SELECT doc_id, n_tokens,
                 CASE WHEN n_tokens > 0 THEN n_stop * 1000 // n_tokens ELSE 0 END AS stop_permille
          FROM t),
        b AS (
          SELECT doc_id,
                 CASE WHEN n_tokens >= 40 AND stop_permille BETWEEN 20 AND 400 THEN 'good'
                      WHEN n_tokens >= 15 THEN 'fair'
                      ELSE 'poor' END AS tier,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM s),
        r AS (
          SELECT doc_id, tier,
                 CASE tier WHEN 'good' THEN 0 WHEN 'fair' THEN 1 ELSE 2 END AS tr,
                 row_number() OVER (PARTITION BY tier ORDER BY h, doc_id) AS rk
          FROM b),
        o AS (SELECT tr, COUNT(*) AS n FROM r GROUP BY tr),
        off AS (SELECT tr, SUM(n) OVER (ORDER BY tr) - n AS o FROM o)
        SELECT doc_id, tier, CAST(off.o + r.rk AS BIGINT) AS pos
        FROM r JOIN off USING (tr) ORDER BY pos""")),

    // ---------------------------------------------------------------- d24
    // Per-source contribution cap — the C4/CCNet anti-spam rule: no
    // single source (domain) may contribute more than a RELATIVE share
    // of the corpus (here 30 permille of total docs; absolute caps are
    // SF-fragile, q33's lesson). Retention within an over-cap source is
    // hash-ordered (c02's reproducible uniform down-sample — a
    // length-ordered cut would bias the survivors); the output is the
    // ENFORCEMENT LIST, the docs a curation pass must drop, with their
    // over-cap rank and the cap itself.
    //
    // Scheme (counting scan, over-cap broadcast, BIGINT rank
    // cross-multiplication) lives ONCE in [[sourceCapDrops]] — Curate's
    // --source-cap stage consumes the same definition, so the oracled
    // drop list and the pipeline verdict cannot drift.
    "d24_source_caps" -> QueryDef(
      build = (spark, dir) =>
        sourceCapDrops(table(spark, dir, "documents"), 30,
          f => QueryDef.deferCleanup(f))
          .orderBy("source", "rk"),
      oracle = Some("""
        WITH tot AS (SELECT COUNT(*) AS n_total FROM documents),
        ranked AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
          FROM documents)
        SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
               CAST(n_total * 30 // 1000 AS BIGINT) AS cap
        FROM ranked, tot WHERE rk * 1000 > n_total * 30
        ORDER BY source, rk""")),

    // ---------------------------------------------------------------- d26
    // Vocabulary drift between two snapshots — the OOV/content-shift
    // monitor beside d25's composition report: how many token TYPES
    // are novel in the new snapshot (and how many disappeared), and —
    // the number that actually predicts tokenizer pain — what fraction
    // of the new snapshot's token OCCURRENCES are novel types (a
    // thousand hapax neologisms matter less than one high-frequency
    // new term). Exact integers: counts and ppm by cross-division.
    // Same deterministic parity stand-in as d25; lowercased types
    // (d09's vocabulary convention, ASCII caveat documented on the
    // object).
    //
    // 100 TB shape: ONE corpus scan → explode → (token) groupBy with
    // per-parity conditional sums, map-side combined so shuffle volume
    // is the distinct vocabulary, not token instances; the final fold
    // over the vocabulary frame is a second (small) aggregate. Output
    // is a tall (metric, value) relation — c15's shape.
    "d26_vocab_drift" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        val tok = docs.select((col("doc_id") % 2 === 0).as("is_old"),
            explode(expr(s"filter(split(lower(text), '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"))
              .as("token"))
        val vocab = tok.groupBy("token")
          .agg(sum(when(col("is_old"), 1L).otherwise(0L)).as("old_n"),
            sum(when(!col("is_old"), 1L).otherwise(0L)).as("new_n"))
        val agg = vocab.groupBy().agg(
          sum(when(col("old_n") > 0, 1L).otherwise(0L)).as("types_old"),
          sum(when(col("new_n") > 0, 1L).otherwise(0L)).as("types_new"),
          sum(when(col("old_n") > 0 && col("new_n") > 0, 1L).otherwise(0L))
            .as("shared_types"),
          sum(when(col("old_n") === 0 && col("new_n") > 0, 1L).otherwise(0L))
            .as("new_types"),
          sum(when(col("old_n") > 0 && col("new_n") === 0, 1L).otherwise(0L))
            .as("lost_types"),
          sum(when(col("old_n") === 0, col("new_n")).otherwise(0L))
            .as("novel_occ"),
          sum(col("new_n")).as("new_occ"))
        agg.selectExpr(
          "stack(6, 'types_old', types_old, 'types_new', types_new, " +
            "'shared_types', shared_types, 'new_types', new_types, " +
            "'lost_types', lost_types, " +
            "'novel_occurrence_ppm', " +
            "CASE WHEN new_occ > 0 THEN novel_occ * 1000000 div new_occ " +
            "ELSE 0L END) " +
            "AS (metric, value)")
          .orderBy("metric")
      },
      oracle = Some("""
        WITH tok AS (
          SELECT doc_id % 2 = 0 AS is_old,
                 unnest(list_filter(string_split_regex(lower(text), '[ \t\n\r\f]+'),
                   t -> t <> '')) AS token
          FROM documents),
        vocab AS (
          SELECT token,
                 CAST(SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS old_n,
                 CAST(SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) AS new_n
          FROM tok GROUP BY token),
        agg AS (
          SELECT
            CAST(SUM(CASE WHEN old_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_old,
            CAST(SUM(CASE WHEN new_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_new,
            CAST(SUM(CASE WHEN old_n > 0 AND new_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS shared_types,
            CAST(SUM(CASE WHEN old_n = 0 AND new_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS new_types,
            CAST(SUM(CASE WHEN old_n > 0 AND new_n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS lost_types,
            CAST(SUM(CASE WHEN old_n = 0 THEN new_n ELSE 0 END) AS BIGINT) AS novel_occ,
            CAST(SUM(new_n) AS BIGINT) AS new_occ
          FROM vocab)
        SELECT metric, value FROM (
          SELECT 'types_old' AS metric, types_old AS value FROM agg
          UNION ALL SELECT 'types_new', types_new FROM agg
          UNION ALL SELECT 'shared_types', shared_types FROM agg
          UNION ALL SELECT 'new_types', new_types FROM agg
          UNION ALL SELECT 'lost_types', lost_types FROM agg
          UNION ALL SELECT 'novel_occurrence_ppm',
            CASE WHEN new_occ > 0 THEN novel_occ * 1000000 // new_occ ELSE 0 END FROM agg)
        ORDER BY metric""")),

    // ---------------------------------------------------------------- d25
    // Corpus composition DRIFT between two snapshots — the monitoring
    // report a generation-over-generation ingest (StreamingCurate's
    // world) runs before accepting a new crawl: per-language share in
    // each snapshot (parts-per-million, exact integer), the signed
    // per-language delta, and a '_TOTAL' row whose delta is the total
    // variation distance (half the L1) between the two distributions.
    // The corpus has one snapshot, so doc_id parity is the
    // deterministic stand-in for old/new (both engines derive the
    // identical split; the operator's real input is two generation
    // dirs). '_' sorts before every lowercase lang code in binary
    // collation on both engines, so the summary row's position is
    // deterministic.
    //
    // 100 TB shape: ONE corpus scan → one (lang, parity) map-side-
    // combined aggregate; every downstream op (shares, deltas, the TVD
    // fold) runs on the language-sized frame against a 1-row broadcast
    // total.
    "d25_composition_drift" -> QueryDef(
      build = (spark, dir) => {
        val docs = table(spark, dir, "documents")
          .select(col("lang"), (col("doc_id") % 2 === 0).as("is_old"))
        // the lang-sized aggregate feeds four branches (shares, the
        // 1-row totals, and the summary's re-aggregation) — persist it
        // so the CORPUS scan runs once, not once per branch; release
        // through the harness queue like every query-held cache. The
        // drift arithmetic lives ONCE in [[driftFromCounts]], shared
        // with report.DataCard.drift (the real two-generation API)
        val perLang = docs.groupBy("lang")
          .agg(sum(when(col("is_old"), 1L).otherwise(0L)).as("old_n"),
            sum(when(!col("is_old"), 1L).otherwise(0L)).as("new_n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        QueryDef.deferCleanup(() => { perLang.unpersist(blocking = true); () })
        driftFromCounts(perLang)
      },
      oracle = Some("""
        WITH pl AS (
          SELECT lang,
                 CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS old_n,
                 CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS new_n
          FROM documents GROUP BY lang),
        tot AS (SELECT SUM(old_n) AS old_t, SUM(new_n) AS new_t FROM pl),
        sh AS (
          SELECT lang, old_n, new_n,
                 CAST(CASE WHEN old_t > 0 THEN old_n * 1000000 // old_t ELSE 0 END AS BIGINT) AS old_ppm,
                 CAST(CASE WHEN new_t > 0 THEN new_n * 1000000 // new_t ELSE 0 END AS BIGINT) AS new_ppm,
                 CAST((CASE WHEN new_t > 0 THEN new_n * 1000000 // new_t ELSE 0 END)
                    - (CASE WHEN old_t > 0 THEN old_n * 1000000 // old_t ELSE 0 END) AS BIGINT) AS delta_ppm
          FROM pl, tot)
        SELECT lang, old_n, new_n, old_ppm, new_ppm, delta_ppm FROM sh
        UNION ALL
        SELECT '_TOTAL', CAST(SUM(old_n) AS BIGINT), CAST(SUM(new_n) AS BIGINT),
               CAST(1000000 AS BIGINT), CAST(1000000 AS BIGINT),
               CAST(SUM(abs(delta_ppm)) // 2 AS BIGINT)
        FROM sh
        ORDER BY lang""")),

    // ---------------------------------------------------------------- c05
    // Text-normalization pass: lowercase, strip ASCII punctuation,
    // collapse whitespace — the canonical pre-dedup cleanup. Reported as
    // per-language aggregate deltas (docs changed, chars removed) so the
    // whole pipeline is one scan→project→agg with no normalized text
    // ever shuffled. lower() parity with DuckDB is already exercised by
    // d06 on this corpus.
    "c05_normalize_stats" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        val norm = "trim(regexp_replace(regexp_replace(lower(text), " +
          "'[!-/:-@\\\\[-`{-~]', ' '), '[ \\\\t\\\\n\\\\r\\\\f]+', ' '))"
        docs
          .select(col("lang"), col("text"), expr(norm).as("norm"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum((col("text") =!= col("norm")).cast("long")).as("n_changed"),
            sum(length(col("text")) - length(col("norm"))).cast("bigint")
              .as("chars_removed"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH n AS (
          SELECT lang, text,
                 trim(regexp_replace(regexp_replace(lower(text),
                   '[!-/:-@\[-`{-~]', ' ', 'g'), '[ \t\n\r\f]+', ' ', 'g')) AS norm
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN text <> norm THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
               CAST(SUM(length(text) - length(norm)) AS BIGINT) AS chars_removed
        FROM n GROUP BY lang ORDER BY lang""")),

    // ---------------------------------------------------------------- d09
    // Per-language vocabulary top-k: the term-frequency head, the table a
    // tokenizer-training or stopword-selection pass starts from. The
    // groupBy collapses (lang, token) with map-side partial aggregation
    // BEFORE anything wide happens, so the window's input is the distinct
    // vocabulary (≪ token instances); the rank filter itself runs as
    // WindowGroupLimit, which keeps only k rows per lang on each map side
    // before the window shuffle. Ties break alphabetically (count desc,
    // token asc) — deterministic on both engines (binary collation).
    "d09_vocab_topk" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = QueryDef.spread(spark, dir, "documents")
        docs
          .select(col("lang"), explode(expr(
            "filter(split(lower(text), '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')")).as("token"))
          .groupBy("lang", "token").agg(count(lit(1)).as("c"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("lang").orderBy(col("c").desc, col("token"))))
          .filter(col("rk") <= 10)
          .select(col("lang"), col("rk").cast("long").as("rk"),
            col("token"), col("c"))
          .orderBy("lang", "rk")
      },
      oracle = Some("""
        WITH tf AS (
          SELECT lang, token, COUNT(*) AS c
          FROM (SELECT lang,
                       unnest(list_filter(string_split_regex(lower(text), '[ \t\n\r\f]+'),
                         t -> t <> '')) AS token
                FROM documents)
          GROUP BY lang, token),
        ranked AS (
          SELECT lang, token, c,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY c DESC, token) AS rk
          FROM tf)
        SELECT lang, CAST(rk AS BIGINT) AS rk, token, c
        FROM ranked WHERE rk <= 10 ORDER BY lang, rk""")),

    // ---------------------------------------------------------------- d10
    // Exact rank-based length percentiles per language (percentile_disc
    // semantics: the value at row ceil(p·n/100) of the sorted stratum).
    // Rank arithmetic is pure integer ((p·n + 99) div 100) — no float
    // percentile interpolation, which differs bit-for-bit across
    // engines. The sort is one window per stratum — the exact-quantile
    // lower bound; at 100 TB the same report would come from
    // approx_percentile's t-digest merge (one scan, mergeable sketches,
    // rank error ε·n) with this query as its calibration oracle.
    "d10_length_percentiles" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = table(spark, dir, "documents")
        val byLen = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
        val stratum = Window.partitionBy("lang")
        docs
          .select(col("lang"), col("n_chars"), col("doc_id"))
          .withColumn("rn", row_number().over(byLen))
          .withColumn("n", count(lit(1)).over(stratum))
          .groupBy("lang")
          .agg(max(col("n")).as("n_docs"),
            max(when(col("rn") === expr("(50 * n + 99) div 100"),
              col("n_chars"))).as("p50"),
            max(when(col("rn") === expr("(90 * n + 99) div 100"),
              col("n_chars"))).as("p90"),
            max(when(col("rn") === expr("(99 * n + 99) div 100"),
              col("n_chars"))).as("p99"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH r AS (
          SELECT lang, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM documents)
        SELECT lang, MAX(n) AS n_docs,
               MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN n_chars END) AS p50,
               MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN n_chars END) AS p90,
               MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS p99
        FROM r GROUP BY lang ORDER BY lang""")),

    // ---------------------------------------------------------------- d12
    // Corpus-conditional bigram fluency — the language-model quality
    // filter (CCNet's recipe: score documents by an n-gram LM trained on
    // the corpus itself and drop the tail). Per document: the mean over
    // its bigram OCCURRENCES of the corpus conditional probability
    // p(w2|w1) = count(w1 w2) / count(w1 ·), each floored to permille so
    // both engines agree exactly (no log-space floats — the 100 TB path
    // would use log-prob doubles, losing cross-engine bit parity but
    // nothing else in the plan). Boilerplate and template spam repeat
    // corpus-frequent transitions → high score; character noise and
    // wrong-language text → low.
    //
    // Scale shape: bigram explosion is O(tokens) rows; the LM "training"
    // is ONE map-side-combined groupBy to distinct-bigram counts, with
    // the prefix totals derived by a window sum OVER the already-reduced
    // counts (pcnt = Σ cnt per w1 — re-aggregating the raw occurrence
    // stream for them would be a second full corpus pass for identical
    // numbers); doc bigrams then join the LM table on the bigram key
    // (both sides hash-partitioned on it) and re-aggregate per doc. No
    // all-pairs, no driver-side model — the LM IS a DataFrame, which is
    // what lets the same plan score 100 TB against a 100 TB-trained LM.
    "d12_bigram_fluency" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val bigrams = QueryDef.spread(spark, dir, "documents")
          .select(col("doc_id"), expr(toks).as("tk"))
          .filter(expr("size(tk) >= 2"))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(tk) - 1), i -> named_struct(" +
              "'w1', element_at(tk, i), 'w2', element_at(tk, i + 1)))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val lm = bigrams.groupBy("w1", "w2")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("pcnt", sum("cnt").over(Window.partitionBy("w1")))
          .select(col("w1"), col("w2"),
            expr("cnt * 1000 div pcnt").as("cond_permille"))
        bigrams.join(lm, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            expr("sum(cond_permille) div count(1)").as("fluency_permille"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
                 unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
          FROM tk WHERE len(tk) >= 2),
        bc AS (SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
        pc AS (SELECT w1, COUNT(*) AS pcnt FROM bg GROUP BY 1),
        lm AS (
          SELECT bc.w1, bc.w2, CAST(cnt * 1000 // pcnt AS BIGINT) AS cond_permille
          FROM bc JOIN pc ON bc.w1 = pc.w1)
        SELECT doc_id, COUNT(*) AS n_bigrams,
               CAST(SUM(cond_permille) // COUNT(*) AS BIGINT) AS fluency_permille
        FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d13
    // Inverse-df keyword extraction: each document's top-3 most
    // distinctive terms by weight = tf · (10^6 div df) — term frequency
    // in the doc discounted by corpus document frequency, the log-free
    // integer cousin of TF-IDF (exact cross-engine where log(N/df)
    // doubles are not). Shapes like the real thing at 100 TB: tf is a
    // map-side-combined groupBy over exploded tokens, df is a second
    // aggregate over the SAME exploded frame (distinct doc per term =
    // count of tf rows, no second explode), and the tf⋈df equi-join on
    // term hash-partitions both sides — vocabulary-bounded, never
    // corpus-bounded. Ties break toward the lexicographically smaller
    // term so top-3 is deterministic.
    "d13_tfidf_terms" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tf = QueryDef.spread(spark, dir, "documents")
          .select(col("doc_id"), explode(expr(toks)).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("weight").desc, col("term"))
        tf.join(df, Seq("term"))
          .withColumn("weight", expr("tf * (1000000 div df)"))
          .withColumn("rnk", row_number().over(w).cast("bigint"))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk"), col("term"), col("tf"),
            col("df"), col("weight"))
          .orderBy("doc_id", "rnk")
      },
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tkn GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf * (1000000 // df) DESC, term) AS BIGINT) AS rnk,
               term, tf, df, CAST(tf * (1000000 // df) AS BIGINT) AS weight
        FROM tf JOIN df USING (term)
        QUALIFY rnk <= 3 ORDER BY doc_id, rnk""")),

    // ---------------------------------------------------------------- d14
    // Content-defined chunking + cross-document chunk reuse — the
    // storage-dedup primitive (LBFS/FastCDC family) at token
    // granularity: a chunk boundary falls AFTER token i whenever
    // md5(token_i) starts with hex '0' (p = 1/16 → mean chunk ≈ 16
    // tokens). Unlike fixed windows (c11) the boundaries move WITH the
    // content, so an insertion early in a document re-chunks only the
    // chunk it lands in and every following chunk hash still matches —
    // which is what makes chunk-hash dedup robust to edits. Per doc:
    // chunk count and how many of its chunks also occur in ANOTHER doc
    // (shared chunk-hash with > 1 distinct doc).
    //
    // 100 TB shape: chunking is one per-row expression (no explode
    // until the chunk list exists, fan-out ≈ n_tok/16), the reuse test
    // is a chunk-hash groupBy (map-side combined) joined back by hash —
    // vocabulary-of-chunks bounded, and the per-doc rollup partitions
    // by doc_id. Boundary-rule parity rides on the md5-over-token
    // contract d04/d08 already pin cross-engine.
    // ---------------------------------------------------------------- d16
    // Vocabulary richness per language: types (distinct terms), tokens,
    // and the type-token ratio in permille — the classic lexical-
    // diversity diagnostic (a low TTR at corpus scale flags template/
    // boilerplate floods; a high one flags noise). Integer permille via
    // one DIV. Types and tokens come from ONE exploded frame aggregated
    // twice (tf rows = types; their tf sum = tokens) — vocabulary-
    // bounded after the first map-side-combined groupBy, the d13
    // discipline.
    "d16_vocab_richness" -> QueryDef(
      build = (spark, dir) => {
        val tf = QueryDef.spread(spark, dir, "documents")
          .select(col("lang"), explode(expr(toks)).as("term"))
          .groupBy("lang", "term").agg(count(lit(1)).as("tf"))
        tf.groupBy("lang")
          .agg(count(lit(1)).as("n_types"), sum("tf").as("n_tokens"))
          .withColumn("ttr_permille", expr("n_types * 1000 div n_tokens"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH tkn AS (
          SELECT lang, unnest(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS term
          FROM documents),
        tf AS (SELECT lang, term, COUNT(*) AS tf FROM tkn GROUP BY 1, 2)
        SELECT lang, COUNT(*) AS n_types, CAST(SUM(tf) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) * 1000 // SUM(tf) AS BIGINT) AS ttr_permille
        FROM tf GROUP BY lang ORDER BY lang""")),

    "d14_cdc_chunks" -> QueryDef(
      build = (spark, dir) => {
        val chunked = QueryDef.spread(spark, dir, "documents")
          .select(col("doc_id"), expr(toks).as("tk"))
          .filter(expr("size(tk) >= 1"))
          // cut positions (tokens after which a boundary falls), then
          // chunk ranges: ends = cuts (+ the doc end if not already a
          // cut), starts = 1 and each previous end + 1 — equal-length
          // by construction, every s <= e
          .withColumn("b", expr(
            "filter(sequence(1, size(tk)), i -> substring(md5(element_at(tk, i)), 1, 1) = '0')"))
          .withColumn("ends", expr(
            "if(size(b) > 0 and element_at(b, -1) = size(tk), b, concat(b, array(size(tk))))"))
          .withColumn("starts", expr(
            "concat(array(1), transform(slice(ends, 1, size(ends) - 1), x -> x + 1))"))
          .select(col("doc_id"), col("tk"),
            explode(expr("zip_with(starts, ends, (s, e) -> struct(s as s, e as e))")).as("c"))
          .select(col("doc_id"),
            expr("md5(array_join(slice(tk, c.s, c.e - c.s + 1), ' '))").as("h"))
        val reuse = chunked.groupBy("h")
          .agg(countDistinct("doc_id").as("nd"))
        chunked.join(reuse, Seq("h"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        bounds AS (
          SELECT doc_id, tk,
                 list_filter(range(1, len(tk) + 1), i -> substring(md5(tk[i]), 1, 1) = '0') AS b
          FROM tkn WHERE len(tk) >= 1),
        ranges AS (
          SELECT doc_id, tk,
                 CASE WHEN len(b) > 0 AND b[-1] = len(tk) THEN b
                      ELSE list_concat(b, [len(tk)]) END AS ends
          FROM bounds),
        ranges2 AS (
          SELECT doc_id, tk, ends,
                 list_concat([1], list_transform(ends[1:len(ends)-1], x -> x + 1)) AS starts
          FROM ranges),
        chunks AS (
          SELECT doc_id, md5(array_to_string(tk[starts[j]:ends[j]], ' ')) AS h
          FROM ranges2, LATERAL unnest(range(1, len(ends) + 1)) AS t(j)),
        reuse AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY h)
        SELECT doc_id, COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        FROM chunks JOIN reuse USING (h)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d15
    // BPE merge-training signal: the frequency-weighted adjacent
    // symbol-pair counts over the corpus vocabulary — the statistic a
    // byte-pair-encoding trainer recomputes every merge iteration
    // (Sennrich et al.; d07 applies a FIXED BPE-ish tokenizer, this is
    // the other half: what the trainer would merge next). Character
    // pairs as 2-char substrings of each vocabulary term, weighted by
    // the term's corpus frequency; top-20 by weight, ties toward the
    // lexicographically smaller pair.
    //
    // 100 TB shape: term frequencies are a map-side-combined groupBy
    // over exploded tokens (vocabulary-bounded from there on), pair
    // explosion fans out ≤ len(term)−1 rows per VOCABULARY entry (not
    // per occurrence), and the final ranking aggregates ~|alphabet|²
    // keys — driver-size output, corpus-size never shuffled twice.
    "d15_bpe_merge_pairs" -> QueryDef(
      build = (spark, dir) => {
        val tf = QueryDef.spread(spark, dir, "documents")
          .select(explode(expr(toks)).as("term"))
          .groupBy("term").agg(count(lit(1)).as("n"))
        tf.filter(length(col("term")) >= 2)
          .select(col("n"), explode(expr(
            "transform(sequence(1, length(term) - 1), i -> substring(term, i, 2))")).as("pair"))
          .groupBy("pair").agg(sum("n").as("freq"))
          .orderBy(col("freq").desc, col("pair"))
          .limit(20)
      },
      oracle = Some("""
        WITH tkn AS (
          SELECT unnest(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS term
          FROM documents),
        tf AS (SELECT term, COUNT(*) AS n FROM tkn GROUP BY 1),
        pairs AS (
          SELECT n, substring(term, CAST(i AS INT), 2) AS pair
          FROM tf, LATERAL unnest(range(1, length(term))) AS u(i)
          WHERE length(term) >= 2)
        SELECT pair, CAST(SUM(n) AS BIGINT) AS freq
        FROM pairs GROUP BY pair
        ORDER BY freq DESC, pair LIMIT 20""")),

    // ---------------------------------------------------------------- d17
    // Full BPE training run: learn up to d17K merges over the corpus
    // vocabulary with the INCREMENTAL trainer (driver-side pair-count
    // map + one narrow job per merge over the cached vocabulary — see
    // operators/BpeTrainer.scala Scaladoc for the 100 TB argument).
    // FULLY oracled since r20: the d17b unrolled-CTE chain is LINEAR
    // in K (MATERIALIZED steps) and self-terminating past the corpus's
    // last merge, so unrolling to d17K = 110 — above the ≤ 107 merges
    // this vocabulary can ever produce — certifies the ENTIRE merge
    // order (the trainer saturates at 89 at both gate SFs), not just a
    // prefix. Any order/count/tie-break drift between the incremental
    // trainer and the reference statistic goes red at the driver; the
    // ceiling itself is one shared constant on both sides.
    // BpeTrainerSpec keeps the bit-identical incremental-vs-rescan
    // pins (fixtures + forced compaction + this testdata path).
    // Headline so the per-merge loop cost is benched.
    "d17_bpe_train" -> QueryDef(
      build = (spark, dir) => {
        import spark.implicits._
        val docs = QueryDef.spread(spark, dir, "documents")
        val merges = graft.operators.BpeTrainer
          .train(spark, docs, nMerges = d17K, minPairCount = 2L)
        merges.zipWithIndex
          .map { case (m, i) => (i + 1L, m.left, m.right, m.count) }
          .toDF("rank", "left", "right", "pair_freq")
          .orderBy("rank")
      },
      oracle = Some(bpeTrainOracle(d17K)),
      headline = true),

    // ---------------------------------------------------------------- d17b
    // The first K=24 merges of the d17 training loop — the same
    // unrolled oracle at small K. Subsumed by d17's full-length oracle
    // for COVERAGE, kept for oracle-cost layering: this entry keeps a
    // sub-second cross-engine check on the merge order (the full d17
    // unroll costs ~7 s of DuckDB wall), so a fast iteration loop
    // still gets a tokenizer-order gate without paying the full chain.
    "d17b_bpe_first_merges" -> QueryDef(
      build = (spark, dir) => {
        import spark.implicits._
        val docs = QueryDef.spread(spark, dir, "documents")
        graft.operators.BpeTrainer
          .train(spark, docs, nMerges = d17bK, minPairCount = 2L)
          .zipWithIndex
          .map { case (m, i) => (i + 1L, m.left, m.right, m.count) }
          .toDF("rank", "left", "right", "pair_freq")
          .orderBy("rank")
      },
      oracle = Some(bpeTrainOracle(d17bK))),

    // ---------------------------------------------------------------- d21
    // BPE ENCODE under a fixed merge list: per-doc token count — the
    // apply side of the tokenizer surface (d15 = one merge signal, d17
    // = the full training loop, this = inference over the corpus).
    // The oracle re-derives the counts in DuckDB from first principles:
    // each term becomes a chr(1)-sym-chr(2) bracketed symbol string and
    // each merge is ONE left-to-right replace() — exact because (a) a
    // single greedy non-overlapping pass IS the fixpoint for one merge
    // rule (a merged symbol `lr` can never re-create the (l, r)
    // adjacency: it would require lr = l or lr = r, impossible by
    // length), matching encode()'s to-fixpoint loop, and (b) replace()'s
    // leftmost-non-overlapping scan is exactly mergeOnce's greedy
    // consume ("a a a" + (a,a) → "aa a" both ways). The bracket chars
    // make matches symbol-exact (a bare "t h" pattern would also match
    // inside "at h"); tokens = bracket count. The merge list is
    // embedded literally in BOTH sides from one Scala constant.
    //
    // 100 TB shape: zero shuffle — broadcast merges, one narrow pass,
    // per-partition term memo (see BpeTrainer.encodeCounts); the only
    // aggregation is the per-doc sum computed inside the row pass.
    "d21_bpe_encode_counts" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        val merges = d21Merges.map { case (l, r) =>
          graft.operators.BpeTrainer.Merge(l, r, 0L) }
        graft.operators.BpeTrainer.encodeCounts(spark, docs, merges)
          .orderBy("doc_id")
      },
      oracle = Some(d21Oracle),
      headline = true),

    // ---------------------------------------------------------------- d18
    // Repetition quality filters (the within-document repetition family
    // of Rae et al. 2021 §A1.1, token-occurrence variant): per document,
    // the fraction of 2-gram occurrences belonging to 2-grams that
    // repeat within the doc, and the share of the single most frequent
    // 2-gram. Both in exact integer permille; Gopher-style verdicts.
    //
    // 100 TB shape: ZERO shuffle — everything is per-row expression
    // work. The within-doc gram counts come from one array_sort + a
    // sorted-neighbor scan (singletons) + a linear run-length fold (top
    // gram), O(n log n) per document, instead of exploding
    // corpus-size (doc, gram) rows through a groupBy. The fold uses the
    // `aggregate` HOF (interpreted, not codegen) — fine here because it
    // runs once per document over ~doc-length arrays, not per
    // candidate-pair like the embedding kernels ArrayMath exists for.
    // Docs with <2 tokens carry no 2-gram signal and are excluded on
    // both sides (none exist in testdata; min is 10 tokens).
    "d18_repetition_filter" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        docs
          .select(col("doc_id"), expr(toks).as("tk"))
          .filter(expr("size(tk) >= 2"))
          .withColumn("s", expr(sorted2GramsExpr))
          .withColumn("n_grams", expr("CAST(size(s) AS BIGINT)"))
          // a sorted gram is a singleton iff it differs from both
          // neighbors (shared piece — see dup2gramPermilleExpr)
          .withColumn("n_single", expr(gramSingletonCountExpr))
          // longest equal-run in the sorted grams = max within-doc count
          .withColumn("top_cnt", expr("""
            aggregate(s,
              named_struct('prev', CAST(NULL AS STRING),
                           'run',  CAST(0 AS BIGINT),
                           'best', CAST(0 AS BIGINT)),
              (acc, x) -> named_struct(
                'prev', x,
                'run',  CASE WHEN x <=> acc.prev THEN acc.run + CAST(1 AS BIGINT)
                             ELSE CAST(1 AS BIGINT) END,
                'best', greatest(acc.best,
                  CASE WHEN x <=> acc.prev THEN acc.run + CAST(1 AS BIGINT)
                       ELSE CAST(1 AS BIGINT) END)),
              acc -> acc.best)"""))
          .select(col("doc_id"), col("n_grams"),
            expr("(n_grams - n_single) * 1000 div n_grams").as("dup2_permille"),
            expr("top_cnt * 1000 div n_grams").as("top2_permille"))
          .withColumn("verdict",
            when(col("dup2_permille") > 150, "reject_dup")
              .when(col("top2_permille") > 80, "reject_top")
              .otherwise("keep"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS g
          FROM tkn WHERE len(tk) >= 2),
        c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
        p AS (
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_occ,
                 CAST(MAX(cnt) AS BIGINT) AS top_cnt
          FROM c GROUP BY 1)
        SELECT doc_id, n_grams,
               dup_occ * 1000 // n_grams AS dup2_permille,
               top_cnt * 1000 // n_grams AS top2_permille,
               CASE WHEN dup_occ * 1000 // n_grams > 150 THEN 'reject_dup'
                    WHEN top_cnt * 1000 // n_grams > 80 THEN 'reject_top'
                    ELSE 'keep' END AS verdict
        FROM p ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d19
    // Corpus n-gram novelty: per document, the fraction of its DISTINCT
    // 3-grams that occur in no other document — a soft-dedup /
    // memorization-risk signal (exact duplicates score 0, fully novel
    // text scores 1000). Complements d01 (exact) and m01/s01 (near):
    // this one grades HOW derivative each doc is rather than pairing it.
    //
    // 100 TB shape: per-doc DISTINCT 3-grams before the explode bounds
    // the shuffle at one row per distinct (doc, gram) — the gram-count
    // aggregate is map-side combined, and the join back to grams is on
    // the gram key only (no text moves). Threshold tuning happens on
    // the permille output, not by re-running the pipeline. Docs with
    // <3 tokens are excluded on both sides (none exist in testdata).
    "d19_ngram_novelty" -> QueryDef(
      build = (spark, dir) =>
        ngramNovelty(QueryDef.spread(spark, dir, "documents")),
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))) AS g
          FROM tkn WHERE len(tk) >= 3),
        c AS (SELECT g, COUNT(*) AS nd FROM g GROUP BY 1)
        SELECT doc_id, COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
               CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*) AS novelty_permille
        FROM g JOIN c USING (g) GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d20
    // Rare-token ratio — the second standard lexical quality filter
    // next to d18's repetition family (Rae et al. 2021 drop docs
    // dominated by out-of-distribution tokens; C4 similar): per doc,
    // the permille of token OCCURRENCES whose corpus frequency is
    // below a corpus-RELATIVE floor (n·30 < max term count — exact
    // integer, and scale-invariant: the same composition trips it at
    // every sf, unlike an absolute count cutoff that silently goes
    // vacuous as the corpus grows).
    //
    // 100 TB shape: the (doc, term) frame joins the term-frequency
    // table on the term key — vocabulary-bounded like d13, never
    // corpus × corpus — and the frequency ceiling is a 1-row broadcast
    // (q09's aggregate-under-a-table shape).
    "d20_rare_token_filter" -> QueryDef(
      build = (spark, dir) =>
        rareTokenFilter(QueryDef.spread(spark, dir, "documents")),
      oracle = Some("""
        WITH tkn AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '')) AS term
          FROM documents),
        tf AS (SELECT term, COUNT(*) AS n FROM tkn GROUP BY 1),
        mx AS (SELECT MAX(n) AS mx FROM tf),
        dt AS (SELECT doc_id, term, COUNT(*) AS c FROM tkn GROUP BY 1, 2)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN n * 30 < mx THEN c ELSE 0 END) AS BIGINT) AS n_rare,
               CAST(SUM(CASE WHEN n * 30 < mx THEN c ELSE 0 END) AS BIGINT) * 1000
                 // CAST(SUM(c) AS BIGINT) AS rare_permille
        FROM dt JOIN tf USING (term) CROSS JOIN mx
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d22
    // PII scrubbing — the redaction stage every production corpus
    // pipeline runs before training. The synthetic corpus carries no
    // organic PII, so the fixture PLANTS it deterministically from
    // doc_id (emails on the %5 residue, phone numbers on %7 — both
    // engines derive the identical planted corpus, the b04/b05 planted-
    // family pattern), and the operator under test is the scrub:
    // regex redaction to <EMAIL>/<PHONE> placeholders plus per-doc
    // redaction counts (the audit trail a takedown/compliance report
    // needs). Pure per-row expressions — zero shuffle besides the
    // output sort; at 100 TB this is a map-only pass that pipelines
    // into whatever stage follows. Regex parity: explicit ASCII
    // classes only (Java regex vs RE2 agree), no \d/\w/\b
    // metacharacters, quantifiers {4}/{2,} are common syntax.
    "d22_pii_scrub" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        docs.select(col("doc_id"),
            concat(col("text"),
              when(col("doc_id") % 5 === 0,
                concat(lit(" contact user"), col("doc_id").cast("string"),
                  lit("@example.com"))).otherwise(lit("")),
              when(col("doc_id") % 7 === 0,
                concat(lit(" call 555-314-"),
                  lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
                .otherwise(lit(""))).as("ptext"))
          .select(col("doc_id"),
            regexp_count(col("ptext"), lit(piiEmailPattern)).cast("bigint")
              .as("n_emails"),
            regexp_count(col("ptext"), lit(piiPhonePattern)).cast("bigint")
              .as("n_phones"),
            md5(scrubPii(col("ptext"))).as("scrubbed_h"))
          .filter(col("n_emails") + col("n_phones") > 0)
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 5 = 0
                         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                         ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                         THEN ' call 555-314-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                         ELSE '' END AS ptext
          FROM documents),
        s AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(ptext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(ptext, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
                 md5(regexp_replace(
                   regexp_replace(ptext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_h
          FROM p)
        SELECT doc_id, n_emails, n_phones, scrubbed_h
        FROM s WHERE n_emails + n_phones > 0 ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d23
    // Boilerplate line removal — Dolma/CCNet-style paragraph-level
    // dedup: lines that recur across a large fraction of the corpus
    // (copyright headers, unsubscribe footers) are stripped and each
    // document reassembled in original line order. The corpus has no
    // line structure, so the fixture plants a per-source header and
    // footer around every document (both engines derive the identical
    // planted corpus). The boilerplate floor is RELATIVE — a line in
    // MORE THAN 1/40th of all docs, exact integer cross-multiplication
    // (absolute doc-count floors are SF-fragile, q33's lesson; the
    // planted headers scale with the corpus so the floor trips at
    // every SF). Shuffle shape at 100 TB: line-frequency counts group
    // on md5(line) — a fixed 32-char key instead of arbitrary-length
    // text, map-side combined; the qualifying set is structurally tiny
    // (a line needs > total/40 distinct docs, so at most 40x the mean
    // lines-per-doc qualify) and BROADCASTS to mark lines without
    // shuffling the corpus; reassembly is the one unavoidable
    // corpus-scale shuffle (per-doc grouping carries the kept text).
    // The scheme lives ONCE in [[markedBoilerplateLines]] — Curate's
    // --strip-boilerplate stage consumes the same definition, so the
    // oracled signal and the pipeline rewrite cannot drift.
    "d23_boilerplate_lines" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        val planted = docs.select(col("doc_id"),
          concat(lit("COPYRIGHT "), col("source"), lit(" ALL RIGHTS RESERVED"),
            lit("\n"), col("text"), lit("\n"),
            lit("footer "), col("source"), lit(" unsubscribe")).as("text"))
        // the shared d23/Curate scheme; its internal persist releases
        // through the harness queue like every other query-held cache
        markedBoilerplateLines(planted,
            registerCleanup = f => QueryDef.deferCleanup(f))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("b"), 1L).otherwise(0L)).as("removed_lines"),
            // collect_list drops NULLs: only kept lines enter, sorted
            // back to original order by pos (unique per doc)
            md5(array_join(transform(
              array_sort(collect_list(when(col("b").isNull,
                struct(col("pos"), col("line"))))),
              x => x.getField("line")), "\n")).as("cleaned_h"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT doc_id,
                 'COPYRIGHT ' || source || ' ALL RIGHTS RESERVED' || chr(10)
                 || text || chr(10)
                 || 'footer ' || source || ' unsubscribe' AS ptext
          FROM documents),
        tot AS (SELECT COUNT(*) AS n FROM p),
        l AS (
          SELECT doc_id,
                 unnest(string_split(ptext, chr(10))) AS line,
                 unnest(generate_series(1, len(string_split(ptext, chr(10))))) AS pos
          FROM p),
        b AS (
          SELECT line FROM (
            SELECT line, COUNT(DISTINCT doc_id) AS nd FROM l
            WHERE line <> '' GROUP BY 1), tot
          WHERE nd * 40 > n),
        m AS (
          SELECT doc_id, pos, line,
                 line IN (SELECT line FROM b) AS is_b
          FROM l)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS removed_lines,
               md5(COALESCE(string_agg(CASE WHEN NOT is_b THEN line END, chr(10) ORDER BY pos), '')) AS cleaned_h
        FROM m GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d27
    // Vocabulary growth curves (the empirical Heaps-law measurement):
    // how many distinct TYPES — unigram and bigram vocabularies, one
    // curve each — have appeared after the first 10%, 20%, … 100% of
    // the gram stream, reading the corpus in doc_id order. The curve's
    // shape is the corpus-health diagnostic d16's per-doc richness
    // can't see: a flattening curve means the crawl is saturating (new
    // docs add occurrences, not types); one that stays steep means the
    // vocabulary is still open. The bigram curve discriminates even on
    // closed-alphabet corpora where the unigram curve saturates in the
    // first decile. Decile membership is exact integer
    // cross-multiplication: a type first seen at 0-based stream
    // position p is inside decile i iff 10*p < i*total (the rational
    // threshold i·total/10, no float or rounding split between the
    // engines); cp_tokens reports floor(i·total/10) for display.
    //
    // 100 TB shape (the point of this query): a global stream position
    // is normally a corpus-wide prefix sum — a single-partition window
    // over every doc. Here it is c22's sharding scheme on the ORDER
    // key itself: shard = doc_id div width (a PREFIX of the doc_id
    // order, 256 ranges), the per-shard prefix sums run as 256
    // independent windows carrying the gram arrays through ONE
    // exchange, and the shard offsets come from a cumulative sum over
    // the 256-row count frame (single-partition window DELIBERATE
    // there). First-occurrence positions then map-side-combine through
    // a MIN aggregate keyed by type — shuffle volume is the distinct
    // vocabulary, not gram instances — and the decile fold runs on the
    // ≤10-row bucket histogram. The two curves are independent passes
    // over the same persisted tokenization (one scan of the corpus).
    "d27_vocab_growth" -> QueryDef(
      build = (spark, dir) => {
        val docs = QueryDef.spread(spark, dir, "documents")
        // size(tk) < 2 guard: Spark's sequence(0, -1) DESCENDS, it is
        // not empty — the d18 lesson, same guard style
        val dt = docs.select(col("doc_id"),
            expr(s"filter(split(lower(text), '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')")
              .as("tk"))
          .withColumn("bg", expr(
            """CASE WHEN size(tk) < 2 THEN array()
                    ELSE transform(sequence(0, size(tk) - 2),
                           i -> concat(tk[i], ' ', tk[i + 1])) END"""))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        QueryDef.deferCleanup(() => { dt.unpersist(false); () })
        val uni = growthCurve(dt.select(col("doc_id"), col("tk").as("arr")), "1gram")
        val bi = growthCurve(dt.select(col("doc_id"), col("bg").as("arr")), "2gram")
        uni.unionAll(bi).orderBy("gram", "cp_idx")
      },
      oracle = Some("""
        WITH dt AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[ \t\n\r\f]+'),
                   t -> t <> '') AS tk
          FROM documents),
        ar AS (
          SELECT '1gram' AS gram, doc_id, tk AS arr FROM dt
          UNION ALL
          SELECT '2gram', doc_id,
                 list_transform(range(len(tk) - 1), i -> tk[i + 1] || ' ' || tk[i + 2])
          FROM dt),
        dn AS (SELECT gram, doc_id, CAST(COALESCE(len(arr), 0) AS BIGINT) AS n FROM ar),
        cum AS (
          SELECT gram, doc_id,
                 SUM(n) OVER (PARTITION BY gram ORDER BY doc_id) - n AS cum_before
          FROM dn),
        fp AS (
          SELECT gram, token, MIN(gp) AS first_pos FROM (
            SELECT ar.gram, unnest(ar.arr) AS token,
                   cum.cum_before + unnest(range(len(ar.arr))) AS gp
            FROM ar JOIN cum ON ar.gram = cum.gram AND ar.doc_id = cum.doc_id) z
          GROUP BY gram, token),
        tot AS (SELECT gram, CAST(SUM(n) AS BIGINT) AS total FROM dn GROUP BY gram),
        bk AS (
          SELECT fp.gram, first_pos * 10 // total + 1 AS b, COUNT(*) AS c
          FROM fp JOIN tot ON fp.gram = tot.gram GROUP BY 1, 2),
        cps AS (
          SELECT gram, i AS cp_idx, total * i // 10 AS cp_tokens
          FROM range(1, 11) t(i), tot)
        SELECT cps.gram, CAST(cp_idx AS BIGINT) AS cp_idx,
               CAST(cp_tokens AS BIGINT) AS cp_tokens,
               CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_types
        FROM cps LEFT JOIN bk ON bk.gram = cps.gram AND b <= cp_idx
        GROUP BY 1, 2, 3 ORDER BY 1, 2""")),

    // ---------------------------------------------------------------- d28
    // Hashed-n-gram importance weights (the DSIR recipe, Xie et al.
    // 2023: data selection by importance resampling over hashed n-gram
    // features) — score every document by how target-like its bigram
    // distribution is, with the TARGET defined by example data instead
    // of hand rules (here: the corpus's own English slice stands in
    // for "the distribution I want more of"). Per hash bucket b (md5
    // of the bigram mod 1024 — DSIR's fixed-width feature hashing, so
    // the weight table is B-bounded no matter the vocabulary), the
    // target-affinity is the exact integer ppm share of target
    // occurrences; a document's weight is the mean affinity over its
    // bigram OCCURRENCES. Exact integer arithmetic end-to-end — the
    // log-likelihood-ratio original lives in float log-space, and this
    // is its log-free integer cousin (d12/d13's precedent), which is
    // what makes the relation hash-gateable cross-engine.
    //
    // 100 TB shape: two corpus-linear passes over the exploded bigram
    // stream (one map-side-combined groupBy to the 1024-row weight
    // table, one re-aggregation per doc), joined through a BROADCAST
    // of the B-row table — no vocabulary-sized shuffle reaches the
    // join, and B is a dial, not a function of corpus size.
    "d28_dsir_weights" -> QueryDef(
      build = (spark, dir) => {
        val B = 1024
        val grams = QueryDef.spread(spark, dir, "documents")
          .select(col("doc_id"),
            (col("lang") === "en").cast("int").as("is_t"),
            expr(toks).as("tk"))
          .filter(expr("size(tk) >= 2"))
          .select(col("doc_id"), col("is_t"), explode(expr(
            "transform(sequence(1, size(tk) - 1), " +
              "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"))
            .as("g"))
          .select(col("doc_id"), col("is_t"),
            expr(s"cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) % $B")
              .as("b"))
        val fw = grams.groupBy("b")
          .agg(sum("is_t").as("n_t"), count(lit(1)).as("n_all"))
          .select(col("b"), expr("n_t * 1000000 div n_all").as("aff_ppm"))
        grams.join(broadcast(fw), Seq("b"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            expr("sum(aff_ppm) div count(1)").as("dsir_ppm"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> '') AS tk
          FROM documents),
        bg AS (
          SELECT doc_id, CAST(lang = 'en' AS INT) AS is_t,
                 unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
          FROM tk WHERE len(tk) >= 2),
        hb AS (
          SELECT doc_id, is_t,
                 CAST('0x' || substring(md5(g), 1, 8) AS BIGINT) % 1024 AS b
          FROM bg),
        fw AS (
          SELECT b, CAST(SUM(is_t) * 1000000 // COUNT(*) AS BIGINT) AS aff_ppm
          FROM hb GROUP BY b)
        SELECT doc_id, COUNT(*) AS n_grams,
               CAST(SUM(aff_ppm) // COUNT(*) AS BIGINT) AS dsir_ppm
        FROM hb JOIN fw USING (b)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d29
    // EXACT top-k tokens with a capacity-BOUNDED shuffle — d09's
    // vocabulary head without d09's vocabulary-sized shuffle: at
    // corpus scale a plain groupBy(token) shuffles one row per
    // DISTINCT token to rank twenty heads. operators/HeavyHitters
    // runs per-partition Misra–Gries summaries (any token with global
    // count > n/capacity provably survives some partition's sketch —
    // the averaging argument), exact-counts ONLY the ≤ capacity·P
    // candidates through a broadcast semi-filter, and REFUSES loudly
    // unless the k-th exact count beats the n/capacity bound (the
    // gate that turns a sketch into a proof) — so the relation is
    // exactly the full-groupBy top-k, which is what lets DuckDB's
    // plain ORDER BY ... LIMIT oracle it.
    "d29_exact_topk_tokens" -> QueryDef(
      build = (spark, dir) => {
        val tokens = QueryDef.spread(spark, dir, "documents")
          .select(explode(expr(toks)).as("token"))
        graft.operators.HeavyHitters
          .topK(spark, tokens, "token", k = 20, capacity = 4096)
          .withColumnRenamed("n", "n_occurrences")
      },
      oracle = Some("""
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM (
          SELECT unnest(list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                   t -> t <> '')) AS token
          FROM documents)
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT 20""")),

    // ---------------------------------------------------------------- c23
    // Snapshot diff — the row-level companion to d25's distribution
    // drift: which documents were ADDED, REMOVED, CHANGED (same key,
    // different content hash), or UNCHANGED between two corpus
    // snapshots, reported as per-status counts with character volume
    // on each side. This is the audit a versioned 100 TB corpus runs
    // before promoting a new generation — d25 says the language mix
    // moved; this says how much of the corpus actually churned.
    // Deterministic stand-in for two snapshot dirs (d25's convention,
    // shaped so every status is POPULATED): old = docs with
    // doc_id%10 < 9, new = docs with doc_id%10 > 0, and the new side
    // carries an edited text for doc_id%3 = 0 — so last-digit-0 docs
    // are removals, last-digit-9 docs are additions, and the shared
    // ids split changed/unchanged. Keys are doc_ids (unique per side →
    // the full outer join is 1:1). NULL-safe hash equality
    // (<=> / IS NOT DISTINCT FROM) keeps a NULL-text pair 'unchanged'
    // on both engines (the edit concat also maps NULL → NULL on both).
    //
    // 100 TB shape: one scan per side (a real deployment reads two
    // generation dirs), md5 + length projected before the shuffle so
    // the join carries 32-hex keys and counters, never text; the full
    // outer join is the canonical co-partitioned diff — bucket both
    // snapshots by doc_id at write time and the exchange disappears.
    "c23_snapshot_diff" -> QueryDef(
      build = (spark, dir) => {
        val docs = table(spark, dir, "documents")
        val old = docs.filter(pmod(col("doc_id"), lit(10)) < 9)
        val neu = docs.filter(pmod(col("doc_id"), lit(10)) > 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(3)) === 0,
              concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
        snapshotChurn(old, neu)
      },
      oracle = Some("""
        WITH o AS (
          SELECT doc_id AS k, md5(text) AS h,
                 CAST(length(text) AS BIGINT) AS c, TRUE AS pr
          FROM documents WHERE doc_id % 10 < 9),
        nw AS (
          SELECT doc_id AS k,
                 md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]' ELSE text END) AS h,
                 CAST(length(CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]' ELSE text END) AS BIGINT) AS c,
                 TRUE AS pr
          FROM documents WHERE doc_id % 10 > 0),
        j AS (
          SELECT CASE WHEN o.pr IS NULL THEN 'added'
                      WHEN nw.pr IS NULL THEN 'removed'
                      WHEN o.h IS NOT DISTINCT FROM nw.h THEN 'unchanged'
                      ELSE 'changed' END AS status,
                 o.c AS oc, nw.c AS nc
          FROM o FULL OUTER JOIN nw ON o.k = nw.k)
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COALESCE(SUM(oc), 0) AS BIGINT) AS chars_old,
               CAST(COALESCE(SUM(nc), 0) AS BIGINT) AS chars_new
        FROM j GROUP BY status ORDER BY status""")),

    // ---------------------------------------------------------------- c24
    // Z-order layout audit: interleave (n_chars, doc_id) into one
    // Morton key (functions/ZValue — native codegen, bit-exact on both
    // engines) and report, per contiguous z-range bucket, the doc
    // count and the (min, max) envelope of BOTH dimensions. The
    // envelope IS the data-skipping argument: when a corpus is written
    // in z order, each parquet file's footer stats bound n_chars AND
    // doc_id simultaneously, so a range predicate on EITHER dimension
    // prunes files — a single-column sort gives one tight dimension
    // and leaves the other spanning the corpus (ZValueSpec pins the
    // contrast on an exact grid). This query is the audit a layout
    // job runs after writing: narrow envelopes = the clustering took.
    //
    // 100 TB shape: the z key is 12 straight-line long ops per row
    // inside whole-stage codegen (never a UDF), the bucket histogram
    // map-side-combines, and the shuffle carries |buckets| rows. The
    // oracle reconstructs the interleave arithmetically (31 shift
    // terms summed per row) — same integers, engine-independent.
    "c24_zorder_layout" -> QueryDef(
      build = (spark, dir) => {
        val docs = table(spark, dir, "documents")
        // doc_id folded mod 2³¹ — the SAME key zorderCurated writes
        // with (and the oracle's & mask computes): unfolded, a corpus
        // with ids ≥ 2³¹ would CRASH here (zvalue refuses) while the
        // oracle silently masks, and the audit would no longer measure
        // the layout Curate produced. n_chars stays direct: a string
        // column's length is JVM-capped below 2³¹ by construction.
        docs.select(col("doc_id"),
            coalesce(col("n_chars"), lit(0L)).as("nc"))
          .withColumn("z", graft.functions.ZValue.of(col("nc"),
            pmod(col("doc_id"), lit(1L << 31))))
          .groupBy(expr("z div 65536").as("z_bucket"))
          .agg(count(lit(1)).as("n_docs"),
            min("nc").as("min_chars"), max("nc").as("max_chars"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
          .orderBy("z_bucket")
      },
      oracle = Some("""
        WITH z AS (
          SELECT doc_id, COALESCE(n_chars, 0) AS nc,
                 CAST(list_sum(list_transform(range(0, 31), i ->
                   (((COALESCE(n_chars, 0) >> i) & 1) << (2 * i)) +
                   ((((doc_id & 2147483647) >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zv
          FROM documents)
        SELECT zv // 65536 AS z_bucket, COUNT(*) AS n_docs,
               MIN(nc) AS min_chars, MAX(nc) AS max_chars,
               MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM z GROUP BY 1 ORDER BY 1"""))
  )

  /** c23's relation over two ARBITRARY snapshot frames — the one
    * definition the oracled query, `DataCard.churn`, and the streaming
    * churn artifact all share. Inputs need (doc_id, text); doc_id must
    * be unique per side (the full outer join is then 1:1). md5 +
    * length are projected before the shuffle so the join carries
    * 32-hex keys and counters, never text (plan-pinned by
    * PlanShapeSpec on c23); NULL-safe `<=>` keeps a NULL-text pair
    * 'unchanged' rather than 'changed' on a column no engine can
    * compare with plain equality. */
  def snapshotChurn(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def side(docs: DataFrame, h: String, c: String, in: String) =
      docs.select(col("doc_id").as("k"),
        md5(col("text")).as(h),
        length(col("text")).cast("bigint").as(c),
        lit(true).as(in))
    side(oldDocs, "oh", "oc", "in_o")
      .join(side(newDocs, "nh", "nc", "in_n"), Seq("k"), "full_outer")
      .withColumn("status",
        when(col("in_o").isNull, "added")
          .when(col("in_n").isNull, "removed")
          .when(col("oh") <=> col("nh"), "unchanged")
          .otherwise("changed"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        coalesce(sum("oc"), lit(0L)).as("chars_old"),
        coalesce(sum("nc"), lit(0L)).as("chars_new"))
      .orderBy("status")
  }

  /** d27's decile machinery over ONE gram-array column: global
    * 0-based stream positions via c22-style range-sharded prefix sums
    * (no corpus-wide single-partition window), per-type MIN first
    * occurrence (map-side combined — shuffle volume is the
    * vocabulary), then the exact cross-multiplied decile fold over the
    * ≤10-row bucket histogram. `ar` is (doc_id, arr); a NULL array
    * counts 0 grams and yields no positions. */
  private def growthCurve(ar: DataFrame, gram: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = ar.sparkSession
    // NULL array (a NULL-text doc) counts 0 grams: size(NULL) is -1
    // under the session's legacy sizeOfNull (NOT null — coalesce never
    // fires), and a -1 would shift every later doc's stream position
    val dn = ar.withColumn("n",
      when(col("arr").isNull, lit(0L))
        .otherwise(size(col("arr")).cast("bigint")))
    val maxId = dn.agg(max("doc_id").as("max_id"))
    val sharded = dn.crossJoin(broadcast(maxId))
      .withColumn("shard", expr("doc_id div (max_id div 256 + 1)"))
    val wS = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = sharded.withColumn("cum_incl", sum("n").over(wS))
    // shard offsets from the tiny (≤256 rows) per-shard totals;
    // single-partition window DELIBERATE on the count frame
    val wO = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = sharded.groupBy("shard").agg(sum("n").as("sn"))
      .withColumn("off", sum("sn").over(wO) - col("sn"))
      .select("shard", "off")
    val fp = inShard.join(broadcast(offs), "shard")
      .withColumn("before", col("off") + col("cum_incl") - col("n"))
      .select(col("before"), posexplode(col("arr")))
      .select(col("col").as("token"), (col("before") + col("pos")).as("gp"))
      .groupBy("token")
      .agg(min("gp").as("first_pos"))
    // filter the NULL-total row of an EMPTY corpus: a global agg always
    // returns one row, but the oracle's per-gram GROUP BY returns none —
    // without this, Spark emits 10 NULL-checkpoint rows per curve where
    // DuckDB emits zero (the degenerate-corpus convergence rule). When
    // any gram exists, total >= 1, so bk's division below is
    // structurally safe on both engines.
    val tot = dn.agg(sum("n").as("total")).filter(col("total").isNotNull)
    val bk = fp.crossJoin(broadcast(tot))
      .groupBy(expr("first_pos * 10 div total + 1").as("b"))
      .agg(count(lit(1)).as("c"))
    spark.range(1, 11).toDF("cp_idx").crossJoin(broadcast(tot))
      .withColumn("cp_tokens", expr("total * cp_idx div 10"))
      .join(broadcast(bk), col("b") <= col("cp_idx"), "left_outer")
      .groupBy("cp_idx", "cp_tokens")
      .agg(coalesce(sum("c"), lit(0L)).as("n_types"))
      .select(lit(gram).as("gram"), col("cp_idx"), col("cp_tokens"),
        col("n_types"))
  }
}
