package graft.queries

import java.nio.file.{Files, Path}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Semantics contracts for the curation operators (c06–c08) on crafted
  * corpora — the known-answer checks the DuckDB oracle (which only
  * proves cross-engine agreement on the synthetic corpus) can't express.
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.build("graft-test")

  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[Path]

  private def newTmpDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    tmpDirs += p
    p.toString
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach { p =>
      // delete children before parents
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
    super.afterAll()
  }

  /** Write a crafted documents.parquet into a temp dir shaped like a
    * testdata sf directory, so the queries run on it unchanged. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = newTmpDir("graft_curation")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("c06: repetition fractions are exact on known documents") {
    val dir = docsDir(Seq(
      (0L, "spam spam spam spam", "en", "s"), // pure repetition
      (1L, "one two three four", "en", "s"), // no repetition
      (2L, "go go stop go go", "en", "s"), // top tok 4/5, top bigram "go go" 2/4
      (3L, "solo", "en", "s"), // single token: no bigrams
      (4L, "   ", "en", "s"), // whitespace-only: zero tokens
      (5L, "", "en", "s"))) // empty: zero tokens
    val out = Curation.defs("c06_repetition_signals").build(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(5) === 1000L) // top_tok_pm
    assert(out(0L).getLong(6) === 1000L) // top_bigram_pm ("spam spam" 3/3)
    assert(out(1L).getLong(5) === 250L)
    assert(out(1L).getLong(6) === 333L) // 3 distinct bigrams, top 1/3
    assert(out(2L).getLong(3) === 4L) // top_tok_c: "go"
    assert(out(2L).getLong(4) === 2L) // top_bigram_c: "go go"
    assert(out(2L).getLong(6) === 500L) // 2/4 bigrams
    assert(out(3L).getLong(1) === 1L && out(3L).getLong(4) === 0L
      && out(3L).getLong(6) === 0L) // no bigram, fraction reported as 0
    // zero-token docs are REPORTED (all-zero signals), not dropped —
    // explode of an empty array would silently omit them
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L))
    Seq(4L, 5L).foreach { id =>
      (1 to 6).foreach(i => assert(out(id).getLong(i) === 0L, s"doc $id col $i"))
    }
  }

  test("c07: injected PII is found and fully redacted; clean docs untouched") {
    // doc 0: %7 and %11 both 0 → email + phone injected; doc 1: clean;
    // doc 2: a full 10-digit phone in the raw text — the case the
    // unguarded 2-digit pattern used to redact partially ('1<PHONE>')
    val dir = docsDir(Seq(
      (0L, "hello world", "en", "s"),
      (1L, "no pii here at all", "en", "s"),
      (2L, "call 123-456-7890 now", "en", "s")))
    val out = Curation.defs("c07_pii_scrub").build(spark, dir).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(1) === 3L) // n_docs
    assert(r.getLong(2) === 1L) // emails_found
    assert(r.getLong(3) === 2L) // phones_found
    assert(r.getLong(4) === 2L) // docs_with_pii: docs 0 and 2
    // Re-derive the redaction and prove no PII pattern survives it
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    val phonePat = "(^|[^0-9-])([0-9]{1,3}-[0-9]{3}-[0-9]{4})"
    val aug = "hello world contact user0@example.com for details or call 1-555-0000"
    val redacted = aug.replaceAll(emailPat, "<EMAIL>").replaceAll(phonePat, "$1<PHONE>")
    assert(!redacted.matches(s".*($emailPat|$phonePat).*"), redacted)
    // boundary guard: the 10-digit phone redacts whole — no stray
    // leading digit left behind
    val redacted2 = "call 123-456-7890 now".replaceAll(phonePat, "$1<PHONE>")
    assert(redacted2 === "call <PHONE> now", redacted2)
    assert(r.getLong(5) ===
      (aug.length - redacted.length) +
        ("call 123-456-7890 now".length - redacted2.length))
  }

  test("c08: shard stats match a real partitioned export read back") {
    val dir = "/root/testdata/sf0.001"
    val stats = Curation.defs("c08_shard_export").build(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats.values.map(_._1).sum ===
      spark.read.parquet(s"$dir/documents.parquet").count())

    // The export writer uses the same assignment: one directory per shard
    val out = newTmpDir("graft_export")
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("shard", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 64"))
      .repartition(col("shard")) // co-locate each shard into one task's files
      .write.partitionBy("shard").mode("overwrite").parquet(out)

    // partition-column values come back type-inferred (int) → cast to match
    val back = spark.read.parquet(out)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(back === stats, "export partition contents must match the shard stats query")
  }

  test("c09: packing conserves tokens and fills every non-final sequence") {
    val dir = "/root/testdata/sf0.001"
    val out = Curation.defs("c09_sequence_packing").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // conservation: packed token mass equals the corpus token mass
    val totalTok = spark.read.parquet(s"$dir/documents.parquet")
      .select(expr(
        "cast(size(filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')) as bigint)").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(out.values.map(_._2).sum === totalTok)
    val byShard = out.groupBy(_._1._1)
    byShard.foreach { case (shard, seqs) =>
      val ids = seqs.keys.map(_._2).toSeq.sorted
      // sequences are contiguous from 0 (concat-and-chunk leaves no gap)
      assert(ids === (0L until ids.length).toSeq, s"shard $shard gap")
      // every sequence but the shard's last is exactly full
      val last = ids.last
      seqs.foreach { case ((_, seq), (_, nTok)) =>
        if (seq != last) assert(nTok === 512L, s"shard $shard seq $seq")
        else assert(nTok >= 1L && nTok <= 512L)
      }
    }
  }

  test("c09: boundary-exact, spanning, whitespace-only, and single-doc-shard docs") {
    // the sf fixture can't deterministically exercise the seq-range edge
    // cases, so craft them: ids are chosen by their REAL md5 shard so
    // the crafted docs land where the test expects
    def shardOf(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 8), 16) % 16
    }
    val byShard = (0L to 200L).groupBy(shardOf)
    val (s0, inS0) = byShard.find(_._2.size >= 3).get
    val Seq(a, ws, b) = inS0.sorted.take(3).toSeq
    val other = (0L to 200L).find(i => shardOf(i) != s0).get
    val sOther = shardOf(other)
    val dir = docsDir(Seq(
      (a, "t " * 512, "en", "s"),   // exactly one full sequence
      (ws, " \t  \n ", "en", "s"),  // whitespace-only: occupies no space
      (b, "t " * 600, "en", "s"),   // spans the seq-1/seq-2 cut
      (other, "t t t t t", "en", "s"))) // lone doc in its shard
    val out = Curation.defs("c09_sequence_packing").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // doc a ends EXACTLY on the 512 boundary: its last seq is
    // (fin-1) div 512 = 0 — no phantom empty seq 1 from a naive fin div L;
    // the whitespace-only doc neither appears nor shifts doc b's spans;
    // doc b contributes 512 tokens to seq 1 and the 88 overflow to seq 2
    assert(out === Map(
      (s0, 0L) -> (1L, 512L),
      (s0, 1L) -> (1L, 512L),
      (s0, 2L) -> (1L, 88L),
      (sOther, 0L) -> (1L, 5L)))
  }

  test("c10: verdicts partition the batch by base/batch/first-seen digest") {
    val dir = docsDir(Seq(
      (1L, "alpha text", "en", "s"), (2L, "beta text", "en", "s"), // base
      (10L, "alpha text", "en", "s"), // digest already in base
      (20L, "gamma text", "en", "s"), // new digest, first in batch
      (30L, "gamma text", "en", "s"), // same digest, later doc_id
      (40L, "delta text", "en", "s"))) // unique
    val out = Curation.defs("c10_incremental_dedup").build(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(10L -> "dup_of_base", 20L -> "kept",
      30L -> "dup_in_batch", 40L -> "kept"))
  }

  test("c11: within-doc repeats split spans, cross-doc windows merge, short docs excluded") {
    val a = (1 to 20).map(i => s"a$i").mkString(" ") // exactly W tokens
    val b = (1 to 25).map(i => s"b$i").mkString(" ")
    val dir = docsDir(Seq(
      // the 20-token block repeats inside ONE doc around a filler token:
      // dup windows at pos 1 and 22 are disjoint → two 20-token spans
      (1L, s"$a filler $a", "en", "s"),
      // docs 2 and 3 share a 25-token prefix: six overlapping dup
      // windows (pos 1..6) merge into ONE maximal 25-token span each
      (2L, s"$b xb1 xb2 xb3 xb4 xb5", "en", "s"),
      (3L, s"$b yc1 yc2 yc3 yc4 yc5", "en", "s"),
      // under W tokens: no windows, even though it duplicates nothing
      (4L, (1 to 10).map(i => s"d$i").mkString(" "), "en", "s"),
      // ≥ W tokens but nothing repeated: absent from the output
      (5L, (1 to 30).map(i => s"e$i").mkString(" "), "en", "s")))
    val out = Curation.defs("c11_substring_dedup").build(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((2L, 40L)), 2L -> ((1L, 25L)), 3L -> ((1L, 25L))))
  }

  test("c11: production xxhash64 variant reports identical spans to the md5 oracle plan") {
    // a real corpus, not just the crafted fixture: every duplicated
    // window at sf0.001 must land in the same maximal span under both
    // hashes (they differ only if a 64-bit collision fabricates a dup)
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val md5Spans = Curation.defs("c11_substring_dedup").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val xxSpans = Curation.substringDedup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(md5Spans.nonEmpty, "sf0.001 must contain duplicated windows")
    assert(xxSpans === md5Spans)
  }

  test("c12: leakage-free — no near-dup pair straddles splits, every doc assigned once") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = TextMedia.defs("c12_leakage_split").build(spark, dir)
      .persist()
    try {
      // total assignment: one row per source doc, no dup, no orphan
      assert(out.count() === docs.count())
      assert(out.select("doc_id").distinct().count() === docs.count())
      // split is a pure function of cluster_id
      val multi = out.groupBy("cluster_id")
        .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
      assert(multi === 0L)
      // THE leakage property: a near-dup pair never crosses a split
      // boundary (pairs → same cluster → same split)
      val pairs = TextMedia.simhashPairs(spark, dir)
      val a = out.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
      val b = out.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
      val crossing = pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(col("split_a") =!= col("split_b")).count()
      assert(crossing === 0L)
      // the hash assignment really exercises all three splits at 500 docs
      val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
      assert(splits === Set("train", "val", "test"))
    } finally {
      out.unpersist(false)
      QueryDef.drainCleanups()
    }
  }

  test("d12: bigram fluency is the exact per-occurrence conditional mean") {
    // corpus: (a,b) occurs 4x, (b,a) 2x, (b,c) 1x; prefix a->4, b->3
    //   cond(a,b) = 1000*4/4 = 1000; cond(b,a) = 666; cond(b,c) = 333
    // doc 1 [a b a b a b]: occurrences (a,b)x3 + (b,a)x2 -> 4332/5 = 866
    // doc 2 [a b c]: 1000 + 333 -> 1333/2 = 666
    // doc 3 [z]: under 2 tokens, absent
    val dir = docsDir(Seq(
      (1L, "a b a b a b", "en", "s"),
      (2L, "a b c", "en", "s"),
      (3L, "z", "en", "s")))
    val out = Documents.defs("d12_bigram_fluency").build(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((5L, 866L)), 2L -> ((2L, 666L))))
  }

  test("d09: top-k ranks by count with alphabetical tie-break") {
    val dir = docsDir(Seq(
      (0L, "a a a b b c", "en", "s"),
      (1L, "y x", "fr", "s"))) // x and y tie at 1 → x first
    val out = Documents.defs("d09_vocab_topk").build(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("en", 1L, "a", 3L), ("en", 2L, "b", 2L), ("en", 3L, "c", 1L),
      ("fr", 1L, "x", 1L), ("fr", 2L, "y", 1L)))
  }

  test("d10: rank percentiles hit the exact order statistics") {
    // lengths 1..10 per lang: p50 = 5th value, p90 = 9th, p99 = 10th
    val docs = (1 to 10).map(k => (k.toLong, "x" * k, "en", "s"))
    val dir = docsDir(docs)
    val r = Documents.defs("d10_length_percentiles").build(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((10L, 5L, 9L, 10L)))
  }

  test("d13: inverse-df term weights with deterministic rank ties") {
    // df: apple 1, banana 2, cherry 1, the 2
    // doc 1 weights: apple 2*1000000, banana 1*500000, the 1*500000
    //   (banana/the tie at 500000 → banana first alphabetically)
    // doc 2 weights: cherry 1*1000000, the 2*500000 = 1000000, banana 500000
    //   (cherry/the tie at 1000000 → cherry first)
    val dir = docsDir(Seq(
      (1L, "apple apple banana the", "en", "s"),
      (2L, "banana cherry the the", "en", "s")))
    val out = Documents.defs("d13_tfidf_terms").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, "apple", 2L, 1L, 2000000L),
      (1L, 2L, "banana", 1L, 2L, 500000L),
      (1L, 3L, "the", 1L, 2L, 500000L),
      (2L, 1L, "cherry", 1L, 1L, 1000000L),
      (2L, 2L, "the", 2L, 2L, 1000000L),
      (2L, 3L, "banana", 1L, 2L, 500000L)))
  }

  test("c13: each quality rule fires, in cascade order") {
    val five = "alpha bravo chill delta ebony fghij klmno pqrst uvwxy zabcd " +
      "aaron blunt crane dwarf eagle fjord gnome haste igloo jolly " +
      "knave lemon mango" // 23 distinct 5-char words → mean 5000‰
    val dir = docsDir(Seq(
      (1L, "one two three", "en", "s"), // 3 tokens → too_short
      // 30 identical tokens: distinct 33‰ → repetitive (and it has no
      // stopword — repetitive must win the cascade)
      (2L, Seq.fill(30)("spam").mkString(" "), "en", "s"),
      // 25 distinct 12-char words: mean 12000‰ → word_len
      (3L, (1 to 25).map(i => f"longword$i%04d").mkString(" "), "en", "s"),
      // healthy lengths/diversity but zero stopwords → no_stopword
      (4L, five + " extra words here", "en", "s"),
      // same plus a stopword → keep
      (5L, five + " and extra words", "en", "s")))
    val out = Curation.defs("c13_quality_rules").build(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out === Map(1L -> "too_short", 2L -> "repetitive",
      3L -> "word_len", 4L -> "no_stopword", 5L -> "keep"))
  }
}
