package graft

import java.nio.file.Files
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end contract for the Curate pipeline driver on the sf0.001
  * corpus: verdicts partition the corpus, artifacts agree with each
  * other, and the packing manifest conserves the kept token stream. */
class CurateSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.001"
  private lazy val out = {
    val p = Files.createTempDirectory("graft_curate_spec").toString
    (p, Curate.run(spark, dir, p))
  }

  override def afterAll(): Unit = {
    val p = java.nio.file.Paths.get(out._1)
    Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      .forEach(q => Files.deleteIfExists(q))
    super.afterAll()
  }

  test("artifacts land on an explicit file:-scheme Hadoop outDir") {
    // the JSON sidecars (summary/card) and the parquet shards resolve
    // through the outDir's Hadoop scheme — an HDFS/S3 outDir must not
    // crash on the sidecar writes after the parquet landed
    val fsOut = "file:" +
      Files.createTempDirectory("graft_curate_fs").toString + "/run"
    val r = Curate.run(spark, dir, fsOut)
    val c = spark.sessionState.newHadoopConf()
    assert(graft.util.Fs.exists(s"$fsOut/summary.json", c))
    assert(graft.util.Fs.exists(s"$fsOut/card.json", c))
    val js = graft.util.Fs.readString(s"$fsOut/summary.json", c)
    r.counts.foreach { case (k, v) => assert(js.contains(s""""$k":$v"""), js) }
    assert(spark.read.parquet(s"$fsOut/verdicts.parquet").count() ===
      spark.read.parquet(s"$dir/documents.parquet").count())
  }

  test("verdicts partition the corpus and reconcile with every artifact") {
    val (outDir, r) = out
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(r.counts.values.sum === total)
    assert(r.counts.keySet.subsetOf(
      Set("kept", "exact_dup", "near_dup", "low_quality")))
    // artifacts agree with the returned counts
    val verdicts = spark.read.parquet(s"$outDir/verdicts.parquet")
    assert(verdicts.count() === total)
    val curated = spark.read.parquet(s"$outDir/curated.parquet")
    assert(curated.count() === r.counts("kept"))
    assert(r.splits.values.sum === r.counts("kept"))
    // summary.json parses as the same numbers
    val js = Files.readString(java.nio.file.Paths.get(s"$outDir/summary.json"))
    r.counts.foreach { case (k, v) => assert(js.contains(s""""$k":$v"""), js) }
    // card.json: the c15 governance relation over the run's input —
    // its n_docs is the same corpus every verdict partitioned
    val card = Files.readString(java.nio.file.Paths.get(s"$outDir/card.json"))
    assert(card.contains(s""""n_docs":$total"""), card)
  }

  test("curated corpus is exactly-deduped and split-closed") {
    val (outDir, _) = out
    val curated = spark.read.parquet(s"$outDir/curated.parquet")
    // no two kept docs share text
    assert(curated.select("text").distinct().count() === curated.count())
    // kept docs' near-dup pairs never straddle splits: all pairs among
    // kept docs must join to equal splits
    val pairs = queries.TextMedia.simhashPairs(spark, dir)
    val a = curated.select(col("doc_id").as("doc_a"), col("split").as("sa"))
    val b = curated.select(col("doc_id").as("doc_b"), col("split").as("sb"))
    val crossing = pairs.join(a, "doc_a").join(b, "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossing === 0L)
    queries.QueryDef.drainCleanups()
  }

  test("crafted corpus: every verdict reason fires with the right precedence") {
    import spark.implicits._
    val dir2 = Files.createTempDirectory("graft_curate_crafted").toString
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, long, "en", "s"),                 // kept (canonical of 1,2,3)
      (2L, long, "en", "s"),                 // exact_dup of 1 (beats near_dup)
      // same DISTINCT token set as doc 1 (repeated token), so the
      // set-based SimHash is bit-identical -> guaranteed near_dup,
      // while the text itself differs -> not an exact_dup
      (3L, long + " tok1", "en", "s"),
      (4L, "too short", "en", "s"),          // low_quality (2 < 5 tokens)
      (5L, "a completely different document with many distinct words present", "en", "s"),
      (6L, null.asInstanceOf[String], "en", "s")) // low_quality (NULL text quarantined)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    try {
      val r = Curate.run(spark, dir2, s"$dir2/out")
      assert(r.counts === Map(
        "kept" -> 2L, "exact_dup" -> 1L, "near_dup" -> 1L, "low_quality" -> 2L))
      val v = spark.read.parquet(s"$dir2/out/verdicts.parquet")
        .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
      assert(v === Map(1L -> "kept", 2L -> "exact_dup", 3L -> "near_dup",
        4L -> "low_quality", 5L -> "kept", 6L -> "low_quality"))
    } finally {
      val p = java.nio.file.Paths.get(dir2)
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
  }

  test("opt-in repetition gate quarantines Gopher-style repetitive docs") {
    import spark.implicits._
    val dir2 = Files.createTempDirectory("graft_curate_rep").toString
    // doc 1: "spam spam ... spam" — every 2-gram is the same (dup2
    // occupancy 1000 permille); doc 2: all-distinct tokens (0 permille);
    // doc 3: half-repetitive (a b a b ... pattern, ~1000 as well but
    // kept distinct from doc 1 to exercise the threshold on two docs)
    val docs = Seq(
      (1L, Seq.fill(30)("spam").mkString(" "), "en", "s"),
      (2L, (1 to 30).map(i => s"w$i").mkString(" "), "en", "s"),
      (3L, (1 to 15).flatMap(_ => Seq("ab", "cd")).mkString(" "), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    try {
      // default config: no gate — everything long enough is kept
      val off = Curate.run(spark, dir2, s"$dir2/out_off")
      assert(off.counts("kept") === 3L)
      // gate at 150 permille: both repetitive docs quarantine
      val on = Curate.run(spark, dir2, s"$dir2/out_on",
        Curate.Config(maxRep2gramPermille = Some(150)))
      assert(on.counts === Map("kept" -> 1L, "low_quality" -> 2L))
      val v = spark.read.parquet(s"$dir2/out_on/verdicts.parquet")
        .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
      assert(v === Map(1L -> "low_quality", 2L -> "kept", 3L -> "low_quality"))
    } finally {
      val p = java.nio.file.Paths.get(dir2)
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
  }

  test("CLI args: --rep flag is position-independent; typos fail loudly") {
    val (pos, cfg, _) = Curate.parseArgs(
      Array("/in", "--rep=150", "/out", "7", "/base"))
    assert(pos.toSeq === Seq("/in", "/out", "7", "/base"))
    assert(cfg.minTokens === 7)
    assert(cfg.maxRep2gramPermille === Some(150))
    val (_, noFlag, _) = Curate.parseArgs(Array("/in", "/out"))
    assert(noFlag === Curate.Config())
    val e = intercept[IllegalArgumentException] {
      Curate.parseArgs(Array("/in", "--repp=9"))
    }
    assert(e.getMessage.contains("unknown flag"))
  }

  test("the gate's expression IS d18's oracled signal (no drift)") {
    // the one-expression form used by the Curate gate must agree with
    // the d18 QueryDef's column-pipeline form on real data, row by row
    val dir18 = "/root/testdata/sf0.001"
    val viaQuery = graft.queries.Documents.defs("d18_repetition_filter")
      .build(spark, dir18)
      .select("doc_id", "dup2_permille")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.queries.QueryDef.drainCleanups()
    val viaExpr = spark.read.parquet(s"$dir18/documents.parquet")
      .select(col("doc_id"),
        expr(graft.queries.Documents.dup2gramPermilleExpr).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // d18 excludes <2-token docs; the expression scores them 0 — on
    // the overlap they must agree exactly
    viaQuery.foreach { case (id, p) => assert(viaExpr(id) === p, s"doc $id") }
    assert(viaQuery.nonEmpty)
  }

  test("incremental: base wins, batch-local rules apply, index accumulates") {
    import spark.implicits._
    def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
      rows.map { case (id, t) => (id, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val root = Files.createTempDirectory("graft_curate_incr").toString
    val longA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val longB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val longC = (1 to 40).map(i => s"gamma$i").mkString(" ")
    try {
      // base corpus: two distinct docs, both kept
      writeDocs(s"$root/base", Seq((1L, longA), (2L, longB)))
      val base = Curate.run(spark, s"$root/base", s"$root/out0")
      assert(base.counts === Map("kept" -> 2L))
      // batch: identical to base (dup_of_base), near-dup of base via
      // same distinct token set (near_dup_base), in-batch exact pair
      // (first kept, second exact_dup), short doc (low_quality),
      // fresh doc (kept)
      writeDocs(s"$root/batch", Seq(
        (10L, longA),               // dup_of_base (digest match on doc 1)
        (11L, longB + " beta1"),    // near_dup_base (same distinct set as 2)
        (12L, longC),               // kept (canonical of 12,13)
        (13L, longC),               // exact_dup of 12
        (14L, "too short")))        // low_quality
      val r = Curate.runIncremental(
        spark, s"$root/batch", s"$root/out0", s"$root/out1")
      assert(r.counts === Map("dup_of_base" -> 1L, "near_dup_base" -> 1L,
        "exact_dup" -> 1L, "low_quality" -> 1L, "kept" -> 1L))
      // the new index carries base + EVERY examined batch doc (dropped
      // docs keep suppressing redelivered content); split is non-null
      // exactly for kept docs
      val idx = spark.read.parquet(s"$root/out1/index.parquet")
      assert(idx.select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L, 10L, 11L, 12L, 13L, 14L))
      assert(idx.filter(col("split").isNotNull)
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L, 12L))
      // batch2: base-identical docs (dup_of_base on BOTH copies — base
      // precedence over batch rules) + redelivery of text the pipeline
      // DROPPED last run (13's exact-dup text) must not be re-admitted
      writeDocs(s"$root/batch2", Seq(
        (20L, longA), (21L, longA),
        (22L, longC)))              // same digest as dropped doc 13
      val r2 = Curate.runIncremental(
        spark, s"$root/batch2", s"$root/out1", s"$root/out2")
      assert(r2.counts === Map("dup_of_base" -> 3L))
      // chained index: nothing new kept, and the dropped portion is
      // COMPACTED per distinct (digest, fp) — batch2's three docs all
      // redeliver content already indexed (longA kept as doc 1, longC
      // dropped-exemplar'd as doc 13), so the index does NOT grow
      val idx2 = spark.read.parquet(s"$root/out2/index.parquet")
      assert(idx2.count() === idx.count(),
        "pure redelivery must not grow the compacted index")
      assert(idx2.filter(col("split").isNotNull).count() === 3L)
      // suppression is unchanged by compaction: a third redelivery of
      // both previously-kept and previously-dropped content is still
      // fully suppressed
      writeDocs(s"$root/batch3", Seq((30L, longA), (31L, longC)))
      val r3 = Curate.runIncremental(
        spark, s"$root/batch3", s"$root/out2", s"$root/out3")
      assert(r3.counts === Map("dup_of_base" -> 2L))
      val idx3 = spark.read.parquet(s"$root/out3/index.parquet")
      assert(idx3.count() === idx.count(),
        "index row count stays flat under repeated redelivery")
      // in-place incremental runs are refused (they would destroy the
      // index while it is still a lazy input)
      intercept[IllegalArgumentException] {
        Curate.runIncremental(
          spark, s"$root/batch2", s"$root/out2", s"$root/out2")
      }
    } finally {
      val p = java.nio.file.Paths.get(root)
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
  }

  test("takedown: retracted docs leave every artifact but keep suppressing") {
    import spark.implicits._
    def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
      rows.map { case (id, t) => (id, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val root = Files.createTempDirectory("graft_curate_td").toString
    val longA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val longB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val longC = (1 to 40).map(i => s"gamma$i").mkString(" ")
    try {
      writeDocs(s"$root/base",
        Seq((1L, longA), (2L, longB), (3L, longC), (4L, "tiny doc")))
      val base = Curate.run(spark, s"$root/base", s"$root/out0")
      assert(base.counts === Map("kept" -> 3L, "low_quality" -> 1L))
      // retract doc 2 (+ an unknown id and an already-dropped id: both
      // no-ops — in particular doc 4 KEEPS its low_quality verdict, so
      // the histogram never shifts between categories for a doc whose
      // content never reached the artifacts)
      val r = Curate.runTakedown(spark, s"$root/out0", s"$root/out1",
        Seq(2L, 4L, 999L).toDF("doc_id"))
      assert(r.counts ===
        Map("kept" -> 2L, "taken_down" -> 1L, "low_quality" -> 1L))
      // gone from curated + packing bookkeeping, verdict flipped
      val curated = spark.read.parquet(s"$root/out1/curated.parquet")
      assert(curated.select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(1L, 3L))
      val v = spark.read.parquet(s"$root/out1/verdicts.parquet")
      assert(v.filter(col("verdict") === "taken_down")
        .select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L))
      assert(v.filter(col("doc_id") === 4L).select("verdict")
        .collect().head.getString(0) === "low_quality",
        "an already-dropped doc named in a takedown keeps its verdict")
      // ...and its whole verdicts row: the provisional split assigned
      // at curation time must survive too — the no-op contract is
      // row-level, not just verdict-level (a consumer diffing base vs
      // post-takedown verdicts must see doc 4 untouched)
      val base4 = spark.read.parquet(s"$root/out0/verdicts.parquet")
        .filter(col("doc_id") === 4L).select("split").collect().head
      val after4 = v.filter(col("doc_id") === 4L).select("split")
        .collect().head
      assert(!base4.isNullAt(0), "fixture: non-kept docs carry a provisional split")
      assert(after4.getString(0) === base4.getString(0),
        "an already-dropped doc named in a takedown keeps its split")
      assert(v.filter(col("doc_id") === 2L).select("split")
        .collect().head.isNullAt(0), "retracted doc must leave its split")
      // packing re-derives from the survivors: token totals reconcile
      val packed = spark.read.parquet(s"$root/out1/packing.parquet")
        .agg(sum("n_tokens")).collect().head.getLong(0)
      assert(packed === 2L * 40L, s"packing must cover exactly the survivors")
      // the index keeps doc 2's digest/fp as a NULL-split suppressor:
      // a future batch redelivering the content is NOT re-admitted
      writeDocs(s"$root/batch", Seq((10L, longB)))
      val r2 = Curate.runIncremental(
        spark, s"$root/batch", s"$root/out1", s"$root/out2")
      assert(r2.counts === Map("dup_of_base" -> 1L),
        "taken-down content must stay suppressed on redelivery")
      // in-place takedown refused (lazy reads of baseDir)
      intercept[IllegalArgumentException] {
        Curate.runTakedown(spark, s"$root/out1", s"$root/out1",
          Seq(1L).toDF("doc_id"))
      }
      // summary reflects the post-takedown totals
      val js = Files.readString(
        java.nio.file.Paths.get(s"$root/out1/summary.json"))
      assert(js.contains(""""taken_down":1"""), js)
      assert(js.contains(""""kept":2"""), js)
    } finally {
      val p = java.nio.file.Paths.get(root)
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
  }

  test("canonical election skips low-quality members; non-default config applies") {
    import spark.implicits._
    val dir2 = Files.createTempDirectory("graft_curate_canon").toString
    val long40 = (1 to 40).map(i => s"word$i").mkString(" ")
    // doc 51 repeats word1, so its DISTINCT token set equals doc 50's
    // (same SimHash fp -> same cluster) while its n_tok is 41. With
    // minTokens=41, the cluster's overall-min member 50 FAILS quality:
    // the old rule lost the whole cluster (50 low_quality, 51 near_dup);
    // the election keeps 51 as the cluster's representative, and 50 is
    // recorded as a near_dup of it (near_dup precedes low_quality: the
    // content IS represented by the kept canonical).
    val cfg = Curate.Config(minTokens = 41, packShards = Some(4),
      testSixteenths = 2, valSixteenths = 3)
    Seq(
      (50L, long40, "en", "s"),
      (51L, long40 + " word1", "en", "s"),
      (60L, (1 to 41).map(i => s"other$i").mkString(" "), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    try {
      val r = Curate.run(spark, dir2, s"$dir2/out", cfg)
      val v = spark.read.parquet(s"$dir2/out/verdicts.parquet")
        .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
      assert(v === Map(50L -> "near_dup", 51L -> "kept", 60L -> "kept"))
      assert(r.counts === Map("kept" -> 2L, "near_dup" -> 1L))
      // packing respects the configured shard count: every shard id is
      // within [0, 4), and the summary records the config
      val packing = spark.read.parquet(s"$dir2/out/packing.parquet")
      val shardIds = packing.select("shard").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(shardIds.forall(s => s >= 0 && s < 4), shardIds.toString)
      val js = Files.readString(java.nio.file.Paths.get(s"$dir2/out/summary.json"))
      assert(js.contains(""""pack_shards":4"""), js)
      assert(js.contains(""""min_tokens":41"""), js)
    } finally {
      val p = java.nio.file.Paths.get(dir2)
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
  }

  test("derived packing shard count scales with the kept corpus") {
    assert(Curate.deriveShards(0L) === 16)
    assert(Curate.deriveShards(500L) === 16)
    assert(Curate.deriveShards(1L << 20) === 16)
    assert(Curate.deriveShards(10L << 20) === 160)   // linear growth
    assert(Curate.deriveShards(1L << 40) === (1 << 20)) // capped
  }

  test("packing manifest conserves kept tokens at L=512") {
    val (outDir, _) = out
    val curated = spark.read.parquet(s"$outDir/curated.parquet")
    val toks = queries.TextMedia.toks
    val keptTokens = curated
      .select(expr(s"cast(size($toks) as bigint)").as("n")).agg(sum("n"))
      .collect()(0).getLong(0)
    val packing = spark.read.parquet(s"$outDir/packing.parquet")
    val packedTokens = packing.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(packedTokens === keptTokens)
    // every non-final sequence of a (split, shard) stream is full
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("split", "shard")
    val nonFull = packing
      .withColumn("mx", max("seq").over(w))
      .filter(col("seq") =!= col("mx") && col("n_tokens") =!= 512).count()
    assert(nonFull === 0L)
  }
  test("JSONL input: curation runs on a corpus drop, quarantining bad lines") {
    val in = java.nio.file.Files.createTempDirectory("graft_cur_jsonl_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cur_jsonl_out_").toString
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang", "source")
      graft.sources.jsonl.JsonlDocs.write(docs, s"$in/drop")
      // drop a malformed shard beside the good ones (a fresh file —
      // editing a Spark-written part would invalidate its .crc sidecar)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$in/drop/zzz-malformed.json"),
        "not json at all\n{\"text\": \"missing id\"}\n")
      val r = Curate.run(spark, s"$in/drop", outDir)
      assert(r.counts.values.sum === docs.count()) // bad line excluded, all docs curated
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$outDir/card.json")))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(in)); rm(new java.io.File(outDir))
    }
  }

  test("JSONL input: a dir that parses to ZERO valid docs fails loudly") {
    // a mistyped path / a dir of non-JSONL files must not curate an
    // empty corpus into a normal-looking outDir with everything
    // silently quarantined
    val in = java.nio.file.Files.createTempDirectory("graft_cur_junk_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cur_junk_out_").toString
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$in/readme.txt"),
        "this is not a JSONL corpus\njust some notes\n")
      val e = intercept[IllegalArgumentException](Curate.run(spark, in, outDir))
      assert(e.getMessage.contains("0 valid JSONL documents"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(in)); rm(new java.io.File(outDir))
    }
  }

  test("--scrub-pii redacts at ingestion: clean curated text, PII-variant dups fold") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_curate_pii").toString
    try {
      val docs = Seq(
        // 1 & 2 are identical up to the email ADDRESS: redaction makes
        // them exact copies, so the scrub-on run must fold them as
        // exact_dup — the dedup consequence of scrubbing at ingestion,
        // not at output
        (1L, "alpha beta gamma delta epsilon zeta eta theta reach alice@example.com thanks",
          "en", "s0", 76L),
        (2L, "alpha beta gamma delta epsilon zeta eta theta reach bob@other.org thanks",
          "en", "s0", 73L),
        (3L, "one two three four five six seven eight call 415-555-0199 now",
          "en", "s0", 62L),
        (4L, "nine ten eleven twelve thirteen fourteen fifteen sixteen",
          "en", "s0", 57L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$root/in/documents.parquet")
      // the CLI flag wires the dial
      val (_, cfg, _) = Curate.parseArgs(Array("a", "b", "--scrub-pii"))
      assert(cfg.scrubPii)
      val r = Curate.run(spark, s"$root/in", s"$root/on", cfg)
      assert(r.counts.getOrElse("exact_dup", 0L) === 1L,
        s"PII-variant twins must fold under scrub: ${r.counts}")
      val onTexts = spark.read.parquet(s"$root/on/curated.parquet")
        .select("text").as[String].collect().toSeq
      // nothing matching either PII pattern survives anywhere
      onTexts.foreach { t =>
        assert(!queries.Documents.piiEmailPattern.r.findFirstIn(t).isDefined &&
          !queries.Documents.piiPhonePattern.r.findFirstIn(t).isDefined,
          s"PII survived curation: $t")
      }
      assert(onTexts.exists(_.contains("<EMAIL>")))
      assert(onTexts.exists(_.contains("<PHONE>")))
      // the exact redaction is the d22-oracled expression (shared
      // definition): doc 3's curated text is the literal redaction
      assert(onTexts.contains(
        "one two three four five six seven eight call <PHONE> now"))
      // the dial rides in summary.json so a chain can audit consistency
      assert(Files.readString(java.nio.file.Paths.get(s"$root/on/summary.json"))
        .contains(""""scrub_pii":true"""))
      // flag OFF reproduces historical behavior: originals untouched,
      // the twins are NOT exact dups (SimHash may still call them near)
      val r2 = Curate.run(spark, s"$root/in", s"$root/off")
      assert(r2.counts.getOrElse("exact_dup", 0L) === 0L, s"${r2.counts}")
      val offTexts = spark.read.parquet(s"$root/off/curated.parquet")
        .select("text").as[String].collect().toSeq
      assert(offTexts.exists(_.contains("alice@example.com")),
        s"scrub-off must preserve original text: $offTexts")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }

  test("--strip-boilerplate removes recurring lines; boilerplate-only variants fold") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_curate_boiler").toString
    try {
      val header = "COPYRIGHT ACME ALL RIGHTS RESERVED"
      val footer = "unsubscribe at the usual place"
      def wrap(body: String) = s"$header\n$body\n$footer"
      val bodies = (0 until 10).map(i =>
        s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i")
      val docs = (
        bodies.zipWithIndex.map { case (b, i) => (i.toLong, wrap(b)) } :+
        // 100 & 101: identical body, DIFFERENT trailing boilerplate
        // state (101 lacks the footer) — stripping makes them exact
        // copies, so strip-on curation folds them
        (100L, wrap("omega one two three four five six seven")) :+
        (101L, s"$header\nomega one two three four five six seven") :+
        // 200 & 201: NULL text — the strip must PRESERVE the NULL
        // (not coalesce to ""), or the two would md5-collide into a
        // false exact-dup pair instead of the low_quality quarantine
        (200L, null.asInstanceOf[String]) :+
        (201L, null.asInstanceOf[String]))
        .map { case (id, t) =>
          (id, t, "en", "s0", Option(t).map(_.length.toLong).getOrElse(0L)) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$root/in/documents.parquet")
      val (_, cfg, _) = Curate.parseArgs(Array("a", "b", "--strip-boilerplate=4"))
      assert(cfg.stripBoilerplateDenom === Some(4))
      val r = Curate.run(spark, s"$root/in", s"$root/on", cfg)
      assert(r.counts.getOrElse("exact_dup", 0L) === 1L,
        s"boilerplate-only variants must fold under strip: ${r.counts}")
      // BOTH NULL-text docs stay quarantined — a "" coercion would
      // have made one of them the other's exact_dup
      assert(r.counts.getOrElse("low_quality", 0L) === 2L, s"${r.counts}")
      val nullVerdicts = spark.read.parquet(s"$root/on/verdicts.parquet")
        .filter(col("doc_id") >= 200L)
        .select("verdict").as[String].collect().toSeq
      assert(nullVerdicts === Seq("low_quality", "low_quality") ||
        nullVerdicts === Seq("low_quality", "low_quality").reverse,
        s"NULL-text docs must quarantine, got $nullVerdicts")
      val onTexts = spark.read.parquet(s"$root/on/curated.parquet")
        .select("text").as[String].collect().toSeq
      onTexts.foreach { t =>
        assert(!t.contains(header) && !t.contains(footer),
          s"boilerplate survived curation: $t")
      }
      // bodies are intact and in place (not just deleted docs)
      assert(onTexts.exists(_.startsWith("alpha0 ")), s"$onTexts")
      assert(Files.readString(java.nio.file.Paths.get(s"$root/on/summary.json"))
        .contains(""""strip_boilerplate":4"""))
      // flag OFF: originals preserved, the variants do NOT exact-fold
      val r2 = Curate.run(spark, s"$root/in", s"$root/off")
      assert(r2.counts.getOrElse("exact_dup", 0L) === 0L, s"${r2.counts}")
      assert(spark.read.parquet(s"$root/off/curated.parquet")
        .select("text").as[String].collect().exists(_.contains(header)))
      // a nonsensical denominator refuses loudly instead of silently
      // stripping nothing
      intercept[IllegalArgumentException](Curate.Config(
        stripBoilerplateDenom = Some(1)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }

  test("--source-cap bounds each source's share of the kept set; only kept docs flip") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_curate_srccap").toString
    try {
      // 40 unique quality-passing spam docs, 10 ham docs, plus one
      // LOW-QUALITY spam doc: the cap base is the KEPT set (50), so
      // cap = floor(50 * 300 / 1000) = 15 per source — spam loses 25,
      // ham (10 <= 15) is untouched, and the low-quality doc neither
      // consumes a cap slot nor changes verdict
      val docs = (
        (0 until 40).map(i => (i.toLong,
          s"spam$i alpha$i beta$i gamma$i delta$i epsilon$i", "spam")) ++
        (100 until 110).map(i => (i.toLong,
          s"ham$i one$i two$i three$i four$i five$i", "ham")) :+
        ((200L, "tiny", "spam")))
        .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$root/in/documents.parquet")
      val (_, cfg, _) = Curate.parseArgs(Array("a", "b", "--source-cap=300"))
      assert(cfg.sourceCapPermille === Some(300))
      val r = Curate.run(spark, s"$root/in", s"$root/on", cfg)
      assert(r.counts.getOrElse("kept", 0L) === 25L, s"${r.counts}")
      assert(r.counts.getOrElse("source_capped", 0L) === 25L, s"${r.counts}")
      assert(r.counts.getOrElse("low_quality", 0L) === 1L, s"${r.counts}")
      val perSrc = spark.read.parquet(s"$root/on/curated.parquet")
        .groupBy("source").count()
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(perSrc === Map("spam" -> 15L, "ham" -> 10L), s"$perSrc")
      // the capped docs' content stays suppressed for future batches:
      // their index rows carry a NULL split like every other drop
      val idx = spark.read.parquet(s"$root/on/index.parquet")
      assert(idx.filter(col("split").isNull).count() >= 25L)
      assert(Files.readString(java.nio.file.Paths.get(s"$root/on/summary.json"))
        .contains(""""source_cap":300"""))
      // determinism: a re-run keeps the SAME survivors (hash order,
      // not partition order)
      val r2 = Curate.run(spark, s"$root/in", s"$root/on2", cfg)
      assert(r2.counts === r.counts)
      val k1 = spark.read.parquet(s"$root/on/curated.parquet")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val k2 = spark.read.parquet(s"$root/on2/curated.parquet")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(k1 === k2)
      // flag OFF: nothing capped
      val r3 = Curate.run(spark, s"$root/in", s"$root/off")
      assert(r3.counts.getOrElse("source_capped", 0L) === 0L)
      assert(r3.counts.getOrElse("kept", 0L) === 50L, s"${r3.counts}")
      // nonsensical permilles refuse loudly
      intercept[IllegalArgumentException](Curate.Config(
        sourceCapPermille = Some(0)))
      intercept[IllegalArgumentException](Curate.Config(
        sourceCapPermille = Some(1000)))
      // the dial survives a takedown rewrite: a takedown output is a
      // valid baseDir for later incremental runs, so dropping the key
      // would break the keep-the-dial-constant audit record mid-chain
      Curate.runTakedown(spark, s"$root/on", s"$root/td",
        Seq(0L).toDF("doc_id"))
      assert(Files.readString(java.nio.file.Paths.get(s"$root/td/summary.json"))
        .contains(""""source_cap":300"""))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }

  test("--curriculum writes a dense train order and re-derives after a takedown") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_curric").toString
    try {
      val r = Curate.run(spark, dir, s"$root/on",
        Curate.Config(curriculum = true))
      val cur = spark.read.parquet(s"$root/on/curriculum.parquet")
      val nTrain = r.splits.getOrElse("train", 0L)
      assert(nTrain > 0L)
      // exactly the train split, positions dense 1..n
      assert(cur.count() === nTrain)
      val pos = cur.select("pos").as[Long].collect().sorted.toSeq
      assert(pos === (1L to nTrain).toSeq)
      // the artifact IS the shared c22 scheme over the curated train
      // docs — the oracled definition and the pipeline cannot drift
      val want = graft.queries.Documents.curriculumOrder(
          spark.read.parquet(s"$root/on/curated.parquet")
            .filter(col("split") === "train").select("doc_id", "text"))
        .collect().map(_.toSeq)
      assert(cur.orderBy("pos").collect().map(_.toSeq).toSeq === want.toSeq)
      // tiers appear in curriculum order: every good pos < every fair
      // pos < every poor pos (when present)
      val maxByTier = cur.groupBy("tier").agg(max("pos").as("mx"),
          min("pos").as("mn")).collect()
        .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
      for {
        (a, b) <- Seq(("good", "fair"), ("fair", "poor"), ("good", "poor"))
        ((amx, _), (_, bmn)) <- maxByTier.get(a).zip(maxByTier.get(b))
      } assert(amx < bmn, s"$a overlaps $b: $maxByTier")
      // takedown: the retracted doc vanishes and positions are
      // RE-DERIVED dense (a hole would leak that a doc existed)
      val victim = cur.filter(col("pos") === 1L)
        .select("doc_id").as[Long].head()
      Curate.runTakedown(spark, s"$root/on", s"$root/td",
        Seq(victim).toDF("doc_id"))
      val cur2 = spark.read.parquet(s"$root/td/curriculum.parquet")
      assert(cur2.filter(col("doc_id") === victim).count() === 0L)
      val pos2 = cur2.select("pos").as[Long].collect().sorted.toSeq
      assert(pos2 === (1L to (nTrain - 1)).toSeq)
      assert(Files.readString(java.nio.file.Paths.get(s"$root/td/summary.json"))
        .contains(""""curriculum":true"""))
      // flag OFF: no artifact
      Curate.run(spark, dir, s"$root/off")
      assert(!new java.io.File(s"$root/off/curriculum.parquet").exists())
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }

  test("--keep-longest elects the longest cluster member; default stays min doc_id") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_curate_keeplong").toString
    try {
      // docs 0 and 1 share the SAME distinct token set (SimHash
      // hamming 0 → one near-dup cluster) but 1 repeats tokens, so 1
      // is LONGER while 0 has the smaller id — the two policies elect
      // different canonicals. Docs 10.. are independent filler.
      val docs = (Seq(
        (0L, "kappa lambda mu nu xi omicron"),
        (1L, "kappa lambda mu nu xi omicron kappa lambda mu nu")) ++
        (10 until 15).map(i =>
          (i.toLong, s"filler$i aa$i bb$i cc$i dd$i ee$i")))
        .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$root/in/documents.parquet")
      val rMin = Curate.run(spark, s"$root/in", s"$root/min")
      val keptMin = spark.read.parquet(s"$root/min/curated.parquet")
        .select("doc_id").as[Long].collect().toSet
      assert(keptMin.contains(0L) && !keptMin.contains(1L),
        s"default policy must keep the min id: $keptMin")
      val (_, cfg, _) = Curate.parseArgs(Array("a", "b", "--keep-longest"))
      assert(cfg.keepLongest)
      val rLong = Curate.run(spark, s"$root/in", s"$root/long", cfg)
      val keptLong = spark.read.parquet(s"$root/long/curated.parquet")
        .select("doc_id").as[Long].collect().toSet
      assert(keptLong.contains(1L) && !keptLong.contains(0L),
        s"--keep-longest must keep the longest member: $keptLong")
      // the histogram is policy-invariant: one canonical per cluster
      assert(rMin.counts === rLong.counts, s"${rMin.counts} vs ${rLong.counts}")
      assert(Files.readString(java.nio.file.Paths.get(s"$root/long/summary.json"))
        .contains(""""keep_longest":true"""))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }

  test("--decontaminate flips kept near-dups of the eval corpus; suppressors persist") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_curate_decon").toString
    try {
      val longA = (1 to 40).map(i => s"alpha$i token$i").mkString(" ")
      val longB = (1 to 40).map(i => s"beta$i word$i").mkString(" ")
      // batch: two distinct long docs; eval: a lightly-EDITED copy of
      // doc 1 (shares almost every 3-gram shingle → Jaccard >= 500‰)
      // under a different id space — the paraphrase case an exact
      // 13-gram screen misses
      Seq((1L, longA, "en", "s"), (2L, longB, "en", "s"))
        .toDF("doc_id", "text", "lang", "source")
        .write.mode("overwrite").parquet(s"$root/batch/documents.parquet")
      Seq((900L, longA + " trailing-edit", "en", "bench"))
        .toDF("doc_id", "text", "lang", "source")
        .write.mode("overwrite").parquet(s"$root/eval/documents.parquet")
      val r = Curate.run(spark, s"$root/batch", s"$root/out",
        Curate.Config(decontaminateDir = Some(s"$root/eval")))
      assert(r.counts === Map("eval_contaminated" -> 1L, "kept" -> 1L),
        r.counts.toString)
      val verdicts = spark.read.parquet(s"$root/out/verdicts.parquet")
        .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
      assert(verdicts === Map(1L -> "eval_contaminated", 2L -> "kept"))
      // the contaminated doc leaves curated but its digest stays as a
      // NULL-split suppressor (the takedown posture)
      assert(spark.read.parquet(s"$root/out/curated.parquet")
        .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
      val idx = spark.read.parquet(s"$root/out/index.parquet")
        .filter(col("doc_id") === 1L).collect()
      assert(idx.length === 1 && idx(0).isNullAt(idx(0).fieldIndex("split")))
      assert(Files.readString(java.nio.file.Paths.get(s"$root/out/summary.json"))
        .contains(""""decontaminate":true"""))
      // a redelivered copy of the contaminated doc is suppressed by the
      // index in the next incremental generation
      Seq((10L, longA, "en", "s"))
        .toDF("doc_id", "text", "lang", "source")
        .write.mode("overwrite").parquet(s"$root/batch2/documents.parquet")
      val r2 = Curate.runIncremental(spark, s"$root/batch2",
        s"$root/out", s"$root/out2")
      assert(r2.counts.getOrElse("dup_of_base", 0L) === 1L, r2.counts.toString)
      // flag OFF: the same batch keeps both docs
      val rOff = Curate.run(spark, s"$root/batch", s"$root/off")
      assert(rOff.counts === Map("kept" -> 2L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }

  test("--zorder-files lays out curated files on the Morton key and survives a takedown") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_curate_zorder").toString
    try {
      val rz = Curate.run(spark, dir, s"$root/z",
        Curate.Config(zorderFiles = Some(2)))
      val plain = Curate.run(spark, dir, s"$root/plain")
      // the layout is a pure reordering: same kept set, same verdicts
      assert(rz.counts === plain.counts)
      def rows(p: String) = spark.read.parquet(s"$p/curated.parquet")
        .select("doc_id", "text", "lang", "source", "split")
        .collect().map(_.toSeq).toSet
      assert(rows(s"$root/z") === rows(s"$root/plain"))
      assert(Files.readString(java.nio.file.Paths.get(s"$root/z/summary.json"))
        .contains(""""zorder_files":2"""))
      // within each split, files hold DISJOINT z-ranges (the footer
      // stats argument: a z envelope bounds both n_chars and doc_id)
      def assertDisjoint(curatedDir: String): Unit = {
        val envs = spark.read.parquet(curatedDir)
          .withColumn("z", graft.functions.ZValue.of(
            coalesce(length(col("text")).cast("long"), lit(0L)),
            pmod(col("doc_id"), lit(1L << 31))))
          .groupBy(col("split"), input_file_name().as("f"))
          .agg(min("z").as("lo"), max("z").as("hi"))
          .collect().groupBy(_.getString(0))
        envs.foreach { case (_, files) =>
          val sorted = files.map(r => (r.getLong(2), r.getLong(3)))
            .sortBy(_._1).toSeq
          sorted.sliding(2).foreach {
            case Seq((_, hi1), (lo2, _)) =>
              assert(hi1 < lo2, s"overlapping z envelopes: $sorted")
            case _ => ()
          }
        }
      }
      assertDisjoint(s"$root/z/curated.parquet")
      // the dial rides the summary through a takedown rewrite
      val victim = spark.read.parquet(s"$root/z/curated.parquet")
        .select("doc_id").as[Long].head()
      Curate.runTakedown(spark, s"$root/z", s"$root/td",
        Seq(victim).toDF("doc_id"))
      assert(Files.readString(java.nio.file.Paths.get(s"$root/td/summary.json"))
        .contains(""""zorder_files":2"""))
      assertDisjoint(s"$root/td/curated.parquet")
      assert(spark.read.parquet(s"$root/td/curated.parquet")
        .filter(col("doc_id") === victim).count() === 0L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }
}