package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** BPE trainer: learned merges on a hand-computable fixture match the
  * algorithm run by hand; the first learned merge equals d15's top
  * pair on the same frame; encoding applies merges in order to
  * fixpoint. */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  /** The classic Sennrich demonstration corpus, frequencies encoded by
    * repetition: low ×5, lower ×2, newest ×6, widest ×3. */
  private def fixture = {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("learned merges match the hand-run algorithm") {
    val merges = BpeTrainer.train(spark, fixture, nMerges = 4)
    // by hand: pair counts round 1 — es 9, st 9, we 8(?), ... ties on
    // (count desc, left asc): es=9 (newest 6 + widest 3), st=9,
    // 'es' < 'st' so merge 1 = (e,s); then (es,t)=9; then
    // (n,e)=6/(ne,w)... round 3: ne=6, est after merges: (w,est)=...
    // verified against a reference implementation by hand:
    assert(merges.map(m => (m.left, m.right)).take(2) ===
      Seq(("e", "s"), ("es", "t")))
    assert(merges.head.count === 9L)
    // every later merge's count is positive and ≤ its predecessors'
    // only weakly (counts can rise as symbols coalesce) — but all must
    // meet the floor
    assert(merges.forall(_.count >= 2L))
  }

  test("first merge equals d15's top weighted pair on the same corpus") {
    import org.apache.spark.sql.functions._
    val merges = BpeTrainer.train(spark, fixture, nMerges = 1)
    val vocab = BpeTrainer.vocabulary(fixture)
    val top = vocab.filter(length(col("term")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(1, length(term) - 1), i -> substring(term, i, 2))")).as("pair"))
      .groupBy("pair").agg(sum("n").as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(1).collect().head
    assert(merges.head.left + merges.head.right === top.getString(0))
    assert(merges.head.count === top.getLong(1))
  }

  test("encode applies merges to fixpoint in learned order") {
    val merges = Seq(
      BpeTrainer.Merge("a", "a", 0),
      BpeTrainer.Merge("aa", "b", 0))
    // greedy left-to-right: aaa -> (aa)(a); aaaa -> (aa)(aa)
    assert(BpeTrainer.encode("aaa", merges.take(1)) === Seq("aa", "a"))
    assert(BpeTrainer.encode("aaaa", merges.take(1)) === Seq("aa", "aa"))
    // second merge consumes the first's output
    assert(BpeTrainer.encode("aab", merges) === Seq("aab"))
    assert(BpeTrainer.encode("baab", merges) === Seq("b", "aab"))
  }

  test("encodeCounts: distributed token counts shrink as merges grow") {
    val none = BpeTrainer.encodeCounts(spark, fixture, Seq.empty)
      .collect().head.getLong(1)
    val merges = BpeTrainer.train(spark, fixture, nMerges = 4)
    val four = BpeTrainer.encodeCounts(spark, fixture, merges)
      .collect().head.getLong(1)
    // char count: low(3)*5 + lower(5)*2 + newest(6)*6 + widest(6)*3 = 79
    assert(none === 79L)
    assert(four < none)
  }

  test("incremental trainer is bit-identical to the full-rescan reference") {
    // classic fixture, more merges than the heap's initial snapshot
    // survives (counts rise and fall, stale entries must be skipped)
    val inc = BpeTrainer.train(spark, fixture, nMerges = 8)
    val ref = BpeTrainer.trainRescan(spark, fixture, nMerges = 8)
    assert(inc === ref)
    assert(inc.nonEmpty)
  }

  test("parity holds on a randomized corpus across compaction cadences") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    val words = Seq.fill(400) {
      val len = 1 + rnd.nextInt(8)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val docs = words.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val ref = BpeTrainer.trainRescan(spark, docs, nMerges = 12)
    assert(ref.size === 12) // enough signal that the run isn't vacuous
    // compactEvery=1 folds every merge; 3 forces mid-run compactions at
    // an odd cadence; 100 never compacts within the run
    for (ce <- Seq(1, 3, 100)) {
      val inc = BpeTrainer.train(spark, docs, nMerges = 12, compactEvery = ce)
      assert(inc === ref, s"divergence at compactEvery=$ce")
    }
    // heapCompactFactor=0 rebuilds the argmax heap from the live count
    // map after EVERY merge — the anti-leak rebuild must be
    // semantics-neutral at any cadence
    val rebuilt = BpeTrainer.train(spark, docs, nMerges = 12,
      heapCompactFactor = 0)
    assert(rebuilt === ref, "heap rebuild changed the learned sequence")
  }

  test("parity holds on real testdata (the d17 driver path)") {
    // 12 merges, not more: the RESCAN reference nests one persisted
    // plan per merge and Spark's per-job plan-description rendering
    // over that nesting goes superlinear (~minutes at 30 merges) —
    // the incremental trainer itself stays shallow at any depth
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val inc = BpeTrainer.train(spark, docs, nMerges = 12)
    val ref = BpeTrainer.trainRescan(spark, docs, nMerges = 12)
    assert(inc === ref)
    assert(inc.size === 12)
  }

  test("tie-break order is binary UTF-8, matching trainRescan's Spark sort") {
    // fullwidth '0' U+FF10 (UTF-8: EF BC 90) sorts BEFORE the emoji
    // U+1F600 (UTF-8: F0 9F 98 80) in byte order, although its UTF-16
    // code unit (FF10) is LARGER than the emoji's lead surrogate
    // (D83D) — String.compareTo would invert the tie and diverge from
    // the rescan reference's UTF8String binary orderBy
    val full = "０"
    val emoji = new String(Character.toChars(0x1F600))
    assert(BpeTrainer.utf8Compare(full, emoji) < 0)
    assert(full.compareTo(emoji) > 0) // the trap the byte compare avoids
  }

  test("training stops early when no pair meets the floor") {
    import spark.implicits._
    val tiny = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(spark, tiny, nMerges = 10, minPairCount = 2)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("merge lists round-trip through the persisted artifact") {
    val merges = BpeTrainer.train(spark, fixture, nMerges = 6)
    assert(merges.nonEmpty)
    val path = "file:" + java.nio.file.Files
      .createTempDirectory("bpe-merges").toString + "/merges.json"
    val c = spark.sessionState.newHadoopConf()
    BpeTrainer.saveMerges(merges, path, c)
    val back = BpeTrainer.loadMerges(path, c)
    assert(back === merges) // learned ORDER preserved — inference is order-sensitive
    // and the reloaded tokenizer encodes identically
    val a = BpeTrainer.encodeCounts(spark, fixture, merges).collect().toSeq
    val b = BpeTrainer.encodeCounts(spark, fixture, back).collect().toSeq
    assert(a === b)
    val junk = "file:" + java.nio.file.Files
      .createTempDirectory("bpe-junk").toString + "/junk.json"
    graft.util.Fs.writeStringAtomic(junk, """{"format":"something-else"}""", c)
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.loadMerges(junk, c)
    }
    assert(e.getMessage.contains("not a graft BPE merges artifact"))
  }

  test("a merge's delta job visits only partitions holding the pair") {
    import spark.implicits._
    // 2000 filler terms built from globally-unique codepoints — every
    // adjacent pair occurs exactly once, so none is mergeable — plus 3
    // terms containing the pair (x, y), each twice in the corpus:
    // (x, y) is the unique argmax (count 6). With rowsPerPartition=64
    // the 2003-term vocabulary spreads over 32 hash partitions, but the
    // x/y terms can sit in at most 3 of them — the pruned delta job
    // must schedule at most 3 tasks, not 32.
    var cp = 0x4E00
    def freshChar(): String = { val s = new String(Character.toChars(cp)); cp += 1; s }
    val filler = (0 until 2000).map(_ => (0 until 5).map(_ => freshChar()).mkString)
    val special = (0 until 3).map(_ => freshChar() + "xy" + freshChar())
    val words = filler ++ special.flatMap(t => Seq(t, t))
    val docs = words.grouped(100).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")

    // count tasks that actually RAN for the delta job: jobStart's
    // stageInfos also list upstream (cache-skipped) stages at full
    // width, so record the delta job's stage ids at start and sum the
    // task counts of only the stages that COMPLETE — a skipped stage
    // never completes, a pruned result stage completes with one task
    // per surviving partition
    val deltaStageIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val deltaJobSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val ranTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val completedStages = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        if (desc.startsWith("bpe-merge-delta")) {
          deltaJobSeen.incrementAndGet()
          js.stageInfos.foreach(si => deltaStageIds.add(si.stageId))
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (deltaStageIds.contains(sc.stageInfo.stageId)) {
          completedStages.incrementAndGet()
          ranTasks.addAndGet(sc.stageInfo.numTasks); ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = BpeTrainer.train(spark, docs, nMerges = 1,
        minPairCount = 4, rowsPerPartition = 64)
      assert(merges.map(m => (m.left, m.right)) === Seq(("x", "y")))
      assert(merges.head.count === 6L)
      // listener bus is async — poll until the delta job's events land
      val deadline = System.nanoTime() + 10000000000L
      while ((deltaJobSeen.get() == 0 || completedStages.get() == 0) &&
          System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(deltaJobSeen.get() === 1, "expected exactly one delta job")
      val tasks = ranTasks.get()
      assert(tasks >= 1 && tasks <= 3,
        s"delta job ran $tasks tasks; pruning should cap it at the " +
          "3 partitions that can hold the x/y terms (vocab is 32 partitions)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("pair-map budget guard fails loudly on a noise-like corpus") {
    import spark.implicits._
    // 60 terms of 3 globally-unique codepoints = 120 distinct pairs —
    // trips a maxPairs=50 budget at seeding, BEFORE any merge work
    var cp = 0x5E00
    def freshChar(): String = { val s = new String(Character.toChars(cp)); cp += 1; s }
    val words = (0 until 60).map(_ => (0 until 3).map(_ => freshChar()).mkString)
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      BpeTrainer.train(spark, docs, nMerges = 1, maxPairs = 50L)
    }
    assert(e.getMessage.contains("maxPairs=50"))
    assert(e.getMessage.contains("noise"))
  }

  test("budget guard trips in the PRE-FLIGHT job, before any collect") {
    import spark.implicits._
    // same noise corpus; the captured footprint callback proves the
    // driver maps were never seeded — the distributed distinct-count
    // rejected the corpus first (the guard a post-collect check cannot
    // provide: by then the blow-up already landed on the driver)
    var cp = 0x6E00
    def freshChar(): String = { val s = new String(Character.toChars(cp)); cp += 1; s }
    val words = (0 until 60).map(_ => (0 until 3).map(_ => freshChar()).mkString)
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    var seeded = false
    intercept[IllegalStateException] {
      BpeTrainer.train(spark, docs, nMerges = 1, maxPairs = 50L,
        onFootprint = _ => seeded = true)
    }
    assert(!seeded, "driver maps were seeded despite the budget breach")
  }

  test("driver-map footprint is measured and bounded (real testdata)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    var fp: Option[BpeTrainer.Footprint] = None
    BpeTrainer.train(spark, docs, nMerges = 1, onFootprint = f => fp = Some(f))
    val f = fp.getOrElse(fail("footprint callback never fired"))
    assert(f.distinctPairs > 0)
    // postings add at most one entry per pair per partition — the
    // structural bound the byte model's P̄ term relies on
    assert(f.postingEntries >= f.distinctPairs)
    assert(f.postingEntries <= f.distinctPairs * 32)
    // the documented model: fixed per-entry overheads over the measured
    // char payload; natural-language sf0.001 sits far under 100 MB —
    // a 10x-margin ceiling that still catches accidental O(vocab·pairs)
    // blow-ups in the map structures
    assert(f.estBytes === f.distinctPairs * 168L + 2L * f.keyChars
      + f.postingEntries * 88L)
    assert(f.estBytes < 100L * 1024 * 1024,
      s"seed maps estimate ${f.estBytes} bytes — the driver-map " +
        "footprint model or the map contents regressed")
  }
}
