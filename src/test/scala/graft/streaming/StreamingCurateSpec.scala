package graft.streaming

import java.nio.file.Files

import graft.{Curate, GraftSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous curation: each micro-batch becomes one chained Curate
  * generation — cross-batch dup suppression through the maintained
  * index, committed-replay no-ops, crashed partials heal by re-run,
  * id-space restarts fail loudly, prune bounds the trail. */
class StreamingCurateSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private def tmp(stem: String) = Files.createTempDirectory(stem).toString

  private val longA = (1 to 40).map(i => s"alpha$i").mkString(" ")
  private val longB = (1 to 40).map(i => s"beta$i").mkString(" ")
  private val longC = (1 to 40).map(i => s"gamma$i").mkString(" ")

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("generations chain: later batches are curated against ALL earlier ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("scur")
    val in = MemoryStream[(Long, String, String, String)]
    val results = scala.collection.mutable.ArrayBuffer[Curate.Result]()
    val genIds = scala.collection.mutable.ArrayBuffer[Long]()
    val q = StreamingCurate.start(
      in.toDF.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long")),
      root, tmp("scurchk"),
      onResult = (g, r) => { genIds += g; results += r; () })
    try {
      in.addData((1L, longA, "en", "s"), (2L, longB, "en", "s"))
      q.processAllAvailable()
      assert(results.last.counts === Map("kept" -> 2L))
      // batch 1: a copy of batch-0 content must be suppressed via the
      // chained index, fresh content kept
      in.addData((10L, longA, "en", "s"), (11L, longC, "en", "s"))
      q.processAllAvailable()
      assert(results.last.counts ===
        Map("dup_of_base" -> 1L, "kept" -> 1L))
      // batch 2 chains off generation 1: batch-1 content now suppresses
      in.addData((20L, longC, "en", "s"))
      q.processAllAvailable()
      assert(results.last.counts === Map("dup_of_base" -> 1L))
      // the committed pointer tracks the last generation, whose curated
      // output holds only the batch's survivors
      assert(StreamingCurate.readLatest(spark, root).map(_._2) === Some(2L))
      assert(spark.read.parquet(s"$root/gen_2/index.parquet").count() === 5L)
      assert(genIds.toSeq === Seq(0L, 1L, 2L),
        "onResult must carry each generation's id")
    } finally q.stop()
  }

  test("a committed replay's callback carries the SAME generation id (dedup token)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("scur5")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Curate.Result)]()
    def stream(chk: String) = {
      val in = MemoryStream[(Long, String, String, String)]
      val q = StreamingCurate.start(
        in.toDF.toDF("doc_id", "text", "lang", "source")
          .withColumn("n_chars", length(col("text")).cast("long")),
        root, chk, onResult = (g, r) => { got += ((g, r)); () })
      (in, q)
    }
    val (in1, q1) = stream(tmp("scur5chk1"))
    try {
      in1.addData((1L, longA, "en", "s"), (2L, longB, "en", "s"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(got.toSeq.map(_._1) === Seq(0L))
    // a fresh checkpoint restarts the id space at the committed fence:
    // batch 0 is a COMMITTED replay — nothing runs, but the totals
    // re-emit under the SAME generation id, so an at-least-once
    // consumer dedups on it instead of double-counting
    val (in2, q2) = stream(tmp("scur5chk2"))
    try {
      in2.addData((1L, longA, "en", "s"), (2L, longB, "en", "s"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(got.toSeq.map(_._1) === Seq(0L, 0L),
      "replay must re-emit under the first delivery's generation id")
    assert(got(1) === got(0), "same id, same totals — the dedup key holds")
  }

  test("committed replay no-ops; partial generation heals; restarts fail") {
    val root = tmp("scur2")
    val b0 = docsDf(Seq((1L, longA), (2L, longB)))
    val b1 = docsDf(Seq((10L, longA), (11L, longC)))
    assert(StreamingCurate.processBatch(spark, b0, root, 0L)
      .map(_.counts) === Some(Map("kept" -> 2L)))
    val first = StreamingCurate.processBatch(spark, b1, root, 1L)
    assert(first.map(_.counts) === Some(Map("dup_of_base" -> 1L, "kept" -> 1L)))
    // committed replay: nothing runs, pointer stable, and the totals
    // RE-EMIT (at-least-once onResult — rebuilt from summary.json)
    assert(StreamingCurate.processBatch(spark, b1, root, 1L)
      .map(_.counts) === first.map(_.counts))
    assert(StreamingCurate.readLatest(spark, root).map(_._2) === Some(1L))
    // crash simulation: a partial NEXT generation (dir exists, LATEST
    // not advanced) is deleted and fully re-run on re-delivery
    val hc = spark.sessionState.newHadoopConf()
    graft.util.Fs.mkdirs(s"$root/gen_2/partial_garbage", hc)
    val b2 = docsDf(Seq((20L, longC)))
    assert(StreamingCurate.processBatch(spark, b2, root, 2L)
      .map(_.counts) === Some(Map("dup_of_base" -> 1L)))
    assert(!graft.util.Fs.exists(s"$root/gen_2/partial_garbage", hc))
    // id-space restart below the fence: loud failure
    val e = intercept[IllegalStateException] {
      StreamingCurate.processBatch(spark, b0, root, 0L)
    }
    assert(e.getMessage.contains("restarted"))
  }

  test("takedown composes with the chain: retracted content stays suppressed") {
    import spark.implicits._
    val root = tmp("scur4")
    StreamingCurate.processBatch(spark, docsDf(Seq((1L, longA), (2L, longB))),
      root, 0L)
    // right-to-be-forgotten against the COMMITTED generation, written
    // as the next generation by hand (takedown is an operator action,
    // not a stream batch) — then point the chain at it via LATEST
    val r = Curate.runTakedown(spark, s"$root/gen_0", s"$root/gen_1",
      Seq(2L).toDF("doc_id"))
    assert(r.counts === Map("kept" -> 1L, "taken_down" -> 1L))
    graft.util.Fs.writeStringAtomic(s"$root/LATEST",
      """{"gen":"gen_1","batch":1}""" + "\n",
      spark.sessionState.newHadoopConf())
    // the stream continues off the post-takedown generation: doc 2's
    // content redelivered in the next batch is NOT re-admitted (the
    // NULL-split suppressor survived the takedown), fresh content is
    val r2 = StreamingCurate.processBatch(spark,
      docsDf(Seq((10L, longB), (11L, longC))), root, 2L)
    assert(r2.map(_.counts) ===
      Some(Map("dup_of_base" -> 1L, "kept" -> 1L)))
  }

  test("pruneKeep makes the streaming chain self-bounding") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("scur6")
    val in = MemoryStream[(Long, String, String, String)]
    val results = scala.collection.mutable.ArrayBuffer[Curate.Result]()
    val q = StreamingCurate.start(
      in.toDF.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long")),
      root, tmp("scur6chk"),
      onResult = (_, r) => { results += r; () },
      pruneKeep = Some(1))
    try {
      in.addData((1L, longA, "en", "s"))
      q.processAllAvailable()
      in.addData((2L, longB, "en", "s"))
      q.processAllAvailable()
      in.addData((3L, longC, "en", "s"))
      q.processAllAvailable()
      val hc = spark.sessionState.newHadoopConf()
      // only the committed generation (and its batch input) survives
      assert(graft.util.Fs.exists(s"$root/gen_2", hc))
      assert(!graft.util.Fs.exists(s"$root/gen_0", hc) &&
        !graft.util.Fs.exists(s"$root/gen_1", hc),
        "old generations must prune as the stream advances")
      assert(!graft.util.Fs.exists(s"$root/batch_0", hc))
      // the pruned chain still curates: cross-batch suppression through
      // the surviving generation's index works (copy of batch-2 content)
      in.addData((4L, longC, "en", "s"))
      q.processAllAvailable()
      assert(results.last.counts === Map("dup_of_base" -> 1L))
    } finally q.stop()
  }

  test("prune bounds the generation trail, never the committed gen") {
    val root = tmp("scur3")
    StreamingCurate.processBatch(spark, docsDf(Seq((1L, longA))), root, 0L)
    StreamingCurate.processBatch(spark, docsDf(Seq((2L, longB))), root, 1L)
    StreamingCurate.processBatch(spark, docsDf(Seq((3L, longC))), root, 2L)
    StreamingCurate.prune(spark, root, keep = 1)
    val hc = spark.sessionState.newHadoopConf()
    assert(graft.util.Fs.exists(s"$root/gen_2", hc))
    assert(!graft.util.Fs.exists(s"$root/gen_0", hc))
    assert(!graft.util.Fs.exists(s"$root/gen_1", hc))
    assert(!graft.util.Fs.exists(s"$root/batch_0", hc))
    // the pruned chain keeps working: the next batch curates against
    // the surviving committed generation
    val r = StreamingCurate.processBatch(spark,
      docsDf(Seq((4L, longC))), root, 3L)
    assert(r.map(_.counts) === Some(Map("dup_of_base" -> 1L)))
  }

  test("the decontaminate dial screens every chained generation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("scur_decon")
    // a standing eval benchmark: a lightly-edited copy of longA
    Seq((900L, longA + " eval-edit", "en", "bench"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$root/eval/documents.parquet")
    val in = MemoryStream[(Long, String, String, String)]
    val results = scala.collection.mutable.ArrayBuffer[Curate.Result]()
    val q = StreamingCurate.start(
      in.toDF.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long")),
      root, tmp("scur_decon_chk"),
      cfg = Curate.Config(decontaminateDir = Some(s"$root/eval")),
      onResult = (_, r) => { results += r; () })
    try {
      // gen 0: the contaminated doc flips, the clean one stays
      in.addData((1L, longA, "en", "s"), (2L, longB, "en", "s"))
      q.processAllAvailable()
      assert(results.last.counts ===
        Map("eval_contaminated" -> 1L, "kept" -> 1L), results.last.counts)
      // gen 1 (chained incremental run): the dial still screens — a
      // FRESH near-dup of the benchmark flips here too (it is not a
      // dup of gen 0's kept corpus, so only the screen can catch it)
      in.addData((10L, longA + " tail", "en", "s"), (11L, longC, "en", "s"))
      q.processAllAvailable()
      assert(results.last.counts ===
        Map("eval_contaminated" -> 1L, "kept" -> 1L), results.last.counts)
      // the contaminated docs never reach any curated generation
      val kept = spark.read.parquet(s"$root/gen_1/curated.parquet")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(11L), kept.toString)
    } finally q.stop()
  }

  test("chained generations carry a drift.json artifact; empty sides skip") {
    val root = tmp("scur6")
    val hc = spark.sessionState.newHadoopConf()
    val longD = (1 to 40).map(i => s"delta$i").mkString(" ")
    def mixedDf(rows: Seq[(Long, String, String)]) = {
      import spark.implicits._
      rows.map { case (id, t, l) => (id, t, l, "s") }
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    // gen_0: 2 en docs — the FIRST generation has nothing to compare
    StreamingCurate.processBatch(spark,
      mixedDf(Seq((1L, longA, "en"), (2L, longB, "en"))), root, 0L)
    assert(!graft.util.Fs.exists(s"$root/gen_0/drift.json", hc),
      "first generation must not carry a drift artifact")
    // gen_1: 1 en + 1 fr — drift vs gen_0 (all-en): en 1000000→500000,
    // fr 0→500000, TVD 500000
    StreamingCurate.processBatch(spark,
      mixedDf(Seq((10L, longC, "fr"), (11L, longD, "en"))), root, 1L)
    val drift = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.util.Fs.readString(s"$root/gen_1/drift.json", hc))
    val rows = drift.get("rows")
    assert(rows != null && rows.size() === 3, drift.toString)
    val total = rows.get(0)
    assert(total.get("lang").asText() === "_TOTAL")
    assert(total.get("delta_ppm").asLong() === 500000L, drift.toString)
    val byLang = (0 until rows.size()).map(rows.get)
      .map(n => n.get("lang").asText() -> n).toMap
    assert(byLang("en").get("old_ppm").asLong() === 1000000L)
    assert(byLang("en").get("new_ppm").asLong() === 500000L)
    assert(byLang("fr").get("old_n").asLong() === 0L)
    assert(byLang("fr").get("new_ppm").asLong() === 500000L)
    // gen_2: pure redelivery — everything dup_of_base, curated EMPTY →
    // the stream must not crash; the artifact records the skip
    StreamingCurate.processBatch(spark,
      mixedDf(Seq((20L, longC, "fr"))), root, 2L)
    val d2 = graft.util.Fs.readString(s"$root/gen_2/drift.json", hc)
    assert(d2.contains("skipped"), d2)

    // churn.json rides beside drift.json: the first generation has
    // none, a chained one reports row-level statuses, and — unlike
    // drift — an empty NEW side is a legitimate comparison (every
    // previous doc reads 'removed'), not a skip
    assert(!graft.util.Fs.exists(s"$root/gen_0/churn.json", hc),
      "first generation must not carry a churn artifact")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val c1 = mapper.readTree(
      graft.util.Fs.readString(s"$root/gen_1/churn.json", hc))
    val c1rows = (0 until c1.get("rows").size()).map(c1.get("rows").get)
      .map(n => n.get("status").asText() -> n.get("n").asLong()).toMap
    // gen_0 kept {1,2}; gen_1 added {10,11} and (incremental) re-kept
    // nothing from gen_0 — its curated set is the new docs only
    assert(c1rows === Map("added" -> 2L, "removed" -> 2L), c1.toString)
    val c2 = mapper.readTree(
      graft.util.Fs.readString(s"$root/gen_2/churn.json", hc))
    val c2rows = (0 until c2.get("rows").size()).map(c2.get("rows").get)
      .map(n => n.get("status").asText() -> n.get("n").asLong()).toMap
    assert(c2rows === Map("removed" -> 2L), c2.toString)
  }
}
