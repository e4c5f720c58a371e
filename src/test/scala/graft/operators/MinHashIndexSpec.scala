package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import org.apache.spark.sql.functions._

/** Persisted MinHash band index: scheme parity with m01, probe
  * correctness on a hand-built fixture, append ≡ rebuild, self-pair
  * exclusion, incomplete-index refusal. */
class MinHashIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private def tmp() =
    java.nio.file.Files.createTempDirectory("mhidx").toString + "/idx"

  /** base: d1 (20 distinct tokens), d2 unrelated; batch: d3 = exact copy
    * of d1, d4 = d1 with the LAST token changed — only the final one of
    * the 18 3-gram shingles contains it, so 17 shingles are shared →
    * jaccard 17/19 = 894 permille; d5 unrelated. */
  private def fixture = {
    import spark.implicits._
    val t1 = (1 to 20).map(i => s"w$i").mkString(" ")
    val t4 = ((1 to 19).map(i => s"w$i") :+ "zz").mkString(" ")
    (Seq((1L, t1), (2L, "x1 x2 x3 x4 x5")),
      Seq((3L, t1), (4L, t4), (5L, "y1 y2 y3 y4 y5")),
      Seq.empty[(Long, String)])
  }

  // NOTE this is a DELEGATION check, not independent scheme pinning:
  // Similarity.minhashBands routes through MinHashIndex.bands (one
  // definition by design), so both sides run the same code — what this
  // pins is the plumbing/spread wiring. Independent pinning of the
  // scheme itself rests on m01/m04's DuckDB oracles.
  test("Similarity.minhashBands delegates to MinHashIndex.bands (plumbing pin)") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mine = MinHashIndex.bands(MinHashIndex.signatures(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val m01 = graft.queries.Similarity.minhashBands(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    graft.queries.QueryDef.drainCleanups()
    assert(mine === m01)
    assert(mine.nonEmpty)
  }

  test("probe answers a new batch from the persisted index") {
    import spark.implicits._
    val (base, batch, _) = fixture
    val idx = tmp()
    MinHashIndex.write(spark, base.toDF("doc_id", "text"), idx)
    val got = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(batch.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // d3 = exact copy of d1: identical signature, every band collides,
    // jaccard exactly 1000. d4's 894-permille edit also lands in a
    // shared band for these fixed strings (md5 is deterministic — this
    // is LSH recall on pinned inputs, not luck per run). d2/d5 pair
    // with nothing.
    assert(got === Set((3L, 1L, 1000L), (4L, 1L, 894L)))
  }

  test("append-then-probe equals a one-shot rebuild") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val a = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 =!= 0)
    val batch = MinHashIndex.signatures(docs.filter(col("doc_id") % 5 === 0))

    val incr = tmp()
    MinHashIndex.write(spark, a, incr)
    MinHashIndex.append(spark, b, incr)
    val oneShot = tmp()
    MinHashIndex.write(spark, a.unionByName(b), oneShot)

    def pairs(idx: String) = MinHashIndex.probe(spark, idx, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val p1 = pairs(incr)
    assert(p1 === pairs(oneShot))
    assert(p1.nonEmpty, "cross-split fixture should contain near-dups")
    // meta counts the union after the append
    val meta = graft.util.Fs.readString(s"$incr/meta.json", spark.sessionState.newHadoopConf())
    assert(meta.contains(s""""n_docs":${a.count() + b.count()}"""))
  }

  test("probing already-indexed docs never reports self-pairs") {
    import spark.implicits._
    val (base, batch, _) = fixture
    val all = (base ++ batch).toDF("doc_id", "text")
    val idx = tmp()
    MinHashIndex.write(spark, all, idx)
    val got = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(batch.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (b2, a2) => b2 != a2 })
    // the twins still find EACH OTHER (both directions live in the index)
    assert(got.contains((3L, 1L)))
  }

  test("append refuses a directory without a complete build") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      MinHashIndex.append(spark,
        Seq((1L, "a b c")).toDF("doc_id", "text"), tmp())
    }
    assert(e.getMessage.contains("meta.json"))
  }

  test("legacy pre-bucketing indexes still append and probe (flat path)") {
    import spark.implicits._
    val (base, batch, _) = fixture
    // fabricate the pre-bucketing layout: flat parquet dirs + a meta
    // WITHOUT bands_buckets (what an index built before the bucketed
    // write looks like on disk)
    val idx = tmp()
    val sigs = MinHashIndex.signatures(base.toDF("doc_id", "text"))
    sigs.write.parquet(s"$idx/signatures")
    MinHashIndex.bands(sigs).write.parquet(s"$idx/bands")
    graft.util.Fs.writeStringAtomic(s"$idx/meta.json",
      s"""{"scheme":"minhash-3gram-6x3","n_docs":2}""", spark.sessionState.newHadoopConf())
    val batchSigs = MinHashIndex.signatures(batch.toDF("doc_id", "text"))
    def got = MinHashIndex.probe(spark, idx, batchSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((3L, 1L, 1000L), (4L, 1L, 894L)))
    // flat append keeps the layout consistent and the probe target grows
    MinHashIndex.append(spark, batch.toDF("doc_id", "text"), idx)
    val again = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(base.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again.contains((1L, 3L)))
  }

  test("delete retracts base docs from probes; compact folds tombstones") {
    import spark.implicits._
    val (base, batch, _) = fixture
    val idx = tmp()
    MinHashIndex.write(spark, base.toDF("doc_id", "text"), idx)
    val batchSigs = MinHashIndex.signatures(batch.toDF("doc_id", "text"))
    def got = MinHashIndex.probe(spark, idx, batchSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((3L, 1L, 1000L), (4L, 1L, 894L)))
    // unknown id: no-op; then retract base doc 1 — both its pairs go
    MinHashIndex.delete(spark, idx, Seq(777L).toDF("doc_id"))
    assert(got === Set((3L, 1L, 1000L), (4L, 1L, 894L)))
    MinHashIndex.delete(spark, idx, Seq(1L).toDF("doc_id"))
    MinHashIndex.delete(spark, idx, Seq(1L).toDF("doc_id")) // idempotent
    assert(got === Set.empty, "tombstoned base doc still probed")
    // compact folds the deletion into the files and stays bucketed
    MinHashIndex.compact(spark, idx)
    assert(Option(new java.io.File(s"$idx/tombstones").listFiles())
      .map(_.count(_.getName.startsWith("part-"))).getOrElse(0) === 0,
      "compact must clear the folded tombstone files (dir may remain)")
    assert(got === Set.empty)
    val meta = graft.util.Fs.readString(s"$idx/meta.json",
      spark.sessionState.newHadoopConf())
    assert(meta.contains(""""n_docs":1"""), meta)
    // the index keeps working: append the batch, re-probe the base side
    MinHashIndex.append(spark, batch.toDF("doc_id", "text"), idx)
    val again = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(base.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1 was deleted from the INDEX, but as an external probe it
    // still finds its surviving copy d3
    assert(again.contains((1L, 3L)))
  }

  test("health reports docs/dups/tombstones/orphans; compact resets them") {
    import spark.implicits._
    val (base, batch, _) = fixture
    val idx = tmp()
    MinHashIndex.write(spark, base.toDF("doc_id", "text"), idx)
    val h1 = MinHashIndex.health(spark, idx)
    assert(h1.docs === 2L && h1.publishedDocs === 2L)
    assert(h1.duplicateRows === 0L && h1.tombstones === 0L)
    assert(h1.orphanBandDocs === 0L && h1.missingBandDocs === 0L)
    assert(!h1.streaming && h1.bandBuckets === 32)
    // a duplicate append (crash-retry fingerprint) + a pending
    // takedown + a signatures/bands inconsistency all surface
    MinHashIndex.append(spark, base.toDF("doc_id", "text"), idx)
    MinHashIndex.delete(spark, idx, Seq(2L).toDF("doc_id"))
    MinHashIndex.bands(
        MinHashIndex.signatures(batch.take(1).toDF("doc_id", "text")))
      .write.mode("append").parquet(s"$idx/bands") // band-only doc 3
    val h2 = MinHashIndex.health(spark, idx)
    assert(h2.duplicateRows === 2L, h2.toString)
    assert(h2.tombstones === 1L)
    assert(h2.orphanBandDocs === 1L, "band rows without signatures")
    // compact heals everything it can see
    MinHashIndex.compact(spark, idx)
    val h3 = MinHashIndex.health(spark, idx)
    assert(h3.duplicateRows === 0L && h3.tombstones === 0L)
    assert(h3.orphanBandDocs === 0L && h3.missingBandDocs === 0L)
    assert(h3.docs === 1L && h3.publishedDocs === 1L) // doc 2 folded out
  }

  test("rebucket migrates a legacy flat index; probes identical, plan bucketed") {
    import spark.implicits._
    val (base, batch, _) = fixture
    // the same fabricated pre-bucketing layout as the flat-path test
    val idx = tmp()
    val sigs = MinHashIndex.signatures(base.toDF("doc_id", "text"))
    sigs.write.parquet(s"$idx/signatures")
    MinHashIndex.bands(sigs).write.parquet(s"$idx/bands")
    graft.util.Fs.writeStringAtomic(s"$idx/meta.json",
      s"""{"scheme":"minhash-3gram-6x3","n_docs":2}""",
      spark.sessionState.newHadoopConf())
    val batchSigs = MinHashIndex.signatures(batch.toDF("doc_id", "text"))
    def got = MinHashIndex.probe(spark, idx, batchSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = got
    MinHashIndex.rebucket(spark, idx, bandBuckets = 8)
    // results are unchanged — rebucket rewrites layout, never rows
    assert(got === before)
    assert(before === Set((3L, 1L, 1000L), (4L, 1L, 894L)))
    // and the probe now reads a BUCKETED bands scan (the shuffle-free
    // probe shape the flat layout couldn't offer); AQE off for a
    // walkable static plan, as in the shuffle-free pin below
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = MinHashIndex.probe(spark, idx, batchSigs)
        .queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("/bands")) => s
      }
      assert(scans.nonEmpty && scans.forall(_.bucketedScan),
        "post-rebucket bands scan must be bucketed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    // append continues bucket-aligned on the migrated index
    MinHashIndex.append(spark, batch.toDF("doc_id", "text"), idx)
    assert(MinHashIndex.probe(spark, idx, sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((1L, 3L)))
    // second migration has nothing to do and says so
    val e = intercept[IllegalArgumentException] {
      MinHashIndex.rebucket(spark, idx)
    }
    assert(e.getMessage.contains("already"))
  }

  test("probe's candidate join is shuffle-free on the bucketed index side") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idx = tmp()
    MinHashIndex.write(spark, docs.filter(col("doc_id") % 5 =!= 0), idx,
      bandBuckets = 8)
    // force the SMJ shape (no broadcast) and a walkable static plan
    val olds = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
      .map { case (k, v) =>
        val o = spark.conf.get(k); spark.conf.set(k, v); k -> o }
    try {
      val probe = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(docs.filter(col("doc_id") % 5 === 0)))
      val plan = probe.queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("/bands")) => s
      }
      assert(scans.nonEmpty, "expected a file scan over bands/")
      assert(scans.forall(_.bucketedScan),
        "the bands scan must report its bucketing (Bucketed: true)")
      // no shuffle may sit between the bands scan and the CANDIDATE
      // join: the join child holding the bands scan must be
      // Exchange-free (the batch child shuffles into the buckets;
      // downstream rerank joins shuffle candidate pairs by design)
      def holdsBands(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.relation.location.rootPaths.exists(_.toString.contains("/bands")) => s
        }.isDefined
      // the LOWEST join over the bands scan (ancestors also "contain"
      // it transitively): its bands-holding child has no further join
      val candJoin = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.children.exists(c => holdsBands(c) && c.collectFirst {
              case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
            }.isEmpty) => j
      }
      assert(candJoin.size === 1, "expected one SMJ directly over bands/")
      val Seq(idxSide) = candJoin.head.children.filter(holdsBands)
      val idxShuffles = idxSide.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(idxShuffles.isEmpty,
        s"index-side Exchange found:\n${idxShuffles.mkString("\n")}")
      val batchSide = candJoin.head.children.filterNot(holdsBands)
      assert(batchSide.exists(_.collectFirst {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isDefined), "the batch side shuffles into the index's buckets")
      // and the pairs themselves are the fixture's truth
      assert(probe.collect().nonEmpty)
    } finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("compactStreaming converts a streamed index to the bucketed layout") {
    import spark.implicits._
    val (base, batch, _) = fixture
    val all = base.toDF("doc_id", "text")
    val b1 = all.filter(col("doc_id") === 1L)
    val b2 = all.filter(col("doc_id") === 2L)
    val idx = tmp()
    assert(MinHashIndex.appendBatch(spark, MinHashIndex.signatures(b1), idx, 0L))
    assert(MinHashIndex.appendBatch(spark, MinHashIndex.signatures(b2), idx, 1L))
    val sigs = MinHashIndex.signatures(batch.toDF("doc_id", "text"))
    def got = MinHashIndex.probe(spark, idx, sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = got
    MinHashIndex.compactStreaming(spark, idx, bandBuckets = 4)
    // same pairs, now served from the batch layout
    assert(got === before)
    assert(before === Set((3L, 1L, 1000L), (4L, 1L, 894L)))
    val meta = graft.util.Fs.readString(s"$idx/meta.json", spark.sessionState.newHadoopConf())
    assert(meta.contains(""""bands_buckets":4"""))
    assert(!meta.contains("last_batch"))
    assert(meta.contains(""""n_docs":2"""))
    // the layout handoff: streaming appends reject, batch appends work
    val e = intercept[IllegalArgumentException] {
      MinHashIndex.appendBatch(spark, sigs, idx, 2L); ()
    }
    assert(e.getMessage.contains("must not mix"))
    MinHashIndex.append(spark, batch.toDF("doc_id", "text"), idx)
    val after = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(b1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.contains((1L, 3L))) // the copy is findable from the other side
  }

  test("maintain preserves a custom bucket count and folds mid-stream") {
    import spark.implicits._
    // batch layout, non-default buckets: a tombstone-tripped maintain
    // must compact WITHOUT reshaping the physical layout (compact's
    // bare default would silently reset 16 -> 32)
    val (base, batch, _) = fixture
    val idx = tmp()
    MinHashIndex.write(spark,
      (base ++ batch).toDF("doc_id", "text"), idx, bandBuckets = 16)
    MinHashIndex.delete(spark, idx, Seq(2L, 5L).toDF("doc_id"))
    val policy = MaintenancePolicy(checkEvery = 1, maxTombstonePermille = 100,
      minRows = 1)
    assert(MinHashIndex.maintain(spark, idx, policy) === "compact")
    val h = MinHashIndex.health(spark, idx)
    assert(h.tombstones === 0L && h.bandBuckets === 16,
      s"maintenance must not reshape the index: $h")
    assert(MinHashIndex.maintain(spark, idx, policy) === "none",
      "a healthy index must not be rewritten again")
    // streaming layout: maintain routes to foldStreaming and the
    // stream fence survives
    val sidx = tmp()
    MinHashIndex.appendBatch(spark,
      MinHashIndex.signatures(base.toDF("doc_id", "text")), sidx, 0L)
    MinHashIndex.delete(spark, sidx, Seq(1L).toDF("doc_id"))
    assert(MinHashIndex.maintain(spark, sidx, policy) === "compact")
    val hs = MinHashIndex.health(spark, sidx)
    assert(hs.streaming && hs.tombstones === 0L && hs.docs === 1L)
    // the stream continues on the folded index
    assert(MinHashIndex.appendBatch(spark,
      MinHashIndex.signatures(batch.toDF("doc_id", "text")), sidx, 1L))
    // FOREIGN-id tombstones (delete's doc says unknown ids are
    // harmless) inflate the tombstone count past the doc count — the
    // proxy that would permanently LATCH the maintenance skip. With
    // survivors present, maintenance must still fold.
    MinHashIndex.delete(spark, sidx,
      (100L to 120L).toDF("doc_id")) // 21 foreign vs 4 live docs
    MinHashIndex.delete(spark, sidx, Seq(3L).toDF("doc_id")) // 1 real
    assert(MinHashIndex.maintain(spark, sidx, policy) === "compact",
      "foreign tombstones must not latch the maintenance skip")
    val hf = MinHashIndex.health(spark, sidx)
    assert(hf.tombstones === 0L && hf.docs === 3L, s"$hf")
    // full retraction: a fold that would empty the index is refused
    // (the rewrite would leave a parquet-less signatures/ that every
    // later probe crashes on), and maintain SKIPS the state — probes
    // already exclude every doc, deleting the dir is the operator move
    MinHashIndex.delete(spark, sidx,
      (base ++ batch).map(_._1).toDF("doc_id"))
    val e = intercept[IllegalStateException](
      MinHashIndex.foldStreaming(spark, sidx))
    assert(e.getMessage.contains("would empty"), e.getMessage)
    assert(MinHashIndex.maintain(spark, sidx, policy) === "none")
    assert(MinHashIndex.probe(spark, sidx,
      MinHashIndex.signatures(base.toDF("doc_id", "text"))).count() === 0L)
  }

  test("compact refuses the interrupted-swap crash state instead of destroying it") {
    // IvfIndexSpec's crash-state audit, MinHash side: a compact that
    // died between its two renames leaves the only complete copy in
    // <name>_old — the next rewrite must refuse and NAME the one
    // recovering rename, never delete the orphan and rebuild from a
    // missing live dir
    import spark.implicits._
    val (base, _, _) = fixture
    val idx = tmp()
    MinHashIndex.write(spark, base.toDF("doc_id", "text"), idx)
    val before = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(Seq((9L, (1 to 20).map(i => s"w$i")
          .mkString(" "))).toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before === Set((9L, 1L)))
    assert(new java.io.File(s"$idx/signatures")
      .renameTo(new java.io.File(s"$idx/signatures_old")))
    val e = intercept[IllegalStateException](MinHashIndex.compact(spark, idx))
    assert(e.getMessage.contains("interrupted compact"), e.getMessage)
    assert(e.getMessage.contains("signatures_old"), e.getMessage)
    // the recovery the message names actually works, and the healed
    // index compacts and probes as before
    assert(new java.io.File(s"$idx/signatures_old")
      .renameTo(new java.io.File(s"$idx/signatures")))
    MinHashIndex.compact(spark, idx)
    val after = MinHashIndex.probe(spark, idx,
        MinHashIndex.signatures(Seq((9L, (1 to 20).map(i => s"w$i")
          .mkString(" "))).toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before)
  }
}
