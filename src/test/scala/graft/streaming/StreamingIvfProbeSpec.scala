package graft.streaming

import graft.GraftSession
import graft.operators.{IvfAnn, IvfIndex}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming embedding ingestion against the persisted IVF index:
  * each micro-batch gets its exact nearest EARLIER vectors, the index
  * grows batch by batch under the bounds-lead-data meta staging,
  * replays (committed or crashed-partial) reproduce the first
  * delivery bit-identically, id-space restarts and layout mixes fail
  * loudly, and a fully streamed index searches identically to a
  * one-shot build. */
class StreamingIvfProbeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private def tmp(stem: String) =
    java.nio.file.Files.createTempDirectory(stem).toString

  /** Two tight clusters on orthogonal axes: nearest-neighbor structure
    * is obvious by construction (same-axis vectors dot ~100, cross-axis
    * ~1). */
  private def vec(axis: Int, jitter: Double): Seq[Double] =
    (0 until 4).map(d => if (d == axis) 10.0 + jitter else 0.1 * jitter)

  /** Bootstrap corpus dir (embeddings.parquet) for centroid training. */
  private def bootstrap(): String = {
    import spark.implicits._
    val dir = tmp("ivfboot")
    (0 until 8).map(i => (100L + i, vec(i % 2, 0.01 * i)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet

  test("batches find nearest neighbors among ALL earlier batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp("sivf") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(), idx, k = 2, iters = 2)
    val in = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = StreamingIvfProbe.start(
      in.toDF.toDF("vec_id", "embedding"), idx, tmp("sivfchk"),
      pairs => { got ++= pairsOf(pairs); () }, topK = 1)
    try {
      in.addData((1L, vec(0, 0.5)), (2L, vec(1, 0.5)))
      q.processAllAvailable()
      assert(got.isEmpty, "first batch has no earlier corpus to match")
      in.addData((3L, vec(0, 0.6)))
      q.processAllAvailable()
      assert(got.toSet === Set((3L, 1L, 1L)), "same-axis batch-1 doc wins")
      got.clear()
      // nearest of v5 is v3 (batch 2) — proves batch 2 was appended and
      // the probe target is the whole ingested corpus
      in.addData((5L, vec(0, 0.61)))
      q.processAllAvailable()
      assert(got.toSet === Set((5L, 3L, 1L)))
    } finally q.stop()
  }

  test("a replayed committed batch reproduces its output and writes nothing") {
    import spark.implicits._
    val idx = tmp("sivfr") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(), idx, k = 2, iters = 2)
    val b0 = Seq((1L, vec(0, 0.5)), (2L, vec(1, 0.5))).toDF("vec_id", "embedding")
    val b1 = Seq((3L, vec(0, 0.6)), (4L, vec(1, 0.6))).toDF("vec_id", "embedding")
    assert(StreamingIvfProbe.processBatch(spark, idx, b0, 0L, 2).count() === 0L)
    val first = pairsOf(StreamingIvfProbe.processBatch(spark, idx, b1, 1L, 2))
    assert(first === Set((3L, 1L, 1L), (3L, 2L, 2L), (4L, 2L, 1L), (4L, 1L, 2L)))
    val rows = spark.read.parquet(s"$idx/data").count()
    // replay of batch 1: docs 3/4 already sit in the index, but the
    // candidate exclusion reproduces the first delivery bit-identically
    // and appendBatch sees the committed fence and skips
    val replay = pairsOf(StreamingIvfProbe.processBatch(spark, idx, b1, 1L, 2))
    assert(replay === first)
    assert(spark.read.parquet(s"$idx/data").count() === rows)
    // counts were not double-committed: meta agrees with the data
    val meta = IvfIndex.readMeta(idx, spark.sessionState.newHadoopConf())
    assert(meta.counts.sum === rows)
    assert(meta.lastBatch === Some(1L))
  }

  test("a crashed partial append is healed and replay output is unchanged") {
    import spark.implicits._
    val idx = tmp("sivfc") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(), idx, k = 2, iters = 2)
    val b0 = Seq((1L, vec(0, 0.5)), (2L, vec(1, 0.5))).toDF("vec_id", "embedding")
    StreamingIvfProbe.processBatch(spark, idx, b0, 0L, 1)
    // simulate the crash window between the batch-dir write and the
    // meta commit: batch 1's data lands, last_batch stays 0
    val meta = IvfIndex.readMeta(idx, spark.sessionState.newHadoopConf())
    val b1 = Seq((3L, vec(0, 0.6))).toDF("vec_id", "embedding")
    IvfAnn.assign(b1, meta.centroids)
      .select(col("vec_id"), col("embedding"), col("label").cast("int").as("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$idx/data/batch_id=1")
    // re-delivery: doc 3's own uncommitted rows must not answer doc 3,
    // the rewrite heals the dir, and the append commits
    val pairs = pairsOf(StreamingIvfProbe.processBatch(spark, idx, b1, 1L, 1))
    assert(pairs === Set((3L, 1L, 1L)))
    assert(spark.read.parquet(s"$idx/data").where("vec_id = 3").count() === 1L)
    assert(IvfIndex.readMeta(idx, spark.sessionState.newHadoopConf())
      .lastBatch === Some(1L))
  }

  test("id-space restarts and layout mixes fail loudly") {
    import spark.implicits._
    val idx = tmp("sivfg") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(), idx, k = 2, iters = 2)
    val b = Seq((1L, vec(0, 0.5))).toDF("vec_id", "embedding")
    StreamingIvfProbe.processBatch(spark, idx, b, 0L, 1)
    StreamingIvfProbe.processBatch(spark, idx,
      Seq((2L, vec(1, 0.5))).toDF("vec_id", "embedding"), 1L, 1)
    val e = intercept[IllegalStateException] {
      StreamingIvfProbe.processBatch(spark, idx,
        Seq((9L, vec(0, 0.9))).toDF("vec_id", "embedding"), 0L, 1)
    }
    assert(e.getMessage.contains("restarted"))
    // the flat batch-API append is rejected on this layout...
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, bootstrap(), idx)
    }
    assert(e2.getMessage.contains("streaming-layout"))
    // ... and appendBatch is rejected on a batch-API index
    val batchIdx = tmp("sivfb") + "/idx"
    IvfIndex.write(spark, "/root/testdata/sf0.001", batchIdx, k = 4, iters = 1)
    val e3 = intercept[IllegalArgumentException] {
      IvfIndex.appendBatch(spark, b, batchIdx, 0L); ()
    }
    assert(e3.getMessage.contains("must not mix"))
  }

  test("approx dial: nprobe = k reproduces the exact probe; replay identical") {
    import spark.implicits._
    val idx = tmp("sivfa") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(), idx, k = 2, iters = 2)
    val b0 = Seq((1L, vec(0, 0.5)), (2L, vec(1, 0.5))).toDF("vec_id", "embedding")
    val b1 = Seq((3L, vec(0, 0.6)), (4L, vec(1, 0.6))).toDF("vec_id", "embedding")
    StreamingIvfProbe.processBatch(spark, idx, b0, 0L, 2)
    // nprobe = k visits every cluster → must equal the exact search
    val approx = pairsOf(StreamingIvfProbe.processBatch(spark, idx, b1, 1L, 2,
      nprobe = Some(2)))
    assert(approx === Set((3L, 1L, 1L), (3L, 2L, 2L), (4L, 2L, 1L), (4L, 1L, 2L)))
    // replayed approx probe (batch already indexed): same output
    val replay = pairsOf(StreamingIvfProbe.processBatch(spark, idx, b1, 1L, 2,
      nprobe = Some(2)))
    assert(replay === approx)
    // nprobe = 1 restricts each probe to its own cluster's candidates
    val b2 = Seq((5L, vec(0, 0.7))).toDF("vec_id", "embedding")
    val narrow = pairsOf(StreamingIvfProbe.processBatch(spark, idx, b2, 2L, 2,
      nprobe = Some(1)))
    assert(narrow.map(_._2).subsetOf(Set(1L, 3L)),
      s"nprobe=1 must only see same-axis candidates, got $narrow")
    assert(narrow.nonEmpty)
  }

  test("a mid-stream takedown composes with the batch exclusion") {
    import spark.implicits._
    val idx = tmp("sivfd") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(), idx, k = 2, iters = 2)
    val b0 = Seq((1L, vec(0, 0.5)), (2L, vec(1, 0.5))).toDF("vec_id", "embedding")
    val b1 = Seq((3L, vec(0, 0.6)), (4L, vec(1, 0.6))).toDF("vec_id", "embedding")
    assert(StreamingIvfProbe.processBatch(spark, idx, b0, 0L, 1).count() === 0L)
    // without the takedown, doc 3's nearest is the same-axis doc 1
    // (the first test pins that); delete doc 1 mid-stream — the next
    // batch's probe must skip it AND still exclude its own rows, so
    // doc 3 falls through to the cross-axis doc 2
    IvfIndex.delete(spark, idx, Seq(1L).toDF("vec_id"))
    val got = pairsOf(StreamingIvfProbe.processBatch(spark, idx, b1, 1L, 1))
    assert(got === Set((3L, 2L, 1L), (4L, 2L, 1L)),
      "tombstoned doc 1 must vanish from probe candidates")
  }

  test("re-ingesting a tombstoned id never lands it (counts stay exact)") {
    import spark.implicits._
    val idx = tmp("sivfri") + "/idx"
    IvfIndex.initStreaming(spark, bootstrap(), idx, k = 2, iters = 2)
    val b0 = Seq((1L, vec(0, 0.5)), (2L, vec(1, 0.5))).toDF("vec_id", "embedding")
    assert(StreamingIvfProbe.processBatch(spark, idx, b0, 0L, 1).count() === 0L)
    IvfIndex.delete(spark, idx, Seq(1L).toDF("vec_id"))
    // batch 1 RE-DELIVERS doc 1 beside a fresh doc: if the tombstoned
    // row landed again, its data row would be counted while the
    // tombstone both subtracts one count and anti-joins every copy —
    // net count OVERSTATEMENT, the direction that silently breaks the
    // pruning proof. The append must drop it instead.
    val b1 = Seq((1L, vec(0, 0.5)), (3L, vec(0, 0.6))).toDF("vec_id", "embedding")
    val got = pairsOf(StreamingIvfProbe.processBatch(spark, idx, b1, 1L, 1))
    // both batch docs PROBE (external probe frames are the caller's —
    // retraction governs the index side), but the tombstoned doc 1 is
    // no candidate for doc 3: both fall through to the cross-axis doc 2
    assert(got === Set((1L, 2L, 1L), (3L, 2L, 1L)),
      "deleted doc 1 must not be a candidate")
    val data = spark.read.parquet(s"$idx/data")
    assert(data.filter(col("vec_id") === 1L).count() === 1L,
      "the tombstoned id must not land a second data row")
    // and the published counts cover exactly the landed rows
    val meta = IvfIndex.readMeta(idx, spark.sessionState.newHadoopConf())
    assert(meta.counts.sum === data.count())
  }

  test("a fully streamed index searches identically to a one-shot build") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val streamed = tmp("sivfp") + "/idx"
    // bootstrap on the SAME corpus → identical frozen centroids, so any
    // result difference would be the streaming layout's fault
    IvfIndex.initStreaming(spark, dir, streamed)
    assert(IvfIndex.appendBatch(spark, emb.filter(col("vec_id") % 2 === 0),
      streamed, 0L))
    assert(IvfIndex.appendBatch(spark, emb.filter(col("vec_id") % 2 =!= 0),
      streamed, 1L))
    val oneShot = tmp("sivfq") + "/idx"
    IvfIndex.write(spark, dir, oneShot)
    def res(idx: String) = IvfIndex.searchExact(spark, idx, col("vec_id") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val s = res(streamed)
    assert(s === res(oneShot))
    assert(s.nonEmpty)
    // compact FINALIZES the streamed index into the batch layout:
    // same results, batch-id fence gone, streaming appends reject
    IvfIndex.compact(spark, streamed)
    assert(res(streamed) === s)
    val meta = IvfIndex.readMeta(streamed, spark.sessionState.newHadoopConf())
    assert(meta.lastBatch === None)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.appendBatch(spark, emb.limit(1), streamed, 2L); ()
    }
    assert(e.getMessage.contains("must not mix"))
  }
}
