package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming SimHash near-dedup: Scala fingerprint is bit-identical to
  * the batch/oracle SQL scheme, and near-dup pairs emerge online across
  * triggers through banded keyed state. */
class StreamingNearDupSpec extends AnyFunSuite {
  import StreamingNearDup._
  private lazy val spark = GraftSession.build("graft-test")

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("Scala simhash32 is bit-identical to the batch SQL fingerprint") {
    // real corpus texts, not synthetic: any tokenizer/hash drift between
    // the Scala and SQL implementations shows up as a fp mismatch
    val sqlFps = graft.queries.TextMedia
      .simhashFingerprints(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      assert(simhash32(text) === sqlFps(id), s"fp mismatch for doc $id")
    }
  }

  test("near-dup pairs emerge online, including across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val nearA = base + "alpha"   // tiny suffix diff → Hamming ≤ 2
    val distinct = "completely different content about spark engines " * 8
    assert(java.lang.Long.bitCount(simhash32(base) ^ simhash32(nearA)) <= 2)
    assert(java.lang.Long.bitCount(simhash32(base) ^ simhash32(distinct)) > 2)

    val in = MemoryStream[DocEvent]
    val q = pairs(in.toDS).writeStream
      .format("memory").queryName("neardup").outputMode("append").start()
    try {
      in.addData(DocEvent(ts(1), 1L, base), DocEvent(ts(2), 5L, distinct))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM neardup").count() === 0)
      // the near-dup arrives in a LATER trigger: state carries the fps
      in.addData(DocEvent(ts(3), 9L, nearA))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT DISTINCT docA, docB, hamming FROM neardup").collect()
      assert(got.length === 1)
      assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 9L)
      assert(got(0).getInt(2) <= 2)
    } finally q.stop()
  }

  test("entries past the horizon are pruned even in hot buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val nearA = base + "alpha"
    val in = MemoryStream[DocEvent]
    val q = pairs(in.toDS).writeStream
      .format("memory").queryName("neardup_prune").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      in.addData(DocEvent(t0, 1L, base))
      q.processAllAvailable()
      // push the watermark (1h delay) far past t0 + the 24h horizon —
      // the bucket stays "hot" (keeps receiving docs) so only per-entry
      // pruning can evict doc 1
      val t1 = Timestamp.valueOf("2024-01-03 12:00:00")
      in.addData(DocEvent(t1, 2L, "unrelated filler content " * 8))
      q.processAllAvailable()
      in.addData(DocEvent(Timestamp.valueOf("2024-01-03 12:30:00"), 9L, nearA))
      q.processAllAvailable()
      // doc 1's fingerprint left state when the watermark passed its
      // horizon, so the would-be (1, 9) pair must NOT appear
      assert(spark.sql(
        "SELECT * FROM neardup_prune WHERE docA = 1 AND docB = 9").count() === 0)
    } finally q.stop()
  }
}
