package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming banded-MinHash near-dedup: the Scala signature pipeline is
  * bit-identical to batch m01's SQL scheme, and verified near-dup pairs
  * emerge online across triggers through banded keyed state. */
class StreamingMinHashSpec extends AnyFunSuite {
  import StreamingMinHash._
  private lazy val spark = GraftSession.build("graft-test")

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("Scala band hashes are bit-identical to the batch m01 SQL frame") {
    // real corpus texts: tokenizer/shingle/md5/band drift between the
    // Scala and SQL implementations shows up as a band-hash mismatch
    val sqlBands = graft.queries.Similarity
      .minhashBands(spark, "/root/testdata/sf0.001")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getString(2))).toSet).toMap
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val scalaBands = minhashes(shingles(text))
        .map(mh => bandHashes(mh).toSet).getOrElse(Set.empty)
      assert(scalaBands === sqlBands.getOrElse(id, Set.empty),
        s"band mismatch for doc $id")
    }
  }

  test("verified near-dup pairs emerge online, including across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val nearA = base + "alpha"       // shares most 3-gram shingles
    val distinct = "completely different content about spark engines " * 8
    // fixture sanity, Scala-side: true Jaccard crosses the threshold and
    // the pair collides in at least one band (so the test is meaningful)
    assert(jaccardPermille(shingles(base), shingles(nearA)) >= ThresholdPermille)
    assert(jaccardPermille(shingles(base), shingles(distinct)) < ThresholdPermille)
    val bandsBase = bandHashes(minhashes(shingles(base)).get).toSet
    val bandsNear = bandHashes(minhashes(shingles(nearA)).get).toSet
    assert(bandsBase.intersect(bandsNear).nonEmpty, "fixture pair shares no band")

    val in = MemoryStream[DocEvent]
    val q = pairs(in.toDS).writeStream
      .format("memory").queryName("mh_neardup").outputMode("append").start()
    try {
      in.addData(DocEvent(ts(1), 1L, base), DocEvent(ts(2), 5L, distinct))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM mh_neardup").count() === 0)
      // the near-dup arrives in a LATER trigger: state carries shingles
      in.addData(DocEvent(ts(3), 9L, nearA))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT DISTINCT docA, docB, jaccardPermille FROM mh_neardup").collect()
      assert(got.length === 1)
      assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 9L)
      assert(got(0).getLong(2) >= ThresholdPermille)
    } finally q.stop()
  }

  test("empty documents never enter a bucket (SQL null-band parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val q = pairs(in.toDS).writeStream
      .format("memory").queryName("mh_empty").outputMode("append").start()
    try {
      in.addData(DocEvent(ts(1), 1L, ""), DocEvent(ts(2), 2L, "   "),
        DocEvent(ts(3), 3L, ""))
      q.processAllAvailable()
      // batch parity: array_min over an empty shingle set is null, so
      // empty docs join no bucket and pair with nothing (not even each
      // other, despite Jaccard being degenerate-equal)
      assert(spark.sql("SELECT * FROM mh_empty").count() === 0)
    } finally q.stop()
  }

  test("signatures-only collisions ⊇ verified pairs; batch verify recovers them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val nearA = base + "alpha"
    val distinct = "completely different content about spark engines " * 8
    val events = Seq(
      DocEvent(ts(1), 1L, base), DocEvent(ts(2), 5L, distinct),
      DocEvent(ts(3), 9L, nearA))

    def run[T](mk: org.apache.spark.sql.Dataset[DocEvent] => org.apache.spark.sql.Dataset[T],
        name: String): Unit = {
      val in = MemoryStream[DocEvent]
      val q = mk(in.toDS).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try { in.addData(events: _*); q.processAllAvailable() } finally q.stop()
    }
    run(StreamingMinHash.pairs, "mh_sig_pairs")
    run(StreamingMinHash.collisions, "mh_sig_colls")

    val verified = spark.sql("SELECT DISTINCT docA, docB FROM mh_sig_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val colls = spark.sql("SELECT DISTINCT docA, docB FROM mh_sig_colls")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified === Set((1L, 9L)))
    // superset: every verified pair collided; unverified extras allowed
    assert(verified.subsetOf(colls), s"colls $colls missing verified $verified")

    // the batch verify companion over the collision log + document store
    // recovers exactly the online-verified relation
    val docs = Seq((1L, base), (5L, distinct), (9L, nearA)).toDF("doc_id", "text")
    val rever = StreamingMinHash.verifyCollisions(
        spark.table("mh_sig_colls"), docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rever === verified)
  }

  test("signatures-only state entries carry no document content") {
    // the 100 TB claim is structural: a SigEntry is (docId, tsMs) — no
    // String/List field can smuggle the text or shingle set into state,
    // so per-bucket state size is independent of document length
    val fieldTypes = classOf[StreamingMinHash.SigEntry]
      .getDeclaredFields.map(_.getType).toSet
    assert(fieldTypes === Set(java.lang.Long.TYPE))
  }

  test("entries past the horizon are pruned even in hot buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val nearA = base + "alpha"
    val in = MemoryStream[DocEvent]
    val q = pairs(in.toDS).writeStream
      .format("memory").queryName("mh_prune").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      in.addData(DocEvent(t0, 1L, base))
      q.processAllAvailable()
      // push the watermark (1h delay) past t0 + the 24h horizon while
      // keeping the stream hot: only per-entry pruning can evict doc 1
      val t1 = Timestamp.valueOf("2024-01-03 12:00:00")
      in.addData(DocEvent(t1, 2L, "unrelated filler content " * 8))
      q.processAllAvailable()
      in.addData(DocEvent(Timestamp.valueOf("2024-01-03 12:30:00"), 9L, nearA))
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT * FROM mh_prune WHERE docA = 1 AND docB = 9").count() === 0)
    } finally q.stop()
  }
}
