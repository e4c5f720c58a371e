package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming banded-MinHash near-dedup: the m01 batch operator running
  * continuously, completing the streaming dedup story next to
  * [[StreamingNearDup]] (SimHash). Scheme parity is exact — tokenize →
  * distinct word 3-gram shingles, 6 seeded-md5 MinHashes, 3 bands of 2
  * hashed with md5 — so a pair this operator emits is a pair the batch
  * m01 plan would emit over the same documents
  * (StreamingMinHashSpec pins the band hashes against the SQL frame).
  *
  * Two modes:
  *
  *   - [[pairs]] (verify-grade): keyed by (band index, band hash); each
  *     bucket holds the (docId, shingle set) entries whose signature
  *     landed there inside the dedup horizon. Unlike the SimHash
  *     variant — whose state is one 32-bit fingerprint per doc —
  *     verify-grade MinHash state carries the shingle SETS (true
  *     Jaccard needs them), i.e. roughly the document text per
  *     colliding band. That is the honest cost of online verified
  *     pairs.
  *   - [[collisions]] (signatures-only, the 100 TB path): same banded
  *     state machine, but a bucket entry is (docId, tsMs) ONLY — state
  *     size is independent of document length — and the operator emits
  *     UNVERIFIED band collisions. [[verifyCollisions]] is the batch
  *     companion: a periodic join of the accumulated collisions against
  *     the document store computes exact Jaccard once per distinct
  *     pair (the exact split batch m01 uses — id-only candidates,
  *     payload joined back once). Every pair [[pairs]] would verify is
  *     among the collisions (same buckets, same horizon), so
  *     collisions→verify loses nothing but immediacy.
  *
  * Pair contract matches [[StreamingNearDup]]: a pair colliding in
  * several bands emits once per band; downstream exact dedup (or the
  * c01 clusterer, or [[verifyCollisions]]'s distinct) absorbs
  * duplicates.
  */
object StreamingMinHash {

  final case class DocEvent(ts: Timestamp, docId: Long, text: String)
  final case class BandHit(bi: Int, bh: String, docId: Long,
      sh: List[String], ts: Timestamp)
  final case class Entry(docId: Long, tsMs: Long, sh: List[String])
  final case class BucketState(entries: List[Entry])
  final case class NearDup(docA: Long, docB: Long, jaccardPermille: Long)

  // signatures-only mode: fixed-width state entries (no shingle sets)
  final case class SigHit(bi: Int, bh: String, docId: Long, ts: Timestamp)
  final case class SigEntry(docId: Long, tsMs: Long)
  final case class SigBucketState(entries: List[SigEntry])
  final case class Collision(docA: Long, docB: Long, bi: Int)

  /** Retention horizon per band bucket after the watermark. */
  val HorizonMs: Long = 24L * 3600 * 1000

  /** Batch m01's verify threshold. */
  val ThresholdPermille: Long = 500L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Distinct word 3-gram shingles, the batch scheme verbatim
    * (Similarity.shingles): docs under 3 tokens fall back to their
    * distinct token set. */
  def shingles(text: String): List[String] = {
    // explicit whitespace class, matching the SQL tokenizers (Java \s
    // and RE2 \s disagree on U+000B — see Documents' Scaladoc)
    val tk = text.split("[ \t\n\r\f]+").filter(_.nonEmpty)
    if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).distinct.toList
    else tk.distinct.toList
  }

  /** 6 MinHashes: per seed k, the lexicographic min of md5("k:" + s)
    * over the shingle set — identical to SQL's array_min over md5 hex
    * (ASCII hex compares the same under String and UTF8String order).
    * Empty shingle set → None, matching SQL null propagation (array_min
    * of an empty array is null, so empty docs never join a bucket). */
  def minhashes(sh: Seq[String]): Option[IndexedSeq[String]] =
    if (sh.isEmpty) None
    else Some((0 until 6).map(k => sh.iterator.map(s => md5hex(s"$k:$s")).min))

  /** The 3 band buckets of a signature: md5 of two concatenated
    * MinHashes each, batch scheme verbatim. */
  def bandHashes(mh: IndexedSeq[String]): Seq[(Int, String)] =
    Seq.tabulate(3)(i => (i, md5hex(mh(2 * i) + mh(2 * i + 1))))

  /** Exact integer Jaccard in permille, batch verify verbatim:
    * common * 1000 div (na + nb - common). */
  def jaccardPermille(a: List[String], b: List[String]): Long = {
    val sa = a.toSet
    val common = b.count(sa)
    val union = sa.size + b.size - common
    if (union == 0) 0L else common * 1000L / union
  }

  def pairs(events: Dataset[DocEvent]): Dataset[NearDup] = {
    implicit val hitEnc = Encoders.product[BandHit]
    implicit val stEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[NearDup]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    events
      .flatMap { e =>
        val sh = shingles(e.text)
        minhashes(sh) match {
          case Some(mh) =>
            bandHashes(mh).map { case (bi, bh) => BandHit(bi, bh, e.docId, sh, e.ts) }
          case None => Nil
        }
      }
      // watermark attaches AFTER the typed flatMap: event-time column
      // metadata does not survive object-level transforms
      .withWatermark("ts", "1 hour")
      .groupByKey(h => (h.bi, h.bh))
      .flatMapGroupsWithState[BucketState, NearDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), batch: Iterator[BandHit], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // per-entry horizon pruning — see StreamingNearDup: the
            // bucket timeout only fires when a bucket goes quiet, so a
            // hot bucket must evict aged entries itself
            val horizonFloor = state.getCurrentWatermarkMs() - HorizonMs
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_.tsMs >= horizonFloor)
            val out = List.newBuilder[NearDup]
            var maxTs = 0L
            // deterministic intra-batch order: event time, then id
            batch.toSeq.sortBy(h => (h.ts.getTime, h.docId)).foreach { h =>
              entries.foreach { e =>
                if (e.docId != h.docId) {
                  val j = jaccardPermille(e.sh, h.sh)
                  if (j >= ThresholdPermille)
                    out += NearDup(math.min(e.docId, h.docId),
                      math.max(e.docId, h.docId), j)
                }
              }
              entries = Entry(h.docId, h.ts.getTime, h.sh) :: entries
              maxTs = math.max(maxTs, h.ts.getTime)
            }
            state.update(BucketState(entries))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + HorizonMs)
            out.result().iterator
          }
      }
  }

  /** Signatures-only mode: the same banded state machine as [[pairs]],
    * but state entries are (docId, tsMs) — independent of document
    * length — and output is every UNVERIFIED within-bucket collision.
    * The emitted set is a superset of the pairs [[pairs]] verifies over
    * the same stream (identical buckets and horizon; verification only
    * filters). Feed the accumulated output to [[verifyCollisions]]. */
  def collisions(events: Dataset[DocEvent]): Dataset[Collision] = {
    implicit val hitEnc = Encoders.product[SigHit]
    implicit val stEnc = Encoders.product[SigBucketState]
    implicit val outEnc = Encoders.product[Collision]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    events
      .flatMap { e =>
        minhashes(shingles(e.text)) match {
          case Some(mh) =>
            bandHashes(mh).map { case (bi, bh) => SigHit(bi, bh, e.docId, e.ts) }
          case None => Nil
        }
      }
      .withWatermark("ts", "1 hour")
      .groupByKey(h => (h.bi, h.bh))
      .flatMapGroupsWithState[SigBucketState, Collision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, String), batch: Iterator[SigHit], state: GroupState[SigBucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val horizonFloor = state.getCurrentWatermarkMs() - HorizonMs
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_.tsMs >= horizonFloor)
            val out = List.newBuilder[Collision]
            var maxTs = 0L
            batch.toSeq.sortBy(h => (h.ts.getTime, h.docId)).foreach { h =>
              entries.foreach { e =>
                if (e.docId != h.docId)
                  out += Collision(math.min(e.docId, h.docId),
                    math.max(e.docId, h.docId), key._1)
              }
              entries = SigEntry(h.docId, h.ts.getTime) :: entries
              maxTs = math.max(maxTs, h.ts.getTime)
            }
            state.update(SigBucketState(entries))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + HorizonMs)
            out.result().iterator
          }
      }
  }

  /** Batch verify companion of [[collisions]]: exact integer Jaccard of
    * each DISTINCT collision pair against the document store, m01's
    * verify stage verbatim (same shingle SQL, same fenced single
    * evaluation of array_intersect, same ≥500‰ threshold). `docs` is a
    * (doc_id, text, …) frame; returns (doc_a, doc_b, jaccard_permille).
    * Candidates arrive as ids only, so the document text is joined
    * exactly once per distinct pair regardless of how many bands (or
    * triggers) re-emitted the collision. */
  def verifyCollisions(cands: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sh = docs.select(col("doc_id"),
      expr(graft.queries.Similarity.shingles).as("sh"))
    cands.select(col("docA").as("doc_a"), col("docB").as("doc_b")).distinct()
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.functions.OptimizerBarrier.fence(
          expr("size(array_intersect(sh_a, sh_b))").cast("bigint")).as("common"),
        expr("size(sh_a)").cast("bigint").as("na"),
        expr("size(sh_b)").cast("bigint").as("nb"))
      .select(col("doc_a"), col("doc_b"),
        expr("common * 1000 div (na + nb - common)").as("jaccard_permille"))
      .filter(col("jaccard_permille") >= ThresholdPermille)
  }
}
