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
  * State shape: keyed by (band index, band hash); each bucket holds the
  * (docId, shingle set) entries whose signature landed there inside the
  * dedup horizon. Unlike the SimHash variant — whose state is one 32-bit
  * fingerprint per doc — verify-grade MinHash state carries the shingle
  * SETS (true Jaccard needs them), i.e. roughly the document text per
  * colliding band. That is the honest cost of online verified pairs; a
  * 100 TB deployment that can tolerate async verification should instead
  * emit UNVERIFIED band collisions from a signatures-only state and
  * verify them in a periodic batch join against the document store (the
  * exact split batch m01 uses: id-only candidate join, payload joined
  * back once per distinct pair).
  *
  * Pair contract matches [[StreamingNearDup]]: a pair colliding in
  * several bands emits once per band; downstream exact dedup (or the
  * c01 clusterer) absorbs duplicates.
  */
object StreamingMinHash {

  final case class DocEvent(ts: Timestamp, docId: Long, text: String)
  final case class BandHit(bi: Int, bh: String, docId: Long,
      sh: List[String], ts: Timestamp)
  final case class Entry(docId: Long, tsMs: Long, sh: List[String])
  final case class BucketState(entries: List[Entry])
  final case class NearDup(docA: Long, docB: Long, jaccardPermille: Long)

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
}
