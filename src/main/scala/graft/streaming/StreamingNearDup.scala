package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming SimHash near-dedup: the s01 batch operator running
  * continuously. Each arriving document is fingerprinted (32-bit
  * SimHash, bit-identical to the batch/oracle scheme — SimHashSpec pins
  * the parity), split into 4 byte-bands, and checked against the
  * fingerprints previously seen in each band bucket; Hamming ≤ 2 emits
  * a near-dup pair online.
  *
  * State shape (the 100 TB property): keyed by (band index, band value)
  * — 4×256 logical buckets per band space scaled by the fp
  * distribution — each holding the (fp, docId) pairs whose fingerprint
  * landed there inside the dedup horizon. Event-time timeout expires a
  * bucket once the watermark passes its horizon, so state tracks the
  * horizon's document volume, not the stream's. A pair colliding in
  * several bands emits once per band; downstream exact dedup (or the
  * batch c01 clusterer) absorbs duplicates — the same contract as the
  * batch LSH operators, where the pair-distinct runs after candidate
  * generation.
  */
object StreamingNearDup {

  final case class DocEvent(ts: Timestamp, docId: Long, text: String)
  final case class BandHit(bi: Int, bv: Int, fp: Long, docId: Long, ts: Timestamp)
  final case class BucketState(entries: List[(Long, Long, Long)]) // (fp, docId, tsMs)
  final case class NearDup(docA: Long, docB: Long, hamming: Int)

  /** Retention horizon per band bucket after the watermark. */
  val HorizonMs: Long = 24L * 3600 * 1000

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 32-bit SimHash, the batch scheme verbatim (TextMedia s01): distinct
    * whitespace tokens; per token the first 8 md5 hex digits as a 32-bit
    * word; bit i votes +1 if set else −1; fp bit i = vote > 0. */
  def simhash32(text: String): Long = {
    val votes = new Array[Int](32)
    // explicit whitespace class, matching the SQL tokenizers (Java \s
    // and RE2 \s disagree on U+000B — see Documents' Scaladoc)
    text.split("[ \t\n\r\f]+").iterator.filter(_.nonEmpty).toSet[String].foreach { t =>
      val v = java.lang.Long.parseLong(md5hex(t).substring(0, 8), 16)
      var i = 0
      while (i < 32) {
        if (((v >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 32) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** The 4 byte-bands of a fingerprint, batch scheme verbatim. */
  def bands(fp: Long): Seq[(Int, Int)] =
    Seq.tabulate(4)(i => (i, ((fp >> (8 * i)) & 0xff).toInt))

  def pairs(events: Dataset[DocEvent]): Dataset[NearDup] = {
    implicit val hitEnc = Encoders.product[BandHit]
    implicit val stEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[NearDup]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    events
      .flatMap { e =>
        val fp = simhash32(e.text)
        bands(fp).map { case (bi, bv) => BandHit(bi, bv, fp, e.docId, e.ts) }
      }
      // watermark attaches AFTER the typed flatMap: event-time column
      // metadata does not survive object-level transforms
      .withWatermark("ts", "1 hour")
      .groupByKey(h => (h.bi, h.bv))
      .flatMapGroupsWithState[BucketState, NearDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Int), batch: Iterator[BandHit], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // per-entry horizon pruning: the bucket timeout only fires
            // when a bucket goes completely quiet, so a hot bucket must
            // also evict entries past the horizon or its state grows
            // with stream volume (and matches against years-old docs)
            val horizonFloor = state.getCurrentWatermarkMs() - HorizonMs
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_._3 >= horizonFloor)
            val out = List.newBuilder[NearDup]
            var maxTs = 0L
            // deterministic intra-batch order: event time, then id
            batch.toSeq.sortBy(h => (h.ts.getTime, h.docId)).foreach { h =>
              entries.foreach { case (fp0, id0, _) =>
                if (id0 != h.docId) {
                  val ham = java.lang.Long.bitCount(fp0 ^ h.fp)
                  if (ham <= 2)
                    out += NearDup(math.min(id0, h.docId),
                      math.max(id0, h.docId), ham)
                }
              }
              entries = (h.fp, h.docId, h.ts.getTime) :: entries
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
