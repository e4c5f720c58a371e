package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming exact-dedup with explicit keyed state — the d01 batch
  * operator running continuously via `flatMapGroupsWithState`: the first
  * document carrying each content hash passes through, later copies are
  * dropped, and state for a hash expires once the watermark moves past
  * its timeout (so state size tracks the dedup horizon, not the stream
  * length — the property that keeps this viable on an unbounded 100 TB
  * ingest).
  */
object StatefulDedup {

  final case class DocEvent(ts: Timestamp, docId: Long, text: String)
  final case class Seen(firstId: Long)
  final case class Unique(hash: String, docId: Long, ts: Timestamp)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Dedup horizon: how long a hash stays "seen" after the watermark. */
  val HorizonMs: Long = 24L * 3600 * 1000

  def dedup(events: Dataset[DocEvent]): Dataset[Unique] = {
    implicit val seenEnc = Encoders.product[Seen]
    implicit val outEnc = Encoders.product[Unique]
    implicit val strEnc = Encoders.STRING
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(e => md5hex(e.text))
      .flatMapGroupsWithState[Seen, Unique](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (hash: String, batch: Iterator[DocEvent], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // later copies dropped
          } else {
            val first = batch.minBy(e => (e.ts.getTime, e.docId))
            state.update(Seen(first.docId))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), first.ts.getTime) + HorizonMs)
            Iterator.single(Unique(hash, first.docId, first.ts))
          }
      }
  }
}
