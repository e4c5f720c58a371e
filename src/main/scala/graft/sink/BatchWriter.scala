package graft.sink

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.{CollectionAccumulator, LongAccumulator}
import scala.collection.mutable

/** Batched sink with error-isolating split-retry (the reference's K1,
  * spanner/batchwriter.go:52-317, studied via its test contract in
  * batchwriter_test.go:32-234 — not copied; the concurrency model is
  * re-shaped for Spark below).
  *
  * Semantics preserved:
  *   - batches cut at 10,000 mutations / 20 MB (batchwriter.go:35-38,
  *     conservative halves of Spanner's 20k/100MB limits);
  *   - a failed batch is split into 10 sub-batches and retried
  *     recursively until single bad rows are isolated
  *     (batchwriter.go:268-279), bounded by a retry budget (1000);
  *   - dropped-row counts per table + a bounded sample of bad rows.
  *
  * Concurrency re-shaped: the reference runs ≤40 writer goroutines fed
  * by a single-threaded parser. In Spark the executor/task boundary IS
  * the concurrency — each partition runs one BatchWriter synchronously,
  * and parallelism = partition count (cap it by repartitioning before
  * the sink, not with an in-writer semaphore). Backpressure is inherent:
  * a task's next batch isn't built until its previous write returns.
  */
final class BatchWriter(
    write: Seq[MutRow] => Unit,
    countThreshold: Int = BatchWriter.CountThreshold,
    byteThreshold: Long = BatchWriter.ByteThreshold,
    retryLimit: Long = BatchWriter.RetryLimit,
    sampleBadRowLimit: Int = BatchWriter.SampleBadRows) {

  private val buf = mutable.ArrayBuffer.empty[MutRow]
  private var bufBytes = 0L
  private var retries = 0L

  /** table → dropped-row count (read after flush). */
  val droppedRows: mutable.Map[String, Long] =
    mutable.Map.empty.withDefaultValue(0L)
  /** error message → count. */
  val errors: mutable.Map[String, Long] =
    mutable.Map.empty.withDefaultValue(0L)
  /** bounded sample of rows that generated errors. */
  val sampleBadRows: mutable.ArrayBuffer[MutRow] = mutable.ArrayBuffer.empty

  def addRow(r: MutRow): Unit = {
    buf += r
    bufBytes += r.byteSize
    if (buf.length >= countThreshold || bufBytes >= byteThreshold) flush()
  }

  /** Write out whatever is buffered (call at partition end). */
  def flush(): Unit = {
    if (buf.nonEmpty) {
      val batch = buf.toSeq
      buf.clear()
      bufBytes = 0
      writeWithRetry(batch)
    }
  }

  private def writeWithRetry(rows: Seq[MutRow]): Unit = {
    try write(rows)
    catch {
      case e: Exception =>
        errors(Option(e.getMessage).getOrElse(e.getClass.getName)) += 1
        val hitLimit = retries >= retryLimit
        if (rows.length > 1 && !hitLimit) {
          // split into 10 pieces to isolate the bad row(s); good rows
          // in the batch still get written
          val k = 1 + rows.length / 10
          rows.grouped(k).foreach { sub =>
            retries += 1
            writeWithRetry(sub)
          }
        } else {
          rows.foreach { r =>
            droppedRows(r.table) += 1
            if (sampleBadRows.length < sampleBadRowLimit) sampleBadRows += r
          }
        }
    }
  }
}

/** One mutation-shaped row (reference: batchwriter.go:65-69). */
final case class MutRow(table: String, cols: Seq[String], vals: Seq[Any]) {
  /** Cheap byte estimate for batch cutting (mirrors the reference's
    * estimate: value payload, not exact proto size). */
  def byteSize: Long = vals.map {
    case null         => 1L
    case s: String    => s.length.toLong
    case b: Array[Byte] => b.length.toLong
    case s: Seq[_]    => 8L * (s.length + 1)
    case _            => 8L
  }.sum + 8L
}

object BatchWriter {
  val CountThreshold = 10000          // mutations per batch (Spanner limit 20k)
  val ByteThreshold = 20L * 1024 * 1024 // bytes per batch (Spanner limit 100MB)
  val RetryLimit = 1000L
  val SampleBadRows = 100

  /** Sink a DataFrame through per-partition BatchWriters. `write` is the
    * injectable write closure (a Spanner client apply in production, a
    * recording fake in tests — exactly the reference's seam). Dropped
    * rows and errors are surfaced through Spark accumulators so the
    * driver-side report can aggregate them across tasks. */
  def sinkDataFrame(
      df: DataFrame,
      table: String,
      write: Seq[MutRow] => Unit,
      dropped: LongAccumulator,
      badSample: CollectionAccumulator[String],
      countThreshold: Int = CountThreshold,
      byteThreshold: Long = ByteThreshold): Unit = {
    val cols = df.columns.toSeq
    df.foreachPartition { (it: Iterator[Row]) =>
      val bw = new BatchWriter(write, countThreshold, byteThreshold)
      it.foreach(r => bw.addRow(MutRow(table, cols, r.toSeq)))
      bw.flush()
      bw.droppedRows.values.foreach(dropped.add)
      bw.sampleBadRows.take(10).foreach(r => badSample.add(r.toString))
    }
  }
}
