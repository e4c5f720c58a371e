package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** BatchWriter contract tests (the reference's batchwriter_test.go:32-234
  * cases re-expressed): batch cutting at both thresholds, bad-row
  * isolation via split-retry, retry-budget exhaustion, and the
  * distributed foreachPartition sink. */
class BatchWriterSpec extends AnyFunSuite {

  private def row(table: String, v: Long): MutRow =
    MutRow(table, Seq("a"), Seq(v))

  test("batches cut at count threshold; flush writes the tail") {
    val batches = mutable.ArrayBuffer.empty[Int]
    val bw = new BatchWriter(rows => batches += rows.length,
      countThreshold = 10, byteThreshold = Long.MaxValue)
    (1 to 25).foreach(i => bw.addRow(row("t", i)))
    bw.flush()
    assert(batches.toSeq === Seq(10, 10, 5))
    assert(bw.droppedRows.isEmpty)
  }

  test("batches cut at byte threshold") {
    val batches = mutable.ArrayBuffer.empty[Long]
    val bw = new BatchWriter(rows => batches += rows.map(_.byteSize).sum,
      countThreshold = Int.MaxValue, byteThreshold = 64)
    (1 to 12).foreach(i => bw.addRow(row("t", i))) // 16 bytes each
    bw.flush()
    assert(batches.forall(_ <= 80)) // threshold + one row slack
    assert(batches.sum === 12 * 16)
  }

  test("split-retry isolates single bad rows; good rows all written") {
    val written = mutable.ArrayBuffer.empty[Long]
    val bad = Set(7L, 13L, 99L)
    val write: Seq[MutRow] => Unit = rows => {
      if (rows.exists(r => bad(r.vals.head.asInstanceOf[Long])))
        throw new RuntimeException("bad row in batch")
      written ++= rows.map(_.vals.head.asInstanceOf[Long])
    }
    val bw = new BatchWriter(write, countThreshold = 100,
      byteThreshold = Long.MaxValue)
    (1L to 100L).foreach(i => bw.addRow(row("t", i)))
    bw.flush()
    assert(written.sorted === (1L to 100L).filterNot(bad).sorted)
    assert(bw.droppedRows("t") === 3)
    assert(bw.sampleBadRows.map(_.vals.head).toSet === bad.map(x => x: Any))
    assert(bw.errors.values.sum > 0)
  }

  test("retry budget: exhausted budget drops the rest of the batch whole") {
    var calls = 0
    val write: Seq[MutRow] => Unit = _ => { calls += 1; throw new RuntimeException("down") }
    val bw = new BatchWriter(write, countThreshold = 1000,
      byteThreshold = Long.MaxValue, retryLimit = 5)
    (1L to 1000L).foreach(i => bw.addRow(row("t", i)))
    bw.flush()
    // every row eventually dropped, but with a bounded number of calls
    // (without a budget the full split tree would make >1000 calls;
    // already-queued sub-batches still cost one call each before being
    // dropped whole, so the bound is loose but small)
    assert(bw.droppedRows("t") === 1000)
    assert(calls <= 100)
  }

  test("empty flush is a no-op; single-row failure drops exactly that row") {
    val bw0 = new BatchWriter(_ => fail("write must not be called"))
    bw0.flush()
    val bw = new BatchWriter(_ => throw new RuntimeException("nope"))
    bw.addRow(row("t", 1))
    bw.flush()
    assert(bw.droppedRows("t") === 1)
    assert(bw.sampleBadRows.length === 1)
  }

  test("foreachPartition sink: all rows reach the write closure, dropped counted") {
    val spark = graft.GraftSession.build("graft-test")
    import spark.implicits._
    val df = (1L to 500L).toDF("a").repartition(8)
    val dropped = spark.sparkContext.longAccumulator("dropped")
    val badSample = spark.sparkContext.collectionAccumulator[String]("bad")
    BatchWriter.sinkDataFrame(df, "t", rows => {
      if (rows.exists(_.vals.head.asInstanceOf[Long] % 97 == 0))
        throw new RuntimeException("unlucky")
      TestSink.synchronized { TestSink.written ++= rows.map(_.vals.head.asInstanceOf[Long]) }
    }, dropped, badSample, countThreshold = 50)
    // 97, 194, 291, 388, 485 dropped
    assert(dropped.value === 5)
    assert(TestSink.written.size === 495)
    assert(!badSample.value.isEmpty)
  }
}

/** JVM-local recording sink for the local[*] foreachPartition test. */
object TestSink {
  val written: scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty
}
