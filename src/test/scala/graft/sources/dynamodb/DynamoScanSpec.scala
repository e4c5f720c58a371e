package graft.sources.dynamodb

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Fake data plane: items assigned to segments by stable hash, served
  * in pages of `pageSize` with an opaque numeric cursor — the same
  * contract the AWS Scan API exposes (Segment/TotalSegments +
  * ExclusiveStartKey). Top-level so tasks serialize only the item list,
  * never the enclosing suite. Tracks per-JVM page-fetch counts so the
  * spec can assert laziness (valid under local[*]: tasks run in-JVM). */
private class FakeScanClient(all: Seq[String], pageSize: Int)
    extends DynamoScan.Client {
  def scanPage(table: String, segment: Int, totalSegments: Int,
      exclusiveStartKey: Option[String]): (Seq[String], Option[String]) = {
    FakeScanClient.pages.incrementAndGet()
    val mine = all.filter(i =>
      math.floorMod(i.hashCode, totalSegments) == segment)
    val from = exclusiveStartKey.map(_.toInt).getOrElse(0)
    val page = mine.slice(from, from + pageSize)
    val next =
      if (from + pageSize < mine.length) Some((from + pageSize).toString)
      else None
    (page, next)
  }
}

private object FakeScanClient {
  val pages = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The segment-partitioned parallel Scan: every item exactly once
  * across segments, one task per segment, lazy pagination. */
class DynamoScanSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private val items = (0 until 97).map(i => s"""{"id":{"N":"$i"}}""")

  test("every item exactly once, one partition per segment") {
    val ds = DynamoScan.items(spark, new FakeScanClient(items, pageSize = 7),
      "t", totalSegments = 8)
    assert(ds.rdd.getNumPartitions == 8)
    val got = ds.collect().toSeq
    assert(got.sorted == items.sorted)
    assert(got.distinct.length == got.length)
  }

  test("single segment degrades to the reference's serial scan") {
    val ds = DynamoScan.items(spark, new FakeScanClient(items, pageSize = 10),
      "t", totalSegments = 1)
    assert(ds.collect().toSeq.sorted == items.sorted)
  }

  test("segment scan feeds schema inference unchanged") {
    val ds = DynamoScan.items(spark, new FakeScanClient(items, pageSize = 25),
      "t", totalSegments = 4)
    val t = DynamoInfer.inferTable(ds,
      DynamoInfer.TableMeta("t", "id", None), sampleSize = 1000)
    assert(t.colNames.contains("id"))
  }

  test("pagination is lazy: limit(1) on one segment fetches few pages") {
    FakeScanClient.pages.set(0)
    val ds = DynamoScan.items(spark, new FakeScanClient(items, pageSize = 1),
      "t", totalSegments = 2)
    ds.limit(1).collect()
    // full drain would be ~97 pages; Spark's take path launches one
    // task first, and that task stops pulling after the first rows
    assert(FakeScanClient.pages.get() < 20)
  }
}
