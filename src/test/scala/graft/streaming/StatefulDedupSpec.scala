package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.GraftSession
import java.sql.Timestamp

/** flatMapGroupsWithState dedup: first copy passes, later copies drop,
  * including across triggers (state persists between batches). */
class StatefulDedupSpec extends AnyFunSuite {
  import StatefulDedup._
  private lazy val spark = GraftSession.build("graft-test")

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("cross-batch exact dedup with keyed state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val q = dedup(in.toDS).writeStream
      .format("memory").queryName("uniq").outputMode("append").start()
    try {
      in.addData(
        DocEvent(ts(1), 10L, "alpha"),
        DocEvent(ts(2), 11L, "alpha"),  // same-batch dup
        DocEvent(ts(3), 12L, "beta"))
      q.processAllAvailable()
      in.addData(
        DocEvent(ts(4), 13L, "alpha"),  // cross-batch dup
        DocEvent(ts(5), 14L, "gamma"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT docId, hash FROM uniq ORDER BY docId")
        .collect().map(_.getLong(0))
      // alpha kept once (earliest id), beta + gamma once each
      assert(rows.toSeq === Seq(10L, 12L, 14L))
    } finally q.stop()
  }
}
