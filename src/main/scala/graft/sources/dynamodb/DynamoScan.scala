package graft.sources.dynamodb

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** S12's full data scan, genuinely distributed: DynamoDB's parallel
  * Scan API shards a table into `TotalSegments` disjoint segments, each
  * drained independently with `Segment=i` + `ExclusiveStartKey`
  * pagination (the reference scans serially with one segment,
  * dynamodb/data.go:64-91 — the Spark shape puts one segment per task).
  *
  * The client seam is serializable so each executor task opens its own
  * connection state; the LIVE implementation is
  * modules/dynamodb's AwsDynamoScanClient (SDK v2 `ScanRequest` with
  * Segment/TotalSegments/ExclusiveStartKey, config-shipping +
  * lazy-per-JVM client, DynamoDB-JSON cursors — compiled only with
  * GRAFT_WITH_AWS_DYNAMO=1, env-gated spec against dynamodb-local).
  * Items cross the seam as DynamoDB-JSON
  * strings, the same wire form [[DynamoInfer]] consumes, so the
  * segment scan drops into schema inference and migration unchanged.
  *
  * Pagination is drained LAZILY inside each task's iterator: a page is
  * fetched only when the previous one is consumed, so a segment never
  * buffers more than one page regardless of table size, and downstream
  * narrow stages (inference histograms, cvtColValue projection) pull
  * items through without materializing the segment.
  */
object DynamoScan {

  /** One Scan page for (table, segment): (items as DynamoDB-JSON,
    * lastEvaluatedKey — None when the segment is exhausted). MUST be
    * Serializable: the client ships to executors; hold config, not
    * connections, and open lazily per task. */
  trait Client extends Serializable {
    def scanPage(table: String, segment: Int, totalSegments: Int,
        exclusiveStartKey: Option[String]): (Seq[String], Option[String])
  }

  /** The table's items as a Dataset with exactly `totalSegments`
    * partitions — one parallel-Scan segment per task. */
  def items(spark: SparkSession, client: Client, table: String,
      totalSegments: Int): Dataset[String] = {
    require(totalSegments > 0, "totalSegments must be positive")
    val rdd = spark.sparkContext
      .parallelize(0 until totalSegments, totalSegments)
      .mapPartitions { segs =>
        segs.flatMap { seg =>
          new Iterator[Seq[String]] {
            private var cursor: Option[String] = None
            private var first = true
            override def hasNext: Boolean = first || cursor.nonEmpty
            override def next(): Seq[String] = {
              first = false
              val (items, next) =
                client.scanPage(table, seg, totalSegments, cursor)
              cursor = next
              items
            }
          }.flatten
        }
      }
    spark.createDataset(rdd)(Encoders.STRING)
  }
}
