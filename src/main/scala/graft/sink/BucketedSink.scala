package graft.sink

import org.apache.spark.sql.DataFrame

/** Bucketed, sort-ordered parquet sink for co-located joins — the
  * 100 TB pattern where one up-front shuffle is amortized over every
  * future join/aggregation on the key.
  *
  * A migrated fact table (lineitem, events) is re-read and re-joined
  * constantly downstream; written flat, every one of those joins pays a
  * full shuffle of the big side. Written with `bucketBy(n, key)` +
  * `sortBy(key)`, the data lands hash-partitioned and sorted on disk,
  * and Spark's scan reports the bucketing as its output partitioning —
  * a join of two tables bucketed the same way plans as a SortMergeJoin
  * with NO Exchange on either side (BucketedJoinSpec pins this against
  * the physical plan).
  *
  * Bucket-count discipline at scale: buckets are per-table-global (each
  * bucket is one file per write task), so pick counts that divide evenly
  * into likely cluster parallelism (e.g. 4096 for a 1000-executor
  * cluster) and keep co-joined tables on the SAME count — mismatched
  * counts fall back to shuffling the smaller side.
  *
  * Spark constraint: bucketed writes go through the session catalog
  * (`saveAsTable`), not a bare path — the bucketing metadata lives in
  * the table definition, which is exactly why reads get the
  * partitioning guarantee for free.
  */
object BucketedSink {

  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int, mode: String = "overwrite"): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName) // managed: lives under spark.sql.warehouse.dir
}
