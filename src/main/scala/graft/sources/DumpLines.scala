package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** A dump file as (line, idx) — ONE distributed text scan shared by the
  * schema pass (boundary discovery) and every table's data read. The
  * index is the global 0-based line number (zipWithIndex is deterministic
  * per file: partition order follows byte offsets). */
/** Byte-chunk sizing shared by the dump V2 sources: one split per core
  * for small inputs (the downstream stage inherits scan parallelism —
  * DumpLines' rationale), capped by the session's
  * `spark.sql.files.maxPartitionBytes` at real scale, floored at 64 KB;
  * an explicit `chunkBytes` option overrides (tests use tiny chunks to
  * force many partitions). */
object DumpChunks {
  def step(totalBytes: Long, chunkBytes: Option[Long],
      spark: SparkSession): Long =
    chunkBytes.getOrElse {
      val perCore =
        totalBytes / math.max(1, spark.sparkContext.defaultParallelism) + 1
      math.max(64L * 1024,
        math.min(spark.sessionState.conf.filesMaxPartitionBytes, perCore))
    }
}

object DumpLines {
  def indexed(spark: SparkSession, rawPath: String): DataFrame = {
    // gzip'd dumps inflate to scratch first (DumpCodec): Hadoop would
    // read the .gz correctly but as ONE unsplittable partition,
    // silently serializing the whole downstream codegen stage
    val path = DumpCodec.materialize(spark, rawPath)
    // one split per core, not Hadoop's size-based default (1-2 splits
    // for a tens-of-MB dump): the whole scan→split→unescape→cast stage
    // AND boundary discovery inherit this parallelism, and text input
    // splits on line boundaries so zipWithIndex stays byte-ordered.
    // At the 100 GB envelope the size-based split count exceeds the
    // core count and the max() changes nothing.
    val rdd = spark.sparkContext.textFile(path,
        spark.sparkContext.defaultParallelism).zipWithIndex()
      .map { case (l, i) => Row(l, i) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("line", StringType), StructField("idx", LongType))))
  }
}
