package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** A dump file as (line, idx) — ONE distributed text scan shared by the
  * schema pass (boundary discovery) and every table's data read. The
  * index is the global 0-based line number (zipWithIndex is deterministic
  * per file: partition order follows byte offsets). */
object DumpLines {
  def indexed(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.textFile(path).zipWithIndex()
      .map { case (l, i) => Row(l, i) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("line", StringType), StructField("idx", LongType))))
  }
}
