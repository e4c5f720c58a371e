package graft.sources.jsonl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document ingest/export — the lingua franca of training-data
  * interchange (every public corpus release ships as JSON lines).
  * Catalyst's json reader does the heavy lifting (schema projection,
  * predicate pushdown-friendly splits — a JSONL directory is line-
  * splittable, so a 100 TB drop parallelizes for free); this wrapper
  * adds the library's quarantine posture: malformed lines land in a
  * bad-rows frame with the offending raw text, exactly like the dump
  * readers' ragged-row handling, instead of silently becoming
  * all-NULL rows or failing the job. */
object JsonlDocs {

  /** The documents-table schema (doc_id, text, lang, source). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** (good, quarantine): good rows carry the typed columns; quarantine
    * carries the raw malformed line. A line parses "good" only if the
    * corrupt-record column is null AND the required id is present —
    * Spark's PERMISSIVE mode nulls every field of a broken line, which
    * without the id check would quarantine nothing. */
  def read(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("__corrupt", StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "__corrupt")
      .json(path)
    val idCol = schema.fields.head.name
    val good = raw.filter(col("__corrupt").isNull && col(idCol).isNotNull)
      .select(schema.fields.map(f => col(f.name)).toIndexedSeq: _*)
    val bad = raw.filter(col("__corrupt").isNotNull || col(idCol).isNull)
      .select(col("__corrupt").as("raw_line"))
    (good, bad)
  }

  /** Export as a JSONL shard directory (distributed — the shape corpus
    * releases actually take; one file per partition). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
