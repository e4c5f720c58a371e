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
    val raw = rawRead(spark, path, schema)
    (goodOf(raw, schema), raw.filter(badCond(schema))
      .select(col("__corrupt").as("raw_line")))
  }

  /** read() plus both counts from ONE whole-corpus parse: the
    * permissive frame is cached just long enough for a single
    * (total, bad) aggregation — quarantine ACCOUNTING (Curate's
    * ingest) otherwise pays one full re-parse per count. Returns
    * (good frame, good count, bad count); the good frame recomputes
    * lazily downstream like read()'s. */
  def readCounted(spark: SparkSession, path: String,
      schema: StructType = documentsSchema): (DataFrame, Long, Long) = {
    val raw = rawRead(spark, path, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val r = raw.agg(count(lit(1)).as("n"),
        sum(when(badCond(schema), 1L).otherwise(0L)).as("nbad")).head()
      val total = r.getLong(0)
      val nBad = if (r.isNullAt(1)) 0L else r.getLong(1) // sum over 0 rows
      (goodOf(raw, schema), total - nBad, nBad)
    } finally { raw.unpersist(blocking = false); () }
  }

  private def rawRead(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(StructType(
        schema.fields :+ StructField("__corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "__corrupt")
      .json(path)

  private def badCond(schema: StructType) =
    col("__corrupt").isNotNull || col(schema.fields.head.name).isNull

  private def goodOf(raw: DataFrame, schema: StructType): DataFrame =
    raw.filter(!badCond(schema))
      .select(schema.fields.map(f => col(f.name)).toIndexedSeq: _*)

  /** Export as a JSONL shard directory (distributed — the shape corpus
    * releases actually take; one file per partition). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
