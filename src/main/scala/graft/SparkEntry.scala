package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query (and, where
  * SQL-expressible, its DuckDB oracle) from the per-domain modules under
  * graft.queries.
  */
object SparkEntry {

  /** All query modules, each contributing name → QueryDef. */
  private def modules: Seq[Map[String, QueryDef]] = Seq(
    Relational.defs,
    Documents.defs,
    Similarity.defs,
    PgDumpQueries.defs,
    MySqlDumpQueries.defs,
    JsonlQueries.defs,
    TextMedia.defs,
    Curation.defs
  )

  private lazy val all: Map[String, QueryDef] = modules.reduce(_ ++ _)

  /** Full defs (Verify consults oracleMaxSf; tools consult headline). */
  def defs: Map[String, QueryDef] = all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_pricing_summary").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, d) => name -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, d) if d.oracle.isDefined =>
      val sql = d.oracle.get
      name -> sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
    }

  /** Subset of queries used by Bench as the headline perf set. */
  def headlines: Seq[String] =
    all.collect { case (name, d) if d.headline => name }.toSeq.sorted
}
