package graft.sources.jdbc

import org.apache.spark.sql.SparkSession
import graft.schema.{DdlRender, SchemaConverter}
import graft.types.{MySqlTypeMapper, PostgresTypeMapper}

/** Live-database migration driver: the S6–S9 composition a user points
  * at a real PostgreSQL/MySQL instead of a dump file — information_schema
  * scan through the JDBC catalog (S6/S8), conversion plan, schema
  * artifacts, then a distributed `spark.read.jdbc` data pass per table
  * (S7/S9) projected onto the Spanner schema (C13) and written to the
  * parquet stand-in sink, exactly [[graft.Migrate]]'s shape with the
  * dump reader swapped for the live catalog.
  *
  * Reference lifecycle: cmd/cmd.go drives the same pair of passes when
  * given `-source=postgres -source-profile=...` instead of a dump; its
  * integration coverage is testing/postgres/integration_test.go:220-348
  * and testing/mysql/integration_test.go — mirrored here by the
  * env-gated JdbcIntegrationSpec (skips without GRAFT_TESTS_PG_URL /
  * GRAFT_TESTS_MYSQL_URL; needs the vendor JDBC driver jar on the
  * session classpath, e.g. dropped into the Spark jars dir).
  *
  * `partitionHints` names a numeric column per SOURCE table to split
  * its read `numPartitions`-ways (S7's parallel scan); tables without a
  * hint read as a single JDBC cursor — correct, but serial, so hint
  * every big table. Stride bounds come from `partitionBounds` when the
  * caller knows the key range, otherwise from a per-table MIN/MAX probe
  * inside [[JdbcData.readTable]] — one cheap extra query that keeps a
  * serial PK (values ≪ any fixed guess) from collapsing all rows into
  * stride 0 and serializing the very read this path exists to
  * parallelize.
  */
object JdbcMigrate {

  /** MySQL's catalog schemas (never migrated — P2's MySQL face; the
    * reference scopes by the connection's database instead). */
  val MySqlSystemSchemas: Set[String] =
    Set("information_schema", "mysql", "performance_schema", "sys")

  final case class Result(tables: Map[String, Long],
      plan: SchemaConverter.ConversionPlan)

  def run(spark: SparkSession, driver: String, url: String,
      props: java.util.Properties, dbName: Option[String], outDir: String,
      partitionHints: Map[String, String] = Map.empty,
      numPartitions: Int = 8,
      partitionBounds: Map[String, (Long, Long)] = Map.empty): Result = {
    val (cat, mapper, sysSchemas) = driver match {
      case "postgres" =>
        (new PgJdbcCatalog(spark, url, props), PostgresTypeMapper,
          InfoSchema.PgSystemSchemas)
      case "mysql" =>
        val db = dbName.getOrElse(throw new IllegalArgumentException(
          "mysql migration needs the database name"))
        (new MySqlJdbcCatalog(spark, url, props, db), MySqlTypeMapper,
          MySqlSystemSchemas)
      case other => throw new IllegalArgumentException(s"unknown driver $other")
    }
    // schema pass: catalog rows → source schema → conversion plan →
    // artifacts (same order as Migrate: schema files land before any
    // data moves, so a failed data pass still leaves a usable plan)
    val (tables, order) = InfoSchema.readSchema(cat, sysSchemas)
    val plan = SchemaConverter.convert(mapper, tables, order)
    val hc = spark.sessionState.newHadoopConf()
    graft.util.Fs.mkdirs(outDir, hc)
    DdlRender.writeSchemaFile(plan.spSchema, s"$outDir/schema.ddl.txt", pretty = true, hc)
    DdlRender.writeSchemaFile(plan.spSchema, s"$outDir/schema.ddl.sql", pretty = false, hc)
    graft.plan.SessionFile.write(plan, s"$outDir/session.json", hc)

    // data pass: one distributed JDBC read per table, typed rows cast +
    // renamed onto the Spanner schema, parquet per table. PG identifiers
    // are double-quoted segment-by-segment (the catalog returns exact
    // names, so "Order" or "user table" must not be re-folded by the
    // server); the MySQL path backtick-quotes inside readMySqlTable.
    // Caveat shared with TableId.qualified: a table name containing a
    // literal '.' is indistinguishable from schema-qualification here.
    def pgQuote(qualified: String): String =
      qualified.split("\\.", 2)
        .map(seg => "\"" + seg.replace("\"", "\"\"") + "\"").mkString(".")
    val counts = order.map { src =>
      val srcTable = tables(src)
      val df = driver match {
        case "mysql" => JdbcData.readMySqlTable(spark, url, props, srcTable,
          partitionHints.get(src), numPartitions, partitionBounds.get(src))
        case _ => JdbcData.readTable(spark, url, props, pgQuote(src),
          partitionHints.get(src), numPartitions, partitionBounds.get(src))
      }
      val sp = plan.toSpannerTable(src)
      JdbcData.toSpanner(df, plan, src)
        .write.mode("overwrite").parquet(s"$outDir/$sp.parquet")
      sp -> spark.read.parquet(s"$outDir/$sp.parquet").count()
    }.toMap
    Result(counts, plan)
  }
}
