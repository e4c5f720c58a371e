package graft

import org.apache.spark.sql.SparkSession
import graft.plan.SessionFile
import graft.report.Report
import graft.schema.DdlRender
import graft.sink.DdlSink

/** The end-to-end migration CLI (reference lifecycle §3.1/§3.2 of
  * SURVEY.md, cmd/cmd.go:39-92 re-shaped): schema pass → plan → DDL +
  * session artifacts → distributed data pass → per-table parquet (the
  * Spanner stand-in sink) + quarantine side output → report.
  *
  * Usage: runMain graft.Migrate <pgdump|mysqldump> <dumpFile> <outDir>
  *
  * Artifacts written to outDir:
  *   <table>.parquet        migrated rows, Spanner names/types
  *   <table>.bad.parquet    quarantined source rows (only if non-empty)
  *   schema.ddl.txt         pretty DDL (comments)
  *   schema.ddl.sql         legal DDL (quoted ids, no comments)
  *   fk_backfill.sql        post-load ALTERs (K3 batch)
  *   session.json           full plan for a later data-only run
  *   report.txt             conversion summary + per-table analysis
  */
object Migrate {

  final case class Result(tables: Map[String, (Long, Long)], report: String)

  def run(spark: SparkSession, driver: String, dumpFile: String,
      outDir: String): Result = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val (tables, plan, stmtStats) = driver match {
      case "pgdump" =>
        val m = graft.sources.pgdump.PgDumpReader.migrate(spark, dumpFile)
        (m.tables, m.plan, m.dump.statementStats)
      case "mysqldump" =>
        val m = graft.sources.mysqldump.MySqlDumpReader.migrate(spark, dumpFile)
        (m.tables, m.plan, m.dump.statementStats)
      case other => throw new IllegalArgumentException(s"unknown driver $other")
    }

    // Schema artifacts first (the reference emits them before data so a
    // failed data pass still leaves usable schema files).
    DdlRender.writeSchemaFile(plan.spSchema, s"$outDir/schema.ddl.txt", pretty = true)
    DdlRender.writeSchemaFile(plan.spSchema, s"$outDir/schema.ddl.sql", pretty = false)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/fk_backfill.sql"),
      DdlSink.fkBackfillStatements(plan.spSchema).mkString("", ";\n", ";\n"))
    SessionFile.write(plan, s"$outDir/session.json")

    // Data pass: one write job per table (parquet stands in for the
    // Spanner BatchWriter sink; swap sinkDataFrame in for live writes).
    tables.foreach { case (name, (good, _)) =>
      good.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    Report.writeQuarantine(tables, outDir)

    val stats = Report.tableStats(tables)
    val report = Report.render(driver, plan, stats, stmtStats)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/report.txt"), report)
    Result(stats.map { case (t, s) => t -> (s.rows, s.badRows) }, report)
  }

  def main(args: Array[String]): Unit = {
    val Array(driver, dumpFile, outDir) = args.take(3)
    val spark = GraftSession.build("graft-migrate")
    val r = run(spark, driver, dumpFile, outDir)
    println(r.report)
    spark.stop()
  }
}
