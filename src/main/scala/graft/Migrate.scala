package graft

import org.apache.spark.sql.SparkSession
import graft.plan.SessionFile
import graft.report.{ProgressReporter, Report}
import graft.schema.DdlRender
import graft.sink.DdlSink

/** The end-to-end migration CLI (reference lifecycle §3.1/§3.2 of
  * SURVEY.md, cmd/cmd.go:39-92 re-shaped): schema pass → plan → DDL +
  * session artifacts → distributed data pass → per-table parquet (the
  * Spanner stand-in sink) + quarantine side output → report.
  *
  * Usage: runMain graft.Migrate <pgdump|mysqldump> <dumpFile> <outDir>
  *        [full|schema-only|data-only] [--prefix=<p>] [-v|--verbose]
  *        [--skip-foreign-keys] [--session=<path>]
  *
  * --skip-foreign-keys (reference -skip-foreign-keys, main.go:59):
  * skip the post-load FK-creation phase (K3's serial ALTER batch, the
  * stand-in for conversion.go's UpdateDDLForeignKeys at cmd.go:82-87);
  * fk_backfill.sql is still written so the ALTERs can be applied
  * separately — the reference's flag text makes the same promise for
  * its schema file. Refused together with schema-only (main.go:99-100:
  * FK creation can only be skipped when data migration takes place).
  *
  * --prefix (reference -prefix, main.go:53): prepended to every
  * GENERATED artifact name (schema.ddl.*, fk_backfill.sql,
  * session.json, report.txt) — the reference uses it to namespace the
  * files it emits beside the migration; table data and quarantine
  * parquet are the Spanner-write stand-in, not generated files, so
  * they stay unprefixed. A data-only run restores the session from the
  * SAME prefix it was written under.
  * -v (reference -v, main.go:56): per-statement ingest stats and a
  * per-table row/quarantine line on the progress channel.
  *
  * Staged runs (reference -schema-only / -data-only flags, main.go:35-63
  * + cmd.go:57-63): schema-only stops after the plan artifacts;
  * data-only restores the plan from outDir/session.json — schema edits
  * applied to the session (PlanEdits) carry into the data pass — and
  * runs only the data migration.
  *
  * --session=<path> (reference -session, main.go:60: "specifies the
  * file we restore session state from"): a data-only run restores the
  * plan from an EXPLICIT session file instead of assuming
  * outDir/session.json — the reference's "convert on one machine, load
  * from another dir" workflow. Ignored outside data-only mode, exactly
  * like the reference (its flag is read only on the dataOnly branch).
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

  /** Job-description prefix that turns on the console progress meter for
    * a data-pass job (reference UX: internal/progress.go). */
  val ProgressPrefix = "Writing data for table "

  def run(spark: SparkSession, driver: String, dumpFile: String,
      outDir: String, mode: String = "full",
      progressOut: String => Unit = println,
      filePrefix: String = "", verbose: Boolean = false,
      skipForeignKeys: Boolean = false,
      fkExec: String => Unit = _ => (),
      sessionPath: Option[String] = None): Result = {
    require(Set("full", "schema-only", "data-only").contains(mode), mode)
    // reference main.go:99-100: FK creation can only be skipped when a
    // data migration takes place
    require(!(skipForeignKeys && mode == "schema-only"),
      "can't use both schema-only and skip-foreign-keys at once")
    val hc = spark.sessionState.newHadoopConf()
    graft.util.Fs.mkdirs(outDir, hc)
    val defaultSession = s"$outDir/${filePrefix}session.json"
    // data-only: the session file (possibly edited since the schema run)
    // is the source of truth for the target schema and name maps;
    // --session points the restore at a foreign dir's file.
    val planOverride =
      if (mode == "data-only")
        Some(SessionFile.read(sessionPath.getOrElse(defaultSession), hc))
      else None

    val (tables, plan, stmtStats, release) = driver match {
      case "pgdump" =>
        val m = graft.sources.pgdump.PgDumpReader.migrate(spark, dumpFile, planOverride)
        (m.tables, m.plan, m.dump.statementStats, m.release)
      case "mysqldump" =>
        val m = graft.sources.mysqldump.MySqlDumpReader.migrate(spark, dumpFile, planOverride)
        (m.tables, m.plan, m.dump.statementStats, m.release)
      case other => throw new IllegalArgumentException(s"unknown driver $other")
    }

    // the dump-line cache lives exactly as long as this run: released
    // after the last sink materializes (or on failure) so a 100 GB dump
    // doesn't stay pinned in block-manager storage for the session
    try {
    if (verbose)
      stmtStats.toSeq.sortBy(_._1).foreach { case (kind, n) =>
        progressOut(s"statements: $kind = $n")
      }
    if (mode != "data-only") {
      // Schema artifacts first (the reference emits them before data so a
      // failed data pass still leaves usable schema files).
      DdlRender.writeSchemaFile(plan.spSchema, s"$outDir/${filePrefix}schema.ddl.txt", pretty = true, hc)
      DdlRender.writeSchemaFile(plan.spSchema, s"$outDir/${filePrefix}schema.ddl.sql", pretty = false, hc)
      graft.util.Fs.writeStringAtomic(s"$outDir/${filePrefix}fk_backfill.sql",
        DdlSink.fkBackfillStatements(plan.spSchema).mkString("", ";\n", ";\n"), hc)
      SessionFile.write(plan, defaultSession, hc)
    }
    if (mode == "schema-only") {
      val report = Report.render(driver, plan, Map.empty, stmtStats)
      graft.util.Fs.writeStringAtomic(s"$outDir/${filePrefix}report.txt", report, hc)
      return Result(Map.empty, report)
    }

    // Data pass: one write job per table (parquet stands in for the
    // Spanner BatchWriter sink; swap sinkDataFrame in for live writes).
    // Each write is labeled so the progress listener can meter it
    // (reference: internal/progress.go percent lines per table).
    val progress = new ProgressReporter(ProgressPrefix, progressOut)
    spark.sparkContext.addSparkListener(progress)
    try {
      tables.foreach { case (name, (good, _)) =>
        spark.sparkContext.setJobDescription(ProgressPrefix + name)
        try good.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
        finally spark.sparkContext.setJobDescription(null)
      }
      Report.writeQuarantine(tables, outDir)
    } finally {
      progress.drain(expectedJobs = tables.size)
      spark.sparkContext.removeSparkListener(progress)
    }

    // Post-load FK creation (reference cmd.go:82-87: UpdateDDLForeignKeys
    // runs after DataConv unless -skip-foreign-keys). `fkExec` is the
    // DDL endpoint seam — a no-op against the parquet stand-in, the
    // Spanner admin client in the live glue (SpannerClientSink
    // .updateDdlForeignKeys shares DdlSink.applySerially).
    if (!skipForeignKeys) {
      val fks = DdlSink.fkBackfillStatements(plan.spSchema)
      if (fks.nonEmpty)
        DdlSink.applySerially(fks, fkExec,
          (i, n) => progressOut(s"foreign keys: applied $i/$n"))
    } else progressOut(
      "skipping foreign key creation (fk_backfill.sql written for separate apply)")

    val stats = Report.tableStats(tables)
    if (verbose)
      stats.toSeq.sortBy(_._1).foreach { case (t, s) =>
        progressOut(s"table $t: ${s.rows} rows written, ${s.badRows} quarantined")
      }
    val report = Report.render(driver, plan, stats, stmtStats)
    graft.util.Fs.writeStringAtomic(s"$outDir/${filePrefix}report.txt", report, hc)
    Result(stats.map { case (t, s) => t -> (s.rows, s.badRows) }, report)
    } finally release()
  }

  /** The reference's headline invocation — `pg_dump mydb |
    * harbourbridge` (conversion/conversion.go:377-406): a non-seekable
    * input stream is teed ONCE to a scratch file (DumpCodec's layout;
    * gzip'd streams land compressed and inflate through the normal
    * sniffing path), then the unchanged two-pass pipeline runs against
    * the seekable copy. Artifacts are identical to a path-based run
    * (MigrateSpec pins this); the scratch copy is dropped afterwards. */
  def runStream(spark: SparkSession, driver: String, in: java.io.InputStream,
      outDir: String, mode: String = "full",
      progressOut: String => Unit = println,
      filePrefix: String = "", verbose: Boolean = false,
      skipForeignKeys: Boolean = false,
      fkExec: String => Unit = _ => (),
      sessionPath: Option[String] = None): Result = {
    val scratch = graft.sources.DumpCodec.materializeStream(spark, in)
    try run(spark, driver, scratch, outDir, mode, progressOut, filePrefix,
      verbose, skipForeignKeys, fkExec, sessionPath)
    finally graft.sources.DumpCodec.dropScratch(spark, scratch)
  }

  def main(args: Array[String]): Unit = {
    // flags may appear anywhere (the reference uses Go's flag package);
    // the positional contract stays <driver> <dumpFile> <outDir> [mode]
    val (flags, pos) = args.partition(a => a.startsWith("-") && a != "-")
    val filePrefix = flags.collectFirst {
      case f if f.startsWith("--prefix=") => f.stripPrefix("--prefix=")
      case f if f.startsWith("-prefix=") => f.stripPrefix("-prefix=")
    }.getOrElse("")
    val verbose = flags.exists(Set("-v", "--verbose"))
    val skipFks = flags.exists(
      Set("-skip-foreign-keys", "--skip-foreign-keys"))
    val sessionPath = flags.collectFirst {
      case f if f.startsWith("--session=") => f.stripPrefix("--session=")
      case f if f.startsWith("-session=") => f.stripPrefix("-session=")
    }
    val unknown = flags.filterNot(f => f.startsWith("--prefix=") ||
      f.startsWith("-prefix=") || f == "-v" || f == "--verbose" ||
      f == "-skip-foreign-keys" || f == "--skip-foreign-keys" ||
      f.startsWith("--session=") || f.startsWith("-session="))
    require(unknown.isEmpty, s"unknown flags: ${unknown.mkString(", ")}")
    val Array(driver, dumpFile, outDir) = pos.take(3)
    val mode = pos.lift(3).getOrElse("full")
    val spark = GraftSession.build("graft-migrate")
    // pipe UX (the reference reads stdin when its -dump-file flag is
    // EMPTY); our dump-file arg is positional, so the conventional "-"
    // sentinel marks the stdin case instead
    val r =
      if (dumpFile == "-")
        runStream(spark, driver, System.in, outDir, mode,
          filePrefix = filePrefix, verbose = verbose,
          skipForeignKeys = skipFks, sessionPath = sessionPath)
      else run(spark, driver, dumpFile, outDir, mode,
        filePrefix = filePrefix, verbose = verbose,
        skipForeignKeys = skipFks, sessionPath = sessionPath)
    println(r.report)
    spark.stop()
  }
}
