package graft.report

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.sources.pgdump.PgDumpReader

/** Report/stats contract tests (reference: internal/report.go rating
  * thresholds + report_test.go golden-text shape). */
class ReportSpec extends AnyFunSuite {

  test("rating thresholds: good < 5%, ok < 33%") {
    assert(Report.rateData(0, 0).startsWith("NONE"))
    assert(Report.rateData(100, 0).startsWith("EXCELLENT"))
    assert(Report.rateData(100, 4).startsWith("GOOD"))
    assert(Report.rateData(100, 5).startsWith("OK"))   // 5 == 100/20 boundary
    assert(Report.rateData(100, 32).startsWith("OK"))
    // %% in an s-interpolated string is NOT an escape — it rendered doubled
    assert(Report.rateData(100, 5) === "OK (95.00% of 100 rows written)")
    assert(Report.rateData(100, 33).startsWith("POOR"))
    assert(Report.rateSchema(0, 0, missingPKey = false, summary = false)
      .startsWith("NONE"))
    assert(Report.rateSchema(10, 0, missingPKey = false, summary = false)
      .startsWith("EXCELLENT"))
    assert(Report.rateSchema(10, 0, missingPKey = true, summary = false)
      === "GOOD (all columns mapped cleanly, but missing primary key)")
    assert(Report.rateSchema(100, 4, missingPKey = false, summary = false)
      === "GOOD (most columns mapped cleanly)")
    assert(Report.rateSchema(100, 20, missingPKey = false, summary = false)
      .startsWith("OK"))
    assert(Report.rateSchema(100, 50, missingPKey = true, summary = true)
      === "POOR (many columns did not map cleanly + some missing primary keys)")
  }

  test("unexpected-condition counter caps distinct keys") {
    val u = new Report.UnexpectedConditions(cap = 3)
    u.add("a"); u.add("b"); u.add("c"); u.add("a")
    u.add("d"); u.add("e")
    assert(u.counts("a") === 2)
    assert(u.counts("other") === 2)
    assert(u.counts.size === 4) // a, b, c + other
  }

  test("end-to-end report over the pg_dump fixture migration") {
    val spark = GraftSession.build("graft-test")
    val m = PgDumpReader.migrate(spark,
      "src/test/resources/fixtures/sample.pgdump")
    val stats = Report.tableStats(m.tables)
    assert(stats("inventory").rows === 3)
    assert(stats("inventory").badRows === 0)

    val text = Report.render("pg_dump", m.plan, stats,
      statementStats = m.dump.statementStats)
    assert(text.contains("Summary of Conversion"))
    assert(text.contains("Table order log (mapped to Spanner table order_log)"))
    assert(text.contains("Added synthetic primary key 'synth_id'"))
    // reference-parity issue bodies: severity headings + IssueDB text
    assert(text.contains("Some columns will consume more storage in Spanner"))
    assert(text.contains("source DB type integer[] is mapped to Spanner type array<int64>"))
    assert(text.contains("Statements processed by pg_dump"))
    // all three tables have data and no bad rows → data EXCELLENT overall
    assert(text.linesIterator.exists(l =>
      l.startsWith("Data conversion: EXCELLENT")))
  }

  test("issue bodies: severity grouping, batching, reference line formats") {
    // A table carrying Serial (warning), TimestampNoZone (note, batched),
    // and Widened (note, batched — two instances must collapse to one).
    val dumpText =
      """CREATE TABLE issues_t (
        |  id serial NOT NULL,
        |  a integer,
        |  b smallint,
        |  seen timestamp without time zone,
        |  touched timestamp without time zone,
        |  PRIMARY KEY (id)
        |);
        |""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft", ".pgdump")
    java.nio.file.Files.writeString(p, dumpText)
    val (_, plan) = PgDumpReader.schemaPass(p.toString)

    val bodies = Report.issueBodies(plan, "issues_t")
    assert(bodies.map(_.heading) === Seq("Warning", "Notes"))
    assert(bodies(0).lines === Seq(
      "Column 'id': type serial is mapped to int64. " +
        "Spanner does not support autoincrementing types"))
    // batched notes: one Widened line (for the alphabetically-first of
    // a/b) and one TimestampNoZone line (for seen, not touched)
    assert(bodies(1).lines === Seq(
      "Some columns will consume more storage in Spanner e.g. for column " +
        "'a', source DB type integer is mapped to Spanner type int64",
      "Some columns have source DB type 'timestamp without timezone' which " +
        "is mapped to Spanner type timestamp e.g. column 'seen'. " +
        "Spanner timestamp is closer to PostgreSQL timestamptz"))

    // warning counting (report.go:277-304): notes don't count; the one
    // non-batched warning (Serial on id) counts once
    assert(Report.countWarnings(plan.issues("issues_t")) === 1L)

    // render justifies numbered lines at 80 cols with 3-space indent
    val text = Report.render("pg_dump", plan, Map.empty)
    val rendered = text.linesIterator.toSeq
    val wrapped = rendered.filter(_.startsWith("   "))
    assert(wrapped.nonEmpty) // long issue lines wrapped with continuation indent
    assert(rendered.forall(_.length <= 83)) // limit 80 + "N) " slack
  }

  test("quarantine side output writes only non-empty bad frames") {
    val spark = GraftSession.build("graft-test")
    val dumpText =
      """CREATE TABLE t (a bigint);
        |COPY t (a) FROM stdin;
        |1
        |oops
        |\.
        |""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft", ".pgdump")
    java.nio.file.Files.writeString(p, dumpText)
    val m = PgDumpReader.migrate(spark, p.toString)
    val out = java.nio.file.Files.createTempDirectory("graft-quarantine").toString
    Report.writeQuarantine(m.tables, out)
    val bad = spark.read.parquet(s"$out/t.bad.parquet")
    assert(bad.collect().map(_.getString(0)).toSeq === Seq("oops"))
  }
}
