package graft.report

import graft.schema.SchemaConverter.ConversionPlan
import graft.types.Issue
import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Migration statistics + report rendering (A1–A3, A6, K6 of SURVEY §2.6;
  * reference: internal/convert.go:105-112,289-300 and
  * internal/report.go:29-398).
  *
  * Spark shape: per-table row/bad-row counts are distributed `df.count`s
  * over the good/quarantine frames (the dataflow replaces the reference's
  * per-row mutable counters); statement stats come from the dump parsers;
  * the renderer itself is a pure driver-side function.
  */
object Report {

  /** A1: per-table row statistics, computed from the migration's
    * good/quarantine frame pair with one job per table. */
  final case class TableStats(rows: Long, badRows: Long)

  def tableStats(tables: Map[String, (DataFrame, DataFrame)]): Map[String, TableStats] =
    tables.map { case (name, (good, bad)) =>
      val b = bad.count()
      name -> TableStats(good.count() + b, b)
    }

  /** A3: capped unexpected-condition counter (internal/convert.go:289-300). */
  final class UnexpectedConditions(cap: Int = 1000) {
    private val m = mutable.LinkedHashMap.empty[String, Long]
    def add(cond: String): Unit =
      if (m.contains(cond) || m.size < cap) m(cond) = m.getOrElse(cond, 0L) + 1
      else m("other") = m.getOrElse("other", 0L) + 1
    def counts: Map[String, Long] = m.toMap
  }

  // ------------------------------------------------------------ rating

  /** A6 thresholds (report.go:357-363): good = bad < total/20,
    * ok = bad < total/3. */
  private def good(total: Long, bad: Long): Boolean = bad < total / 20
  private def ok(total: Long, bad: Long): Boolean = bad < total / 3

  /** Schema-conversion rating over row-weighted cols/warnings
    * (report.go:313-338). */
  def rateSchema(cols: Long, warnings: Long, missingPKey: Boolean,
      summary: Boolean): String = {
    val pkMsg = if (summary) "some missing primary keys" else "missing primary key"
    if (cols == 0) "NONE (no schema found)"
    else if (warnings == 0 && !missingPKey) "EXCELLENT (all columns mapped cleanly)"
    else if (warnings == 0) s"GOOD (all columns mapped cleanly, but $pkMsg)"
    else if (good(cols, warnings) && !missingPKey) "GOOD (most columns mapped cleanly)"
    else if (good(cols, warnings)) s"GOOD (most columns mapped cleanly, but $pkMsg)"
    else if (ok(cols, warnings) && !missingPKey) "OK (some columns did not map cleanly)"
    else if (ok(cols, warnings)) s"OK (some columns did not map cleanly + $pkMsg)"
    else if (!missingPKey) "POOR (many columns did not map cleanly)"
    else s"POOR (many columns did not map cleanly + $pkMsg)"
  }

  /** Data-conversion rating (report.go:340-355). */
  def rateData(rows: Long, badRows: Long): String = {
    def pct = f"${100.0 * (rows - badRows) / rows}%.2f"
    val s = s" ($pct% of $rows rows written)" // s-interp: %% would render doubled
    if (rows == 0) "NONE (no data rows found)"
    else if (badRows == 0) s"EXCELLENT (all $rows rows written)"
    else if (good(rows, badRows)) "GOOD" + s
    else if (ok(rows, badRows)) "OK" + s
    else "POOR" + s
  }

  // ---------------------------------------------------------- analysis

  /** One severity section of a table's report: heading "Warning(s)" or
    * "Note(s)" + numbered lines (report.go:93-97 tableReportBody). */
  final case class IssueBody(heading: String, lines: Seq[String])

  final case class TableReport(
      srcTable: String,
      spTable: String,
      rows: Long,
      badRows: Long,
      cols: Long,
      warnings: Long,
      syntheticPk: Option[String],
      issueBodies: Seq[IssueBody])

  private final case class IssueMeta(brief: String, warning: Boolean,
      batch: Boolean)

  /** The reference's IssueDB (report.go:242-268): per-issue brief text,
    * severity, and whether repeats within a table are batched into one
    * line. Extra Dynamo-only entries (NumberString, NoGoodTypeConflict,
    * Empty) follow dynamodb/schema.go's classification semantics. */
  private val issueDb: Map[Issue, IssueMeta] = Map(
    Issue.DefaultValueIgnored -> IssueMeta(
      "Some columns have default values which Spanner does not support",
      warning = true, batch = true),
    Issue.ForeignKeyIgnored -> IssueMeta(
      "Foreign-key constraints are applied after load via FK backfill",
      warning = true, batch = false),
    Issue.MultiDimensionalArray -> IssueMeta(
      "Spanner doesn't support multi-dimensional arrays",
      warning = true, batch = false),
    Issue.NoGoodType -> IssueMeta(
      "No appropriate Spanner type",
      warning = true, batch = false),
    Issue.NumericThatFits -> IssueMeta(
      "This type mapping preserves the numeric's specified precision",
      warning = false, batch = false),
    Issue.Serial -> IssueMeta(
      "Spanner does not support autoincrementing types",
      warning = true, batch = false),
    Issue.AutoIncrementIgnored -> IssueMeta(
      "Spanner does not support auto_increment attribute",
      warning = true, batch = false),
    Issue.TimestampNoZone -> IssueMeta(
      "Spanner timestamp is closer to PostgreSQL timestamptz",
      warning = false, batch = true),
    Issue.Datetime -> IssueMeta(
      "Spanner timestamp is closer to MySQL timestamp",
      warning = false, batch = true),
    Issue.Time -> IssueMeta(
      "Spanner does not support time/year types",
      warning = false, batch = true),
    Issue.Widened -> IssueMeta(
      "Some columns will consume more storage in Spanner",
      warning = false, batch = true),
    Issue.NumberString -> IssueMeta(
      "Some number values do not fit Spanner NUMERIC; mapped to STRING",
      warning = false, batch = true),
    Issue.NoGoodTypeConflict -> IssueMeta(
      "Sampled rows disagree on this attribute's type; defaulted to STRING",
      warning = true, batch = false),
    Issue.Empty -> IssueMeta(
      "Attribute was absent or empty in every sampled row",
      warning = true, batch = false),
    Issue.MissingPrimaryKey -> IssueMeta(
      "Spanner requires a primary key for every table",
      warning = true, batch = false))

  private def metaOf(i: Issue): IssueMeta =
    issueDb.getOrElse(i, IssueMeta(i.toString, warning = true, batch = false))

  /** Per-issue line text (report.go:186-205's switch, with the same
    * special cases). `srcType`/`spType` are the rendered type strings;
    * Spanner types print lower-case like the reference's report. */
  def issueText(col: String, i: Issue, srcType: String, spType: String): String = {
    val brief = metaOf(i).brief
    i match {
      case Issue.DefaultValueIgnored => s"$brief e.g. column '$col'"
      case Issue.ForeignKeyIgnored => s"Column '$col' uses foreign keys; $brief"
      case Issue.AutoIncrementIgnored =>
        s"Column '$col' is an autoincrement column. $brief"
      case Issue.TimestampNoZone =>
        "Some columns have source DB type 'timestamp without timezone' which is " +
          s"mapped to Spanner type timestamp e.g. column '$col'. $brief"
      case Issue.Datetime =>
        "Some columns have source DB type 'datetime' which is mapped to Spanner " +
          s"type timestamp e.g. column '$col'. $brief"
      case Issue.Widened =>
        s"$brief e.g. for column '$col', source DB type $srcType is mapped to " +
          s"Spanner type $spType"
      case _ => s"Column '$col': type $srcType is mapped to $spType. $brief"
    }
  }

  /** Severity-grouped issue bodies for one table (report.go:139-215
    * buildTableReportBody): Warning section then Note section, columns in
    * alphabetical order, batched issues reported once per table, plus the
    * synthetic-PK warning special case. */
  def issueBodies(plan: ConversionPlan, srcTable: String): Seq[IssueBody] = {
    val src = plan.srcSchema(srcTable)
    val spTable = plan.toSpannerTable(srcTable)
    val sp = plan.spSchema(spTable)
    val colMap = plan.toSpannerCols(srcTable)
    val colIssues = plan.issues.getOrElse(srcTable, Map.empty)
    val synthPk = plan.syntheticPks.get(spTable)
    Seq(true, false).flatMap { wantWarning =>
      val batched = mutable.Set.empty[Issue]
      val pkLine =
        if (wantWarning) synthPk.toSeq.map(k =>
          s"Column '$k' was added because this table didn't have a primary " +
            "key. Spanner requires a primary key for every table")
        else Nil
      val lines = pkLine ++ colIssues.keys.toSeq.sorted.flatMap { col =>
        colIssues(col).flatMap { i =>
          val m = metaOf(i)
          if (m.warning != wantWarning) None
          else if (m.batch && !batched.add(i)) None
          else {
            val srcType = src.colDefs(col).tpe.print
            val spType = colMap.get(col).flatMap(sp.colDefs.get)
              .map(_.t.render.toLowerCase).getOrElse("?")
            Some(issueText(col, i, srcType, spType))
          }
        }
      }
      if (lines.isEmpty) None
      else {
        val h = if (wantWarning) "Warning" else "Note"
        Some(IssueBody(if (lines.length > 1) h + "s" else h, lines))
      }
    }
  }

  /** Warning count with the reference's semantics (report.go:277-304
    * analyzeCols): notes don't count; non-batched warnings count at most
    * once per column; batched warnings at most once per table. */
  def countWarnings(colIssues: Map[String, Seq[Issue]]): Long = {
    val batchedSeen = mutable.Set.empty[Issue]
    var n = 0L
    colIssues.values.foreach { is =>
      var colWarning = false
      is.foreach { i =>
        val m = metaOf(i)
        if (m.warning && m.batch) batchedSeen += i
        else if (m.warning) colWarning = true
      }
      if (colWarning) n += 1
    }
    n + batchedSeen.size
  }

  def analyze(plan: ConversionPlan,
      stats: Map[String, TableStats]): Seq[TableReport] =
    plan.srcSchema.keys.toSeq.sorted.map { srcTable =>
      val spTable = plan.toSpannerTable(srcTable)
      val st = stats.getOrElse(spTable, TableStats(0, 0))
      val colIssues = plan.issues.getOrElse(srcTable, Map.empty)
      TableReport(
        srcTable = srcTable,
        spTable = spTable,
        rows = st.rows,
        badRows = st.badRows,
        cols = plan.srcSchema(srcTable).colNames.length.toLong,
        warnings = countWarnings(colIssues),
        syntheticPk = plan.syntheticPks.get(spTable),
        issueBodies = issueBodies(plan, srcTable))
    }

  // ----------------------------------------------------------- summary

  /** Row-weighted overall rating (report.go:372-398): tables without data
    * weigh as one row; bad writes fold into badRows. */
  def summary(reports: Seq[TableReport],
      badWrites: Map[String, Long] = Map.empty): String = {
    var cols = 0L; var warnings = 0L; var missingPk = false
    reports.foreach { t =>
      val weight = if (t.rows == 0) 1L else t.rows
      cols += t.cols * weight
      warnings += t.warnings * weight
      if (t.syntheticPk.nonEmpty) missingPk = true
    }
    val rows = reports.map(_.rows).sum
    val badRows = reports.map(_.badRows).sum + badWrites.values.sum
    s"Schema conversion: ${rateSchema(cols, warnings, missingPk, summary = true)}.\n" +
      s"Data conversion: ${rateData(rows, badRows)}.\n"
  }

  // ------------------------------------------------------------ render

  private def heading(w: StringBuilder, s: String): Unit = {
    w ++= "-" * 77 += '\n'
    w ++= s += '\n'
    w ++= "-" * 77 += '\n'
  }

  /** Word-wrap `s` at `limit` columns with `indent`-space continuation
    * lines (report.go:500-525 justifyLines — same space-only splitting). */
  def justifyLines(w: StringBuilder, s: String, limit: Int, indent: Int): Unit = {
    var n = 0
    var startOfLine = true
    s.split(" ", -1).foreach { x =>
      if (n + x.length > limit && !startOfLine) {
        w += '\n'
        w ++= " " * indent
        n = indent
        startOfLine = true
      }
      if (startOfLine) { w ++= x; n += x.length }
      else { w += ' '; w ++= x; n += x.length + 1 }
      startOfLine = false
    }
  }

  /** K6: the full text report. */
  def render(driverName: String, plan: ConversionPlan,
      stats: Map[String, TableStats],
      statementStats: Map[String, Long] = Map.empty,
      unexpected: Map[String, Long] = Map.empty,
      badWrites: Map[String, Long] = Map.empty): String = {
    val w = new StringBuilder
    val reports = analyze(plan, stats)
    heading(w, "Summary of Conversion")
    w ++= summary(reports, badWrites) += '\n'
    if (statementStats.nonEmpty) {
      heading(w, s"Statements processed by $driverName")
      statementStats.toSeq.sortBy(_._1).foreach { case (k, v) =>
        w ++= f"  $v%8d  $k%s" += '\n'
      }
      w += '\n'
    }
    reports.foreach { t =>
      val h = if (t.srcTable == t.spTable) s"Table ${t.srcTable}"
        else s"Table ${t.srcTable} (mapped to Spanner table ${t.spTable})"
      heading(w, h)
      w ++= s"Schema conversion: ${rateSchema(t.cols, t.warnings, t.syntheticPk.nonEmpty, summary = false)}.\n"
      w ++= s"Data conversion: ${rateData(t.rows, t.badRows)}.\n"
      t.syntheticPk.foreach(k =>
        w ++= s"Added synthetic primary key '$k'.\n")
      t.issueBodies.foreach { b =>
        w ++= b.heading += '\n'
        b.lines.zipWithIndex.foreach { case (l, i) =>
          justifyLines(w, s"${i + 1}) $l.\n", 80, 3)
        }
        w += '\n'
      }
      if (t.issueBodies.isEmpty) w += '\n'
    }
    if (unexpected.nonEmpty) {
      heading(w, "Unexpected conditions")
      unexpected.toSeq.sortBy(-_._2).foreach { case (k, v) =>
        w ++= f"  $v%8d  $k%s" += '\n'
      }
    }
    w.toString
  }

  /** K7: quarantine side output — full bad-row frames to parquet (the
    * scale-safe version of the reference's 10 MB in-memory sample,
    * conversion/conversion.go:660-706); the report itself only carries
    * counts. */
  def writeQuarantine(tables: Map[String, (DataFrame, DataFrame)],
      outDir: String): Unit =
    tables.foreach { case (name, (_, bad)) =>
      if (!bad.isEmpty)
        bad.write.mode("overwrite").parquet(s"$outDir/$name.bad.parquet")
    }
}
