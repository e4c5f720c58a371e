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

  final case class TableReport(
      srcTable: String,
      spTable: String,
      rows: Long,
      badRows: Long,
      cols: Long,
      warnings: Long,
      syntheticPk: Option[String],
      issueLines: Seq[String])

  def issueText(col: String, i: Issue): String = i match {
    case Issue.Widened => s"Column '$col' is widened to a 64-bit type"
    case Issue.Serial => s"Column '$col' uses a serial/auto sequence (not supported)"
    case Issue.TimestampNoZone => s"Column '$col' is a timestamp without time zone; stored as UTC"
    case Issue.Datetime => s"Column '$col' is a datetime; time zone information dropped"
    case Issue.Time => s"Column '$col' has a time/year type mapped to STRING"
    case Issue.NoGoodType => s"Column '$col' has no good Spanner type; mapped to STRING"
    case Issue.MultiDimensionalArray => s"Column '$col' is a multi-dimensional array; mapped to STRING"
    case Issue.ForeignKeyIgnored => s"Column '$col': foreign key constraint ignored"
    case Issue.DefaultValueIgnored => s"Column '$col': default value dropped"
    case Issue.AutoIncrementIgnored => s"Column '$col': auto-increment dropped"
    case other => s"Column '$col': ${other.toString}"
  }

  def analyze(plan: ConversionPlan,
      stats: Map[String, TableStats]): Seq[TableReport] =
    plan.srcSchema.keys.toSeq.sorted.map { srcTable =>
      val spTable = plan.toSpannerTable(srcTable)
      val st = stats.getOrElse(spTable, TableStats(0, 0))
      val colIssues = plan.issues.getOrElse(srcTable, Map.empty)
      val warnings = colIssues.values.map(_.length.toLong).sum
      TableReport(
        srcTable = srcTable,
        spTable = spTable,
        rows = st.rows,
        badRows = st.badRows,
        cols = plan.srcSchema(srcTable).colNames.length.toLong,
        warnings = warnings,
        syntheticPk = plan.syntheticPks.get(spTable),
        issueLines = colIssues.toSeq.sortBy(_._1).flatMap { case (c, is) =>
          is.map(issueText(c, _))
        })
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
      if (t.issueLines.nonEmpty) {
        w ++= "Warnings:\n"
        t.issueLines.zipWithIndex.foreach { case (l, i) =>
          w ++= s"  ${i + 1}) $l.\n"
        }
      }
      w += '\n'
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
