package graft.sources.mysqldump

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.cast.MySqlCasts
import graft.functions.ReverseBits
import graft.schema._
import graft.types.MySqlTypeMapper

/** The mysqldump migration pipeline, Spark-shaped (reference lifecycle:
  * mysql/mysqldump.go:57-125 + data.go):
  *
  *   schema pass   driver streams the dump once (DDL is a few KB; INSERT
  *                 payloads are skipped statement-wise) → ConversionPlan
  *   data pass     spark.read.textFile → filter this table's extended-
  *                 INSERT lines → per-partition tuple split (quote-aware,
  *                 the reference's per-`(...)`-tuple recovery as a flatMap,
  *                 mysqldump.go:575-625) → cast columns → typed DataFrame
  *   sink          parquet per table; bad rows quarantined
  *
  * mysqldump emits one extended-INSERT statement per line (bounded by
  * max-allowed-packet ~24 MB, mysqldump.go:84-87), so the line-filtered
  * text scan distributes the data pass without a statement chunker; the
  * tuple split is genuine per-partition imperative parsing (the one
  * mapPartitions-class operator SURVEY §7.3 budgets for this source).
  */
object MySqlDumpReader {

  final case class Migration(
      plan: SchemaConverter.ConversionPlan,
      dump: MySqlDumpParser.DumpSchema,
      /** spanner table → (good rows, quarantined raw rows) */
      tables: Map[String, (DataFrame, DataFrame)],
      /** Drops the shared dump-line cache once sinks have materialized —
        * see PgDumpReader.Migration.release for the rationale. */
      release: () => Unit = () => ())

  /** Sequential driver-side schema pass — for spark-less callers. The
    * migration path uses the distributed overload. */
  def schemaPass(path: String): (MySqlDumpParser.DumpSchema, SchemaConverter.ConversionPlan) = {
    val src = graft.sources.DumpCodec.openText(path)
    val dump = try MySqlDumpParser.parse(src.getLines()) finally src.close()
    (dump, planOf(dump))
  }

  private def planOf(dump: MySqlDumpParser.DumpSchema): SchemaConverter.ConversionPlan =
    SchemaConverter.convert(MySqlTypeMapper, dump.tables,
      dump.tableOrder, dump.timezoneOffset)

  /** True for a complete single-line extended-INSERT statement — the
    * distributed schema pass prunes exactly these (outside DELIMITER
    * blocks) and aggregates their headers on executors; anything else
    * falls through to the sequential scanner. */
  private[mysqldump] def prunableInsert(line: String): Boolean =
    line.regionMatches(true, 0, "INSERT INTO ", 0, 12) &&
      line.trim.endsWith(";") && MySqlDumpParser.InsertHeader.unapply(line).isDefined

  /** True for a line that STARTS an INSERT statement, terminated on this
    * line or not — the V2 discovery/reader classifier (wrapped
    * statements assemble in the reader). [[prunableInsert]] stays the
    * schema-pass pruning predicate: pruning just the first line of a
    * wrapped statement would orphan its continuation lines in the
    * driver's statement stream. */
  private[mysqldump] def insertStart(line: String): Boolean =
    line.regionMatches(true, 0, "INSERT INTO ", 0, 12) &&
      MySqlDumpParser.InsertHeader.startHeader(line).isDefined

  /** Distributed schema pass: mysqldump data is one extended-INSERT per
    * line, so the executors prune + aggregate those while the driver
    * interprets only the collected DDL (KBs at any dump size). DELIMITER
    * blocks (trigger/routine bodies) are discovered distributed too and
    * their contents are PROTECTED from insert-pruning — the sequential
    * scanner counts them skippedInDelimiterBlock, and an INSERT inside a
    * procedure body is not table data.
    *
    * Returns the delimiter-block line ranges as well so the data pass
    * can exclude procedure-body lines from readInsertRaw. */
  def schemaPass(spark: SparkSession, lines: DataFrame):
      (MySqlDumpParser.DumpSchema, SchemaConverter.ConversionPlan, Seq[(Long, Long)]) = {
    import spark.implicits._

    // 1. DELIMITER boundary candidates (tiny collect).
    val cands = lines.as[(String, Long)]
      .filter(t => t._1.trim.regionMatches(true, 0, "DELIMITER", 0, 9))
      .collect().sortBy(_._2)
    val rb = Seq.newBuilder[(Long, Long)]
    var open = -1L
    cands.foreach { case (l, idx) =>
      val arg = l.trim.split("\\s+").lift(1).getOrElse(";")
      if (open < 0) { if (arg != ";") open = idx }
      else if (arg == ";") { rb += ((open + 1, idx)); open = -1L }
    }
    if (open >= 0) rb += ((open + 1, Long.MaxValue)) // unterminated block
    val blocks = rb.result()
    val inBlock = (idx: Long) => blocks.exists(r => idx >= r._1 && idx < r._2)

    // 2. Prune + aggregate data INSERTs outside blocks; collect the rest.
    val SEP = "\u001F"
    val ddl = lines.as[(String, Long)]
      .filter(t => inBlock(t._2) || !prunableInsert(t._1))
      .collect().sortBy(_._2).map(_._1)
    val inserts = lines.as[(String, Long)]
      .filter(t => !inBlock(t._2) && prunableInsert(t._1))
      .map { case (l, idx) =>
        val (tbl, colsOpt) = MySqlDumpParser.InsertHeader.unapply(l).get
        (tbl, colsOpt.map(_.mkString(SEP)).orNull, idx)
      }
      .groupByKey(t => (t._1, Option(t._2)))
      .mapGroups { (key: (String, Option[String]), it: Iterator[(String, String, Long)]) =>
        var n = 0L; var first = Long.MaxValue
        it.foreach { t => n += 1; if (t._3 < first) first = t._3 }
        (key._1, key._2.orNull, n, first)
      }
      .collect().sortBy(_._4)

    val dump0 = MySqlDumpParser.parse(ddl.iterator)
    val dump = mergeInserts(dump0, inserts.map { case (t, c, n, _) =>
      (t, Option(c).map(_.split(SEP, -1).toSeq), n) }.toSeq)
    (dump, planOf(dump), blocks)
  }

  /** Fold executor-aggregated INSERT headers into the parsed schema,
    * mirroring the sequential scanner's interpret() for INSERT. */
  private def mergeInserts(d: MySqlDumpParser.DumpSchema,
      ins: Seq[(String, Option[Seq[String]], Long)]): MySqlDumpParser.DumpSchema = {
    if (ins.isEmpty) return d
    var insertCols = d.insertCols
    var bad = d.unparseable
    var n = 0L
    ins.foreach { case (tbl, colsOpt, cnt) =>
      n += cnt
      if (d.tables.contains(tbl)) {
        if (!insertCols.contains(tbl)) insertCols = insertCols + (tbl -> colsOpt)
      } else bad = bad :+ (if (cnt == 1) s"INSERT for unknown table $tbl"
        else s"INSERT for unknown table $tbl (x$cnt)")
    }
    d.copy(insertCols = insertCols,
      statementStats = d.statementStats
        .updated("insert", d.statementStats.getOrElse("insert", 0L) + n),
      unparseable = bad)
  }

  // ------------------------------------------------- tuple lexing (exec)

  /** Executor-side INSERT-line lexer: `INSERT INTO t [(cols)] VALUES
    * (v,..),(v,..);` → raw string tuples. NULL → null; quoted strings
    * unescape backslash + '' escapes; bare literals pass through. */
  object Tuples {

    def parseLine(line: String): Seq[Seq[String]] = {
      val vi = valuesIndex(line)
      if (vi < 0) Nil
      else splitTuples(line.substring(vi)).map(tup =>
        MySqlDumpParser.splitTopLevel(tup).map(v => literal(v.trim)))
    }

    /** Index just past the top-level VALUES keyword. Word boundaries on
      * both sides guard against identifiers containing "values" in an
      * unquoted column list (same flaw as the pg lexer's; mysqldump's
      * backticking usually hides it, hand-written dumps don't). */
    private def valuesIndex(s: String): Int = {
      var inQ = false; var inBt = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && inQ) i += 1
        else if (c == '\'' && !inBt) inQ = !inQ
        else if (c == '`' && !inQ) inBt = !inBt
        else if (!inQ && !inBt && (c == 'V' || c == 'v') &&
                 i + 6 <= s.length && s.regionMatches(true, i, "VALUES", 0, 6) &&
                 (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
                 (i + 6 >= s.length || !isIdentChar(s.charAt(i + 6))))
          return i + 6
        i += 1
      }
      -1
    }

    private def isIdentChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '$'

    /** Split `(a,b),(c,d)` into tuple bodies (backslash-escape aware). */
    private def splitTuples(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0; var inQ = false; var start = -1
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && inQ) i += 1
        else if (c == '\'') inQ = !inQ
        else if (!inQ && c == '(') { depth += 1; if (depth == 1) start = i + 1 }
        else if (!inQ && c == ')') { depth -= 1; if (depth == 0) out += s.substring(start, i) }
        i += 1
      }
      out.result()
    }

    /** SQL literal → raw string (null for NULL). MySQL string escapes:
      * \0 \' \" \b \n \r \t \Z \\ plus '' (mysql string literal rules;
      * the reference gets this from the pingcap lexer). */
    def literal(v: String): String = {
      if (v.equalsIgnoreCase("NULL")) null
      else if (v.startsWith("'") && v.endsWith("'") && v.length >= 2)
        unescape(v.substring(1, v.length - 1))
      else if (v.startsWith("_binary")) literal(v.stripPrefix("_binary").trim)
      else v
    }

    private def unescape(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '0' => sb.append('\u0000')
            case 'b' => sb.append('\b')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'Z' => sb.append('\u001a')
            case x   => sb.append(x) // \' \" \\ and unknown → literal char
          }
          i += 2
        } else if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
          sb.append('\''); i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
  }

  // ---------------------------------------------------------- data pass

  /** Raw string-typed frame for one table's INSERT tuples, distributed
    * over the shared (line, idx) scan. `excludeRanges` (DELIMITER-block
    * bodies from the schema pass) keeps procedure-body INSERTs out of
    * the data — the schema pass counts those skippedInDelimiterBlock,
    * and ingesting them as rows would double-count. Tuples whose arity
    * doesn't match the column list are marked `__ragged` (→ quarantine). */
  def readInsertRaw(lines: DataFrame, srcTable: String, cols: Seq[String],
      excludeRanges: Seq[(Long, Long)] = Nil): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val tbl = srcTable
    val ranges = excludeRanges
    val tuples = lines.as[(String, Long)]
      .filter(t => !ranges.exists(r => t._2 >= r._1 && t._2 < r._2) &&
        isInsertFor(t._1, tbl))
      .flatMap(t => Tuples.parseLine(t._1))
    val n = cols.length
    tuples.toDF("v")
      .select(cols.zipWithIndex.map { case (c, i) =>
        element_at(col("v"), i + 1).as(c)
      } :+ (size(col("v")) =!= n).as("__ragged"): _*)
  }

  private[mysqldump] def isInsertFor(line: String, table: String): Boolean = {
    if (!line.regionMatches(true, 0, "INSERT INTO ", 0, 12)) return false
    val rest = line.substring(12).dropWhile(_.isWhitespace)
    // take the FULL (possibly `db`.`t` backtick-qualified) identifier —
    // scanning to the first backtick truncated `db`.`t` to "db" and those
    // rows were silently dropped; unquoteId strips qualifier + backticks
    var i = 0; var inBt = false; var end = -1
    while (i < rest.length && end < 0) {
      val c = rest.charAt(i)
      if (c == '`') inBt = !inBt
      else if (!inBt && (c.isWhitespace || c == '(')) end = i
      i += 1
    }
    val ident = rest.substring(0, if (end < 0) rest.length else end)
    MySqlDumpParser.unquoteId(ident) == table
  }

  /** Typed frame + quarantine for one source table (MySQL casts; `set`
    * columns → ARRAY<STRING> via comma split, mysql/data.go:228-261). */
  def convertTable(spark: SparkSession, plan: SchemaConverter.ConversionPlan,
      srcTable: String, raw: DataFrame): (DataFrame, DataFrame) = {
    val spName = plan.toSpannerTable(srcTable)
    val sp = plan.spSchema(spName)
    val src = plan.srcSchema(srcTable)
    val colMap = plan.toSpannerCols(srcTable)
    val offset = plan.timezone.getOrElse("+00:00")

    val present = raw.columns.toSeq.filterNot(_ == "__ragged")
    // skip source columns with no Spanner counterpart (removed via
    // PlanEdits in a staged run) — see the pgdump reader
    val mapped = present.filter(c =>
      colMap.get(c).exists(sp.colDefs.contains))
    val casts = mapped.map { srcCol =>
      val spCol = colMap(srcCol)
      val d = sp.colDefs(spCol)
      val srcTy = src.colDefs(srcCol).tpe.name
      val in = col(srcCol)
      val out =
        if (d.t.isArray) MySqlCasts.setArray(in)
        else MySqlCasts.scalar(d.t, srcTy, in, offset)
      (spCol, in, out)
    }
    // fenced two-stage split — see the pgdump reader's convertTable for
    // the full rationale (per-column flags keep each generated method
    // under the JVM JIT's 8 KB limit; the OptimizerBarrier stops
    // predicate pushdown from re-inlining every cast chain into one
    // giant filter condition)
    val stage1 = raw.select(
      casts.map { case (spCol, _, out) => out.as(spCol) } ++
        casts.map { case (spCol, in, out) =>
          (in.isNotNull && out.isNull).as(s"__badc_$spCol") } ++
        (if (raw.columns.contains("__ragged")) Seq(col("__ragged")) else Nil) ++
        Seq(struct(present.map(col): _*).as("__orig")): _*)
    val badFlags = casts.map { case (spCol, _, _) => col(s"__badc_$spCol") } ++
      (if (raw.columns.contains("__ragged")) Seq(col("__ragged")) else Nil)
    val projected = stage1.select(
      casts.map { case (spCol, _, _) => col(spCol) } ++
        Seq(graft.functions.OptimizerBarrier.fence(badFlags.reduce(_ || _))
          .as("__bad"),
          col("__orig")): _*)
    val good0 = projected.filter(!col("__bad")).drop("__bad", "__orig")
    val quarantine = projected.filter(col("__bad")).select(col("__orig.*"))

    val good =
      if (plan.syntheticPks.contains(spName))
        ReverseBits.withSynthPk(spark, good0, plan.syntheticPks(spName))
      else good0
    (good, quarantine)
  }

  /** Full pipeline: parse, read + convert every table's INSERT data.
    * `planOverride` (session-file plan) supports -data-only runs.
    *
    * Data pass: V2 byte-range source (`format("mysqldump")`) per table
    * by default — extent-bounded chunks instead of the shared full-file
    * line scan, and the path that handles wrapped multi-line INSERT
    * statements; the line-ranged read stays as the per-table fallback
    * for statements that disagree on column lists (see the pgdump
    * twin). When no table needed the fallback the shared line cache is
    * released before returning. */
  def migrate(spark: SparkSession, path: String,
      planOverride: Option[SchemaConverter.ConversionPlan] = None,
      dataViaV2: Boolean = true): Migration = {
    val real = graft.sources.DumpCodec.materialize(spark, path)
    // one cached scan serves boundary discovery AND any line-ranged read
    val lines = graft.sources.DumpLines.indexed(spark, real).cache()
    val (dump, freshPlan, blocks) = schemaPass(spark, lines)
    val plan = planOverride.getOrElse(freshPlan)
    var lineRangedUsed = false
    val tables = plan.srcSchema.keys.map { srcTable =>
      val spName = plan.toSpannerTable(srcTable)
      val frames = dump.insertCols.get(srcTable) match {
        case Some(colsOpt) =>
          val raw =
            if (dataViaV2)
              try spark.read.format("mysqldump").option("table", srcTable).load(real)
              catch { case _: IllegalArgumentException =>
                // disagreeing column lists: the V2 source refuses,
                // positional mapping over the schema list copes
                lineRangedUsed = true
                val cols = colsOpt.getOrElse(dump.tables(srcTable).colNames)
                readInsertRaw(lines, srcTable, cols, blocks)
              }
            else {
              lineRangedUsed = true
              val cols = colsOpt.getOrElse(dump.tables(srcTable).colNames)
              readInsertRaw(lines, srcTable, cols, blocks)
            }
          convertTable(spark, plan, srcTable, raw)
        case None => // schema-only table
          val sp = plan.spSchema(spName)
          val empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], sp.structType)
          (empty, spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
            StructType(Seq(StructField("line", StringType)))))
      }
      spName -> frames
    }.toMap
    if (!lineRangedUsed) lines.unpersist(blocking = false)
    Migration(plan, dump, tables, () => { lines.unpersist(blocking = false); () })
  }
}
