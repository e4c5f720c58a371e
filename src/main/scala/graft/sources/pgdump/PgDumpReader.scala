package graft.sources.pgdump

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.cast.PgCasts
import graft.functions.ReverseBits
import graft.schema._
import graft.types.{PostgresTypeMapper, SpScalar}
import PgDumpParser.{CopyBlock, DumpSchema}

/** The pg_dump migration pipeline, Spark-shaped (reference lifecycle
  * §3.1 of SURVEY.md):
  *
  *   schema pass   driver streams the dump once (few KB of DDL + line
  *                 ranges of COPY payloads) → ConversionPlan
  *   data pass     spark.read.text + zipWithIndex → filter each table's
  *                 COPY line ranges → split/unescape/cast as column
  *                 expressions → typed DataFrame (+ synthetic PK)
  *   sink          parquet per table (stand-in for the Spanner writer),
  *                 bad rows split to a quarantine frame, schema files
  *
  * The data pass is fully distributed — at a 100 GB dump the text scan,
  * field split, unescape, and casts all run as one codegen stage per
  * table with no shuffle at all (narrow scan→project→write). The driver
  * never holds row data (INSERT statements excepted: pg_dump only emits
  * them with --inserts, and they're bounded by statement size).
  */
object PgDumpReader {

  final case class Migration(
      plan: SchemaConverter.ConversionPlan,
      dump: DumpSchema,
      /** spanner table → (good rows, quarantined raw rows) */
      tables: Map[String, (DataFrame, DataFrame)],
      /** Drops the shared dump-line cache. Call once every sink has
        * materialized: at the reference's 100 GB envelope the cache is
        * ~100 GB of block-manager storage, and without an explicit
        * release it stays pinned for the session's lifetime (the table
        * frames still work afterwards — they just re-scan the file).
        * Idempotent; same pattern as ConnectedComponents.releaseLabels. */
      release: () => Unit = () => ())

  /** Sequential driver-side schema pass — for spark-less callers (plan
    * tooling, tests). The migration path uses the distributed overload:
    * this one streams the WHOLE file (100 GB of COPY payload included)
    * through the driver. */
  def schemaPass(path: String): (DumpSchema, SchemaConverter.ConversionPlan) = {
    val src = graft.sources.DumpCodec.openText(path)
    val dump = try PgDumpParser.parse(src.getLines()) finally src.close()
    (dump, planOf(dump))
  }

  private def planOf(dump: DumpSchema): SchemaConverter.ConversionPlan =
    SchemaConverter.convert(PostgresTypeMapper, dump.tables,
      dump.tableOrder, dump.timezone)

  /** Distributed schema pass: COPY payload boundaries and INSERT headers
    * are discovered on executors; the driver interprets only the pruned
    * statement stream — KBs of DDL even for a 100 GB dump (the payload,
    * COPY or --inserts, never crosses the driver). Equivalence with the
    * sequential scanner is pinned by SchemaPassParitySpec.
    *
    * Degradation rule: anything the distributed classifiers can't place
    * (a COPY header split across lines, a multi-line INSERT) stays in
    * the collected stream and falls through to the sequential logic —
    * slower, never wrong. */
  def schemaPass(spark: SparkSession,
      lines: DataFrame): (DumpSchema, SchemaConverter.ConversionPlan) = {
    import spark.implicits._

    // 1. COPY boundary candidates (tiny collect: ~2 lines per table).
    val headerRe = "(?is)^COPY\\s+.+\\s+FROM\\s+stdin\\s*;\\s*$"
    val cands = lines
      .filter(col("line") === "\\." || col("line").rlike(headerRe))
      .select("idx", "line").as[(Long, String)]
      .collect().sortBy(_._1)

    // 2. Resolve payload ranges with the sequential scanner's state
    //    rules: the first `\.` after a header closes it; header
    //    lookalikes inside an open payload are data; a stray `\.`
    //    outside any payload stays in the statement stream.
    val rb = Seq.newBuilder[(Long, Long)]
    var open = -1L
    cands.foreach { case (idx, line) =>
      if (open < 0) { if (line != "\\.") open = idx }
      else if (line == "\\.") { rb += ((open + 1, idx)); open = -1L }
    }
    // unterminated COPY at EOF: the block is lost either way; prune the
    // tail so a truncated 100 GB dump doesn't collect its payload
    if (open >= 0) rb += ((open + 1, Long.MaxValue))
    val payload = rb.result()
    val inPayload = (idx: Long) => payload.exists(r => idx >= r._1 && idx < r._2)

    // 3. One distributed pass over non-payload lines: single-line INSERT
    //    statements aggregate to (table, cols, count, firstLine) on the
    //    executors; the remainder IS the DDL — collected, sorted, fed to
    //    the same sequential scanner with real line numbers.
    val SEP = "\u001F"
    val outside = lines.as[(String, Long)].filter(t => !inPayload(t._2))
    val ddl = outside
      .filter(t => !PgDumpParser.prunableInsert(t._1))
      .collect().sortBy(_._2)
    val inserts = outside
      .filter(t => PgDumpParser.prunableInsert(t._1))
      .map { case (l, idx) =>
        val (tbl, colsOpt) = PgDumpParser.PgTuples.header(l).get
        (tbl, colsOpt.map(_.mkString(SEP)).orNull, idx)
      }
      .groupByKey(t => (t._1, Option(t._2)))
      .mapGroups { (key: (String, Option[String]), it: Iterator[(String, String, Long)]) =>
        var n = 0L; var first = Long.MaxValue
        it.foreach { t => n += 1; if (t._3 < first) first = t._3 }
        (key._1, key._2.orNull, n, first)
      }
      .collect().sortBy(_._4)

    val dump0 = PgDumpParser.parseIndexed(ddl.iterator)
    val dump = mergeInserts(dump0, inserts.map { case (t, c, n, _) =>
      (t, Option(c).map(_.split(SEP, -1).toSeq), n) }.toSeq)
    (dump, planOf(dump))
  }

  /** Fold the executor-aggregated INSERT headers into the parsed schema,
    * mirroring the sequential scanner's interpret() for INSERT. */
  private def mergeInserts(d: DumpSchema,
      ins: Seq[(String, Option[Seq[String]], Long)]): DumpSchema = {
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

  /** COPY text-format unescape (postgres/pgdump.go:122-152): a native
    * single-pass Expression (graft.functions.CopyUnescape). The earlier
    * 8-regex chain overflowed Janino's 64 KB method limit once the
    * quarantine predicate inlined it per column, knocking the bulk path
    * out of whole-stage codegen; one static call per field keeps the
    * stage compiled and does the scan in a single pass. */
  def unescapeCopy(c: Column): Column = {
    graft.functions.CopyUnescape.register(SparkSession.active)
    call_function("copy_unescape", c)
  }

  /** The dump as (line, idx) — one distributed text scan, shared by the
    * schema pass's boundary discovery and every table's data read. */
  def indexedLines(spark: SparkSession, path: String): DataFrame =
    graft.sources.DumpLines.indexed(spark, path)

  /** Raw string-typed frame for one table's COPY blocks: one column per
    * COPY column, `\N` → NULL, escapes resolved. Lines whose field count
    * doesn't match the column list are marked `__ragged` — the reference
    * rejects wrong-field-count rows as bad rows (postgres/pgdump.go:146),
    * and without the gate a truncated line would silently become a good
    * row padded with NULLs (element_at out-of-range → null). */
  def readCopyRaw(lines: DataFrame, blocks: Seq[CopyBlock]): DataFrame = {
    require(blocks.nonEmpty)
    val cols = blocks.head.cols
    val inRange = blocks.map(b => col("idx") >= b.startLine && col("idx") < b.endLine)
      .reduce(_ || _)
    val parts = split(col("line"), "\t", -1)
    lines.filter(inRange)
      .select(cols.zipWithIndex.map { case (c, i) =>
        val f = element_at(parts, i + 1)
        when(f === "\\N", lit(null: String))
          .otherwise(unescapeCopy(f)).as(c)
      } :+ (size(parts) =!= cols.length).as("__ragged"): _*)
  }

  /** Raw string-typed frame for one table's INSERT statements,
    * distributed: filter INSERT lines out of the shared text scan, lex
    * tuples per partition (PgDumpParser.PgTuples) — the driver never
    * holds row data even for a 100 GB --inserts dump. Tuples whose
    * arity doesn't match the column list are marked `__ragged`. */
  def readInsertRaw(lines: DataFrame, srcTable: String,
      cols: Seq[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val tbl = srcTable
    val tuples = lines.select("line").as[String]
      .filter((l: String) => l.regionMatches(true, 0, "INSERT INTO ", 0, 12))
      .flatMap((l: String) => PgDumpParser.PgTuples.rowsFor(l, tbl))
    tuples.toDF("v")
      .select(cols.zipWithIndex.map { case (c, i) =>
        element_at(col("v"), i + 1).as(c)
      } :+ (size(col("v")) =!= cols.length).as("__ragged"): _*)
  }

  /** Typed frame + quarantine for one source table. The raw frame has
    * source column names; output has Spanner names and Spanner types.
    * Quarantine rule = any column where input was present but the cast
    * produced NULL (reference's per-row conversion error,
    * postgres/data.go:37-46). */
  def convertTable(spark: SparkSession, plan: SchemaConverter.ConversionPlan,
      srcTable: String, raw: DataFrame): (DataFrame, DataFrame) = {
    val spName = plan.toSpannerTable(srcTable)
    val sp = plan.spSchema(spName)
    val src = plan.srcSchema(srcTable)
    val colMap = plan.toSpannerCols(srcTable)
    val zone = plan.timezone.getOrElse("UTC")

    val present = raw.columns.toSeq.filterNot(_ == "__ragged") // COPY may cover a subset of columns
    // skip source columns with no Spanner counterpart (user removed the
    // column via PlanEdits in a staged run) — their data is dropped, the
    // rest of the row still migrates
    val mapped = present.filter(c =>
      colMap.get(c).exists(sp.colDefs.contains))
    val casts = mapped.map { srcCol =>
      val spCol = colMap(srcCol)
      val d = sp.colDefs(spCol)
      val srcTy = src.colDefs(srcCol).tpe.name
      val in = col(srcCol)
      val out =
        if (d.t.isArray) PgCasts.array(d.t, srcTy, in, zone)
        else PgCasts.scalar(d.t, srcTy, in, zone)
      (spCol, in, out)
    }
    // A row is bad if any present input failed its cast — the dataflow
    // form of the reference's per-row error return. Good rows project to
    // typed Spanner columns; bad rows keep their ORIGINAL strings so the
    // quarantine output is debuggable (K7).
    //
    // Two projections, fenced: stage 1 computes each column's cast and a
    // per-column bad flag (each a small expression → its own
    // JIT-compilable generated method); stage 2 ORs the flags into
    // `__bad` behind an OptimizerBarrier. Without the fence, predicate
    // pushdown substitutes EVERY cast chain into one filter condition —
    // a single generated method past the JVM JIT's 8 KB limit that runs
    // in the bytecode interpreter (measured 6× slower end-to-end).
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

  /** Full pipeline: parse, convert every table (COPY + INSERT data),
    * return typed frames + quarantines. `planOverride` (a session-file
    * plan, possibly user-edited) replaces the freshly-derived plan for
    * -data-only staged runs.
    *
    * Data pass: each table reads through the V2 byte-range source
    * (`format("pgdump")`) by default — ~3× faster than the shared
    * line-scan on the bulk bench (independent 128 MB chunks, no
    * full-file cache, no line-number zip) and the path that handles
    * WRAPPED multi-line INSERT statements. The line-ranged read stays
    * as the per-table fallback for the one shape the V2 source refuses:
    * statements that disagree on column lists (V2 would positionally
    * mis-map; here unionByName reconciles them). When no table needed
    * the fallback the shared line cache is released before returning —
    * the schema pass is done with it and the V2 frames never touch it. */
  def migrate(spark: SparkSession, path: String,
      planOverride: Option[SchemaConverter.ConversionPlan] = None,
      dataViaV2: Boolean = true): Migration = {
    val real = graft.sources.DumpCodec.materialize(spark, path)
    // one cached scan serves boundary discovery AND any line-ranged
    // data read; the cache is MEMORY_AND_DISK, so a 100 GB dump spills
    // instead of OOMing — and Migration.release is the matching
    // unpersist, called by Migrate.run (and the bench queries) once the
    // sinks materialize (or eagerly below when V2 serves every table)
    val lines = indexedLines(spark, real).cache()
    val (dump, freshPlan) = schemaPass(spark, lines)
    val plan = planOverride.getOrElse(freshPlan)
    val byTable = dump.copyBlocks.groupBy(_.table)
    var lineRangedUsed = false

    def lineRangedRaw(srcTable: String): Option[DataFrame] = {
      val copyRaw = byTable.get(srcTable).map(bs => readCopyRaw(lines, bs))
      val insertRaw = dump.insertCols.get(srcTable).map { colsOpt =>
        val cols = colsOpt.getOrElse(dump.tables(srcTable).colNames)
        readInsertRaw(lines, srcTable, cols)
      }
      (copyRaw, insertRaw) match {
        // allowMissingColumns: COPY may name a subset of the columns the
        // INSERTs cover (or vice versa) — absent fields become NULL
        // instead of failing the whole migration at plan time
        case (Some(a), Some(b)) => Some(a.unionByName(b, allowMissingColumns = true))
        case (a, b)             => a.orElse(b)
      }
    }

    val tables = plan.srcSchema.keys.map { srcTable =>
      val spName = plan.toSpannerTable(srcTable)
      val hasData =
        byTable.contains(srcTable) || dump.insertCols.contains(srcTable)
      val raw: Option[DataFrame] =
        if (!hasData) None
        else if (dataViaV2) {
          try Some(spark.read.format("pgdump").option("table", srcTable).load(real))
          catch { case _: IllegalArgumentException =>
            // disagreeing column lists (or a column-less statement with
            // no CREATE TABLE): the V2 source refuses, unionByName copes
            lineRangedUsed = true
            lineRangedRaw(srcTable)
          }
        } else { lineRangedUsed = true; lineRangedRaw(srcTable) }
      val frames = raw match {
        case Some(r) => convertTable(spark, plan, srcTable, r)
        case None => // schema-only table: empty frames
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
