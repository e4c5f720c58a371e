package graft.sources.pgdump

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.functions.CopyUnescape
import graft.sources.{DumpChunks, DumpFilters, DumpInserts}

/** `spark.read.format("pgdump")` — the COPY payload of one table in a
  * pg_dump file as a first-class DataSource V2 table.
  *
  *   spark.read.format("pgdump")
  *     .option("table", "lineitem")     // required unless the dump has one table
  *     .load("/path/dump.pgdump")
  *
  * Output schema = the COPY column list as nullable strings (`\N` → NULL,
  * escapes resolved byte-for-byte like the reference,
  * postgres/pgdump.go:122-152) plus a `__ragged` boolean marking rows
  * whose field count doesn't match the column list — identical raw
  * semantics to [[PgDumpReader.readCopyRaw]], pinned by
  * PgDumpV2SourceSpec. Typed migration (casts, synthetic PKs,
  * quarantine) stays in [[PgDumpReader.migrate]]; this source is the
  * idiomatic entry for ad-hoc relational work over a dump without
  * running a migration.
  *
  * Why a V2 source and not just `readCopyRaw`: the scan plans BYTE-RANGE
  * partitions directly into the COPY payload (split size =
  * `spark.sql.files.maxPartitionBytes`, floored at one split per core),
  * so a 100 GB payload reads as ~800 independent 128 MB chunks with no
  * shared full-file text scan, no cache, and no line-number zip — each
  * reader seeks, aligns to the next line boundary (standard Hadoop split
  * semantics: skip the first partial line unless at the payload head,
  * read one line past the end boundary), and streams its slice. Column
  * pruning and EqualTo/IsNull/IsNotNull filters are pushed into the
  * reader (`ReadSchema` / `PushedFilters` in `.explain`).
  *
  * Boundary discovery runs once per (path, mtime) and is the same
  * degradation-free classifier as [[PgDumpReader.schemaPass]]: one
  * distributed pass collects COPY headers and `\.` terminators (~2 rows
  * per table) with their byte offsets; headers without a column list
  * fall back to a memoized pass that collects the (KB-sized) DDL stream
  * and reads the column order from CREATE TABLE. INSERT-carried rows
  * (--inserts dumps, or mixed dumps like the fixture's `unkeyed` table)
  * are served too: a second discovery pass aggregates INSERT headers
  * per table on the executors and the scan adds extent-bounded chunks
  * (COPY payload regions SUBTRACTED — a payload data line that
  * textually looks like an INSERT is data, never a row source, and
  * another table's payload bytes are never rescanned) whose readers
  * lex tuples with the migration path's lexer. Limitations, shared
  * with the line-ranged reader: single-line COPY headers and
  * (semicolon-terminated) single-line INSERT statements, uncompressed
  * input (byte seeks).
  */
final class PgDumpTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pgdump"

  // gzip'd dumps inflate once to scratch (DumpCodec) — byte-range
  // partitioning needs seekable uncompressed bytes; everything below
  // (discovery, stats, readers) operates on the inflated path
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PgDumpV2.schemaFor(PgDumpV2.realPathOf(options), PgDumpV2.tableOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new PgDumpV2Table(PgDumpV2.realPathOf(opts), PgDumpV2.tableOf(opts), schema,
      Option(opts.get("chunkBytes")).map(_.toLong))
  }
}

private[pgdump] final class PgDumpV2Table(path: String, table: Option[String],
    schema: StructType, chunkBytes: Option[Long]) extends Table with SupportsRead {
  override def name(): String = s"pgdump`$path`" + table.fold("")("#" + _)
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PgDumpScanBuilder(path, table, schema, chunkBytes)
}

private[pgdump] final class PgDumpScanBuilder(path: String, table: Option[String],
    full: StructType, chunkBytes: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var compiled: Array[DumpFilters.Pushed] = Array.empty
  private var accepted: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // best-effort pushdown (see DumpFilters): readers skip non-matching
  // rows early, and every filter is ALSO returned as residual so Spark
  // re-applies it — correctness never rests on the reader's evaluation
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (c, a) = DumpFilters.compile(filters, PgDumpV2.colsFor(path, table))
    compiled = c; accepted = a
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan =
    new PgDumpScan(path, table, full, required, chunkBytes, compiled)
}

private[pgdump] final class PgDumpScan(path: String, table: Option[String],
    full: StructType, required: StructType, chunkBytes: Option[Long],
    pushed: Array[DumpFilters.Pushed])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"pgdump $path${table.fold("")("#" + _)} ReadSchema: ${required.catalogString}"

  /** Payload byte size of this table's COPY regions plus its INSERT
    * lines — without it a V2 relation sizes as defaultSizeInBytes
    * (effectively infinite) and a KB-sized dimension table read from a
    * dump could never win an auto-broadcast join against a fact table. */
  override def estimateStatistics(): Statistics = {
    val d = PgDumpV2.discover(path)
    val tbl = PgDumpV2.resolveTable(d, table)
    val bytes = d.regions.filter(_.table == tbl)
      .map(r => r.termStart - r.headerStart).sum +
      d.inserts.bytes.getOrElse(tbl, 0L)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val d = PgDumpV2.discover(path)
    val tbl = PgDumpV2.resolveTable(d, table)
    val regions = d.regions.filter(_.table == tbl)
    val insExt = d.inserts.extents.get(tbl)
    val total = regions.map(r => r.termStart - r.headerStart).sum +
      insExt.map { case (lo, hi) => hi - lo + 1 }.getOrElse(0L)
    val step = DumpChunks.step(total, chunkBytes, spark)
    val parts = Array.newBuilder[InputPartition]
    regions.foreach { r =>
      var s = r.headerStart
      while (s < r.termStart) {
        val e = math.min(s + step, r.termStart)
        // the region-final chunk must not consume the `\.` terminator
        // line that starts exactly at termStart (readers emit lines
        // whose start offset is <= end)
        parts += PgDumpChunk(s, if (e == r.termStart) e - 1 else e, insert = false)
        s = e
      }
    }
    // INSERT-carried rows: chunk the table's [first INSERT, last INSERT]
    // byte extent MINUS every COPY payload region — a payload line that
    // textually looks like an INSERT is data, and another table's
    // payload must not be rescanned. Starting one byte early makes the
    // reader's discard-first-line rule land exactly on the first INSERT.
    insExt.foreach { case (minOff, maxOff) =>
      val lo = if (minOff == 0) 0L else minOff - 1
      DumpInserts.chunkRanges(lo, maxOff + 1,
          d.regions.map(r => (r.headerStart, r.termStart)), step)
        .foreach { case (s, e) => parts += PgDumpChunk(s, e, insert = true) }
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val d = PgDumpV2.discover(path)
    val tbl = PgDumpV2.resolveTable(d, table)
    val cols = PgDumpV2.colsFor(path, table)
    val proj = required.fields.map { f =>
      if (f.name == PgDumpV2.RaggedCol) -1 else cols.indexOf(f.name)
    }
    new PgDumpReaderFactory(path,
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()),
      tbl, d.regions.map(r => (r.headerStart, r.termStart)).toArray,
      cols.length, proj, pushed)
  }
}

private[pgdump] final case class PgDumpChunk(start: Long, end: Long,
    insert: Boolean) extends InputPartition

private[pgdump] final class PgDumpReaderFactory(path: String,
    conf: SerializableConfiguration, table: String,
    payloadRanges: Array[(Long, Long)], nCols: Int, proj: Array[Int],
    pushed: Array[DumpFilters.Pushed]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val c = p.asInstanceOf[PgDumpChunk]
    if (c.insert) {
      // the same classifier discovery indexed (prunableInsert), the same
      // lexer the migration path uses — extent/stats and served rows
      // stay consistent, and payload ranges are excluded belt-and-braces
      // on top of the chunk-plan subtraction
      val tbl = table
      new DumpInserts.TupleReader(path, conf, c.start, c.end, payloadRanges,
        nCols, proj, pushed,
        isStart = PgDumpParser.insertStart,
        newScanner = DumpInserts.StmtScanner.pg _,
        lex = stmt => PgDumpParser.PgTuples.rowsFor(stmt, tbl).iterator)
    } else new PgCopyReader(path, conf, c.start, c.end, nCols, proj, pushed)
  }
}

/** Streams the payload lines of one byte chunk. Hadoop split semantics:
  * seek to `start`, discard one (possibly partial) line — at the region
  * head that discard IS the COPY header — then emit every line whose
  * start offset is <= `end`. A line straddling `end` is consumed whole
  * here and discarded as the partial first line of the next chunk, so
  * every payload line lands in exactly one partition. Pushed filters
  * compare UTF8String values against precomputed comparands; each
  * field is unescaped at most once per line (shared between filter
  * evaluation and row construction). */
private[pgdump] final class PgCopyReader(path: String,
    conf: SerializableConfiguration, start: Long, end: Long, nCols: Int,
    proj: Array[Int], pushed: Array[DumpFilters.Pushed])
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(path)
    val stream = p.getFileSystem(conf.value).open(p)
    stream.seek(start)
    stream
  }
  private val lines = new LineReader(in)
  private val text = new Text()
  private var pos = start + lines.readLine(text) // discard header/partial
  private var row: InternalRow = _
  // comparands as UTF8String, converted once per task not per line
  private val pushedU: Array[(Int, Int, UTF8String)] = pushed.map(p =>
    (p.colIdx, p.op, if (p.value == null) null else UTF8String.fromString(p.value)))

  // per-line unescape cache, shared by filter eval and row construction
  private var parts: Array[String] = _
  private var cache: Array[UTF8String] = _
  private var cached: Array[Boolean] = _

  private def field(k: Int): UTF8String = {
    if (k >= parts.length || parts(k) == "\\N") return null
    if (!cached(k)) {
      cache(k) = CopyUnescape.unescape(UTF8String.fromString(parts(k)))
      cached(k) = true
    }
    cache(k)
  }

  private def filtersPass(): Boolean = {
    var i = 0
    while (i < pushedU.length) {
      val (k, op, v) = pushedU(i)
      val f = field(k)
      val ok = op match {
        case 0 => f != null && f == v
        case 1 => f != null
        case _ => f == null
      }
      if (!ok) return false
      i += 1
    }
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (pos > end) return false
      val consumed = lines.readLine(text)
      if (consumed == 0) return false
      pos += consumed
      parts = text.toString.split("\t", -1)
      cache = new Array[UTF8String](parts.length)
      cached = new Array[Boolean](parts.length)
      if (filtersPass()) {
        val vals = new Array[Any](proj.length)
        var j = 0
        while (j < proj.length) {
          val k = proj(j)
          vals(j) =
            if (k < 0) parts.length != nCols // __ragged
            else field(k)
          j += 1
        }
        row = new GenericInternalRow(vals)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = { lines.close(); in.close() }
}

private[pgdump] object PgDumpV2 {
  val RaggedCol = "__ragged"

  /** One COPY payload region: [headerStart, termStart) byte offsets of
    * the header line and the `\.` terminator line. */
  final case class Region(table: String, cols: Option[Seq[String]],
      headerStart: Long, termStart: Long)

  final case class Discovery(regions: Seq[Region],
      /** Per-table INSERT metadata (column-list variants, extents,
        * byte totals). */
      inserts: DumpInserts.Index,
      /** CREATE TABLE column order, memoized — only consulted for
        * statements without an explicit column list. */
      ddlCols: () => Map[String, Seq[String]])

  // one live entry per path (mtime stored alongside): regenerating and
  // re-reading the same file replaces its entry instead of accumulating
  // stale ones that pin collected arrays for the session's lifetime
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Discovery)]()

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "pgdump source needs exactly one load(path) — multi-path reads are " +
        "not supported (each dump is one file)")
    p
  }

  def tableOf(options: CaseInsensitiveStringMap): Option[String] =
    Option(options.get("table"))

  /** [[pathOf]] with compressed input materialized (DumpCodec). */
  def realPathOf(options: CaseInsensitiveStringMap): String =
    graft.sources.DumpCodec.materialize(SparkSession.active, pathOf(options))

  /** Boundary discovery, cached per path (replaced on mtime change):
    * pass 1 collects COPY headers and `\.` terminators with byte
    * offsets (~2 rows per table — O(metadata), the payload never leaves
    * the executors) and resolves them with the sequential scanner's
    * state rules (the first `\.` after a header closes it; header
    * lookalikes inside an open payload are data); pass 2 aggregates
    * single-line INSERT headers OUTSIDE those payload regions per
    * (table, column-list) on the executors — min/max offsets and byte
    * totals only, so a --inserts dump with row-count many statements
    * still collects O(distinct tables). */
  def discover(path: String): Discovery = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val mtime = p.getFileSystem(conf).getFileStatus(p).getModificationTime
    cache.compute(path, (_, prev) =>
      if (prev != null && prev._1 == mtime) prev
      else (mtime, runDiscovery(spark, path, conf)))._2
  }

  private def lineOffsets(spark: SparkSession, path: String,
      conf: Configuration) =
    spark.sparkContext.newAPIHadoopFile(path, classOf[TextInputFormat],
      classOf[LongWritable], classOf[Text], conf)

  // precompiled: the classifier runs per LINE of the dump, and
  // String.matches would re-compile the pattern every call; the cheap
  // "COPY<ws>" prefix gate keeps the 100 GB payload off the regex path
  // entirely (payload lines are data, not headers)
  private val headerPat = java.util.regex.Pattern.compile(
    "(?is)^COPY\\s+.+\\s+FROM\\s+stdin\\s*;\\s*$")

  private def isCopyHeader(l: String): Boolean =
    l.length >= 5 && l.regionMatches(true, 0, "COPY", 0, 4) &&
      Character.isWhitespace(l.charAt(4)) && headerPat.matcher(l).matches()

  private def runDiscovery(spark: SparkSession, path: String,
      conf: Configuration): Discovery = {
    val cands = lineOffsets(spark, path, conf)
      .flatMap { case (k, v) => // extract before collect: Writables are reused
        val l = v.toString
        if (l == "\\." || isCopyHeader(l)) Some((k.get, l)) else None
      }
      .collect().sortBy(_._1)

    val rb = Seq.newBuilder[Region]
    var open: Option[(Long, String)] = None
    cands.foreach { case (off, line) =>
      open match {
        case None => if (line != "\\.") open = Some((off, line))
        case Some((hs, header)) if line == "\\." =>
          PgDumpParser.copyHeaderOf(header.trim.stripSuffix(";") + ";")
            .foreach { case (tbl, cols) => rb += Region(tbl, cols, hs, off) }
          open = None
        case _ => // header lookalike inside an open payload: data
      }
    }
    // unterminated COPY at EOF: serve what's there (the line-ranged
    // reader makes the same call)
    open.foreach { case (hs, header) =>
      val len = new Path(path).getFileSystem(conf)
        .getFileStatus(new Path(path)).getLen
      PgDumpParser.copyHeaderOf(header.trim.stripSuffix(";") + ";")
        .foreach { case (tbl, cols) => rb += Region(tbl, cols, hs, len) }
    }
    val regions = rb.result()
    val payload = regions.map(r => (r.headerStart, r.termStart))

    // pass 2: INSERT headers outside COPY payloads, aggregated per
    // (table, cols) on the executors — (minOff, maxOff, byteLen) per key
    val headers = lineOffsets(spark, path, conf)
      .flatMap { case (k, v) =>
        val off = k.get
        val len = v.getLength.toLong
        val l = v.toString
        // statement STARTS, terminated on their line or not (wrapped
        // statements assemble in the reader); `len` counts the first
        // line only for a wrapped statement — the size statistic
        // undercounts, which can only make broadcast planning more
        // conservative
        if (payload.exists(r => off > r._1 && off < r._2)) None
        else if (!PgDumpParser.insertStart(l)) None
        else PgDumpParser.PgTuples.startHeader(l).map { case (tbl, colsOpt) =>
          ((tbl, colsOpt.map(_.mkString(DumpInserts.SEP)).orNull), (off, off, len))
        }
      }
      .reduceByKey((a, b) =>
        (math.min(a._1, b._1), math.max(a._2, b._2), a._3 + b._3))
      .collect()
    val inserts = DumpInserts.fold(headers)

    lazy val ddl = { // memoized: one job total, not one per colsFor call
      // lazy pass, only for column-less statements: the DDL stream is
      // every line outside all payload regions that isn't a prunable
      // INSERT — KBs even for a 100 GB dump. SparkSession resolved at
      // call time so the cached closure never pins a stopped session.
      val ranges = regions.map(r => (r.headerStart, r.termStart))
      val s2 = SparkSession.active
      val stmts = lineOffsets(s2, path, s2.sessionState.newHadoopConf())
        .flatMap { case (k, v) =>
          val off = k.get
          val inside = ranges.exists(r => off >= r._1 && off <= r._2)
          val l = v.toString
          if (inside || PgDumpParser.prunableInsert(l)) None
          else Some((off, l))
        }
        .collect().sortBy(_._1)
      PgDumpParser.parse(stmts.iterator.map(_._2)).tables
        .map { case (name, t) => name -> t.colNames }
    }
    Discovery(regions, inserts, () => ddl)
  }

  def resolveTable(d: Discovery, table: Option[String]): String = {
    val names = (d.regions.map(_.table) ++ d.inserts.colVariants.keys).distinct
    val chosen = table.getOrElse {
      require(names.size == 1,
        s"dump has ${names.size} tables (${names.mkString(", ")}); " +
          "pick one with .option(\"table\", ...)")
      names.head
    }
    require(names.contains(chosen),
      s"no COPY or INSERT data for table '$chosen' (tables with data: " +
        s"${names.mkString(", ")})")
    chosen
  }

  /** The column order for the table — COPY header list (or CREATE TABLE
    * order for a column-less statement), with the INSERT header list
    * backing INSERT-only tables. EVERY statement variant — multiple
    * COPY blocks, every distinct INSERT column list, and COPY-vs-INSERT
    * — must agree on one list: disagreeing variants would be
    * positionally mis-mapped, so the source refuses instead (migrate()
    * unions by name and handles them). */
  def colsFor(path: String, table: Option[String]): Seq[String] = {
    val d = discover(path)
    val tbl = resolveTable(d, table)
    def fromDdl = d.ddlCols().getOrElse(tbl,
      throw new IllegalArgumentException(
        s"data for '$tbl' names no columns and no CREATE TABLE found"))
    val lists =
      d.regions.filter(_.table == tbl).map(_.cols.getOrElse(fromDdl)) ++
        d.inserts.colVariants.getOrElse(tbl, Nil).map(_.getOrElse(fromDdl))
    require(lists.distinct.size == 1,
      s"COPY/INSERT statements for '$tbl' disagree on column lists " +
        "(use PgDumpReader.migrate, which unions by name)")
    lists.head
  }

  def schemaFor(path: String, table: Option[String]): StructType =
    StructType(colsFor(path, table).map(c =>
      StructField(c, StringType, nullable = true)) :+
      StructField(RaggedCol, BooleanType, nullable = false))
}
