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
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.functions.CopyUnescape

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
  * pruning is pushed into the reader: unprojected fields are never
  * unescaped or allocated (`ReadSchema` in `.explain` shows the pruned
  * list).
  *
  * Boundary discovery runs once per (path, mtime) and is the same
  * degradation-free classifier as [[PgDumpReader.schemaPass]]: one
  * distributed pass collects COPY headers and `\.` terminators (~2 rows
  * per table) with their byte offsets; headers without a column list
  * fall back to a second pass that collects the (KB-sized) DDL stream
  * and reads the column order from CREATE TABLE. Limitations, shared
  * with the line-ranged reader: single-line COPY headers, uncompressed
  * input (byte seeks), INSERT-carried rows not served (use
  * [[PgDumpReader.migrate]] for --inserts dumps).
  */
final class PgDumpTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pgdump"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PgDumpV2.schemaFor(PgDumpV2.pathOf(options), PgDumpV2.tableOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new PgDumpV2Table(PgDumpV2.pathOf(opts), PgDumpV2.tableOf(opts), schema,
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
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new PgDumpScan(path, table, full, required, chunkBytes)
}

private[pgdump] final class PgDumpScan(path: String, table: Option[String],
    full: StructType, required: StructType, chunkBytes: Option[Long])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"pgdump $path${table.fold("")("#" + _)} ReadSchema: ${required.catalogString}"

  /** Payload byte size of this table's COPY regions — without it a V2
    * relation sizes as defaultSizeInBytes (effectively infinite) and a
    * KB-sized dimension table read from a dump could never win an
    * auto-broadcast join against a fact table. */
  override def estimateStatistics(): Statistics = {
    val regions = PgDumpV2.regionsFor(PgDumpV2.discover(path), table)
    val bytes = regions.map(r => r.termStart - r.headerStart).sum
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
    val regions = PgDumpV2.regionsFor(d, table)
    val total = regions.map(r => r.termStart - r.headerStart).sum
    val step = graft.sources.DumpChunks.step(total, chunkBytes, spark)
    val parts = Array.newBuilder[InputPartition]
    regions.foreach { r =>
      var s = r.headerStart
      while (s < r.termStart) {
        val e = math.min(s + step, r.termStart)
        // the region-final chunk must not consume the `\.` terminator
        // line that starts exactly at termStart (readers emit lines
        // whose start offset is <= end)
        parts += PgCopyPartition(s, if (e == r.termStart) e - 1 else e)
        s = e
      }
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = PgDumpV2.colsFor(path, table)
    val proj = required.fields.map { f =>
      if (f.name == PgDumpV2.RaggedCol) -1 else cols.indexOf(f.name)
    }
    new PgCopyReaderFactory(path,
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()),
      cols.length, proj)
  }
}

private[pgdump] final case class PgCopyPartition(start: Long, end: Long)
    extends InputPartition

private[pgdump] final class PgCopyReaderFactory(path: String,
    conf: SerializableConfiguration, nCols: Int, proj: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val c = p.asInstanceOf[PgCopyPartition]
    new PgCopyReader(path, conf, c.start, c.end, nCols, proj)
  }
}

/** Streams the payload lines of one byte chunk. Hadoop split semantics:
  * seek to `start`, discard one (possibly partial) line — at the region
  * head that discard IS the COPY header — then emit every line whose
  * start offset is <= `end`. A line straddling `end` is consumed whole
  * here and discarded as the partial first line of the next chunk, so
  * every payload line lands in exactly one partition. */
private[pgdump] final class PgCopyReader(path: String,
    conf: SerializableConfiguration, start: Long, end: Long, nCols: Int,
    proj: Array[Int]) extends PartitionReader[InternalRow] {
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

  override def next(): Boolean = {
    if (pos > end) return false
    val consumed = lines.readLine(text)
    if (consumed == 0) return false
    pos += consumed
    row = parse(text.toString)
    true
  }

  private def parse(line: String): InternalRow = {
    val parts = line.split("\t", -1)
    val vals = new Array[Any](proj.length)
    var j = 0
    while (j < proj.length) {
      val k = proj(j)
      vals(j) =
        if (k < 0) parts.length != nCols // __ragged
        else if (k >= parts.length || parts(k) == "\\N") null
        else CopyUnescape.unescape(UTF8String.fromString(parts(k)))
      j += 1
    }
    new GenericInternalRow(vals)
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
      /** CREATE TABLE column order, resolved lazily — only consulted for
        * headers without an explicit column list. */
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

  /** Boundary discovery, cached per (path, mtime): one distributed pass
    * over the dump collects COPY headers and `\.` terminators with byte
    * offsets (~2 rows per table — O(metadata), the payload never leaves
    * the executors) and resolves them with the sequential scanner's
    * state rules (the first `\.` after a header closes it; header
    * lookalikes inside an open payload are data). */
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

    Discovery(regions, () => {
      // second (lazy) pass, only for column-less headers: the DDL stream
      // is every line outside all payload regions that isn't a prunable
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
    })
  }

  def regionsFor(d: Discovery, table: Option[String]): Seq[Region] = {
    val names = d.regions.map(_.table).distinct
    val chosen = table.getOrElse {
      require(names.size == 1,
        s"dump has ${names.size} tables (${names.mkString(", ")}); " +
          "pick one with .option(\"table\", ...)")
      names.head
    }
    val rs = d.regions.filter(_.table == chosen)
    require(rs.nonEmpty,
      s"no COPY payload for table '$chosen' (tables with COPY data: " +
        s"${names.mkString(", ")}; INSERT-carried rows need PgDumpReader.migrate)")
    rs
  }

  /** The COPY column order for the table — header list, or CREATE TABLE
    * order for a column-less `COPY t FROM stdin;`. Multiple COPY blocks
    * must agree (same assumption as readCopyRaw). */
  def colsFor(path: String, table: Option[String]): Seq[String] = {
    val d = discover(path)
    val rs = regionsFor(d, table)
    val lists = rs.map(r =>
      r.cols.getOrElse(d.ddlCols().getOrElse(r.table,
        throw new IllegalArgumentException(
          s"COPY for '${r.table}' names no columns and no CREATE TABLE found"))))
    require(lists.distinct.size == 1,
      s"COPY blocks for '${rs.head.table}' disagree on column lists")
    lists.head
  }

  def schemaFor(path: String, table: Option[String]): StructType =
    StructType(colsFor(path, table).map(c =>
      StructField(c, StringType, nullable = true)) :+
      StructField(RaggedCol, BooleanType, nullable = false))
}
