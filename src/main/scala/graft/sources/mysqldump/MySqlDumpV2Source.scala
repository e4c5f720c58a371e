package graft.sources.mysqldump

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

/** `spark.read.format("mysqldump")` — one table's extended-INSERT rows in
  * a mysqldump file as a DataSource V2 table; the pgdump source's sibling
  * (see [[graft.sources.pgdump.PgDumpTableProvider]] for the shared
  * rationale).
  *
  * The partitioning story is simpler than pgdump's: mysqldump data is one
  * self-identifying `INSERT INTO t ... VALUES (...),(...);` statement per
  * line (bounded by max-allowed-packet ~24 MB, mysql/mysqldump.go:84-87),
  * so the scan plans plain byte chunks — bounded to the TARGET table's
  * [first INSERT, last INSERT] extent, so reading a 1 GB table out of a
  * 100 GB dump never scans the other tables' data — and each reader
  * classifies the lines in its chunk. Discovery runs two bounded jobs:
  * (a) resolve DELIMITER-block byte ranges, so procedure-body INSERTs
  * are excluded exactly like the migration path, and (b) aggregate
  * INSERT headers per table on the executors (column list of the first
  * header, min/max offsets; CREATE TABLE order backs column-less
  * INSERTs). Tuple lexing inside the reader is the same quote-aware
  * [[MySqlDumpReader.Tuples]] the migration path uses, so raw-row parity
  * is by construction (and pinned by MySqlDumpV2SourceSpec).
  */
final class MySqlDumpTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mysqldump"

  // gzip'd dumps inflate once to scratch (DumpCodec) — byte-range
  // partitioning needs seekable uncompressed bytes; everything below
  // (discovery, stats, readers) operates on the inflated path
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MySqlDumpV2.schemaFor(MySqlDumpV2.realPathOf(options),
      MySqlDumpV2.tableOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MySqlDumpV2Table(MySqlDumpV2.realPathOf(opts), MySqlDumpV2.tableOf(opts),
      schema, Option(opts.get("chunkBytes")).map(_.toLong))
  }
}

private[mysqldump] final class MySqlDumpV2Table(path: String,
    table: Option[String], schema: StructType, chunkBytes: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"mysqldump`$path`" + table.fold("")("#" + _)
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MySqlDumpScanBuilder(path, table, schema, chunkBytes)
}

private[mysqldump] final class MySqlDumpScanBuilder(path: String,
    table: Option[String], full: StructType, chunkBytes: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var compiled: Array[graft.sources.DumpFilters.Pushed] = Array.empty
  private var accepted: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // best-effort pushdown (see DumpFilters): readers skip non-matching
  // tuples early, and every filter is ALSO returned as residual so Spark
  // re-applies it — correctness never rests on the reader's evaluation
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (c, a) = graft.sources.DumpFilters.compile(
      filters, MySqlDumpV2.colsFor(path, table))
    compiled = c; accepted = a
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan =
    new MySqlDumpScan(path, table, full, required, chunkBytes, compiled)
}

private[mysqldump] final class MySqlDumpScan(path: String,
    table: Option[String], full: StructType, required: StructType,
    chunkBytes: Option[Long],
    pushed: Array[graft.sources.DumpFilters.Pushed]) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mysqldump $path${table.fold("")("#" + _)} ReadSchema: ${required.catalogString}"

  /** Exact INSERT-line byte total of the target table (aggregated
    * during discovery) — without it a V2 relation sizes as
    * defaultSizeInBytes (effectively infinite) and a KB-sized dimension
    * table read from a dump could never win an auto-broadcast join. */
  override def estimateStatistics(): Statistics = {
    val d = MySqlDumpV2.discover(path)
    val bytes = d.inserts.bytes(MySqlDumpV2.resolveTable(d, table))
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val d = MySqlDumpV2.discover(path)
    val tbl = MySqlDumpV2.resolveTable(d, table)
    // chunk only the byte extent [first INSERT line, last INSERT line] of
    // the TARGET table — reading table A out of a dump that is 99% table
    // B must not scan B's data. Starting one byte before the first line
    // start makes the reader's discard-first-(partial)-line rule land
    // exactly on the first INSERT (it consumes the preceding newline).
    val (minOff, maxOff) = d.inserts.extents(tbl)
    val lo = if (minOff == 0) 0L else minOff - 1
    val hi = maxOff + 1
    val step = graft.sources.DumpChunks.step(hi - lo, chunkBytes, spark)
    // DELIMITER-block bodies subtracted at plan time (readers exclude
    // them per line too) — a large procedure body inside the extent is
    // never scanned
    graft.sources.DumpInserts
      .chunkRanges(lo, hi, d.delimiterBlocks, step)
      .map { case (s, e) => MySqlChunkPartition(s, e): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val d = MySqlDumpV2.discover(path)
    val tbl = MySqlDumpV2.resolveTable(d, table)
    val cols = MySqlDumpV2.colsFor(path, table)
    val proj = required.fields.map { f =>
      if (f.name == MySqlDumpV2.RaggedCol) -1 else cols.indexOf(f.name)
    }
    new MySqlInsertReaderFactory(path,
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()),
      tbl, d.delimiterBlocks.toArray, cols.length, proj, pushed)
  }
}

private[mysqldump] final case class MySqlChunkPartition(start: Long, end: Long)
    extends InputPartition

private[mysqldump] final class MySqlInsertReaderFactory(path: String,
    conf: SerializableConfiguration, table: String,
    blocks: Array[(Long, Long)], nCols: Int, proj: Array[Int],
    pushed: Array[graft.sources.DumpFilters.Pushed])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val c = p.asInstanceOf[MySqlChunkPartition]
    // the same classifier discovery indexed (prunableInsert + table
    // match), the same lexer the migration path uses — extent/stats and
    // served rows stay consistent; DELIMITER-block bodies are excluded
    // so procedure-body INSERTs never become rows
    val tbl = table
    new graft.sources.DumpInserts.TupleReader(path, conf, c.start, c.end,
      blocks, nCols, proj, pushed,
      isStart = MySqlDumpReader.insertStart,
      newScanner = graft.sources.DumpInserts.StmtScanner.mysql _,
      lex = stmt =>
        if (MySqlDumpReader.isInsertFor(stmt, tbl))
          MySqlDumpReader.Tuples.parseLine(stmt).iterator
        else Iterator.empty)
  }
}

private[mysqldump] object MySqlDumpV2 {
  val RaggedCol = "__ragged"

  final case class Discovery(
      fileLen: Long,
      /** [openLineStart, closeLineStart] byte ranges of DELIMITER blocks. */
      delimiterBlocks: Seq[(Long, Long)],
      /** Per-table INSERT metadata (column-list variants, extents,
        * byte totals — aggregated on the executors). */
      inserts: graft.sources.DumpInserts.Index,
      /** CREATE TABLE column order, memoized. */
      ddlCols: () => Map[String, Seq[String]])

  // one live entry per path (mtime stored alongside): regenerating and
  // re-reading the same file replaces its entry instead of accumulating
  // stale ones that pin collected arrays for the session's lifetime
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Discovery)]()

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "mysqldump source needs exactly one load(path) — multi-path reads " +
        "are not supported (each dump is one file)")
    p
  }

  def tableOf(options: CaseInsensitiveStringMap): Option[String] =
    Option(options.get("table"))

  /** [[pathOf]] with compressed input materialized (DumpCodec). */
  def realPathOf(options: CaseInsensitiveStringMap): String =
    graft.sources.DumpCodec.materialize(SparkSession.active, pathOf(options))

  /** Two bounded distributed jobs: (1) collect DELIMITER lines (~2 per
    * trigger/routine) and resolve block ranges with the sequential
    * scanner's rules; (2) aggregate INSERT headers outside those blocks
    * PER (table, column-list) ON THE EXECUTORS — min/max offsets only —
    * so the driver collect is O(distinct tables), not O(statements).
    * A --skip-extended-insert dump (one INSERT per row) has row-count
    * many headers; collecting them raw would OOM the driver exactly
    * where the migration path's groupByKey schema pass survives. */
  def discover(path: String): Discovery = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val st = p.getFileSystem(conf).getFileStatus(p)
    val mtime = st.getModificationTime
    cache.compute(path, (_, prev) =>
      if (prev != null && prev._1 == mtime) prev
      else (mtime, runDiscovery(spark, path, conf, st.getLen)))._2
  }

  private def lineOffsets(spark: SparkSession, path: String,
      conf: Configuration) =
    spark.sparkContext.newAPIHadoopFile(path, classOf[TextInputFormat],
      classOf[LongWritable], classOf[Text], conf)


  private def runDiscovery(spark: SparkSession, path: String,
      conf: Configuration, fileLen: Long): Discovery = {
    // job 1: DELIMITER block boundaries (tiny collect)
    val dcands = lineOffsets(spark, path, conf)
      .flatMap { case (k, v) => // extract before collect: Writables are reused
        val l = v.toString
        if (l.trim.regionMatches(true, 0, "DELIMITER", 0, 9))
          Some((k.get, l.trim.split("\\s+").lift(1).getOrElse(";")))
        else None
      }
      .collect().sortBy(_._1)

    val rb = Seq.newBuilder[(Long, Long)]
    var open = -1L
    dcands.foreach { case (off, arg) =>
      if (open < 0) { if (arg != ";") open = off }
      else if (arg == ";") { rb += ((open, off)); open = -1L }
    }
    if (open >= 0) rb += ((open, Long.MaxValue)) // unterminated block
    val blocks = rb.result()

    // job 2: INSERT headers outside blocks, aggregated per (table, cols)
    // on the executors — only (minOff, maxOff, byteLen) per key reaches
    // the driver
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
        if (blocks.exists(b => off > b._1 && off < b._2)) None
        else if (!MySqlDumpReader.insertStart(l)) None
        else MySqlDumpParser.InsertHeader.startHeader(l).map { case (tbl, colsOpt) =>
          ((tbl, colsOpt.map(_.mkString(graft.sources.DumpInserts.SEP)).orNull),
            (off, off, len))
        }
      }
      .reduceByKey((a, b) =>
        (math.min(a._1, b._1), math.max(a._2, b._2), a._3 + b._3))
      .collect()
    val inserts = graft.sources.DumpInserts.fold(headers)

    lazy val ddl = { // memoized: one job total, not one per colsFor call
      // lazy job, only for column-less INSERTs: collect the DDL stream
      // (INSERT data pruned, DELIMITER-block contents kept — the
      // sequential scanner skips those itself). SparkSession resolved at
      // call time so the cached closure never pins a stopped session.
      val s2 = SparkSession.active
      val stmts = lineOffsets(s2, path, s2.sessionState.newHadoopConf())
        .flatMap { case (k, v) =>
          val off = k.get
          val l = v.toString
          val inside = blocks.exists(b => off >= b._1 && off <= b._2)
          if (inside || !MySqlDumpReader.prunableInsert(l)) Some((off, l))
          else None
        }
        .collect().sortBy(_._1)
      MySqlDumpParser.parse(stmts.iterator.map(_._2)).tables
        .map { case (name, t) => name -> t.colNames }
    }
    Discovery(fileLen, blocks, inserts, () => ddl)
  }

  def resolveTable(d: Discovery, table: Option[String]): String = {
    val names = d.inserts.colVariants.keys.toSeq
    val chosen = table.getOrElse {
      require(names.size == 1,
        s"dump has ${names.size} tables with INSERT data " +
          s"(${names.mkString(", ")}); pick one with .option(\"table\", ...)")
      names.head
    }
    require(d.inserts.colVariants.contains(chosen),
      s"no INSERT data for table '$chosen' (tables with data: " +
        s"${names.mkString(", ")})")
    chosen
  }

  /** EVERY INSERT column-list variant must agree on one list —
    * disagreeing variants would be positionally mis-mapped, so the
    * source refuses instead (the migration path unions by name). */
  def colsFor(path: String, table: Option[String]): Seq[String] = {
    val d = discover(path)
    val tbl = resolveTable(d, table)
    def fromDdl = d.ddlCols().getOrElse(tbl,
      throw new IllegalArgumentException(
        s"column-less INSERT for '$tbl' and no CREATE TABLE found"))
    val lists = d.inserts.colVariants(tbl).map(_.getOrElse(fromDdl))
    require(lists.distinct.size == 1,
      s"INSERT statements for '$tbl' disagree on column lists " +
        "(use MySqlDumpReader.migrate, which unions by name)")
    lists.head
  }

  def schemaFor(path: String, table: Option[String]): StructType =
    StructType(colsFor(path, table).map(c =>
      StructField(c, StringType, nullable = true)) :+
      StructField(RaggedCol, BooleanType, nullable = false))
}
