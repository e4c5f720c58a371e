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
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.pgdump.SerializableHadoopConf

/** `spark.read.format("mysqldump")` — one table's extended-INSERT rows in
  * a mysqldump file as a DataSource V2 table; the pgdump source's sibling
  * (see [[graft.sources.pgdump.PgDumpTableProvider]] for the shared
  * rationale).
  *
  * The partitioning story is simpler than pgdump's: mysqldump data is one
  * self-identifying `INSERT INTO t ... VALUES (...),(...);` statement per
  * line (bounded by max-allowed-packet ~24 MB, mysql/mysqldump.go:84-87),
  * so the scan plans plain byte chunks over the whole file and each
  * reader classifies the lines in its chunk — no payload-range metadata
  * needed. Discovery still runs one pass to (a) resolve DELIMITER-block
  * byte ranges, so procedure-body INSERTs are excluded exactly like the
  * migration path, and (b) record each table's column list from the first
  * INSERT header, falling back to CREATE TABLE order for column-less
  * INSERTs. Tuple lexing inside the reader is the same quote-aware
  * [[MySqlDumpReader.Tuples]] the migration path uses, so raw-row parity
  * is by construction (and pinned by MySqlDumpV2SourceSpec).
  */
final class MySqlDumpTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mysqldump"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MySqlDumpV2.schemaFor(MySqlDumpV2.pathOf(options),
      MySqlDumpV2.tableOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MySqlDumpV2Table(MySqlDumpV2.pathOf(opts), MySqlDumpV2.tableOf(opts),
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
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new MySqlDumpScan(path, table, full, required, chunkBytes)
}

private[mysqldump] final class MySqlDumpScan(path: String,
    table: Option[String], full: StructType, required: StructType,
    chunkBytes: Option[Long]) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mysqldump $path${table.fold("")("#" + _)} ReadSchema: ${required.catalogString}"

  /** Whole-file byte size as a conservative upper bound (INSERT lines
    * aren't range-indexed per table) — still finite, so a small dump can
    * win an auto-broadcast join instead of sizing as
    * defaultSizeInBytes like a stats-less V2 relation. */
  override def estimateStatistics(): Statistics = {
    val len = MySqlDumpV2.discover(path).fileLen
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(len)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val d = MySqlDumpV2.discover(path)
    val perCore = d.fileLen / math.max(1, spark.sparkContext.defaultParallelism) + 1
    val step = chunkBytes.getOrElse(
      math.max(64L * 1024, math.min(
        spark.sessionState.conf.filesMaxPartitionBytes, perCore)))
    val parts = Array.newBuilder[InputPartition]
    var s = 0L
    while (s < d.fileLen) {
      val e = math.min(s + step, d.fileLen)
      parts += MySqlChunkPartition(s, e)
      s = e
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val d = MySqlDumpV2.discover(path)
    val tbl = MySqlDumpV2.resolveTable(d, table)
    val cols = MySqlDumpV2.colsFor(path, table)
    val proj = required.fields.map { f =>
      if (f.name == MySqlDumpV2.RaggedCol) -1 else cols.indexOf(f.name)
    }
    new MySqlInsertReaderFactory(path,
      new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()),
      tbl, d.delimiterBlocks.toArray, cols.length, proj)
  }
}

private[mysqldump] final case class MySqlChunkPartition(start: Long, end: Long)
    extends InputPartition

private[mysqldump] final class MySqlInsertReaderFactory(path: String,
    conf: SerializableHadoopConf, table: String,
    blocks: Array[(Long, Long)], nCols: Int, proj: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val c = p.asInstanceOf[MySqlChunkPartition]
    new MySqlInsertReader(path, conf, c.start, c.end, table, blocks, nCols, proj)
  }
}

/** Scans one byte chunk for the target table's extended-INSERT lines and
  * streams their tuples. Hadoop split semantics: lines whose start offset
  * is in [start, end] belong here, the first (possibly partial) line is
  * discarded unless start == 0, and a line straddling `end` is consumed
  * whole. INSERT lines inside DELIMITER blocks (procedure bodies) are
  * skipped, matching the migration path. */
private[mysqldump] final class MySqlInsertReader(path: String,
    conf: SerializableHadoopConf, start: Long, end: Long, table: String,
    blocks: Array[(Long, Long)], nCols: Int, proj: Array[Int])
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(path)
    val stream = p.getFileSystem(conf.value).open(p)
    stream.seek(start)
    stream
  }
  private val lines = new LineReader(in)
  private val text = new Text()
  private var pos =
    if (start == 0) 0L else start + lines.readLine(text) // discard partial
  private var tuples: Iterator[Seq[String]] = Iterator.empty
  private var row: InternalRow = _

  private def inBlock(off: Long): Boolean = {
    var i = 0
    while (i < blocks.length) {
      if (off > blocks(i)._1 && off < blocks(i)._2) return true
      i += 1
    }
    false
  }

  override def next(): Boolean = {
    while (!tuples.hasNext) {
      if (pos > end) return false
      val lineStart = pos
      val consumed = lines.readLine(text)
      if (consumed == 0) return false
      pos += consumed
      val line = text.toString
      if (!inBlock(lineStart) && MySqlDumpReader.isInsertFor(line, table))
        tuples = MySqlDumpReader.Tuples.parseLine(line).iterator
    }
    val t = tuples.next()
    val vals = new Array[Any](proj.length)
    var j = 0
    while (j < proj.length) {
      val k = proj(j)
      vals(j) =
        if (k < 0) t.length != nCols // __ragged
        else if (k >= t.length || t(k) == null) null
        else UTF8String.fromString(t(k))
      j += 1
    }
    row = new GenericInternalRow(vals)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = { lines.close(); in.close() }
}

private[mysqldump] object MySqlDumpV2 {
  val RaggedCol = "__ragged"

  final case class Discovery(
      fileLen: Long,
      /** [openLineStart, closeLineStart] byte ranges of DELIMITER blocks. */
      delimiterBlocks: Seq[(Long, Long)],
      /** table → column list from its first INSERT header (None =
        * column-less INSERT, resolve via CREATE TABLE). */
      insertCols: Map[String, Option[Seq[String]]],
      /** CREATE TABLE column order, resolved lazily. */
      ddlCols: () => Map[String, Seq[String]])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Discovery]()

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "mysqldump source needs exactly one load(path) — multi-path reads " +
        "are not supported (each dump is one file)")
    p
  }

  def tableOf(options: CaseInsensitiveStringMap): Option[String] =
    Option(options.get("table"))

  /** One distributed pass collects DELIMITER lines and INSERT headers
    * with byte offsets (both O(statements), never row data — an INSERT
    * header is one tuple-free prefix per ~24 MB line); blocks are
    * resolved with the sequential scanner's rules and headers inside
    * them are dropped. Cached per (path, mtime). */
  def discover(path: String): Discovery = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val st = p.getFileSystem(conf).getFileStatus(p)
    cache.computeIfAbsent((path, st.getModificationTime),
      _ => runDiscovery(spark, path, conf, st.getLen))
  }

  private def lineOffsets(spark: SparkSession, path: String,
      conf: Configuration) =
    spark.sparkContext.newAPIHadoopFile(path, classOf[TextInputFormat],
      classOf[LongWritable], classOf[Text], conf)

  private val SEP = ""

  private def runDiscovery(spark: SparkSession, path: String,
      conf: Configuration, fileLen: Long): Discovery = {
    val cands = lineOffsets(spark, path, conf)
      .flatMap { case (k, v) => // extract before collect: Writables are reused
        val l = v.toString
        if (l.trim.regionMatches(true, 0, "DELIMITER", 0, 9))
          Some((k.get, "d", l.trim.split("\\s+").lift(1).getOrElse(";"), null: String))
        else if (MySqlDumpReader.prunableInsert(l))
          MySqlDumpParser.InsertHeader.unapply(l).map { case (tbl, colsOpt) =>
            (k.get, "i", tbl, colsOpt.map(_.mkString(SEP)).orNull)
          }
        else None
      }
      .collect().sortBy(_._1)

    val rb = Seq.newBuilder[(Long, Long)]
    var open = -1L
    cands.foreach {
      case (off, "d", arg, _) =>
        if (open < 0) { if (arg != ";") open = off }
        else if (arg == ";") { rb += ((open, off)); open = -1L }
      case _ =>
    }
    if (open >= 0) rb += ((open, Long.MaxValue)) // unterminated block
    val blocks = rb.result()

    val insertCols = scala.collection.mutable.LinkedHashMap.empty[String, Option[Seq[String]]]
    cands.foreach {
      case (off, "i", tbl, cols)
          if !blocks.exists(b => off > b._1 && off < b._2) =>
        if (!insertCols.contains(tbl))
          insertCols(tbl) = Option(cols).map(_.split(SEP, -1).toSeq)
      case _ =>
    }

    Discovery(fileLen, blocks, insertCols.toMap, () => {
      // second pass, only for column-less INSERTs: collect the DDL stream
      // (INSERT data pruned, DELIMITER-block contents kept — the
      // sequential scanner skips those itself)
      val stmts = lineOffsets(spark, path, conf)
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
    })
  }

  def resolveTable(d: Discovery, table: Option[String]): String = {
    val names = d.insertCols.keys.toSeq
    val chosen = table.getOrElse {
      require(names.size == 1,
        s"dump has ${names.size} tables with INSERT data " +
          s"(${names.mkString(", ")}); pick one with .option(\"table\", ...)")
      names.head
    }
    require(d.insertCols.contains(chosen),
      s"no INSERT data for table '$chosen' (tables with data: " +
        s"${names.mkString(", ")})")
    chosen
  }

  def colsFor(path: String, table: Option[String]): Seq[String] = {
    val d = discover(path)
    val tbl = resolveTable(d, table)
    d.insertCols(tbl).getOrElse(d.ddlCols().getOrElse(tbl,
      throw new IllegalArgumentException(
        s"column-less INSERT for '$tbl' and no CREATE TABLE found")))
  }

  def schemaFor(path: String, table: Option[String]): StructType =
    StructType(colsFor(path, table).map(c =>
      StructField(c, StringType, nullable = true)) :+
      StructField(RaggedCol, BooleanType, nullable = false))
}
