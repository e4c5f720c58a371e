package graft.sink

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** mysqldump-format EXPORT — the MySQL counterpart of [[PgDumpSink]]:
  * CREATE TABLE + extended-INSERT statements that the mysql client (or
  * this library's own `format("mysqldump")` reader) ingests.
  *
  * Same fragment contract as the pg sink: the INSERT payload writes
  * DISTRIBUTED (each partition emits single-line extended INSERTs of up
  * to `batchRows` tuples — mysqldump's own shape), header/nothing else
  * serial; [[assemble]] concatenates to one file.
  *
  * Every value is emitted as a QUOTED string literal with the escape
  * set the reader's lexer inverts (backslash first, then `'`→`\'`,
  * LF/CR/TAB/NUL/ctrl-Z to `\n\r\t\0\Z`), so statements stay
  * single-line and a round trip reproduces `cast(... as string)` of the
  * source exactly; SQL NULL stays the bare keyword. */
object MySqlDumpSink {

  private[sink] def escape(v: String): String = {
    val sb = new StringBuilder(v.length + 8)
    var i = 0
    while (i < v.length) {
      v.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\'' => sb.append("\\'")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\u0000' => sb.append("\\0")
        case '\u001a' => sb.append("\\Z")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private[sink] def myType(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType | ShortType | ByteType => "int"
    case DoubleType | FloatType => "double"
    case BooleanType => "tinyint(1)"
    case _: TimestampType | TimestampNTZType => "datetime"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case DateType => "date"
    case _ => "text"
  }

  /** Fragment layout mirroring [[PgDumpSink.writeDir]]:
    * 00_header.sql (CREATE TABLE), 10_payload/ (INSERT statements,
    * distributed), no footer (INSERTs are self-terminated). */
  def writeDir(df: DataFrame, table: String, outDir: String,
      batchRows: Int = 1000): Unit = {
    val cols = df.schema.fields
    val header =
      s"CREATE TABLE `$table` (\n" +
        cols.map(f => s"  `${f.name}` ${myType(f.dataType)}").mkString(",\n") +
        "\n);\n"
    val colList = cols.map(f => s"`${f.name}`").mkString(", ")
    val asStrings = df.select(
      cols.map(f => col(f.name).cast("string").as(f.name)).toIndexedSeq: _*)
    val prefix = s"INSERT INTO `$table` ($colList) VALUES "
    import asStrings.sparkSession.implicits._
    val stmts = asStrings.mapPartitions { it =>
      it.grouped(batchRows).map { rows =>
        prefix + rows.iterator.map(tuple).mkString(",") + ";"
      }
    }(Encoders.STRING).toDF("line")
    stmts.write.mode("overwrite").text(s"$outDir/10_payload")
    graft.util.Fs.writeStringAtomic(s"$outDir/00_header.sql", header,
      df.sparkSession.sessionState.newHadoopConf())
  }

  private object Encoders {
    val STRING: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
  }

  private def tuple(r: Row): String =
    (0 until r.length).map { i =>
      if (r.isNullAt(i)) "NULL" else "'" + escape(r.getString(i)) + "'"
    }.mkString("(", ",", ")")

  /** Concatenate a fragment dir into one dump file. All IO through the
    * Hadoop FileSystem of each path's scheme — fragments and target can
    * live on HDFS/S3, not just a POSIX mount. */
  def assemble(fragmentDir: String, outFile: String,
      hadoopConf: org.apache.hadoop.conf.Configuration): Unit = {
    // `.gz` target → gzip the stream: `mysqldump | gzip` is how dumps
    // ship in practice, and the readers' DumpCodec path ingests the
    // compressed form (sniffed by magic bytes, so the round trip is
    // sink .gz → reader, no special-casing)
    // the conf is required, not active-session-resolved: both halves of
    // the job must resolve paths through the SAME FileSystem config,
    // and a thread-local session lookup can silently pick a different
    // session's spark.hadoop.* overrides in a multi-session JVM
    val conf = hadoopConf
    val raw = graft.util.Fs.create(outFile, conf)
    val out: java.io.OutputStream =
      if (outFile.endsWith(".gz"))
        new java.util.zip.GZIPOutputStream(raw, 1 << 16)
      else raw
    try {
      def cat(p: String): Unit = {
        val in = graft.util.Fs.open(p, conf)
        try in.transferTo(out) finally in.close()
      }
      cat(s"$fragmentDir/00_header.sql")
      graft.util.Fs.listParts(s"$fragmentDir/10_payload", conf)
        .foreach(st => cat(st.getPath.toString))
    } finally out.close()
  }

  /** Convenience: write + assemble to a single dump file. The fragment
    * scratch is a sibling of the target (same FileSystem), so the whole
    * round trip works on an object store. */
  def writeFile(df: DataFrame, table: String, outFile: String,
      batchRows: Int = 1000): Unit = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val frag = s"$outFile.fragments"
    try {
      writeDir(df, table, frag, batchRows)
      assemble(frag, outFile, conf)
    } finally graft.util.Fs.deleteTree(frag, conf)
  }
}
