package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** pg_dump-format EXPORT — the reverse of the pgdump sources: write any
  * DataFrame as `CREATE TABLE` + `COPY ... FROM stdin` text payload that
  * psql (or this library's own `format("pgdump")` reader) ingests.
  * Closes the round trip: curated/migrated data can leave the lake the
  * same way it arrived.
  *
  * Scale shape: the COPY payload is written DISTRIBUTED as text part
  * files (one per partition — the 100 GB part of a dump parallelizes),
  * with the schema header and `\.` terminator as tiny driver-written
  * files; `assemble` concatenates them into the single-file form when
  * one file is actually required (driver-streamed, the only inherently
  * serial step — same posture as pg_dump itself, which writes one
  * stream).
  *
  * Escaping mirrors the COPY text rules the reader's CopyUnescape
  * inverts: backslash first (`\` → `\\`), then TAB/LF/CR to `\t\n\r`;
  * SQL NULL → `\N`. Values are Spark's `cast(... as string)` rendering,
  * so a round trip through the reader reproduces `df.select(cast all to
  * string)` exactly (PgDumpSinkSpec pins it on text containing tabs,
  * newlines, backslashes, and NULLs). */
object PgDumpSink {

  /** COPY text escape of one string column (null-safe → `\N`). */
  private[sink] def escCol(c: Column): Column =
    coalesce(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        c, "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n"), "\r", "\\\\r"),
      lit("\\N"))

  /** Spark type → pg column type for the CREATE TABLE header. */
  private[sink] def pgType(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType | ShortType | ByteType => "integer"
    case DoubleType | FloatType => "double precision"
    case BooleanType => "boolean"
    case _: TimestampType | TimestampNTZType => "timestamp"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case DateType => "date"
    case _ => "text"
  }

  /** Write `df` as a dump fragment directory:
    *   outDir/00_header.sql  — CREATE TABLE + COPY ... FROM stdin;
    *   outDir/10_payload/    — distributed COPY text lines (part files)
    *   outDir/20_footer.sql  — the `\.` terminator
    * Concatenated in name order this IS the dump (see [[assemble]]). */
  def writeDir(df: DataFrame, table: String, outDir: String): Unit = {
    val cols = df.schema.fields
    val header =
      s"""CREATE TABLE "$table" (\n""" +
        cols.map(f => s"""    "${f.name}" ${pgType(f.dataType)}""")
          .mkString(",\n") + "\n);\n\n" +
        s"""COPY "$table" (${cols.map(f => s""""${f.name}"""").mkString(", ")}) FROM stdin;\n"""
    val payload = df.select(
      concat_ws("\t", cols.map(f => escCol(col(f.name).cast("string"))): _*)
        .as("line"))
    payload.write.mode("overwrite").text(s"$outDir/10_payload")
    val conf = df.sparkSession.sessionState.newHadoopConf()
    graft.util.Fs.writeStringAtomic(s"$outDir/00_header.sql", header, conf)
    graft.util.Fs.writeStringAtomic(s"$outDir/20_footer.sql", "\\.\n", conf)
  }

  /** Driver-streamed concatenation of a [[writeDir]] fragment dir into
    * one dump file — header, payload parts in name order, footer. */
  def assemble(fragmentDir: String, outFile: String,
      hadoopConf: org.apache.hadoop.conf.Configuration): Unit = {
    // `.gz` target → gzip the stream: `pg_dump | gzip` is how dumps
    // ship in practice, and the readers' DumpCodec path ingests the
    // compressed form (sniffed by magic bytes, so the round trip is
    // sink .gz → reader, no special-casing). All IO through the Hadoop
    // FileSystem of each path's scheme — fragments and target can live
    // on HDFS/S3, not just a POSIX mount.
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
      cat(s"$fragmentDir/20_footer.sql")
    } finally out.close()
  }

  /** Convenience: write + assemble to a single dump file. The fragment
    * scratch is a sibling of the target (same FileSystem), so the whole
    * round trip works on an object store. */
  def writeFile(df: DataFrame, table: String, outFile: String): Unit = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val frag = s"$outFile.fragments"
    try {
      writeDir(df, table, frag)
      assemble(frag, outFile, conf)
    } finally graft.util.Fs.deleteTree(frag, conf)
  }
}
