package graft.sources

import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Compressed-dump handling for every dump read path (line-ranged
  * readers, V2 byte-range sources, sequential schema pass).
  *
  * Real-world dumps are `pg_dump | gzip` / `mysqldump | gzip`; the
  * reference accepts them by materializing ANY input stream to a
  * seekable scratch file before parsing (conversion/conversion.go:
  * 377-406 — stdin, compressed or not, lands on local disk first).
  * This is the Spark restatement of that posture: gzip is detected by
  * MAGIC BYTES (0x1f 0x8b — extension-renamed files are still caught),
  * decompressed ONCE to a scratch file, and every downstream consumer
  * reads the inflated copy:
  *
  *   - the V2 sources get back their byte-seek partitioning (a .gz is
  *     inherently unsplittable — there are no mid-stream sync points),
  *   - the line-ranged readers get back one-split-per-core parallelism
  *     (Hadoop reads a .gz correctly but as ONE partition, silently
  *     serializing the whole scan→unescape→cast stage).
  *
  * The inflate itself is a single-threaded stream copy — the same cost
  * the reference pays on every run; here it's paid once per (path,
  * mtime) and cached. Scratch location: `spark.graft.dump.scratchDir`
  * if set (on a multi-executor cluster this MUST be a shared
  * filesystem, e.g. an HDFS/object-store path, or executors cannot see
  * the inflated copy), else the JVM temp dir — correct for local mode,
  * where driver and executors share a machine.
  */
object DumpCodec {

  /** source path → (source mtime, inflated local path). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()

  /** Magic-byte sniff — two bytes, any FileSystem. */
  def isGzip(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return false
    val in = fs.open(p)
    try {
      val b0 = in.read(); val b1 = in.read()
      b0 == 0x1f && b1 == 0x8b
    } finally in.close()
  }

  /** Sequential text view of a possibly-gzip'd local dump — for the
    * spark-less schema passes (plan tooling, tests), which stream the
    * statement stream and never seek. */
  def openText(path: String): scala.io.Source = {
    val f = new java.io.FileInputStream(path)
    val head = new java.io.BufferedInputStream(f, 1 << 16)
    head.mark(2)
    val gz = head.read() == 0x1f && head.read() == 0x8b
    head.reset()
    scala.io.Source.fromInputStream(
      if (gz) new GZIPInputStream(head, 1 << 16) else head)("UTF-8")
  }

  /** The path every dump consumer should actually read: `path` itself
    * when uncompressed, else a decompressed scratch copy (created on
    * first use per (path, mtime), reused after). */
  def materialize(spark: SparkSession, path: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    if (!isGzip(path, conf)) return path
    val src = new Path(path)
    val fs = src.getFileSystem(conf)
    val mtime = fs.getFileStatus(src).getModificationTime
    cache.compute(path, (_, prev) =>
      if (prev != null && prev._1 == mtime &&
          new Path(prev._2).getFileSystem(conf).exists(new Path(prev._2))) prev
      else (mtime, inflate(spark, path, mtime, conf)))._2
  }

  /** Materialize a NON-SEEKABLE input stream (stdin, a pipe, a socket)
    * to a scratch file and return its path — the reference's headline
    * `pg_dump mydb | harbourbridge` posture (conversion/conversion.go:
    * 377-406: any stream lands on disk before parsing, because the
    * two-pass pipeline re-reads). Bytes are teed RAW: a gzip'd stream
    * is written compressed and [[materialize]] inflates it on first
    * read like any other .gz dump — one sniffing path, no
    * special-casing. Scratch placement follows the same rule as
    * [[materialize]] (spark.graft.dump.scratchDir, which must be a
    * shared filesystem on a multi-executor cluster). */
  def materializeStream(spark: SparkSession, in: java.io.InputStream): String = {
    val conf = spark.sessionState.newHadoopConf()
    val scratchDir = spark.conf.getOption("spark.graft.dump.scratchDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val stem = java.util.UUID.randomUUID().toString.take(12)
    val out = new Path(scratchDir, s"graft_stream_$stem.dump")
    val fs = out.getFileSystem(conf)
    val os = fs.create(out, true)
    try {
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) os.write(buf, 0, n); n = in.read(buf) }
      } finally os.close()
    } catch {
      // broken pipe / disk full mid-tee: don't strand a partial
      // multi-GB scratch dump (the caller's drop only covers the
      // post-materialize phase — it never learns this path existed)
      case e: Throwable =>
        try fs.delete(out, false) catch { case _: Throwable => () }
        throw e
    }
    out.toString
  }

  /** Delete a scratch copy created by [[materializeStream]]. */
  def dropScratch(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    ()
  }

  private def inflate(spark: SparkSession, path: String, mtime: Long,
      conf: Configuration): String = {
    val scratchDir = spark.conf.getOption("spark.graft.dump.scratchDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    // name by content identity so concurrent sessions converge on one copy
    val stem = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(path).toLong << 32 | (mtime & 0xffffffffL))
    val out = new Path(scratchDir, s"graft_inflated_$stem.dump")
    val outFs = out.getFileSystem(conf)
    if (!outFs.exists(out)) {
      System.err.println(
        s"[graft] $path is gzip-compressed; inflating once to $out " +
          "(set spark.graft.dump.scratchDir to a SHARED filesystem on a " +
          "multi-executor cluster)")
      val tmp = new Path(scratchDir, s"graft_inflated_$stem.tmp")
      val in = new GZIPInputStream(
        new Path(path).getFileSystem(conf).open(new Path(path)), 1 << 16)
      val os = outFs.create(tmp, true)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) os.write(buf, 0, n); n = in.read(buf) }
      } finally { in.close(); os.close() }
      // rename-into-place: a concurrent inflater loses the race benignly
      if (!outFs.rename(tmp, out) && !outFs.exists(out))
        throw new java.io.IOException(s"could not materialize $out")
      outFs.delete(tmp, false)
    }
    out.toString
  }
}
