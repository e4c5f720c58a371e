package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, Options, Path}

/** Hadoop-`FileSystem` file ops for the NON-Spark steps of persisted
  * artifacts — index metadata sidecars, directory swaps, dump-file
  * assembly. The data files themselves already go through Spark's
  * readers/writers (FS-agnostic by construction); these helpers close
  * the gap for the driver-side metadata/concat/rename steps so an
  * index or export target can live on HDFS/S3, not just a POSIX mount.
  * Same posture as [[graft.sources.DumpCodec.isGzip]] — every path is
  * resolved through `path.getFileSystem(conf)`.
  */
object Fs {

  // Deliberately NO `conf()` default-resolver here: every helper takes
  // the Configuration explicitly. A thread-local active-session lookup
  // is a multi-session footgun — artifact writes silently resolving
  // against whichever session happens to be active on the calling
  // thread (wrong `spark.hadoop.*` overrides, wrong default FS). The
  // caller either has a session (pass `sessionState.newHadoopConf()`)
  // or is deliberately session-less (pass `new Configuration()`, which
  // still resolves `file:` and any scheme on the classpath).

  def exists(path: String, c: Configuration): Boolean = {
    val p = new Path(path)
    p.getFileSystem(c).exists(p)
  }

  def readString(path: String, c: Configuration): String = {
    val p = new Path(path)
    val in = p.getFileSystem(c).open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Write via a sibling temp file + atomic rename-into-place
    * (FileContext OVERWRITE rename — atomic on HDFS and on a local FS;
    * object stores degrade to copy+delete, which still never exposes a
    * torn file at `path`, only old-or-new content). */
  def writeStringAtomic(path: String, content: String, c: Configuration): Unit = {
    val dst = new Path(path)
    val fs = dst.getFileSystem(c)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(fs.getUri, c)
      .rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  /** Plain no-overwrite directory/file rename (fails if dst exists). */
  def rename(src: String, dst: String, c: Configuration): Unit = {
    val s = new Path(src)
    val fs = s.getFileSystem(c)
    if (!fs.rename(s, new Path(dst)))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }

  def deleteTree(path: String, c: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(c)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** The `part-*` files of a Spark text/parquet output dir, in name
    * order — the concatenation order of a distributed payload. */
  def listParts(dir: String, c: Configuration): Seq[FileStatus] = {
    val p = new Path(dir)
    p.getFileSystem(c).listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
  }

  def open(path: String, c: Configuration): java.io.InputStream = {
    val p = new Path(path)
    p.getFileSystem(c).open(p)
  }

  /** Create/overwrite a file for streaming output. */
  def create(path: String, c: Configuration): java.io.OutputStream = {
    val p = new Path(path)
    p.getFileSystem(c).create(p, true)
  }

  def mkdirs(path: String, c: Configuration): Unit = {
    val p = new Path(path)
    p.getFileSystem(c).mkdirs(p)
    ()
  }

  /** Fully-qualified canonical form of a path for EQUALITY checks
    * (same-directory guards). `file:` paths additionally resolve
    * symlinks — a local "latest" symlink aliasing its target must
    * compare equal to it; remote stores have no symlinks to chase, and
    * their qualified URI is already canonical. */
  def canonical(path: String, c: Configuration): String = {
    val p = new Path(path)
    val q = p.getFileSystem(c).makeQualified(p)
    if (q.toUri.getScheme == "file")
      "file:" + java.nio.file.Paths.get(q.toUri.getPath).toRealPath().toString
    else q.toString
  }
}
