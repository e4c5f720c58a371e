package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark build function over a testdata
  * scale-factor directory plus (when SQL-expressible) an equivalent ANSI
  * SQL string the driver runs in DuckDB on the same parquet tables.
  *
  * Oracle discipline (hash-match safety):
  *   - every output column is BIGINT or STRING — no DECIMAL or TIMESTAMP
  *     ever crosses the output boundary (the driver's hasher canonicalizes
  *     decimal/timestamp representations differently across engines even
  *     when values are equal; integers and strings are representation-
  *     stable);
  *   - aggregates over doubles are cast per-row to a fixed-scale DECIMAL,
  *     summed exactly, then emitted as BIGINT minor units (×10^scale) on
  *     BOTH sides; timestamps are emitted as epoch microseconds;
  *   - every output column is aliased identically on both sides;
  *   - every query ends with a deterministic ORDER BY on both sides.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    /** Largest scale factor at which [[oracle]] is valid. Some entries'
      * oracles are PROVABLY exact only below a size threshold (e12b/
      * e23b/e14: the k=⌊√n⌋ dial probes every inverted list while
      * ⌊√n⌋ ≤ nprobe, so brute-force SQL is a true oracle there and
      * would be a false red above it). Encoding the bound here — checked
      * by Verify against the sf dir's name — replaces the "remember to
      * skip these at sf0.1" prose contract: an out-of-range sweep
      * degrades those entries to rows-only instead of reporting
      * false failures. None = valid at every SF. */
    oracleMaxSf: Option[Double] = None)

object QueryDef {

  /** Post-materialization cleanups. A build function that caches shared
    * state the returned frame still references (the dump readers' line
    * scan) can't unpersist at build time without losing the sharing, and
    * has no way to see when the caller's write action finishes — so it
    * registers the release here and the harnesses (Bench, Verify) drain
    * the queue after each query materializes. Queues, not a single slot:
    * a build may register several handles, and a failed query's handle
    * still runs before the next query's build. */
  private val pendingCleanups =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  def deferCleanup(f: () => Unit): Unit = pendingCleanups.add(f)

  /** Local-FS recursive delete for bench scratch/caches — ONE
    * definition for every temp-dir cleanup in the query modules
    * (Similarity's indexes, Curation's takedown base). */
  private[queries] def rmTree(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete(); ()
    }
    go(new java.io.File(path))
  }

  /** Generate-once process cache for a bench fixture artifact, keyed
    * by (sf dir, source-table stamp) — ONE definition of the pattern
    * every prebuilt-index/curated-base bench entry uses (it appeared
    * 7× before extraction): the artifact lands in a fresh PROCESS-OWNED
    * temp directory (reclaimed at JVM exit, so other processes can
    * never serve or collide with it), and a stamp change WITHIN the
    * process rebuilds instead of serving stale — several consumers are
    * recall-gated rather than oracle-red, so staleness would be
    * silently wrong. `suffix` nests the artifact below the temp root
    * for layouts that must own their directory (e.g. "/idx").
    * Synchronized on the cache: concurrent first callers build once. */
  private[queries] def cachedArtifact(
      cache: scala.collection.concurrent.TrieMap[String, (String, String)],
      dir: String, table: String, prefix: String, suffix: String = "")(
      build: String => Unit): String = cache.synchronized {
    val stamp = sourceStamp(dir, table)
    cache.get(dir) match {
      case Some((s, out)) if s == stamp => out
      case _ =>
        val root = java.nio.file.Files.createTempDirectory(prefix).toString
        sys.addShutdownHook { rmTree(root) }
        val out = root + suffix
        build(out)
        cache.put(dir, (stamp, out))
        out
    }
  }

  /** Cheap freshness token for a bench source table: name+size+mtime of
    * its parquet file(s). The query modules' process-lifetime caches
    * key on it, so a WITHIN-JVM regeneration of the table rebuilds the
    * cached artifact instead of silently serving a stale one
    * (cross-process staleness is already impossible — the caches live
    * in process-owned temp dirs). ONE definition: stamp-semantics fixes
    * must not diverge between the caches. */
  private[queries] def sourceStamp(dir: String, tableName: String): String = {
    val f = new java.io.File(dir, s"$tableName.parquet")
    def one(x: java.io.File) = s"${x.getName}:${x.length}:${x.lastModified}"
    if (f.isDirectory)
      Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        .sortBy(_.getName).map(one).mkString(";")
    else one(f)
  }

  def drainCleanups(): Unit = {
    var f = pendingCleanups.poll()
    while (f != null) {
      try f() catch { case e: Throwable =>
        System.err.println(s"[cleanup] ${e.getMessage}") }
      f = pendingCleanups.poll()
    }
  }

  /** Load one testdata table. Column pruning + predicate pushdown reach the
    * parquet scan automatically because the plan stays declarative. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Load a table whose consumers are compute-dense per row (text
    * analysis, embedding math). Parquet assigns at most one task per
    * row group, so a single-row-group file caps the ENTIRE downstream
    * codegen stage at one core regardless of cluster size — measured
    * 8.1 s → ~3 s on m01 at sf0.1, where tokenize+shingle+md5 ran on 1
    * of 32 cores. When the scan plans fewer partitions than the
    * session's parallelism, re-spread rows round-robin first: one
    * shuffle of the (small, else it would have split) source bytes in
    * exchange for full-width execution of the expensive projection
    * above. At production scale the source is many files/row groups and
    * this is a no-op — scan-bound queries (plain TPC-H aggs) should
    * keep using [[table]], where a shuffle buys nothing. */
  def spread(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = table(spark, sfDir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Load the events table with `ts` normalized to a microsecond
    * TimestampType, whatever physical type the generator chose:
    *   - TIMESTAMP(NANOS) (earlier testdata): readable only with
    *     spark.sql.legacy.parquet.nanosAsLong=true (set by
    *     GraftSession), arriving as Long nanoseconds. Integer `DIV`
    *     (not `/`): epoch-ns ≈ 1.7e18 exceeds the 2^53 exact range of
    *     a double, so float division would corrupt low-order digits.
    *   - timestamp[us] without UTC adjustment (current testdata):
    *     arrives as TIMESTAMP_NTZ, which unix_micros & co. reject.
    *     The session timezone is pinned to UTC, so the NTZ→LTZ cast
    *     reinterprets the same wall clock as the same instant DuckDB's
    *     naive TIMESTAMP sees — oracle parity preserved. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
