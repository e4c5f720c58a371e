package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band index + incremental near-duplicate probe —
  * the text-side sibling of [[IvfIndex]] (vectors) and of
  * `c10_incremental_dedup` (exact digests): an ingestion pipeline keeps
  * the corpus's band buckets and shingle signatures as parquet tables
  * and answers "which existing documents is this NEW batch a near-copy
  * of" by joining the batch against the index — never recomputing
  * corpus LSH, never touching corpus text.
  *
  * Scheme: exactly m01's (word 3-gram shingles → 6 seeded-md5 MinHashes
  * → 3 bands of 2) — and not by coincidence: this object holds the ONE
  * definition ([[shingleExpr]]/[[bands]]), which `Similarity` and the
  * streaming verify companions alias, so the batch query, the stream,
  * and the persisted index cannot drift. [[MinHashIndexSpec]] still
  * pins the band frame against `Similarity.minhashBands` as a
  * delegation regression check.
  *
  * Layout under `indexDir` (all Spark parquet — FS-portable by
  * construction):
  *   - `bands/`       (doc_id LONG, bi INT, bh STRING) — candidate
  *     keys; in the batch layout written BUCKETED by (bi, bh) — the FULL
  *     candidate-join key, which co-partitioning requires (Spark's
  *     requireAllClusterKeysForCoPartition) — so probes join it
  *     shuffle-free (bucket count in meta) — the session-local
  *     catalog entry is re-registered on demand ([[bandsTable]])
  *   - `signatures/`  (doc_id LONG, sh ARRAY<STRING>) — rerank payload
  *   - `meta.json`    written LAST via
  *     [[graft.util.Fs.writeStringAtomic]]: its presence marks a
  *     complete build.
  * Two append disciplines share this layout: the flat batch API
  * ([[write]]/[[append]] — a crash mid-append followed by a retry can
  * leave bit-identical duplicate rows, which [[probe]] collapses by
  * deduplicating its output pair set) and the streaming [[appendBatch]] (per-batch partition
  * subdirs, idempotent overwrite, meta as the single atomic commit —
  * see its Scaladoc). The two must not mix on one index dir and
  * reject each other.
  *
  * 100 TB judgment: candidate generation joins ~50-byte (bi, bh, id)
  * rows against the batch's bands; in the batch layout the index side
  * never shuffles AT ALL — the bucketed scan's HashPartitioning(bi, bh)
  * covers the join keys, so only the O(batch) side moves
  * (spec-pinned). Signatures join back once per DISTINCT candidate
  * pair (the m01 rerank shape); `append` is an O(batch) bucket-aligned
  * append. The streaming layout trades this for idempotent per-batch
  * commits and gets it back via [[compactStreaming]].
  *
  * CROSS-PROCESS MAINTENANCE CONTRACT (single maintainer): the
  * rewriting operations — [[compact]], [[compactStreaming]],
  * [[foldStreaming]], [[rebucket]] — stage their replacement and swap
  * it in with two renames, which protects against CRASHES (every
  * intermediate state is a complete layout, and a swap that died
  * between its renames is detected and refused with the one recovering
  * rename named — spec-pinned), not against CONCURRENT maintainers:
  * two processes rewriting one index dir can interleave their renames
  * into a live layout built from mixed generations. Exactly ONE
  * process may run maintenance on an index dir at a time — for a
  * streaming index, the stream's own foreachBatch (where [[maintain]]
  * runs), which serializes maintenance against appends by
  * construction. Concurrent PROBES during a swap are safe-but-loud:
  * they read a complete layout or fail with FILE_NOT_EXIST and retry;
  * they never read mixed files silently.
  */
object MinHashIndex {

  /** THE definition of the m01 shingle scheme (word 3-grams, distinct;
    * short docs fall back to their distinct token set) — Similarity and
    * the streaming verify companions alias it from here, so the scheme
    * that keys persisted indexes cannot drift from the batch query. */
  private val tk = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"
  private[graft] val shingleExpr =
    s"""CASE WHEN size($tk) >= 3
          THEN array_distinct(transform(sequence(1, size($tk) - 2),
               i -> concat_ws(' ', slice($tk, i, 3))))
          ELSE array_distinct($tk) END"""
  private def mh(k: Int) =
    s"array_min(transform(sh, s -> md5(concat('$k:', s))))"

  /** (doc_id, sh) signature frame of a documents frame. */
  def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(shingleExpr).as("sh"))

  /** (doc_id, bi, bh) band-bucket frame of a signature frame. */
  def bands(sigs: DataFrame): DataFrame =
    sigs
      .withColumn("mh", expr(s"array(${(0 until 6).map(mh).mkString(",")})"))
      .select(col("doc_id"), posexplode(expr(
        "array(md5(concat(mh[0], mh[1])), md5(concat(mh[2], mh[3])), md5(concat(mh[4], mh[5])))"))
        .as(Seq("bi", "bh")))

  /** Session-catalog name for the bucketed `bands/` table of an index
    * dir — derived from the dir, so the same index re-registers under
    * the same name across sessions/processes (the catalog entry is
    * session-local metadata; the DATA and its bucket-id file naming
    * live with the index). */
  private[operators] def bandsTable(indexDir: String): String =
    "graft_mhidx_bands_" + org.apache.commons.codec.digest.DigestUtils
      .md5Hex(indexDir).substring(0, 12)

  /** Per-table-name registration locks: a probe is logically read-only,
    * so its catalog side effect must never interleave a DROP under a
    * concurrent caller's `spark.table()` resolution of the same index. */
  private val registerLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** (Re-)register the external bucketed table over `bands/` in THIS
    * session's catalog — a new process opening an existing index has
    * the files (bucket ids are encoded in their names) but not the
    * catalog entry that tells Spark to trust them. Reuses a live entry
    * whose bucket count already matches (the steady state: zero DDL per
    * probe); drops and recreates only on first registration or a
    * rebuild that changed the bucket count, under a per-table lock so
    * concurrent probes of one index never race the DROP/CREATE window.
    * Never touches data (external). */
  private def registerBandsTable(spark: SparkSession, indexDir: String,
      buckets: Int): String = {
    val tbl = bandsTable(indexDir)
    registerLocks.getOrElseUpdate(tbl, new Object).synchronized {
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(tbl)
      val cat = spark.sessionState.catalog
      val fresh = cat.tableExists(ident) &&
        cat.getTableMetadata(ident).bucketSpec.exists(_.numBuckets == buckets)
      if (!fresh) {
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        spark.sql(
          s"""CREATE TABLE $tbl (doc_id BIGINT, bi INT, bh STRING)
             |USING parquet
             |CLUSTERED BY (bi, bh) SORTED BY (bi, bh) INTO $buckets BUCKETS
             |LOCATION '$indexDir/bands'""".stripMargin)
      }
    }
    tbl
  }

  /** Build the index from scratch (overwrites `indexDir`). `bands/` is
    * written BUCKETED by (bi, bh) (`bandBuckets` files, sorted within), so
    * every future [[probe]]'s candidate join is shuffle-free on the
    * index side — the one-time bucketing shuffle at build is amortized
    * over the life of the index (BucketedSink's rationale; at corpus
    * scale pick a bucket count matching cluster parallelism, e.g.
    * 4096). */
  def write(spark: SparkSession, docs: DataFrame, indexDir: String,
      bandBuckets: Int = 32): Unit = {
    val c = spark.sessionState.newHadoopConf()
    graft.util.Fs.deleteTree(indexDir, c)
    val sigs = signatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.write.mode("overwrite").parquet(s"$indexDir/signatures")
      spark.sql(s"DROP TABLE IF EXISTS ${bandsTable(indexDir)}")
      bands(sigs).write.mode("overwrite").format("parquet")
        .bucketBy(bandBuckets, "bi", "bh").sortBy("bi", "bh")
        .option("path", s"$indexDir/bands")
        .saveAsTable(bandsTable(indexDir))
      writeMeta(spark, indexDir, bandBuckets, c)
    } finally { sigs.unpersist(false); () }
  }

  /** Append a new batch without rebuilding: O(batch) signature/band
    * appends (the band append lands bucket-aligned through the same
    * table, preserving the shuffle-free probe), then the meta rewrite
    * (last — see layout doc). */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    val c = spark.sessionState.newHadoopConf()
    require(graft.util.Fs.exists(s"$indexDir/meta.json", c),
      s"$indexDir is not a complete MinHash index (no meta.json)")
    val meta = graft.util.Fs.readString(s"$indexDir/meta.json", c)
    require(!meta.contains("last_batch"),
      s"$indexDir is a streaming-layout index (batch-partitioned dirs); " +
        "use appendBatch — flat-file append would break partition discovery")
    val buckets = bandBucketsOf(meta)
    if (buckets > 0) registerBandsTable(spark, indexDir, buckets)
    val sigs = signatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sigs.write.mode("append").parquet(s"$indexDir/signatures")
      if (buckets > 0)
        bands(sigs).write.mode("append").format("parquet")
          .bucketBy(buckets, "bi", "bh").sortBy("bi", "bh")
          .option("path", s"$indexDir/bands")
          .saveAsTable(bandsTable(indexDir))
      else // legacy pre-bucketing index: stay flat (probe reads it flat
           // too); one rebucket() migrates to the bucketed layout
        bands(sigs).write.mode("append").parquet(s"$indexDir/bands")
      writeMeta(spark, indexDir, buckets, c)
    } finally { sigs.unpersist(false); () }
  }

  private def bandBucketsOf(meta: String): Int =
    """"bands_buckets":(\d+)""".r.findFirstMatchIn(meta)
      .map(_.group(1).toInt).getOrElse(0)

  private def writeMeta(spark: SparkSession, indexDir: String, buckets: Int,
      c: org.apache.hadoop.conf.Configuration): Unit = {
    val n = spark.read.parquet(s"$indexDir/signatures").count()
    graft.util.Fs.writeStringAtomic(s"$indexDir/meta.json",
      s"""{"scheme":"minhash-3gram-6x3","n_docs":$n,"bands_buckets":$buckets}""", c)
  }

  /** Replay-safe micro-batch ingestion (the StreamingIndexProbe
    * append). Layout differs from [[write]]/[[append]]'s flat files:
    * each batch OWNS a partition subdirectory
    * (`signatures/batch_id=N`, `bands/batch_id=N`) written with
    * OVERWRITE semantics, and `meta.json` — carrying
    * `{"scheme", "n_docs", "last_batch"}` — is the single atomic
    * commit point, written last. The consequences, in order:
    *
    *   - re-delivery of an uncommitted batch rewrites its OWN dirs and
    *     then commits — idempotent by construction, no fence to race
    *     (a crash anywhere mid-append is healed by the rewrite);
    *   - re-delivery of the COMMITTED last batch writes nothing
    *     (returns false);
    *   - a batch id BELOW the committed last batch fails loudly: ids
    *     restarted (fresh checkpoint over a grown index, or two
    *     queries sharing one indexDir) — silently overwriting old
    *     batches would corrupt the corpus;
    *   - `n_docs` advances incrementally (previous meta + this batch),
    *     so per-batch cost never grows with corpus size.
    *
    * Takes the SIGNATURE frame (callers probe with the same frame —
    * the expensive shingle/minhash work runs once per batch). The two
    * layouts must not mix: appending onto a [[write]]-built index (or
    * vice versa) is rejected. */
  def appendBatch(spark: SparkSession, sigs: DataFrame, indexDir: String,
      batchId: Long): Boolean = {
    val c = spark.sessionState.newHadoopConf()
    val metaPath = s"$indexDir/meta.json"
    val (nDocs, last) =
      if (!graft.util.Fs.exists(metaPath, c)) (0L, -1L)
      else {
        val m = graft.util.Fs.readString(metaPath, c)
        val lastB = """"last_batch":(-?\d+)""".r.findFirstMatchIn(m)
          .map(_.group(1).toLong)
        require(lastB.isDefined,
          s"$indexDir is a batch-API index (no last_batch in meta.json); " +
            "streaming appendBatch and write/append layouts must not mix")
        val n = """"n_docs":(\d+)""".r.findFirstMatchIn(m)
          .map(_.group(1).toLong).getOrElse(0L)
        (n, lastB.get)
      }
    if (batchId < last)
      throw new IllegalStateException(
        s"appendBatch($batchId) but $indexDir already committed batch $last: " +
          "the micro-batch id space restarted (fresh checkpoint dir over an " +
          "existing index, or two queries sharing it) — use a new indexDir " +
          "or restore the original checkpoint")
    if (batchId == last) return false // committed replay: data is complete
    // ONE materialization feeds the count and BOTH writes (IvfIndex
    // appendBatch's discipline): persist would recompute evicted/lost
    // blocks from the source plan, so a nondeterministic source could
    // commit an n_docs that disagrees with the written rows — or
    // signatures that disagree with bands. localCheckpoint truncates
    // lineage; block loss fails the batch loudly and the stream
    // redelivers it.
    val pinned = sigs.localCheckpoint(true)
    val n = pinned.count()
    pinned.write.mode("overwrite").parquet(s"$indexDir/signatures/batch_id=$batchId")
    bands(pinned).write.mode("overwrite").parquet(s"$indexDir/bands/batch_id=$batchId")
    graft.util.Fs.writeStringAtomic(metaPath,
      s"""{"scheme":"minhash-3gram-6x3","n_docs":${nDocs + n},"last_batch":$batchId}""", c)
    true
  }

  /** Convert a STREAMING-layout index (per-batch partition dirs) into
    * the batch layout with BUCKETED bands — the append→compact
    * discipline for continuous ingestion: the stream appends with
    * idempotent per-batch overwrite commits (which cannot also be
    * bucket-aligned — per-batch dirs and one bucketed table are
    * different layouts), and when ingestion pauses or finishes, ONE
    * compaction pays the bucketing shuffle so every subsequent
    * [[probe]] is shuffle-free on the index side and the accumulated
    * per-batch small files collapse. After compaction the index is a
    * batch-layout index: [[append]]/[[probe]] continue, [[appendBatch]]
    * rejects it (resuming the old stream checkpoint would corrupt —
    * start a fresh indexDir for a new stream).
    *
    * Staged + swapped per subdir (IvfIndex.compact's discipline): a
    * crash mid-compact leaves complete old/staged copies, and
    * re-running compactStreaming from any intermediate state converges
    * (meta — the layout commit point — flips only at the end). */
  def compactStreaming(spark: SparkSession, indexDir: String,
      bandBuckets: Int = 32): Unit = {
    val c = spark.sessionState.newHadoopConf()
    val meta = graft.util.Fs.readString(s"$indexDir/meta.json", c)
    require(meta.contains("last_batch"),
      s"$indexDir is not a streaming-layout index; only appendBatch " +
        "indexes need compaction to the bucketed batch layout")
    val tombSnap = tombstoneSnapshot(spark, indexDir)
    refuseEmptyingFold(spark, indexDir, tombSnap, "compactStreaming")
    val tomb = tombSnap.map(_._2)
    swapIn(indexDir, "signatures", c) { staged =>
      val all = spark.read.parquet(s"$indexDir/signatures")
        .select("doc_id", "sh")
      val kept = tomb match {
        case Some(t) => all.join(broadcast(t), Seq("doc_id"), "left_anti")
        case None => all
      }
      kept.dropDuplicates("doc_id").write.mode("overwrite").parquet(staged)
    }
    // bands rebuild from the compacted signatures (see compact)
    writeBandsBucketed(spark, indexDir, bandBuckets, c,
      bands(spark.read.parquet(s"$indexDir/signatures")))
    // clear the folded snapshot files BEFORE the layout commit: a crash
    // in between leaves a still-streaming index whose re-run converges
    // (the fold already happened; absent tombstones fold nothing),
    // whereas clearing after would strand a crash window in which the
    // documented recovery — re-running compactStreaming — trips its own
    // layout require. MinHash has no pruning-counts math, so there is
    // no counts-vs-tombstones ordering constraint here (unlike
    // IvfIndex.compact, where reduced counts must publish first).
    tombSnap.foreach { case (files, _) =>
      files.foreach(graft.util.Fs.deleteTree(_, c)) }
    writeMeta(spark, indexDir, bandBuckets, c) // commits the batch layout
  }

  /** Mid-stream compaction — the fold for a LIVE streaming index:
    * tombstoned docs leave the files for good, duplicate signature rows
    * heal, bands REBUILD from the folded signatures (healing
    * orphan/missing band docs — bands are a pure function of
    * signatures), and the run of per-batch small dirs collapses into
    * ONE `batch_id=<last_batch>` subtree on each side — but meta KEEPS
    * `last_batch`, so the owning stream's next [[appendBatch]] lands
    * beside the folded subtrees unbroken. [[compactStreaming]] remains
    * the END-of-stream handoff that finalizes into the bucketed batch
    * layout (per-batch dirs and one bucketed table are different
    * layouts, so a live stream cannot have bucketed bands); this is
    * the maintenance primitive [[maintain]] fires BETWEEN
    * micro-batches. Tombstones clear only after BOTH swaps (a crash
    * between leaves them live — probes stay exact, the re-run folds
    * again); `n_docs` recounts from the folded signatures.
    * Single-maintainer contract: run it from the stream's own
    * foreachBatch, never from a second process. */
  def foldStreaming(spark: SparkSession, indexDir: String): Unit = {
    val c = spark.sessionState.newHadoopConf()
    val meta = graft.util.Fs.readString(s"$indexDir/meta.json", c)
    val last = """"last_batch":(-?\d+)""".r.findFirstMatchIn(meta)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"$indexDir is a batch-layout index; use compact"))
    val tombSnap = tombstoneSnapshot(spark, indexDir)
    refuseEmptyingFold(spark, indexDir, tombSnap, "foldStreaming")
    val tomb = tombSnap.map(_._2)
    swapIn(indexDir, "signatures", c) { staged =>
      val all = spark.read.parquet(s"$indexDir/signatures")
        .select("doc_id", "sh")
      val kept = tomb match {
        case Some(t) => all.join(broadcast(t), Seq("doc_id"), "left_anti")
        case None => all
      }
      kept.dropDuplicates("doc_id")
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(last))
        .write.mode("overwrite").partitionBy("batch_id").parquet(staged)
    }
    swapIn(indexDir, "bands", c) { staged =>
      bands(spark.read.parquet(s"$indexDir/signatures")
          .select("doc_id", "sh"))
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(last))
        .write.mode("overwrite").partitionBy("batch_id").parquet(staged)
    }
    tombSnap.foreach { case (files, _) =>
      files.foreach(graft.util.Fs.deleteTree(_, c)) }
    val n = spark.read.parquet(s"$indexDir/signatures").count()
    graft.util.Fs.writeStringAtomic(s"$indexDir/meta.json",
      s"""{"scheme":"minhash-3gram-6x3","n_docs":$n,"last_batch":$last}""", c)
  }

  /** Turn [[health]]'s measurements into at most ONE maintenance action
    * under [[MaintenancePolicy]]'s dials, layout-aware — [[IvfIndex
    * .maintain]]'s text-side twin. MinHash has no cluster stats, so
    * `maxImbalance` is ignored; instead ANY signature↔band
    * inconsistency (orphan or missing band docs — the crash fingerprint
    * that makes probes of those docs under- or never match) trips a
    * fold regardless of fraction, because the heal is the same rewrite
    * and the degradation is silent misses, not just cost. Returns
    * "compact" or "none". Idempotent: after a fold every signal is
    * back under its dial. Single-maintainer contract as
    * [[foldStreaming]]. */
  def maintain(spark: SparkSession, indexDir: String,
      policy: MaintenancePolicy): String = {
    val h = health(spark, indexDir)
    if (h.docs < policy.minRows) return "none"
    val trip =
      h.tombstones * 1000L > policy.maxTombstonePermille * h.docs ||
      h.duplicateRows * 1000L > policy.maxDuplicatePermille * h.docs ||
      h.orphanBandDocs > 0 || h.missingBandDocs > 0
    if (!trip) "none"
    // a fully-retracted corpus is not a maintenance state (the fold
    // would empty the index and is refused — see refuseEmptyingFold);
    // probes already exclude every doc, deleting the dir is an
    // operator action, so the policy skips instead of crashing a
    // self-maintaining stream. The EXACT anti-join test, evaluated
    // only once a dial trips — a count proxy (tombstones >= docs)
    // latches permanently when an upstream takedown feed deletes
    // foreign ids (delete documents them as harmless), disabling ALL
    // maintenance including the silent-probe-miss band heals
    else if (foldWouldEmpty(spark, indexDir,
        tombstoneSnapshot(spark, indexDir))) "none"
    else {
      // preserve the index's bucket count: a maintenance call must not
      // reshape the physical layout as a side effect (IvfIndex's
      // bare-retrain rule). A legacy flat index (bandBuckets 0) takes
      // compact's default — compact subsumes rebucket by design there.
      if (h.streaming) foldStreaming(spark, indexDir)
      else compact(spark, indexDir,
        if (h.bandBuckets > 0) h.bandBuckets else 32)
      "compact"
    }
  }

  /** Maintenance summary — [[IvfIndex.health]]'s text-side twin: doc
    * totals vs the published n_docs, duplicate signature rows (a
    * crashed-then-retried flat append's fingerprint — probe already
    * collapses them, [[compact]] heals them), live tombstones awaiting
    * a fold, and signature↔band consistency (docs on one side only —
    * the fingerprint of a crash between the two writes; probes of such
    * docs under- or never match until a [[compact]]/[[write]] heals
    * the pair). Plus the layout facts the maintenance choice needs. */
  final case class Health(docs: Long, publishedDocs: Long,
      duplicateRows: Long, tombstones: Long, orphanBandDocs: Long,
      missingBandDocs: Long, streaming: Boolean, bandBuckets: Int)

  def health(spark: SparkSession, indexDir: String): Health = {
    val c = spark.sessionState.newHadoopConf()
    val meta = graft.util.Fs.readString(s"$indexDir/meta.json", c)
    val published = """"n_docs":(\d+)""".r.findFirstMatchIn(meta)
      .map(_.group(1).toLong).getOrElse(0L)
    val sig = spark.read.parquet(s"$indexDir/signatures").select("doc_id")
    val sigIds = sig.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nIds = sigIds.count()
      val bandIds = spark.read.parquet(s"$indexDir/bands")
        .select("doc_id").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        Health(
          docs = nIds,
          publishedDocs = published,
          duplicateRows = sig.count() - nIds,
          tombstones = tombstoneFrame(spark, indexDir)
            .map(_.count()).getOrElse(0L),
          orphanBandDocs = bandIds.join(sigIds, Seq("doc_id"), "left_anti")
            .count(),
          missingBandDocs = sigIds.join(bandIds, Seq("doc_id"), "left_anti")
            .count(),
          streaming = meta.contains("last_batch"),
          bandBuckets = bandBucketsOf(meta))
      } finally { bandIds.unpersist(blocking = false); () }
    } finally { sigIds.unpersist(blocking = false); () }
  }

  /** O(deletions) takedown — the GDPR/retraction path: record `ids`
    * (a doc_id frame) as TOMBSTONES beside the index. Deleted documents
    * stop appearing on the INDEX side of every [[probe]] immediately
    * (the candidate set anti-joins the tombstones — a per-probe cost of
    * one broadcast of the bounded takedown set) and leave the
    * signature/band files for good at the next [[compact]]. Unknown ids
    * are harmless; re-deleting is idempotent (the tombstone set dedups
    * at read). Works on every layout — streaming indexes fold their
    * tombstones at [[compactStreaming]] time via [[compact]]'s shared
    * rewrite. */
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame): Unit = {
    val c = spark.sessionState.newHadoopConf()
    require(graft.util.Fs.exists(s"$indexDir/meta.json", c),
      s"$indexDir is not a complete index (no meta.json)")
    ids.select(col("doc_id")).distinct()
      .coalesce(1) // takedown batches are bounded; one file per delete
      .write.mode("append").parquet(s"$indexDir/tombstones")
  }

  /** The live tombstone set, or None when nothing was ever deleted
    * (the common case pays one existence check, no scan). */
  private def tombstoneFrame(spark: SparkSession,
      indexDir: String): Option[DataFrame] =
    tombstoneSnapshot(spark, indexDir).map(_._2)

  /** Tombstones pinned to the FILES present right now (IvfIndex's
    * discipline): compaction folds and later clears exactly this
    * snapshot, so a takedown committed concurrently survives to the
    * next fold instead of being wiped UNFOLDED by a whole-dir delete —
    * which would silently resurrect a legally-retracted document.
    * Explicit part-file listing, not a dir read: post-clear the dir
    * can hold only _SUCCESS markers, which must mean "no tombstones",
    * not a schema-inference error. */
  private def tombstoneSnapshot(spark: SparkSession, indexDir: String)
      : Option[(Seq[String], DataFrame)] = {
    val c = spark.sessionState.newHadoopConf()
    val dir = s"$indexDir/tombstones"
    if (!graft.util.Fs.exists(dir, c)) None
    else {
      val files = graft.util.Fs.listParts(dir, c).map(_.getPath.toString)
      if (files.isEmpty) None
      else Some((files, spark.read.parquet(files: _*)
        .select("doc_id").distinct()))
    }
  }

  /** Batch-layout maintenance: rewrite `signatures/` and `bands/` minus
    * the tombstones ([[compactStreaming]]'s staged-swap discipline),
    * collapsing the small files a run of [[append]]s accumulates and
    * folding deletions into the data for good. meta's n_docs recounts
    * from the rewritten signatures; the tombstones clear LAST, so a
    * crash anywhere leaves probes exact (a surviving tombstone over
    * already-rewritten data anti-joins nothing). Legacy flat indexes
    * come out bucketed — compact subsumes [[rebucket]] when a rewrite
    * is due anyway. */
  def compact(spark: SparkSession, indexDir: String,
      bandBuckets: Int = 32): Unit = {
    val c = spark.sessionState.newHadoopConf()
    val meta = graft.util.Fs.readString(s"$indexDir/meta.json", c)
    require(!meta.contains("last_batch"),
      s"$indexDir is a streaming-layout index; use compactStreaming")
    val tombSnap = tombstoneSnapshot(spark, indexDir)
    refuseEmptyingFold(spark, indexDir, tombSnap, "compact")
    val tomb = tombSnap.map(_._2)
    swapIn(indexDir, "signatures", c) { staged =>
      val all = spark.read.parquet(s"$indexDir/signatures")
        .select("doc_id", "sh")
      val kept = tomb match {
        case Some(t) => all.join(broadcast(t), Seq("doc_id"), "left_anti")
        case None => all
      }
      // dropDuplicates: a crashed-then-retried append leaves a batch's
      // bit-identical rows twice; compact is the heal ([[health]]
      // surfaces the signal)
      kept.dropDuplicates("doc_id").write.mode("overwrite").parquet(staged)
    }
    // bands REBUILD from the compacted signatures (not a rewrite of the
    // old band rows): bands are a pure function of signatures, so this
    // also heals orphan/missing band docs — the fingerprint of a crash
    // between the two append writes. Costs one minhash pass over the
    // stored shingle sets, the right price for a maintenance op that
    // rewrites everything anyway.
    writeBandsBucketed(spark, indexDir, bandBuckets, c,
      bands(spark.read.parquet(s"$indexDir/signatures")))
    writeMeta(spark, indexDir, bandBuckets, c) // n_docs recounts, pre-clear
    tombSnap.foreach { case (files, _) =>
      files.foreach(graft.util.Fs.deleteTree(_, c)) }
  }

  /** One-shot migration of a legacy pre-bucketing index (flat `bands/`,
    * `bands_buckets` 0) to the bucketed layout: rewrites ONLY `bands/`
    * — signatures are layout-identical across generations — staged +
    * swapped with [[compactStreaming]]'s crash discipline, then commits
    * the bucket count in meta. After this every [[probe]] is
    * shuffle-free on the index side and [[append]] lands
    * bucket-aligned; the alternative (a full [[write]] rebuild) also
    * re-signatures the corpus, which this skips. */
  def rebucket(spark: SparkSession, indexDir: String,
      bandBuckets: Int = 32): Unit = {
    val c = spark.sessionState.newHadoopConf()
    val meta = graft.util.Fs.readString(s"$indexDir/meta.json", c)
    require(!meta.contains("last_batch"),
      s"$indexDir is a streaming-layout index; use compactStreaming")
    require(bandBucketsOf(meta) == 0,
      s"$indexDir already has the bucketed layout " +
        s"(bands_buckets=${bandBucketsOf(meta)})")
    rewriteBandsBucketed(spark, indexDir, bandBuckets, c)
    writeMeta(spark, indexDir, bandBuckets, c)
  }

  /** Staged bucketed rewrite of `bands/` + in-place swap (shared by
    * [[compactStreaming]] and [[rebucket]]). Tolerates a streaming
    * layout's extra batch_id column and collapses its subdirs. */
  private def rewriteBandsBucketed(spark: SparkSession, indexDir: String,
      bandBuckets: Int, c: org.apache.hadoop.conf.Configuration,
      minus: Option[DataFrame] = None): Unit = {
    val all = spark.read.parquet(s"$indexDir/bands")
      .select("doc_id", "bi", "bh")
    val kept = minus match {
      case Some(t) => all.join(broadcast(t.select("doc_id")),
        Seq("doc_id"), "left_anti")
      case None => all
    }
    writeBandsBucketed(spark, indexDir, bandBuckets, c, kept)
  }

  /** Staged bucketed write of a (doc_id, bi, bh) frame into `bands/` +
    * in-place swap + catalog refresh — the one bucketing writer behind
    * [[rewriteBandsBucketed]] (reads the old band rows — layout
    * migration) and the compaction paths (which REBUILD the rows from
    * the compacted signatures — bands are a pure function of
    * signatures, so rebuilding heals duplicate rows and
    * signature↔band inconsistencies in the same stroke). */
  private def writeBandsBucketed(spark: SparkSession, indexDir: String,
      bandBuckets: Int, c: org.apache.hadoop.conf.Configuration,
      rows: DataFrame): Unit = {
    val stgTbl = bandsTable(indexDir) + "_stg"
    swapIn(indexDir, "bands", c) { staged =>
      spark.sql(s"DROP TABLE IF EXISTS $stgTbl")
      rows.write.mode("overwrite").format("parquet")
        .bucketBy(bandBuckets, "bi", "bh").sortBy("bi", "bh")
        .option("path", staged).saveAsTable(stgTbl)
    }
    spark.sql(s"DROP TABLE IF EXISTS $stgTbl") // its location was renamed away
    // the swap replaced every file under bands/ — a live catalog entry
    // for this index still caches the OLD listing and would fail the
    // next probe with FILE_NOT_EXIST; drop its cached state (other
    // processes re-register from disk and never saw this session's
    // listing)
    val live = bandsTable(indexDir)
    if (spark.sessionState.catalog.tableExists(
        org.apache.spark.sql.catalyst.TableIdentifier(live)))
      spark.catalog.refreshTable(live)
  }

  /** Would folding the live tombstones leave ZERO docs? Exact
    * anti-join test (isEmpty short-circuits at the first survivor) —
    * count proxies are wrong in both directions, see
    * [[IvfIndex.foldWouldEmpty]]'s twin. */
  private def foldWouldEmpty(spark: SparkSession, indexDir: String,
      tombSnap: Option[(Seq[String], DataFrame)]): Boolean =
    tombSnap.exists { case (_, t) =>
      spark.read.parquet(s"$indexDir/signatures")
        .select("doc_id")
        .join(broadcast(t), Seq("doc_id"), "left_anti")
        .isEmpty
    }

  /** A fold/compact whose tombstone fold would leave ZERO docs is
    * refused — [[IvfIndex]]'s rule, same rationale: the rewrite would
    * produce a parquet-less signatures/ that every subsequent read
    * (probe, health, the n_docs recount itself) crashes on instead of
    * answering "empty". Retraction is already effective (probes
    * exclude every doc); deleting the index dir is the operator action
    * for a fully-retracted corpus. [[maintain]] skips this state. */
  private def refuseEmptyingFold(spark: SparkSession, indexDir: String,
      tombSnap: Option[(Seq[String], DataFrame)], op: String): Unit =
    if (foldWouldEmpty(spark, indexDir, tombSnap))
      throw new IllegalStateException(
        s"$indexDir: $op would empty the index — every doc is " +
          "tombstoned. Retraction is already complete (probes " +
          "exclude all docs); delete the index directory to reclaim " +
          "the space instead")

  /** Write a staged replacement for `indexDir/name`, then swap it in
    * (write → rename live→old → rename staged→live → drop old). A crash
    * at any point leaves complete copies only; the guard names the one
    * recovering rename if a previous swap died between its renames. */
  private def swapIn(indexDir: String, name: String,
      c: org.apache.hadoop.conf.Configuration)(
      writeStaged: String => Unit): Unit = {
    val live = s"$indexDir/$name"
    val old = s"$indexDir/${name}_old"
    val staged = s"$indexDir/${name}_compacting"
    if (!graft.util.Fs.exists(live, c) && graft.util.Fs.exists(old, c))
      throw new IllegalStateException(
        s"$indexDir: interrupted compact — recover with: rename $old -> $live")
    graft.util.Fs.deleteTree(old, c)
    graft.util.Fs.deleteTree(staged, c)
    writeStaged(staged)
    graft.util.Fs.rename(live, old, c)
    graft.util.Fs.rename(staged, live, c)
    graft.util.Fs.deleteTree(old, c)
  }

  /** Near-duplicates of `batchSigs` (a [[signatures]] frame — the
    * caller persists it if it also feeds other work) against the
    * persisted index: (batch_id, base_id, jaccard_permille), true
    * Jaccard ≥ `minPermille`, self-pairs excluded so an appended batch
    * can be probed against its own index. */
  def probe(spark: SparkSession, indexDir: String, batchSigs: DataFrame,
      minPermille: Int = 500): DataFrame = {
    // batch-layout indexes carry bucketed bands: read through the
    // (re-)registered catalog table so the scan reports its
    // HashPartitioning(bh) and the candidate join shuffles ONLY the
    // batch side (MinHashIndexSpec pins the plan). Streaming-layout
    // indexes (per-batch dirs — the idempotent-commit trade) read
    // flat and pay the index-side shuffle until [[compactStreaming]]
    // converts them.
    val meta = graft.util.Fs.readString(s"$indexDir/meta.json",
      spark.sessionState.newHadoopConf())
    val buckets = bandBucketsOf(meta)
    val idxBands =
      if (buckets > 0 && !meta.contains("last_batch"))
        spark.table(registerBandsTable(spark, indexDir, buckets))
      else {
        if (buckets == 0 && !meta.contains("last_batch"))
          System.err.println(s"[minhash-index] $indexDir has the legacy " +
            "flat layout — every probe pays an index-side shuffle; run " +
            "MinHashIndex.rebucket(indexDir) once to adopt the bucketed " +
            "layout")
        spark.read.parquet(s"$indexDir/bands")
          .select("doc_id", "bi", "bh") // drop streaming batch_id if present
      }
    val idxSigs = spark.read.parquet(s"$indexDir/signatures")
      .select("doc_id", "sh")
    val cand0 = bands(batchSigs)
      .select(col("doc_id").as("batch_id"), col("bi"), col("bh"))
      .join(idxBands.select(col("doc_id").as("base_id"),
        col("bi").as("bi2"), col("bh").as("bh2")),
        col("bi") === col("bi2") && col("bh") === col("bh2") &&
          col("batch_id") =!= col("base_id"))
      .select("batch_id", "base_id")
      .distinct()
    // tombstoned documents are retracted from the INDEX side at probe
    // time (one broadcast anti-join over the already-small candidate
    // set); compact() folds them out of the files for good
    val cand = tombstoneFrame(spark, indexDir) match {
      case Some(t) => cand0.join(broadcast(t.select(col("doc_id")
        .as("base_id"))), Seq("base_id"), "left_anti")
      case None => cand0
    }
    cand
      .join(idxSigs.select(col("doc_id").as("base_id"), col("sh").as("sh_a")), "base_id")
      .join(batchSigs.select(col("doc_id").as("batch_id"), col("sh").as("sh_b")), "batch_id")
      // same fence as m01: the intersect — the expensive op — must run
      // exactly once per distinct pair, not re-inlined into the filter
      .select(col("batch_id"), col("base_id"),
        graft.functions.OptimizerBarrier.fence(
          expr("size(array_intersect(sh_a, sh_b))").cast("bigint")).as("common"),
        expr("size(sh_a)").cast("bigint").as("na"),
        expr("size(sh_b)").cast("bigint").as("nb"))
      .select(col("batch_id"), col("base_id"),
        expr("common * 1000 div (na + nb - common)").as("jaccard_permille"))
      .filter(col("jaccard_permille") >= minPermille)
      // flat-append crash hardening: a batch-API append that crashed
      // between its data writes and the meta rewrite, then was retried,
      // leaves DUPLICATE signature/band rows for the re-appended docs.
      // Candidates already collapse (the .distinct above), but each
      // duplicated index signature would re-emit its pairs — dedup the
      // OUTPUT pair set (tiny: only verified near-dups shuffle) rather
      // than the index signatures (a corpus-sized shuffle per probe).
      // The duplicated rows are bit-identical, so this is exact.
      .dropDuplicates("batch_id", "base_id")
  }
}
