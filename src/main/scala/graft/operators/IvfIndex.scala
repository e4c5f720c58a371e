package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Fs

/** Persisted IVF index layout + partition-pruned EXACT search.
  *
  * [[IvfAnn]] builds its inverted lists per query run; this operator
  * materializes them as the TABLE LAYOUT — embeddings written
  * cluster-partitioned (`data/cluster=<j>/…`) with the trained
  * centroids, per-cluster radii and member counts in a `meta.json`
  * sidecar. That is the shape an embedding corpus should sit in at
  * 100 TB: the expensive clustering shuffle is paid ONCE at ingest,
  * and every subsequent search's cluster pruning becomes parquet
  * PARTITION pruning — the [[searchExact]] scan lists only the pruned
  * cluster directories (`PartitionFilters: cluster IN (…)`,
  * IvfIndexSpec pins it), so the files of skipped clusters are never
  * opened, let alone read. Search stays provably exact: the probe's
  * cluster list comes from the same Cauchy-Schwarz bound as
  * [[IvfAnn.knnExact]] ([[IvfAnn.pruneThreshold]]), so the pruned union
  * covers the true top-k on any corpus and the output hash-matches the
  * e01 brute force.
  *
  * Scale shape: the write is one assignment pass + a partitioned
  * write (the one shuffle you persist); a search moves only the
  * bounded probe set (its cluster fan-out ≤ k) and the member rows of
  * the clusters the bound admits. The needed-cluster union collected
  * on the driver is O(probes × k) ints — metadata, not data.
  *
  * CROSS-PROCESS MAINTENANCE CONTRACT (single maintainer): the
  * rewriting operations — [[compact]], [[foldStreaming]], [[retrain]],
  * [[retrainStreaming]] — share one staged-swap protocol
  * ([[stagedDataSwap]]) plus, for the retrains, the RETRAINING marker
  * fence. That protects against CRASHES (every intermediate state is a
  * complete layout; an interrupted swap is detected and refused with
  * the recovering rename named; an interrupted retrain fences all
  * reads until a re-run) — not against CONCURRENT maintainers: two
  * processes rewriting one index dir can interleave their renames into
  * a mixed-generation layout. Exactly ONE process may run maintenance
  * on an index dir at a time — for a streaming index, the stream's own
  * foreachBatch (where [[maintain]] runs), which serializes
  * maintenance against appends by construction. Concurrent SEARCHES
  * during a compact are safe-but-loud (complete layout or
  * FILE_NOT_EXIST, never silently mixed files); during a retrain they
  * refuse via the marker.
  */
object IvfIndex {

  /** `lastBatch` is Some only for STREAMING-layout indexes
    * ([[initStreaming]]/[[appendBatch]] — per-batch partition dirs,
    * batch id as the commit fence); None marks the flat batch layout
    * ([[write]]/[[append]]). The two layouts reject each other's
    * mutation APIs, same discipline as [[MinHashIndex]]. */
  final case class Meta(k: Int, dim: Int, maxNorm: Double,
      centroids: Seq[Array[Double]], radius: Array[Double], counts: Array[Long],
      lastBatch: Option[Long] = None)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Build the index: train (deterministic Lloyd), assign, write the
    * corpus partitioned by cluster, persist centroids + pruning stats.
    * Jackson serializes doubles via Double.toString, which round-trips
    * bit-exactly — the reloaded pruning bounds are the ones computed
    * here. */
  def write(spark: SparkSession, srcDir: String, indexDir: String,
      k: Int = 16, iters: Int = 2, trainSampleFraction: Double = 1.0): Unit = {
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    // sampled training is the 100 TB dial (IvfAnn.hashSample's doc):
    // centroids come from the sample, but radius/count stats are ALWAYS
    // full-corpus — that is what keeps searchExact provably exact under
    // any trainSampleFraction (IvfIndexSpec pins it at 0.25)
    val cents = IvfAnn.trainCentroids(emb, k, iters, trainSampleFraction)
    // ONE assignment pass feeds both the data write and the pruning
    // stats (r20: clusterStats ran its own full assignment pass and
    // assign a second one — guide §1.2, don't compute the same thing
    // twice). Bit-identical meta: distToAssigned evaluates the same
    // l2sq kernel on the same operands as clusterStats' per-row
    // distance, and max/count aggregates are order-insensitive on
    // exact doubles, so radius/counts/maxNorm — and therefore every
    // later pruning decision — are unchanged (IvfIndexSpec's meta
    // round-trip and exactness gates pin it).
    val assigned = IvfAnn.distToAssigned(IvfAnn.assign(emb, cents), cents)
      .withColumn("nrm", sqrt(graft.functions.ArrayMath.dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"))))
      .select(col("vec_id"), col("embedding"),
        col("label").cast("int").as("cluster"), col("d"), col("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // §6 file-layout hygiene (r21): with a multi-partition corpus the
      // zero-shuffle write emits one file per (input partition ×
      // cluster present in it) — up to k × tasks small files, the
      // many-small-files failure a persisted partitioned layout exists
      // to avoid. A cluster-keyed REBALANCE makes each cluster's rows
      // contiguous in one writer → ≈ one file per cluster (the Iceberg
      // write.distribution-mode=hash posture); AQE both coalesces tiny
      // clusters into shared writers and splits a skewed cluster across
      // several. The rebalance is GATED on the input actually being
      // multi-partition: a single-partition corpus (every gate-SF
      // bench) already writes exactly one file per cluster, and the
      // exchange would be pure cost there — the gate derives from the
      // data, not the local core count, so the same code stays
      // shuffle-free at bench scale and compact at 100 TB.
      // maxRecordsPerFile bounds a giant cluster's file near the
      // ~128 MB target band, derived from the measured dim.
      val data = assigned.select(col("vec_id"), col("embedding"), col("cluster"))
      val clustered =
        if (data.rdd.getNumPartitions > 1) data.hint("rebalance", col("cluster"))
        else data
      val dim = cents.head.length
      val rowsPerFile = math.max(1L, (128L << 20) / (dim.toLong * 8 + 32))
      clustered
        .write.mode("overwrite").partitionBy("cluster")
        .option("maxRecordsPerFile", rowsPerFile)
        .parquet(s"$indexDir/data")
      val rows = assigned.groupBy("cluster")
        .agg(max("d").as("r"), max("nrm").as("mx"), count(lit(1)).as("n"))
        .collect()
      val radius = new Array[Double](cents.length)
      val counts = new Array[Long](cents.length)
      var maxNorm = 0.0
      rows.foreach { r =>
        radius(r.getInt(0)) = r.getDouble(1); counts(r.getInt(0)) = r.getLong(3)
        maxNorm = math.max(maxNorm, r.getDouble(2))
      }
      writeMeta(indexDir, Meta(k, cents.head.length, maxNorm, cents,
        radius, counts), spark.sessionState.newHadoopConf())
    } finally { assigned.unpersist(false); () }
  }

  /** The in-progress-retrain fence: present from just before
    * [[retrain]]'s data swap until after its meta publish. While it
    * exists the index may hold NEW cluster assignments under the OLD
    * meta — centroids/radius/counts that no longer describe the data —
    * so a search pruning with them would be silently inexact with no
    * on-disk trace. [[readMeta]] refuses while the marker exists, which
    * makes every public entry point (search, append, delete, compact,
    * health) refuse loudly; only a retrain re-run clears it. */
  private def retrainMarker(indexDir: String) = s"$indexDir/RETRAINING"

  /** The in-progress-fold fence — the same window for the COUNTS-only
    * rewrites ([[foldStreaming]], and [[compact]] on a streaming
    * layout): their dedup heal REDUCES data rows, so a crash between
    * the data swap and the counts publish leaves meta.counts
    * overstating the data — the prune-threshold direction that breaks
    * exactness. (The batch layout never needs this: [[append]]'s
    * counts publish LAST, so its crash-retry duplicate rows were never
    * counted and the old counts match the deduped data exactly;
    * [[appendBatch]] counts every batch row, so a cross-batch
    * re-ingested id IS double-counted until a fold.) Weaker than the
    * retrain fence: meta's centroids/radius still describe the data,
    * only counts diverge, so a fold/compact re-run OR a retrain
    * converges. */
  private def foldMarker(indexDir: String) = s"$indexDir/FOLDING"

  /** All file IO goes through the Hadoop FileSystem of the path's
    * scheme ([[graft.util.Fs]]) — an index dir can be `hdfs://…` or
    * `s3a://…`, same as the parquet data beside it.
    *
    * Refuses while a [[retrain]] or a streaming fold/compact is in
    * flight or died mid-publish (marker present): the stored meta may
    * describe a clustering (RETRAINING) or counts (FOLDING) the data
    * no longer has, and pruning with them is the silent-inexactness
    * direction. Recovery is stated in each error; both re-runs
    * converge from any intermediate state. */
  def readMeta(indexDir: String, c: Configuration): Meta = {
    if (Fs.exists(retrainMarker(indexDir), c))
      throw new IllegalStateException(
        s"$indexDir: interrupted retrain (RETRAINING marker present) — " +
          "the data/meta pair may be mixed-generation; re-run " +
          "IvfIndex.retrain to converge before searching or mutating")
    if (Fs.exists(foldMarker(indexDir), c))
      throw new IllegalStateException(
        s"$indexDir: interrupted fold/compact (FOLDING marker present) — " +
          "meta.counts may overstate the deduped data; re-run " +
          "IvfIndex.foldStreaming (or compact, or retrain) to converge " +
          "before searching or mutating")
    readMetaRaw(indexDir, c)
  }

  /** Entry check for the fold-class rewrites: they tolerate their OWN
    * crashed marker (the re-run is the recovery) but must refuse a
    * crashed RETRAIN — folding mixed-generation data would recount
    * rows under centroids that do not describe them. */
  private def refuseIfRetraining(indexDir: String, c: Configuration): Unit =
    if (Fs.exists(retrainMarker(indexDir), c))
      throw new IllegalStateException(
        s"$indexDir: interrupted retrain (RETRAINING marker present) — " +
          "only a retrain re-run converges from this state")

  /** The interrupted-swap audit every fold-class rewrite runs BEFORE
    * its first read of `data/` as parquet: a crash between
    * [[stagedDataSwap]]'s two renames leaves `data/` missing with the
    * complete copy in `data_old`, and reading `data/` then (the
    * would-empty check, the fold itself) throws an
    * unable-to-infer-schema error instead of naming the one recovering
    * rename. stagedDataSwap repeats the audit, but by the time it runs
    * the earlier reads have already crashed uninformatively. `op`
    * names the caller in the no-data message. */
  private def auditInterruptedSwap(indexDir: String, c: Configuration,
      op: String): Unit = {
    // the state does not identify WHICH fold-class op crashed (compact,
    // fold, and retrain share stagedDataSwap), so the message names the
    // state, never a guessed operation
    if (!Fs.exists(s"$indexDir/data", c) &&
        Fs.exists(s"$indexDir/data_old", c))
      throw new IllegalStateException(
        s"$indexDir: interrupted compact/fold/retrain (staged data swap " +
          s"died between its renames) — recover with: rename " +
          s"$indexDir/data_old -> $indexDir/data")
    require(Fs.exists(s"$indexDir/data", c),
      s"$indexDir has no data/ yet (streaming index before its first " +
        s"batch) — nothing to $op")
  }

  /** Would folding the live tombstones leave ZERO rows? The EXACT
    * anti-join test (isEmpty short-circuits at the first surviving
    * row, so the healthy-path cost is a partial scan) — count proxies
    * are wrong in both directions: tombstones include foreign ids
    * (never in data) and rows include crash-retry duplicates. */
  private def foldWouldEmpty(spark: SparkSession, indexDir: String,
      tombSnap: Option[(Seq[String], DataFrame)]): Boolean =
    tombSnap.exists { case (_, t) =>
      spark.read.parquet(s"$indexDir/data")
        .join(broadcast(t.select("vec_id")), Seq("vec_id"), "left_anti")
        .isEmpty
    }

  /** A fold/compact whose tombstone fold would leave ZERO rows is
    * refused: the rewrite would produce a parquet-less data/ that every
    * subsequent read (search, health, the recount itself) crashes on
    * with an unable-to-infer-schema error instead of answering
    * "empty". Nothing is lost by refusing — the retraction is already
    * fully effective at search time (every row is tombstone-excluded);
    * the remaining operator action for a fully-retracted corpus is
    * deleting the index directory, not maintaining it. [[maintain]]
    * skips this state instead of tripping it. */
  private def refuseEmptyingFold(spark: SparkSession, indexDir: String,
      tombSnap: Option[(Seq[String], DataFrame)], op: String): Unit =
    if (foldWouldEmpty(spark, indexDir, tombSnap))
      throw new IllegalStateException(
        s"$indexDir: $op would empty the index — every row is " +
          "tombstoned. Retraction is already complete (searches " +
          "exclude all rows); delete the index directory to reclaim " +
          "the space instead")

  private def readMetaRaw(indexDir: String, c: Configuration): Meta = {
    val node = mapper.readTree(Fs.readString(s"$indexDir/meta.json", c))
    Meta(
      k = node.get("k").asInt(),
      dim = node.get("dim").asInt(),
      maxNorm = node.get("maxNorm").asDouble(),
      centroids = IndexMetaJson.centroids(node),
      radius = IndexMetaJson.doubles(node.get("radius")),
      counts = IndexMetaJson.longs(node.get("counts")),
      lastBatch = Option(node.get("last_batch")).map(_.asLong()))
  }

  /** Append a batch of new vectors to an existing index WITHOUT
    * retraining — the daily-ingest operation. New vectors are assigned
    * to the frozen centroids (so partition layout stays stable and no
    * existing file is rewritten — parquet append adds files inside the
    * matching cluster directories), and the pruning metadata is updated
    * EXACTLY, not conservatively: per-cluster radius is the max of the
    * old radius and the appended members' distances, counts add, and
    * maxNorm takes the batch max — so [[searchExact]]'s bound stays a
    * proof over the grown corpus. Centroid drift is the deliberate
    * trade (same as every production IVF index): assignment quality
    * decays as the distribution shifts, which is a re-train decision,
    * not a correctness one — exactness never depends on WHICH cluster
    * a vector sits in, only on that cluster's radius covering it.
    *
    * Crash safety: the update is staged so EVERY intermediate state
    * keeps [[searchExact]]'s bound a proof over whatever data is
    * visible. Radius/maxNorm can only safely LEAD the data (a too-large
    * radius prunes less), counts can only safely TRAIL it (an
    * understated count reaches top-k coverage later, so the threshold
    * is lower and prunes less — an overstated count would prune from
    * rows that do not exist yet). So: (1) publish the grown
    * radius/maxNorm with the OLD counts — atomic temp+rename, see
    * [[graft.util.Fs.writeStringAtomic]]; (2) append the data files;
    * (3) publish the grown counts. A crash between any two steps
    * leaves a conservative — never inexact — index. */
  def append(spark: SparkSession, batchDir: String, indexDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = readMeta(indexDir, conf)
    require(meta.lastBatch.isEmpty,
      s"$indexDir is a streaming-layout index (batch-partitioned dirs); " +
        "use appendBatch — a flat append would break partition discovery")
    val batchAll = spark.read.parquet(s"$batchDir/embeddings.parquet")
    // tombstoned ids never re-enter (see appendBatch — re-landing would
    // overstate counts and break the pruning proof)
    val batch = tombstoneFrame(spark, indexDir) match {
      case Some(t) => batchAll.join(broadcast(t.select("vec_id")),
        Seq("vec_id"), "left_anti")
      case None => batchAll
    }
    // ONE materialization (appendBatch's discipline — localCheckpoint,
    // not two independent plans): the stats and the written rows MUST
    // come from the same evaluation, or a source re-read between them
    // publishes bounds that never covered the data
    val assigned = IvfAnn.distToAssigned(
        IvfAnn.assign(batch, meta.centroids), meta.centroids)
      .withColumn("nrm", sqrt(graft.functions.ArrayMath.dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"))))
      .select(col("vec_id"), col("embedding"),
        col("label").cast("int").as("cluster"), col("d"), col("nrm"))
      .localCheckpoint(true)
    val upd = assigned
      .groupBy("cluster").agg(max("d").as("r"), max("nrm").as("mx"),
        count(lit(1)).as("n"))
      .collect()
    val radius = meta.radius.clone()
    val counts = meta.counts.clone()
    var maxNorm = meta.maxNorm
    upd.foreach { r =>
      val c = r.getInt(0)
      radius(c) = math.max(radius(c), r.getDouble(1))
      counts(c) += r.getLong(3)
      maxNorm = math.max(maxNorm, r.getDouble(2))
    }
    // (1) bounds lead the data (old counts), (2) data, (3) counts trail
    writeMeta(indexDir, meta.copy(radius = radius, maxNorm = maxNorm), conf)
    assigned.select("vec_id", "embedding", "cluster")
      .write.mode("append").partitionBy("cluster")
      .parquet(s"$indexDir/data")
    writeMeta(indexDir, meta.copy(radius = radius, counts = counts,
      maxNorm = maxNorm), conf)
  }

  /** Create an EMPTY streaming-layout index: train centroids once on a
    * bootstrap corpus (the frozen assignment function), write meta with
    * zero counts/radius and `last_batch = -1`. Vectors then arrive
    * exclusively through [[appendBatch]]; every batch owns a
    * `data/batch_id=N/cluster=J/` partition subtree. The bootstrap
    * corpus is TRAINING data only — it is not ingested (ingest it as
    * batch 0 if it should also be searchable). */
  def initStreaming(spark: SparkSession, bootstrapDir: String,
      indexDir: String, k: Int = 16, iters: Int = 2): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val emb = spark.read.parquet(s"$bootstrapDir/embeddings.parquet")
    val cents = IvfAnn.trainCentroids(emb, k, iters)
    Fs.deleteTree(indexDir, conf)
    writeMeta(indexDir, Meta(k, cents.head.length, 0.0, cents,
      new Array[Double](k), new Array[Long](k), lastBatch = Some(-1L)), conf)
  }

  /** Replay-safe micro-batch ingestion — [[MinHashIndex.appendBatch]]'s
    * discipline carried to the IVF layout, COMPOSED with [[append]]'s
    * bounds-lead-data staging (exactness here depends on meta, which
    * the MinHash case never had to worry about):
    *
    *   1. publish grown radius/maxNorm with the OLD counts and OLD
    *      last_batch (atomic rename) — bounds may only LEAD the data;
    *   2. overwrite `data/batch_id=N/` — the batch owns its dir, so a
    *      crashed partial write is healed by the re-delivered rewrite,
    *      and its rows are covered by the already-published bounds the
    *      moment they appear;
    *   3. publish grown counts + `last_batch = N` — counts TRAIL the
    *      data (understating only loosens pruning), and last_batch is
    *      the single commit fence: a re-delivered committed batch
    *      writes nothing (returns false), a batch id BELOW the fence
    *      fails loudly (restarted id space).
    *
    * Every crash point therefore leaves an index over which
    * [[searchExact]]'s bound remains a proof, and no batch can
    * double-insert or double-count. */
  def appendBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
      batchId: Long): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = readMeta(indexDir, conf)
    val last = meta.lastBatch.getOrElse(throw new IllegalArgumentException(
      s"$indexDir is a batch-API index (no last_batch in meta.json); " +
        "streaming appendBatch and write/append layouts must not mix"))
    if (batchId < last)
      throw new IllegalStateException(
        s"appendBatch($batchId) but $indexDir already committed batch $last: " +
          "the micro-batch id space restarted (fresh checkpoint dir over an " +
          "existing index, or two queries sharing it) — use a new indexDir " +
          "or restore the original checkpoint")
    if (batchId == last) return false // committed replay: data is complete
    // a tombstoned id must never re-enter: if it landed again, its data
    // row would be counted while the tombstone both subtracts one count
    // AND anti-joins every copy — a net count OVERSTATEMENT, which
    // tightens the prune threshold and silently breaks exactness (the
    // one direction the conservative-stats design must never move).
    // Filtering the batch keeps "deleted until compact clears the
    // tombstone" literal: the row never lands.
    val batch0 = tombstoneFrame(spark, indexDir) match {
      case Some(t) => batch.join(broadcast(t.select("vec_id")),
        Seq("vec_id"), "left_anti")
      case None => batch
    }
    // ONE materialization of the caller's batch plan feeds BOTH the
    // pruning stats and the data write: evaluating it twice would let a
    // nondeterministic input (a re-evaluated sample, a re-read mutable
    // source) write vectors the published radius/maxNorm never covered,
    // silently voiding searchExact's pruning proof. localCheckpoint,
    // not persist: persist still RECOMPUTES evicted or lost blocks from
    // the source plan — the same double-evaluation through a side door.
    // Checkpointing truncates lineage, so block loss fails the batch
    // loudly (and the streaming runtime redelivers it) instead of
    // silently writing unmeasured rows. Blocks release through the
    // ContextCleaner once the frame is unreachable.
    val assigned = IvfAnn.distToAssigned(
        IvfAnn.assign(batch0, meta.centroids), meta.centroids)
      .withColumn("nrm", sqrt(graft.functions.ArrayMath.dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"))))
      .select(col("vec_id"), col("embedding"),
        col("label").cast("int").as("cluster"), col("d"), col("nrm"))
      .localCheckpoint(true)
    val upd = assigned
      .groupBy("cluster").agg(max("d").as("r"), max("nrm").as("mx"),
        count(lit(1)).as("n"))
      .collect()
    val radius = meta.radius.clone()
    val counts = meta.counts.clone()
    var maxNorm = meta.maxNorm
    upd.foreach { r =>
      val c = r.getInt(0)
      radius(c) = math.max(radius(c), r.getDouble(1))
      counts(c) += r.getLong(3)
      maxNorm = math.max(maxNorm, r.getDouble(2))
    }
    writeMeta(indexDir, meta.copy(radius = radius, maxNorm = maxNorm), conf)
    assigned.select("vec_id", "embedding", "cluster")
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$indexDir/data/batch_id=$batchId")
    writeMeta(indexDir, meta.copy(radius = radius, counts = counts,
      maxNorm = maxNorm, lastBatch = Some(batchId)), conf)
    true
  }

  /** Compact the index after a run of appends — the small-files answer.
    * Every [[append]] adds at least one file per touched cluster
    * directory; a year of daily batches is 365 files per list, and scan
    * setup cost scales with file count even when partition pruning
    * skips the bytes. Rewrite the data cluster-partitioned with one
    * task per cluster (repartition on the partition column → one file
    * per list), staged to a sibling directory and swapped in via two
    * renames — Spark correctly refuses an in-place overwrite of its own
    * input. The swap is not a single atomic operation: a crash between
    * the renames leaves `data_old`/`data_compacting` beside a missing
    * or old `data` — both complete layouts, recoverable by one rename,
    * never a silently mixed directory. Row set and pruning metadata are
    * unchanged, so search results are identical before and after
    * (spec-pinned). Compacting a STREAMING-layout index additionally
    * FINALIZES it into the batch layout (last_batch dropped — the
    * per-batch commit dirs it fenced no longer exist). */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    // tolerate a crashed fold/compact's own FOLDING marker (this re-run
    // IS the documented recovery) but never a crashed retrain's
    refuseIfRetraining(indexDir, conf)
    auditInterruptedSwap(indexDir, conf, "compact")
    val meta = readMetaRaw(indexDir, conf)
    val streaming = meta.lastBatch.isDefined
    val newCounts = new Array[Long](meta.k)
    val tombSnap = tombstoneSnapshot(spark, indexDir)
    refuseEmptyingFold(spark, indexDir, tombSnap, "compact")
    // the dedup heal REDUCES rows; whether the published counts then
    // overstate the data under a crash depends on the layout. Batch
    // layout: append's counts publish LAST, so crash-retry duplicate
    // rows were never counted — old counts equal the deduped data and
    // an unfenced crash window stays exact. Streaming layout:
    // appendBatch counts EVERY batch row, so a vec_id re-ingested
    // across batches IS double-counted until this fold — a crash
    // between the swap and the counts publish would leave overstated
    // counts (the prune-threshold direction that breaks exactness), so
    // that window is fenced by the FOLDING marker.
    if (streaming)
      Fs.writeStringAtomic(foldMarker(indexDir),
        "fold/compact in flight — re-run to converge\n", conf)
    stagedDataSwap(spark, indexDir, conf) { (all, staged) =>
      // compaction FOLDS tombstones: deleted rows leave the data files
      // for good and the exact per-cluster counts are recomputed from
      // what survives. radius/maxNorm stay as stored — bounds of a
      // superset cover the subset, so searchExact's proof holds.
      val kept = tombSnap match {
        case Some((_, t)) => all.join(broadcast(t.select("vec_id")),
          Seq("vec_id"), "left_anti")
        case None => all
      }
      // dropDuplicates(vec_id): crashed-retry appends (batch layout) or
      // cross-batch re-ingests (streaming layout) leave an id twice —
      // a search would emit the candidate twice; compact is the
      // documented heal, and the recount republishes exact totals
      kept.dropDuplicates("vec_id")
        .repartition(meta.k, col("cluster"))
        .write.mode("overwrite").partitionBy("cluster").parquet(staged)
      spark.read.parquet(staged)
        .groupBy("cluster").agg(count(lit(1)).as("n")).collect()
        .foreach(r => newCounts(r.getInt(0)) = r.getLong(1))
    }
    // commit order matters for exactness under a crash: publish the
    // REDUCED counts while the tombstones still exist (a crash between
    // the two steps double-subtracts — clamped at 0, only loosens
    // pruning, still exact), then clear the tombstones; the reverse
    // order would leave OVERSTATED counts with no tombstones to
    // subtract, overstating the prune threshold — silently inexact.
    // Compacting a STREAMING index also FINALIZES it into the batch
    // layout (per-batch commit dirs are gone, so the batch-id fence is
    // meaningless): drop last_batch so appendBatch rejects a resumed
    // stream loudly — MinHashIndex.compactStreaming's handoff.
    writeMeta(indexDir, meta.copy(counts = newCounts, lastBatch = None), conf)
    tombSnap.foreach { case (files, _) =>
      clearTombstoneFiles(spark, indexDir, files) }
    // unconditional: a crashed STREAMING compact re-runs as a BATCH one
    // (last_batch already dropped at its writeMeta), and the stale
    // marker from the first attempt must still clear
    Fs.deleteTree(foldMarker(indexDir), conf)
  }

  /** Mid-stream compaction — [[compact]]'s fold for a LIVE streaming
    * index: tombstones leave the files for good, crash-retry duplicate
    * rows heal, the run of per-batch small dirs collapses into ONE
    * `batch_id=<last_batch>` subtree, and the exact per-cluster counts
    * republish — but meta KEEPS `last_batch`, so the owning stream's
    * next [[appendBatch]] lands beside the folded subtree unbroken
    * (same two-level layout, so partition discovery never sees mixed
    * schemas). [[compact]] remains the END-of-stream handoff that
    * finalizes into the batch layout; this is the maintenance
    * primitive [[maintain]] fires BETWEEN micro-batches. Commit order
    * is compact's: reduced counts publish while the tombstone snapshot
    * still exists (a crash between double-subtracts, clamped —
    * conservative, never inexact); the swap-to-counts window — where a
    * crash would leave counts OVERSTATING the dedup-healed data (the
    * inexact direction, since appendBatch double-counts cross-batch
    * re-ingests) — is fenced by the FOLDING marker, which [[readMeta]]
    * refuses and a fold/compact/retrain re-run clears. Single-
    * maintainer contract: run it from the stream's own foreachBatch,
    * never from a second process. */
  def foldStreaming(spark: SparkSession, indexDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    // tolerate our own crashed marker (the re-run is the recovery),
    // refuse a crashed retrain's (only retrain converges from that)
    refuseIfRetraining(indexDir, conf)
    auditInterruptedSwap(indexDir, conf, "fold")
    val meta = readMetaRaw(indexDir, conf)
    val last = meta.lastBatch.getOrElse(throw new IllegalArgumentException(
      s"$indexDir is a batch-layout index; use compact"))
    val newCounts = new Array[Long](meta.k)
    val tombSnap = tombstoneSnapshot(spark, indexDir)
    refuseEmptyingFold(spark, indexDir, tombSnap, "foldStreaming")
    Fs.writeStringAtomic(foldMarker(indexDir),
      "fold in flight — re-run IvfIndex.foldStreaming to converge\n", conf)
    stagedDataSwap(spark, indexDir, conf) { (all, staged) =>
      val kept = tombSnap match {
        case Some((_, t)) => all.join(broadcast(t.select("vec_id")),
          Seq("vec_id"), "left_anti")
        case None => all
      }
      kept.dropDuplicates("vec_id")
        .withColumn("batch_id", lit(last))
        .repartition(meta.k, col("cluster"))
        .write.mode("overwrite").partitionBy("batch_id", "cluster")
        .parquet(staged)
      spark.read.parquet(staged)
        .groupBy("cluster").agg(count(lit(1)).as("n")).collect()
        .foreach(r => newCounts(r.getInt(0)) = r.getLong(1))
    }
    writeMeta(indexDir, meta.copy(counts = newCounts), conf) // last_batch kept
    tombSnap.foreach { case (files, _) =>
      clearTombstoneFiles(spark, indexDir, files) }
    Fs.deleteTree(foldMarker(indexDir), conf)
  }

  /** Turn [[health]]'s measurements into at most ONE maintenance action
    * under [[MaintenancePolicy]]'s dials, layout-aware (a live
    * streaming index folds/retrains IN layout; a batch index uses
    * [[compact]]/[[retrain]]). Returns "retrain", "compact", or "none".
    *
    * Precedence: imbalance wins — retrain also folds tombstones and
    * heals duplicates, so when both dials trip one retrain suffices.
    * Below `minRows`, nothing fires: a rewrite of a small index costs
    * more than the degradation it heals, and early-ingest shapes
    * (every vector in one of two clusters) read as "imbalance" without
    * being drift. Idempotent by construction: after an action the
    * signals it keyed on are back under their dials, so a replayed
    * check returns "none". Single-maintainer contract: one process —
    * for a streaming index, the stream's own foreachBatch — owns
    * maintenance on an index dir. */
  def maintain(spark: SparkSession, indexDir: String,
      policy: MaintenancePolicy): String = {
    val h = health(spark, indexDir)
    if (h.rows < policy.minRows) return "none"
    // the fixed-list-size dial: mean list exceeded 2·L ⇒ retrain at
    // k = ⌈rows/L⌉ (rows INCLUDING tombstoned ones — they still occupy
    // list files and candidate scans until the retrain folds them, so
    // data rows are the signal search cost actually tracks). The 2×
    // trip point restores ~L and spaces retrains geometrically —
    // O(log n) rewrites over an unbounded ingest, constant per-probe
    // candidate volume (nprobe·L) in between.
    val listTripped = policy.targetListSize.exists(l =>
      h.clusters > 0 && h.rows > 2L * l * h.clusters)
    val wantRetrain = h.imbalance > policy.maxImbalance || listTripped
    val wantFold =
      h.tombstones * 1000L > policy.maxTombstonePermille * h.rows ||
      h.duplicateIds * 1000L > policy.maxDuplicatePermille * h.rows
    if (!wantRetrain && !wantFold) return "none"
    // a fully-retracted corpus is NOT a maintenance state: the fold
    // would empty the index (refused — see refuseEmptyingFold) and the
    // retrain has nothing to cluster. Searches already exclude every
    // row; deleting the dir is an operator action, so the policy skips
    // rather than crashing a self-maintaining stream. The EXACT
    // anti-join test, evaluated only once a dial trips — a count proxy
    // (tombstones >= rows) is wrong in BOTH directions: foreign-id
    // tombstones inflate the left side (permanently latching the skip
    // and disabling all maintenance while most docs are live), and
    // crash-retry duplicate rows inflate the right side (letting a
    // fully-retracted index slip past into the refusal crash).
    if (foldWouldEmpty(spark, indexDir, tombstoneSnapshot(spark, indexDir)))
      return "none"
    if (wantRetrain) {
      // k stays at the stored value (0 = preserve) unless the list-size
      // dial tripped, in which case the retrain re-dials k to hit the
      // target; Int-capped — 2^31 clusters is beyond any real corpus
      val newK = policy.targetListSize match {
        case Some(l) if listTripped =>
          math.min((h.rows + l - 1) / l, Int.MaxValue.toLong).toInt
        case _ => 0
      }
      if (h.streaming) retrainStreaming(spark, indexDir, k = newK)
      else retrain(spark, indexDir, k = newK)
      "retrain"
    } else {
      if (h.streaming) foldStreaming(spark, indexDir)
      else compact(spark, indexDir)
      "compact"
    }
  }

  /** The staged `data/` replacement shared by [[compact]] and
    * [[retrain]] — ONE definition of the crash-recovery protocol:
    * leftover-state audit (a crash between the renames leaves data/
    * missing with the complete copy in data_old — refuse and name the
    * one recovering rename; a data_old BESIDE an intact data/ is just
    * post-swap garbage), stale staging cleanup, the staged write
    * (callback receives the CURRENT rows and the staging path), then
    * rename data→old, staged→data, drop old. */
  private def stagedDataSwap(spark: SparkSession, indexDir: String,
      conf: Configuration)(
      writeStaged: (DataFrame, String) => Unit): Unit = {
    val data = s"$indexDir/data"
    val old = s"$indexDir/data_old"
    val staged = s"$indexDir/data_compacting"
    if (!Fs.exists(data, conf) && Fs.exists(old, conf))
      throw new IllegalStateException(
        s"$indexDir: interrupted compact/fold/retrain (staged data swap " +
          s"died between its renames) — recover with: rename $old -> $data")
    require(Fs.exists(data, conf),
      s"$indexDir has no data/ yet (streaming index before its first " +
        "batch) — nothing to rewrite")
    Fs.deleteTree(old, conf)
    Fs.deleteTree(staged, conf)
    writeStaged(spark.read.parquet(data)
      .select("vec_id", "embedding", "cluster"), staged)
    Fs.rename(data, old, conf)
    Fs.rename(staged, data, conf)
    Fs.deleteTree(old, conf)
  }

  /** Re-cluster the CURRENT corpus — the answer to [[append]]'s
    * documented centroid drift. Append froze the assignment function,
    * so a shifted distribution degrades PRUNING (inflated radii,
    * lopsided lists) while staying exact; retrain restores it: read
    * the vectors (minus tombstones, folded here like [[compact]]),
    * train fresh deterministic-Lloyd centroids, reassign, rewrite
    * cluster-partitioned, and republish radius/counts/maxNorm computed
    * exactly over the new clustering. Streaming layouts finalize into
    * the batch layout (compact's handoff).
    *
    * Concurrency/crash contract — STRICTER than compact's, because the
    * cluster ids change meaning. The swap-to-meta window is fenced by
    * an on-disk RETRAINING marker (atomic create before the swap,
    * removed after the meta publish AND the late-tombstone
    * re-resolution below): while it exists, [[readMeta]] — and with it
    * every search, append, delete, compact and health call — refuses
    * loudly, so a crash in the window cannot produce a silently
    * inexact search. The only way to clear the marker is a retrain
    * re-run, which always converges: retrain consumes only (vec_id,
    * embedding), which every intermediate state preserves as a set.
    * (If the crash also interrupted the swap itself, the re-run's
    * stagedDataSwap audit names the one recovering rename first.)
    *
    * Tombstones committed DURING the retrain (after its snapshot)
    * carry cluster ids of the PRE-retrain clustering; left as-is,
    * search would subtract their counts from the wrong new cluster —
    * understating one (conservative) but leaving the true cluster's
    * count OVERSTATED, the direction that breaks the pruning proof. So
    * after the meta publish, any late tombstone files are rewritten
    * with clusters re-derived from the NEW data (the same one-scan
    * join [[delete]] uses) before the marker clears. Re-derived rows
    * are written before the stale files are removed: an overlap window
    * subtracts from both the old and new cluster of the same row —
    * clamped, conservative, never inexact.
    *
    * Exactness after a COMPLETED retrain needs no new proof — the
    * bound never depended on which cluster a vector sits in, only on
    * the published stats matching the published assignment, which they
    * do by construction here.
    *
    * `k = 0` (the default) preserves the index's current cluster
    * count — a bare maintenance `retrain()` never reshapes the index
    * as a side effect; pass an explicit k to resize. */
  def retrain(spark: SparkSession, indexDir: String, k: Int = 0,
      iters: Int = 2): Unit =
    retrainHooked(spark, indexDir, k, iters, () => (), keepStreaming = false)

  /** [[retrain]] for a LIVE streaming index — the mid-stream drift
    * answer [[maintain]] fires between micro-batches: same re-cluster,
    * fold, and marker fence, but the rewrite lands under ONE
    * `batch_id=<last_batch>` subtree and meta KEEPS `last_batch`, so
    * the owning stream's next [[appendBatch]] (which re-reads meta and
    * therefore assigns against the NEW centroids) continues unbroken.
    * Single-maintainer contract: call it from the stream's own
    * foreachBatch (between batches), never from a second process. */
  def retrainStreaming(spark: SparkSession, indexDir: String, k: Int = 0,
      iters: Int = 2): Unit =
    retrainHooked(spark, indexDir, k, iters, () => (), keepStreaming = true)

  /** [[retrain]] with a test seam: `lateWindow` runs after the meta
    * publish and snapshot clear, just before the late-tombstone
    * re-resolution — the only way a spec can deterministically land a
    * "concurrent" delete inside the window the re-resolution exists
    * for (a real concurrent delete refuses once the marker is up, so
    * only a delete that STARTED before the marker can race in). */
  private[operators] def retrainHooked(spark: SparkSession, indexDir: String,
      k: Int, iters: Int, lateWindow: () => Unit,
      keepStreaming: Boolean = false): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val meta0 = readMetaRaw(indexDir, conf)
    val kk = if (k > 0) k else meta0.k
    val last =
      if (!keepStreaming) None
      else Some(meta0.lastBatch.getOrElse(throw new IllegalArgumentException(
        s"$indexDir is a batch-layout index; use retrain")))
    val tombSnap = tombstoneSnapshot(spark, indexDir)
    // deterministic-failure pre-flight BEFORE the fence goes up: the
    // marker's recovery instruction is "re-run retrain", so a failure
    // the re-run would deterministically repeat (no data/ yet on a
    // pre-first-batch streaming index; an interrupted swap awaiting
    // its recovering rename; a fully-tombstoned corpus with nothing to
    // cluster) must throw while the index is still readable — fencing
    // first would brick it behind an unfollowable instruction.
    // Mid-swap failures after the fence (OOM, disk full) are the
    // transient kind the re-run genuinely converges from.
    auditInterruptedSwap(indexDir, conf, "retrain")
    val wouldEmpty = tombSnap match {
      case None => spark.read.parquet(s"$indexDir/data").isEmpty
      case some => foldWouldEmpty(spark, indexDir, some) // ONE definition
    }
    if (wouldEmpty)
      throw new IllegalStateException(
        s"$indexDir: every row is tombstoned (or the corpus is empty) — " +
          "nothing to re-cluster; delete the index instead")
    var newMeta: Option[Meta] = None
    Fs.writeStringAtomic(retrainMarker(indexDir),
      "retrain in flight — re-run IvfIndex.retrain to converge\n", conf)
    stagedDataSwap(spark, indexDir, conf) { (all, staged) =>
      val kept0 = tombSnap match {
        case Some((_, t)) => all.join(broadcast(t.select("vec_id")),
          Seq("vec_id"), "left_anti")
        case None => all
      }
      val kept = kept0.dropDuplicates("vec_id") // compact's crash-retry heal
      val cents = IvfAnn.trainCentroids(kept, kk, iters)
      val stats = IvfAnn.clusterStats(kept, cents)
      val assigned = IvfAnn.assign(kept, cents)
        .select(col("vec_id"), col("embedding"),
          col("label").cast("int").as("cluster"))
        .repartition(kk, col("cluster"))
      last match {
        case Some(b) => assigned.withColumn("batch_id", lit(b))
          .write.mode("overwrite").partitionBy("batch_id", "cluster")
          .parquet(staged)
        case None => assigned
          .write.mode("overwrite").partitionBy("cluster").parquet(staged)
      }
      newMeta = Some(Meta(kk, cents.head.length, stats.maxNorm, cents,
        stats.radius, stats.count, lastBatch = last))
    }
    writeMeta(indexDir, newMeta.get, conf)
    tombSnap.foreach { case (files, _) =>
      clearTombstoneFiles(spark, indexDir, files) }
    lateWindow()
    // late tombstones (committed after the snapshot): their rows
    // SURVIVED into the new data (only snapshot tombstones were
    // folded), so the data join re-derives each one's new cluster.
    // DRAINED in a loop, not one pass: only deletes that passed their
    // readMeta check BEFORE the marker went up can still commit (the
    // fence refuses new ones), so the in-flight set is finite and each
    // iteration clears what landed since the previous snapshot — the
    // loop terminates when a snapshot comes back empty. Residual
    // window, documented honestly: a pre-fence delete whose write
    // commits AFTER the final empty snapshot (a stalled job landing
    // minutes later) keeps its pre-retrain cluster id until the next
    // fold/compact/retrain re-derives it — overstating one new
    // cluster's count until then.
    // `rederived` tracks THIS loop's own outputs so the next snapshot
    // doesn't re-process them forever; re-deriving an already-derived
    // file would be idempotent (same data join), only termination
    // needs the bookkeeping. A racing arrival that lands between our
    // write and the post-write listing is misclassified as ours —
    // that's the residual window above, nothing new.
    var rederived = Set.empty[String]
    var drained = false
    while (!drained) {
      tombstoneSnapshot(spark, indexDir) match {
        case None => drained = true
        case Some((files, late)) =>
          val pending = files.filterNot(rederived)
          if (pending.isEmpty) drained = true
          else {
            spark.read.parquet(s"$indexDir/data")
              .join(broadcast(late.select("vec_id")), Seq("vec_id"))
              .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
              .distinct()
              .coalesce(1)
              .write.mode("append").parquet(s"$indexDir/tombstones")
            val after = Fs.listParts(s"$indexDir/tombstones", conf)
              .map(_.getPath.toString)
            rederived ++= after.toSet -- files.toSet
            clearTombstoneFiles(spark, indexDir, pending)
          }
      }
    }
    // a completed retrain also resolves a crashed fold's concern — the
    // republished counts are exact over the rewritten data — and
    // readMeta's FOLDING recovery names retrain as a convergence path,
    // so a stale fold fence must not survive it (it would keep every
    // reader refusing after a successful recovery, and retrain re-runs
    // would loop forever without ever clearing it)
    Fs.deleteTree(foldMarker(indexDir), conf)
    Fs.deleteTree(retrainMarker(indexDir), conf)
  }

  /** Converge a crashed fold THIS maintainer left behind — the
    * self-recovery hook [[graft.streaming.StreamingIvfProbe]] runs at
    * the top of each micro-batch. A process that died inside its own
    * [[foldStreaming]] (or a streaming [[compact]]) leaves the FOLDING
    * marker, and on restart the replayed batch's search/append — via
    * [[readMeta]] — would refuse forever, even though the documented
    * recovery (re-running the fold) is exactly what the maintenance
    * slot the caller owns may do; without this, "self-maintaining"
    * degrades to operator intervention for a state maintenance itself
    * created. No-op without the marker (one exists-check per call).
    * Still REFUSES on RETRAINING: the fold-class re-run is cheap and
    * meaning-preserving, but a retrain re-clusters the whole corpus —
    * a deterministic retrain failure re-fired implicitly at every
    * stream restart would loop that bill forever, so the stronger
    * fence stays an explicit operator decision. Returns the converging
    * action ("fold" or "compact" — a crashed streaming compact re-runs
    * as a batch one, having already dropped last_batch) or "none". */
  def recoverFold(spark: SparkSession, indexDir: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    if (!Fs.exists(foldMarker(indexDir), conf)) return "none"
    refuseIfRetraining(indexDir, conf)
    if (readMetaRaw(indexDir, conf).lastBatch.isDefined) {
      foldStreaming(spark, indexDir); "fold"
    } else { compact(spark, indexDir); "compact" }
  }

  /** Maintenance summary — the measured inputs to the compact/retrain
    * decision: data rows vs the published pruning counts, live
    * tombstones awaiting a fold, duplicate-id rows (the fingerprint of
    * a crashed-then-retried append — [[compact]] heals them), and the
    * cluster-size imbalance factor (max/mean — drifting ingest skews
    * lists, degrading pruning until a [[retrain]]). One scan over the
    * data; O(k) driver rows. */
  final case class Health(clusters: Int, rows: Long, publishedCount: Long,
      tombstones: Long, duplicateIds: Long, imbalance: Double,
      streaming: Boolean = false)

  def health(spark: SparkSession, indexDir: String): Health = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = readMeta(indexDir, conf)
    val streaming = meta.lastBatch.isDefined // the layout fact maintain keys on
    // a freshly initStreaming'd index has meta but no data/ until its
    // first batch — a legitimate state health must report, not crash on
    if (!Fs.exists(s"$indexDir/data", conf))
      return Health(meta.k, 0L, meta.counts.sum,
        tombstoneFrame(spark, indexDir).map(_.count()).getOrElse(0L),
        0L, 0.0, streaming)
    val byCluster = spark.read.parquet(s"$indexDir/data")
      .groupBy("cluster").agg(count(lit(1)).as("n"),
        countDistinct("vec_id").as("nd"))
      .collect()
    val rows = byCluster.map(_.getLong(1)).sum
    val distinct = byCluster.map(_.getLong(2)).sum
    val tomb = tombstoneFrame(spark, indexDir).map(_.count()).getOrElse(0L)
    val maxN = if (byCluster.isEmpty) 0L else byCluster.map(_.getLong(1)).max
    val mean = rows.toDouble / meta.k
    Health(meta.k, rows, meta.counts.sum, tomb, rows - distinct,
      if (mean == 0) 0.0 else maxN / mean, streaming)
  }

  /** O(deletions) takedown: record `ids` (a vec_id frame) as TOMBSTONES
    * beside the data — the GDPR/retraction path. Deleted vectors stop
    * appearing as probes or candidates immediately (every search
    * subtracts their stored cluster assignment from the pruning counts
    * exactly, so [[searchExact]] remains a proof over the reduced
    * corpus) and leave the files at the next [[compact]]. Ids not in
    * the index are ignored; re-deleting is idempotent (tombstones
    * dedup at read). Note: a deleted id re-ingested through
    * [[appendBatch]] stays hidden until a compact clears the
    * tombstone — delete is corpus-wide retraction, not row versioning. */
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    readMeta(indexDir, conf) // validates the index exists before writing
    // id-only input → the clusters come from ONE data scan. At corpus
    // scale prefer [[deleteVectors]] when the takedown request carries
    // the vectors: it skips this scan entirely.
    spark.read.parquet(s"$indexDir/data")
      .join(broadcast(ids.select(col("vec_id"))), Seq("vec_id"))
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
      .distinct()
      .coalesce(1) // takedown batches are bounded; one file per delete
      .write.mode("append").parquet(s"$indexDir/tombstones")
  }

  /** O(batch) delete for callers holding the vectors (vec_id,
    * embedding): the cluster comes from assignment against the CURRENT
    * centroids — exactly how every ingest path ([[write]]/[[append]]/
    * [[appendBatch]]) and [[retrain]]'s rewrite placed the row, so the
    * tombstone lands on the row's true cluster without touching the
    * corpus — PROVIDED the supplied embeddings are the ones INGESTED
    * (a drifted embedding would tombstone the wrong cluster,
    * overstating the true cluster's count — the inexact direction;
    * when in doubt use the id-only [[delete]], which reads the truth
    * from the index). Ids not in the index produce tombstones that
    * exclude nothing (vec_id anti-join misses) and whose count
    * subtraction is clamped — conservative, never inexact. */
  def deleteVectors(spark: SparkSession, indexDir: String,
      vectors: DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = readMeta(indexDir, conf)
    IvfAnn.assign(vectors, meta.centroids)
      .select(col("vec_id"), col("label").cast("int").as("cluster"))
      .distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$indexDir/tombstones")
  }

  /** The live tombstone set: distinct (vec_id, cluster), or None when
    * nothing was ever deleted (the common case pays one existence
    * check, no scan). */
  private def tombstoneFrame(spark: SparkSession,
      indexDir: String): Option[DataFrame] =
    tombstoneSnapshot(spark, indexDir).map(_._2)

  /** Tombstones pinned to the FILES present right now: compaction folds
    * and later clears exactly this snapshot, so a takedown committed
    * concurrently (a delete() landing after the snapshot) survives to
    * the next fold instead of being wiped UNFOLDED by a whole-dir
    * delete — which would silently resurrect a legally-retracted
    * document. */
  private def tombstoneSnapshot(spark: SparkSession, indexDir: String)
      : Option[(Seq[String], DataFrame)] = {
    val c = spark.sessionState.newHadoopConf()
    val dir = s"$indexDir/tombstones"
    if (!Fs.exists(dir, c)) None
    else {
      // explicit part-file listing, not a dir read: after a snapshot
      // clear the dir can legitimately hold only _SUCCESS markers, and
      // a dir-level parquet read of that throws instead of meaning
      // "no tombstones"
      val files = Fs.listParts(dir, c).map(_.getPath.toString)
      if (files.isEmpty) None
      else Some((files, spark.read.parquet(files: _*)
        .select(col("vec_id"), col("cluster")).distinct()))
    }
  }

  /** Clear exactly a snapshot's files (never the dir): later-arriving
    * tombstones stay live for search and for the next fold. */
  private def clearTombstoneFiles(spark: SparkSession, indexDir: String,
      files: Seq[String]): Unit = {
    val c = spark.sessionState.newHadoopConf()
    files.foreach(Fs.deleteTree(_, c))
  }

  /** Drop tombstoned probes from an index-derived probe frame (external
    * probe frames are never filtered — they are the caller's). */
  private def dropTombstonedProbes(spark: SparkSession, indexDir: String,
      probes: DataFrame): DataFrame =
    tombstoneFrame(spark, indexDir) match {
      case Some(t) => probes.join(broadcast(t.select("vec_id")),
        Seq("vec_id"), "left_anti")
      case None => probes
    }

  private def writeMeta(indexDir: String, meta: Meta, c: Configuration): Unit = {
    val root = mapper.createObjectNode()
    root.put("k", meta.k)
    root.put("dim", meta.dim)
    IndexMetaJson.putCommon(root, meta.maxNorm, meta.centroids,
      meta.radius, meta.counts)
    meta.lastBatch.foreach(b => root.put("last_batch", b))
    // temp + atomic rename: a reader never observes a torn meta.json
    Fs.writeStringAtomic(s"$indexDir/meta.json", mapper.writeValueAsString(root), c)
  }

  /** Fixed-nprobe APPROXIMATE search over the written index — the
    * recall/cost dial when the exact bound's fan-out isn't worth it
    * (e12's rationale applied to the persisted layout). Same literal
    * partition pruning; recall is a dial — IvfIndexSpec pins the same
    * ≥ 0.5 floor as IvfAnnSpec on the near-random driver corpus (the
    * adversarial case) and that nprobe = k reproduces [[searchExact]]
    * exactly. */
  def searchApprox(spark: SparkSession, indexDir: String, probePred: Column,
      topK: Int = 10, nprobe: Int = 4): DataFrame = {
    val data = spark.read.parquet(s"$indexDir/data")
    approxCore(spark, indexDir,
      dropTombstonedProbes(spark, indexDir, data.filter(probePred)), topK,
      nprobe, None)
  }

  /** Fixed-nprobe APPROXIMATE search for an EXTERNAL probe frame — the
    * streaming dial: [[searchExactFrame]]'s shape with
    * [[searchApprox]]'s bounded fan-out. `excludeCands` removes
    * vectors from the candidate side (the replaying-batch case); the
    * probe list itself is count-independent (nearest nprobe
    * centroids), so replay output is identical to first delivery by
    * the same argument, without any stats adjustment. */
  def searchApproxFrame(spark: SparkSession, indexDir: String,
      probes: DataFrame, topK: Int = 10, nprobe: Int = 4,
      excludeCands: Option[DataFrame] = None): DataFrame =
    approxCore(spark, indexDir, probes, topK, nprobe, excludeCands)

  private def approxCore(spark: SparkSession, indexDir: String,
      probes: DataFrame, topK: Int, nprobe: Int,
      excludeCands: Option[DataFrame],
      keepQv: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the PASSED session's conf, not the thread-local active session's:
    // the parquet scan beside this read resolves through `spark`, and
    // meta.json must resolve through the same credentials/filesystem
    val meta = readMeta(indexDir, spark.sessionState.newHadoopConf())
    val data = spark.read.parquet(s"$indexDir/data")
    val probeClusters = IvfAnn
      .probeClustersNearest(probes, meta.centroids, nprobe)
      .select(col("vec_id").as("query_id"), expr(IvfAnn.quant).as("pq"),
        col("cluster"))
    val needed = probeClusters.select("cluster").distinct()
      .collect().map(_.getInt(0)).sorted
    val corpusAll = data
      .filter(col("cluster").isin(needed.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("vec_id").as("cand_id"), expr(IvfAnn.quant).as("qv"),
        col("cluster"))
    // approx has no counts math, so tombstones only need the
    // candidate-side exclusion here
    val excludeIds = (tombstoneFrame(spark, indexDir).map(_.select(col("vec_id"))),
        excludeCands.map(_.select(col("vec_id")))) match {
      case (Some(a), Some(b)) => Some(a.union(b))
      case (a, b) => a.orElse(b)
    }
    val corpus = excludeIds match {
      case None => corpusAll
      case Some(ex) => corpusAll.join(
        broadcast(ex.select(col("vec_id").as("cand_id"))),
        Seq("cand_id"), "left_anti")
    }
    // keepQv: same carry-through as searchCore's — searchDiverseApprox
    // re-ranks over these vectors without a second scan
    val candColsA =
      if (keepQv)
        Seq(col("query_id"), col("cand_id"),
          IvfAnn.qdot("pq", "qv").as("dot"), col("qv"))
      else
        Seq(col("query_id"), col("cand_id"),
          IvfAnn.qdot("pq", "qv").as("dot"))
    val cands = probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("cand_id"))
      .select(candColsA: _*)
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }

  /** EXACT top-k max-inner-product search over a written index. The
    * probe rows are read with their vec_id filter pushed to parquet;
    * each probe's provably-sufficient cluster list (IvfAnn's bound)
    * explodes to (query_id, pq, cluster), the union of needed clusters
    * becomes a LITERAL partition filter on the corpus scan — static
    * pruning, no dependence on join-time dynamic pruning heuristics —
    * and each corpus row lives in exactly one partition, so the
    * cluster equi-join yields every candidate pair exactly once (no
    * distinct). One exact integer rerank per pair, WindowGroupLimit
    * top-k. */
  def searchExact(spark: SparkSession, indexDir: String, probePred: Column,
      topK: Int = 10): DataFrame = {
    val data = spark.read.parquet(s"$indexDir/data")
    searchCore(spark, indexDir,
      dropTombstonedProbes(spark, indexDir, data.filter(probePred)), topK, None)
  }

  /** EXACT range (radius) search over the persisted layout —
    * IvfAnn.rangeSearch's partition-pruned twin: every candidate with
    * den·qdot(p,c) ≥ num·qdot(p,p) (the per-probe RELATIVE threshold;
    * absolute dot floors are corpus-magnitude-fragile). The
    * fixed-threshold Cauchy-Schwarz prune becomes LITERAL cluster
    * partition filters, so skipped clusters' files are never opened —
    * at 100 TB this is where range search actually pays, because a
    * tight threshold skips most of the corpus at the FILE level.
    * Tombstoned probes and candidates are excluded exactly (the m06
    * posture); unlike top-k, NO count subtraction is needed — a fixed
    * threshold reads no counts, so deletions can never perturb the
    * bound (the prune stays a proof with zero bookkeeping).
    * Output (query_id, cand_id, dot) ordered deterministically. */
  def searchRange(spark: SparkSession, indexDir: String, probePred: Column,
      num: Int = 1, den: Int = 4): DataFrame = {
    require(num >= 0 && den > 0, s"threshold fraction $num/$den")
    val meta = readMeta(indexDir, spark.sessionState.newHadoopConf())
    val stats = IvfAnn.ClusterStats(meta.radius, meta.counts, meta.maxNorm)
    val data = spark.read.parquet(s"$indexDir/data")
    val probes = dropTombstonedProbes(spark, indexDir, data.filter(probePred))
    val probeClusters = IvfAnn
      .probeClustersRange(probes, meta.centroids, stats, num, den)
      .select(col("vec_id").as("query_id"), expr(IvfAnn.quant).as("pq"),
        graft.functions.ArrayMath.dot(
          expr(IvfAnn.quant), expr(IvfAnn.quant)).as("qself"),
        col("cluster"))
    // bounded probe set ⇒ the needed-list union is driver metadata;
    // literals guarantee static partition pruning (searchCore's pattern)
    val needed = probeClusters.select("cluster").distinct()
      .collect().map(_.getInt(0)).sorted
    val corpusAll = data
      .filter(col("cluster").isin(needed.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("vec_id").as("cand_id"), expr(IvfAnn.quant).as("qv"),
        col("cluster"))
    val corpus = tombstoneFrame(spark, indexDir) match {
      case None => corpusAll
      case Some(t) => corpusAll.join(
        broadcast(t.select(col("vec_id").as("cand_id"))),
        Seq("cand_id"), "left_anti")
    }
    probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        IvfAnn.qdot("pq", "qv").as("dot"), col("qself"))
      .filter(col("dot") * den >= col("qself") * num)
      .select("query_id", "cand_id", "dot")
      .orderBy("query_id", "cand_id")
  }

  /** DIVERSITY-aware search: exact top-`m` candidates (searchExact's
    * provably-pruned scan), then operators.Mmr greedily re-ranks each
    * query's pool down to `k` — λ·relevance minus (1−λ)·max-similarity
    * to the already-selected set, the Carbonell–Goldstein MMR rule —
    * so the k results aren't k copies of the same neighborhood. ONE
    * kernel definition with the oracled `e18_mmr_rerank` query
    * (IvfIndexSpec pins this path ≡ the e18 relation on the same
    * probes). Extra cost over searchExact: none on the corpus side —
    * the candidates' quantized vectors are already materialized inside
    * the pruned search for its dot products, so searchCore carries
    * them through the top-M (keepQv) instead of a second scan
    * re-fetching them.
    *
    * @return (query_id, step, cand_id, mmr_score) in greedy trajectory
    *         order, step 1..k. */
  def searchDiverse(spark: SparkSession, indexDir: String, probePred: Column,
      k: Int = 8, m: Int = 24, lamNum: Int = 7, lamDen: Int = 10): DataFrame = {
    require(m >= k, s"candidate pool m=$m must be >= k=$k")
    val data = spark.read.parquet(s"$indexDir/data")
    val topm = searchCore(spark, indexDir,
      dropTombstonedProbes(spark, indexDir, data.filter(probePred)), m,
      None, keepQv = true)
      .select("query_id", "cand_id", "dot", "qv")
    Mmr.rerank(topm, k, lamNum, lamDen)
  }

  /** [[searchDiverse]]'s scale dial: the candidate pool comes from the
    * fixed-nprobe APPROXIMATE search (searchApprox's rationale — at
    * production nlist the exact bound can touch many clusters; nprobe
    * bounds the fan-out), then the same Mmr kernel re-ranks it. At
    * nprobe = all lists the top-m pool equals [[searchDiverse]]'s, so
    * the greedy trajectory equals searchDiverse's bit-exactly
    * (IvfIndexSpec pins this, e14's posture); at smaller nprobe the
    * pool — and hence the trajectory — is approximate by design. */
  def searchDiverseApprox(spark: SparkSession, indexDir: String,
      probePred: Column, k: Int = 8, m: Int = 24, nprobe: Int = 4,
      lamNum: Int = 7, lamDen: Int = 10): DataFrame = {
    require(m >= k, s"candidate pool m=$m must be >= k=$k")
    val data = spark.read.parquet(s"$indexDir/data")
    val topm = approxCore(spark, indexDir,
      dropTombstonedProbes(spark, indexDir, data.filter(probePred)), m,
      nprobe, None, keepQv = true)
      .select("query_id", "cand_id", "dot", "qv")
    Mmr.rerank(topm, k, lamNum, lamDen)
  }

  /** EXACT top-k search for an EXTERNAL probe frame (vec_id,
    * embedding) — vectors that are not (or not yet) in the index: the
    * streaming-ingestion probe shape, where each arriving batch asks
    * for its nearest EARLIER vectors. `excludeCands` — a (vec_id,
    * embedding) frame: the embeddings are REQUIRED, the exact count
    * subtraction re-assigns them to the frozen centroids (an ids-only
    * frame would force a silent no-subtraction fallback that breaks
    * the replay-identical guarantee; searchApproxFrame, with no counts
    * math, is the ids-only-friendly sibling) —
    * removes vectors from the CANDIDATE side exactly — their
    * per-cluster assignment counts are subtracted from the pruning
    * stats before the threshold is computed (clamped at 0;
    * understating counts only loosens the threshold, so the bound
    * stays a proof over the reduced candidate set, while radius and
    * maxNorm stay conservatively large). That is what makes a REPLAYED
    * streaming batch — whose vectors already sit in the index —
    * produce bit-identical output to its first delivery. */
  def searchExactFrame(spark: SparkSession, indexDir: String,
      probes: DataFrame, topK: Int = 10,
      excludeCands: Option[DataFrame] = None): DataFrame =
    searchCore(spark, indexDir, probes, topK, excludeCands)

  private def searchCore(spark: SparkSession, indexDir: String,
      probes: DataFrame, topK: Int,
      excludeCands: Option[DataFrame],
      keepQv: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val meta = readMeta(indexDir, spark.sessionState.newHadoopConf())
    val tomb = tombstoneFrame(spark, indexDir)
    val countsT = tomb match {
      case None => meta.counts
      case Some(t) =>
        // tombstones carry their cluster, so the subtraction needs no
        // assignment pass; clamped at 0 like every exclusion — an
        // understated count only loosens the prune threshold.
        val c = meta.counts.clone()
        t.groupBy("cluster").agg(count(lit(1)).as("n")).collect()
          .foreach { r =>
            val j = r.getInt(0)
            c(j) = math.max(0L, c(j) - r.getLong(1))
          }
        c
    }
    val counts = excludeCands match {
      case None => countsT
      case Some(ex) =>
        // exact per-cluster subtraction: assignment to the frozen
        // centroids is deterministic, so the excluded rows' clusters
        // are known without touching the index. O(k) driver rows.
        // (An id both tombstoned and excluded subtracts twice — the
        // clamp keeps that conservative, never inexact.)
        val c = countsT.clone()
        IvfAnn.assign(ex, meta.centroids)
          .groupBy("label").agg(count(lit(1)).as("n")).collect()
          .foreach { r =>
            val j = r.getLong(0).toInt
            c(j) = math.max(0L, c(j) - r.getLong(1))
          }
        c
    }
    val stats = IvfAnn.ClusterStats(meta.radius, counts, meta.maxNorm)
    val data = spark.read.parquet(s"$indexDir/data")
    val probeClusters = IvfAnn
      .probeClustersExact(probes, meta.centroids, stats, topK)
      .select(col("vec_id").as("query_id"), expr(IvfAnn.quant).as("pq"),
        col("cluster"))
    // bounded probe set ⇒ the needed-list union is driver metadata;
    // inlining it as literals guarantees static partition pruning
    val needed = probeClusters.select("cluster").distinct()
      .collect().map(_.getInt(0)).sorted
    val corpusAll = data
      .filter(col("cluster").isin(needed.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("vec_id").as("cand_id"), expr(IvfAnn.quant).as("qv"),
        col("cluster"))
    val excludeIds = (tomb.map(_.select(col("vec_id"))),
        excludeCands.map(_.select(col("vec_id")))) match {
      case (Some(a), Some(b)) => Some(a.union(b))
      case (a, b) => a.orElse(b)
    }
    val corpus = excludeIds match {
      case None => corpusAll
      case Some(ex) => corpusAll.join(
        broadcast(ex.select(col("vec_id").as("cand_id"))),
        Seq("cand_id"), "left_anti")
    }
    // keepQv: the candidates' quantized vectors are already
    // materialized for the dot — searchDiverse carries them through
    // the top-k instead of paying a second corpus scan to re-fetch
    // them (public searchExact keeps its 4-column schema)
    val candCols =
      if (keepQv)
        Seq(col("query_id"), col("cand_id"),
          IvfAnn.qdot("pq", "qv").as("dot"), col("qv"))
      else
        Seq(col("query_id"), col("cand_id"),
          IvfAnn.qdot("pq", "qv").as("dot"))
    val cands = probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("cand_id"))
      .select(candCols: _*)
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }
}
