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
  */
object IvfIndex {

  final case class Meta(k: Int, dim: Int, maxNorm: Double,
      centroids: Seq[Array[Double]], radius: Array[Double], counts: Array[Long])

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Build the index: train (deterministic Lloyd), assign, write the
    * corpus partitioned by cluster, persist centroids + pruning stats.
    * Jackson serializes doubles via Double.toString, which round-trips
    * bit-exactly — the reloaded pruning bounds are the ones computed
    * here. */
  def write(spark: SparkSession, srcDir: String, indexDir: String,
      k: Int = 16, iters: Int = 2): Unit = {
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val cents = IvfAnn.trainCentroids(emb, k, iters)
    val stats = IvfAnn.clusterStats(emb, cents)
    IvfAnn.assign(emb, cents)
      .select(col("vec_id"), col("embedding"), col("label").cast("int").as("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$indexDir/data")
    writeMeta(indexDir, Meta(k, cents.head.length, stats.maxNorm, cents,
      stats.radius, stats.count), spark.sessionState.newHadoopConf())
  }

  /** All file IO goes through the Hadoop FileSystem of the path's
    * scheme ([[graft.util.Fs]]) — an index dir can be `hdfs://…` or
    * `s3a://…`, same as the parquet data beside it. */
  def readMeta(indexDir: String, c: Configuration = Fs.conf()): Meta = {
    val node = mapper.readTree(Fs.readString(s"$indexDir/meta.json", c))
    import scala.jdk.CollectionConverters._
    Meta(
      k = node.get("k").asInt(),
      dim = node.get("dim").asInt(),
      maxNorm = node.get("maxNorm").asDouble(),
      centroids = node.get("centroids").elements().asScala
        .map(row => row.elements().asScala.map(_.asDouble()).toArray).toSeq,
      radius = node.get("radius").elements().asScala.map(_.asDouble()).toArray,
      counts = node.get("counts").elements().asScala.map(_.asLong()).toArray)
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
    val batch = spark.read.parquet(s"$batchDir/embeddings.parquet")
    val assigned = IvfAnn.assign(batch, meta.centroids)
      .select(col("vec_id"), col("embedding"), col("label").cast("int").as("cluster"))
    // exact metadata update from the batch side only (O(batch) scan),
    // computed BEFORE any mutation so the staged publishes are pure
    val upd = IvfAnn.assign(batch, meta.centroids)
      .select(col("label").cast("int").as("cluster"),
        sqrt(graft.functions.ArrayMath.l2sq(
          col("embedding").cast("array<double>"),
          centLit(meta.centroids))).as("d"),
        sqrt(graft.functions.ArrayMath.dot(
          col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"))).as("nrm"))
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
    assigned.write.mode("append").partitionBy("cluster")
      .parquet(s"$indexDir/data")
    writeMeta(indexDir, meta.copy(radius = radius, counts = counts,
      maxNorm = maxNorm), conf)
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
    * never a silently mixed directory. Row set and metadata are
    * unchanged, so search results are identical before and after
    * (spec-pinned). */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val data = s"$indexDir/data"
    val old = s"$indexDir/data_old"
    val staged = s"$indexDir/data_compacting"
    // leftover-state audit before touching anything: a prior compact
    // that crashed between its two renames leaves data/ MISSING with
    // the only complete copy in data_old — refuse and name the one
    // recovering rename rather than plow a new compact into it. A
    // data_old BESIDE an intact data/ is the post-swap window (crash
    // before cleanup): data/ is complete, the leftover is garbage.
    if (!Fs.exists(data, conf) && Fs.exists(old, conf))
      throw new IllegalStateException(
        s"$indexDir: interrupted compact — recover with: rename $old -> $data")
    Fs.deleteTree(old, conf)
    Fs.deleteTree(staged, conf)
    val meta = readMeta(indexDir, conf)
    spark.read.parquet(data)
      .repartition(meta.k, col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(staged)
    Fs.rename(data, old, conf)
    Fs.rename(staged, data, conf)
    Fs.deleteTree(old, conf)
  }

  /** The assigned cluster's centroid as a per-row array column:
    * element_at over a literal array-of-arrays indexed by `label`. */
  private def centLit(cents: Seq[Array[Double]]): Column =
    element_at(array(cents.map(c => array(c.map(lit(_)): _*)): _*),
      col("label").cast("int") + 1)

  private def writeMeta(indexDir: String, meta: Meta, c: Configuration): Unit = {
    val root = mapper.createObjectNode()
    root.put("k", meta.k)
    root.put("dim", meta.dim)
    root.put("maxNorm", meta.maxNorm)
    val cn = root.putArray("centroids")
    meta.centroids.foreach { cc => val a = cn.addArray(); cc.foreach(a.add) }
    val rn = root.putArray("radius"); meta.radius.foreach(rn.add)
    val mn = root.putArray("counts"); meta.counts.foreach(mn.add)
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
    import org.apache.spark.sql.expressions.Window
    // the PASSED session's conf, not the thread-local active session's:
    // the parquet scan beside this read resolves through `spark`, and
    // meta.json must resolve through the same credentials/filesystem
    val meta = readMeta(indexDir, spark.sessionState.newHadoopConf())
    val data = spark.read.parquet(s"$indexDir/data")
    val probeClusters = data.filter(probePred)
      .withColumn("dists", IvfAnn.distArray(meta.centroids))
      .select(col("vec_id").as("query_id"), expr(IvfAnn.quant).as("pq"),
        explode(IvfAnn.nearestClusters(meta.centroids.length, nprobe)).as("cluster"))
    val needed = probeClusters.select("cluster").distinct()
      .collect().map(_.getInt(0)).sorted
    val corpus = data
      .filter(col("cluster").isin(needed.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("vec_id").as("cand_id"), expr(IvfAnn.quant).as("qv"),
        col("cluster"))
    val cands = probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        IvfAnn.qdot("pq", "qv").as("dot"))
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
    import org.apache.spark.sql.expressions.Window
    val meta = readMeta(indexDir, spark.sessionState.newHadoopConf())
    val stats = IvfAnn.ClusterStats(meta.radius, meta.counts, meta.maxNorm)
    val data = spark.read.parquet(s"$indexDir/data")
    val probeClusters = data.filter(probePred)
      .withColumn("cdots", IvfAnn.dotArray(meta.centroids))
      .withColumn("pnorm", sqrt(graft.functions.ArrayMath.dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"))))
      .withColumn("thr", IvfAnn.pruneThreshold(meta.centroids, stats, topK))
      .select(col("vec_id").as("query_id"), expr(IvfAnn.quant).as("pq"),
        explode(IvfAnn.exactClusterList(meta.centroids, stats)).as("cluster"))
    // bounded probe set ⇒ the needed-list union is driver metadata;
    // inlining it as literals guarantees static partition pruning
    val needed = probeClusters.select("cluster").distinct()
      .collect().map(_.getInt(0)).sorted
    val corpus = data
      .filter(col("cluster").isin(needed.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("vec_id").as("cand_id"), expr(IvfAnn.quant).as("qv"),
        col("cluster"))
    val cands = probeClusters.join(corpus,
        probeClusters("cluster") === corpus("cluster") &&
          col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        IvfAnn.qdot("pq", "qv").as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk")
  }
}
