package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
      stats.radius, stats.count))
  }

  def readMeta(indexDir: String): Meta = {
    val node = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$indexDir/meta.json")))
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
    * a vector sits in, only on that cluster's radius covering it. */
  def append(spark: SparkSession, batchDir: String, indexDir: String): Unit = {
    val meta = readMeta(indexDir)
    val batch = spark.read.parquet(s"$batchDir/embeddings.parquet")
    val assigned = IvfAnn.assign(batch, meta.centroids)
      .select(col("vec_id"), col("embedding"), col("label").cast("int").as("cluster"))
    assigned.write.mode("append").partitionBy("cluster")
      .parquet(s"$indexDir/data")
    // exact metadata update from the batch side only (O(batch) scan)
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
    writeMeta(indexDir, meta.copy(radius = radius, counts = counts,
      maxNorm = maxNorm))
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
    val meta = readMeta(indexDir)
    val staged = s"$indexDir/data_compacting"
    spark.read.parquet(s"$indexDir/data")
      .repartition(meta.k, col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(staged)
    val dataPath = java.nio.file.Paths.get(s"$indexDir/data")
    val old = java.nio.file.Paths.get(s"$indexDir/data_old")
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    java.nio.file.Files.move(dataPath, old)
    java.nio.file.Files.move(java.nio.file.Paths.get(staged), dataPath)
    rmTree(old)
  }

  /** The assigned cluster's centroid as a per-row array column:
    * element_at over a literal array-of-arrays indexed by `label`. */
  private def centLit(cents: Seq[Array[Double]]): Column =
    element_at(array(cents.map(c => array(c.map(lit(_)): _*)): _*),
      col("label").cast("int") + 1)

  private def writeMeta(indexDir: String, meta: Meta): Unit = {
    val root = mapper.createObjectNode()
    root.put("k", meta.k)
    root.put("dim", meta.dim)
    root.put("maxNorm", meta.maxNorm)
    val cn = root.putArray("centroids")
    meta.centroids.foreach { c => val a = cn.addArray(); c.foreach(a.add) }
    val rn = root.putArray("radius"); meta.radius.foreach(rn.add)
    val mn = root.putArray("counts"); meta.counts.foreach(mn.add)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$indexDir/meta.json"), mapper.writeValueAsString(root))
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
    val meta = readMeta(indexDir)
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
    val meta = readMeta(indexDir)
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
