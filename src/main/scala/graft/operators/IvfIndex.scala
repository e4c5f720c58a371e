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
    val root = mapper.createObjectNode()
    root.put("k", k)
    root.put("dim", cents.head.length)
    root.put("maxNorm", stats.maxNorm)
    val cn = root.putArray("centroids")
    cents.foreach { c => val a = cn.addArray(); c.foreach(a.add) }
    val rn = root.putArray("radius"); stats.radius.foreach(rn.add)
    val mn = root.putArray("counts"); stats.count.foreach(mn.add)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$indexDir/meta.json"), mapper.writeValueAsString(root))
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
