package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbor via random-hyperplane LSH (sign-random-
  * projection, the classic cosine-LSH family).
  *
  * Scale design: candidate pairs form ONLY inside hash buckets —
  * a probe meets `corpus / 2^bits × tables` candidates, never the whole
  * corpus. At 100 TB the bucketed join shuffles on (table, bucket) keys;
  * the brute-force path (e01_knn_dot) exists as the correctness baseline,
  * this is the path you actually run.
  *
  * Hyperplanes are seeded (deterministic across runs/executors) and enter
  * the plan as array literals — evaluated inside whole-stage codegen, no
  * UDF. Signatures/buckets are per-row expressions; ranking within the
  * candidate set uses the same exact quantized-integer dot product as the
  * brute-force baseline, so (probe, cand) scores are comparable 1:1.
  */
object AnnLsh {

  /** Quantized embedding (floor(x·2^20)): exact, engine-portable. */
  private val quant =
    "transform(embedding, x -> cast(floor(cast(x as double) * 1048576D) as bigint))"

  private def qdot(a: String, b: String): Column =
    graft.functions.ArrayMath.dot(col(a), col(b))

  /** Deterministic Gaussian hyperplanes: `tables` hash tables × `bits`
    * planes × `dim` components, from a fixed seed. */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long = 42L)
      : IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(tables)(IndexedSeq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** dot(embedding, hyperplane-literal) ≥ 0 — one signature bit. */
  private def signBit(h: Array[Double]): Column = {
    val lits = array(h.map(lit(_)): _*)
    when(graft.functions.ArrayMath.dot(
      col("embedding").cast("array<double>"), lits) >= 0, 1L).otherwise(0L)
  }

  /** Attach `tables` bucket ids to each row of an embeddings frame. */
  def withBuckets(emb: DataFrame, tables: Int = 10, bits: Int = 5,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val hp = hyperplanes(tables, bits, dim, seed)
    val buckets = hp.map { planes =>
      planes.zipWithIndex.map { case (h, j) =>
        signBit(h) * lit(1L << j)
      }.reduce(_ + _)
    }
    emb.withColumn("buckets", array(buckets: _*))
  }

  /** Top-k approximate neighbors for `probes` (vec_id predicate) out of
    * the full embeddings table: candidates = same (table, bucket) in any
    * of the hash tables; ranked by exact quantized dot. */
  def knn(spark: SparkSession, dir: String, probePred: Column, k: Int = 10,
      tables: Int = 10, bits: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // Candidate generation joins (id, table, bucket) ONLY — tiny rows, so
    // a hot bucket is a cheap AQE-splittable skew; the 64-element vectors
    // join back exactly once per DISTINCT (probe, candidate) pair and the
    // exact dot product runs once per pair, not once per shared table.
    val bucketed = withBuckets(emb, tables, bits)
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val qvs = emb.select(col("vec_id"), expr(quant).as("qv"))
    val pairs = bucketed.filter(probePred)
      .select(col("vec_id").as("query_id"), col("tbl").as("ptbl"),
        col("bucket").as("pbucket"))
      .join(bucketed,
        col("ptbl") === col("tbl") && col("pbucket") === col("bucket") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"))
      .distinct()
    val cands = pairs
      .join(qvs.select(col("vec_id").as("query_id"), col("qv").as("pq")), "query_id")
      .join(qvs.select(col("vec_id").as("cand_id"), col("qv")), "cand_id")
      .select(col("query_id"), col("cand_id"), qdot("pq", "qv").as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("cand_id"))
    cands.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }
}
