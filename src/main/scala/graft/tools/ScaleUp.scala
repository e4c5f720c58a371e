package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep corpus generator: replicates the driver's sf0.1
  * documents/embeddings tables N× to measure the heavy families'
  * scaling SLOPE one order of magnitude above the bench gate
  * (VERDICT r16 item 4). This is a perf instrument, not test data —
  * correctness oracles always run against the driver's own parquet.
  *
  * Replicas must be DECORRELATED or the sweep measures the wrong
  * thing: byte-identical copies would grow every dup family and LSH
  * bucket 10×, turning linear candidate generation superlinear, which
  * a real 10× crawl does not do. So:
  *
  *  - documents: replica i translates the alphabet by a per-replica
  *    rotation (a→b→c… by 2i+1). Token lengths, whitespace, and
  *    punctuation are preserved (BPE/window shapes intact; n_chars
  *    stays valid) while every shingle and token type becomes
  *    replica-unique — planted dup/near-dup families repeat PER
  *    replica (family count ×N, family size constant), exactly the
  *    linear shape of a larger crawl.
  *  - embeddings: replica i rotates the vector by i positions —
  *    norm-preserving (IVF pruning bounds keep their geometry) and
  *    decorrelated from the original, so top-k lists don't fill with
  *    manufactured exact duplicates.
  *
  * Keys shift by i·10^7 (far above the sf0.1 ranges), so ids stay
  * unique and BIGINT-safe.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> [factor=10]
  */
object ScaleUp {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  private def rotated(s: String, by: Int): String = {
    val n = s.length
    val k = ((by % n) + n) % n
    s.substring(k) + s.substring(0, k)
  }

  private[tools] def replicateDocs(docs: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      val shifted = docs.withColumn("doc_id", col("doc_id") + i * 10000000L)
      if (i == 0) shifted
      else {
        val rot = 2 * i + 1
        shifted.withColumn("text",
          translate(col("text"), Lower + Upper,
            rotated(Lower, rot) + rotated(Upper, rot)))
      }
    }.reduce(_.union(_))

  private[tools] def replicateEmbeddings(emb: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      val shifted = emb.withColumn("vec_id", col("vec_id") + i * 10000000L)
      if (i == 0) shifted
      else shifted.withColumn("embedding",
        expr(s"concat(slice(embedding, ${i + 1}, 1000000), " +
          s"slice(embedding, 1, $i))"))
    }.reduce(_.union(_))

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // rotation 2i+1 mod 26 repeats at i+13: replicas 13 apart would
    // share an alphabet and reintroduce exact cross-replica dups,
    // silently breaking the decorrelation this tool promises — refuse
    require(factor >= 1 && factor <= 13,
      s"factor must be in [1,13] (alphabet rotations alias beyond), got $factor")
    val spark = graft.GraftSession.build("graft-scaleup")
    replicateDocs(spark.read.parquet(s"$srcDir/documents.parquet"), factor)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    replicateEmbeddings(
        spark.read.parquet(s"$srcDir/embeddings.parquet"), factor)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[scaleup] wrote ${factor}x $srcDir -> $outDir")
    spark.stop()
  }
}
