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
  *    AFFINE permutation p → a·p + b mod 26 (a coprime with 26) —
  *    312 distinct permutations, any two of which agree on at most 2
  *    of 26 letters, so no pair of replicas can share a token type or
  *    shingle built from real words (the former single-rotation
  *    scheme aliased at factor 13). Token lengths, whitespace, and
  *    punctuation are preserved (BPE/window shapes intact; n_chars
  *    stays valid) while every shingle and token type becomes
  *    replica-unique — planted dup/near-dup families repeat PER
  *    replica (family count ×N, family size constant), exactly the
  *    linear shape of a larger crawl.
  *  - embeddings: replica i rotates the vector by i mod dim positions
  *    and NEGATES every element on the second lap (i ≥ dim) — both
  *    norm-preserving (IVF pruning bounds keep their geometry) and
  *    mutually decorrelated for 2·dim replicas (128 at the testdata's
  *    64 dims), so top-k lists don't fill with manufactured exact
  *    duplicates.
  *
  * Keys shift by i·10^7 (far above the sf0.1 ranges), so ids stay
  * unique and BIGINT-safe.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> [factor=10]
  */
object ScaleUp {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  /** Multipliers coprime with 26 — the `a` of the affine permutation. */
  private val CoprimeA = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Replica count ceiling for documents: the distinct affine
    * permutations of a 26-letter alphabet. */
  private[tools] val MaxDocReplicas: Int = CoprimeA.size * 26 // 312

  /** (a, b) of replica i's alphabet permutation; i = 0 is the identity
    * (1, 0), the rest enumerate deterministically. Distinct replicas
    * get distinct permutations, and two distinct affine maps over Z26
    * agree on at most gcd(a1−a2, 26) ≤ 2 letters — a cross-replica
    * repeated token would have to spell itself entirely from that
    * ≤2-letter agreement set. */
  private[tools] def affinePair(i: Int): (Int, Int) = {
    require(i >= 0 && i < MaxDocReplicas, s"replica $i out of range")
    val rest = for {
      a <- CoprimeA; b <- 0 until 26 if (a, b) != ((1, 0))
    } yield (a, b)
    ((1, 0) +: rest)(i)
  }

  private def permuted(alpha: String, a: Int, b: Int): String =
    (0 until 26).map(p => alpha((a * p + b) % 26)).mkString

  private[tools] def replicateDocs(docs: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      val shifted = docs.withColumn("doc_id", col("doc_id") + i * 10000000L)
      if (i == 0) shifted
      else {
        val (a, b) = affinePair(i)
        shifted.withColumn("text",
          translate(col("text"), Lower + Upper,
            permuted(Lower, a, b) + permuted(Upper, a, b)))
      }
    }.reduce(_.union(_))

  private[tools] def replicateEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val first = emb.select(size(col("embedding"))).head(1)
    require(first.nonEmpty, "cannot size replicas of an empty embeddings table")
    val d = first(0).getInt(0)
    require(factor >= 1 && factor <= 2 * d,
      s"factor must be in [1, ${2 * d}] (rotation+negation pairs alias " +
        s"beyond 2x the $d-dim vector), got $factor")
    (0 until factor).map { i =>
      val shifted = emb.withColumn("vec_id", col("vec_id") + i * 10000000L)
      val r = i % d
      val rotated =
        if (r == 0) shifted
        else shifted.withColumn("embedding",
          expr(s"concat(slice(embedding, ${r + 1}, 1000000), " +
            s"slice(embedding, 1, $r))"))
      if (i / d == 0) rotated
      else rotated.withColumn("embedding",
        expr("transform(embedding, x -> -x)"))
    }.reduce(_.union(_))
  }

  /** Events replicate as DENSITY growth: ids shift by i·10⁷ (new
    * events, new users), timestamps stay — a 10× corpus is 10× the
    * traffic in the SAME window, which is what scale-up means for an
    * event stream (stretching time instead would leave every window
    * query's per-window row count flat and measure nothing). Type mix
    * and value distributions are already i.i.d. per event, so shifted
    * ids are decorrelation enough: no dedup/fingerprint family exists
    * on events for replicas to alias. NOTE the quadratic families are
    * then REAL, not artifacts: band joins (q47) match pairs at rate
    * density², so their pair volume grows 100× for 10× data by the
    * semantics of the query, not a plan defect. */
  private[tools] def replicateEvents(ev: DataFrame, factor: Int): DataFrame = {
    // the i·10⁷ shift assumes source ids fit under it — larger ids would
    // silently alias replicas (and break StreamScaleProbe's 10¹⁰ probe
    // stride, which rides the resulting <10⁹ ceiling); refuse loudly
    // like the factor/permutation requires (one cheap agg)
    val mx = ev.agg(greatest(max(col("event_id")), max(col("user_id")))).head
    require(mx.isNullAt(0) || mx.getLong(0) < 10000000L,
      s"replicateEvents: max(event_id, user_id) = ${mx.get(0)} >= 1e7 — " +
        "the replica id shift would alias; regenerate with smaller ids")
    (0 until factor).map { i =>
      ev.withColumn("event_id", col("event_id") + i * 10000000L)
        .withColumn("user_id", col("user_id") + i * 10000000L)
    }.reduce(_.union(_))
  }

  /** Re-shape an embedding corpus into C TIGHT CLUSTERS: vector v of
    * cluster c = vec_id mod C becomes e_c + eps·v (a unit coordinate
    * anchor plus the original vector as within-cluster noise). The
    * testdata's embeddings are near-random — the adversarial case for
    * IVF pruning, where exact search degrades toward all-pairs by
    * documented design — so scale sweeps on replicas of it measure
    * that worst case only. Real-world embedding corpora cluster; this
    * transform gives the prune geometry to exploit, letting
    * StreamScaleProbe separate "candidate volume is genuinely large"
    * (random corpus) from "the operator fails to prune" (would show
    * as growth even here). Applied AFTER replication, so the
    * rotation/negation replicas become decorrelated within-cluster
    * noise rather than new clusters. */
  private[tools] def clusterize(emb: DataFrame, clusters: Int,
      eps: Double): DataFrame = {
    val d = emb.select(size(col("embedding"))).head.getInt(0)
    require(clusters >= 1 && clusters <= d,
      s"clusters must be in [1, $d] (one coordinate anchor each), got $clusters")
    emb.withColumn("embedding",
      expr(s"transform(sequence(0, ${d - 1}), j -> CAST(" +
        s"(CASE WHEN j = pmod(vec_id, $clusters) THEN 1.0 ELSE 0.0 END) " +
        s"+ $eps * embedding[j] AS FLOAT))"))
  }

  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    val Array(srcDir, outDir) = pos.take(2)
    val factor = pos.lift(2).map(_.toInt).getOrElse(10)
    val clustered = flags.collectFirst {
      case f if f.startsWith("--clustered=") =>
        f.stripPrefix("--clustered=").toInt
      case "--clustered" => 32
    }
    // a typo'd flag must not silently produce the WRONG corpus for a
    // measurement tool (Migrate's unknown-flag posture)
    val unknown = flags.filterNot(f =>
      f == "--clustered" || f.startsWith("--clustered="))
    require(unknown.isEmpty, s"unknown flags: ${unknown.mkString(", ")}")
    require(factor >= 1 && factor <= MaxDocReplicas,
      s"factor must be in [1, $MaxDocReplicas], got $factor " +
        "(the affine alphabet permutations run out beyond)")
    val spark = graft.GraftSession.build("graft-scaleup")
    replicateDocs(spark.read.parquet(s"$srcDir/documents.parquet"), factor)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = replicateEmbeddings(
      spark.read.parquet(s"$srcDir/embeddings.parquet"), factor)
    clustered.map(c => clusterize(emb, c, eps = 0.15)).getOrElse(emb)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    replicateEvents(spark.read.parquet(s"$srcDir/events.parquet"), factor)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println(s"[scaleup] wrote ${factor}x $srcDir -> $outDir" +
      clustered.map(c => s" (clustered C=$c)").getOrElse(""))
    spark.stop()
  }
}
