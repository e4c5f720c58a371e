package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TRAINER over a document corpus — the iterative
  * merge learning d15 exposes one step of (Sennrich et al., ACL 2016:
  * public algorithm, re-derived here Spark-first).
  *
  * Shape: the corpus collapses ONCE into the frequency-weighted
  * vocabulary (map-side-combined groupBy over exploded tokens); every
  * merge iteration then runs over the VOCABULARY — (term, weight,
  * symbol array) rows — which is what makes N merges tractable at
  * corpus scale: 100 TB of text is a few hundred million distinct
  * terms, and each iteration is one flatMap + one aggregate + a 1-row
  * collect (the argmax pair), never a corpus re-scan. The symbol
  * rewrite per iteration is genuine per-row imperative logic (merge
  * adjacent occurrences left-to-right), so it runs as a typed Dataset
  * map rather than a tower of higher-order SQL lambdas.
  *
  * Determinism: the argmax pair breaks ties on (count DESC, left ASC,
  * right ASC) — same corpus, same merges, every run, any partitioning.
  */
object BpeTrainer {

  final case class VocabEntry(term: String, n: Long, syms: Seq[String])
  final case class Merge(left: String, right: String, count: Long)

  /** Frequency-weighted vocabulary with initial character symbols. */
  def vocabulary(docs: DataFrame): DataFrame = {
    val toks = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"
    docs.select(explode(expr(toks)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .withColumn("syms", expr("transform(split(term, ''), c -> c)"))
      .filter(expr("size(syms) >= 1"))
  }

  /** Learn `nMerges` merges. Stops early when no pair reaches
    * `minPairCount`. Returns merges in learned order. */
  def train(spark: SparkSession, docs: DataFrame, nMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    import spark.implicits._
    var vocab = vocabulary(docs).as[VocabEntry]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count() // materialize before the loop mutates the lineage
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    try {
      var i = 0
      var exhausted = false
      while (i < nMerges && !exhausted) {
        // pair counts over the vocabulary, weighted by term frequency
        val top = vocab.flatMap { v =>
          if (v.syms.length < 2) Iterator.empty
          else v.syms.iterator.zip(v.syms.iterator.drop(1))
            .map { case (a, b) => ((a, b), v.n) }
        }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .map { case ((a, b), c) => Merge(a, b, c) }
          .orderBy(col("count").desc, col("left"), col("right"))
          .limit(1).collect().headOption
        top match {
          case Some(m) if m.count >= minPairCount =>
            merges += m
            val next = vocab.map(v => v.copy(syms = mergeOnce(v.syms, m.left, m.right)))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            next.count()
            vocab.unpersist(false)
            vocab = next
            i += 1
          case _ => exhausted = true
        }
      }
    } finally vocab.unpersist(false)
    merges.toSeq
  }

  /** One left-to-right pass replacing adjacent (left, right) with the
    * concatenation — the canonical BPE rewrite (overlaps consume
    * greedily: a a a with merge (a,a) → aa a). */
  private[operators] def mergeOnce(syms: Seq[String], left: String,
      right: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Encode one term with a learned merge list (applied in learned
    * order, each to fixpoint — standard BPE inference). Driver-side
    * kernel; distributed encoding wraps it in [[encodeCounts]]. */
  def encode(term: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = term.split("").toSeq.filter(_.nonEmpty)
    merges.foreach { m =>
      var changed = true
      while (changed) {
        val next = mergeOnce(syms, m.left, m.right)
        changed = next != syms // value equality: mergeOnce always allocates
        syms = next
      }
    }
    syms
  }

  /** Distributed corpus encoding: per-document BPE token count under
    * the learned merges — the "how many tokens is my corpus under this
    * tokenizer" question every training-data budget starts from. */
  def encodeCounts(spark: SparkSession, docs: DataFrame,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val toks = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"
    docs.select(col("doc_id"), expr(toks).as("tk"))
      .as[(Long, Seq[String])]
      .map { case (id, tk) =>
        (id, tk.iterator.map(t => encode(t, bc.value).length.toLong).sum)
      }
      .toDF("doc_id", "n_bpe_tokens")
  }
}
