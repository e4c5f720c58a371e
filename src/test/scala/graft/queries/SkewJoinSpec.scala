package graft.queries

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-key evidence for the gram/term-keyed pipelines (d19, d20): at
  * corpus scale, stop-word 3-grams and function words are hot keys —
  * the naive shapes pile every probe-side row for one key onto a
  * single shuffle partition, and AQE's skew-join rule cannot rescue
  * either one (it requires bare shuffle stages directly under the
  * join; both pipelines have an aggregate in between). So the
  * production answers are structural, and this spec pins them on a
  * deliberately hot corpus:
  *
  *   - d19 (ngramNovelty) is JOIN-FREE on the gram key — hot grams
  *     collapse in a map-side-combined aggregate, and the only join is
  *     doc_id-keyed (uniform). Pinned: no physical join carries a
  *     non-doc_id key.
  *   - d20 (rareTokenFilter) salts its term-frequency join
  *     (SaltedJoin): each hot term spreads over `salts` reducers.
  *     Pinned: the physical join's keys include the salt.
  *
  * Both outputs are pinned bit-identical to naive single-partition
  * re-implementations of the same semantics on the hot corpus. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  /** 2000 docs, 6 tokens each: tokens globally unique EXCEPT a shared
    * leading phrase — the gram "hot0 hot1 hot2" (and each hot token)
    * occurs in every doc while everything else is a singleton. */
  private def skewedCorpus = {
    import spark.implicits._
    (0 until 2000).map { i =>
      val uniq = (0 until 3).map(j => s"u${i}_$j")
      (i.toLong, (Seq("hot0", "hot1", "hot2") ++ uniq).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private val toks = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"

  private def equiJoins(df: DataFrame) = {
    val plan = df.queryExecution.executedPlan
    plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.flatMap(_.references.toSeq.map(_.name))
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.flatMap(_.references.toSeq.map(_.name))
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.flatMap(_.references.toSeq.map(_.name))
    }
  }

  /** AQE off for a statically walkable plan, broadcast off so a
    * fixture-size dimension can't hide the shuffle the claim is about. */
  private def pinned[T](body: => T): T = {
    val olds = Seq("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      .map { case (k, v) => val o = spark.conf.get(k); spark.conf.set(k, v); k -> o }
    try body
    finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("d19 is join-free on the gram key; hot-gram output is exact") {
    val docs = skewedCorpus
    // naive reference: the join-back shape (the one that would blow up)
    val grams = docs
      .select(col("doc_id"), expr(toks).as("tk"))
      .filter(expr("size(tk) >= 3"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(tk) - 3), i -> concat(tk[i], ' ', tk[i + 1], ' ', tk[i + 2])))")).as("g"))
    val byGram = grams.groupBy("g").agg(count(lit(1)).as("nd"))
    val naive = grams.join(byGram, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_grams"), col("n_unique"),
        expr("n_unique * 1000 div n_grams").as("novelty_permille"))
      .orderBy("doc_id").collect()

    pinned {
      val df = Documents.ngramNovelty(docs)
      assert(df.collect().toSeq === naive.toSeq)
      // every doc has the hot gram + 3 uniques → non-trivial permille
      assert(naive.head.getLong(1) === 4L && naive.head.getLong(2) === 3L)
      val joins = equiJoins(df)
      assert(joins.nonEmpty, "expected the doc_id-keyed result join")
      joins.foreach(keys => assert(keys.toSet === Set("doc_id"),
        s"gram-keyed physical join crept back in: keys = $keys"))
    }
  }

  test("d20's term-frequency join is salted; hot-term output is exact") {
    val docs = skewedCorpus
    // naive reference: unsalted join, same semantics
    val tok = docs.select(col("doc_id"), explode(expr(toks)).as("term"))
    val tf = tok.groupBy("term").agg(count(lit(1)).as("n"))
    val mx = tf.agg(max("n").as("mx"))
    val naive = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .join(tf, "term")
      .crossJoin(broadcast(mx))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        sum(when(col("n") * 30 < col("mx"), col("c")).otherwise(0L))
          .as("n_rare"))
      .select(col("doc_id"), col("n_tokens"), col("n_rare"),
        expr("n_rare * 1000 div n_tokens").as("rare_permille"))
      .orderBy("doc_id").collect()

    pinned {
      val df = Documents.rareTokenFilter(docs, salts = 8)
      assert(df.collect().toSeq === naive.toSeq)
      // hot tokens occur 2000x (not rare), uniques once (rare): 3 of 6
      assert(naive.head.getLong(1) === 6L && naive.head.getLong(2) === 3L)
      val termJoins = equiJoins(df).filter(_.contains("term"))
      assert(termJoins.nonEmpty, "expected the term-keyed tf join")
      termJoins.foreach(keys => assert(keys.contains("__salt"),
        s"tf join is not salted: keys = $keys"))
    }
  }
}
