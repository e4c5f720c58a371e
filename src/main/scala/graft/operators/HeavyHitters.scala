package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** EXACT top-k over a skewed key column with a capacity-BOUNDED
  * shuffle — the heavy-hitters pattern: a plain
  * `groupBy(key).count.orderBy` shuffles one row per DISTINCT key
  * (the whole vocabulary at corpus scale) to rank a handful of heads.
  * Here the shuffle never exceeds `capacity` rows per input partition,
  * whatever the cardinality, and the answer is still exact:
  *
  *  1. Candidate pass: each partition summarizes its rows with a
  *     Misra–Gries sketch of size `capacity` (mapPartitions — the
  *     sanctioned per-partition imperative case: a decrement-all
  *     counter map has no Column encoding). MG guarantees any key
  *     with local count > n_p/capacity survives partition p; summing
  *     the guarantee over partitions, any key with GLOBAL count
  *     > n/capacity survives in at least one summary (averaging: its
  *     local counts cannot all be below their partition thresholds).
  *  2. Exact pass: the ≤ capacity·P candidate keys broadcast back as
  *     a semi-filter and are counted EXACTLY in one map-side-combined
  *     aggregate whose shuffle carries candidates only.
  *  3. Soundness gate: the result is provably the true top-k iff the
  *     k-th candidate's exact count EXCEEDS n/capacity (every
  *     non-candidate is ≤ n/capacity < the k-th). If the corpus is so
  *     flat the gate fails, the operator REFUSES loudly with the
  *     capacity that would have sufficed — approximate-and-silent is
  *     the one behavior this must never have.
  *
  * 100 TB shape: pass 1 is embarrassingly parallel and emits
  * O(capacity) rows per partition; pass 2's shuffle is the candidate
  * set, not the vocabulary. capacity is a memory dial (a few thousand
  * fits any executor); the gate converts the sketch into a proof.
  */
object HeavyHitters {

  /** Exact (key, n) top-k rows ordered (n DESC, key ASC).
    * @param keyCol a STRING column of `df`
    * @param capacity MG sketch size per partition (and the soundness
    *                 threshold n/capacity the gate checks against) */
  def topK(spark: SparkSession, df: DataFrame, keyCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    require(k > 0 && capacity > k,
      s"need capacity > k > 0, got k=$k capacity=$capacity")
    import spark.implicits._
    // ONE upstream evaluation: the candidate pass, the exact-count
    // pass, and the n count below all read this cache — without it the
    // (possibly expensive: explode/tokenize) input recomputes three
    // times, the exact cost profile this operator exists to avoid
    val keys = df.select(col(keyCol).cast("string")).na.drop()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // pass 1: per-partition Misra–Gries summaries
    val candidates = keys.mapPartitions { it =>
      mgSummary(it.map(_.getString(0)), capacity).keysIterator
    }(org.apache.spark.sql.Encoders.STRING).distinct()

    // pass 2: exact counts of the candidate set only — the broadcast
    // semi-join keeps the aggregate's shuffle at |candidates|. The
    // candidate-mass total rides the same counts frame (persisted: two
    // tiny driver actions over |candidates| rows).
    val counts = keys.toDF(keyCol)
      .join(broadcast(candidates.toDF(keyCol)), Seq(keyCol), "left_semi")
      .groupBy(keyCol).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact =
      try {
        val top = counts.orderBy(col("n").desc, col(keyCol).asc)
          .limit(k).collect()
        // sum of an empty frame is NULL, not 0 — an empty corpus must
        // fall into the candTotal == n == 0 full-coverage arm
        val candTotal = {
          val r = counts.agg(sum("n")).head
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
        val n = keys.count()

        // Soundness gate — the result is the TRUE top-k iff either
        //  (a) the candidates cover the whole corpus (candTotal == n:
        //      nothing exists outside them, so fewer than k rows just
        //      means fewer than k distinct keys), or
        //  (b) the k-th candidate's exact count EXCEEDS n/capacity
        //      (every non-candidate is ≤ n/capacity < it) — checked by
        //      exact cross-multiplication, since floor division
        //      under-checks the real bound by up to one count.
        // Fewer than k candidates WITHOUT full coverage refuses too:
        // keys the sketches dropped could outrank a missing slot.
        if (candTotal != n) {
          val kth = if (top.length >= k) top(k - 1).getLong(1) else 0L
          // BigInt: kth·capacity can wrap a signed Long on extreme
          // corpora (kth near 2^63/capacity), flipping the gate either
          // way — the comparison must be exact, it IS the proof
          if (top.length < k || BigInt(kth) * capacity <= BigInt(n))
            throw new IllegalStateException(
              s"HeavyHitters.topK: candidates cover $candTotal of $n rows " +
                s"and the k-th candidate count $kth does not exceed the " +
                s"soundness bound n/capacity = $n/$capacity — the " +
                s"distribution is too flat for capacity=$capacity; retry " +
                s"with capacity > ${if (kth > 0) n / kth else n} or use " +
                "the full groupBy")
        }
        top
      } finally { counts.unpersist(false); () }
    spark.createDataFrame(
      spark.sparkContext.parallelize(exact.toSeq, 1),
      new org.apache.spark.sql.types.StructType()
        .add(keyCol, org.apache.spark.sql.types.StringType)
        .add("n", org.apache.spark.sql.types.LongType))
    } finally { keys.unpersist(false); () }
  }

  /** One Misra–Gries sweep over an item stream — THE sketch kernel,
    * shared by [[topK]]'s per-partition pass and the streaming twin's
    * per-batch summaries (graft.streaming.StreamingHeavyHitters).
    * Guarantee: any key with count > n/capacity in `it` survives with
    * estimate ≥ count − n/capacity. Amortized O(1) per item: each
    * decrement sweep removes ≥ 1 entry and every item funds at most
    * one increment, so sweeps are bounded by insertions; the sweep
    * iterates a key SNAPSHOT (mutating a mutable.HashMap mid-iteration
    * is outside its contract). */
  private[graft] def mgSummary(it: Iterator[String],
      capacity: Int): mutable.HashMap[String, Long] = {
    val counts = mutable.HashMap.empty[String, Long]
    it.foreach { key =>
      counts.get(key) match {
        case Some(c) => counts(key) = c + 1
        case None =>
          if (counts.size < capacity) counts(key) = 1L
          else counts.keys.toArray.foreach { t =>
            val c = counts(t) - 1
            if (c == 0L) counts.remove(t) else counts(t) = c
          }
      }
    }
    counts
  }

  /** Merge weighted MG summaries back to `capacity` entries — the
    * MERGEABLE-summaries operation (Agarwal et al.): sum counts per
    * key, then subtract the (capacity+1)-th largest total from every
    * entry and drop the non-positive. Error adds across merges and
    * stays ≤ N/(capacity+1) over the total weight N, which is what
    * the streaming soundness gate checks against. */
  private[graft] def mgMerge(parts: Iterator[(String, Long)],
      capacity: Int): mutable.HashMap[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    parts.foreach { case (k, c) => m(k) = m.getOrElse(k, 0L) + c }
    if (m.size > capacity) {
      val kth = m.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      m.keys.toArray.foreach { t =>
        val c = m(t) - kth
        if (c <= 0L) m.remove(t) else m(t) = c
      }
    }
    m
  }
}
