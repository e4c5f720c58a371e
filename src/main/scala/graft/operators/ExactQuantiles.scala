package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT discrete quantiles of one integer column over the GLOBAL
  * order — the shape d10's per-stratum percentiles can't reach: with
  * no stratum to partition by, the textbook row_number() approach is
  * a corpus-wide single-partition window (one task sorts everything),
  * and `percentile_approx` trades the exactness an oracle — or an
  * SLA — needs.
  *
  * Scale shape instead: reduce to the VALUE HISTOGRAM first (shuffle
  * volume = distinct values, map-side combined), then compute
  * exclusive prefix sums over the histogram with c22/d27's
  * range-sharding trick — shard = (v − min) div width is a PREFIX of
  * the value order, so ~256 independent windows run in parallel and
  * the only single-partition window is over the 256-row shard-count
  * frame. Each requested quantile q (permille) selects the value
  * whose cumulative range [before, before+count) contains
  * rank (q·(n−1)) div 1000 — 0-based lower discrete quantile, exact
  * integer arithmetic end-to-end (both engines' integer division
  * truncates identically, so the relation is DuckDB-oracle-able).
  *
  * q = 0 is the minimum and q = 1000 the maximum, so one call yields
  * a full five-number summary. An empty input yields an empty result
  * (no rows, not NULLs — the oracle's join-against-nothing
  * convention). Values may be negative (the shard key is min-shifted
  * before the division, keeping the prefix property) as long as the
  * domain WIDTH max−min fits in a signed Long — a domain spanning
  * more than half the 64-bit range wraps the width computation, so
  * that case raises at runtime instead of returning garbled
  * quantiles (shift or scale such a column first). */
object ExactQuantiles {

  /** @param df        input rows
    * @param valueCol  LONG column to take quantiles of
    * @param qPermille quantiles in permille (0 = min … 1000 = max)
    * @param shards    prefix-sum shard count (parallelism dial)
    * @param cleanup   receives the histogram cache's release thunk —
    *                  the histogram feeds four downstream branches, and
    *                  measured exchange reuse does NOT cover them (the
    *                  q45 fact join ran 4× unpersisted), so it must be
    *                  persisted; queries pass QueryDef.deferCleanup,
    *                  report writers release after materializing
    *                  (the crossNearDupPairs convention)
    * @return (q_permille, rank_idx, <valueCol>, n) ordered by q */
  def of(df: DataFrame, valueCol: String, qPermille: Seq[Int],
      shards: Int = 256)(cleanup: (() => Unit) => Unit): DataFrame = {
    require(qPermille.nonEmpty, "qPermille must name at least one quantile")
    require(qPermille.forall(q => q >= 0 && q <= 1000),
      s"quantiles are permille in [0, 1000]: $qPermille")
    require(qPermille.distinct.size == qPermille.size,
      s"duplicate quantiles would duplicate output rows: $qPermille")
    require(shards > 0, s"shards must be positive: $shards")
    import df.sparkSession.implicits._
    // NULLs are EXCLUDED, not ranked: a NULL histogram row would count
    // into n and shift every shard offset (NULLS FIRST) yet never
    // survive the equi-join on its own NULL shard key — silently
    // dropping quantile rows. n is therefore the non-null count.
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cleanup(() => { hist.unpersist(blocking = true); () })
    val stats = hist.agg(min("v").as("lo"), max("v").as("hi"),
      sum("c").as("n"))
    // hi − lo wraps negative exactly when the true width exceeds
    // Long.MaxValue (max ≥ min always) — refuse loudly, ZValue's
    // posture, instead of sharding on a garbled width
    val widthExpr = s"CASE WHEN hi - lo < 0 THEN CAST(raise_error(" +
      "'ExactQuantiles: value domain width max-min overflows a signed " +
      "Long; shift or scale the column first') AS BIGINT) " +
      s"ELSE (hi - lo) div $shards + 1 END"
    val sharded = hist.crossJoin(broadcast(stats))
      .withColumn("shard", expr(s"(v - lo) div ($widthExpr)"))
      .drop("lo", "hi", "n") // qs carries n; a second copy is ambiguous
    val wS = Window.partitionBy("shard").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = sharded.withColumn("cum", sum("c").over(wS))
    // single-partition window DELIBERATE: the shard-count frame
    val wO = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = sharded.groupBy("shard").agg(sum("c").as("sn"))
      .withColumn("off", sum("sn").over(wO) - col("sn"))
      .select("shard", "off")
    val qs = qPermille.map(_.toLong).toDF("q_permille")
      .crossJoin(broadcast(stats.select("n")))
      .withColumn("rank_idx", expr("(q_permille * (n - 1)) div 1000"))
    inShard.join(broadcast(offs), "shard")
      .withColumn("before", col("off") + col("cum") - col("c"))
      .join(broadcast(qs),
        col("rank_idx") >= col("before") &&
          col("rank_idx") < col("before") + col("c"))
      .select(col("q_permille"), col("rank_idx"),
        col("v").as(valueCol), col("n"))
      .orderBy("q_permille")
  }
}
