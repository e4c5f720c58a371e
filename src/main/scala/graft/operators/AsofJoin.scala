package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — each left row picks the LATEST right row with
  * `right.ts <= left.ts` for the same key (inclusive at equality, the
  * time-series point-in-time lookup: trade→quote, purchase→last click,
  * metric→last deploy). Spark has no built-in asof join; the naive
  * encodings both fail at scale — a theta join
  * (`l.key = r.key AND r.ts <= l.ts` + argmax) materializes the per-key
  * cross product before pruning, and a correlated subquery re-scans the
  * right side per left row.
  *
  * Shape here: UNION the two sides tagged (left=1, right=0), ONE
  * shuffle on the key, and a per-key running `last(..., ignoreNulls)`
  * window ordered by (ts, side, tieBreak) — right rows at a timestamp
  * sort before left rows at the same timestamp, which is exactly the
  * inclusive `>=` bound. Cost = one exchange + one per-partition sort
  * over |L|+|R| rows, the minimum any key-partitioned asof can pay;
  * nothing quadratic, nothing re-scanned.
  *
  * SKEW: `Window.partitionBy(key)` makes one hot key (a null-ish
  * tenant id, one instrument carrying 30% of trades) ONE sorted run on
  * ONE task — the 100 TB killer. `shards > 1` range-shards every key's
  * TIMELINE: both sides bucket into `shards` contiguous time ranges
  * (one cheap min/max pre-pass sizes the range; any monotone bucketing
  * is correct, so float rounding at bucket edges cannot matter), each
  * (key, shard) gets a CARRY-IN row — the latest right row from all
  * earlier shards, computed from a per-(key, shard) max-struct
  * aggregate (map-side combinable) plus one window over that tiny
  * frame — and the running-last window partitions by (key, shard).
  * Exactness: shards partition each key's timeline into ordered
  * segments, in-segment candidates are handled by the same running
  * last, and the only cross-segment candidate that can win is the
  * latest earlier right row, which is exactly the carry-in (it sorts
  * first in its segment because every earlier-shard ts is strictly
  * below every in-shard ts). Cost adds one pass for min/max and one
  * aggregate over the right side; the hot key now sorts as `shards`
  * independent runs on `shards` tasks.
  *
  * Right values travel as ONE struct, so a NULL inside a right column
  * cannot splice values from two different right rows (row-level, not
  * value-level, recency — `last(ignoreNulls)` skips only the struct
  * slots left rows carry).
  *
  * Determinism: two right rows sharing (key, ts) are ordered by
  * `tieBreak` (ascending; the LAST one wins) — pass the right side's
  * unique id to make results reproducible, or accept an arbitrary
  * winner among exact ties without one. The sharded path resolves
  * residual ties by the rightVals struct itself (max-struct carry
  * aggregation), so pass a UNIQUE tieBreak if sharded-vs-unsharded
  * bit-equality matters under duplicate (key, ts) right rows.
  */
object AsofJoin {

  /** @param left      rows to enrich (all its columns pass through)
    * @param right     lookup rows
    * @param key       equi-join column, present on both sides
    * @param leftTs    left ordering column (numeric or timestamp)
    * @param rightTs   right ordering column, same type
    * @param rightVals right columns to attach (NULL when no right row
    *                  is at-or-before the left row — LEFT asof)
    * @param tieBreak  right columns ordering exact (key, ts) ties
    * @param shards    per-key timeline shards (1 = single window per
    *                  key; > 1 = skew-proof range-sharded plan, same
    *                  result) */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tieBreak: Seq[String] = Nil, shards: Int = 1): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val helpers = Seq("__asof_ts", "__asof_side", "__asof_r", "__asof_tb",
      "__asof_shard")
    // check EVERY name that flows into the union/window, not just the
    // left columns: a helper name arriving via rightVals/tieBreak/key/
    // rightTs would silently build a nested-struct mess instead of
    // refusing (right-side data columns are re-selected, so only the
    // names the caller routes through matter)
    val routed = left.columns ++ rightVals ++ tieBreak :+ key :+ rightTs
    require(!routed.exists(helpers.contains),
      s"reserved asof helper column names in inputs: ${helpers.mkString(", ")}")
    val collide = rightVals.filter(left.columns.contains)
    require(collide.isEmpty,
      s"rightVals collide with left columns (alias them first): " +
        collide.mkString(", "))

    val lS = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_side", lit(1))
    // SQL asof semantics for NULLs: `right.ts <= left.ts` is never
    // true for a NULL ts, and an equi-join never matches a NULL key —
    // drop such right rows up front, or a NULL ts would sort NULLS
    // FIRST and act as ts = −∞ (attaching to every left row), and
    // NULL keys would pair with each other under partitionBy. Left
    // rows with NULL key/ts need no handling: they sort before any
    // surviving right row (or into a right-empty partition) and keep
    // NULL right values, exactly the SQL outcome.
    val rClean = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
    val rS = rClean.select(
      col(key),
      col(rightTs).as("__asof_ts"),
      lit(0).as("__asof_side"),
      struct(rightVals.map(col): _*).as("__asof_r"),
      struct((tieBreak.map(col) :+ lit(0).as("__z")): _*).as("__asof_tb"))

    if (shards == 1) {
      val u = lS.unionByName(rS, allowMissingColumns = true)
      val w = Window.partitionBy(key)
        .orderBy(col("__asof_ts").asc, col("__asof_side").asc,
          col("__asof_tb").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val attached: Column = last(col("__asof_r"), ignoreNulls = true).over(w)
      u.withColumn("__asof_r", attached)
        .filter(col("__asof_side") === 1)
        .select(left.columns.map(col) ++
          rightVals.map(c => col(s"__asof_r.$c").as(c)): _*)
    } else {
      // --- skew-proof path: range-shard each key's timeline ---
      // (1) size the time domain: ONE map-side-combined min/max over
      // both sides' ts. The bucketing only needs to be MONOTONE
      // non-decreasing and identical for both sides — exact boundary
      // placement is free choice — so double arithmetic is safe even
      // where the ts values themselves exceed 2^53 (rounding is
      // monotone).
      val dom = lS.select(col("__asof_ts").cast("double").as("t"))
        .unionAll(rS.select(col("__asof_ts").cast("double").as("t")))
        .agg(min("t"), max("t")).head
      if (dom.isNullAt(0)) {
        // no non-NULL ts anywhere: every left row keeps NULL rightVals
        return left.select(left.columns.map(col) ++
          rightVals.map(c => lit(null).as(c)): _*)
      }
      val (lo, hi) = (dom.getDouble(0), dom.getDouble(1))
      val width = (hi - lo) / shards
      def shardOf(c: Column): Column =
        if (width <= 0) when(c.isNull, lit(null)).otherwise(lit(0L))
        else least(floor((c.cast("double") - lit(lo)) / lit(width)),
          lit(shards - 1L))

      val lSh = lS.withColumn("__asof_shard", shardOf(col("__asof_ts")))
      val rSh = rS.withColumn("__asof_shard", shardOf(col("__asof_ts")))

      // (2) per-(key, shard) latest right row as ONE max-struct
      // aggregate — struct comparison is field-by-field, so max over
      // (ts, tb, r) IS the window's last row whenever tieBreak is
      // decisive (see Determinism note)
      val rMax = rSh.groupBy(col(key), col("__asof_shard"))
        .agg(max(struct(col("__asof_ts"), col("__asof_tb"),
          col("__asof_r"))).as("__m"))
      // (3) carry-in per (key, shard) over the UNIVERSE of shards that
      // hold left rows too (a shard with only left rows still needs
      // the lookback): latest right row among STRICTLY EARLIER shards
      // = running last over the tiny per-(key, shard) frame. Cross-
      // shard ordering is strict (monotone bucketing), so the previous
      // non-empty shard's max is the global latest earlier right row.
      val universe = lSh.select(col(key), col("__asof_shard"))
        .unionAll(rSh.select(col(key), col("__asof_shard")))
        .filter(col(key).isNotNull && col("__asof_shard").isNotNull)
        .distinct()
      val wCarry = Window.partitionBy(key).orderBy(col("__asof_shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = universe
        .join(rMax, Seq(key, "__asof_shard"), "left")
        .withColumn("__c", last(col("__m"), ignoreNulls = true).over(wCarry))
        .filter(col("__c").isNotNull)
        .select(col(key),
          col("__c.__asof_ts").as("__asof_ts"),
          lit(0).as("__asof_side"),
          col("__c.__asof_r").as("__asof_r"),
          col("__c.__asof_tb").as("__asof_tb"),
          col("__asof_shard"))

      // (4) same running-last window, now per (key, shard): the carry
      // row's ts is strictly below every in-shard ts, so it sorts
      // first and loses to any in-shard right row at-or-before the
      // left row — exactly the unsharded semantics
      val u = lSh.unionByName(rSh, allowMissingColumns = true)
        .unionByName(carry, allowMissingColumns = true)
      val w = Window.partitionBy(col(key), col("__asof_shard"))
        .orderBy(col("__asof_ts").asc, col("__asof_side").asc,
          col("__asof_tb").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("__asof_r", last(col("__asof_r"), ignoreNulls = true).over(w))
        .filter(col("__asof_side") === 1)
        .select(left.columns.map(col) ++
          rightVals.map(c => col(s"__asof_r.$c").as(c)): _*)
    }
  }
}
