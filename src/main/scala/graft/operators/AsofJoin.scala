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
  * nothing quadratic, nothing re-scanned, and skewed keys degrade into
  * one sorted run instead of a blown-up join.
  *
  * Right values travel as ONE struct, so a NULL inside a right column
  * cannot splice values from two different right rows (row-level, not
  * value-level, recency — `last(ignoreNulls)` skips only the struct
  * slots left rows carry).
  *
  * Determinism: two right rows sharing (key, ts) are ordered by
  * `tieBreak` (ascending; the LAST one wins) — pass the right side's
  * unique id to make results reproducible, or accept an arbitrary
  * winner among exact ties without one.
  */
object AsofJoin {

  /** @param left      rows to enrich (all its columns pass through)
    * @param right     lookup rows
    * @param key       equi-join column, present on both sides
    * @param leftTs    left ordering column (numeric or timestamp)
    * @param rightTs   right ordering column, same type
    * @param rightVals right columns to attach (NULL when no right row
    *                  is at-or-before the left row — LEFT asof)
    * @param tieBreak  right columns ordering exact (key, ts) ties */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val helpers = Seq("__asof_ts", "__asof_side", "__asof_r", "__asof_tb")
    require(!left.columns.exists(helpers.contains),
      s"left side uses reserved asof helper columns: ${helpers.mkString(", ")}")
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
  }
}
