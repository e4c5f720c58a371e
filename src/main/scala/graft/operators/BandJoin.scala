package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — all (left, right) pairs with
  * `|left.ts − right.ts| ≤ band` (optionally per equi-key): the
  * time-proximity join behind "events near events" analyses
  * (error-burst correlation, co-occurrence windows, sensor alignment).
  * Spark plans a bare `abs(l.ts − r.ts) <= band` condition as a
  * broadcast-nested-loop (or cartesian) — O(|L|·|R|) comparisons
  * regardless of how sparse the matches are.
  *
  * Shape here — the classic BINNING rewrite: bucket the time axis at
  * the band width, replicate each RIGHT row to its bucket and both
  * neighbors ({b−1, b, b+1} — any pair within `band` differs by at
  * most one bucket), equi-join on (key…, bucket), then apply the exact
  * band predicate. Every qualifying pair meets in EXACTLY one bucket
  * (the left row's own), so no distinct is needed; cost is a 3×
  * replication of the right side through one hash shuffle plus the
  * equi-join — candidates are pairs within ±1 bucket (≤ 3× band), not
  * the cross product. Skewed hot windows shard like any hot equi-key
  * (AQE skew split / SaltedJoin), which a nested-loop never does.
  */
object BandJoin {

  /** Matching pairs: left columns + right columns, inner semantics.
    * Column names must be disjoint across the sides except `keyCols`
    * (alias first — AsofJoin's contract).
    *
    * @param leftTs/rightTs BIGINT event-time columns (same unit)
    * @param band maximum |leftTs − rightTs|, inclusive, in that unit */
  def pairs(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, band: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(band > 0, s"band must be positive: $band")
    val helper = Seq("__band_b")
    require(!(left.columns ++ right.columns).exists(helper.contains),
      "reserved column __band_b in input")
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet) -- keyCols.toSet
    require(overlap.isEmpty,
      s"non-key columns appear on both sides (alias them first): " +
        overlap.mkString(", "))
    // exact integer FLOOR division (div truncates toward zero, and a
    // float floor() can misround one ULP at exact band multiples —
    // either would put boundary rows one bucket off on one side only,
    // which the ±1 replication does not always absorb)
    def bucket(c: String) = expr(
      s"($c div ${band}L) - " +
        s"(CASE WHEN $c < 0 AND $c % ${band}L != 0 THEN 1 ELSE 0 END)")
    val l = left.withColumn("__band_b", bucket(leftTs))
    val r = right.withColumn("__band_b",
      explode(array(bucket(rightTs) - 1, bucket(rightTs),
        bucket(rightTs) + 1)))
    l.join(r, keyCols :+ "__band_b")
      .filter(abs(col(leftTs) - col(rightTs)) <= band)
      .drop("__band_b")
  }

  /** The PRODUCTION face for dense windows: per left row, only the
    * `k` nearest in-band right rows (by |Δts|, ties by `tieBreak`
    * then right ts). [[pairs]]' output is inherently quadratic in
    * in-band density — 10× event density = 100× pairs BY SEMANTICS —
    * so a consumer that only needs the closest matches must cap
    * INSIDE the operator or a dense window OOMs it. The cap is a
    * row_number-over-window filter directly above the bucket join:
    * Spark's WindowGroupLimit rule runs it in PARTIAL mode below the
    * window exchange, so each map task forwards at most k rows per
    * left id it sees and the shuffle never carries the dense window's
    * full pair volume (BandJoinSpec pins both modes in the plan).
    *
    * @param leftId   unique left row id (the cap group)
    * @param tieBreak right columns breaking exact-|Δts| ties (pass the
    *                 right side's unique id for reproducible output) */
  def nearest(left: DataFrame, right: DataFrame, leftId: String,
      leftTs: String, rightTs: String, band: Long, k: Int,
      keyCols: Seq[String] = Nil, tieBreak: Seq[String] = Nil): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // "rnk" is the OUTPUT column — withColumn would silently clobber
    // an input of that name (e.g. another top-k operator's output fed
    // in here), so refuse it like the helper name
    for (reserved <- Seq("__band_rn", "rnk"))
      require(!(left.columns ++ right.columns).contains(reserved),
        s"reserved column $reserved in input")
    val ord = (abs(col(leftTs) - col(rightTs)).asc +:
      tieBreak.map(col(_).asc)) :+ col(rightTs).asc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(leftId).orderBy(ord: _*)
    // keep the filtered column the RAW row_number: InferWindowGroupLimit
    // pattern-matches Filter-over-rank — a cast in between would keep
    // the plan correct but lose the partial-mode cap; widen after
    pairs(left, right, leftTs, rightTs, band, keyCols)
      .withColumn("__band_rn", row_number().over(w))
      .filter(col("__band_rn") <= k)
      .withColumn("rnk", col("__band_rn").cast("bigint"))
      .drop("__band_rn")
  }
}
