package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** `zvalue(x, y)` — Morton / Z-order interleave of two 31-bit
  * non-negative coordinates into one INT64 sort key: bit i of `x`
  * lands at bit 2i, bit i of `y` at bit 2i+1 (y is the "major" axis
  * of each bit pair). Sorting or range-partitioning a corpus by this
  * ONE key clusters it along BOTH dimensions at once, which is what
  * makes multi-dimensional data skipping work at 100 TB: each
  * parquet file's (min, max) footer stats then bound x AND y, so a
  * predicate on either dimension prunes files — a single-column sort
  * gives that for one dimension and randomizes the other.
  * (The classic curve from Morton 1966; the same layout trick behind
  * the z-ordered table formats.)
  *
  * Out-of-range input (negative, or ≥ 2³¹) REFUSES loudly rather
  * than silently masking: a truncated coordinate would interleave a
  * wrong prefix and quietly destroy the locality the caller asked
  * for. Callers with wider domains bucketize first (e.g.
  * `x div 1024`) — a deliberate, visible choice of resolution.
  *
  * Native codegen expression (the ReverseBits pattern): the
  * magic-mask bit spread is ~12 straight-line long ops per side, no
  * branches, inside whole-stage codegen — never a UDF on the write
  * path.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zvalue needs (BIGINT, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZValue.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZValue.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZValue = copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Spread the low 31 bits of v to the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** The kernel codegen calls (static forwarder on this object). */
  def compute(x: Long, y: Long): Long = {
    if (((x | y) >>> 31) != 0L)
      throw new IllegalArgumentException(
        s"zvalue coordinates must be in [0, 2^31): got ($x, $y) — " +
          "bucketize wider domains explicitly (e.g. x div 1024)")
    spread(x) | (spread(y) << 1)
  }

  /** Idempotent SQL registration: `zvalue(x, y)`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val fid = org.apache.spark.sql.catalyst.FunctionIdentifier("zvalue")
    if (!reg.functionExists(fid))
      reg.createOrReplaceTempFunction(
        "zvalue", exprs => ZValue(exprs.head, exprs(1)), "built-in")
  }

  /** Column-API form (no registry dependence — the ArrayMath pattern). */
  def of(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge._
    column(ZValue(expression(x), expression(y)))
  }

  /** Write-side layout: cluster a frame for two-dimensional data
    * skipping. Range-partitions into `numFiles` z-ranges and sorts
    * within each, so a subsequent parquet write produces files whose
    * footer (min, max) stats bound BOTH coordinates — c24 is the
    * audit that the clustering took. The z column is dropped before
    * returning: it is a layout key, not data (recompute it; never
    * persist a derived sort key that can silently go stale). */
  def layout(df: org.apache.spark.sql.DataFrame, x: Column, y: Column,
      numFiles: Int): org.apache.spark.sql.DataFrame = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    // collision-free sort-key name: withColumn REPLACES an existing
    // column, so reusing a caller's "__graft_z" would destroy its data
    val zc = Iterator.from(0)
      .map(i => if (i == 0) "__graft_z" else s"__graft_z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zc, of(x, y))
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
