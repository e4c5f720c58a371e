package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native codegen replacements for the embedding hot loops.
  *
  * The embedding operators' inner kernel was
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)`:
  * higher-order functions carry lambda variables that Catalyst can only
  * evaluate interpreted (no doGenCode), and zip_with materializes an
  * intermediate products ARRAY per row — measured ~11 µs per 64-dim pair.
  * Harmless for 8-probe kNN; fatal for the whole-corpus graph builds
  * (e12 at sf0.1: 3M candidate pairs ≈ 33 s of interpreted fold, >80%
  * of the query). These expressions generate the obvious fused loop
  * inside WholeStageCodegen — no intermediate array, no lambda frames —
  * and keep BIT-IDENTICAL semantics to the HOF formulation (same
  * left-to-right fold order, same null contract), which ArrayMathSpec
  * pins case by case:
  *   - either array NULL → NULL;
  *   - length mismatch → NULL (zip_with pads the short side with NULL,
  *     the padded product is NULL, and the running sum absorbs it);
  *   - any NULL element → NULL for the same reason;
  *   - long inputs wrap on overflow exactly like the SQL `*`/`+`.
  *
  * Element type follows the inputs (bigint→bigint, double→double), so
  * the quantized-integer dot contract shared with the DuckDB oracles
  * (IvfAnn.quant) is untouched — only the evaluation engine changes.
  */
abstract class ArrayFoldExpression extends BinaryExpression {

  /** Scalar combine step: Java source `(aVal, bVal) => term`. */
  protected def termJava(a: String, b: String): String
  protected def termEval(a: Double, b: Double): Double
  protected def termEvalL(a: Long, b: Long): Long

  protected def elementType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def dataType: DataType = elementType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<bigint> or two array<double> args, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input).asInstanceOf[ArrayData]
    if (a == null) return null
    val b = right.eval(input).asInstanceOf[ArrayData]
    if (b == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    if (elementType == LongType) {
      var acc = 0L
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += termEvalL(a.getLong(i), b.getLong(i))
        i += 1
      }
      acc
    } else {
      var acc = 0.0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += termEval(a.getDouble(i), b.getDouble(i))
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val (jt, getter, zero) = elementType match {
      case LongType => ("long", "getLong", "0L")
      case _ => ("double", "getDouble", "0.0")
    }
    val a = ctx.freshName("a")
    val b = ctx.freshName("b")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val av = ctx.freshName("av")
    val bv = ctx.freshName("bv")
    val hasNull = ctx.freshName("hasNull")
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        $jt ${ev.value} = $zero;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${leftGen.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${rightGen.value};
          int $n = $a.numElements();
          if ($n == $b.numElements()) {
            $jt $acc = $zero;
            boolean $hasNull = false;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
              $jt $av = $a.$getter($i);
              $jt $bv = $b.$getter($i);
              $acc += ${termJava(av, bv)};
            }
            if (!$hasNull) {
              ${ev.isNull} = false;
              ${ev.value} = $acc;
            }
          }
        }
      """
    ev.copy(code = code)
  }
}

/** `array_dot(a, b)` = Σ aᵢ·bᵢ — the exact-rerank kernel. */
case class ArrayDot(left: Expression, right: Expression)
    extends ArrayFoldExpression {
  override def prettyName: String = "array_dot"
  override protected def termJava(a: String, b: String): String = s"$a * $b"
  override protected def termEval(a: Double, b: Double): Double = a * b
  override protected def termEvalL(a: Long, b: Long): Long = a * b
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDot = copy(left = newLeft, right = newRight)
}

/** `array_l2sq(a, b)` = Σ (aᵢ−bᵢ)² — the centroid-assignment kernel. */
case class ArrayL2Sq(left: Expression, right: Expression)
    extends ArrayFoldExpression {
  override def prettyName: String = "array_l2sq"
  override protected def termJava(a: String, b: String): String =
    s"($a - $b) * ($a - $b)"
  override protected def termEval(a: Double, b: Double): Double = (a - b) * (a - b)
  override protected def termEvalL(a: Long, b: Long): Long = (a - b) * (a - b)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayL2Sq = copy(left = newLeft, right = newRight)
}

object ArrayMath {

  /** Idempotent registration (no re-register → no SimpleFunctionRegistry
    * "replaced a previously registered function" churn in long sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val fid = org.apache.spark.sql.catalyst.FunctionIdentifier("array_dot")
    if (!reg.functionExists(fid)) {
      reg.createOrReplaceTempFunction(
        "array_dot", exprs => ArrayDot(exprs.head, exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "array_l2sq", exprs => ArrayL2Sq(exprs.head, exprs(1)), "built-in")
    }
  }

  /** Column-API entry points: construct the expression directly
    * (ColumnBridge) — pure Column construction, no registry mutation,
    * no dependence on which session is `active` when the plan is later
    * analyzed. [[register]] stays for the SQL-text form
    * (`expr("array_dot(…)")`), wired per-session by GraftSession. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge._
    column(ArrayDot(expression(a), expression(b)))
  }

  def l2sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge._
    column(ArrayL2Sq(expression(a), expression(b)))
  }
}
