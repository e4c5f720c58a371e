package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.DataType

/** Identity expression that REPORTS itself nondeterministic — a fence
  * against the two Catalyst rewrites that re-inline aliased
  * subexpressions: PushDownPredicates (a filter on an aliased column is
  * pushed through the Project by substituting the alias's defining
  * expression into the predicate) and CollapseProject (adjacent
  * projections merge, duplicating shared subtrees). Both rules skip
  * nondeterministic expressions, so wrapping a column in the fence pins
  * the plan shape at that point.
  *
  * Why that matters: the dump-cast stage computes 6+ cast chains per
  * row; letting the quarantine predicate inline ALL of them produces a
  * single expression whose generated method exceeds the JVM JIT's 8 KB
  * HugeMethodLimit — it compiles (under Janino's 64 KB) but runs in the
  * bytecode interpreter, measured 6× slower than interpreted-expression
  * fallback. Fencing the combined bad-row flag keeps each column's cast
  * in its own small, JIT-compilable method.
  *
  * The wrapped VALUE is fully deterministic (pure pass-through); only
  * the optimizer's view changes, so retries/speculative tasks are safe.
  *
  * SHARP EDGE — keep fences in Project/Filter position only: because
  * the node reports nondeterministic, a fence expression in a join
  * condition dies at analysis with
  * INVALID_NON_DETERMINISTIC_EXPRESSIONS, and one used as an aggregate
  * grouping key dies later with an INTERNAL_ERROR SparkException —
  * both errors read wrong for a value that IS deterministic. The
  * sanctioned pattern is the
  * dump readers' quarantine flag: compute the fenced value as a
  * Project alias, then consume the ATTRIBUTE downstream (filters,
  * even joins on the alias, are fine — the nondeterminism stays in
  * the Project, where Spark allows it). OptimizerBarrierSpec pins
  * both sides; PlanShapeSpec pins the codegen shape it buys.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "optimizer_barrier"

  // the fence: rules that respect determinism will not move or inline
  // through this node
  override lazy val deterministic: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerBarrier =
    copy(child = newChild)
}

object OptimizerBarrier {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent for the same no-WARN-churn reason as CopyUnescape
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("optimizer_barrier")))
      reg.createOrReplaceTempFunction(
        "optimizer_barrier", exprs => OptimizerBarrier(exprs.head), "built-in")
  }

  /** Column-API entry point. */
  def fence(c: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("optimizer_barrier", c)
  }
}
