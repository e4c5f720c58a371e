package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, monotonically_increasing_id}

/** Bit-reversal of an INT64 — the synthetic-primary-key spreader
  * (reference: internal/convert.go:271-287, values postgres/data.go:99-104).
  *
  * The reference reverses a sequential per-table counter so consecutive
  * inserts scatter across the Spanner key space instead of hot-spotting
  * one range. The distributed equivalent reverses
  * `monotonically_increasing_id()`: ids are unique across partitions and
  * bit-reversal spreads them; exact value equality with the reference's
  * serial counter is not part of the contract — uniqueness + spread is
  * (SURVEY.md §7.4).
  *
  * Implemented as a native Catalyst expression with codegen (a one-liner
  * via java.lang.Long.reverse), not a UDF — stays inside whole-stage
  * codegen on the 100 TB write path.
  */
case class ReverseBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "reverse_bits"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.reverse(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Long.reverse($c)")

  override protected def withNewChildInternal(newChild: Expression): ReverseBits =
    copy(child = newChild)
}

object ReverseBits {
  /** Register `reverse_bits(x)` as a SQL function on this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "reverse_bits", exprs => ReverseBits(exprs.head), "built-in")

  /** The synthetic-PK column: unique, key-space-scattered INT64. */
  def synthId(spark: SparkSession): Column = {
    register(spark)
    expr("reverse_bits(monotonically_increasing_id())")
  }

  /** Append a synthetic PK column to a frame lacking a primary key. */
  def withSynthPk(spark: SparkSession, df: DataFrame,
      colName: String = "synth_id"): DataFrame =
    df.withColumn(colName, synthId(spark))
}
