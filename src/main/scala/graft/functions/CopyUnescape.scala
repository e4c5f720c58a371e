package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Postgres COPY text-format unescape as a native Catalyst expression
  * (reference: postgres/pgdump.go:122-152 — a single left-to-right
  * scan, reproduced here byte-for-byte).
  *
  * Why an Expression and not the regexp_replace chain it replaces: the
  * chain needed 8 nested regex passes per field, and once the
  * quarantine filter's predicate was pushed through the cast
  * projection, every column's chain was inlined into ONE filter
  * condition — a single expression Janino cannot split, overflowing
  * the 64 KB method limit and dropping the whole bulk-migration stage
  * out of whole-stage codegen. This expression generates one static
  * call per column, keeping the stage inside codegen, and its
  * single-pass scan is ~8× less per-row work than the regex chain.
  *
  * Byte-level scanning is safe in UTF-8: the backslash (0x5C) and every
  * escape letter are ASCII, and no UTF-8 continuation byte of a
  * multi-byte sequence falls below 0x80 — a backslash byte is always a
  * real backslash character.
  */
case class CopyUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "copy_unescape"

  override protected def nullSafeEval(input: Any): Any =
    CopyUnescape.unescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CopyUnescape.unescape($c)")

  override protected def withNewChildInternal(newChild: Expression): CopyUnescape =
    copy(child = newChild)
}

object CopyUnescape {
  /** Register `copy_unescape(s)` as a SQL function on this session
    * (idempotent), so the expression is reachable from the Column API
    * via `call_function` without private Column constructors. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // guard: re-registering on every read logs a "replaced a previously
    // registered function" WARN per call — pure churn in long sessions
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("copy_unescape")))
      reg.createOrReplaceTempFunction(
        "copy_unescape", exprs => CopyUnescape(exprs.head), "built-in")
  }

  /** Single-pass COPY unescape. `\\`→`\`, `\t`→TAB, `\n`→LF, `\r`→CR,
    * `\b`→BS, `\f`→FF, `\v`→VT; an unrecognized escape (or a trailing
    * lone backslash) passes through untouched, matching the reference's
    * default case. Fast path: a value with no backslash byte (the
    * overwhelming majority) is returned as-is, zero allocation. */
  def unescape(s: UTF8String): UTF8String = {
    val in = s.getBytes
    var hasBackslash = false
    var i = 0
    while (i < in.length && !hasBackslash) {
      if (in(i) == '\\') hasBackslash = true
      i += 1
    }
    if (!hasBackslash) return s

    val out = new Array[Byte](in.length)
    var o = 0
    i = 0
    while (i < in.length) {
      val b = in(i)
      if (b == '\\' && i + 1 < in.length) {
        val n = in(i + 1)
        val repl: Int = n.toChar match {
          case '\\' => '\\'
          case 't' => '\t'
          case 'n' => '\n'
          case 'r' => '\r'
          case 'b' => '\b'
          case 'f' => '\f'
          case 'v' => 0x0B
          case _ => -1
        }
        if (repl >= 0) {
          out(o) = repl.toByte; o += 1; i += 2
        } else {
          out(o) = b; o += 1; i += 1
        }
      } else {
        out(o) = b; o += 1; i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
