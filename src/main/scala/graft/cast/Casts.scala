package graft.cast

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.types.{SpScalar, SpType}

/** The per-value cast library (reference: postgres/data.go:140-383,
  * mysql/data.go:129-261) re-expressed as Catalyst column expressions.
  *
  * Contract: every cast maps a STRING column to the target type and
  * yields NULL when the source value is unconvertible — the caller
  * splits rows with (input NOT NULL ∧ output NULL) into the bad-row
  * quarantine (the dataflow analogue of the reference's per-row error
  * return). No UDFs anywhere: every function below is built from
  * codegen-friendly built-ins (regex gates + casts), so casts run inside
  * whole-stage codegen at 100 TB.
  *
  * Overflow discipline: Spark's non-ANSI cast silently wraps integers,
  * the reference errors (strconv.ParseInt range check). Integer casts
  * here go through DECIMAL(20,0) with an explicit int64 range gate so
  * overflow becomes NULL (bad row), never silent corruption.
  */
object Casts {

  /** Digits-only signed integer, Go strconv.ParseInt(10,64) semantics. */
  def int64(c: Column): Column = {
    val d = when(c.rlike("^[+-]?\\d{1,19}$"), c.cast("decimal(20,0)"))
    when(d.between(lit(Long.MinValue), lit(Long.MaxValue)), d.cast("bigint"))
  }

  /** Go strconv.ParseFloat(64): decimal/scientific forms + Inf/NaN. */
  def float64(c: Column): Column = {
    val num = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$"
    when(c.rlike(num), c.cast("double"))
      .when(lower(c).isin("inf", "+inf", "infinity", "+infinity"),
        lit(Double.PositiveInfinity))
      .when(lower(c).isin("-inf", "-infinity"), lit(Double.NegativeInfinity))
      .when(lower(c) === "nan", lit(Double.NaN))
  }

  /** Spanner NUMERIC(38,9); oversized precision → NULL (bad row), like
    * the reference's NumericString overflow error path. */
  def numeric(c: Column): Column =
    when(c.rlike("^[+-]?(\\d{1,29}(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d{1,2})?$"),
      c.cast("decimal(38,9)"))

  /** RFC3339 full-date, strict (Go civil.ParseDate). */
  def date(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"), to_date(c, "yyyy-MM-dd"))

  /** Collapse >6 fractional-second digits to micros (Go time.Parse accepts
    * arbitrary fractions; Spark patterns stop at microseconds). */
  private def truncFrac(c: Column): Column =
    regexp_replace(c, "(\\.\\d{6})\\d+", "$1")

  /** NULL-on-failure flag for the quarantine split: input present but
    * conversion produced NULL. */
  def failed(in: Column, out: Column): Column = in.isNotNull && out.isNull
}

/** PostgreSQL dialect casts (reference: postgres/data.go:140-383). */
object PgCasts {

  /** Go strconv.ParseBool: exactly 1/t/T/TRUE/true/True and 0/f/F/FALSE/
    * false/False (Spark's own string→bool cast is looser: y/yes/n/no). */
  def bool(c: Column): Column =
    when(c.isin("1", "t", "T", "TRUE", "true", "True"), lit(true))
      .when(c.isin("0", "f", "F", "FALSE", "false", "False"), lit(false))

  /** Hex bytea: `\x`-prefixed, even-length hex (postgres/data.go:148-157). */
  def bytes(c: Column): Column =
    when(c.rlike("^\\\\x([0-9a-fA-F]{2})*$"),
      unhex(c.substr(lit(3), length(c) - 2)))

  /** timestamptz three-format fallback (postgres/data.go:196-234):
    * `...±hh`, then `...±hh:mm`, then naive interpreted in the dump's
    * session zone (`SET timezone`, default UTC). */
  def timestampTz(c: Column, zone: String = "UTC"): Column = {
    val s = regexp_replace(c, "(\\.\\d{6})\\d+", "$1")
    coalesce(
      to_timestamp(s, "yyyy-MM-dd HH:mm:ss[.SSSSSS]X"),
      to_timestamp(s, "yyyy-MM-dd HH:mm:ss[.SSSSSS]XXX"),
      to_utc_timestamp(to_timestamp(s, "yyyy-MM-dd HH:mm:ss[.SSSSSS]"), zone))
  }

  /** timestamp without time zone: naive, stored as-is (UTC). */
  def timestampNoTz(c: Column): Column =
    to_timestamp(regexp_replace(c, "(\\.\\d{6})\\d+", "$1"),
      "yyyy-MM-dd HH:mm:ss[.SSSSSS]")

  private def timestamp(srcTypeName: String, c: Column, zone: String): Column =
    if (srcTypeName == "timestamptz" || srcTypeName == "timestamp with time zone")
      timestampTz(c, zone)
    else timestampNoTz(c)

  /** Scalar dispatch (postgres/data.go:113-138). STRING passes through. */
  def scalar(sp: SpType, srcTypeName: String, c: Column,
      zone: String = "UTC"): Column = sp.scalar match {
    case SpScalar.Bool         => bool(c)
    case SpScalar.SpBytes(_)   => bytes(c)
    case SpScalar.Date         => Casts.date(c)
    case SpScalar.Float64      => Casts.float64(c)
    case SpScalar.Int64        => Casts.int64(c)
    case SpScalar.Numeric      => Casts.numeric(c)
    case SpScalar.SpString(_)  => c
    case SpScalar.Timestamp    => timestamp(srcTypeName, c, zone)
  }

  /** pg array literal `{a,b,NULL,"q\"x"}` → typed ARRAY (the C11 lexer,
    * postgres/data.go:242-398). Elements may be double-quoted (required
    * when they contain commas/braces/quotes/whitespace or equal NULL);
    * embedded `"` and `\` are backslash-escaped. The tokenizer is a
    * single regexp (quoted-run | bare-run) evaluated in codegen — the
    * built-in `split(",")` would break quoted elements, which is exactly
    * why the survey earmarked this cast for custom handling.
    */
  def array(sp: SpType, srcTypeName: String, c: Column,
      zone: String = "UTC"): Column = {
    val trimmed = trim(c)
    val body = trimmed.substr(lit(2), length(trimmed) - 2)
    val tokens = regexp_extract_all(body,
      lit("(\"(?:[^\"\\\\]|\\\\.)*\"|[^,]+)"), lit(1))
    val unquoted = transform(tokens, t => {
      val isQuoted = t.startsWith("\"") && t.endsWith("\"") && length(t) >= 2
      val inner = regexp_replace(t.substr(lit(2), length(t) - 2), "\\\\(.)", "$1")
      when(t === "NULL", lit(null: String))
        .when(isQuoted, inner)
        .otherwise(t)
    })
    val elems = transform(unquoted, e => scalar(sp, srcTypeName, e, zone))
    when(trimmed === "{}", typedEmpty(sp))
      .when(trimmed.startsWith("{") && trimmed.endsWith("}"), elems)
  }

  private def typedEmpty(sp: SpType): Column = {
    import org.apache.spark.sql.types.ArrayType
    // `sp` may arrive as the full array type (isArray=true) or as the
    // element type; either way the empty literal is ARRAY<element>.
    lit(scala.Array.empty[String]).cast(ArrayType(SpType(sp.scalar).sparkType))
  }
}

/** MySQL dialect casts (reference: mysql/data.go:129-261). */
object MySqlCasts {

  /** ParseBool, falling back to tinyint semantics: any integer in
    * [-128,127] is a bool, non-zero = true (mysql/data.go:129-147). */
  def bool(c: Column): Column = {
    val i = Casts.int64(c)
    when(c.isin("1", "t", "T", "TRUE", "true", "True"), lit(true))
      .when(c.isin("0", "f", "F", "FALSE", "false", "False"), lit(false))
      .when(i.between(-128, 127), i =!= 0)
  }

  /** mysqldump emits raw string bytes (mysql/data.go:149-153). */
  def bytes(c: Column): Column = c.cast("binary")

  /** `timestamp`: naive dump value + session offset (SET TIME_ZONE,
    * default +00:00) → instant (mysql/data.go:193-219). */
  def timestampWithOffset(c: Column, offset: String = "+00:00"): Column = {
    val off = if (offset.isEmpty) "+00:00" else offset
    to_timestamp(
      concat(regexp_replace(regexp_replace(c, "(\\.\\d{6})\\d+", "$1"), " ", "T"), lit(off)),
      "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")
  }

  /** `datetime`: naive, stored as-is (UTC). */
  def datetime(c: Column): Column = PgCasts.timestampNoTz(c)

  def scalar(sp: SpType, srcTypeName: String, c: Column,
      offset: String = "+00:00"): Column = sp.scalar match {
    case SpScalar.Bool        => bool(c)
    case SpScalar.SpBytes(_)  => bytes(c)
    case SpScalar.Date        => Casts.date(c)
    case SpScalar.Float64     => Casts.float64(c)
    case SpScalar.Int64       => Casts.int64(c)
    case SpScalar.Numeric     => Casts.numeric(c)
    case SpScalar.SpString(_) => c
    case SpScalar.Timestamp   =>
      if (srcTypeName == "timestamp") timestampWithOffset(c, offset)
      else datetime(c)
  }

  /** MySQL SET → ARRAY<STRING>: comma-split, unquote, NULL elements
    * (mysql/data.go:228-261); empty string → empty array. */
  def setArray(c: Column): Column = {
    val parts = split(c, ",")
    val unq = transform(parts, t => {
      val isQuoted = t.startsWith("\"") && t.endsWith("\"") && length(t) >= 2
      val inner = regexp_replace(t.substr(lit(2), length(t) - 2), "\\\\(.)", "$1")
      when(t === "NULL", lit(null: String))
        .when(isQuoted, inner)
        .otherwise(t)
    })
    when(trim(c) === "", lit(scala.Array.empty[String]))
      .otherwise(unq)
  }
}
