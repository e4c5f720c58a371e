package graft.types

import org.apache.spark.sql.types._

/** Target (Spanner-style) type lattice: 8 scalars + 1-D arrays + a
  * MAX-length sentinel for STRING/BYTES.
  *
  * Mirrors the reference's `ddl.Type` (reference: spanner/ddl/ast.go:31-64)
  * re-expressed as a Scala ADT instead of (string, int64, bool) triples.
  */
sealed trait SpLen
object SpLen {
  case object Max extends SpLen
  final case class Fixed(n: Long) extends SpLen
}

sealed trait SpScalar {
  /** DDL rendering, e.g. STRING(MAX), BYTES(42), NUMERIC.
    * (reference: spanner/ddl/ast.go:67-82 PrintColumnDefType) */
  def render: String = this match {
    case SpScalar.SpString(SpLen.Max)      => "STRING(MAX)"
    case SpScalar.SpString(SpLen.Fixed(n)) => s"STRING($n)"
    case SpScalar.SpBytes(SpLen.Max)       => "BYTES(MAX)"
    case SpScalar.SpBytes(SpLen.Fixed(n))  => s"BYTES($n)"
    case SpScalar.Bool      => "BOOL"
    case SpScalar.Date      => "DATE"
    case SpScalar.Float64   => "FLOAT64"
    case SpScalar.Int64     => "INT64"
    case SpScalar.Timestamp => "TIMESTAMP"
    case SpScalar.Numeric   => "NUMERIC"
  }
}
object SpScalar {
  case object Bool extends SpScalar
  case object Date extends SpScalar
  case object Float64 extends SpScalar
  case object Int64 extends SpScalar
  case object Timestamp extends SpScalar
  case object Numeric extends SpScalar
  final case class SpString(len: SpLen) extends SpScalar
  final case class SpBytes(len: SpLen) extends SpScalar

  val StringMax: SpScalar = SpString(SpLen.Max)
  val BytesMax: SpScalar = SpBytes(SpLen.Max)
  def stringOf(n: Long): SpScalar = SpString(SpLen.Fixed(n))
}

object SpType {
  /** Inverse of render, for session-file round-trips: "ARRAY<STRING(42)>"
    * → SpType(SpString(Fixed(42)), isArray = true). */
  def parse(s: String): SpType = {
    val (inner, isArray) =
      if (s.startsWith("ARRAY<") && s.endsWith(">"))
        (s.substring(6, s.length - 1), true)
      else (s, false)
    val lenRe = """(STRING|BYTES)\((MAX|\d+)\)""".r
    val scalar = inner match {
      case "BOOL"      => SpScalar.Bool
      case "DATE"      => SpScalar.Date
      case "FLOAT64"   => SpScalar.Float64
      case "INT64"     => SpScalar.Int64
      case "TIMESTAMP" => SpScalar.Timestamp
      case "NUMERIC"   => SpScalar.Numeric
      case lenRe(kind, len) =>
        val l = if (len == "MAX") SpLen.Max else SpLen.Fixed(len.toLong)
        if (kind == "STRING") SpScalar.SpString(l) else SpScalar.SpBytes(l)
      case other => throw new IllegalArgumentException(s"bad SpType: $other")
    }
    SpType(scalar, isArray)
  }
}

final case class SpType(scalar: SpScalar, isArray: Boolean = false) {
  def render: String =
    if (isArray) s"ARRAY<${scalar.render}>" else scalar.render

  /** Bridge into Spark's type system. Spanner NUMERIC = (38,9)
    * (reference: postgres/toddl.go:133-146). Length mods become Spark
    * column Metadata elsewhere — Spark types carry no length. */
  def sparkType: DataType = {
    val base: DataType = scalar match {
      case SpScalar.Bool         => BooleanType
      case SpScalar.Date         => DateType
      case SpScalar.Float64      => DoubleType
      case SpScalar.Int64        => LongType
      case SpScalar.Timestamp    => TimestampType
      case SpScalar.Numeric      => DecimalType(38, 9)
      case SpScalar.SpString(_)  => StringType
      case SpScalar.SpBytes(_)   => BinaryType
    }
    if (isArray) ArrayType(base) else base
  }
}

/** Source-schema type: name + modifiers + array dimensionality.
  * (reference: schema/schema.go:83-87) */
final case class SrcType(
    name: String,
    mods: Seq[Long] = Nil,
    arrayBounds: Int = 0) {
  def print: String = {
    val m = if (mods.nonEmpty) mods.mkString("(", ",", ")") else ""
    val a = "[]" * arrayBounds
    s"$name$m$a"
  }
}

/** Schema-conversion issue taxonomy (reference: internal/convert.go:62-78). */
sealed trait Issue
object Issue {
  case object Widened extends Issue
  case object Serial extends Issue
  case object TimestampNoZone extends Issue
  case object Datetime extends Issue
  case object Time extends Issue
  case object NoGoodType extends Issue
  case object MultiDimensionalArray extends Issue
  case object ForeignKeyIgnored extends Issue
  case object DefaultValueIgnored extends Issue
  case object AutoIncrementIgnored extends Issue
  case object MissingPrimaryKey extends Issue
  case object NumericThatFits extends Issue
  case object NumberString extends Issue
  case object NoGoodTypeConflict extends Issue
  case object Empty extends Issue

  val all: Seq[Issue] = Seq(Widened, Serial, TimestampNoZone, Datetime, Time,
    NoGoodType, MultiDimensionalArray, ForeignKeyIgnored, DefaultValueIgnored,
    AutoIncrementIgnored, MissingPrimaryKey, NumericThatFits, NumberString,
    NoGoodTypeConflict, Empty)

  /** Inverse of toString, for session-file round-trips. */
  def fromName(s: String): Issue = all.find(_.toString == s)
    .getOrElse(throw new IllegalArgumentException(s"bad Issue: $s"))
}
