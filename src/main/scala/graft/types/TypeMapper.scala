package graft.types

import SpScalar._
import SpLen._

/** Source-type → Spanner-type mapping: the heart of the reference's
  * "query semantics" (SURVEY.md §1.2). One trait, three dialects.
  *
  * Multi-dimensional arrays collapse to STRING(MAX) and 1-D arrays become
  * ARRAY<T> uniformly across dialects (reference: postgres/toddl.go:67-81).
  */
trait TypeMapper {
  /** Scalar mapping only; array bounds handled by [[toSpanner]]. */
  protected def scalar(name: String, mods: Seq[Long]): (SpScalar, Seq[Issue])

  def toSpanner(t: SrcType): (SpType, Seq[Issue]) = {
    val (s, issues) = scalar(t.name, t.mods)
    if (t.arrayBounds > 1)
      // Collapse to STRING(MAX) but keep the scalar mapping's issues —
      // e.g. a 2-D serial column still reports Serial (reference appends
      // MultiDimensionalArray to the scalar issues, toddl.go:67-70).
      (SpType(StringMax), issues :+ Issue.MultiDimensionalArray)
    else
      (SpType(s, isArray = t.arrayBounds == 1), issues)
  }
}

/** PostgreSQL dialect (reference: postgres/toddl.go:107-163). */
object PostgresTypeMapper extends TypeMapper {
  protected def scalar(name: String, mods: Seq[Long]): (SpScalar, Seq[Issue]) =
    name match {
      case "bool" | "boolean"     => (Bool, Nil)
      case "bigserial"            => (Int64, Seq(Issue.Serial))
      case "bpchar" | "character" => // no mod ⇒ blank-padded char(1)
        (SpString(mods.headOption.map(Fixed.apply).getOrElse(Fixed(1))), Nil)
      case "bytea"                => (BytesMax, Nil)
      case "date"                 => (Date, Nil)
      case "float8" | "double precision" => (Float64, Nil)
      case "float4" | "real"      => (Float64, Seq(Issue.Widened))
      case "int8" | "bigint"      => (Int64, Nil)
      case "int4" | "integer"     => (Int64, Seq(Issue.Widened))
      case "int2" | "smallint"    => (Int64, Seq(Issue.Widened))
      case "numeric"              => (Numeric, Nil)
      case "serial"               => (Int64, Seq(Issue.Serial))
      case "text"                 => (StringMax, Nil)
      case "timestamptz" | "timestamp with time zone" => (Timestamp, Nil)
      case "timestamp" | "timestamp without time zone" =>
        (Timestamp, Seq(Issue.TimestampNoZone))
      case "varchar" | "character varying" =>
        (SpString(mods.headOption.map(Fixed.apply).getOrElse(Max)), Nil)
      case _ => (StringMax, Seq(Issue.NoGoodType))
    }
}

/** MySQL dialect (reference: mysql/toddl.go:114-168). */
object MySqlTypeMapper extends TypeMapper {
  protected def scalar(name: String, mods: Seq[Long]): (SpScalar, Seq[Issue]) =
    name match {
      case "bool" | "boolean" => (Bool, Nil)
      case "tinyint" => // tinyint(1) is MySQL's bool spelling
        if (mods.headOption.contains(1L)) (Bool, Nil)
        else (Int64, Seq(Issue.Widened))
      case "double"               => (Float64, Nil)
      case "float"                => (Float64, Seq(Issue.Widened))
      case "numeric" | "decimal"  => (Numeric, Nil)
      case "bigint"               => (Int64, Nil)
      case "smallint" | "mediumint" | "integer" | "int" =>
        (Int64, Seq(Issue.Widened))
      case "bit"                  => (BytesMax, Nil)
      case "varchar" | "char" =>
        (SpString(mods.headOption.map(Fixed.apply).getOrElse(Max)), Nil)
      case "text" | "tinytext" | "mediumtext" | "longtext" => (StringMax, Nil)
      case "set" | "enum"         => (StringMax, Nil)
      case "json"                 => (StringMax, Nil)
      case "binary" | "varbinary" => (BytesMax, Nil)
      case "tinyblob" | "mediumblob" | "blob" | "longblob" => (BytesMax, Nil)
      case "date"                 => (Date, Nil)
      case "datetime"             => (Timestamp, Seq(Issue.Datetime))
      case "timestamp"            => (Timestamp, Nil)
      case "time" | "year"        => (StringMax, Seq(Issue.Time))
      case _ => (StringMax, Seq(Issue.NoGoodType))
    }
}

/** DynamoDB dialect over inferred attribute types
  * (reference: dynamodb/toddl.go:76-95). `Number` is assumed pre-checked
  * against NUMERIC(38,9) bounds by the inference pass; unparsable numbers
  * arrive as the distinct `NumberString` candidate. */
object DynamoTypeMapper extends TypeMapper {
  protected def scalar(name: String, mods: Seq[Long]): (SpScalar, Seq[Issue]) =
    name match {
      case "String"       => (StringMax, Nil)
      case "Bool"         => (Bool, Nil)
      case "Number"       => (Numeric, Nil)
      case "NumberString" => (StringMax, Nil)
      case "Binary"       => (BytesMax, Nil)
      case "List" | "Map" => (StringMax, Nil) // serialized as JSON
      case _              => (StringMax, Seq(Issue.NoGoodType))
    }

  override def toSpanner(t: SrcType): (SpType, Seq[Issue]) = t.name match {
    // Dynamo sets arrive as set types, not via arrayBounds. A set whose
    // Numbers don't all fit NUMERIC(38,9) is classified NumberStringSet
    // by inference and lands as ARRAY<STRING> (dynamodb/toddl.go:84-85).
    case "StringSet" | "NumberStringSet" =>
      (SpType(StringMax, isArray = true), Nil)
    case "NumberSet" => (SpType(Numeric, isArray = true), Nil)
    case "BinarySet" => (SpType(BytesMax, isArray = true), Nil)
    case _           => super.toSpanner(t)
  }
}
