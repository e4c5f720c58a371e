package graft.schema

import graft.types.{SpType, SrcType}
import org.apache.spark.sql.types.{StructField, StructType}

/** Source-schema model (reference: schema/schema.go:35-99). Spark's
  * StructType can't carry PK/FK/index/uniqueness metadata, so tables are
  * first-class case classes with a StructType bridge. */
final case class SrcKey(column: String, desc: Boolean = false)

final case class SrcForeignKey(
    name: String,
    columns: Seq[String],
    referTable: String,
    referColumns: Seq[String])

final case class SrcIndex(name: String, unique: Boolean, keys: Seq[SrcKey])

/** Constraint flags whose semantics are dropped but recorded for the
  * report (reference: schema/schema.go:92-99). */
final case class Ignored(
    check: Boolean = false,
    identity: Boolean = false,
    default: Boolean = false,
    exclusion: Boolean = false,
    foreignKey: Boolean = false,
    autoIncrement: Boolean = false)

final case class SrcColumn(
    name: String,
    tpe: SrcType,
    notNull: Boolean = false,
    unique: Boolean = false,
    ignored: Ignored = Ignored())

final case class SourceTable(
    name: String,
    colNames: Seq[String],
    colDefs: Map[String, SrcColumn],
    primaryKeys: Seq[SrcKey] = Nil,
    foreignKeys: Seq[SrcForeignKey] = Nil,
    indexes: Seq[SrcIndex] = Nil)

/** Target-schema model (reference: spanner/ddl/ast.go:105-175). */
final case class SpColumn(
    name: String,
    t: SpType,
    notNull: Boolean = false,
    comment: String = "")

final case class SpannerTable(
    name: String,
    colNames: Seq[String],
    colDefs: Map[String, SpColumn],
    pks: Seq[SrcKey] = Nil,
    fks: Seq[SrcForeignKey] = Nil,
    indexes: Seq[SrcIndex] = Nil,
    parent: Option[String] = None, // INTERLEAVE IN PARENT
    comment: String = "") {

  /** The Spark schema used to read/write this table's data. */
  def structType: StructType = StructType(colNames.map { c =>
    val d = colDefs(c)
    StructField(d.name, d.t.sparkType, nullable = !d.notNull)
  })
}
