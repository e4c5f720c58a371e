package graft.sources.jdbc

import org.scalatest.funsuite.AnyFunSuite
import graft.schema.SchemaConverter
import graft.types.PostgresTypeMapper
import InfoSchema._

/** Infoschema assembly tests over a canned catalog — the same seam the
  * reference mocks its SQL driver through (postgres/infoschema_test.go:
  * 38-523): table filter, column typing incl. arrays and mods, PK
  * ordinal order, multi-column FK grouping, index assembly, and the
  * plan conversion tail. */
class InfoSchemaSpec extends AnyFunSuite {

  private object FakeCatalog extends Catalog {
    def tables(): Seq[TableId] = Seq(
      TableId("public", "accounts"),
      TableId("pg_catalog", "pg_class"), // system → filtered
      TableId("audit", "log"))           // non-public → qualified

    def columns(t: TableId): Seq[ColumnRow] = t.name match {
      case "accounts" => Seq(
        ColumnRow("id", "bigint", None, "NO", hasDefault = false, None, Some(64), Some(0)),
        ColumnRow("name", "character varying", None, "NO", hasDefault = false, Some(40), None, None),
        ColumnRow("balance", "numeric", None, "YES", hasDefault = true, None, Some(10), Some(2)),
        ColumnRow("tags", "ARRAY", Some("text"), "YES", hasDefault = false, None, None, None),
        ColumnRow("email", "text", None, "YES", hasDefault = false, None, None, None))
      case "log" => Seq(
        ColumnRow("id", "bigint", None, "NO", hasDefault = false, None, None, None),
        ColumnRow("account_id", "bigint", None, "YES", hasDefault = false, None, None, None),
        ColumnRow("at", "timestamp with time zone", None, "YES", hasDefault = false, None, None, None))
      case _ => Nil
    }

    def constraints(t: TableId): Seq[ConstraintRow] = t.name match {
      case "accounts" => Seq(
        ConstraintRow("id", "PRIMARY KEY"),
        ConstraintRow("email", "UNIQUE"),
        ConstraintRow("balance", "CHECK"))
      case "log" => Seq(ConstraintRow("id", "PRIMARY KEY"))
      case _ => Nil
    }

    def foreignKeys(t: TableId): Seq[FkRow] = t.name match {
      case "log" => Seq(
        FkRow("fk_acct", "account_id", TableId("public", "accounts"), "id"))
      case _ => Nil
    }

    def indexes(t: TableId): Seq[IndexRow] = t.name match {
      case "accounts" => Seq(
        // two-column index arriving out of order → sorted by seq
        IndexRow("idx_name_bal", "balance", 2, unique = false, desc = true),
        IndexRow("idx_name_bal", "name", 1, unique = false, desc = false))
      case _ => Nil
    }
  }

  test("schema assembly: filter, typing, constraints, FKs, indexes") {
    val (tables, order) = readSchema(FakeCatalog)
    assert(order === Seq("accounts", "audit.log")) // system table gone
    val a = tables("accounts")
    assert(a.colDefs("id").tpe.name === "bigint")
    assert(a.colDefs("id").notNull)
    assert(a.colDefs("name").tpe.mods === Seq(40L))
    assert(a.colDefs("balance").tpe.mods === Seq(10L, 2L))
    assert(a.colDefs("balance").ignored.check)
    assert(a.colDefs("balance").ignored.default)
    assert(a.colDefs("tags").tpe === graft.types.SrcType("text", Nil, 1))
    assert(a.colDefs("email").unique)
    assert(a.primaryKeys.map(_.column) === Seq("id"))
    val ix = a.indexes.head
    assert(ix.keys.map(_.column) === Seq("name", "balance"))
    assert(ix.keys.map(_.desc) === Seq(false, true))
    val l = tables("audit.log")
    assert(l.foreignKeys.head.referTable === "accounts")
    assert(l.foreignKeys.head.columns === Seq("account_id"))
  }

  test("plan conversion tail: same TypeMapper path as the dump sources") {
    val (tables, order) = readSchema(FakeCatalog)
    val plan = SchemaConverter.convert(PostgresTypeMapper, tables, order)
    assert(plan.toSpannerTable("audit.log") === "audit_log")
    val acct = plan.spSchema("accounts")
    assert(acct.colDefs("name").t.render === "STRING(40)")
    assert(acct.colDefs("balance").t.render === "NUMERIC")
    assert(acct.colDefs("tags").t.render === "ARRAY<STRING(MAX)>")
  }

  test("C13 cast projection onto the Spanner plan") {
    val spark = graft.GraftSession.build("graft-test")
    import spark.implicits._
    val (tables, order) = readSchema(FakeCatalog)
    val plan = SchemaConverter.convert(PostgresTypeMapper, tables, order)
    // JDBC-typed frame: int id, string name, double balance (driver
    // widened), email
    val df = Seq((1, "a", 2.7, "x@y"), (2, "b", 3.9, "z@w"))
      .toDF("id", "name", "balance", "email")
    val out = JdbcData.toSpanner(df, plan, "accounts")
    assert(out.schema("id").dataType.typeName === "long")
    assert(out.schema("balance").dataType.typeName === "decimal(38,9)")
    assert(out.orderBy("id").collect().map(r =>
      r.getDecimal(r.fieldIndex("balance")).toPlainString).toSeq
      === Seq("2.700000000", "3.900000000"))
  }

  test("S9: spatial columns project through ST_AsText; plain tables don't") {
    import graft.schema.{SourceTable, SrcColumn}
    import graft.types.SrcType
    val places = SourceTable("places", Seq("id", "name", "loc", "area"),
      Map(
        "id"   -> SrcColumn("id", SrcType("bigint", Nil, 0)),
        "name" -> SrcColumn("name", SrcType("varchar", Seq(40L), 0)),
        "loc"  -> SrcColumn("loc", SrcType("point", Nil, 0)),
        "area" -> SrcColumn("area", SrcType("multipolygon", Nil, 0))))
    assert(JdbcData.mySqlColProjection(
      places.colNames.map(c => c -> places.colDefs(c).tpe.name))
      === "`id`, `name`, ST_AsText(`loc`) AS `loc`, ST_AsText(`area`) AS `area`")
    // a table with no spatial column builds the identity list (readMySqlTable
    // then uses the bare table name, keeping full pushdown)
    val plain = SourceTable("t", Seq("id"),
      Map("id" -> SrcColumn("id", SrcType("bigint", Nil, 0))))
    assert(JdbcData.mySqlColProjection(
      plain.colNames.map(c => c -> plain.colDefs(c).tpe.name)) === "`id`")
  }

  test("S9: WKT text lands as STRING through the MySQL plan") {
    import graft.schema.{SourceTable, SrcColumn}
    import graft.types.{SrcType, MySqlTypeMapper}
    val spark = graft.GraftSession.build("graft-test")
    import spark.implicits._
    val places = SourceTable("places", Seq("id", "loc"),
      Map(
        "id"  -> SrcColumn("id", SrcType("bigint", Nil, 0), notNull = true),
        "loc" -> SrcColumn("loc", SrcType("point", Nil, 0))),
      primaryKeys = Seq(graft.schema.SrcKey("id")))
    val plan = SchemaConverter.convert(MySqlTypeMapper,
      Map("places" -> places), Seq("places"))
    // geometry maps to STRING(MAX) (reference converts spatial to text)
    assert(plan.spSchema("places").colDefs("loc").t.render === "STRING(MAX)")
    // frame as the ST_AsText projection delivers it: WKT strings
    val df = Seq((1L, "POINT(1 2)"), (2L, "POINT(3 4)")).toDF("id", "loc")
    val out = JdbcData.toSpanner(df, plan, "places")
    assert(out.schema("loc").dataType.typeName === "string")
    assert(out.orderBy("id").select("loc").as[String].collect().toSeq
      === Seq("POINT(1 2)", "POINT(3 4)"))
  }

  test("mysql COLUMN_TYPE mods parsing") {
    val cat = new MySqlJdbcCatalog(null, "jdbc:", new java.util.Properties, "db")
    assert(cat.modsOf("tinyint(1)") === Seq(1L))
    assert(cat.modsOf("decimal(10,2) unsigned") === Seq(10L, 2L))
    assert(cat.modsOf("set('a','b')") === Nil)
    assert(cat.modsOf("text") === Nil)
  }
}
