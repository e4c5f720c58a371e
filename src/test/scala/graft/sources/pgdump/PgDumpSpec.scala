package graft.sources.pgdump

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.GraftSession
import graft.schema.{DdlRender, SrcKey}
import java.time.Instant

/** End-to-end pg_dump slice over the repo fixture (feature coverage
  * mirrors the reference's test_data/pg_dump.test.out: scalars, arrays,
  * composite PK, FK, index, session timezone, COPY escapes, INSERT path,
  * synthetic-PK table — reference pgdump_test.go:39-777). */
class PgDumpSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val fixture = "src/test/resources/fixtures/sample.pgdump"

  private lazy val migration = PgDumpReader.migrate(spark, fixture)
  private lazy val plan = migration.plan

  test("schema pass: tables, PKs, FKs, indexes, timezone, stats") {
    val dump = migration.dump
    assert(dump.tableOrder === Seq("inventory", "order log", "unkeyed"))
    assert(dump.timezone === Some("Asia/Kolkata"))
    val inv = dump.tables("inventory")
    assert(inv.colNames.size === 11)
    assert(inv.primaryKeys.map(_.column) === Seq("sku", "owner_id"))
    assert(inv.colDefs("sku").notNull)       // PK cols forced NOT NULL
    assert(inv.colDefs("price").ignored.default)
    assert(inv.colDefs("tags").tpe.arrayBounds === 1)
    val ol = dump.tables("order log")
    assert(ol.foreignKeys.head.referTable === "inventory")
    assert(dump.statementStats("copy") === 2)
    assert(dump.statementStats("insert") === 2)
    assert(dump.unparseable.isEmpty)
  }

  test("expression indexes: paren-depth scan keeps plain keys exact, skips expr keys with issue") {
    val ddl =
      """CREATE TABLE t (a bigint, name text, b bigint);
        |CREATE INDEX plain_ix ON t USING btree (a DESC, name);
        |CREATE INDEX expr_ix ON t (lower(name), (a + b));
        |CREATE UNIQUE INDEX partial_ix ON t (b) WHERE (a > 0);
        |""".stripMargin
    val dump = PgDumpParser.parse(ddl.linesIterator)
    val t = dump.tables("t")
    // plain and partial indexes parse exactly (partial predicate ignored,
    // like the reference ignores IndexStmt.WhereClause)
    assert(t.indexes.map(_.name) === Seq("plain_ix", "partial_ix"))
    assert(t.indexes.head.keys === Seq(SrcKey("a", desc = true), SrcKey("name")))
    assert(t.indexes(1).unique && t.indexes(1).keys === Seq(SrcKey("b")))
    // the expression index is NOT silently mangled (the old single-level
    // regex captured `lower(name` as a key) — it's skipped with a
    // recorded condition, and the rest of the dump still round-trips
    assert(dump.unparseable.exists(m =>
      m.contains("expression index expr_ix") && m.contains("t")))
  }

  test("conversion plan: name mangling, types, synthetic PK") {
    assert(plan.toSpannerTable("order log") === "order_log")
    assert(plan.toSpannerCols("order log")("order ref") === "order_ref")
    val inv = plan.spSchema("inventory")
    assert(inv.colDefs("price").t.render === "NUMERIC")
    assert(inv.colDefs("tags").t.render === "ARRAY<STRING(MAX)>")
    assert(inv.colDefs("owner_id").t.render === "STRING(20)")
    assert(plan.syntheticPks === Map("unkeyed" -> "synth_id"))
    assert(plan.spSchema("unkeyed").pks === Seq(SrcKey("synth_id")))
    // integer widened issue recorded
    import graft.types.Issue
    assert(plan.issues("inventory")("counts").contains(Issue.Widened))
  }

  test("COPY data: types, escapes, timezone, arrays") {
    val (inv, quarantine) = migration.tables("inventory")
    val rows = inv.orderBy("sku").collect()
    assert(rows.length === 3)
    assert(quarantine.count() === 0)

    val bySku = rows.map(r => r.getString(r.fieldIndex("sku")) -> r).toMap
    val w1 = bySku("widget-1")
    assert(w1.getLong(w1.fieldIndex("qty")) === 42L)
    assert(w1.getDecimal(w1.fieldIndex("price")).toPlainString === "19.990000000")
    assert(w1.getBoolean(w1.fieldIndex("in_stock")))
    assert(w1.getTimestamp(w1.fieldIndex("added_at")).toInstant
      === Instant.parse("2019-10-28T19:30:00Z"))
    assert(w1.getAs[Array[Byte]]("blob").toSeq === Seq[Byte](0x0, 0x1, 0xbe.toByte, 0xef.toByte))
    assert(w1.getSeq[String](w1.fieldIndex("tags")) === Seq("a", "b", "c d"))
    assert(w1.getSeq[Any](w1.fieldIndex("counts")) === Seq(1L, 2L, null))

    val w2 = bySku("widget-2")
    assert(w2.isNullAt(w2.fieldIndex("qty")))
    // naive timestamptz interpreted in the dump's SET timezone (Kolkata)
    assert(w2.getTimestamp(w2.fieldIndex("added_at")).toInstant
      === Instant.parse("2019-10-29T00:00:00Z"))
    assert(w2.getSeq[String](w2.fieldIndex("tags")) === Seq())

    // COPY escapes: \t inside a key column
    assert(bySku.contains("tab\tsep"))
    assert(bySku("tab\tsep").getSeq[Any](bySku("tab\tsep").fieldIndex("tags"))
      === Seq("x,y", null))
  }

  test("COPY data: quoted identifiers and embedded specials") {
    val (ol, _) = migration.tables("order_log")
    val rows = ol.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(rows(0).fieldIndex("note")) === "first order; urgent")
    assert(rows(1).getString(rows(1).fieldIndex("note")) === "back\\slash and 'quote'")
    assert(rows(2).getString(rows(2).fieldIndex("note")) === "multi\nline note")
    assert(rows(2).isNullAt(rows(2).fieldIndex("order_ref")))
  }

  test("INSERT data + synthetic PK") {
    val (un, _) = migration.tables("unkeyed")
    val rows = un.orderBy("label").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("alpha", "beta; two", "gamma's"))
    assert(rows.map(r => if (r.isNullAt(1)) null else r.getLong(1)).toSeq
      === Seq(10L, 20L, null))
    val ids = rows.map(_.getLong(rows(0).fieldIndex("synth_id")))
    assert(ids.distinct.length === 3)
  }

  test("quarantine: rows with cast failures split out, good rows survive") {
    val dumpText =
      """CREATE TABLE t (a bigint, b date);
        |COPY t (a, b) FROM stdin;
        |1	2020-01-01
        |notanumber	2020-01-02
        |3	baddate
        |\.
        |""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft", ".pgdump")
    java.nio.file.Files.writeString(p, dumpText)
    val m = PgDumpReader.migrate(spark, p.toString)
    val (good, bad) = m.tables("t")
    assert(good.count() === 1)
    assert(bad.collect().map(_.getString(0)).toSet === Set("notanumber", "3"))
  }

  test("quarantine: ragged COPY lines (wrong field count) are bad rows") {
    val dumpText =
      """CREATE TABLE t (a bigint, b text, c bigint);
        |COPY t (a, b, c) FROM stdin;
        |1	x	10
        |2	truncated
        |3	y	30	extrafield
        |\.
        |""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft", ".pgdump")
    java.nio.file.Files.writeString(p, dumpText)
    val m = PgDumpReader.migrate(spark, p.toString)
    val (good, bad) = m.tables("t")
    // short and long lines quarantined, never NULL-padded into good rows
    assert(good.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(bad.collect().map(_.getString(0)).toSet === Set("2", "3"))
  }

  test("column-less COPY defaults to schema column order") {
    val dumpText =
      """CREATE TABLE t (a bigint, b text);
        |COPY t FROM stdin;
        |1	one
        |2	two
        |\.
        |""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft", ".pgdump")
    java.nio.file.Files.writeString(p, dumpText)
    val m = PgDumpReader.migrate(spark, p.toString)
    val (good, bad) = m.tables("t")
    assert(bad.count() === 0)
    assert(good.orderBy("a").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "one"), (2L, "two")))
    // payload consumed: no garbage statements recorded
    assert(m.dump.unparseable.isEmpty)
  }

  test("DDL render: missing interleave parent terminates (stall bound)") {
    val orphan = plan.spSchema("unkeyed").copy(name = "orphan",
      parent = Some("no_such_parent"))
    val ddl = DdlRender.schemaDdl(plan.spSchema + ("orphan" -> orphan),
      DdlRender.Config())
    assert(ddl.exists(_.contains("CREATE TABLE orphan")))
  }

  test("DDL render: interleave-safe order, indexes, FK alters") {
    val ddl = DdlRender.schemaDdl(plan.spSchema, DdlRender.Config())
    val joined = ddl.mkString(";\n")
    assert(joined.contains("CREATE TABLE inventory ("))
    assert(joined.contains("PRIMARY KEY (sku, owner_id)"))
    assert(joined.contains("CREATE INDEX idx_qty ON inventory (qty)"))
    assert(joined.contains("CREATE UNIQUE INDEX idx_label ON unkeyed (label)"))
    assert(joined.contains(
      "ALTER TABLE order_log ADD CONSTRAINT fk_sku FOREIGN KEY (order_ref) REFERENCES inventory (sku)"))
    // synth_id column present in unkeyed DDL
    assert(joined.contains("synth_id INT64"))
    // legal mode quotes ids with backticks
    val legal = DdlRender.schemaDdl(plan.spSchema, DdlRender.Config(protectIds = true))
    assert(legal.exists(_.contains("`order_log`")))
  }
}
