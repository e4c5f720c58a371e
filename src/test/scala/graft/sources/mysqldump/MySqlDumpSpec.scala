package graft.sources.mysqldump

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.schema.SrcKey
import graft.types.Issue
import java.time.Instant

/** End-to-end mysqldump slice over the repo fixture (feature coverage
  * mirrors the reference's mysql/mysqldump_test.go:31-962: tinyint(1)
  * bool, session TIME_ZONE offset, set→array, enum/json→string, spatial
  * fallback, DELIMITER-guarded trigger skip, extended-INSERT escapes,
  * synthetic PK). */
class MySqlDumpSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val fixture = "src/test/resources/fixtures/sample.mysqldump"

  private lazy val migration = MySqlDumpReader.migrate(spark, fixture)
  private lazy val plan = migration.plan

  test("schema pass: tables, constraints, TIME_ZONE, delimiter skip") {
    val dump = migration.dump
    assert(dump.tableOrder === Seq("customers", "order log", "visits", "geo"))
    assert(dump.timezoneOffset === Some("+05:30"))
    val c = dump.tables("customers")
    assert(c.primaryKeys === Seq(SrcKey("id")))
    assert(c.colDefs("id").notNull && c.colDefs("id").ignored.autoIncrement)
    assert(c.colDefs("tags").tpe.name === "set")
    assert(c.colDefs("tags").tpe.arrayBounds === 1)
    assert(c.indexes.exists(ix => ix.name == "uq_name" && ix.unique))
    assert(c.indexes.exists(ix => ix.name == "idx_joined" && !ix.unique))
    val ol = dump.tables("order log")
    assert(ol.foreignKeys.head.name === "fk_cust")
    assert(ol.foreignKeys.head.referTable === "customers")
    // trigger body skipped wholesale, never parsed as statements
    assert(dump.statementStats("createTable") === 4)
    assert(dump.statementStats("insert") === 3)
    // the only recorded condition is the spatial-type note
    assert(dump.unparseable ===
      Seq("spatial type point on column loc mapped via NoGoodType"))
  }

  test("functional indexes: plain keys exact, expression keys skipped with note") {
    val ddl =
      """CREATE TABLE t (
        |  a bigint,
        |  name text,
        |  b bigint,
        |  KEY plain_ix (a, name(10) DESC),
        |  UNIQUE KEY fn_ix ((lower(name))),
        |  KEY mixed_ix (a, (a + b))
        |);
        |CREATE INDEX ext_plain ON t (`b`);
        |CREATE INDEX ext_fn ON t ((lower(name)), a);
        |""".stripMargin
    val dump = MySqlDumpParser.parse(ddl.linesIterator)
    val t = dump.tables("t")
    // plain-column indexes parse exactly: prefix length and DESC
    // stripped, backticks unquoted — never `name(10` or `a DESC` keys
    assert(t.indexes.map(_.name) === Seq("plain_ix", "ext_plain"))
    assert(t.indexes.head.keys === Seq(SrcKey("a"), SrcKey("name")))
    assert(t.indexes(1).keys === Seq(SrcKey("b")))
    // MySQL 8 functional key parts `(expr)` skip the index with a note
    // (inline KEY, inline UNIQUE KEY, and CREATE INDEX forms alike)
    Seq("fn_ix", "mixed_ix", "ext_fn").foreach { ix =>
      assert(dump.unparseable.exists(m =>
        m.contains(s"functional index $ix") && m.contains("t")), ix)
    }
  }

  test("type mapping: tinyint(1) bool, set array, enum/json string, spatial fallback") {
    val c = plan.spSchema("customers")
    assert(c.colDefs("active").t.render === "BOOL")
    assert(c.colDefs("balance").t.render === "NUMERIC")
    assert(c.colDefs("tags").t.render === "ARRAY<STRING(MAX)>")
    assert(c.colDefs("tier").t.render === "STRING(MAX)")
    assert(c.colDefs("meta").t.render === "STRING(MAX)")
    assert(c.colDefs("photo").t.render === "BYTES(MAX)")
    // spatial point falls to STRING via NoGoodType
    val g = plan.spSchema("geo")
    assert(g.colDefs("loc").t.render === "STRING(MAX)")
    assert(plan.issues("geo")("loc").contains(Issue.NoGoodType))
    // name mangling for spaced identifiers
    assert(plan.toSpannerTable("order log") === "order_log")
    assert(plan.toSpannerCols("order log")("order id") === "order_id")
    // PK-less table gets synthetic key
    assert(plan.syntheticPks.contains("visits"))
  }

  test("INSERT data: escapes, tinyint bool, timestamp offset, set split") {
    val (cust, bad) = migration.tables("customers")
    assert(bad.count() === 0)
    val rows = cust.orderBy("id").collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    assert(r1.getString(r1.fieldIndex("name")) === "Alice")
    assert(r1.getBoolean(r1.fieldIndex("active")))
    assert(r1.getDecimal(r1.fieldIndex("balance")).toPlainString === "12.500000000")
    // timestamp: naive dump value in session offset +05:30 → instant
    assert(r1.getTimestamp(r1.fieldIndex("last_seen")).toInstant
      === Instant.parse("2020-07-19T23:40:26Z"))
    // datetime: naive, stored as UTC
    assert(r1.getTimestamp(r1.fieldIndex("birthday")).toInstant
      === Instant.parse("2020-07-20T05:10:26Z"))
    assert(r1.getSeq[String](r1.fieldIndex("tags")) === Seq("new", "vip"))
    assert(r1.getString(r1.fieldIndex("notes")) === "it's fine")
    assert(r1.getAs[Array[Byte]]("photo").toSeq
      === "bin\u0000data".getBytes("UTF-8").toSeq)
    assert(r1.getString(r1.fieldIndex("meta")) === """{"a": 1}""")

    val r2 = rows(1)
    assert(r2.getString(r2.fieldIndex("name")) === "Bob's shop")
    assert(!r2.getBoolean(r2.fieldIndex("active")))
    assert(r2.isNullAt(r2.fieldIndex("balance")))
    assert(r2.getSeq[String](r2.fieldIndex("tags")) === Seq())
    assert(r2.getString(r2.fieldIndex("notes")) === "line1\nline2")
  }

  test("column-list INSERT + FK table; column-less INSERT + synth PK") {
    val (ol, _) = migration.tables("order_log")
    assert(ol.orderBy("order_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((10L, 1L), (11L, 2L)))
    val (v, _) = migration.tables("visits")
    val rows = v.orderBy("label").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    assert(rows.map(r => if (r.isNullAt(1)) null else r.getLong(1)).toSeq
      === Seq(5L, null, 7L))
    val ids = rows.map(_.getLong(rows(0).fieldIndex("synth_id")))
    assert(ids.distinct.length === 3)
  }

  test("quarantine: ragged tuples and cast failures split out") {
    val dumpText =
      """CREATE TABLE `t` (
        |  `a` bigint(20) NOT NULL,
        |  `b` date DEFAULT NULL,
        |  PRIMARY KEY (`a`)
        |) ENGINE=InnoDB;
        |INSERT INTO `t` VALUES (1,'2020-01-01'),(2),('x','2020-01-03'),(4,'baddate');
        |""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft", ".mysqldump")
    java.nio.file.Files.writeString(p, dumpText)
    val m = MySqlDumpReader.migrate(spark, p.toString)
    val (good, bad) = m.tables("t")
    assert(good.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(bad.count() === 3)
  }
}
