package graft.sources.pgdump

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.schema.SrcKey
import java.time.Instant

/** Integration test over the REFERENCE'S OWN fixture
  * (/root/reference/test_data/pg_dump.test.out, read-only): the same
  * end-to-end assertions its integration suite makes after a real
  * Spanner round-trip (testing/postgres/integration_test.go:220-348 —
  * checkBigInt / checkTimestamps / checkCoreTypes / checkArrays),
  * asserted here on the migrated DataFrames. */
class ReferenceFixtureSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private lazy val m = PgDumpReader.migrate(spark,
    "/root/reference/test_data/pg_dump.test.out")

  test("schema: all four tables, PKs, types") {
    assert(m.plan.tableOrder === Seq("cart", "test", "test2", "test3"))
    assert(m.plan.spSchema("cart").pks === Seq(SrcKey("userid"), SrcKey("productid")))
    assert(m.plan.spSchema("test2").colDefs("f").t.render === "NUMERIC")
    assert(m.plan.spSchema("test3").colDefs("a").t.render === "ARRAY<INT64>")
    assert(m.plan.syntheticPks.isEmpty) // every table has a PK
    m.tables.values.foreach { case (_, bad) => assert(bad.count() === 0) }
  }

  test("checkBigInt: cart quantities") {
    val (cart, _) = m.tables("cart")
    assert(cart.count() === 4)
    val q = cart.filter(org.apache.spark.sql.functions.col("userid") ===
        "31ad80e3-182b-42b0-a164-b4c7ea976ce4")
      .collect().head
    assert(q.getLong(q.fieldIndex("quantity")) === 125L)
  }

  test("checkTimestamps: naive-as-UTC and offset forms, fractional seconds") {
    val (t, _) = m.tables("test")
    val rows = t.orderBy("id").collect()
    def inst(r: org.apache.spark.sql.Row, c: String) =
      r.getTimestamp(r.fieldIndex(c)).toInstant
    assert(inst(rows(0), "t") === Instant.parse("2019-10-28T15:00:00Z"))
    assert(inst(rows(0), "tz") === Instant.parse("2019-10-28T19:00:00Z"))
    assert(inst(rows(1), "tz") === Instant.parse("2019-10-28T15:00:00Z"))
    assert(inst(rows(3), "t") === Instant.parse("2019-10-28T15:00:00.123457Z"))
    assert(inst(rows(3), "tz") === Instant.parse("2019-10-28T15:00:00.123457Z"))
  }

  test("checkCoreTypes: bool, bytea, date, float, int, numeric(38,9), text") {
    val (t2, _) = m.tables("test2")
    val r = t2.orderBy("id").collect()
    assert(r(0).getBoolean(r(0).fieldIndex("a")))
    assert(!r(1).getBoolean(r(1).fieldIndex("a")))
    assert(r(0).getAs[Array[Byte]]("b").toSeq ===
      Seq(0x00, 0x01, 0x02, 0x03, 0xde, 0xad, 0xbe, 0xef).map(_.toByte))
    assert(r(0).getDate(r(0).fieldIndex("c")).toString === "2019-10-28")
    assert(r(0).getDouble(r(0).fieldIndex("d")) === 99.9)
    assert(r(0).getLong(r(0).fieldIndex("e")) === 42L)
    assert(r(0).getDecimal(r(0).fieldIndex("f")).toPlainString ===
      "1234567890123456789012345678.123456789")
    assert(r(1).getDecimal(r(1).fieldIndex("f")).toPlainString ===
      "1234567890123456789012345.122345600")
    assert(r(0).getString(r(0).fieldIndex("g")) === "hi")
  }

  test("checkArrays: int and text arrays") {
    val (t3, _) = m.tables("test3")
    val r = t3.orderBy("id").collect()
    assert(r(0).getSeq[Long](r(0).fieldIndex("a")) === Seq(1L, 2L, 3L))
    assert(r(0).getSeq[String](r(0).fieldIndex("b")) === Seq("1", "nice", "foo"))
    assert(r(1).getSeq[Long](r(1).fieldIndex("a")) === Seq(6L))
    assert(r(1).getSeq[String](r(1).fieldIndex("b")) ===
      Seq("i", "am", "not", "a", "number"))
  }
}
