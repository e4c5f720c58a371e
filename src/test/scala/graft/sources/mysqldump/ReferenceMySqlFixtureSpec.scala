package graft.sources.mysqldump

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.schema.SrcKey
import java.time.Instant

/** Integration test over the reference's own mysqldump fixture
  * (/root/reference/test_data/mysqldump.test.out, read-only) — the
  * cart/products schema its integration suite migrates
  * (testing/mysql/integration_test.go). */
class ReferenceMySqlFixtureSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private lazy val m = MySqlDumpReader.migrate(spark,
    "/root/reference/test_data/mysqldump.test.out")

  test("schema: tables, PKs, TIME_ZONE, types") {
    assert(m.plan.tableOrder === Seq("cart", "products"))
    assert(m.dump.timezoneOffset === Some("+00:00"))
    assert(m.plan.spSchema("cart").pks ===
      Seq(SrcKey("user_id"), SrcKey("product_id")))
    assert(m.plan.spSchema("cart").colDefs("last_modified").t.render === "TIMESTAMP")
    assert(m.plan.spSchema("products").colDefs("price").t.render === "NUMERIC")
    assert(m.plan.syntheticPks.isEmpty)
    m.tables.values.foreach { case (_, bad) => assert(bad.count() === 0) }
  }

  test("cart data: bigint quantities + timestamp at +00:00") {
    val (cart, _) = m.tables("cart")
    val rows = cart.orderBy("user_id", "product_id").collect()
    assert(rows.length === 3)
    val r = rows.head // 901e-a6cfc2b502dc / abc-123
    assert(r.getString(r.fieldIndex("user_id")) === "901e-a6cfc2b502dc")
    assert(r.getLong(r.fieldIndex("quantity")) === 1L)
    assert(r.getTimestamp(r.fieldIndex("last_modified")).toInstant ===
      Instant.parse("2020-07-20T05:10:26Z"))
  }

  test("products data: decimal prices + dates") {
    val (p, _) = m.tables("products")
    val rows = p.orderBy("product_id").collect()
    assert(rows.length === 3)
    val r = rows.head // abc-123
    assert(r.getDecimal(r.fieldIndex("price")).toPlainString === "141.990000000")
    assert(r.getDate(r.fieldIndex("date_added")).toString === "2020-06-06")
    assert(r.getString(r.fieldIndex("description")) === "Blue suede shoes")
  }
}
