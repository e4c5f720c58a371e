package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Ported from the reference's internal/fixname_test.go and
  * internal/mapping_test.go collision tables. */
class NameRegistrySpec extends AnyFunSuite {

  test("fixName") {
    assert(NameRegistry.fixName("table") === (("table", false)))
    assert(NameRegistry.fixName("tab_le_05") === (("tab_le_05", false)))
    assert(NameRegistry.fixName("tab\nle") === (("tab_le", true)))
    assert(NameRegistry.fixName("tab?le") === (("tab_le", true)))
    assert(NameRegistry.fixName("2table") === (("Atable", true)))
    assert(NameRegistry.fixName("_table") === (("Atable", true)))
    assert(NameRegistry.fixName("\ntable") === (("Atable", true)))
    assert(NameRegistry.fixName("") === (("BogusEmptyId", true)))
    assert(NameRegistry.fixName("ÿtable") === (("Atable", true))) // non-ASCII
  }

  test("spannerTable collision allocation (mapping_test.go order)") {
    val r = new NameRegistry
    assert(r.spannerTable("").isLeft)
    assert(r.spannerTable("table") === Right("table"))
    assert(r.spannerTable("tab_le_5") === Right("tab_le_5"))
    assert(r.spannerTable("tab_le_6") === Right("tab_le_6"))
    assert(r.spannerTable("tab\nle") === Right("tab_le"))
    // collision: postfix starts at |toSpanner| = 4
    assert(r.spannerTable("tab\tle") === Right("tab_le_4"))
    // must skip already-used tab_le_5 and tab_le_6
    assert(r.spannerTable("tab?le") === Right("tab_le_7"))
    // collision with a previous remapping
    assert(r.spannerTable("tab_le_4") === Right("tab_le_4_6"))
    assert(r.spannerTable("2table") === Right("Atable"))
    assert(r.spannerTable("_table") === Right("Atable_8"))
    assert(r.spannerTable("\ntable") === Right("Atable_9"))
    // consistency: same source name → same result
    assert(r.spannerTable("tab?le") === Right("tab_le_7"))
  }

  test("spannerCol collision allocation") {
    val r = new NameRegistry
    assert(r.spannerCol("table", "col").isLeft) // unknown table
    r.spannerTable("table")
    assert(r.spannerCol("", "col").isLeft)
    assert(r.spannerCol("table", "").isLeft)
    assert(r.spannerCol("table", "col") === Right("col"))
    r.spannerTable("table1")
    assert(r.spannerCol("table1", "col") === Right("col"))
    assert(r.spannerCol("table1", "c_ol") === Right("c_ol"))
    assert(r.spannerCol("table1", "c_ol_5") === Right("c_ol_5"))
    assert(r.spannerCol("table1", "c_ol_6") === Right("c_ol_6"))
    assert(r.spannerCol("table1", "c\tol") === Right("c_ol_4"))
    assert(r.spannerCol("table1", "c\nol") === Right("c_ol_7")) // skips 5,6
    assert(r.spannerCol("table1", "c?ol") === Right("c_ol_8"))
    // consistent on re-query
    assert(r.spannerCol("table1", "c\tol") === Right("c_ol_4"))
    // mustExist
    assert(r.spannerCol("table1", "newcol", mustExist = true).isLeft)
  }

  test("spannerId / FK name allocation") {
    val used = mutable.Set.empty[String]
    assert(NameRegistry.spannerForeignKey("fktest", used) === "fktest")
    assert(NameRegistry.spannerForeignKey("", used) === "")
    assert(NameRegistry.spannerId("index", used) === "index")
    assert(NameRegistry.spannerId("index", used) === "index_2")
    assert(NameRegistry.spannerId("inde\nx", used) === "inde_x")
  }

  test("FK refs resolve case-insensitively; unresolvable FKs drop") {
    import graft.types.{SpScalar, SpType}
    def tbl(name: String, cols: Seq[String], fks: Seq[SrcForeignKey] = Nil) =
      SpannerTable(name, cols,
        cols.map(c => c -> SpColumn(c, SpType(SpScalar.Int64))).toMap, fks = fks)
    val schema = Map(
      "Orders" -> tbl("Orders", Seq("OId", "CId"), Seq(
        SrcForeignKey("fk1", Seq("cid"), "CUSTOMER", Seq("id")),
        SrcForeignKey("fk2", Seq("CId"), "nosuch", Seq("id")),
        SrcForeignKey("fk3", Seq("CId"), "Customer", Seq("nosuchcol")))),
      "Customer" -> tbl("Customer", Seq("Id")))
    val (resolved, notes) = RefResolver.resolveRefs(schema)
    assert(resolved("Orders").fks ===
      Seq(SrcForeignKey("fk1", Seq("CId"), "Customer", Seq("Id"))))
    assert(notes.size === 2)
  }
}
