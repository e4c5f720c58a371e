package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import graft.schema.{Interleave, SrcForeignKey, SrcKey}
import graft.sources.pgdump.PgDumpReader

/** Session-file round-trip (K5/S14) + interleave detector (T7) tests. */
class SessionFileSpec extends AnyFunSuite {

  private lazy val plan =
    PgDumpReader.schemaPass("src/test/resources/fixtures/sample.pgdump")._2
  private val c = new org.apache.hadoop.conf.Configuration()

  test("session file round-trips the full conversion plan") {
    val p = java.nio.file.Files.createTempFile("graft", ".session.json")
    SessionFile.write(plan, p.toString, c)
    val back = SessionFile.read(p.toString, c)
    assert(back.tableOrder === plan.tableOrder)
    assert(back.toSpannerTable === plan.toSpannerTable)
    assert(back.toSpannerCols === plan.toSpannerCols)
    assert(back.syntheticPks === plan.syntheticPks)
    assert(back.timezone === plan.timezone)
    assert(back.srcSchema === plan.srcSchema)
    assert(back.issues === plan.issues)
    // spanner side: everything except column Metadata-free comparison
    assert(back.spSchema.keySet === plan.spSchema.keySet)
    plan.spSchema.foreach { case (n, t) =>
      val b = back.spSchema(n)
      assert(b.colNames === t.colNames, n)
      assert(b.pks === t.pks, n)
      assert(b.fks === t.fks, n)
      assert(b.indexes === t.indexes, n)
      t.colNames.foreach { c =>
        assert(b.colDefs(c).t === t.colDefs(c).t, s"$n.$c")
        assert(b.colDefs(c).notNull === t.colDefs(c).notNull, s"$n.$c")
      }
    }
    // a data-only run can rebuild identical DDL from the session file
    import graft.schema.DdlRender
    assert(DdlRender.schemaDdl(back.spSchema, DdlRender.Config())
      === DdlRender.schemaDdl(plan.spSchema, DdlRender.Config()))
  }

  test("interleave: FK whose columns extend the parent PK becomes parent") {
    val parent = plan.spSchema("inventory") // PK (sku, owner_id)
    val child = plan.spSchema("order_log").copy(
      pks = Seq(SrcKey("sku"), SrcKey("owner_id"), SrcKey("id")),
      fks = Seq(SrcForeignKey("fk_inv", Seq("sku", "owner_id"),
        "inventory", Seq("sku", "owner_id"))))
    val schema = Map("inventory" -> parent, "order_log" -> child)
    val (out, notes) = Interleave.detect(schema, plan.syntheticPks)
    assert(out("order_log").parent === Some("inventory"))
    assert(out("order_log").fks.isEmpty)
    assert(notes.exists(_.contains("interleaved in inventory")))
    // DDL renders the INTERLEAVE clause, parent before child
    val ddl = graft.schema.DdlRender.schemaDdl(out, graft.schema.DdlRender.Config())
    val joined = ddl.mkString(";\n")
    assert(joined.contains("INTERLEAVE IN PARENT inventory"))
    assert(joined.indexOf("CREATE TABLE inventory") <
      joined.indexOf("CREATE TABLE order_log"))
  }

  test("interleave chain: singers → albums → songs orders DDL by depth") {
    import graft.schema.{SpColumn, SpannerTable}
    import graft.types.{SpScalar, SpType}
    def t(name: String, pks: Seq[String], fk: Option[(String, Seq[String])]) =
      SpannerTable(name,
        colNames = pks,
        colDefs = pks.map(c => c -> SpColumn(c, SpType(SpScalar.Int64))).toMap,
        pks = pks.map(SrcKey(_)),
        fks = fk.toSeq.map { case (ref, cols) =>
          SrcForeignKey(s"fk_$name", cols, ref, cols) })
    val schema = Map(
      "singers" -> t("singers", Seq("singerid"), None),
      "albums" -> t("albums", Seq("singerid", "albumid"),
        Some("singers" -> Seq("singerid"))),
      "songs" -> t("songs", Seq("singerid", "albumid", "trackid"),
        Some("albums" -> Seq("singerid", "albumid"))))
    val (out, notes) = graft.schema.Interleave.detect(schema, Map.empty)
    assert(out("albums").parent === Some("singers"))
    assert(out("songs").parent === Some("albums"))
    assert(notes.length === 2)
    val ddl = graft.schema.DdlRender.schemaDdl(out, graft.schema.DdlRender.Config())
    val joined = ddl.mkString(";\n")
    // grandparent before parent before child, despite alphabetical order
    assert(joined.indexOf("CREATE TABLE singers") <
      joined.indexOf("CREATE TABLE albums"))
    assert(joined.indexOf("CREATE TABLE albums") <
      joined.indexOf("CREATE TABLE songs"))
    assert(joined.contains("INTERLEAVE IN PARENT albums"))
    // converted FKs are gone: no ALTERs remain
    assert(!joined.contains("FOREIGN KEY"))
  }

  test("interleave rejected: name mismatch, synthetic PK, non-prefix") {
    val parent = plan.spSchema("inventory")
    // FK columns don't match child PK prefix by name
    val child1 = plan.spSchema("order_log").copy(
      pks = Seq(SrcKey("id")),
      fks = Seq(SrcForeignKey("fk", Seq("order_ref"), "inventory", Seq("sku"))))
    val (out1, _) = Interleave.detect(
      Map("inventory" -> parent, "order_log" -> child1), Map.empty)
    assert(out1("order_log").parent.isEmpty)
    // synthetic-PK child can't interleave
    val child2 = plan.spSchema("unkeyed")
    val (out2, _) = Interleave.detect(
      Map("inventory" -> parent, "unkeyed" -> child2),
      Map("unkeyed" -> "synth_id"))
    assert(out2("unkeyed").parent.isEmpty)
  }
}
