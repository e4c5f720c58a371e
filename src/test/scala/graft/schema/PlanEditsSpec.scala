package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.DdlSink
import graft.sources.pgdump.PgDumpReader
import graft.types.{SpScalar, SpType}

/** T8 plan-edit + K2/K3 DDL-sink tests over the pg fixture plan. */
class PlanEditsSpec extends AnyFunSuite {

  private lazy val plan =
    PgDumpReader.schemaPass("src/test/resources/fixtures/sample.pgdump")._2

  test("remove column: guards PK and FK use; drops covering indexes") {
    assert(PlanEdits.removeColumn(plan, "inventory", "sku").isLeft) // PK
    assert(PlanEdits.removeColumn(plan, "order_log", "order_ref").isLeft) // FK
    val p2 = PlanEdits.removeColumn(plan, "inventory", "qty")
      .getOrElse(fail("remove failed"))
    val inv = p2.spSchema("inventory")
    assert(!inv.colNames.contains("qty"))
    assert(!inv.indexes.exists(_.name == "idx_qty")) // covering index gone
    // the src→sp map entry must go too — a staged data-only run resolves
    // through it and a dangling entry crashed convertTable
    assert(!p2.toSpannerCols("inventory").values.exists(_ == "qty"))
  }

  test("rename column: updates cols, keys, indexes; rejects illegal/dup") {
    val p2 = PlanEdits.renameColumn(plan, "inventory", "qty", "quantity")
      .getOrElse(fail("rename failed"))
    val inv = p2.spSchema("inventory")
    assert(inv.colNames.contains("quantity") && !inv.colNames.contains("qty"))
    assert(inv.indexes.exists(_.keys.exists(_.column == "quantity")))
    assert(PlanEdits.renameColumn(plan, "inventory", "qty", "price").isLeft)
    assert(PlanEdits.renameColumn(plan, "inventory", "qty", "9bad").isLeft)
  }

  test("retype + notnull edits") {
    val p2 = PlanEdits.changeType(plan, "inventory", "qty",
        SpType(SpScalar.StringMax))
      .flatMap(PlanEdits.setNotNull(_, "inventory", "qty", notNull = true))
      .getOrElse(fail("edits failed"))
    val d = p2.spSchema("inventory").colDefs("qty")
    assert(d.t.render === "STRING(MAX)")
    assert(d.notNull)
  }

  test("FK and index add/drop with validation") {
    val fk = SrcForeignKey("fk_extra", Seq("note"), "inventory", Seq("sku"))
    val p2 = PlanEdits.addForeignKey(plan, "order_log", fk)
      .getOrElse(fail("add fk failed"))
    assert(p2.spSchema("order_log").fks.exists(_.name == "fk_extra"))
    assert(PlanEdits.addForeignKey(plan, "order_log",
      fk.copy(referTable = "nope")).isLeft)
    assert(PlanEdits.dropForeignKey(p2, "order_log", "fk_extra")
      .exists(!_.spSchema("order_log").fks.exists(_.name == "fk_extra")))
    val ix = SrcIndex("idx_note", unique = false, Seq(SrcKey("note")))
    assert(PlanEdits.addIndex(plan, "order_log", ix)
      .exists(_.spSchema("order_log").indexes.exists(_.name == "idx_note")))
    assert(PlanEdits.addIndex(plan, "order_log",
      SrcIndex("x", unique = false, Seq(SrcKey("ghost")))).isLeft)
  }

  test("setParent edit applies the interleave prefix rule") {
    // order_log's FK (order_ref → sku) is not a PK prefix → rejected
    assert(PlanEdits.setParent(plan, "order_log").isLeft)
    // synthetic-PK table rejected
    assert(PlanEdits.setParent(plan, "unkeyed").isLeft)
    // make it convertible: child PK (sku, owner_id, id), FK on the prefix
    val t = plan.spSchema("order_log").copy(
      pks = Seq(SrcKey("sku"), SrcKey("owner_id"), SrcKey("id")),
      colNames = plan.spSchema("order_log").colNames ++ Seq("sku", "owner_id"),
      colDefs = plan.spSchema("order_log").colDefs ++ Map(
        "sku" -> SpColumn("sku", SpType(SpScalar.StringMax)),
        "owner_id" -> SpColumn("owner_id", SpType(SpScalar.StringMax))),
      fks = Seq(SrcForeignKey("fk_par", Seq("sku", "owner_id"),
        "inventory", Seq("sku", "owner_id"))))
    val p2 = plan.copy(spSchema = plan.spSchema + ("order_log" -> t))
    val edited = PlanEdits.setParent(p2, "order_log").getOrElse(fail("setParent"))
    assert(edited.spSchema("order_log").parent === Some("inventory"))
    assert(edited.spSchema("order_log").fks.isEmpty)
  }

  test("DDL sink: creation batch has no FKs; backfill has them all; serial order") {
    val create = DdlSink.createStatements(plan.spSchema)
    assert(create.exists(_.startsWith("CREATE TABLE")))
    assert(!create.exists(_.contains("FOREIGN KEY")))
    val backfill = DdlSink.fkBackfillStatements(plan.spSchema)
    assert(backfill.length === 1)
    assert(backfill.head.contains("ADD CONSTRAINT `fk_sku` FOREIGN KEY"))
    val applied = scala.collection.mutable.ArrayBuffer.empty[String]
    var progress = Seq.empty[(Int, Int)]
    DdlSink.applySerially(backfill, applied += _,
      (i, n) => progress = progress :+ (i, n))
    assert(applied.toSeq === backfill)
    assert(progress === Seq((1, 1)))
  }
}
