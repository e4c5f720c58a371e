package graft.sink

import graft.schema.{DdlRender, SpannerTable}

/** K2/K3: database-create and FK-backfill statement batches (reference:
  * conversion/conversion.go:412-437 CreateDatabase, :441-480
  * UpdateDDLForeignKeys). The admin RPC is an injectable executor — the
  * statement ordering and FK deferral are the testable semantics:
  * FKs are never part of table creation (data loads faster without
  * constraint checking, and cyclic FKs would deadlock creation order);
  * they backfill serially after the data load. */
object DdlSink {

  /** K2: CREATE TABLE (interleave-safe order) + indexes, minus FKs. */
  def createStatements(schema: Map[String, SpannerTable],
      cfg: DdlRender.Config = DdlRender.Config(protectIds = true)): Seq[String] =
    DdlRender.schemaDdl(schema, cfg, foreignKeys = false)

  /** K3: one ALTER TABLE ... ADD FOREIGN KEY per FK, tables alphabetical. */
  def fkBackfillStatements(schema: Map[String, SpannerTable],
      cfg: DdlRender.Config = DdlRender.Config(protectIds = true)): Seq[String] =
    for {
      n <- schema.keys.toSeq.sorted
      fk <- schema(n).fks
    } yield DdlRender.addForeignKey(fk, n, cfg)

  /** Serial application with progress callback (the reference reports
    * per-FK progress, conversion.go:465-477). `exec` is the admin seam
    * (Spanner UpdateDatabaseDdl in production). */
  def applySerially(statements: Seq[String], exec: String => Unit,
      progress: (Int, Int) => Unit = (_, _) => ()): Unit =
    statements.zipWithIndex.foreach { case (s, i) =>
      exec(s)
      progress(i + 1, statements.length)
    }
}
