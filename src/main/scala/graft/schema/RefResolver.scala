package graft.schema

/** Foreign-key reference resolution against the converted Spanner schema
  * (reference: internal/mapping.go:193-264). Spanner requires DDL refs to
  * match the case of the referenced object; source DBs often don't, so
  * unresolved refs get a case-insensitive second chance and FKs that still
  * don't resolve are dropped (with a note for the report). */
object RefResolver {

  /** Returns the schema with every FK's table/column refs resolved, plus
    * the list of dropped-FK messages. */
  def resolveRefs(spSchema: Map[String, SpannerTable])
      : (Map[String, SpannerTable], Seq[String]) = {
    val notes = Seq.newBuilder[String]
    val out = spSchema.map { case (name, table) =>
      val kept = table.fks.flatMap { fk =>
        resolveFk(spSchema, table.name, fk) match {
          case Right(r) => Some(r)
          case Left(e)  => notes += e; None
        }
      }
      name -> table.copy(fks = kept)
    }
    (out, notes.result())
  }

  private def resolveFk(spSchema: Map[String, SpannerTable], table: String,
      fk: SrcForeignKey): Either[String, SrcForeignKey] =
    for {
      cols <- resolveCols(spSchema, table, fk.columns)
      refTable <- resolveTable(spSchema, fk.referTable)
      refCols <- resolveCols(spSchema, refTable, fk.referColumns)
    } yield fk.copy(columns = cols, referTable = refTable, referColumns = refCols)

  private def resolveTable(spSchema: Map[String, SpannerTable],
      ref: String): Either[String, String] =
    if (spSchema.contains(ref)) Right(ref)
    else spSchema.keys.find(_.equalsIgnoreCase(ref))
      .toRight(s"Can't resolve table $ref")

  private def resolveCols(spSchema: Map[String, SpannerTable],
      tableRef: String, colRefs: Seq[String]): Either[String, Seq[String]] =
    resolveTable(spSchema, tableRef).flatMap { t =>
      val table = spSchema(t)
      val resolved = colRefs.map { c =>
        if (table.colDefs.contains(c)) Right(c)
        else table.colNames.find(_.equalsIgnoreCase(c))
          .toRight(s"Can't resolve column: table=$tableRef, column=$c")
      }
      resolved.collectFirst { case Left(e) => Left(e) }
        .getOrElse(Right(resolved.map(_.toOption.get)))
    }
}
