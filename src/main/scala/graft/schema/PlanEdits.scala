package graft.schema

import graft.schema.SchemaConverter.ConversionPlan
import graft.types.SpType

/** T8: interactive schema edits as pure plan transformations (reference:
  * web/web.go:266-389,509-770 — remove/rename column, retype, NOT NULL
  * toggle, FK and secondary-index add/drop, interleave set). The web
  * layer mutates a session in place; here every edit is
  * `ConversionPlan => Either[error, ConversionPlan]`, so an HTTP facade
  * (or a programmatic caller) composes them with rollback for free. */
object PlanEdits {

  private def withTable(plan: ConversionPlan, spTable: String)
      (f: SpannerTable => Either[String, SpannerTable]): Either[String, ConversionPlan] =
    plan.spSchema.get(spTable) match {
      case None => Left(s"unknown table $spTable")
      case Some(t) => f(t).map(nt =>
        plan.copy(spSchema = plan.spSchema + (spTable -> nt)))
    }

  /** Remove a column (web.go:509-560: PK columns can't be removed; FK
    * use must be dropped first). */
  def removeColumn(plan: ConversionPlan, spTable: String,
      col: String): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      if (!t.colDefs.contains(col)) Left(s"unknown column $col")
      else if (t.pks.exists(_.column == col))
        Left(s"column $col is part of the primary key")
      else if (t.fks.exists(_.columns.contains(col)))
        Left(s"column $col is part of a foreign key; drop the FK first")
      else Right(t.copy(
        colNames = t.colNames.filterNot(_ == col),
        colDefs = t.colDefs - col,
        indexes = t.indexes.filterNot(_.keys.exists(_.column == col))))
    }.map { p =>
      // also drop the src→sp mapping — a staged data-only run resolves
      // columns through it, and a dangling entry made convertTable throw
      // on sp.colDefs(removedCol)
      p.copy(toSpannerCols = p.toSpannerCols.map { case (srcT, m) =>
        srcT -> (if (p.toSpannerTable.get(srcT).contains(spTable))
          m.filterNot { case (_, sp) => sp == col }
        else m)
      })
    }

  /** Rename a column everywhere it appears (cols, PK, FK, indexes, and
    * the source→Spanner column map — the data pass resolves through it). */
  def renameColumn(plan: ConversionPlan, spTable: String, col: String,
      to: String): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      if (!t.colDefs.contains(col)) Left(s"unknown column $col")
      else if (t.colDefs.contains(to)) Left(s"column $to already exists")
      else if (!NameRegistry.fixName(to)._2 && to.nonEmpty) {
        def rk(k: SrcKey) = if (k.column == col) k.copy(column = to) else k
        Right(t.copy(
          colNames = t.colNames.map(c => if (c == col) to else c),
          colDefs = (t.colDefs - col) + (to -> t.colDefs(col).copy(name = to)),
          pks = t.pks.map(rk),
          fks = t.fks.map(fk => fk.copy(
            columns = fk.columns.map(c => if (c == col) to else c))),
          indexes = t.indexes.map(ix => ix.copy(keys = ix.keys.map(rk)))))
      } else Left(s"illegal Spanner identifier: $to")
    }.map { p =>
      p.copy(toSpannerCols = p.toSpannerCols.map { case (srcT, m) =>
        srcT -> (if (p.toSpannerTable.get(srcT).contains(spTable))
          m.map { case (s, sp) => s -> (if (sp == col) to else sp) }
        else m)
      })
    }

  /** Change a column's Spanner type (web.go:302-389 typemap/table). */
  def changeType(plan: ConversionPlan, spTable: String, col: String,
      to: SpType): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      t.colDefs.get(col) match {
        case None => Left(s"unknown column $col")
        case Some(d) => Right(t.copy(colDefs =
          t.colDefs + (col -> d.copy(t = to))))
      }
    }

  def setNotNull(plan: ConversionPlan, spTable: String, col: String,
      notNull: Boolean): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      t.colDefs.get(col) match {
        case None => Left(s"unknown column $col")
        case Some(d) => Right(t.copy(colDefs =
          t.colDefs + (col -> d.copy(notNull = notNull))))
      }
    }

  def addForeignKey(plan: ConversionPlan, spTable: String,
      fk: SrcForeignKey): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      if (!plan.spSchema.contains(fk.referTable))
        Left(s"unknown refer table ${fk.referTable}")
      else if (t.fks.exists(_.name == fk.name) && fk.name.nonEmpty)
        Left(s"duplicate FK name ${fk.name}")
      else if (fk.columns.exists(c => !t.colDefs.contains(c)))
        Left("FK references unknown columns")
      else Right(t.copy(fks = t.fks :+ fk))
    }

  def dropForeignKey(plan: ConversionPlan, spTable: String,
      name: String): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      if (!t.fks.exists(_.name == name)) Left(s"unknown FK $name")
      else Right(t.copy(fks = t.fks.filterNot(_.name == name)))
    }

  def addIndex(plan: ConversionPlan, spTable: String,
      ix: SrcIndex): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      if (ix.keys.exists(k => !t.colDefs.contains(k.column)))
        Left("index references unknown columns")
      else if (usedNames(plan).contains(ix.name.toLowerCase))
        // tables, indexes, and FK names share one Spanner namespace
        // (web.go:912-931 isUniqueName gates addIndexes the same way)
        Left(s"name ${ix.name} already in use")
      else Right(t.copy(indexes = t.indexes :+ ix))
    }

  def dropIndex(plan: ConversionPlan, spTable: String,
      name: String): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      if (!t.indexes.exists(_.name == name)) Left(s"unknown index $name")
      else Right(t.copy(indexes = t.indexes.filterNot(_.name == name)))
    }

  /** Names already taken in the Spanner constraint namespace — tables,
    * secondary indexes, and FK constraint names share it
    * (web.go:714-743 canRename / web.go:912-931 isUniqueName). */
  private def usedNames(plan: ConversionPlan): Set[String] =
    (plan.spSchema.keysIterator ++
      plan.spSchema.valuesIterator.flatMap(t =>
        t.indexes.iterator.map(_.name) ++ t.fks.iterator.map(_.name)))
      .map(_.toLowerCase).toSet

  /** Validity + global-uniqueness gate shared by the constraint renames
    * (web.go:702-743): every new name a legal Spanner id, no duplicates
    * within the request, none already used by a table/index/FK.
    * `vacated` must be ONLY the names the rename actually frees (the
    * target table's matching old FK/index names) — subtracting every
    * request key would let a stray key naming an unrelated table/index
    * unblock a real collision. */
  private def checkRenames(plan: ConversionPlan,
      renames: Map[String, String],
      vacated: Set[String]): Either[String, Unit] = {
    val news = renames.values.map(_.toLowerCase).toSeq
    val illegal = renames.values.filter(n => NameRegistry.fixName(n)._2 || n.isEmpty)
    if (illegal.nonEmpty)
      Left(s"not valid Spanner identifiers: ${illegal.mkString(",")}")
    else if (news.distinct.length != news.length)
      Left(s"found duplicate names in input: ${news.mkString(",")}")
    else {
      val used = usedNames(plan) -- vacated.map(_.toLowerCase)
      val taken = news.filter(used.contains)
      if (taken.nonEmpty) Left(s"names already in use: ${taken.mkString(",")}")
      else Right(())
    }
  }

  /** Rename FK constraints of one table (web.go:539-599). Unknown old
    * names are ignored, like the reference (it maps over existing FKs). */
  def renameForeignKeys(plan: ConversionPlan, spTable: String,
      renames: Map[String, String]): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      val vacated = t.fks.map(_.name).filter(renames.contains).toSet
      checkRenames(plan, renames, vacated).map { _ =>
        t.copy(fks = t.fks.map(fk =>
          renames.get(fk.name).map(n => fk.copy(name = n)).getOrElse(fk)))
      }
    }

  /** Rename secondary indexes of one table (web.go:601-656). */
  def renameIndexes(plan: ConversionPlan, spTable: String,
      renames: Map[String, String]): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      val vacated = t.indexes.map(_.name).filter(renames.contains).toSet
      checkRenames(plan, renames, vacated).map { _ =>
        t.copy(indexes = t.indexes.map(ix =>
          renames.get(ix.name).map(n => ix.copy(name = n)).getOrElse(ix)))
      }
    }

  /** Interleave edit (web.go:449-507 setparent): validates with the same
    * prefix rule as the automatic detector. */
  def setParent(plan: ConversionPlan, spTable: String): Either[String, ConversionPlan] =
    withTable(plan, spTable) { t =>
      if (plan.syntheticPks.contains(spTable)) Left("table has a synthetic PK")
      else t.fks.zipWithIndex.collectFirst {
        case (fk, i) if plan.spSchema.contains(fk.referTable) &&
            !plan.syntheticPks.contains(fk.referTable) &&
            Interleave.convertible(t, plan.spSchema(fk.referTable), fk) => (fk, i)
      } match {
        case Some((fk, i)) => Right(t.copy(parent = Some(fk.referTable),
          fks = t.fks.patch(i, Nil, 1)))
        case None => Left("no valid interleave prefix")
      }
    }
}
