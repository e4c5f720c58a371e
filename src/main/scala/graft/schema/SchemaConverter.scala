package graft.schema

import graft.types._
import scala.collection.mutable

/** Source schema → Spanner schema (reference: postgres/toddl.go:30-101 +
  * internal/convert.go:253-287 AddPrimaryKeys + mapping/ResolveRefs).
  *
  * Pure driver-side planning: the output `ConversionPlan` is immutable and
  * is all the data pass needs (the reference's mutable `Conv` hub split
  * into plan + runtime accumulators, SURVEY.md §1.1).
  */
object SchemaConverter {

  final case class ConversionPlan(
      srcSchema: Map[String, SourceTable],
      spSchema: Map[String, SpannerTable],
      tableOrder: Seq[String],              // spanner names, source order
      toSpannerTable: Map[String, String],  // src → spanner
      toSpannerCols: Map[String, Map[String, String]], // src table → src col → sp col
      syntheticPks: Map[String, String],    // spanner table → synth col
      issues: Map[String, Map[String, Seq[Issue]]], // src table → col → issues
      timezone: Option[String],
      notes: Seq[String])

  def convert(mapper: TypeMapper, tables: Map[String, SourceTable],
      order: Seq[String], timezone: Option[String] = None): ConversionPlan = {
    val reg = new NameRegistry
    val usedIds = mutable.Set.empty[String]
    // Seed the global FK/index namespace with table names
    // (postgres/toddl.go:36-47: Spanner constraint ids share a namespace).
    val spNames = order.map { src =>
      val sp = reg.spannerTable(src).toOption.get
      usedIds += sp
      src -> sp
    }
    val notes = Seq.newBuilder[String]
    val issues = mutable.LinkedHashMap.empty[String, Map[String, Seq[Issue]]]
    val synths = mutable.LinkedHashMap.empty[String, String]

    val sp0 = spNames.map { case (srcName, spName) =>
      val src = tables(srcName)
      val colIssues = mutable.LinkedHashMap.empty[String, Seq[Issue]]
      val spCols = src.colNames.map { cn =>
        val c = src.colDefs(cn)
        val spCol = reg.spannerCol(srcName, cn).toOption.get
        val (ty, tyIssues) = mapper.toSpanner(c.tpe)
        val all = tyIssues ++
          (if (c.ignored.default) Seq(Issue.DefaultValueIgnored) else Nil) ++
          (if (c.ignored.foreignKey) Seq(Issue.ForeignKeyIgnored) else Nil) ++
          (if (c.ignored.autoIncrement) Seq(Issue.AutoIncrementIgnored) else Nil)
        if (all.nonEmpty) colIssues(cn) = all
        spCol -> SpColumn(spCol, ty, notNull = c.notNull,
          comment = s"From: $cn ${c.tpe.print}")
      }
      if (colIssues.nonEmpty) issues(srcName) = colIssues.toMap

      def mapKey(k: SrcKey) = SrcKey(reg.spannerCol(srcName, k.column).toOption.get, k.desc)
      val fks = src.foreignKeys.map { fk =>
        SrcForeignKey(
          NameRegistry.spannerForeignKey(fk.name, usedIds),
          fk.columns.map(c => reg.spannerCol(srcName, c).toOption.get),
          fk.referTable, // resolved against spanner names below
          fk.referColumns)
      }
      val indexes = src.indexes.map { ix =>
        SrcIndex(NameRegistry.spannerId(ix.name, usedIds), ix.unique, ix.keys.map(mapKey))
      }
      // UNIQUE columns become unique indexes (pgdump constraint extraction)
      val uniqueIdx = src.colNames.filter(c => src.colDefs(c).unique &&
          !src.primaryKeys.exists(_.column == c) &&
          !src.indexes.exists(_.keys.map(_.column) == Seq(c)))
        .map { c =>
          val spc = reg.spannerCol(srcName, c).toOption.get
          SrcIndex(NameRegistry.spannerId(s"${spName}_${spc}_uq", usedIds),
            unique = true, Seq(SrcKey(spc)))
        }

      spName -> SpannerTable(
        name = spName,
        colNames = spCols.map(_._1),
        colDefs = spCols.toMap,
        pks = src.primaryKeys.map(mapKey),
        fks = fks,
        indexes = indexes ++ uniqueIdx,
        comment = s"Spanner schema for source table $srcName")
    }.toMap

    // FK refer-tables still carry source names: translate then resolve.
    val srcToSp = spNames.toMap
    val translated = sp0.map { case (n, t) =>
      n -> t.copy(fks = t.fks.map { fk =>
        val refSp = srcToSp.getOrElse(fk.referTable, fk.referTable)
        // mustExist: an unresolvable refer-column (e.g. case mismatch)
        // must pass through unchanged for RefResolver's case-insensitive
        // fallback — without it the lookup would allocate a phantom
        // column mapping in the registry for the referenced table.
        val refCols = fk.referColumns.map { c =>
          reg.toSourceTable(refSp)
            .flatMap(srcT => reg.spannerCol(srcT, c, mustExist = true).toOption)
            .getOrElse(c)
        }
        fk.copy(referTable = refSp, referColumns = refCols)
      })
    }
    val (resolved, dropNotes) = RefResolver.resolveRefs(translated)
    notes ++= dropNotes

    // Synthetic PKs for PK-less tables (internal/convert.go:253-287).
    val withPks = resolved.map { case (n, t) =>
      if (t.pks.nonEmpty) n -> t
      else {
        var key = "synth_id"
        var i = 0
        while (t.colDefs.contains(key)) { key = s"synth_id$i"; i += 1 }
        synths(n) = key
        n -> t.copy(
          colNames = t.colNames :+ key,
          colDefs = t.colDefs + (key -> SpColumn(key, SpType(SpScalar.Int64))),
          pks = Seq(SrcKey(key)))
      }
    }

    ConversionPlan(
      srcSchema = tables,
      spSchema = withPks,
      tableOrder = spNames.map(_._2),
      toSpannerTable = srcToSp,
      toSpannerCols = order.map(s => s -> reg.colsOf(srcToSp(s)).map(_.swap).toMap).toMap,
      syntheticPks = synths.toMap,
      issues = issues.toMap,
      timezone = timezone,
      notes = notes.result())
  }
}
