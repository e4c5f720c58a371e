package graft.schema

/** T7: FK → INTERLEAVE IN PARENT rewrite (reference: web/web.go:474-507
  * parentTableHelper + web.go:897-910 checkPrimaryKeyPrefix).
  *
  * A foreign key is convertible when (strictly, as the reference checks):
  *   - neither child nor parent has a synthetic PK;
  *   - for every parent-PK position i: the parent PK column, the child PK
  *     column, the FK column, and the FK refer-column at i are all the
  *     SAME name (child PK must extend the parent PK by name);
  *   - the child PK has at least as many columns as the parent PK.
  * The first suitable FK wins; it is removed and Parent is set.
  */
object Interleave {

  def convertible(child: SpannerTable, parent: SpannerTable,
      fk: SrcForeignKey): Boolean = {
    val childPks = child.pks.map(_.column)
    val parentPks = parent.pks.map(_.column)
    parentPks.nonEmpty && childPks.length >= parentPks.length &&
      parentPks.zipWithIndex.forall { case (pk, i) =>
        i < fk.referColumns.length &&
          fk.referColumns(i) == pk &&
          childPks(i) == pk &&
          fk.columns(i) == fk.referColumns(i)
      }
  }

  /** Apply the rewrite across a schema; returns the new schema plus notes
    * describing each conversion. */
  def detect(schema: Map[String, SpannerTable],
      syntheticPks: Map[String, String]): (Map[String, SpannerTable], Seq[String]) = {
    val notes = Seq.newBuilder[String]
    val out = schema.map { case (name, t) =>
      if (t.parent.nonEmpty || syntheticPks.contains(name)) name -> t
      else {
        t.fks.zipWithIndex.collectFirst {
          case (fk, i) if !syntheticPks.contains(fk.referTable) &&
              schema.contains(fk.referTable) &&
              convertible(t, schema(fk.referTable), fk) => (fk, i)
        } match {
          case Some((fk, i)) =>
            notes += s"table $name interleaved in ${fk.referTable} (was FK ${fk.name})"
            name -> t.copy(parent = Some(fk.referTable),
              fks = t.fks.patch(i, Nil, 1))
          case None => name -> t
        }
      }
    }
    (out, notes.result())
  }
}
