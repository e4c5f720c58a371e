package graft.schema

import scala.collection.mutable

/** Spanner-legal identifier mangling + collision-safe allocation
  * (reference: internal/fixname.go:32-42, internal/mapping.go:33-186).
  *
  * Inherently sequential — runs driver-side over the (small) schema,
  * never distributed (SURVEY.md §7.4).
  */
object NameRegistry {
  private val legal = "^[a-zA-Z][a-zA-Z0-9_]*$".r

  /** Returns a Spanner-acceptable name and whether it changed: first char
    * outside [a-zA-Z] → 'A', other illegal chars → '_'. */
  def fixName(name: String): (String, Boolean) = {
    if (legal.matches(name)) (name, false)
    else if (name.isEmpty) ("BogusEmptyId", true)
    else {
      // ASCII-only [a-zA-Z] exactly (Char.isLetter would admit Unicode).
      def ascii(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      val head = if (ascii(name.head)) name.head.toString else "A"
      val tail = name.tail.map(c =>
        if (ascii(c) || c.isDigit && c <= '9' || c == '_') c else '_')
      (head + tail, true)
    }
  }

  /** Globally-unique id allocation for FK/index names: fix, then postfix
    * `_N` starting at |used| until free (internal/mapping.go:147-186). */
  def spannerId(srcId: String, used: mutable.Set[String]): String = {
    var name = fixName(srcId)._1
    if (used.contains(name)) {
      var id = used.size
      var candidate = s"${name}_$id"
      while (used.contains(candidate)) { id += 1; candidate = s"${name}_$id" }
      name = candidate
    }
    used += name
    name
  }

  /** FK names may be empty (unnamed constraints) → stay empty. */
  def spannerForeignKey(srcId: String, used: mutable.Set[String]): String =
    if (srcId.isEmpty) "" else spannerId(srcId, used)
}

/** Bidirectional source↔Spanner name maps for tables and columns
  * (reference: internal/mapping.go:33-145). Consistent: the same source
  * name always maps to the same Spanner name. */
final class NameRegistry {
  import NameRegistry._

  /** srcTable → (spTable, srcCol → spCol) */
  private val toSpannerM = mutable.LinkedHashMap.empty[String, (String, mutable.LinkedHashMap[String, String])]
  /** spTable → (srcTable, spCol → srcCol) */
  private val toSourceM = mutable.LinkedHashMap.empty[String, (String, mutable.LinkedHashMap[String, String])]

  def spannerTables: Seq[String] = toSourceM.keys.toSeq
  def toSpannerTable(src: String): Option[String] = toSpannerM.get(src).map(_._1)
  def toSourceTable(sp: String): Option[String] = toSourceM.get(sp).map(_._1)
  def colsOf(spTable: String): collection.Map[String, String] =
    toSourceM.get(spTable).map(_._2).getOrElse(mutable.LinkedHashMap.empty)

  /** Legal, collision-free, consistent Spanner table name. */
  def spannerTable(srcTable: String): Either[String, String] = {
    if (srcTable.isEmpty) Left("bad parameter: table string is empty")
    else toSpannerM.get(srcTable) match {
      case Some((sp, _)) => Right(sp)
      case None =>
        var sp = fixName(srcTable)._1
        if (toSourceM.contains(sp)) {
          var id = toSpannerM.size
          var candidate = s"${sp}_$id"
          while (toSourceM.contains(candidate)) { id += 1; candidate = s"${sp}_$id" }
          sp = candidate
        }
        toSpannerM(srcTable) = (sp, mutable.LinkedHashMap.empty)
        toSourceM(sp) = (srcTable, mutable.LinkedHashMap.empty)
        Right(sp)
    }
  }

  /** Legal, per-table-collision-free, consistent Spanner column name. */
  def spannerCol(srcTable: String, srcCol: String,
      mustExist: Boolean = false): Either[String, String] = {
    if (srcTable.isEmpty) Left("bad parameter: table string is empty")
    else if (srcCol.isEmpty) Left("bad parameter: col string is empty")
    else toSpannerM.get(srcTable) match {
      case None => Left(s"unknown table $srcTable")
      case Some((spTable, cols)) =>
        cols.get(srcCol) match {
          case Some(sp) => Right(sp)
          case None if mustExist => Left(s"table $srcTable does not have a column $srcCol")
          case None =>
            val reverse = toSourceM(spTable)._2
            var sp = fixName(srcCol)._1
            if (reverse.contains(sp)) {
              var id = cols.size
              var candidate = s"${sp}_$id"
              while (reverse.contains(candidate)) { id += 1; candidate = s"${sp}_$id" }
              sp = candidate
            }
            cols(srcCol) = sp
            reverse(sp) = srcCol
            Right(sp)
        }
    }
  }

  def spannerCols(srcTable: String, srcCols: Seq[String]): Either[String, Seq[String]] = {
    val out = srcCols.map(spannerCol(srcTable, _))
    out.collectFirst { case Left(e) => Left(e) }.getOrElse(Right(out.map(_.toOption.get)))
  }
}
