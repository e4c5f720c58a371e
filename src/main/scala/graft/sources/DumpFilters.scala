package graft.sources

import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull, IsNull}

/** Source-filter pushdown shared by the dump V2 sources.
  *
  * The readers evaluate a conservative subset — `EqualTo(col, string)`,
  * `IsNotNull(col)`, `IsNull(col)` on data columns — against the raw
  * (unescaped) field values BEFORE building an InternalRow, so a
  * selective predicate skips the per-row allocation work for
  * non-matching lines. Pushdown is best-effort: the ScanBuilder still
  * returns every filter as residual, so Spark re-applies them after the
  * scan and correctness never depends on the reader's evaluation —
  * `pushedFilters` is reported for the plan (visible as PushedFilters
  * in explain) and acts purely as an early skip. */
object DumpFilters {

  /** (column index, op, comparand): op 0 = equals, 1 = is-not-null,
    * 2 = is-null. */
  final case class Pushed(colIdx: Int, op: Int, value: String)
    extends Serializable

  /** The subset of `filters` the readers can evaluate, compiled against
    * the column order. Returns (compiled, the matching source Filters). */
  def compile(filters: Array[Filter],
      cols: Seq[String]): (Array[Pushed], Array[Filter]) = {
    val compiled = Array.newBuilder[Pushed]
    val accepted = Array.newBuilder[Filter]
    filters.foreach {
      case f @ EqualTo(attr, v: String) if cols.contains(attr) =>
        compiled += Pushed(cols.indexOf(attr), 0, v); accepted += f
      case f @ IsNotNull(attr) if cols.contains(attr) =>
        compiled += Pushed(cols.indexOf(attr), 1, null); accepted += f
      case f @ IsNull(attr) if cols.contains(attr) =>
        compiled += Pushed(cols.indexOf(attr), 2, null); accepted += f
      case _ =>
    }
    (compiled.result(), accepted.result())
  }

  /** True when the row (a raw-value accessor: column index → unescaped
    * string or null) satisfies every pushed filter. */
  def matches(pushed: Array[Pushed], value: Int => String): Boolean = {
    var i = 0
    while (i < pushed.length) {
      val p = pushed(i)
      val v = value(p.colIdx)
      val ok = p.op match {
        case 0 => v != null && v == p.value
        case 1 => v != null
        case _ => v == null
      }
      if (!ok) return false
      i += 1
    }
    true
  }
}
