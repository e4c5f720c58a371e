package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.util.LineReader
import org.apache.hadoop.io.Text
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** INSERT-statement indexing and reading shared by the dump V2 sources
  * (pgdump's --inserts rows and mysqldump's extended INSERTs differ only
  * in lexer and exclusion ranges — everything else here is identical by
  * construction). */
object DumpInserts {

  /** Per-table INSERT metadata: every DISTINCT column-list variant in
    * first-seen order (one = normal; more = the statements disagree and
    * colsFor must refuse rather than positionally mis-map), the [min,
    * max] byte extent of the statement line starts, and the total
    * statement byte length (the scan-size statistic). */
  final case class Index(
      colVariants: Map[String, Seq[Option[Seq[String]]]],
      extents: Map[String, (Long, Long)],
      bytes: Map[String, Long])

  val SEP = ""

  /** Driver-side fold of the executor-aggregated
    * ((table, colsKey), (minOff, maxOff, byteLen)) rows. */
  def fold(headers: Array[((String, String), (Long, Long, Long))]): Index = {
    val variants = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Option[Seq[String]]]]
    val extents = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    val bytes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    headers.sortBy(_._2._1).foreach { case ((tbl, cols), (lo, hi, b)) =>
      val variant = Option(cols).map(_.split(SEP, -1).toSeq)
      val prev = variants.getOrElse(tbl, Nil)
      if (!prev.contains(variant)) variants(tbl) = prev :+ variant
      val pe = extents.getOrElse(tbl, (Long.MaxValue, Long.MinValue))
      extents(tbl) = (math.min(pe._1, lo), math.max(pe._2, hi))
      bytes(tbl) = bytes.getOrElse(tbl, 0L) + b
    }
    Index(variants.toMap, extents.toMap, bytes.toMap)
  }

  /** Chunk [lo, hi) minus a set of excluded [a, b] line-start ranges
    * (COPY payload regions / DELIMITER blocks), tiled at `step`. Each
    * surviving sub-range keeps the reader's discard-first-line rule
    * sound: a piece ending at `a` emits no line starting after `a`
    * (the boundary line itself is classified away), and a piece
    * starting at `b` discards the boundary line and lands on the next
    * real line. */
  def chunkRanges(lo: Long, hi: Long, excluded: Seq[(Long, Long)],
      step: Long): Seq[(Long, Long)] = {
    val overlapping = excluded
      .filter(r => r._2 > lo && r._1 < hi).sortBy(_._1)
    val pieces = Seq.newBuilder[(Long, Long)]
    var cur = lo
    overlapping.foreach { case (a, b) =>
      if (a > cur) pieces += ((cur, math.min(a, hi)))
      cur = math.max(cur, b)
    }
    if (cur < hi) pieces += ((cur, hi))
    val out = Seq.newBuilder[(Long, Long)]
    pieces.result().foreach { case (s0, e0) =>
      var s = s0
      while (s < e0) {
        val e = math.min(s + step, e0)
        out += ((s, e))
        s = e
      }
    }
    out.result()
  }

  /** Quote-aware statement-completion scanner: feed lines one at a
    * time; `feed` returns true when a top-level `;` (outside quotes)
    * terminates the statement — possibly lines after it started. Each
    * factory mirrors its dialect's SEQUENTIAL parser's assembly rules
    * EXACTLY (same quote chars, same escape handling), so the V2
    * readers and the driver-side scanner agree on where every
    * statement ends:
    *   - pg   — single quotes only ('' doubling = two toggles),
    *            PgDumpParser.parseIndexed's char scan;
    *   - mysql — single quotes with backslash escapes + backtick
    *            identifiers, MySqlDumpParser.parse's char scan. */
  final class StmtScanner private (trackBacktick: Boolean,
      backslashInSingle: Boolean) {
    private var inQ = false
    private var inBt = false
    def feed(line: String): Boolean = {
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '\\' && backslashInSingle && inQ) i += 1
        else if (c == '\'' && !inBt) inQ = !inQ
        else if (c == '`' && trackBacktick && !inQ) inBt = !inBt
        else if (c == ';' && !inQ && !inBt) return true
        i += 1
      }
      false
    }
  }
  object StmtScanner {
    def pg(): StmtScanner = new StmtScanner(false, false)
    def mysql(): StmtScanner = new StmtScanner(true, true)
  }

  /** Streams one byte chunk's INSERT tuples. Hadoop split semantics
    * (seek, discard the first possibly-partial line unless at offset 0,
    * emit lines whose start is <= end); `excluded` ranges are skipped
    * strictly-inside (boundary lines are never statements).
    *
    * Statements may SPAN LINES (`--column-inserts`-style wrapped
    * tuples, string values with embedded newlines — the reference's
    * chunked parser handles these, mysql/mysqldump.go:80-125): a line
    * `isStart` accepts opens a statement, continuation lines are
    * appended until `newScanner()`'s quote-state scan sees the
    * terminating top-level `;`, and the JOINED statement goes to `lex`.
    * Exactly-once across chunks follows the same rule as straddling
    * lines: the chunk containing the START consumes the whole statement
    * (even past `end`); a reader seeking into the middle discards its
    * first partial line and then skips continuation lines because they
    * don't satisfy `isStart`. (The unavoidable residual ambiguity — a
    * quoted string value containing a newline followed by text that
    * mimics an INSERT header at line start — is shared with every
    * line-resynced chunk parser, the reference's included.)
    *
    * `isStart`/`lex` must accept EXACTLY the statements discovery
    * indexed, or extent/stats and served rows drift apart. Pushed
    * filters are evaluated on the raw tuple values before row
    * construction. */
  final class TupleReader(path: String, conf: SerializableConfiguration,
      start: Long, end: Long, excluded: Array[(Long, Long)], nCols: Int,
      proj: Array[Int], pushed: Array[DumpFilters.Pushed],
      isStart: String => Boolean,
      newScanner: () => StmtScanner,
      lex: String => Iterator[Seq[String]])
      extends PartitionReader[InternalRow] {
    private val in = {
      val p = new Path(path)
      val stream = p.getFileSystem(conf.value).open(p)
      stream.seek(start)
      stream
    }
    private val lines = new LineReader(in)
    private val text = new Text()
    private var pos =
      if (start == 0) 0L else start + lines.readLine(text) // discard partial
    private var tuples: Iterator[Seq[String]] = Iterator.empty
    private var row: InternalRow = _

    private def inExcluded(off: Long): Boolean = {
      var i = 0
      while (i < excluded.length) {
        if (off > excluded(i)._1 && off < excluded(i)._2) return true
        i += 1
      }
      false
    }

    override def next(): Boolean = {
      while (true) {
        while (!tuples.hasNext) {
          if (pos > end) return false
          val lineStart = pos
          val consumed = lines.readLine(text)
          if (consumed == 0) return false
          pos += consumed
          if (!inExcluded(lineStart)) {
            val first = text.toString
            if (isStart(first)) {
              val sc = newScanner()
              if (sc.feed(first)) tuples = lex(first)
              else {
                // multi-line statement: consume continuation lines (past
                // `end` if need be — the start-owning chunk serves the
                // whole statement) until the top-level ';' or EOF
                val sb = new java.lang.StringBuilder(first)
                var more = lines.readLine(text)
                var done = more == 0
                while (!done) {
                  pos += more
                  sb.append('\n').append(text.toString)
                  done = sc.feed(text.toString)
                  if (!done) { more = lines.readLine(text); done = more == 0 }
                }
                tuples = lex(sb.toString)
              }
            }
          }
        }
        val t = tuples.next()
        if (DumpFilters.matches(pushed,
            idx => if (idx >= t.length) null else t(idx))) {
          val vals = new Array[Any](proj.length)
          var j = 0
          while (j < proj.length) {
            val k = proj(j)
            vals(j) =
              if (k < 0) t.length != nCols // __ragged
              else if (k >= t.length || t(k) == null) null
              else UTF8String.fromString(t(k))
            j += 1
          }
          row = new GenericInternalRow(vals)
          return true
        }
      }
      false
    }

    override def get(): InternalRow = row
    override def close(): Unit = { lines.close(); in.close() }
  }
}
