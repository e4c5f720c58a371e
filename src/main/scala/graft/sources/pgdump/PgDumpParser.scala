package graft.sources.pgdump

import graft.schema._
import graft.types.SrcType
import scala.collection.mutable

/** Driver-side pg_dump schema pass (reference: postgres/pgdump.go:50-120,
  * 267-315,600-649). Streams the dump once, interprets schema statements,
  * and records the LINE RANGES of COPY data blocks — the data itself is
  * never materialized here. The data pass (PgDumpReader) then reads those
  * ranges distributed via spark.read.text. This mirrors the reference's
  * two-pass design with the expensive pass parallelized:
  * schema statements are a few KB; COPY payloads are the 100 GB part.
  *
  * The reference leans on pg_query_go (a full PostgreSQL grammar); this
  * interprets the regular, machine-generated subset pg_dump emits:
  * CREATE TABLE, ALTER TABLE ADD CONSTRAINT (PK/FK/UNIQUE/CHECK),
  * CREATE [UNIQUE] INDEX, SET timezone, COPY ... FROM stdin, INSERT.
  */
object PgDumpParser {

  /** One COPY payload: table + column list + [startLine, endLine) of the
    * data rows within the dump file (0-based, exclusive end). */
  final case class CopyBlock(table: String, cols: Seq[String],
      startLine: Long, endLine: Long)

  final case class DumpSchema(
      tables: Map[String, SourceTable],
      tableOrder: Seq[String],
      copyBlocks: Seq[CopyBlock],
      /** tables with INSERT data → column list when the dump names one.
        * Row data is NOT held here — the data pass reads INSERT lines
        * distributed (PgDumpReader.readInsertRaw), so a 100 GB
        * --inserts dump never accumulates on the driver. */
      insertCols: Map[String, Option[Seq[String]]],
      timezone: Option[String],
      statementStats: Map[String, Long],
      unparseable: Seq[String])

  // ------------------------------------------------------------ scanning

  /** Statement boundary scanner: splits on top-level `;` (single-quote
    * aware, `''` escape) and treats COPY ... FROM stdin payloads as
    * opaque line ranges terminated by `\.` (pgdump.go:88-152). */
  def parse(lines: Iterator[String]): DumpSchema =
    parseIndexed(lines.zipWithIndex.map { case (l, i) => (l, i.toLong) })

  /** True for a complete single-line INSERT statement — the distributed
    * schema pass prunes exactly these from the driver's statement stream
    * and aggregates their headers on executors. The predicate must parse
    * the header: a prefix-only match would prune a statement the driver
    * parser can't account for. */
  private[pgdump] def prunableInsert(line: String): Boolean =
    line.regionMatches(true, 0, "INSERT INTO ", 0, 12) &&
      line.trim.endsWith(";") && PgTuples.header(line).isDefined

  /** True for a line that STARTS an INSERT statement, terminated on this
    * line or not — the V2 discovery/reader classifier, which assembles
    * wrapped statements itself. [[prunableInsert]] (complete single-line
    * statements only) stays the schema-pass pruning predicate: pruning
    * just the first line of a wrapped statement would orphan its
    * continuation lines in the driver's statement stream. */
  private[pgdump] def insertStart(line: String): Boolean =
    line.regionMatches(true, 0, "INSERT INTO ", 0, 12) &&
      PgTuples.startHeader(line).isDefined

  /** (unqualified table, column list when present) of a single-line COPY
    * header — the V2 source's boundary classifier shares the scanner's
    * header grammar. */
  private[pgdump] def copyHeaderOf(stmt: String): Option[(String, Option[Seq[String]])] =
    CopyHeader.unapply(stmt)

  /** The scanner over (line, ORIGINAL line number) pairs: the distributed
    * schema pass feeds a pruned stream (COPY payload + single-line INSERT
    * statements removed) whose indices still address the real file, so
    * CopyBlock ranges stay correct. */
  def parseIndexed(lines: Iterator[(String, Long)]): DumpSchema = {
    val tables = mutable.LinkedHashMap.empty[String, SourceTable]
    val copies = mutable.ArrayBuffer.empty[CopyBlock]
    val inserts = mutable.LinkedHashMap.empty[String, Option[Seq[String]]]
    val stats = mutable.LinkedHashMap.empty[String, Long].withDefaultValue(0L)
    val bad = mutable.ArrayBuffer.empty[String]
    var timezone: Option[String] = None

    val sb = new StringBuilder
    var inQuote = false
    var lineNo = -1L
    var copyOf: Option[(String, Seq[String])] = None
    var copyStart = 0L

    def endStatement(): Unit = {
      val stmt = sb.toString.trim
      sb.clear()
      if (stmt.isEmpty) return
      interpret(stmt, tables, inserts, stats, bad) match {
        case Some(tz) => timezone = Some(tz)
        case None     =>
      }
    }

    val it = lines
    while (it.hasNext) {
      val (line, idx) = it.next()
      lineNo = idx
      copyOf match {
        case Some((tbl, cols)) =>
          if (line == "\\.") {
            if (tables.contains(tbl)) {
              copies += CopyBlock(tbl, cols, copyStart, lineNo)
              stats("copy") += 1
            }
            copyOf = None
          }
        case None =>
          val stripped = line.trim
          if (stripped.startsWith("--") && sb.isEmpty) {
            // comment line between statements
          } else {
            // char scan for statement end, honoring single quotes
            var i = 0
            while (i < line.length) {
              val c = line.charAt(i)
              if (c == '\'') inQuote = !inQuote
              sb.append(c)
              if (c == ';' && !inQuote) {
                val stmt = sb.toString.trim
                CopyHeader.unapply(stmt) match {
                  case Some((tbl, colsOpt)) =>
                    sb.clear()
                    if (!tables.contains(tbl)) {
                      bad += s"COPY for unknown table $tbl"
                      stats("skipped") += 1
                    }
                    val cols = colsOpt.getOrElse(
                      tables.get(tbl).map(_.colNames).getOrElse(Seq.empty))
                    // consume the payload either way: data lines must
                    // never leak into the statement stream
                    copyOf = Some((tbl, cols))
                    copyStart = lineNo + 1
                    i = line.length // payload starts on the next line
                  case None => endStatement()
                }
              }
              i += 1
            }
            if (sb.nonEmpty) sb.append('\n')
          }
      }
    }
    endStatement()

    DumpSchema(
      tables = tables.toMap,
      tableOrder = tables.keys.toSeq,
      copyBlocks = copies.toSeq,
      insertCols = inserts.toMap,
      timezone = timezone,
      statementStats = stats.toMap,
      unparseable = bad.toSeq)
  }

  private object CopyHeader {
    // Column list optional: a legal column-less `COPY t FROM stdin;`
    // defaults to the table's schema column order; either way the header
    // must be recognized so the payload never leaks into the statement
    // scanner as garbage statements.
    private val re =
      """(?is)^COPY\s+(.+?)\s*(?:\(([^)]*)\))?\s+FROM\s+stdin\s*;$""".r
    def unapply(stmt: String): Option[(String, Option[Seq[String]])] = stmt match {
      case re(tbl, cols) =>
        Some((unqualify(tbl),
          Option(cols).map(_.split(",").map(unquoteId).toSeq)))
      case _ => None
    }
  }

  // -------------------------------------------------------- interpreting

  /** Returns Some(timezone) for SET timezone, None otherwise. */
  private def interpret(stmt: String,
      tables: mutable.LinkedHashMap[String, SourceTable],
      inserts: mutable.LinkedHashMap[String, Option[Seq[String]]],
      stats: mutable.Map[String, Long],
      bad: mutable.ArrayBuffer[String]): Option[String] = {
    val upper = stmt.toUpperCase
    if (upper.startsWith("SET")) {
      stats("set") += 1
      val tz = """(?is)^SET\s+time\s*zone\s*(?:=|TO)?\s*'([^']*)'\s*;?$""".r
      stmt match { case tz(z) => return Some(z); case _ => }
      val tz2 = """(?is)^SET\s+timezone\s*(?:=|TO)?\s*'([^']*)'\s*;?$""".r
      stmt match { case tz2(z) => return Some(z); case _ => }
      None
    } else if (upper.startsWith("CREATE TABLE")) {
      stats("createTable") += 1
      parseCreateTable(stmt) match {
        case Some(t) => tables(t.name) = t
        case None    => bad += stmt.linesIterator.next()
      }
      None
    } else if (upper.startsWith("ALTER TABLE")) {
      stats("alterTable") += 1
      applyAlter(stmt, tables, bad)
      None
    } else if (upper.startsWith("CREATE INDEX") || upper.startsWith("CREATE UNIQUE INDEX")) {
      stats("createIndex") += 1
      applyCreateIndex(stmt, tables, bad)
      None
    } else if (upper.startsWith("INSERT")) {
      stats("insert") += 1
      PgTuples.header(stmt) match {
        case Some((tbl, colsOpt)) =>
          if (tables.contains(tbl)) inserts.getOrElseUpdate(tbl, colsOpt)
          else bad += s"INSERT for unknown table $tbl"
        case None => bad += stmt.take(60)
      }
      None
    } else {
      stats("skipped") += 1
      None
    }
  }

  // ------------------------------------------------------- CREATE TABLE

  private[pgdump] def parseCreateTable(stmt: String): Option[SourceTable] = {
    val re = """(?is)^CREATE\s+TABLE\s+([^(]+?)\s*\((.*)\)\s*;?$""".r
    stmt match {
      case re(rawName, body) =>
        val name = unqualify(rawName)
        val cols = mutable.ArrayBuffer.empty[SrcColumn]
        var pks = Seq.empty[SrcKey]
        splitTopLevel(body).map(_.trim).filter(_.nonEmpty).foreach { item =>
          val up = item.toUpperCase
          if (up.startsWith("PRIMARY KEY")) {
            pks = keyList(item)
          } else if (up.startsWith("CONSTRAINT") || up.startsWith("UNIQUE(") ||
                     up.startsWith("UNIQUE (") || up.startsWith("CHECK") ||
                     up.startsWith("FOREIGN KEY")) {
            // table-level constraints other than PK: recorded as ignored
          } else {
            parseColumnDef(item).foreach(cols += _)
          }
        }
        if (cols.isEmpty) None
        else Some(SourceTable(name, cols.map(_.name).toSeq,
          cols.map(c => c.name -> c).toMap, primaryKeys = pks))
      case _ => None
    }
  }

  /** One column definition: name, (possibly multi-word) type, modifiers,
    * array bounds, NOT NULL / PRIMARY KEY / UNIQUE / DEFAULT flags. */
  private[pgdump] def parseColumnDef(item: String): Option[SrcColumn] = {
    val (name, rest0) = takeIdentifier(item.trim)
    if (name.isEmpty) return None
    var rest = rest0.trim
    val up = rest.toUpperCase

    // Multi-word types first (longest match), then single-word.
    val multi = Seq("TIMESTAMP WITH TIME ZONE", "TIMESTAMP WITHOUT TIME ZONE",
      "DOUBLE PRECISION", "CHARACTER VARYING")
    val tyWords = multi.find(up.startsWith) match {
      case Some(m) => m.toLowerCase
      case None    => rest.takeWhile(c => !" (\t[".contains(c))
    }
    rest = rest.drop(tyWords.length).trim

    var mods = Seq.empty[Long]
    if (rest.startsWith("(")) {
      val inner = rest.substring(1, rest.indexOf(')'))
      mods = inner.split(",").map(_.trim.toLong).toSeq
      rest = rest.drop(rest.indexOf(')') + 1).trim
    }
    var arrayBounds = 0
    while (rest.startsWith("[]")) { arrayBounds += 1; rest = rest.drop(2).trim }

    val restUp = rest.toUpperCase
    val tpe = normalizeType(tyWords)
    Some(SrcColumn(
      name = name,
      tpe = SrcType(tpe, mods, arrayBounds),
      notNull = restUp.contains("NOT NULL") || restUp.contains("PRIMARY KEY"),
      unique = restUp.contains("UNIQUE") || restUp.contains("PRIMARY KEY"),
      ignored = Ignored(default = restUp.contains("DEFAULT"))))
  }

  /** pg_dump spells some types several ways; normalize to the names the
    * TypeMapper tables use (postgres/toddl.go:107-163 accepts both). */
  private def normalizeType(t: String): String = t.toLowerCase match {
    case "character varying" => "varchar"
    case "timestamp with time zone" => "timestamptz"
    case "timestamp without time zone" => "timestamp"
    case "double precision" => "float8"
    case "int" => "integer"
    case other => other
  }

  // -------------------------------------------------------------- ALTER

  private def applyAlter(stmt: String,
      tables: mutable.LinkedHashMap[String, SourceTable],
      bad: mutable.ArrayBuffer[String]): Unit = {
    val pk = """(?is)ALTER\s+TABLE\s+(?:ONLY\s+)?(.+?)\s+ADD\s+CONSTRAINT\s+(\S+)\s+PRIMARY\s+KEY\s*\(([^)]*)\)\s*;?""".r
    val fk = """(?is)ALTER\s+TABLE\s+(?:ONLY\s+)?(.+?)\s+ADD\s+CONSTRAINT\s+(\S+)\s+FOREIGN\s+KEY\s*\(([^)]*)\)\s+REFERENCES\s+([^(]+?)\s*\(([^)]*)\)[^;]*;?""".r
    val uq = """(?is)ALTER\s+TABLE\s+(?:ONLY\s+)?(.+?)\s+ADD\s+CONSTRAINT\s+(\S+)\s+UNIQUE\s*\(([^)]*)\)\s*;?""".r
    stmt match {
      case pk(tbl, _, cols) =>
        update(tables, unqualify(tbl), bad) { t =>
          val keys = cols.split(",").map(c => SrcKey(unquoteId(c))).toSeq
          // PK columns become NOT NULL (pgdump.go:600-649)
          val defs = t.colDefs.map { case (n, d) =>
            if (keys.exists(_.column == n)) n -> d.copy(notNull = true) else n -> d
          }
          t.copy(primaryKeys = keys, colDefs = defs)
        }
      case fk(tbl, cname, cols, refTbl, refCols) =>
        update(tables, unqualify(tbl), bad) { t =>
          t.copy(foreignKeys = t.foreignKeys :+ SrcForeignKey(
            unquoteId(cname),
            cols.split(",").map(unquoteId).toSeq,
            unqualify(refTbl),
            refCols.split(",").map(unquoteId).toSeq))
        }
      case uq(tbl, cname, cols) =>
        update(tables, unqualify(tbl), bad) { t =>
          t.copy(indexes = t.indexes :+ SrcIndex(unquoteId(cname), unique = true,
            cols.split(",").map(c => SrcKey(unquoteId(c))).toSeq))
        }
      case _ => bad += stmt.linesIterator.next()
    }
  }

  /** CREATE INDEX via a paren-depth scan over the key list. The earlier
    * single-level regex group (`\(([^)]*)\)`) stopped at the FIRST `)`,
    * so an expression index — which machine-generated pg_dump emits for
    * any functional index — captured `lower(name` and corrupted the key.
    * The reference parses these through pg_query_go's IndexStmt
    * (postgres/pgdump.go:199-221); its toIndexKeys (pgdump.go:662-671)
    * only reads plain-column IndexElems, and Spanner secondary indexes
    * cannot index expressions — so plain-column keys are parsed exactly,
    * and an index containing an expression element is skipped with a
    * recorded unexpected condition instead of a silently-mangled key.
    * Trailing clauses (partial-index WHERE, INCLUDE, WITH, TABLESPACE)
    * are ignored, as the reference ignores IndexStmt.WhereClause. */
  private def applyCreateIndex(stmt: String,
      tables: mutable.LinkedHashMap[String, SourceTable],
      bad: mutable.ArrayBuffer[String]): Unit = {
    val head =
      """(?is)^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+(?:CONCURRENTLY\s+)?(?:IF\s+NOT\s+EXISTS\s+)?("(?:[^"]|"")*"|\S+)\s+ON\s+([\s\S]+)$""".r
    // plain-column element: (quoted) identifier + optional ordering
    val plainCol =
      """(?is)^("(?:[^"]|"")*"|[\p{L}_][\p{L}\p{N}_$]*)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(?:FIRST|LAST))?$""".r
    stmt match {
      case head(uniq, name, rest0) =>
        // table identifier: up to the first unquoted whitespace or '('
        var i = 0; var inDq = false
        while (i < rest0.length && (inDq ||
            !(rest0.charAt(i).isWhitespace || rest0.charAt(i) == '('))) {
          if (rest0.charAt(i) == '"') inDq = !inDq
          i += 1
        }
        val tbl = rest0.substring(0, i)
        var rest = rest0.substring(i).dropWhile(_.isWhitespace)
        rest = "(?is)^USING\\s+\\S+\\s*([\\s\\S]*)$".r.findFirstMatchIn(rest)
          .map(_.group(1).dropWhile(_.isWhitespace)).getOrElse(rest)
        if (!rest.startsWith("(")) { bad += stmt.linesIterator.next(); return }
        // matching close paren: depth counter, quote-aware
        var depth = 0; var inQ = false; var dq = false; var j = 0; var end = -1
        while (j < rest.length && end < 0) {
          rest.charAt(j) match {
            case '\'' if !dq        => inQ = !inQ
            case '"' if !inQ        => dq = !dq
            case '(' if !inQ && !dq => depth += 1
            case ')' if !inQ && !dq => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end < 0) { bad += stmt.linesIterator.next(); return }
        val elems = splitTopLevel(rest.substring(1, end)).map(_.trim).filter(_.nonEmpty)
        val keys = elems.map {
          case plainCol(id, ord) =>
            Some(SrcKey(unquoteId(id), desc = ord != null && ord.equalsIgnoreCase("DESC")))
          case _ => None
        }
        if (keys.forall(_.isDefined))
          update(tables, unqualify(tbl), bad) { t =>
            t.copy(indexes = t.indexes :+
              SrcIndex(unquoteId(name), uniq != null, keys.flatten))
          }
        else bad += s"expression index ${unquoteId(name)} on ${unqualify(tbl)} " +
          "skipped (Spanner indexes cannot contain expressions)"
      case _ => bad += stmt.linesIterator.next()
    }
  }

  private def update(tables: mutable.LinkedHashMap[String, SourceTable],
      name: String, bad: mutable.ArrayBuffer[String])
      (f: SourceTable => SourceTable): Unit =
    tables.get(name) match {
      case Some(t) => tables(name) = f(t)
      case None    => bad += s"ALTER/INDEX for unknown table $name"
    }

  // ------------------------------------------------------------- INSERT

  /** Executor-side INSERT lexer (pgdump.go:334-371,702-725). pg_dump
    * emits one INSERT statement per line, so the data pass filters
    * INSERT lines distributed and lexes tuples per partition — row data
    * never accumulates on the driver. String literals follow
    * standard_conforming_strings: '' is the only quote escape; E'...'
    * strings additionally unescape backslash sequences. */
  private[pgdump] object PgTuples {
    // \b, not \s, after VALUES: accepts `VALUES(1)` (hand-written
    // dumps) and a first line ENDING at `VALUES` (wrapped statements);
    // (?s) makes it equally valid on a joined multi-line statement
    private val headerRe =
      """(?is)^INSERT\s+INTO\s+(.+?)\s*(?:\(([^)]*)\))?\s+VALUES\b.*$""".r
    // a wrapped statement's first line may stop BEFORE the VALUES
    // keyword: `INSERT INTO t (a, b)` or `INSERT INTO t` alone. The
    // identifier here is deliberately simple (no spaces) — pg_dump
    // itself always puts VALUES on the header line, so this form only
    // appears in hand-pretty-printed dumps
    private val startNoValuesRe =
      """(?is)^INSERT\s+INTO\s+("[^"]+"|[^\s("]+)\s*(?:\(([^)]*)\))?\s*$""".r

    /** (unqualified table, column list when present). */
    def header(stmt: String): Option[(String, Option[Seq[String]])] = stmt match {
      case headerRe(tbl, cols) =>
        Some((unqualify(tbl), Option(cols).map(_.split(",").map(unquoteId).toSeq)))
      case _ => None
    }

    /** First-line classifier for INSERT statements that may span lines:
      * [[header]] (VALUES on the first line, terminated or not) or a
      * header-only first line. The column list is complete on the first
      * line in both forms, so discovery's per-(table, cols) aggregation
      * stays exact; a column list ITSELF spanning lines is the one
      * unsupported wrapping (falls to the sequential parser's stream —
      * degradation, not data loss, for the schema pass; the V2 source
      * doesn't index it). */
    def startHeader(line: String): Option[(String, Option[Seq[String]])] =
      header(line).orElse(line match {
        case startNoValuesRe(tbl, cols) =>
          Some((unqualify(tbl), Option(cols).map(_.split(",").map(unquoteId).toSeq)))
        case _ => None
      })

    /** All raw-string tuples of one INSERT line, when it targets `table`. */
    def rowsFor(line: String, table: String): Seq[Seq[String]] =
      header(line) match {
        case Some((t, _)) if t == table =>
          val vi = valuesIndex(line)
          if (vi < 0) Nil
          else splitTuples(line.substring(vi)).map(tup =>
            splitTopLevel(tup).map(_.trim).map(literal))
        case _ => Nil
      }

    /** Index just past the top-level VALUES keyword ('' quote rules).
      * Word boundaries are required on both sides — without them an
      * unquoted identifier containing "values" (pg_dump doesn't quote
      * `my_values`) matched mid-word and the statement's tuples were
      * silently dropped. */
    private def valuesIndex(s: String): Int = {
      var inQ = false; var inDq = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'' && !inDq) inQ = !inQ
        else if (c == '"' && !inQ) inDq = !inDq
        else if (!inQ && !inDq && (c == 'V' || c == 'v') &&
                 s.regionMatches(true, i, "VALUES", 0, 6) &&
                 (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
                 (i + 6 >= s.length || !isIdentChar(s.charAt(i + 6)))) return i + 6
        i += 1
      }
      -1
    }

    private def isIdentChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '$'

    /** Split `(a,b),(c,d)` into tuple bodies, respecting quotes/parens. */
    private def splitTuples(s: String): Seq[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var depth = 0; var inQ = false; var start = -1
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'') inQ = !inQ
        else if (!inQ && c == '(') { depth += 1; if (depth == 1) start = i + 1 }
        else if (!inQ && c == ')') { depth -= 1; if (depth == 0) out += s.substring(start, i) }
        i += 1
      }
      out.toSeq
    }

    /** SQL literal → string value or null for NULL. */
    def literal(v: String): String = {
      val t = v.trim
      if (t.equalsIgnoreCase("NULL")) null
      else if ((t.startsWith("E'") || t.startsWith("e'")) && t.endsWith("'") && t.length >= 3)
        unescapeBackslash(t.substring(2, t.length - 1).replace("''", "'"))
      else if (t.startsWith("'") && t.endsWith("'"))
        t.substring(1, t.length - 1).replace("''", "'")
      else t
    }

    private def unescapeBackslash(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case x   => sb.append(x)
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
  }

  // -------------------------------------------------------------- utils

  /** Split on top-level commas (paren depth + quote aware). */
  private[pgdump] def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inQ = false; var inDq = false
    s.foreach {
      case '\'' if !inDq => inQ = !inQ; cur.append('\'')
      case '"' if !inQ   => inDq = !inDq; cur.append('"')
      case '(' if !inQ && !inDq => depth += 1; cur.append('(')
      case ')' if !inQ && !inDq => depth -= 1; cur.append(')')
      case ',' if depth == 0 && !inQ && !inDq => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** `public."order log"` → `order log`; `public.t` → `t`. */
  private[pgdump] def unqualify(raw: String): String = {
    val t = raw.trim
    val parts = splitQualified(t)
    unquoteId(parts.last)
  }

  private def splitQualified(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inDq = false
    s.foreach {
      case '"' => inDq = !inDq; cur.append('"')
      case '.' if !inDq => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    out += cur.toString
    out.toSeq
  }

  private[pgdump] def unquoteId(raw: String): String = {
    val t = raw.trim
    if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
      t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t
  }

  /** Leading identifier (possibly double-quoted) + the rest. */
  private def takeIdentifier(s: String): (String, String) = {
    if (s.startsWith("\"")) {
      val end = s.indexOf('"', 1)
      if (end < 0) ("", s)
      else (s.substring(1, end), s.substring(end + 1))
    } else {
      val end = s.indexWhere(c => c == ' ' || c == '\t')
      if (end < 0) (s, "") else (s.substring(0, end), s.substring(end))
    }
  }

  /** ALTER PRIMARY KEY (...) inside CREATE TABLE body. */
  private def keyList(item: String): Seq[SrcKey] = {
    val inner = item.substring(item.indexOf('(') + 1, item.lastIndexOf(')'))
    inner.split(",").map(c => SrcKey(unquoteId(c))).toSeq
  }
}
