package graft.sources.mysqldump

import graft.schema._
import graft.types.SrcType
import scala.collection.mutable

/** Driver-side mysqldump schema pass (reference: mysql/mysqldump.go:57-341,
  * 534-655). Streams the dump once, interprets schema statements, and
  * records which tables carry INSERT data — the tuples themselves are read
  * distributed by MySqlDumpReader (mysqldump emits one extended-INSERT
  * statement per line, so the data pass is a line-filtered text scan).
  *
  * mysqldump specifics handled here that the pg scanner doesn't need:
  *   - backtick identifier quoting and backslash escapes inside strings;
  *   - versioned comment statements (slash-star-bang 40103
  *     SET TIME_ZONE='+00:00' star-slash semicolon — the session offset
  *     hides inside one of these);
  *   - DELIMITER blocks: stored programs are skipped wholesale
  *     (mysqldump.go:534-563 skipUnsupported);
  *   - spatial column types (point/geometry/...) → recorded as a note,
  *     falling to STRING via the mapper's NoGoodType path
  *     (mysqldump.go:564-625 rewrites them to text);
  *   - `set(...)` is a 1-D array type (getArrayBounds, mysqldump.go:649-654).
  */
object MySqlDumpParser {

  final case class DumpSchema(
      tables: Map[String, SourceTable],
      tableOrder: Seq[String],
      /** tables with INSERT data → column list when the dump names one */
      insertCols: Map[String, Option[Seq[String]]],
      /** session offset from SET TIME_ZONE, e.g. "+05:30" */
      timezoneOffset: Option[String],
      statementStats: Map[String, Long],
      unparseable: Seq[String])

  private val spatialTypes = Set("geometrycollection", "multipoint",
    "multilinestring", "multipolygon", "point", "linestring", "polygon",
    "geometry")

  // ------------------------------------------------------------ scanning

  def parse(lines: Iterator[String]): DumpSchema = {
    val tables = mutable.LinkedHashMap.empty[String, SourceTable]
    val insertCols = mutable.LinkedHashMap.empty[String, Option[Seq[String]]]
    val stats = mutable.LinkedHashMap.empty[String, Long].withDefaultValue(0L)
    val bad = mutable.ArrayBuffer.empty[String]
    var offset: Option[String] = None

    val sb = new StringBuilder
    var inSingle = false
    var inBacktick = false
    var skipUntilDelimiterRestore = false

    def endStatement(): Unit = {
      val stmt = sb.toString.trim
      sb.clear()
      if (stmt.isEmpty) return
      interpret(stmt, tables, insertCols, stats, bad)
        .foreach(z => offset = Some(z))
    }

    for (line <- lines) {
      val stripped = line.trim
      if (skipUntilDelimiterRestore) {
        if (stripped.toUpperCase.startsWith("DELIMITER") &&
            stripped.split("\\s+").lift(1).contains(";")) {
          skipUntilDelimiterRestore = false
          stats("delimiter") += 1
        } else stats("skippedInDelimiterBlock") += 1
      } else if (sb.isEmpty && stripped.startsWith("--")) {
        // comment line between statements
      } else if (sb.isEmpty && stripped.toUpperCase.startsWith("DELIMITER")) {
        val d = stripped.split("\\s+").lift(1).getOrElse(";")
        stats("delimiter") += 1
        if (d != ";") skipUntilDelimiterRestore = true
      } else if (sb.isEmpty && stripped.startsWith("/*!") && stripped.endsWith("*/;")) {
        // versioned comment statement: interpret the inner SQL for
        // TIME_ZONE, count everything else as skipped
        val inner = stripped.stripPrefix("/*!").stripSuffix("*/;")
          .dropWhile(_.isDigit).trim
        timeZoneOf(inner) match {
          case Some(z) => offset = Some(z); stats("set") += 1
          case None    => stats("skipped") += 1
        }
      } else if (sb.isEmpty && stripped.startsWith("/*") && stripped.endsWith("*/;")) {
        stats("skipped") += 1
      } else {
        var i = 0
        while (i < line.length) {
          val c = line.charAt(i)
          c match {
            case '\\' if inSingle => // backslash escape: consume next char
              sb.append(c)
              if (i + 1 < line.length) { sb.append(line.charAt(i + 1)); i += 1 }
            case '\'' if !inBacktick => inSingle = !inSingle; sb.append(c)
            case '`' if !inSingle    => inBacktick = !inBacktick; sb.append(c)
            case ';' if !inSingle && !inBacktick =>
              sb.append(c); endStatement()
            case _ => sb.append(c)
          }
          i += 1
        }
        if (sb.nonEmpty) sb.append('\n')
      }
    }
    endStatement()

    DumpSchema(
      tables = tables.toMap,
      tableOrder = tables.keys.toSeq,
      insertCols = insertCols.toMap,
      timezoneOffset = offset,
      statementStats = stats.toMap,
      unparseable = bad.toSeq)
  }

  private def timeZoneOf(sql: String): Option[String] = {
    val re = """(?is)^SET\s+TIME_ZONE\s*=\s*'([^']*)'\s*;?$""".r
    sql.trim match { case re(z) => Some(z); case _ => None }
  }

  // -------------------------------------------------------- interpreting

  /** Returns Some(offset) for SET TIME_ZONE, None otherwise. */
  private def interpret(stmt: String,
      tables: mutable.LinkedHashMap[String, SourceTable],
      insertCols: mutable.LinkedHashMap[String, Option[Seq[String]]],
      stats: mutable.Map[String, Long],
      bad: mutable.ArrayBuffer[String]): Option[String] = {
    val upper = stmt.toUpperCase
    if (upper.startsWith("SET")) {
      stats("set") += 1
      timeZoneOf(stmt)
    } else if (upper.startsWith("CREATE TABLE")) {
      stats("createTable") += 1
      parseCreateTable(stmt, bad) match {
        case Some(t) => tables(t.name) = t
        case None    => bad += stmt.linesIterator.next()
      }
      None
    } else if (upper.startsWith("INSERT")) {
      stats("insert") += 1
      InsertHeader.unapply(stmt) match {
        case Some((tbl, colsOpt)) =>
          if (tables.contains(tbl)) insertCols.getOrElseUpdate(tbl, colsOpt)
          else bad += s"INSERT for unknown table $tbl"
        case None => bad += stmt.take(60)
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
    } else if (upper.startsWith("DROP ") || upper.startsWith("LOCK ") ||
               upper.startsWith("UNLOCK ") || upper.startsWith("USE ") ||
               upper.startsWith("CREATE DATABASE")) {
      stats("skipped") += 1
      None
    } else {
      stats("skipped") += 1
      None
    }
  }

  /** `INSERT INTO `t` [(cols)] VALUES ...` header (data parsed distributed). */
  private[mysqldump] object InsertHeader {
    // \b, not \s, after VALUES: accepts `VALUES(1)` (hand-written
    // dumps) and a first line ENDING at `VALUES` (wrapped statements);
    // (?s) makes it equally valid on a joined multi-line statement
    private val re =
      """(?is)^INSERT\s+INTO\s+(`(?:[^`]|``)+`|\S+?)\s*(?:\(([^)]*)\))?\s+VALUES\b.*$""".r
    // a wrapped statement's first line may stop BEFORE the VALUES
    // keyword (mysqldump itself never wraps — bounded by
    // max-allowed-packet per line — but hand-edited dumps do)
    private val startNoValuesRe =
      """(?is)^INSERT\s+INTO\s+(`(?:[^`]|``)+`|[^\s(`]+)\s*(?:\(([^)]*)\))?\s*$""".r
    def unapply(stmt: String): Option[(String, Option[Seq[String]])] = stmt match {
      case re(tbl, cols) =>
        Some((unquoteId(tbl),
          Option(cols).map(_.split(",").map(unquoteId).toSeq)))
      case _ => None
    }

    /** First-line classifier for INSERT statements that may span lines
      * (see the pg twin, PgTuples.startHeader): [[unapply]] or a
      * header-only first line; a column list itself spanning lines is
      * the one unsupported wrapping. */
    def startHeader(line: String): Option[(String, Option[Seq[String]])] =
      unapply(line).orElse(line match {
        case startNoValuesRe(tbl, cols) =>
          Some((unquoteId(tbl),
            Option(cols).map(_.split(",").map(unquoteId).toSeq)))
        case _ => None
      })
  }

  // ------------------------------------------------------- CREATE TABLE

  private[mysqldump] def parseCreateTable(stmt: String,
      notes: mutable.ArrayBuffer[String]): Option[SourceTable] = {
    // The body is the parenthesized run from the first '(' to its
    // matching ')' — trailing table options (ENGINE=... CHARSET=...)
    // follow the close paren, and enum/set defs nest parens inside.
    val open = stmt.indexOf('(')
    if (open < 0) return None
    val head = stmt.substring(0, open)
    val re = """(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(.+?)\s*$""".r
    val name = head match {
      case re(n) => unquoteId(n)
      case _     => return None
    }
    val close = matchingParen(stmt, open)
    if (close < 0) return None
    val body = stmt.substring(open + 1, close)

    val cols = mutable.ArrayBuffer.empty[SrcColumn]
    var pks = Seq.empty[SrcKey]
    val fks = mutable.ArrayBuffer.empty[SrcForeignKey]
    val indexes = mutable.ArrayBuffer.empty[SrcIndex]

    splitTopLevel(body).map(_.trim).filter(_.nonEmpty).foreach { item =>
      val up = item.toUpperCase
      if (up.startsWith("PRIMARY KEY")) {
        pks = keyList(item)
      } else if (up.startsWith("UNIQUE KEY") || up.startsWith("UNIQUE INDEX") ||
                 up.startsWith("UNIQUE (")) {
        addIndex(indexes, notes, name, item, constraintName(item, "UNIQUE"),
          unique = true)
      } else if (up.startsWith("KEY") || up.startsWith("INDEX")) {
        addIndex(indexes, notes, name, item, constraintName(item, "KEY"),
          unique = false)
      } else if (up.startsWith("CONSTRAINT") || up.startsWith("FOREIGN KEY")) {
        parseInlineFk(item) match {
          case Some(fk) => fks += fk
          case None     => notes += s"unparsed constraint in $name: ${item.take(50)}"
        }
      } else if (up.startsWith("SPATIAL") || up.startsWith("FULLTEXT") ||
                 up.startsWith("CHECK")) {
        notes += s"ignored ${item.takeWhile(_ != '(').trim} in $name"
      } else {
        parseColumnDef(item, notes).foreach(cols += _)
      }
    }
    if (cols.isEmpty) None
    else {
      // PK columns forced NOT NULL + UNIQUE (mysqldump.go updateCols)
      val defs = cols.map { c =>
        if (pks.exists(_.column == c.name))
          c.name -> c.copy(notNull = true, unique = true)
        else c.name -> c
      }
      Some(SourceTable(name, cols.map(_.name).toSeq, defs.toMap,
        primaryKeys = pks, foreignKeys = fks.toSeq, indexes = indexes.toSeq))
    }
  }

  /** One column definition: backticked name, type (mods | enum/set
    * elements), unsigned/charset noise, NOT NULL / DEFAULT /
    * AUTO_INCREMENT / UNIQUE flags. */
  private[mysqldump] def parseColumnDef(item: String,
      notes: mutable.ArrayBuffer[String]): Option[SrcColumn] = {
    val (name, rest0) = takeIdentifier(item.trim)
    if (name.isEmpty) return None
    var rest = rest0.trim
    val tyWord = rest.takeWhile(c => c.isLetterOrDigit || c == '_').toLowerCase
    if (tyWord.isEmpty) return None
    rest = rest.drop(tyWord.length).trim

    var mods = Seq.empty[Long]
    var arrayBounds = 0
    if (rest.startsWith("(")) {
      val close = matchingParen(rest, 0)
      val inner = rest.substring(1, close)
      if (tyWord == "enum" || tyWord == "set") {
        val n = splitTopLevel(inner).size
        if (tyWord == "set") arrayBounds = 1 // set is a 1-D array
        mods = Seq(n.toLong)
      } else {
        mods = inner.split(",").flatMap(s => s.trim.toLongOption).toSeq
      }
      rest = rest.drop(close + 1).trim
    }
    if (spatialTypes.contains(tyWord))
      notes += s"spatial type $tyWord on column $name mapped via NoGoodType"

    val restUp = rest.toUpperCase
    Some(SrcColumn(
      name = name,
      tpe = SrcType(tyWord, mods, arrayBounds),
      notNull = restUp.contains("NOT NULL"),
      unique = restUp.contains("UNIQUE"),
      ignored = Ignored(
        default = restUp.contains("DEFAULT"),
        autoIncrement = restUp.contains("AUTO_INCREMENT"))))
  }

  /** `CONSTRAINT `fk` FOREIGN KEY (`a`) REFERENCES `t` (`b`)` (inline). */
  private def parseInlineFk(item: String): Option[SrcForeignKey] = {
    val re = """(?is)^(?:CONSTRAINT\s+(\S+)\s+)?FOREIGN\s+KEY\s*\(([^)]*)\)\s*REFERENCES\s+(\S+)\s*\(([^)]*)\).*$""".r
    item match {
      case re(cname, cols, refTbl, refCols) =>
        Some(SrcForeignKey(
          Option(cname).map(unquoteId).getOrElse(""),
          cols.split(",").map(unquoteId).toSeq,
          unquoteId(refTbl),
          refCols.split(",").map(unquoteId).toSeq))
      case _ => None
    }
  }

  // -------------------------------------------------------------- ALTER

  private def applyAlter(stmt: String,
      tables: mutable.LinkedHashMap[String, SourceTable],
      bad: mutable.ArrayBuffer[String]): Unit = {
    val pk = """(?is)ALTER\s+TABLE\s+(\S+)\s+ADD\s+PRIMARY\s+KEY\s*\(([^)]*)\)\s*;?""".r
    val fk = """(?is)ALTER\s+TABLE\s+(\S+)\s+ADD\s+CONSTRAINT\s+(\S+)\s+FOREIGN\s+KEY\s*\(([^)]*)\)\s+REFERENCES\s+(\S+)\s*\(([^)]*)\)[^;]*;?""".r
    stmt match {
      case pk(tbl, cols) =>
        update(tables, unquoteId(tbl), bad) { t =>
          val keys = cols.split(",").map(c => SrcKey(unquoteId(c))).toSeq
          val defs = t.colDefs.map { case (n, d) =>
            if (keys.exists(_.column == n)) n -> d.copy(notNull = true, unique = true)
            else n -> d
          }
          t.copy(primaryKeys = keys, colDefs = defs)
        }
      case fk(tbl, cname, cols, refTbl, refCols) =>
        update(tables, unquoteId(tbl), bad) { t =>
          t.copy(foreignKeys = t.foreignKeys :+ SrcForeignKey(
            unquoteId(cname),
            cols.split(",").map(unquoteId).toSeq,
            unquoteId(refTbl),
            refCols.split(",").map(unquoteId).toSeq))
        }
      case _ => bad += stmt.linesIterator.next()
    }
  }

  /** CREATE INDEX via a paren-depth scan (mirrors the pg parser): the
    * old single-level regex stopped at the first `)`, mangling MySQL 8
    * functional indexes `CREATE INDEX i ON t ((lower(name)))`. Plain
    * columns (incl. prefix lengths and ASC/DESC) parse exactly; an
    * index with a functional part is skipped with a recorded condition. */
  private def applyCreateIndex(stmt: String,
      tables: mutable.LinkedHashMap[String, SourceTable],
      bad: mutable.ArrayBuffer[String]): Unit = {
    val head =
      """(?is)^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+(`(?:[^`]|``)*`|\S+)\s+ON\s+([\s\S]+)$""".r
    stmt match {
      case head(uniq, name, rest0) =>
        // table identifier: up to the first unbacktick'd whitespace or '('
        var i = 0; var inBt = false
        while (i < rest0.length && (inBt ||
            !(rest0.charAt(i).isWhitespace || rest0.charAt(i) == '('))) {
          if (rest0.charAt(i) == '`') inBt = !inBt
          i += 1
        }
        val tbl = rest0.substring(0, i)
        val rest = rest0.substring(i).dropWhile(_.isWhitespace)
        val open = rest.indexOf('(')
        val close = if (open == 0) matchingParen(rest, 0) else -1
        if (close < 0) { bad += stmt.linesIterator.next(); return }
        val parts = splitTopLevel(rest.substring(1, close))
          .map(_.trim).filter(_.nonEmpty).map { c =>
            if (c.startsWith("(")) None // functional key part
            else {
              val (id, _) = takeIdentifier(c)
              Some(SrcKey(id.takeWhile(_ != '(')))
            }
          }
        // empty key list (degenerate `CREATE INDEX i ON t ()`) skips with
        // a note, same as addIndex — never a zero-key SrcIndex
        if (parts.isEmpty)
          bad += s"index ${unquoteId(name)} on ${unquoteId(tbl)} " +
            "skipped (empty key list)"
        else if (parts.forall(_.isDefined))
          update(tables, unquoteId(tbl), bad) { t =>
            t.copy(indexes = t.indexes :+
              SrcIndex(unquoteId(name), uniq != null, parts.flatten))
          }
        else bad += s"functional index ${unquoteId(name)} on ${unquoteId(tbl)} " +
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

  // -------------------------------------------------------------- utils

  /** Key parts of `PRIMARY KEY (`a`,`b`)` / `KEY name (c(10), d DESC)`.
    * A functional key part — `(expr)`, the parenthesized form MySQL 8
    * requires for expression indexes — has no plain column and maps to
    * None, so index-building callers can skip the whole index with a
    * recorded note instead of mangling the key (the pg parser's
    * expression-index posture; Spanner cannot index expressions).
    * Prefix lengths `col(10)` and trailing ASC/DESC are stripped. */
  private def keyParts(item: String): Seq[Option[SrcKey]] = {
    val open = item.indexOf('(')
    val close = matchingParen(item, open)
    if (open < 0 || close < 0) return Nil
    splitTopLevel(item.substring(open + 1, close))
      .map(_.trim).filter(_.nonEmpty).map { c =>
        if (c.startsWith("(")) None // functional key part
        else {
          val (id, _) = takeIdentifier(c)
          Some(SrcKey(id.takeWhile(_ != '(')))
        }
      }
  }

  /** Plain-column key list (PRIMARY KEY — expressions impossible). */
  private def keyList(item: String): Seq[SrcKey] = keyParts(item).flatten

  /** Append an inline KEY/UNIQUE KEY index, or record a note when it
    * contains a functional key part — or when the key list is empty
    * (degenerate input), so no skip is ever silent. */
  private def addIndex(indexes: mutable.ArrayBuffer[SrcIndex],
      notes: mutable.ArrayBuffer[String], table: String, item: String,
      ixName: String, unique: Boolean): Unit = {
    val parts = keyParts(item)
    if (parts.isEmpty)
      notes += s"index $ixName in $table skipped (empty key list)"
    else if (parts.forall(_.isDefined))
      indexes += SrcIndex(ixName, unique, parts.flatten)
    else
      notes += s"functional index $ixName in $table skipped " +
        "(Spanner indexes cannot contain expressions)"
  }

  /** Name between the KEY/UNIQUE keyword and the paren, if any. */
  private def constraintName(item: String, kw: String): String = {
    val beforeParen = item.takeWhile(_ != '(').trim
    val words = beforeParen.split("\\s+").toSeq
    words.lastOption.filterNot(w =>
      w.equalsIgnoreCase("KEY") || w.equalsIgnoreCase("INDEX") ||
      w.equalsIgnoreCase("UNIQUE")).map(unquoteId).getOrElse("")
  }

  /** Index of the ')' matching the '(' at `open` (quote-aware). */
  private[mysqldump] def matchingParen(s: String, open: Int): Int = {
    var depth = 0; var inQ = false; var inBt = false
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && inQ) i += 1
      else if (c == '\'' && !inBt) inQ = !inQ
      else if (c == '`' && !inQ) inBt = !inBt
      else if (c == '(' && !inQ && !inBt) depth += 1
      else if (c == ')' && !inQ && !inBt) { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** Split on top-level commas (paren/quote/backtick aware; backslash
    * escapes inside single quotes). */
  private[mysqldump] def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inQ = false; var inBt = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && inQ) {
        cur.append(c)
        if (i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
      }
      else if (c == '\'' && !inBt) { inQ = !inQ; cur.append(c) }
      else if (c == '`' && !inQ) { inBt = !inBt; cur.append(c) }
      else if (c == '(' && !inQ && !inBt) { depth += 1; cur.append(c) }
      else if (c == ')' && !inQ && !inBt) { depth -= 1; cur.append(c) }
      else if (c == ',' && depth == 0 && !inQ && !inBt) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** `` `order log` `` → `order log`; db-qualified `db`.`t` → t. */
  private[mysqldump] def unquoteId(raw: String): String = {
    val t0 = raw.trim
    // strip db qualifier outside backticks
    val t = {
      var inBt = false; var lastDot = -1
      for (i <- 0 until t0.length) {
        val c = t0.charAt(i)
        if (c == '`') inBt = !inBt
        else if (c == '.' && !inBt) lastDot = i
      }
      if (lastDot >= 0) t0.substring(lastDot + 1) else t0
    }
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1).replace("``", "`")
    else t
  }

  /** Leading identifier (possibly backticked) + the rest. */
  private def takeIdentifier(s: String): (String, String) = {
    if (s.startsWith("`")) {
      val end = s.indexOf('`', 1)
      if (end < 0) ("", s)
      else (s.substring(1, end).replace("``", "`"), s.substring(end + 1))
    } else {
      val end = s.indexWhere(c => c == ' ' || c == '\t')
      if (end < 0) (s, "") else (s.substring(0, end), s.substring(end))
    }
  }
}
