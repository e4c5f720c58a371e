package graft.schema

/** Spanner DDL unparser (reference: spanner/ddl/ast.go:105-314): CREATE
  * TABLE with column comments, PRIMARY KEY clause, INTERLEAVE IN PARENT,
  * CREATE [UNIQUE] INDEX, and ALTER TABLE ... ADD FOREIGN KEY (FKs are
  * always emitted as ALTERs to dodge definition-order/cycle problems).
  * Interleaved children print after their parents via a re-queue loop. */
object DdlRender {

  final case class Config(comments: Boolean = false, protectIds: Boolean = false) {
    def quote(s: String): String = if (protectIds) s"`$s`" else s
  }

  def columnDef(c: SpColumn, cfg: Config): (String, String) = {
    val base = s"${cfg.quote(c.name)} ${c.t.render}" +
      (if (c.notNull) " NOT NULL" else "")
    (base, c.comment)
  }

  def indexKey(k: SrcKey, cfg: Config): String =
    if (k.desc) s"${cfg.quote(k.column)} DESC" else cfg.quote(k.column)

  def createTable(t: SpannerTable, cfg: Config): String = {
    val defs = t.colNames.zipWithIndex.map { case (cn, i) =>
      val (s, comment) = columnDef(t.colDefs(cn), cfg)
      val sep = if (i < t.colNames.length - 1) "," else " "
      (s"\n    $s$sep", comment)
    }
    val width = defs.map(_._1.length).max
    val cols = defs.map { case (s, comment) =>
      if (cfg.comments && comment.nonEmpty)
        s + (" " * (width - s.length)) + " -- " + comment
      else s
    }.mkString
    val keys = t.pks.map(indexKey(_, cfg)).mkString(", ")
    val tableComment =
      if (cfg.comments && t.comment.nonEmpty) s"--\n-- ${t.comment}\n--\n" else ""
    val interleave =
      t.parent.map(p => s",\nINTERLEAVE IN PARENT ${cfg.quote(p)}").getOrElse("")
    s"${tableComment}CREATE TABLE ${cfg.quote(t.name)} ($cols\n) PRIMARY KEY ($keys)$interleave"
      .replaceAll("(?m)[ \t]+$", "") // no trailing spaces on comment-less columns
  }

  def createIndex(ix: SrcIndex, table: String, cfg: Config): String = {
    val unique = if (ix.unique) "UNIQUE " else ""
    val keys = ix.keys.map(indexKey(_, cfg)).mkString(", ")
    s"CREATE ${unique}INDEX ${cfg.quote(ix.name)} ON ${cfg.quote(table)} ($keys)"
  }

  def addForeignKey(fk: SrcForeignKey, table: String, cfg: Config): String = {
    val name = if (fk.name.nonEmpty) s"CONSTRAINT ${cfg.quote(fk.name)} " else ""
    val cols = fk.columns.map(cfg.quote).mkString(", ")
    val refCols = fk.referColumns.map(cfg.quote).mkString(", ")
    s"ALTER TABLE ${cfg.quote(table)} ADD ${name}FOREIGN KEY ($cols) REFERENCES ${cfg.quote(fk.referTable)} ($refCols)"
  }

  /** Full-schema DDL: tables alphabetically, except interleaved children
    * wait for their parents (re-queue loop, ast.go:263-301); indexes
    * follow their table; FK ALTERs last. */
  def schemaDdl(schema: Map[String, SpannerTable], cfg: Config,
      foreignKeys: Boolean = true): Seq[String] = {
    val out = Seq.newBuilder[String]
    val names = schema.keys.toSeq.sorted
    var queue = names
    val printed = collection.mutable.Set.empty[String]
    var stall = 0 // consecutive re-queues with no progress
    while (queue.nonEmpty) {
      val n = queue.head
      queue = queue.tail
      val t = schema(n)
      if (t.parent.forall(printed.contains) || stall > queue.length) {
        // stall bound: a parent missing from the schema map (or a parent
        // cycle) would otherwise re-queue forever; after a full pass with
        // no progress, emit the stragglers as-is (ast.go's loop is
        // bounded the same way by construction).
        out += createTable(t, cfg)
        t.indexes.foreach(ix => out += createIndex(ix, n, cfg))
        printed += n
        stall = 0
      } else { queue = queue :+ n; stall += 1 }
    }
    if (foreignKeys)
      for (n <- names; fk <- schema(n).fks) out += addForeignKey(fk, n, cfg)
    out.result()
  }

  /** K4 schema-file writers: pretty (comments, no backticks) and legal
    * (backticks, no comments) variants (conversion/conversion.go:549-603). */
  def writeSchemaFile(schema: Map[String, SpannerTable], path: String,
      pretty: Boolean,
      c: org.apache.hadoop.conf.Configuration): Unit = {
    val cfg = if (pretty) Config(comments = true) else Config(protectIds = true)
    val text = schemaDdl(schema, cfg).mkString("", ";\n\n", ";\n")
    graft.util.Fs.writeStringAtomic(path, text, c)
  }
}
