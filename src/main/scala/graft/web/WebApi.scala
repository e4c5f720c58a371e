package graft.web

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.plan.SessionFile
import graft.report.Report
import graft.schema._
import graft.schema.SchemaConverter.ConversionPlan
import graft.types.{MySqlTypeMapper, PostgresTypeMapper, SpType}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** T8 delivery vehicle: the reference's interactive schema-assistant HTTP
  * API (web/routes.go:23-54, web/web.go:76-770) over the pure PlanEdits
  * library. Plain `com.sun.net.httpserver` — zero new dependencies.
  *
  * The reference mutates a global session `Conv` in place and "rolls
  * back" a half-applied multi-column edit by re-reading the session file
  * (web/web.go:772-795). Here the plan is immutable, so a batch edit is
  * a fold of `ConversionPlan => Either[err, ConversionPlan]` steps that
  * only commits when every step succeeds — rollback is free and exact,
  * not best-effort. When a session file is attached (GET /session), every
  * committed edit re-persists it (web.go:774-783 updateSessionFile).
  *
  * Scale note: everything here is driver-side metadata (schemas, name
  * maps, issue lists) — the web layer never touches row data, so it has
  * no 100 TB concerns; the edited plan flows into the distributed
  * data-only pass through the session file.
  */
final class WebSession {
  @volatile var driver: String = ""
  @volatile var plan: Option[ConversionPlan] = None
  @volatile var sessionFile: Option[String] = None
  /** Live-DB connection config stored by POST /connect
    * (web.go:60-74 driverConfig). */
  @volatile var connect: Option[WebApi.ConnectConfig] = None
  /** Seam for GET /convert/infoschema: build an InfoSchema.Catalog from
    * the stored config. The production wiring is `PgJdbcCatalog`/
    * `MySqlJdbcCatalog` over spark.read.jdbc (needs a SparkSession and a
    * reachable database); tests inject a canned catalog — the same
    * mocked-driver strategy the reference's infoschema tests use. */
  @volatile var catalogFactory: Option[WebApi.ConnectConfig => graft.sources.jdbc.InfoSchema.Catalog] = None

  /** Commit a successful edit: swap the plan and re-persist the session
    * file if one is attached (reference updateSessionFile). */
  def commit(p: ConversionPlan): Unit = synchronized {
    plan = Some(p)
    sessionFile.foreach(SessionFile.write(p, _, WebApi.hadoopConf, Some(driver)))
  }
}

object WebApi {

  private val mapper = new ObjectMapper()

  /** The web layer is deliberately spark-less (schema metadata only), so
    * its artifact IO resolves through an explicit VANILLA Hadoop conf —
    * `file:` plus any scheme on the classpath — never the thread-local
    * active session, whose `spark.hadoop.*` overrides would belong to
    * whatever unrelated session is active in a multi-session JVM. */
  private[web] val hadoopConf = new org.apache.hadoop.conf.Configuration()

  /** Start the API on `port` (0 = ephemeral). Returns the server (call
    * `stop(0)` when done) and its mutable session. */
  def start(port: Int, session: WebSession = new WebSession): (HttpServer, WebSession) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    route(server, session)
    server.setExecutor(null) // serial dispatch: one session, like the reference
    server.start()
    (server, session)
  }

  // -------------------------------------------------------------- routes

  private def route(server: HttpServer, s: WebSession): Unit = {
    def ctx(path: String)(f: (HttpExchange, WebSession) => Unit): Unit =
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit =
          try f(ex, s)
          catch {
            case e: ApiError => respond(ex, e.status, textNode(e.getMessage))
            case scala.util.control.NonFatal(e) =>
              respond(ex, 500, textNode(s"internal error: ${e.getMessage}"))
          }
      })

    ctx("/convert/dump")(convertDump)     // POST {driver, filePath}
    ctx("/ddl")(getDdl)                   // GET
    ctx("/session")(createSession)        // GET ?dir=
    ctx("/session/resume")(resumeSession) // POST {path}
    ctx("/summary")(getSummary)           // GET
    ctx("/overview")(getOverview)         // GET
    ctx("/conversion")(getConversionRate) // GET
    ctx("/table/report")(getTableReport)  // GET ?table= → drill-down
    ctx("/typemap")(getTypeMap)           // GET
    ctx("/typemap/table")(updateTable)    // POST ?table= {UpdateCols:{...}}
    ctx("/setparent")(setParent)          // GET ?table=&update=
    ctx("/drop/fk")(dropFk)               // GET ?table=&pos=
    ctx("/drop/secondaryindex")(dropIndex)// GET ?table=&pos=
    ctx("/add/indexes")(addIndexes)       // POST [{table,name,unique,keys}]
    ctx("/typemap/global")(setTypeMapGlobal) // POST {srcType: spType}
    ctx("/rename/fks")(renameFks)         // POST ?table= {old: new}
    ctx("/rename/indexes")(renameIndexes) // POST ?table= {old: new}
    ctx("/schema")(schemaFile)            // GET ?dir= → writes schema file
    ctx("/report")(reportFile)            // GET ?dir= → writes report file
    ctx("/connect")(connectDb)            // POST {driver,host,port,database,user,password}
    ctx("/convert/infoschema")(convertInfoSchema) // GET
    ctx("/")(staticPage)                  // GET → the bundled assistant UI
  }

  final case class ConnectConfig(driver: String, host: String, port: String,
      database: String, user: String, password: String)

  private final class ApiError(val status: Int, msg: String) extends RuntimeException(msg)
  private def fail(status: Int, msg: String): Nothing = throw new ApiError(status, msg)

  private def requirePlan(s: WebSession): ConversionPlan =
    s.plan.getOrElse(fail(404,
      "Schema is not converted or Driver is not configured properly. " +
        "Please retry converting the database to Spanner."))

  // ------------------------------------------------------------ handlers

  /** GET / — the bundled single-page assistant UI (frontend/ in the
    * reference is a full Angular app; this is the dependency-free
    * equivalent over the same JSON routes: load a dump or session,
    * inspect DDL/report/ratings/typemap, apply edits, persist).
    * The "/" context is also the server's catch-all, so anything that
    * is not the page (or a registered route) 404s here instead of
    * silently serving HTML to an API typo. */
  private def staticPage(ex: HttpExchange, s: WebSession): Unit = {
    val path = ex.getRequestURI.getPath
    if (path != "/" && path != "/index.html") fail(404, s"no route $path")
    val in = getClass.getResourceAsStream("/graft/web/index.html")
    if (in == null) fail(500, "ui resource missing from classpath")
    val bytes = try in.readAllBytes() finally in.close()
    ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
    ex.sendResponseHeaders(200, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** POST /convert/dump (web.go:152-181): spark-less schema pass over a
    * dump file; resets the session. */
  private def convertDump(ex: HttpExchange, s: WebSession): Unit = {
    val body = readJson(ex)
    val driver = body.path("driver").asText("")
    val path = body.path("filePath").asText("")
    if (!Files.exists(Paths.get(path)))
      fail(404, s"failed to open dump file $path")
    val plan = driver match {
      case "pgdump" | "pg_dump" =>
        graft.sources.pgdump.PgDumpReader.schemaPass(path)._2
      case "mysqldump" =>
        graft.sources.mysqldump.MySqlDumpReader.schemaPass(path)._2
      case other => fail(400, s"Driver : '$other' is not supported")
    }
    s.synchronized {
      s.driver = if (driver == "pg_dump") "pgdump" else driver
      s.plan = Some(plan)
      s.sessionFile = None
    }
    respond(ex, 200, planJson(plan))
  }

  /** GET /ddl (web.go:188-203): per-table pretty CREATE TABLE, alphabetical.
    * Like the reference, comments on, FKs/indexes skipped — a UI display
    * form, not submit-ready DDL (that's DdlRender.schemaDdl). */
  private def getDdl(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val cfg = DdlRender.Config(comments = true, protectIds = false)
    val o = mapper.createObjectNode()
    plan.spSchema.keys.toSeq.sorted.foreach { t =>
      o.put(t, DdlRender.createTable(plan.spSchema(t), cfg))
    }
    respond(ex, 200, o)
  }

  /** GET /session?dir= (web.go:1091-1120 getFilePrefix + session create):
    * persists the plan and attaches the file so later edits auto-persist. */
  private def createSession(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val dir = query(ex).getOrElse("dir",
      Files.createTempDirectory("graft_web").toString)
    Files.createDirectories(Paths.get(dir))
    val path = s"$dir/session.json"
    SessionFile.write(plan, path, WebApi.hadoopConf, Some(s.driver))
    s.synchronized { s.sessionFile = Some(path) }
    val o = mapper.createObjectNode()
    o.put("path", path)
    respond(ex, 200, o)
  }

  /** POST /session/resume (web.go:session/resume): restore a saved plan. */
  private def resumeSession(ex: HttpExchange, s: WebSession): Unit = {
    val path = readJson(ex).path("path").asText("")
    if (!Files.exists(Paths.get(path))) fail(404, s"no session file at $path")
    val plan = SessionFile.read(path, hadoopConf)
    s.synchronized {
      s.plan = Some(plan)
      s.sessionFile = Some(path)
      // restore the driver tag too — /typemap and /overview are
      // driver-keyed and would otherwise break on a fresh process
      SessionFile.readDriver(path, hadoopConf).foreach(s.driver = _)
    }
    respond(ex, 200, planJson(plan))
  }

  /** GET /summary (web.go:204-220): per-source-table issue text. */
  private def getSummary(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val o = mapper.createObjectNode()
    Report.analyze(plan, Map.empty).foreach { t =>
      val body = new StringBuilder
      t.issueBodies.foreach { b =>
        body ++= b.heading += '\n'
        b.lines.zipWithIndex.foreach { case (l, i) =>
          body ++= s"${i + 1}) $l.\n\n"
        }
      }
      o.put(t.srcTable, body.toString)
    }
    respond(ex, 200, o)
  }

  /** GET /overview (web.go:222-232): the full schema-mode report. */
  private def getOverview(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    respond(ex, 200, textNode(Report.render(s.driver, plan, Map.empty)))
  }

  /** GET /conversion (web.go:392-401): per-table schema rating. */
  private def getConversionRate(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val o = mapper.createObjectNode()
    Report.analyze(plan, Map.empty).foreach { t =>
      o.put(t.spTable,
        Report.rateSchema(t.cols, t.warnings, t.syntheticPk.nonEmpty, summary = false))
    }
    respond(ex, 200, o)
  }

  /** GET /table/report?table= — one table's conversion-quality
    * drill-down: the rating, the per-column issue text, and the
    * display-form CREATE TABLE, resolved server-side in one response
    * (the UI's ratings view can't join /conversion's Spanner-named
    * keys against /summary's source-named keys client-side — the name
    * fixer's mapping lives in the plan). Accepts either the Spanner or
    * the source table name. The reference UI reaches the same data
    * through its per-table report panes (frontend/js report views). */
  private def getTableReport(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val name = query(ex).getOrElse("table", fail(400, "Table name is empty"))
    val t = Report.analyze(plan, Map.empty)
      .find(r => r.spTable == name || r.srcTable == name)
      .getOrElse(fail(404, s"no table named $name in the plan"))
    val o = mapper.createObjectNode()
    o.put("srcTable", t.srcTable)
    o.put("spTable", t.spTable)
    o.put("rating",
      Report.rateSchema(t.cols, t.warnings, t.syntheticPk.nonEmpty, summary = false))
    val body = new StringBuilder
    t.issueBodies.foreach { b =>
      body ++= b.heading += '\n'
      b.lines.zipWithIndex.foreach { case (l, i) =>
        body ++= s"${i + 1}) $l.\n\n"
      }
    }
    o.put("issues", body.toString)
    o.put("ddl", DdlRender.createTable(plan.spSchema(t.spTable),
      DdlRender.Config(comments = true, protectIds = false)))
    respond(ex, 200, o)
  }

  /** GET /typemap (web.go:234-264): for each source type in use, the
    * default Spanner mapping + its issues (by name). */
  private def getTypeMap(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val tm = s.driver match {
      case "mysqldump" | "mysql" => MySqlTypeMapper
      case "pgdump" | "postgres" => PostgresTypeMapper
      case other => fail(400, s"Driver : '$other' is not supported")
    }
    val o = mapper.createObjectNode()
    for {
      t <- plan.srcSchema.values
      cn <- t.colNames
      st = t.colDefs(cn).tpe
      if !o.has(st.name)
    } {
      // keyed by base type name like the reference's static maps
      // (web.go:1122-1134) — report the scalar mapping, arrays aside
      val (sp, issues) = tm.toSpanner(st.copy(arrayBounds = 0))
      val e = o.putObject(st.name)
      e.put("spType", sp.render)
      val arr = e.putArray("issues")
      issues.foreach(i => arr.add(i.toString))
    }
    respond(ex, 200, o)
  }

  /** POST /typemap/table?table=T (web.go:327-390 updateTableSchema).
    * Body: {"UpdateCols": {col: {"Removed": bool, "Rename": str,
    * "ToType": str, "NotNull": "ADDED"|"REMOVED"|""}}}. All edits in the
    * batch apply atomically: any failure leaves the plan untouched. */
  private def updateTable(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val table = query(ex).getOrElse("table", fail(400, "Table name is empty"))
    val cols = readJson(ex).path("UpdateCols")
    val edited = cols.fields().asScala.foldLeft[Either[String, ConversionPlan]](
      Right(plan)) { case (acc, entry) =>
      acc.flatMap { p =>
        val col = entry.getKey
        val v = entry.getValue
        if (v.path("Removed").asBoolean(false)) PlanEdits.removeColumn(p, table, col)
        else {
          val renamed = v.path("Rename").asText("") match {
            case "" => Right((p, col))
            case to if to == col => Right((p, col))
            case to => PlanEdits.renameColumn(p, table, col, to).map((_, to))
          }
          renamed.flatMap { case (p1, c1) =>
            val retyped = v.path("ToType").asText("") match {
              case "" => Right(p1)
              case t => parseType(t).flatMap(PlanEdits.changeType(p1, table, c1, _))
            }
            retyped.flatMap { p2 =>
              v.path("NotNull").asText("") match {
                case ""        => Right(p2)
                case "ADDED"   => PlanEdits.setNotNull(p2, table, c1, notNull = true)
                case "REMOVED" => PlanEdits.setNotNull(p2, table, c1, notNull = false)
                case other     => Left(s"bad NotNull value $other")
              }
            }
          }
        }
      }
    }
    edited match {
      case Left(err) => fail(412, err) // plan untouched — exact rollback
      case Right(p) =>
        s.commit(p)
        respond(ex, 200, planJson(p))
    }
  }

  /** Reference ToType values are bare Spanner scalar names ("STRING");
    * normalize to the ADT's render form before parsing. */
  private def parseType(t: String): Either[String, SpType] = {
    val norm = t match {
      case "STRING" => "STRING(MAX)"
      case "BYTES"  => "BYTES(MAX)"
      case other    => other
    }
    try Right(SpType.parse(norm))
    catch { case e: IllegalArgumentException => Left(e.getMessage) }
  }

  /** GET /setparent?table=&update= (web.go:449-507): interleave check,
    * optionally applied. */
  private def setParent(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val q = query(ex)
    val table = q.getOrElse("table", fail(400, "Table name is empty"))
    val update = q.get("update").contains("true")
    val o = mapper.createObjectNode()
    val st = o.putObject("tableInterleaveStatus")
    PlanEdits.setParent(plan, table) match {
      case Right(p) =>
        st.put("possible", true)
        st.put("parent", p.spSchema(table).parent.get)
        if (update) s.commit(p)
      case Left(err) =>
        st.put("possible", false)
        st.put("comment", err)
    }
    respond(ex, 200, o)
  }

  /** GET /drop/fk?table=&pos= (web.go:509-537): positional, like the
    * reference (its TODO about constraint names notwithstanding). */
  private def dropFk(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val q = query(ex)
    val table = q.getOrElse("table", fail(400, "Table name is empty"))
    val pos = q.get("pos").flatMap(_.toIntOption).getOrElse(fail(400, "No position found"))
    val t = plan.spSchema.getOrElse(table, fail(404, s"unknown table $table"))
    if (pos < 0 || pos >= t.fks.length) fail(400, s"no FK at position $pos")
    PlanEdits.dropForeignKey(plan, table, t.fks(pos).name) match {
      case Left(err) => fail(412, err)
      case Right(p)  => s.commit(p); respond(ex, 200, planJson(p))
    }
  }

  /** GET /drop/secondaryindex?table=&pos= (web.go:745-770). */
  private def dropIndex(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val q = query(ex)
    val table = q.getOrElse("table", fail(400, "Table name is empty"))
    val pos = q.get("pos").flatMap(_.toIntOption).getOrElse(fail(400, "No position found"))
    val t = plan.spSchema.getOrElse(table, fail(404, s"unknown table $table"))
    if (pos < 0 || pos >= t.indexes.length) fail(400, s"no index at position $pos")
    PlanEdits.dropIndex(plan, table, t.indexes(pos).name) match {
      case Left(err) => fail(412, err)
      case Right(p)  => s.commit(p); respond(ex, 200, planJson(p))
    }
  }

  /** POST /add/indexes (web.go:658-700). Body:
    * [{"table","name","unique","keys":[{"column","desc"}]}]. Atomic. */
  private def addIndexes(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val body = readJson(ex)
    if (!body.isArray) fail(400, "expected a JSON array of indexes")
    val edited = body.elements().asScala.foldLeft[Either[String, ConversionPlan]](
      Right(plan)) { (acc, n) =>
      acc.flatMap { p =>
        val keys = n.path("keys").elements().asScala.map(k =>
          SrcKey(k.path("column").asText, k.path("desc").asBoolean(false))).toSeq
        PlanEdits.addIndex(p, n.path("table").asText,
          SrcIndex(n.path("name").asText, n.path("unique").asBoolean(false), keys))
      }
    }
    edited match {
      case Left(err) => fail(412, err)
      case Right(p)  => s.commit(p); respond(ex, 200, planJson(p))
    }
  }

  /** POST /typemap/global (web.go:266-300): retype every column whose
    * SOURCE type name is in the map — driven over the Spanner schema so
    * prior edits (drops, renames) are preserved, exactly like the
    * reference's comment insists. */
  private def setTypeMapGlobal(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val body = readJson(ex)
    val typeMap = body.fields().asScala
      .map(e => e.getKey -> e.getValue.asText).toMap
    val spToSrc = plan.toSpannerTable.map(_.swap)
    val edited = plan.spSchema.keys.toSeq.sorted
      .foldLeft[Either[String, ConversionPlan]](Right(plan)) { (acc, spTable) =>
        acc.flatMap { p =>
          val srcTable = spToSrc(spTable)
          val colMap = p.toSpannerCols(srcTable)
          colMap.toSeq.sortBy(_._1)
            .foldLeft[Either[String, ConversionPlan]](Right(p)) {
              case (acc2, (srcCol, spCol)) =>
                acc2.flatMap { p2 =>
                  val srcType = p2.srcSchema(srcTable).colDefs(srcCol).tpe.name
                  typeMap.get(srcType) match {
                    case None => Right(p2)
                    case Some(t) => parseType(t)
                      .flatMap(PlanEdits.changeType(p2, spTable, spCol, _))
                  }
                }
            }
        }
      }
    edited match {
      case Left(err) => fail(412, err)
      case Right(p)  => s.commit(p); respond(ex, 200, planJson(p))
    }
  }

  /** POST /rename/fks?table= (web.go:539-599): atomic constraint-name
    * batch with validity + global-uniqueness checks in PlanEdits. */
  private def renameFks(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val table = query(ex).getOrElse("table", fail(400, "Table name is empty"))
    val renames = readJson(ex).fields().asScala
      .map(e => e.getKey -> e.getValue.asText).toMap
    PlanEdits.renameForeignKeys(plan, table, renames) match {
      case Left(err) => fail(400, err)
      case Right(p)  => s.commit(p); respond(ex, 200, planJson(p))
    }
  }

  /** POST /rename/indexes?table= (web.go:601-656). */
  private def renameIndexes(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val table = query(ex).getOrElse("table", fail(400, "Table name is empty"))
    val renames = readJson(ex).fields().asScala
      .map(e => e.getKey -> e.getValue.asText).toMap
    PlanEdits.renameIndexes(plan, table, renames) match {
      case Left(err) => fail(400, err)
      case Right(p)  => s.commit(p); respond(ex, 200, planJson(p))
    }
  }

  /** POST /connect (web.go:76-116 databaseConnection): validate + store
    * the live-DB config. The reference pings the database here; we can
    * only do that when a catalog factory is wired, in which case catalog
    * construction is the ping. */
  private def connectDb(ex: HttpExchange, s: WebSession): Unit = {
    val b = readJson(ex)
    val cfg = ConnectConfig(b.path("driver").asText(""), b.path("host").asText(""),
      b.path("port").asText(""), b.path("database").asText(""),
      b.path("user").asText(""), b.path("password").asText(""))
    if (!Set("postgres", "mysql").contains(cfg.driver))
      fail(400, s"Driver : '${cfg.driver}' is not supported")
    if (cfg.host.isEmpty || cfg.database.isEmpty)
      fail(400, "database configuration is incomplete")
    s.synchronized { s.connect = Some(cfg) }
    respond(ex, 200, textNode("connection configuration stored"))
  }

  /** GET /convert/infoschema (web.go:118-150 convertSchemaSQL): read the
    * live database's information_schema through the Catalog seam and
    * build the conversion plan. */
  private def convertInfoSchema(ex: HttpExchange, s: WebSession): Unit = {
    import graft.sources.jdbc.InfoSchema
    val cfg = s.connect.getOrElse(fail(404, "Database is not configured"))
    val factory = s.catalogFactory.getOrElse(fail(501,
      "live database access is not wired in this environment; " +
        "inject a catalog factory (PgJdbcCatalog/MySqlJdbcCatalog over " +
        "spark.read.jdbc in production)"))
    val (mapper, sysSchemas) = cfg.driver match {
      case "mysql" => (MySqlTypeMapper,
        Set("information_schema", "mysql", "performance_schema", "sys"))
      case _       => (PostgresTypeMapper, InfoSchema.PgSystemSchemas)
    }
    val (tables, order) = InfoSchema.readSchema(factory(cfg), sysSchemas)
    val plan = SchemaConverter.convert(mapper, tables, order)
    s.synchronized {
      s.driver = if (cfg.driver == "mysql") "mysql" else "postgres"
      s.plan = Some(plan)
      s.sessionFile = None
    }
    respond(ex, 200, planJson(plan))
  }

  /** GET /schema?dir= (web.go:403-420): write the pretty schema file,
    * return its absolute path. */
  private def schemaFile(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val dir = query(ex).getOrElse("dir",
      Files.createTempDirectory("graft_web").toString)
    Files.createDirectories(Paths.get(dir))
    val path = Paths.get(dir, "schema.txt").toAbsolutePath.toString
    DdlRender.writeSchemaFile(plan.spSchema, path, pretty = true, hadoopConf)
    respond(ex, 200, textNode(path))
  }

  /** GET /report?dir= (web.go:422-447): write the schema-mode report,
    * return its absolute path. */
  private def reportFile(ex: HttpExchange, s: WebSession): Unit = {
    val plan = requirePlan(s)
    val dir = query(ex).getOrElse("dir",
      Files.createTempDirectory("graft_web").toString)
    Files.createDirectories(Paths.get(dir))
    val path = Paths.get(dir, "report.txt").toAbsolutePath.toString
    Files.writeString(Paths.get(path), Report.render(s.driver, plan, Map.empty))
    respond(ex, 200, textNode(path))
  }

  // ------------------------------------------------------------ plumbing

  /** Compact plan summary the UI endpoints return (the reference encodes
    * its whole Conv; the session file is our full serialization). */
  private def planJson(plan: ConversionPlan): ObjectNode = {
    val o = mapper.createObjectNode()
    val tables = o.putArray("tables")
    plan.tableOrder.foreach { sp =>
      val t = plan.spSchema(sp)
      val e = tables.addObject()
      e.put("name", sp)
      t.parent.foreach(e.put("parent", _))
      val cols = e.putArray("cols")
      t.colNames.foreach { c =>
        val d = t.colDefs(c)
        val co = cols.addObject()
        co.put("name", c)
        co.put("type", d.t.render)
        co.put("notNull", d.notNull)
      }
      val fks = e.putArray("fks")
      t.fks.foreach(fk => fks.add(fk.name))
      val ixs = e.putArray("indexes")
      t.indexes.foreach(ix => ixs.add(ix.name))
    }
    o
  }

  private def textNode(s: String): JsonNode = mapper.getNodeFactory.textNode(s)

  private def readJson(ex: HttpExchange): JsonNode = {
    val bytes = ex.getRequestBody.readAllBytes()
    if (bytes.isEmpty) mapper.createObjectNode()
    else
      try mapper.readTree(new String(bytes, UTF_8))
      catch {
        case e: com.fasterxml.jackson.core.JsonProcessingException =>
          fail(400, s"Request Body parse error : ${e.getOriginalMessage}")
      }
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split('&').toSeq).getOrElse(Nil)
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(java.net.URLDecoder.decode(k, UTF_8) ->
            java.net.URLDecoder.decode(v, UTF_8))
          case _ => None
        }
      }.toMap

  private def respond(ex: HttpExchange, status: Int, body: JsonNode): Unit = {
    val bytes = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** Standalone entry: `runMain graft.web.WebApi <port>` — the
    * reference's `harbourbridge web` subcommand (web/web.go:1161-1166). */
  def main(args: Array[String]): Unit = {
    val port = args.headOption.flatMap(_.toIntOption).getOrElse(8080)
    val (server, _) = start(port)
    println(s"graft schema assistant listening on ${server.getAddress}")
  }
}
