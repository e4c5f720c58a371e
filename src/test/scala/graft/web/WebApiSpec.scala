package graft.web

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** T8 delivery: the schema-assistant HTTP API driven over real sockets —
  * convert → inspect → edit (rename/retype/notnull/remove, atomic batch
  * rollback) → interleave → session persist/resume → DDL round-trip
  * (reference: web/web.go:152-507 + web_test.go's handler tests). */
class WebApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private var server: com.sun.net.httpserver.HttpServer = _
  private var session: WebSession = _
  private def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def beforeAll(): Unit = {
    val (s, st) = WebApi.start(0)
    server = s
    session = st
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def http(method: String, path: String, body: String = null):
      (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val conn = URI.create(base + path).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    if (body != null) {
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      os.write(body.getBytes(UTF_8)); os.close()
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = new String(is.readAllBytes(), UTF_8)
    (code, mapper.readTree(text))
  }

  private def convert(): Unit = {
    val (code, _) = http("POST", "/convert/dump",
      """{"driver":"pgdump","filePath":"src/test/resources/fixtures/sample.pgdump"}""")
    assert(code === 200)
  }

  test("GET / serves the assistant UI; an unroutable path 404s") {
    val conn = URI.create(base + "/").toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    assert(conn.getResponseCode === 200)
    assert(conn.getContentType.startsWith("text/html"))
    val html = new String(conn.getInputStream.readAllBytes(), UTF_8)
    // the page drives the real routes — pin the load + edit + persist hooks
    assert(html.contains("graft schema assistant"))
    Seq("/convert/dump", "/session/resume", "/typemap/global", "/setparent",
      "/conversion", "/ddl", "/table/report").foreach(r => assert(html.contains(r), r))
    // drill-down + artifact downloads (the reference UI's per-table
    // report panes and download affordances)
    Seq("drillDown", "downloadReport", "downloadDdl")
      .foreach(h => assert(html.contains(h), h))
    // the table editor (type-alternative picker over POST /typemap/table)
    // is part of the bundled asset: its grid, its route, and the
    // alternative list the reference UI offers — plus the built-in
    // manual (the reference ships user-manual assets beside its UI)
    assert(html.contains("tableEditor"))
    assert(html.contains("id=\"manual\""))
    assert(html.contains("Workflow: dump"))
    assert(html.contains("/typemap/table?table="))
    Seq("STRING(MAX)", "INT64", "NUMERIC", "TIMESTAMP")
      .foreach(t => assert(html.contains(t), t))
    // "/" is the catch-all context: junk paths must 404, not serve HTML
    val (code404, _) = http("GET", "/no/such/route")
    assert(code404 === 404)
  }

  test("endpoints require a converted schema") {
    session.synchronized { session.plan = None }
    val (code, _) = http("GET", "/ddl")
    assert(code === 404)
  }

  test("convert/dump → ddl lists every table's CREATE TABLE") {
    convert()
    val (code, ddl) = http("GET", "/ddl")
    assert(code === 200)
    assert(ddl.has("inventory") && ddl.has("order_log") && ddl.has("unkeyed"))
    assert(ddl.get("inventory").asText.contains("CREATE TABLE inventory"))
    assert(ddl.get("order_log").asText.contains("order_ref"))
  }

  test("typemap lists source types in use with default mappings") {
    convert()
    val (_, tm) = http("GET", "/typemap")
    assert(tm.get("bigint").get("spType").asText === "INT64")
    assert(tm.get("integer").get("spType").asText === "INT64")
    assert(tm.get("integer").get("issues").get(0).asText === "Widened")
  }

  test("conversion rates and summary render per table") {
    convert()
    val (_, rate) = http("GET", "/conversion")
    assert(rate.get("unkeyed").asText.contains("missing primary key"))
    val (_, sum) = http("GET", "/summary")
    assert(sum.get("inventory").asText.contains("Note"))
    val (_, overview) = http("GET", "/overview")
    assert(overview.asText.contains("Summary of Conversion"))
  }

  test("table/report drills one table down: rating + issues + DDL in one response") {
    convert()
    // by Spanner name
    val (code, r) = http("GET", "/table/report?table=unkeyed")
    assert(code === 200)
    assert(r.get("spTable").asText === "unkeyed")
    assert(r.get("rating").asText.contains("missing primary key"))
    assert(r.get("ddl").asText.contains("CREATE TABLE"))
    // the issue text matches /summary's for the same source table
    val (_, sum) = http("GET", "/summary")
    val (_, inv) = http("GET", "/table/report?table=inventory")
    assert(inv.get("issues").asText === sum.get("inventory").asText)
    assert(inv.get("srcTable").asText === "inventory")
    // source-table names resolve too; unknown tables 404
    val (c2, bySrc) = http("GET", "/table/report?table=inventory")
    assert(c2 === 200 && bySrc.get("spTable").asText.nonEmpty)
    val (c3, _) = http("GET", "/table/report?table=nope")
    assert(c3 === 404)
    val (c4, _) = http("GET", "/table/report")
    assert(c4 === 400)
  }

  test("typemap/table applies rename+retype+notnull and renders into DDL") {
    convert()
    val (code, _) = http("POST", "/typemap/table?table=inventory",
      """{"UpdateCols": {
        |  "qty":   {"Rename": "quantity", "NotNull": "ADDED"},
        |  "note3": {},
        |  "weight": {"ToType": "STRING(40)"}
        |}}""".stripMargin)
    assert(code === 200)
    val (_, ddl) = http("GET", "/ddl")
    val inv = ddl.get("inventory").asText
    assert(inv.contains("quantity INT64 NOT NULL"))
    assert(inv.contains("weight STRING(40)"))
    assert(!inv.contains("qty INT64"))
  }

  test("a failing batch edit rolls back atomically") {
    convert()
    val before = http("GET", "/ddl")._2.get("inventory").asText
    // rename applies first in the batch, then the PK-column removal fails
    val (code, err) = http("POST", "/typemap/table?table=inventory",
      """{"UpdateCols": {
        |  "weight": {"Rename": "mass"},
        |  "sku":    {"Removed": true}
        |}}""".stripMargin)
    assert(code === 412)
    assert(err.asText.contains("primary key"))
    val after = http("GET", "/ddl")._2.get("inventory").asText
    assert(after === before) // the successful rename did NOT leak through
  }

  test("column remove updates DDL; removing a PK column is refused") {
    convert()
    val (code, _) = http("POST", "/typemap/table?table=inventory",
      """{"UpdateCols": {"blob": {"Removed": true}}}""")
    assert(code === 200)
    assert(!http("GET", "/ddl")._2.get("inventory").asText.contains("blob"))
    val (code2, _) = http("POST", "/typemap/table?table=inventory",
      """{"UpdateCols": {"sku": {"Removed": true}}}""")
    assert(code2 === 412)
  }

  test("setparent interleaves order_log under inventory only when PK-prefixed") {
    convert()
    // order_log's FK (order_ref → inventory.sku) is not a PK prefix of
    // order_log's own PK (id), so interleave must be refused.
    val (_, st) = http("GET", "/setparent?table=order_log&update=true")
    assert(st.get("tableInterleaveStatus").get("possible").asBoolean === false)
  }

  test("drop/fk and drop/secondaryindex are positional like the reference") {
    convert()
    val (code, plan) = http("GET", "/drop/fk?table=order_log&pos=0")
    assert(code === 200)
    assert(plan.get("tables").elements().asScala
      .find(_.get("name").asText == "order_log").get.get("fks").size === 0)
    val (code2, _) = http("GET", "/drop/fk?table=order_log&pos=0")
    assert(code2 === 400) // nothing left at position 0
    val (code3, plan3) = http("GET", "/drop/secondaryindex?table=inventory&pos=0")
    assert(code3 === 200)
    assert(plan3.get("tables").elements().asScala
      .find(_.get("name").asText == "inventory").get.get("indexes").size === 0)
  }

  test("add/indexes validates columns and is atomic") {
    convert()
    val (code, _) = http("POST", "/add/indexes",
      """[{"table":"inventory","name":"idx_price","unique":false,
        |  "keys":[{"column":"price"}]}]""".stripMargin)
    assert(code === 200)
    // second batch: one good + one bad column → whole batch refused
    val (code2, _) = http("POST", "/add/indexes",
      """[{"table":"inventory","name":"idx_ok","unique":false,"keys":[{"column":"sku"}]},
        |{"table":"inventory","name":"idx_bad","unique":false,"keys":[{"column":"nope"}]}]""".stripMargin)
    assert(code2 === 412)
    assert(session.plan.get.spSchema("inventory").indexes.map(_.name) ===
      Seq("idx_qty", "idx_price"))
  }

  test("typemap/global retypes by source type, preserving prior edits") {
    convert()
    // prior per-column edit survives the global retype (the reference
    // drives the retype over the Spanner schema for exactly this reason)
    val (c0, _) = http("POST", "/typemap/table?table=unkeyed",
      """{"UpdateCols": {"hits": {"Rename": "hit_count"}}}""")
    assert(c0 === 200)
    val (code, _) = http("POST", "/typemap/global",
      """{"bigint": "STRING(50)", "integer": "STRING(MAX)"}""")
    assert(code === 200)
    val ddl = http("GET", "/ddl")._2
    assert(ddl.get("order_log").asText.contains("id STRING(50)"))
    assert(ddl.get("unkeyed").asText.contains("hit_count STRING(MAX)"))
    // non-mapped types untouched
    assert(ddl.get("inventory").asText.contains("weight FLOAT64"))
  }

  test("rename/fks and rename/indexes enforce the global namespace") {
    convert()
    val (code, plan) = http("POST", "/rename/fks?table=order_log",
      """{"fk_sku": "fk_sku_renamed"}""")
    assert(code === 200)
    assert(plan.get("tables").elements().asScala
      .find(_.get("name").asText == "order_log").get
      .get("fks").get(0).asText === "fk_sku_renamed")
    // collides with an existing table name → refused
    val (c2, err) = http("POST", "/rename/fks?table=order_log",
      """{"fk_sku_renamed": "inventory"}""")
    assert(c2 === 400)
    assert(err.asText.contains("already in use"))
    // index rename with an illegal identifier → refused
    val (c3, _) = http("POST", "/rename/indexes?table=inventory",
      """{"idx_qty": "bad name!"}""")
    assert(c3 === 400)
    val (c4, plan4) = http("POST", "/rename/indexes?table=inventory",
      """{"idx_qty": "idx_quantity"}""")
    assert(c4 === 200)
    assert(plan4.get("tables").elements().asScala
      .find(_.get("name").asText == "inventory").get
      .get("indexes").get(0).asText === "idx_quantity")
    // a stray key naming an unrelated entity must NOT vacate its name:
    // only names the rename actually frees leave the used set
    val (c5, err5) = http("POST", "/rename/fks?table=order_log",
      """{"inventory": "x", "fk_sku": "inventory"}""")
    assert(c5 === 400)
    assert(err5.asText.contains("already in use"))
  }

  test("add/indexes enforces the shared constraint namespace") {
    convert()
    // an index named like an existing table is a Spanner name collision
    val (code, err) = http("POST", "/add/indexes",
      """[{"table":"inventory","name":"order_log","unique":false,
        |"keys":[{"column":"price"}]}]""".stripMargin)
    assert(code === 412)
    assert(err.asText.contains("already in use"))
  }

  test("session resume restores the driver tag") {
    convert()
    val dir = java.nio.file.Files.createTempDirectory("graft_web_drv").toString
    val path = http("GET", s"/session?dir=$dir")._2.get("path").asText
    // simulate a fresh process: plan AND driver gone
    session.synchronized { session.plan = None; session.driver = "" }
    assert(http("POST", "/session/resume", s"""{"path":"$path"}""")._1 === 200)
    val (code, tm) = http("GET", "/typemap") // driver-keyed endpoint
    assert(code === 200)
    assert(tm.get("bigint").get("spType").asText === "INT64")
  }

  test("malformed JSON is a 400, not a 500") {
    convert()
    val (code, err) = http("POST", "/typemap/table?table=inventory", "{not json")
    assert(code === 400)
    assert(err.asText.contains("parse error"))
  }

  test("connect + convert/infoschema drive a live-DB conversion via the catalog seam") {
    import graft.sources.jdbc.InfoSchema._
    // canned catalog injected where PgJdbcCatalog would connect — the
    // reference's mocked-sql-driver test strategy
    session.synchronized {
      session.catalogFactory = Some(_ => new Catalog {
        def tables() = Seq(TableId("public", "accounts"))
        def columns(t: TableId) = Seq(
          ColumnRow("id", "bigint", None, "NO", hasDefault = false, None, None, None),
          ColumnRow("name", "text", None, "YES", hasDefault = false, None, None, None))
        def constraints(t: TableId) = Seq(ConstraintRow("id", "PRIMARY KEY"))
        def foreignKeys(t: TableId) = Nil
        def indexes(t: TableId) = Nil
      })
    }
    // missing config → 404; bad driver → 400
    session.synchronized { session.connect = None }
    assert(http("GET", "/convert/infoschema")._1 === 404)
    assert(http("POST", "/connect",
      """{"driver":"oracle","host":"h","database":"d"}""")._1 === 400)
    val (c1, _) = http("POST", "/connect",
      """{"driver":"postgres","host":"db.example","port":"5432",
        |"database":"prod","user":"u","password":"p"}""".stripMargin)
    assert(c1 === 200)
    val (c2, plan) = http("GET", "/convert/infoschema")
    assert(c2 === 200)
    val acct = plan.get("tables").elements().asScala
      .find(_.get("name").asText == "accounts").get
    assert(acct.get("cols").get(0).get("name").asText === "id")
    assert(http("GET", "/ddl")._2.get("accounts").asText
      .contains("name STRING(MAX)"))
  }

  test("schema and report file endpoints write artifacts and return paths") {
    convert()
    val dir = java.nio.file.Files.createTempDirectory("graft_web_files").toString
    val (c1, schemaPath) = http("GET", s"/schema?dir=$dir")
    assert(c1 === 200)
    val schemaTxt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(schemaPath.asText))
    assert(schemaTxt.contains("CREATE TABLE inventory"))
    val (c2, reportPath) = http("GET", s"/report?dir=$dir")
    assert(c2 === 200)
    val reportTxt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(reportPath.asText))
    assert(reportTxt.contains("Summary of Conversion"))
  }

  test("session persist, edit auto-persist, and resume round-trip") {
    convert()
    val dir = java.nio.file.Files.createTempDirectory("graft_web_spec").toString
    val (_, created) = http("GET", s"/session?dir=$dir")
    val path = created.get("path").asText
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))

    // an edit while a session file is attached re-persists it
    val (code, _) = http("POST", "/typemap/table?table=unkeyed",
      """{"UpdateCols": {"label": {"Rename": "tag"}}}""")
    assert(code === 200)

    // clobber the in-memory session, then resume from disk
    session.synchronized { session.plan = None }
    val (code2, _) = http("POST", "/session/resume", s"""{"path":"$path"}""")
    assert(code2 === 200)
    val (_, ddl) = http("GET", "/ddl")
    assert(ddl.get("unkeyed").asText.contains("tag STRING(MAX)"))
    assert(!ddl.get("unkeyed").asText.contains("label STRING"))
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
