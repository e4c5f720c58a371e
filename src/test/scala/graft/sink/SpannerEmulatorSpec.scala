package graft.sink

import graft.sources.pgdump.PgDumpReader
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** REAL-Spanner validation of the engine's generated artifacts, against
  * the Cloud Spanner emulator's REST gateway — env-gated like the live
  * JDBC specs (set SPANNER_EMULATOR_GATEWAY=host:port of gateway_main;
  * `gcloud emulators spanner start` ships both servers).
  *
  * What this closes: DdlRender's "legal" DDL and DdlSink's
  * create-then-FK-backfill protocol had only golden-file checks — no
  * run had ever handed them to Spanner's own DDL parser. Here the
  * sample.pgdump schema (quoted identifiers, composite PK, arrays,
  * NUMERIC, synthetic-PK table, FK, unique index) is created on the
  * emulator verbatim from DdlSink.createStatements, the FK batch
  * applies through DdlSink.applySerially with a REST UpdateDatabaseDdl
  * executor — exactly the K2/K3 seam contract SpannerClientSink wires
  * to the Java client — and BatchWriter-shaped inserts commit and read
  * back with typed values (INT64/NUMERIC/BOOL/FLOAT64/TIMESTAMP/DATE/
  * BYTES/ARRAY). The Java-client module itself still needs an
  * artifact-access machine to compile (modules/README.md); this spec
  * pins everything on OUR side of that seam against a real server.
  */
class SpannerEmulatorSpec extends AnyFunSuite {
  private val gw = sys.env.get("SPANNER_EMULATOR_GATEWAY")

  private lazy val http = HttpClient.newHttpClient()
  private def call(method: String, path: String,
      body: String = ""): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://${gw.get}/v1$path"))
      .header("Content-Type", "application/json")
    val req = (method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }).build()
    val r = http.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def must(method: String, path: String, body: String = ""): String = {
    val (code, resp) = call(method, path, body)
    assert(code == 200, s"$method $path -> $code: $resp")
    resp
  }
  private def jq(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private val inst = "/projects/graft-p/instances/graft-it"
  private val db = s"$inst/databases/graftdb"

  test("generated DDL + FK backfill + typed mutations run on the emulator") {
    assume(gw.isDefined,
      "set SPANNER_EMULATOR_GATEWAY=host:port (REST gateway) to run")

    // the engine's own schema pipeline, nothing hand-written
    val schema = PgDumpReader
      .schemaPass("src/test/resources/fixtures/sample.pgdump")._2.spSchema
    val create = DdlSink.createStatements(schema)
    val fks = DdlSink.fkBackfillStatements(schema)
    assert(create.nonEmpty && fks.nonEmpty)

    call("DELETE", inst) // drop any previous run's state, errors ignored
    must("POST", "/projects/graft-p/instances",
      """{"instanceId": "graft-it", "instance": {"config":
        "projects/graft-p/instanceConfigs/emulator-config",
        "displayName": "graft", "nodeCount": 1}}""")
    // CREATE DATABASE with the engine's no-FK creation batch — Spanner's
    // own DDL parser accepts (or rejects) DdlRender's legal output here
    must("POST", s"$inst/databases",
      s"""{"createStatement": "CREATE DATABASE graftdb",
           "extraStatements": [${create.map(jq).mkString(",")}]}""")
    // K3: serial FK backfill through the injectable executor — the REST
    // UpdateDatabaseDdl in place of SpannerClientSink's admin client
    DdlSink.applySerially(fks, stmt =>
      must("PATCH", s"$db/ddl", s"""{"statements": [${jq(stmt)}]}"""): Unit)
    val ddlBack = must("GET", s"$db/ddl")
    assert(ddlBack.contains("FOREIGN KEY"),
      s"FK alters must be visible in the database DDL:\n$ddlBack")

    // BatchWriter-shaped inserts with every scalar family the fixture
    // exercises; Spanner REST encodes INT64/NUMERIC as JSON strings,
    // BYTES as base64, arrays element-wise
    val session = {
      val s = must("POST", s"$db/sessions")
      """"name"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(s).get.group(1)
    }
    def commit(mutations: String): Unit =
      must("POST", s"/${session}:commit",
        s"""{"singleUseTransaction": {"readWrite": {}},
             "mutations": [$mutations]}""": String): Unit
    commit("""{"insert": {"table": "inventory",
      "columns": ["sku", "owner_id", "qty", "price", "in_stock", "weight",
                  "added_at", "restock_on", "blob", "tags", "counts"],
      "values": [["widget-1", "u1", "42", "19.99", true, 1.5,
                  "2019-10-28T19:30:00Z", "2019-11-01", "AAG+7w==",
                  ["a", "b", "c d"], ["1", "2", null]]]}}""")
    // the FK is live: a child row referencing the parent commits...
    commit("""{"insert": {"table": "order_log",
      "columns": ["id", "order_ref", "note"],
      "values": [["1", "widget-1", "first"]]}}""")
    // ...and one referencing a missing parent must be REFUSED
    val (badCode, badBody) = call("POST", s"/${session}:commit",
      """{"singleUseTransaction": {"readWrite": {}},
         "mutations": [{"insert": {"table": "order_log",
           "columns": ["id", "order_ref", "note"],
           "values": [["2", "no-such-sku", "x"]]}}]}""")
    assert(badCode != 200 && badBody.contains("fk_sku"),
      s"FK violation must refuse, got $badCode: $badBody")

    val read = must("POST", s"/${session}:executeSql",
      """{"sql": "SELECT sku, qty, price, in_stock, weight, counts FROM inventory ORDER BY sku"}""")
    for (expect <- Seq("\"widget-1\"", "\"42\"", "\"19.99\"", "true", "1.5"))
      assert(read.contains(expect), s"missing $expect in:\n$read")

    call("DELETE", inst): Unit
  }
}
