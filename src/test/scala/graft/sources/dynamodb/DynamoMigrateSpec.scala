package graft.sources.dynamodb

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Canned control plane: fixed table list + DescribeTable metadata —
  * the reference's mocked dynamoClient posture
  * (dynamodb/schema_test.go). Pages the table list at 1 name per page
  * so the ListTables pagination drain is exercised too. */
private class FakeControlPlane(
    tables: Seq[DynamoControlPlane.TableDescription])
    extends DynamoControlPlane {
  def listTablesPage(exclusiveStart: Option[String]): (Seq[String], Option[String]) = {
    val names = tables.map(_.name)
    val from = exclusiveStart.map(s => names.indexOf(s) + 1).getOrElse(0)
    val page = names.slice(from, from + 1)
    (page, if (from + 1 < names.length) page.lastOption else None)
  }
  def describeTable(name: String): DynamoControlPlane.TableDescription =
    tables.find(_.name == name).getOrElse(sys.error(s"no table $name"))
}

/** Canned data plane keyed by table (FakeScanClient in DynamoScanSpec
  * covers the segment/pagination mechanics; this one adds the
  * multi-table dispatch the migration needs). */
private class FakeTableScan(items: Map[String, Seq[String]])
    extends DynamoScan.Client {
  def scanPage(table: String, segment: Int, totalSegments: Int,
      exclusiveStartKey: Option[String]): (Seq[String], Option[String]) = {
    val mine = items(table).zipWithIndex
      .filter { case (_, i) => i % totalSegments == segment }.map(_._1)
    (mine, None) // one page per segment — pagination tested elsewhere
  }
}

/** E2E of the `-driver=dynamodb` lifecycle (reference main.go:54-55 +
  * cmd/cmd.go): control-plane discovery → histogram inference →
  * conversion plan → Migrate's artifact set → segment-scan data pass →
  * parquet/quarantine/report, plus the staged schema-only/data-only
  * contract and --session restore. */
class DynamoMigrateSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private lazy val hc = spark.sessionState.newHadoopConf()

  // `users`: pk id (N), sort ts (N); name (S); score conflicted S-vs-N
  // (50/50 ⇒ String); bignum is a NumberString (>29 integer digits);
  // tags is an SS; one item MISSING the pk → quarantined (PK cols are
  // NOT NULL by inference, dynamodb/schema.go:268-272).
  private val userItems = Seq(
    """{"id":{"N":"1"},"ts":{"N":"10"},"name":{"S":"ann"},"score":{"N":"5"},"tags":{"SS":["a","b"]},"bignum":{"N":"123456789012345678901234567890123"}}""",
    """{"id":{"N":"2"},"ts":{"N":"20"},"name":{"S":"bo"},"score":{"S":"five"},"tags":{"SS":["c"]},"bignum":{"N":"223456789012345678901234567890123"}}""",
    """{"id":{"N":"3"},"ts":{"N":"30"},"name":{"S":"cy"},"score":{"N":"7"},"tags":{"SS":["d"]},"bignum":{"N":"323456789012345678901234567890123"}}""",
    """{"id":{"N":"4"},"ts":{"N":"40"},"name":{"S":"di"},"score":{"S":"nine"},"tags":{"SS":["e"]},"bignum":{"N":"423456789012345678901234567890123"}}""",
    """{"ts":{"N":"50"},"name":{"S":"ed"},"score":{"N":"1"},"tags":{"SS":["f"]},"bignum":{"N":"523456789012345678901234567890123"}}""")
  // `orders`: Map attr → JSON string; illegal source name needs fixing
  private val orderItems = (1 to 6).map(i =>
    s"""{"oid":{"S":"o$i"},"payload":{"M":{"qty":{"N":"$i"}}},"2nd field":{"N":"$i"}}""")

  private val control = new FakeControlPlane(Seq(
    DynamoControlPlane.TableDescription("users", Seq("id", "ts"),
      Seq(("by_name", Seq("name")))),
    DynamoControlPlane.TableDescription("orders", Seq("oid"))))
  private val scan = new FakeTableScan(
    Map("users" -> userItems, "orders" -> orderItems))

  test("full lifecycle: inference, artifacts, data, quarantine, report") {
    val out = java.nio.file.Files.createTempDirectory("graft-dyn-mig").toString
    val r = DynamoMigrate.run(spark, control, scan, out, totalSegments = 3)

    // A5 histogram inference drove the plan: conflicted score → String,
    // oversized bignum → NumberString → STRING, sets → ARRAY
    val ddl = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/schema.ddl.sql"))
    assert(ddl.contains("`users`") && ddl.contains("`orders`"))
    assert(ddl.contains("ARRAY<STRING(MAX)>")) // tags SS
    // key schema: partition + sort key are the PK, in order
    assert(ddl.replaceAll("\\s+", " ")
      .contains("PRIMARY KEY (`id`, `ts`)"))
    // GSI survives discovery
    assert(ddl.contains("by_name"))

    // artifact set matches Migrate's
    val files = new java.io.File(out).list().toSet
    for (a <- Seq("schema.ddl.txt", "schema.ddl.sql", "fk_backfill.sql",
        "session.json", "report.txt"))
      assert(files.contains(a), s"missing $a")

    // data pass: 4 good user rows, 1 quarantined (missing pk)
    assert(r.tables("users") === (5L, 1L)) // rows counts good+bad
    val users = spark.read.parquet(s"$out/users.parquet")
    assert(users.count() === 4)
    // conflicted column landed as STRING with stringified numbers
    val scores = users.select("score").collect().map(_.getString(0)).toSet
    assert(scores === Set("5", "7", "five", "nine"))
    // NUMERIC pk is DecimalType(38,9)
    assert(users.schema("id").dataType.typeName === "decimal(38,9)")
    assert(files.contains("users.bad.parquet"))
    assert(spark.read.parquet(s"$out/users.bad.parquet").count() === 1)

    // orders: Map serialized to JSON, illegal name fixed in Spanner
    assert(r.tables.exists { case (t, (rows, bad)) =>
      t == "orders" && rows === 6L && bad === 0L })
    val orders = spark.read.parquet(s"$out/orders.parquet")
    assert(orders.count() === 6)
    // N inside a Map stays a JSON string — DynamoDB numbers are
    // strings on the wire and the reference marshals the stripped
    // value's *string N unchanged (dynamodb/data.go:210-242)
    val payload = orders.filter(orders("oid") === "o2")
      .select("payload").head.getString(0)
    assert(payload === """{"qty":"2"}""")
    assert(orders.columns.exists(_ != "2nd field")) // name was fixed
    assert(!orders.columns.contains("2nd field"))

    assert(r.report.contains("Summary of Conversion"))
    // no statement-stats section for a non-dump driver (the reference's
    // report shows statement counts only for dump ingestion); per-table
    // analysis covers both tables
    assert(r.report.contains("Table users") && r.report.contains("Table orders"))
  }

  test("schema-sample-size bounds inference like the reference flag") {
    // sample of 4 items: the pk-less 5th item never reaches the
    // histogram, so id is present in every sampled row — still NOT NULL
    // — and the data pass (which does NOT sample) still quarantines it
    val out = java.nio.file.Files.createTempDirectory("graft-dyn-ss").toString
    val r = DynamoMigrate.run(spark, control, scan, out,
      schemaSampleSize = 4L, totalSegments = 1)
    assert(spark.read.parquet(s"$out/users.bad.parquet").count() === 1)
    assert(r.tables("users")._1 === 5L)
  }

  test("staged: schema-only, then data-only restored via --session") {
    val dirA = java.nio.file.Files.createTempDirectory("graft-dyn-sA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-dyn-sB").toString
    val r1 = DynamoMigrate.run(spark, control, scan, dirA, mode = "schema-only")
    assert(r1.tables.isEmpty)
    assert(new java.io.File(s"$dirA/session.json").exists())
    assert(!new java.io.File(s"$dirA/users.parquet").exists())
    // session EDITS land between the stages (the T8 staged workflow):
    // rename one column, remove another — the data pass must honor both
    val plan = graft.plan.SessionFile.read(s"$dirA/session.json", hc)
    val edited = graft.schema.PlanEdits
      .renameColumn(plan, "users", "name", "display_name")
      .flatMap(p => graft.schema.PlanEdits.removeColumn(p, "users", "score"))
      .getOrElse(fail("edits failed"))
    graft.plan.SessionFile.write(edited, s"$dirA/session.json", hc)
    // data-only into a DIFFERENT dir, naming dirA's session explicitly
    val r2 = DynamoMigrate.run(spark, control, scan, dirB, mode = "data-only",
      sessionPath = Some(s"$dirA/session.json"))
    assert(r2.tables("users") === (5L, 1L))
    val users = spark.read.parquet(s"$dirB/users.parquet")
    assert(users.count() === 4)
    assert(users.columns.contains("display_name") &&
      !users.columns.contains("name") && !users.columns.contains("score"))
    assert(!new java.io.File(s"$dirB/session.json").exists())
  }
}
