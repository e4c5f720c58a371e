package graft.sources.jdbc

import org.scalatest.funsuite.AnyFunSuite

/** Env-gated live-database integration: schema + data conversion against
  * a real PostgreSQL / MySQL through [[JdbcMigrate]], mirroring the
  * reference's testing/postgres/integration_test.go:220-348 and
  * testing/mysql/integration_test.go (which skip unless their
  * HARBOURBRIDGE_TESTS_GCLOUD_* env is present) and the repo's own
  * modules/ suites (SpannerIntegrationSpec, AwsDynamoIntegrationSpec):
  * without the env vars below each test is CANCELED, so the suite
  * compiles and passes everywhere.
  *
  *   GRAFT_TESTS_PG_URL     full JDBC url incl. credentials, e.g.
  *                          jdbc:postgresql://localhost:5432/graft?user=u&password=p
  *   GRAFT_TESTS_MYSQL_URL  e.g. jdbc:mysql://localhost:3306/graft?user=u&password=p
  *   GRAFT_TESTS_MYSQL_DB   the MySQL database (schema) name to scan
  *
  * The matching vendor JDBC driver jar must be on the classpath (e.g.
  * dropped into the Spark jars dir); both the fixture setup
  * (DriverManager) and the distributed read (spark.read.jdbc) use it.
  */
class JdbcIntegrationSpec extends AnyFunSuite {
  private lazy val spark = graft.GraftSession.build("graft-jdbc-it")

  private def withConn(url: String)(f: java.sql.Connection => Unit): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(c: java.sql.Connection, sqls: String*): Unit = {
    val st = c.createStatement()
    try sqls.foreach(st.execute) finally st.close()
  }

  test("postgres: live schema+data migrate, counts and values round-trip") {
    assume(sys.env.contains("GRAFT_TESTS_PG_URL"), "set GRAFT_TESTS_PG_URL")
    val url = sys.env("GRAFT_TESTS_PG_URL")
    val out = java.nio.file.Files.createTempDirectory("graft_jdbc_it_pg").toString
    withConn(url) { c =>
      exec(c,
        "DROP TABLE IF EXISTS it_orders", "DROP TABLE IF EXISTS it_customers",
        """CREATE TABLE it_customers (
             id BIGINT PRIMARY KEY, name TEXT NOT NULL, balance NUMERIC(10,2),
             joined DATE, active BOOLEAN, tags TEXT[])""",
        """CREATE TABLE it_orders (
             oid BIGINT PRIMARY KEY, cust BIGINT REFERENCES it_customers(id),
             amount DOUBLE PRECISION)""",
        """INSERT INTO it_customers VALUES
             (1, 'ann', 10.50, '2024-01-02', true, '{"a","b"}'),
             (2, 'bo''b', NULL, NULL, false, NULL)""",
        "INSERT INTO it_orders VALUES (10, 1, 99.25), (11, 2, 0.5), (12, 1, 7)")
    }
    val r = JdbcMigrate.run(spark, "postgres", url,
      new java.util.Properties(), None, out,
      partitionHints = Map("it_customers" -> "id"))
    // counts per converted table (reference asserts row counts the same
    // way after its data pass)
    assert(r.tables.exists { case (t, n) => t.contains("it_customers") && n == 2 })
    assert(r.tables.exists { case (t, n) => t.contains("it_orders") && n == 3 })
    // schema artifacts: both tables present, FK captured in the plan
    val ddl = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/schema.ddl.sql"))
    assert(ddl.contains("it_customers") && ddl.contains("it_orders"))
    assert(r.plan.srcSchema("it_orders").foreignKeys.nonEmpty)
    // typed values survive the C13 projection (NUMERIC → DECIMAL(38,9),
    // BOOL stays BOOL, quoted text unmangled)
    val spCust = r.tables.keys.find(_.contains("it_customers")).get
    val rows = spark.read.parquet(s"$out/$spCust.parquet")
      .orderBy("id").collect()
    assert(rows.length === 2)
    assert(rows(1).getAs[String]("name") === "bo'b")
    assert(rows(0).getAs[java.math.BigDecimal]("balance")
      .compareTo(new java.math.BigDecimal("10.50")) === 0)
    // S7's headline claim over the reference's serial loop
    // (postgres/infoschema.go:76-126): the MIN/MAX-probed stride bounds
    // must actually spread a live serial-PK read across >1 non-empty
    // partition — the old [0, 2^40) default served everything from one.
    val part = JdbcData.readTable(spark, url, new java.util.Properties(),
      "it_orders", partitionCol = Some("oid"), numPartitions = 3)
    val sizes = part.rdd.mapPartitionsWithIndex((i, it) => Iterator(i -> it.size))
      .collect().toMap
    assert(sizes.count(_._2 > 0) > 1, s"degenerate live partitions: $sizes")
  }

  test("mysql: live schema+data migrate, spatial-free happy path") {
    assume(sys.env.contains("GRAFT_TESTS_MYSQL_URL") &&
      sys.env.contains("GRAFT_TESTS_MYSQL_DB"),
      "set GRAFT_TESTS_MYSQL_URL and GRAFT_TESTS_MYSQL_DB")
    val url = sys.env("GRAFT_TESTS_MYSQL_URL")
    val db = sys.env("GRAFT_TESTS_MYSQL_DB")
    val out = java.nio.file.Files.createTempDirectory("graft_jdbc_it_my").toString
    withConn(url) { c =>
      exec(c,
        "DROP TABLE IF EXISTS it_products",
        """CREATE TABLE it_products (
             id BIGINT PRIMARY KEY, sku VARCHAR(32) NOT NULL UNIQUE,
             qty INT, flag TINYINT(1), added DATETIME)""",
        """INSERT INTO it_products VALUES
             (1, 'sku-1', 5, 1, '2024-03-04 05:06:07'),
             (2, 'sku-2', NULL, 0, NULL)""")
    }
    val r = JdbcMigrate.run(spark, "mysql", url,
      new java.util.Properties(), Some(db), out)
    assert(r.tables.exists { case (t, n) => t.contains("it_products") && n == 2 })
    val spProd = r.tables.keys.find(_.contains("it_products")).get
    val rows = spark.read.parquet(s"$out/$spProd.parquet")
      .orderBy("id").collect()
    assert(rows(0).getAs[String]("sku") === "sku-1")
  }
}
