package graft.sources.pgdump

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.GraftSession

/** The DataSource V2 pgdump table must be row-for-row identical to the
  * line-ranged reader (readCopyRaw) — same unescapes, same `\N`, same
  * `__ragged` marking — while planning byte-range partitions and honoring
  * column pruning. */
class PgDumpV2SourceSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val fixture = "/root/repo/src/test/resources/fixtures/sample.pgdump"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "(null)" else r.get(i).toString))
      .toSeq.sortBy(_.mkString(""))
  }

  private def v2(table: String, extra: (String, String)*) = {
    val r = spark.read.format("pgdump").option("table", table)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load(fixture)
  }

  private def rawVia(table: String) = {
    val (dump, _) = PgDumpReader.schemaPass(fixture)
    val lines = PgDumpReader.indexedLines(spark, fixture)
    PgDumpReader.readCopyRaw(lines, dump.copyBlocks.filter(_.table == table))
  }

  test("row parity with readCopyRaw: inventory (escapes, \\N, arrays)") {
    assert(canon(v2("inventory")) == canon(rawVia("inventory")))
  }

  test("row parity with readCopyRaw: quoted identifiers table") {
    assert(canon(v2("order log")) == canon(rawVia("order log")))
  }

  test("tiny chunkBytes: many byte-range partitions, identical rows") {
    val df = v2("inventory", "chunkBytes" -> "48")
    assert(df.rdd.getNumPartitions > 3)
    assert(canon(df) == canon(v2("inventory")))
  }

  test("column pruning reaches the scan") {
    val df = v2("inventory").select("sku")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("sku"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("tab\tsep", "widget-1", "widget-2"))
  }

  test("count() with empty projection") {
    assert(v2("inventory").count() == 3)
    assert(v2("order log").count() == 3)
  }

  test("column-less COPY falls back to CREATE TABLE order; ragged marked") {
    val tmp = java.nio.file.Files.createTempFile("graft_v2", ".pgdump")
    java.nio.file.Files.writeString(tmp,
      """CREATE TABLE bare (
        |    a text,
        |    b bigint
        |);
        |COPY bare FROM stdin;
        |x	1
        |short-row
        |y	2
        |\.
        |""".stripMargin)
    try {
      val df = spark.read.format("pgdump").load(tmp.toString) // sole table
      assert(df.columns.toSeq == Seq("a", "b", "__ragged"))
      val rows = df.collect().map(r =>
        (r.getString(0), Option(r.getString(1)), r.getBoolean(2))).toSet
      assert(rows == Set(("x", Some("1"), false),
        ("short-row", None, true), ("y", Some("2"), false)))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("missing table errors with the available inventory") {
    val e = intercept[Exception] { v2("nope").collect() }
    assert(e.getMessage.contains("inventory"))
  }

  test("INSERT-carried rows: parity with readInsertRaw (INSERT-only table)") {
    // the fixture's `unkeyed` table has no COPY block — only multi-tuple
    // INSERT statements with '' escapes and a NULL
    val (dump, _) = PgDumpReader.schemaPass(fixture)
    val lines = PgDumpReader.indexedLines(spark, fixture)
    val cols = dump.insertCols("unkeyed").getOrElse(dump.tables("unkeyed").colNames)
    val raw = PgDumpReader.readInsertRaw(lines, "unkeyed", cols)
    assert(canon(v2("unkeyed")) == canon(raw))
    assert(v2("unkeyed").count() == 3)
  }

  test("mixed COPY + INSERT table: rows union across both carriers") {
    val tmp = java.nio.file.Files.createTempFile("graft_v2_mixed", ".pgdump")
    java.nio.file.Files.writeString(tmp,
      """CREATE TABLE mixed (
        |    a text,
        |    b bigint
        |);
        |COPY mixed (a, b) FROM stdin;
        |c1	1
        |c2	2
        |\.
        |INSERT INTO mixed (a, b) VALUES ('i3', 3), ('i4', NULL);
        |""".stripMargin)
    try {
      val df = spark.read.format("pgdump").load(tmp.toString)
      val rows = df.collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(rows == Set(("c1", Some("1")), ("c2", Some("2")),
        ("i3", Some("3")), ("i4", None)))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("INSERT lookalike inside another table's COPY payload is data, not rows") {
    // t's INSERT extent brackets other's COPY payload, and that payload
    // contains a line that textually parses as an INSERT into t — it
    // must never be served as a row (payload regions are subtracted
    // from the INSERT chunk plan and excluded in the reader)
    val tmp = java.nio.file.Files.createTempFile("graft_v2_lookalike", ".pgdump")
    java.nio.file.Files.writeString(tmp,
      """CREATE TABLE t (
        |    a text
        |);
        |CREATE TABLE other (
        |    payload text
        |);
        |INSERT INTO t (a) VALUES ('real-1');
        |COPY other (payload) FROM stdin;
        |INSERT INTO t (a) VALUES ('phantom');
        |\.
        |INSERT INTO t (a) VALUES ('real-2');
        |""".stripMargin)
    try {
      val rows = spark.read.format("pgdump").option("table", "t")
        .load(tmp.toString).collect().map(_.getString(0)).toSet
      assert(rows == Set("real-1", "real-2"))
      // and the payload itself still reads intact as `other`
      val other = spark.read.format("pgdump").option("table", "other")
        .load(tmp.toString).collect().map(_.getString(0)).toSeq
      assert(other == Seq("INSERT INTO t (a) VALUES ('phantom');"))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("disagreeing INSERT column lists refuse instead of mis-mapping") {
    val tmp = java.nio.file.Files.createTempFile("graft_v2_disagree", ".pgdump")
    java.nio.file.Files.writeString(tmp,
      """CREATE TABLE t (
        |    a text,
        |    b text
        |);
        |INSERT INTO t (a, b) VALUES ('1', '2');
        |INSERT INTO t (b, a) VALUES ('3', '4');
        |""".stripMargin)
    try {
      val e = intercept[Exception] {
        spark.read.format("pgdump").option("table", "t")
          .load(tmp.toString).collect()
      }
      assert(e.getMessage.contains("disagree"))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("filter pushdown: readers skip non-matching rows, plan shows it") {
    val df = v2("inventory").filter(col("sku") === "widget-1")
    // the pushed filter appears in the scan (reported by pushedFilters);
    // the unescaped comparand means escaped fields still match correctly
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(df.collect().map(_.getAs[String]("sku")).toSeq == Seq("widget-1"))
    // escaped value: the raw field is "tab\\tsep", the data value has a TAB
    val esc = v2("inventory").filter(col("sku") === "tab\tsep")
    assert(esc.count() == 1)
    // IsNull / IsNotNull
    assert(v2("inventory").filter(col("qty").isNull).count() == 1)
    assert(v2("inventory").filter(col("qty").isNotNull).count() == 2)
  }

  test("scan reports payload-sized statistics (broadcast eligibility)") {
    // without SupportsReportStatistics a V2 relation sizes as
    // defaultSizeInBytes (effectively infinite) and could never win an
    // auto-broadcast join; the fixture payload is a few hundred bytes
    val stats = v2("inventory").queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 10000)
  }
}
