package graft.sources.mysqldump

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.GraftSession

/** The DataSource V2 mysqldump table must be row-for-row identical to the
  * line-filtered reader (readInsertRaw) — same tuple lexing, escapes,
  * NULLs, DELIMITER-block exclusion, `__ragged` — while planning byte
  * chunks and honoring column pruning. */
class MySqlDumpV2SourceSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val fixture = "/root/repo/src/test/resources/fixtures/sample.mysqldump"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "(null)" else r.get(i).toString))
      .toSeq.sortBy(_.mkString(""))
  }

  private def v2(table: String, extra: (String, String)*) = {
    val r = spark.read.format("mysqldump").option("table", table)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load(fixture)
  }

  private def rawVia(table: String) = {
    val lines = graft.sources.DumpLines.indexed(spark, fixture)
    val (dump, _, blocks) = MySqlDumpReader.schemaPass(spark, lines)
    val cols = dump.insertCols(table).getOrElse(dump.tables(table).colNames)
    MySqlDumpReader.readInsertRaw(lines, table, cols, blocks)
  }

  test("row parity with readInsertRaw: column-less INSERT + escapes") {
    // customers: column-less extended INSERT (schema from CREATE TABLE),
    // backslash/'' escapes, embedded NULs, json braces inside strings
    assert(canon(v2("customers")) == canon(rawVia("customers")))
  }

  test("row parity with readInsertRaw: quoted identifiers table") {
    assert(canon(v2("order log")) == canon(rawVia("order log")))
  }

  test("tiny chunkBytes: many byte chunks over a multi-statement table") {
    // the fixture tables are single-statement (extent spans one line →
    // one chunk, asserted below); multi-partition splitting needs a dump
    // with many INSERT lines
    assert(v2("customers", "chunkBytes" -> "64").rdd.getNumPartitions == 1)
    val tmp = java.nio.file.Files.createTempFile("graft_v2_many", ".mysqldump")
    java.nio.file.Files.writeString(tmp,
      "CREATE TABLE t (\n  a bigint,\n  b varchar(10)\n);\n" +
        (0 until 20).map(i =>
          s"INSERT INTO `t` VALUES ($i,'v$i'),(${i + 100},'w$i');")
          .mkString("\n") + "\n")
    try {
      val df = spark.read.format("mysqldump").option("table", "t")
        .option("chunkBytes", "64").load(tmp.toString)
      assert(df.rdd.getNumPartitions > 8)
      assert(df.count() == 40)
      val whole = spark.read.format("mysqldump").option("table", "t")
        .load(tmp.toString)
      assert(canon(df) == canon(whole))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("column pruning reaches the scan") {
    val df = v2("customers").select("name")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("name"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("Alice", "Bob's shop"))
  }

  test("DELIMITER-block INSERTs are excluded (trigger bodies aren't data)") {
    // the fixture's trigger body contains an INSERT; the migration path
    // skips it and so must the V2 scan — the row counts agree
    assert(v2("customers").count() == rawVia("customers").count())
  }

  test("missing table errors with the available inventory") {
    val e = intercept[Exception] { v2("nope").collect() }
    assert(e.getMessage.contains("customers"))
  }

  test("disagreeing INSERT column lists refuse instead of mis-mapping") {
    val tmp = java.nio.file.Files.createTempFile("graft_v2_disagree", ".mysqldump")
    java.nio.file.Files.writeString(tmp,
      "CREATE TABLE t (\n  a text,\n  b text\n);\n" +
        "INSERT INTO `t` (`a`, `b`) VALUES ('1', '2');\n" +
        "INSERT INTO `t` (`b`, `a`) VALUES ('3', '4');\n")
    try {
      val e = intercept[Exception] {
        spark.read.format("mysqldump").option("table", "t")
          .load(tmp.toString).collect()
      }
      assert(e.getMessage.contains("disagree"))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("filter pushdown: readers skip non-matching tuples") {
    val df = v2("customers").filter(col("name") === "Bob's shop")
    assert(df.collect().map(_.getAs[String]("name")).toSeq == Seq("Bob's shop"))
    assert(v2("customers").filter(col("balance").isNull).count() == 1)
    assert(v2("customers").filter(col("balance").isNotNull).count() == 1)
  }

  test("scan reports per-table INSERT-byte statistics (broadcast eligibility)") {
    // exact byte length of the table's INSERT lines — strictly smaller
    // than the file (which also carries DDL and other tables), nonzero
    val fileLen = new java.io.File(fixture).length()
    val stats = v2("customers").queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 100 && stats.sizeInBytes < BigInt(fileLen))
  }
}
