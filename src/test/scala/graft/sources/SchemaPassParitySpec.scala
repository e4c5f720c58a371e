package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.sources.pgdump.{PgDumpParser, PgDumpReader}
import graft.sources.mysqldump.{MySqlDumpParser, MySqlDumpReader}

/** The distributed schema pass must produce the SAME DumpSchema as the
  * sequential driver scan — same tables, same COPY line ranges, same
  * stats, same unparseable accounting — on every fixture we have,
  * including the reference's own dumps. This is the contract that lets
  * the migration path run boundary discovery on executors. */
class SchemaPassParitySpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def pgBoth(path: String) = {
    val seq = PgDumpReader.schemaPass(path)._1
    val dist = PgDumpReader.schemaPass(spark,
      DumpLines.indexed(spark, path))._1
    (seq, dist)
  }

  private def myBoth(path: String) = {
    val seq = MySqlDumpReader.schemaPass(path)._1
    val (dist, _, _) = MySqlDumpReader.schemaPass(spark,
      DumpLines.indexed(spark, path))
    (seq, dist)
  }

  private def assertPgEqual(seq: PgDumpParser.DumpSchema,
      dist: PgDumpParser.DumpSchema): Unit = {
    assert(dist.tables === seq.tables)
    assert(dist.tableOrder === seq.tableOrder)
    assert(dist.copyBlocks === seq.copyBlocks) // exact line ranges
    assert(dist.insertCols === seq.insertCols)
    assert(dist.timezone === seq.timezone)
    assert(dist.statementStats === seq.statementStats)
    assert(dist.unparseable.sorted === seq.unparseable.sorted)
  }

  private def assertMyEqual(seq: MySqlDumpParser.DumpSchema,
      dist: MySqlDumpParser.DumpSchema): Unit = {
    assert(dist.tables === seq.tables)
    assert(dist.tableOrder === seq.tableOrder)
    assert(dist.insertCols === seq.insertCols)
    assert(dist.timezoneOffset === seq.timezoneOffset)
    assert(dist.statementStats === seq.statementStats)
    assert(dist.unparseable.sorted === seq.unparseable.sorted)
  }

  test("pg: repo fixture (COPY + INSERT mix)") {
    val (seq, dist) = pgBoth("src/test/resources/fixtures/sample.pgdump")
    assert(seq.copyBlocks.nonEmpty && seq.insertCols.nonEmpty) // exercises both paths
    assertPgEqual(seq, dist)
  }

  test("pg: reference example dumps") {
    Seq("/root/reference/examples/singers.pg_dump",
        "/root/reference/examples/cart.pg_dump").foreach { p =>
      val (seq, dist) = pgBoth(p)
      assertPgEqual(seq, dist)
    }
  }

  test("pg: multi-COPY-block dump with traps resolves identical ranges") {
    // traps: a payload line that LOOKS like a COPY header (single-column
    // text table), an unknown-table COPY, an unterminated trailing COPY,
    // INSERTs for known and unknown tables
    val dump =
      """CREATE TABLE a (x bigint);
        |CREATE TABLE t (s text);
        |COPY a (x) FROM stdin;
        |1
        |2
        |\.
        |COPY t (s) FROM stdin;
        |COPY fake (y) FROM stdin;
        |plain line
        |\.
        |INSERT INTO a (x) VALUES (3);
        |INSERT INTO ghost (g) VALUES (1);
        |COPY ghost (g) FROM stdin;
        |99
        |\.
        |COPY a (x) FROM stdin;
        |4
        |""".stripMargin // last COPY unterminated
    val p = java.nio.file.Files.createTempFile("graft-parity", ".pgdump")
    java.nio.file.Files.writeString(p, dump)
    val (seq, dist) = pgBoth(p.toString)
    assert(seq.copyBlocks.map(b => (b.table, b.startLine, b.endLine)) ===
      Seq(("a", 3L, 5L), ("t", 7L, 9L))) // trap line is payload, not a header
    assertPgEqual(seq, dist)
    // the payload line that looks like a COPY header arrived as data
    val m = PgDumpReader.migrate(spark, p.toString)
    assert(m.tables("t")._1.collect().map(_.getString(0)).toSet ===
      Set("COPY fake (y) FROM stdin;", "plain line"))
  }

  test("mysql: repo fixture + reference example dumps") {
    Seq("src/test/resources/fixtures/sample.mysqldump",
        "/root/reference/examples/singers.mysqldump",
        "/root/reference/examples/cart.mysqldump").foreach { p =>
      val (seq, dist) = myBoth(p)
      assertMyEqual(seq, dist)
    }
  }

  test("mysql: DELIMITER-block INSERT is skipped by schema AND data pass") {
    val dump =
      """CREATE TABLE `a` (`x` bigint(20));
        |INSERT INTO `a` VALUES (7);
        |DELIMITER ;;
        |CREATE TRIGGER tg AFTER INSERT ON a FOR EACH ROW BEGIN
        |INSERT INTO `a` VALUES (999);
        |END ;;
        |DELIMITER ;
        |INSERT INTO `a` VALUES (8);
        |""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft-parity", ".mysqldump")
    java.nio.file.Files.writeString(p, dump)
    val (seq, dist) = myBoth(p.toString)
    assertMyEqual(seq, dist)
    assert(dist.statementStats("insert") === 2)
    assert(dist.statementStats("skippedInDelimiterBlock") >= 1)
    // the trigger-body INSERT must not be ingested as a data row
    val m = MySqlDumpReader.migrate(spark, p.toString)
    assert(m.tables("a")._1.collect().map(_.getLong(0)).sorted.toSeq === Seq(7L, 8L))
  }
}
