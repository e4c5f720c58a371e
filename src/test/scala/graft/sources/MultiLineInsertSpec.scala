package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Wrapped (multi-line) INSERT statements — the reference's chunked
  * parser consumes statements spanning lines (mysql/mysqldump.go:80-125);
  * the V2 sources must too: discovery indexes statement STARTS whether
  * or not the line carries the terminating ';', and the readers
  * assemble continuation lines with the dialect's quote rules before
  * lexing. Covers `--column-inserts`-style one-tuple-per-statement
  * wrapping, VALUES on a later line, string values containing
  * semicolons/quotes across lines, and tiny chunk sizes that force the
  * assembly to cross chunk boundaries. */
class MultiLineInsertSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def write(name: String, content: String): String = {
    val f = Files.createTempFile(name, ".dump")
    Files.writeString(f, content)
    f.toFile.deleteOnExit()
    f.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
    df.collect().map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) "(null)" else r.get(i).toString)).toSet

  test("pg: wrapped INSERTs with VALUES on later lines and embedded ';'") {
    val dump = write("pg_ml_", """CREATE TABLE t (
      |    a bigint,
      |    b text
      |);
      |INSERT INTO t (a, b) VALUES
      |    (1, 'one'),
      |    (2, 'semi;colon');
      |INSERT INTO t (a, b)
      |VALUES (3, 'quote''s
      |newline');
      |INSERT INTO t (a, b) VALUES (4, 'single line');
      |""".stripMargin)
    val df = spark.read.format("pgdump").option("table", "t").load(dump)
    assert(rows(df) === Set(
      Seq("1", "one", "false"),
      Seq("2", "semi;colon", "false"),
      Seq("3", "quote's\nnewline", "false"),
      Seq("4", "single line", "false")))
  }

  test("pg: assembly is exactly-once across forced chunk boundaries") {
    // 50 column-inserts-style statements, EACH wrapped over three lines:
    // 64-byte chunks put boundaries inside statements, so exactly-once
    // depends on the start-owning-chunk rule + continuation skipping
    val stmts = (0 until 50).map(i =>
      s"INSERT INTO t (a, b) VALUES\n    ($i,\n    'row $i wrapped');")
      .mkString("\n")
    val dump = write("pg_chunk_", s"CREATE TABLE t (a bigint, b text);\n$stmts\n")
    val df = spark.read.format("pgdump").option("table", "t")
      .option("chunkBytes", "64").load(dump)
    assert(df.rdd.getNumPartitions > 1, "tiny chunks must split the extent")
    assert(df.count() === 50)
    assert(rows(df.filter(col("a") === "7")) === Set(Seq("7", "row 7 wrapped", "false")))
  }

  test("pg: V2 output matches migrate() on a mixed wrapped dump") {
    val dump = write("pg_mix_", """CREATE TABLE m (x bigint, y text);
      |INSERT INTO m (x, y) VALUES
      |    (10, 'alpha'),
      |    (11, 'beta');
      |INSERT INTO m (x, y) VALUES (12, 'gamma');
      |""".stripMargin)
    val viaV2 = spark.read.format("pgdump").option("table", "m").load(dump)
      .filter(!col("__ragged")).select("x", "y")
    val m = graft.sources.pgdump.PgDumpReader.migrate(spark, dump)
    try {
      val good = m.tables("m")._1.select(col("x").cast("string"), col("y"))
      assert(rows(viaV2) === rows(good))
      assert(viaV2.count() === 3)
    } finally m.release()
  }

  test("mysql: wrapped extended INSERT with backslash escapes across lines") {
    val dump = write("my_ml_", """CREATE TABLE `t` (
      |  `a` bigint,
      |  `b` varchar(50)
      |);
      |INSERT INTO `t` (`a`, `b`) VALUES
      |    (1, 'one'),
      |    (2, 'semi;colon'),
      |    (3, 'esc\'d
      |wrap');
      |INSERT INTO `t` VALUES (4, 'single');
      |""".stripMargin)
    val df = spark.read.format("mysqldump").option("table", "t").load(dump)
    assert(rows(df) === Set(
      Seq("1", "one", "false"),
      Seq("2", "semi;colon", "false"),
      Seq("3", "esc'd\nwrap", "false"),
      Seq("4", "single", "false")))
  }

  test("mysql: chunk boundaries inside wrapped statements stay exactly-once") {
    val stmts = (0 until 40).map(i =>
      s"INSERT INTO `t` (`a`, `b`) VALUES\n  ($i,\n  'v$i');").mkString("\n")
    val dump = write("my_chunk_", s"CREATE TABLE `t` (`a` bigint, `b` text);\n$stmts\n")
    val df = spark.read.format("mysqldump").option("table", "t")
      .option("chunkBytes", "48").load(dump)
    assert(df.rdd.getNumPartitions > 1)
    assert(df.count() === 40)
  }

  test("single-line VALUES( without space now lexes (both dialects)") {
    val pg = write("pg_nosp_", """CREATE TABLE t (a bigint);
      |INSERT INTO t (a) VALUES(1);
      |INSERT INTO t (a) VALUES(2);
      |""".stripMargin)
    assert(spark.read.format("pgdump").option("table", "t").load(pg)
      .count() === 2)
    val my = write("my_nosp_", """CREATE TABLE `t` (`a` bigint);
      |INSERT INTO `t` (`a`) VALUES(7),(8);
      |""".stripMargin)
    assert(spark.read.format("mysqldump").option("table", "t").load(my)
      .count() === 2)
  }

  test("statement scanners mirror the sequential parsers' quote rules") {
    val pg = DumpInserts.StmtScanner.pg()
    assert(!pg.feed("INSERT INTO t VALUES (1, 'no end"))
    assert(!pg.feed("still inside; the quote closes here')"))  // ';' was inside the string
    assert(pg.feed(");"))
    val my = DumpInserts.StmtScanner.mysql()
    assert(!my.feed("INSERT INTO `t;x` VALUES ('a\\'; still open"))
    assert(my.feed("done');"))
  }
}
