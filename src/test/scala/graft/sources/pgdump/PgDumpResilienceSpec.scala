package graft.sources.pgdump

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Malformed-input resilience (the reference's unparsable-content cases,
  * pgdump_test.go:777+): the parser must never throw, must keep good
  * statements around bad ones, and must account for everything it
  * skipped. */
class PgDumpResilienceSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def migrate(dump: String) = {
    val p = java.nio.file.Files.createTempFile("graft", ".pgdump")
    java.nio.file.Files.writeString(p, dump)
    PgDumpReader.migrate(spark, p.toString)
  }

  test("garbage statements between good ones are recorded, not fatal") {
    val m = migrate(
      """CREATE TABLE a (x bigint);
        |THIS IS NOT SQL AT ALL;
        |CREATE TABLE !!! utterly broken (;
        |CREATE TABLE b (y text);
        |COPY a (x) FROM stdin;
        |1
        |\.
        |""".stripMargin)
    assert(m.plan.srcSchema.keySet === Set("a", "b"))
    assert(m.tables("a")._1.count() === 1)
    // broken CREATE recorded; unknown statement skipped with stats
    assert(m.dump.unparseable.nonEmpty)
    assert(m.dump.statementStats("skipped") >= 1)
  }

  test("COPY for an unknown table: payload consumed, never leaks") {
    val m = migrate(
      """CREATE TABLE a (x bigint);
        |COPY ghost (g) FROM stdin;
        |not-a-statement	here
        |\.
        |COPY a (x) FROM stdin;
        |7
        |\.
        |""".stripMargin)
    assert(m.tables("a")._1.collect().map(_.getLong(0)).toSeq === Seq(7L))
    assert(m.dump.unparseable.exists(_.contains("unknown table ghost")))
  }

  test("unterminated COPY at EOF loses only that block") {
    val m = migrate(
      """CREATE TABLE a (x bigint);
        |COPY a (x) FROM stdin;
        |1
        |2
        |""".stripMargin) // no \. terminator
    // no copy block recorded → table exists with zero rows, no crash
    assert(m.plan.srcSchema.keySet === Set("a"))
    assert(m.tables("a")._1.count() === 0)
  }

  test("ALTER/INDEX/INSERT against unknown tables are recorded") {
    val m = migrate(
      """CREATE TABLE a (x bigint);
        |ALTER TABLE ONLY ghost ADD CONSTRAINT pk PRIMARY KEY (g);
        |CREATE INDEX ix ON ghost (g);
        |INSERT INTO ghost (g) VALUES (1);
        |""".stripMargin)
    assert(m.dump.unparseable.count(_.contains("unknown table")) === 3)
    assert(m.plan.srcSchema.keySet === Set("a"))
  }

  test("identifier containing 'values' in the column list doesn't fool the lexer") {
    // pg_dump doesn't quote identifiers like my_values — a substring
    // VALUES match used to land mid-identifier and drop every tuple
    val m = migrate(
      """CREATE TABLE a (id bigint, my_values text);
        |INSERT INTO a (id, my_values) VALUES (1, 'x'), (2, 'y');
        |""".stripMargin)
    val rows = m.tables("a")._1.orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "x"), (2L, "y")))
  }

  test("COPY naming a column subset unions with INSERT's full list") {
    val m = migrate(
      """CREATE TABLE a (id bigint, note text);
        |COPY a (id) FROM stdin;
        |1
        |\.
        |INSERT INTO a (id, note) VALUES (2, 'n');
        |""".stripMargin)
    val rows = m.tables("a")._1.orderBy("id").collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("note"))) // COPY row: absent col → NULL
    assert(rows(1).getString(rows(1).fieldIndex("note")) === "n")
  }

  test("semicolons and quotes inside string literals don't split statements") {
    val m = migrate(
      """CREATE TABLE a (x text);
        |INSERT INTO a (x) VALUES ('semi;colon ''and'' quote');
        |""".stripMargin)
    assert(m.dump.statementStats("insert") === 1)
    assert(m.tables("a")._1.collect().map(_.getString(0)).toSeq
      === Seq("semi;colon 'and' quote"))
  }
}
