package graft.sources.mysqldump

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Malformed mysqldump resilience: broken statements are contained,
  * DELIMITER blocks never leak, good tables survive. */
class MySqlResilienceSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def migrate(dump: String) = {
    val p = java.nio.file.Files.createTempFile("graft", ".mysqldump")
    java.nio.file.Files.writeString(p, dump)
    MySqlDumpReader.migrate(spark, p.toString)
  }

  test("garbage and broken CREATEs are contained") {
    val m = migrate(
      """CREATE TABLE `a` (`x` bigint(20) NOT NULL, PRIMARY KEY (`x`));
        |COMPLETELY BOGUS STATEMENT;
        |CREATE TABLE broken (((;
        |CREATE TABLE `b` (`y` text);
        |INSERT INTO `a` VALUES (1),(2);
        |""".stripMargin)
    assert(m.plan.srcSchema.keySet === Set("a", "b"))
    assert(m.tables("a")._1.count() === 2)
    assert(m.dump.statementStats("skipped") >= 1)
  }

  test("unterminated DELIMITER block at EOF swallows only the block") {
    val m = migrate(
      """CREATE TABLE `a` (`x` bigint(20));
        |INSERT INTO `a` VALUES (7);
        |DELIMITER ;;
        |CREATE TRIGGER t BEFORE INSERT ON a FOR EACH ROW BEGIN
        |  SET NEW.x = 1;
        |END ;;
        |""".stripMargin) // never restores DELIMITER ;
    assert(m.plan.srcSchema.keySet === Set("a"))
    assert(m.tables("a")._1.count() === 1)
    assert(m.dump.statementStats("skippedInDelimiterBlock") >= 1)
  }

  test("db-qualified backticked INSERT targets the right table") {
    // `db`.`t` used to be truncated to "db" at the first closing backtick
    // and the rows silently dropped
    val m = migrate(
      """CREATE TABLE `t` (`x` bigint(20));
        |INSERT INTO `db`.`t` VALUES (5),(6);
        |""".stripMargin)
    assert(m.tables("t")._1.collect().map(_.getLong(0)).sorted.toSeq
      === Seq(5L, 6L))
  }

  test("unquoted identifier containing 'values' doesn't fool the tuple lexer") {
    val m = migrate(
      """CREATE TABLE `a` (`id` bigint(20), `my_values` text);
        |INSERT INTO a (id, my_values) VALUES (1,'x');
        |""".stripMargin)
    assert(m.tables("a")._1.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "x")))
  }

  test("INSERT for unknown table recorded; statements inside strings intact") {
    val m = migrate(
      """CREATE TABLE `a` (`x` text);
        |INSERT INTO `ghost` VALUES (1);
        |INSERT INTO `a` VALUES ('semi;colon and \'quote\'');
        |""".stripMargin)
    assert(m.dump.unparseable.exists(_.contains("unknown table ghost")))
    assert(m.tables("a")._1.collect().map(_.getString(0)).toSeq
      === Seq("semi;colon and 'quote'"))
  }
}
