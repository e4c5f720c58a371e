package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke integration over the reference's example dumps (read-only):
  * both dialects of the singers/albums/songs sample migrate completely,
  * including MySQL's mixed-case identifiers. */
class ExamplesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  test("singers.pg_dump: 3 tables, all rows, hierarchical PKs") {
    val m = graft.sources.pgdump.PgDumpReader.migrate(spark,
      "/root/reference/examples/singers.pg_dump")
    val counts = m.tables.map { case (n, (g, b)) => n -> (g.count(), b.count()) }
    assert(counts === Map(
      "singers" -> (5L, 0L), "albums" -> (7L, 0L), "songs" -> (9L, 0L)))
    assert(m.plan.spSchema("songs").pks.map(_.column) ===
      Seq("singerid", "albumid", "trackid"))
    val (songs, _) = m.tables("songs")
    assert(songs.columns.toSeq ===
      Seq("singerid", "albumid", "trackid", "songname"))
  }

  test("singers.mysqldump: mixed-case identifiers survive end-to-end") {
    val m = graft.sources.mysqldump.MySqlDumpReader.migrate(spark,
      "/root/reference/examples/singers.mysqldump")
    val counts = m.tables.map { case (n, (g, b)) => n -> (g.count(), b.count()) }
    assert(counts === Map(
      "Singers" -> (5L, 0L), "Albums" -> (7L, 0L), "Songs" -> (9L, 0L)))
    // CamelCase column names preserved (legal Spanner ids unchanged)
    assert(m.plan.spSchema("Songs").colNames.contains("SongName") ||
      m.plan.spSchema("Songs").colNames.exists(_.equalsIgnoreCase("songname")))
  }

  test("cart examples migrate cleanly in both dialects") {
    val pg = graft.sources.pgdump.PgDumpReader.migrate(spark,
      "/root/reference/examples/cart.pg_dump")
    pg.tables.values.foreach { case (_, bad) => assert(bad.count() === 0) }
    assert(pg.tables.values.map(_._1.count()).sum > 0)
    val my = graft.sources.mysqldump.MySqlDumpReader.migrate(spark,
      "/root/reference/examples/cart.mysqldump")
    my.tables.values.foreach { case (_, bad) => assert(bad.count() === 0) }
    assert(my.tables.values.map(_._1.count()).sum > 0)
  }
}
