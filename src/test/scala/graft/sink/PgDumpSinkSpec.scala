package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** PgDumpSink: the written dump must round-trip through this library's
  * own pgdump reader — raw rows back equal `cast(everything to string)`
  * of the source — including the values that stress COPY escaping
  * (tabs, newlines, CRs, backslashes, NULLs). */
class PgDumpSinkSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempDirectory("graft_sinkspec_").toString + suffix

  test("escaping round-trips hostile values through the reader") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain"),
      (2L, "tab\tinside"),
      (3L, "line\nbreak"),
      (4L, "cr\rreturn"),
      (5L, "back\\slash"),
      (6L, "mix\t\\\n\\t end"),
      (7L, null.asInstanceOf[String]))
      .toDF("id", "payload")
    val file = tmp(".sql")
    PgDumpSink.writeFile(df, "hostile", file)
    val back = spark.read.format("pgdump").option("table", "hostile").load(file)
    assert(back.columns.toSeq.take(2) === Seq("id", "payload"))
    val got = back.select("id", "payload").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    val want = df.collect()
      .map(r => (r.getLong(0).toString, r.getString(1))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
  }

  test("lineitem round-trips: every column of every row survives") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val file = tmp(".sql")
    PgDumpSink.writeFile(li, "lineitem", file)
    val back = spark.read.format("pgdump").option("table", "lineitem").load(file)
      .drop("__ragged")
    assert(back.count() === li.count())
    // compare as the canonical string rendering the sink wrote
    val cols = li.columns
    val want = li.select(cols.map(c => col(c).cast("string").as(c)): _*)
    val diff = back.exceptAll(want).count() + want.exceptAll(back).count()
    assert(diff === 0, s"round-trip drift: $diff rows differ")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
  }

  test("gzip target: written .gz dump reads back through the codec path") {
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, "with	tab"), (3L, null.asInstanceOf[String]))
      .toDF("id", "v")
    val file = tmp(".pgdump.gz")
    PgDumpSink.writeFile(df, "gzed", file)
    // really compressed (gzip magic), not just named .gz
    val head = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(file)).take(2)
    assert((head(0) & 0xff) === 0x1f && (head(1) & 0xff) === 0x8b)
    val back = spark.read.format("pgdump").option("table", "gzed").load(file)
      .select("id", "v").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    assert(back.toSeq === Seq(("1", "alpha"), ("2", "with	tab"), ("3", null)))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
  }

  test("fragment dir: header declares the table, payload is distributed parts") {
    import spark.implicits._
    val df = Seq((1L, 1.5, "x")).toDF("a", "b", "c")
    val dir = tmp("")
    PgDumpSink.writeDir(df, "frag", dir)
    val header = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/00_header.sql"))
    assert(header.contains("CREATE TABLE \"frag\""))
    assert(header.contains("\"a\" bigint"))
    assert(header.contains("\"b\" double precision"))
    assert(header.contains("\"c\" text"))
    assert(header.contains("COPY \"frag\" (\"a\", \"b\", \"c\") FROM stdin;"))
    assert(new java.io.File(s"$dir/10_payload").listFiles()
      .exists(_.getName.startsWith("part-")))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/20_footer.sql")) === "\\.\n")
  }
}
