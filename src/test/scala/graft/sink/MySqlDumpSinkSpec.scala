package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** MySqlDumpSink: written dumps round-trip through the library's own
  * mysqldump reader, including the values that stress SQL-literal
  * escaping (quotes, backslashes, newlines, NULLs). */
class MySqlDumpSinkSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempDirectory("graft_mysink_").toString + suffix

  test("escaping round-trips hostile values through the reader") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain"),
      (2L, "it's quoted"),
      (3L, "line\nbreak"),
      (4L, "tab\there"),
      (5L, "back\\slash"),
      (6L, "wild '\\'' mix\n\t"),
      (7L, null.asInstanceOf[String]))
      .toDF("id", "payload")
    val file = tmp(".sql")
    MySqlDumpSink.writeFile(df, "hostile", file)
    val back = spark.read.format("mysqldump").option("table", "hostile").load(file)
    val got = back.select("id", "payload").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    val want = df.collect()
      .map(r => (r.getLong(0).toString, r.getString(1))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
  }

  test("fuzz: random strings (controls, quotes, unicode) round-trip both sinks") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val alphabet: IndexedSeq[Char] =
      ('a' to 'z') ++ Seq('\'', '"', '`', '\\', '\n', '\r', '\t', ',',
        ';', '(', ')', '|', 'ü', 'é', '中', '€', ' ')
    def randStr(): String =
      (0 until rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (0 until 200).map(i =>
      (i.toLong, if (i % 17 == 0) null else randStr()))
    val df = rows.toDF("id", "payload")
    val want = rows.map { case (i, v) => (i.toString, v) }.sortBy(_._1)

    val myFile = tmp("_fz.sql")
    MySqlDumpSink.writeFile(df, "fz", myFile, batchRows = 13)
    val myBack = spark.read.format("mysqldump").option("table", "fz").load(myFile)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    assert(myBack.toSeq === want.toSeq)

    val pgFile = tmp("_fz.pgdump")
    PgDumpSink.writeFile(df, "fz", pgFile)
    val pgBack = spark.read.format("pgdump").option("table", "fz").load(pgFile)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1)
    assert(pgBack.toSeq === want.toSeq)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(myFile))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(pgFile))
  }

  test("customer round-trips with small INSERT batches") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val file = tmp(".sql")
    MySqlDumpSink.writeFile(cust, "customer", file, batchRows = 7)
    val back = spark.read.format("mysqldump").option("table", "customer").load(file)
      .drop("__ragged")
    assert(back.count() === cust.count())
    val cols = cust.columns
    val want = cust.select(cols.map(c => col(c).cast("string").as(c)): _*)
    val diff = back.exceptAll(want).count() + want.exceptAll(back).count()
    assert(diff === 0, s"round-trip drift: $diff rows differ")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
  }
}
