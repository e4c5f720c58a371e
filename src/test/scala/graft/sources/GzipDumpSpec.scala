package graft.sources

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.pgdump.PgDumpReader
import graft.sources.mysqldump.MySqlDumpReader

/** Real-world dumps arrive as `pg_dump | gzip` — every read path must
  * transparently accept a gzip'd file with identical results to the
  * plain one: the sequential schema pass (stream-decompress), the
  * line-ranged migration readers and the V2 byte-range sources (both
  * via DumpCodec's inflate-to-scratch, the reference's own
  * materialize-to-seekable posture, conversion/conversion.go:377-406). */
class GzipDumpSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val pgFixture = "/root/repo/src/test/resources/fixtures/sample.pgdump"
  private val myFixture = "/root/repo/src/test/resources/fixtures/sample.mysqldump"

  private def gzipped(src: String): String = {
    val out = Files.createTempFile("graft_gz_", ".dump.gz")
    val os = new GZIPOutputStream(Files.newOutputStream(out))
    try os.write(Files.readAllBytes(Paths.get(src))) finally os.close()
    out.toFile.deleteOnExit()
    out.toString
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "(null)" else r.get(i) match {
          case b: Array[Byte] => b.map("%02x".format(_)).mkString
          case v => v.toString
        }))
      .toSeq.sortBy(_.mkString(" "))
  }

  test("magic-byte detection, not extension") {
    val conf = spark.sessionState.newHadoopConf()
    val gz = gzipped(pgFixture)
    val renamed = gz.stripSuffix(".gz") + ".renamed" // no .gz extension
    Files.move(Paths.get(gz), Paths.get(renamed))
    assert(DumpCodec.isGzip(renamed, conf))
    assert(!DumpCodec.isGzip(pgFixture, conf))
  }

  test("sequential schema pass parses a gzip'd pg dump identically") {
    val (plain, _) = PgDumpReader.schemaPass(pgFixture)
    val (gz, _) = PgDumpReader.schemaPass(gzipped(pgFixture))
    assert(gz.tables.keySet === plain.tables.keySet)
    assert(gz.statementStats === plain.statementStats)
  }

  test("pg migrate over a gzip'd dump matches the plain migration") {
    val plain = PgDumpReader.migrate(spark, pgFixture)
    val gz = PgDumpReader.migrate(spark, gzipped(pgFixture))
    try {
      assert(gz.tables.keySet === plain.tables.keySet)
      gz.tables.keySet.foreach { t =>
        assert(canon(gz.tables(t)._1) === canon(plain.tables(t)._1), s"table $t")
      }
    } finally { plain.release(); gz.release() }
  }

  test("pgdump V2 source reads a gzip'd dump with byte-range parallelism") {
    val gz = gzipped(pgFixture)
    val plain = spark.read.format("pgdump").option("table", "inventory")
      .load(pgFixture)
    val viaGz = spark.read.format("pgdump").option("table", "inventory")
      .option("chunkBytes", "64") // force many byte-range partitions
      .load(gz)
    assert(canon(viaGz) === canon(plain))
    assert(viaGz.rdd.getNumPartitions > 1,
      "inflated copy must restore splittable byte-range partitioning")
  }

  test("mysql migrate + V2 source over a gzip'd dump match the plain ones") {
    val gz = gzipped(myFixture)
    val plain = MySqlDumpReader.migrate(spark, myFixture)
    val viaGz = MySqlDumpReader.migrate(spark, gz)
    try {
      assert(viaGz.tables.keySet === plain.tables.keySet)
      viaGz.tables.keySet.foreach { t =>
        assert(canon(viaGz.tables(t)._1) === canon(plain.tables(t)._1), s"table $t")
      }
    } finally { plain.release(); viaGz.release() }
    val tables = plain.dump.insertCols.keys.toSeq.sorted
    assert(tables.nonEmpty)
    val t0 = tables.head
    assert(canon(spark.read.format("mysqldump").option("table", t0).load(gz))
      === canon(spark.read.format("mysqldump").option("table", t0).load(myFixture)))
  }

  test("inflation is cached: second read reuses the scratch copy") {
    val gz = gzipped(pgFixture)
    val p1 = DumpCodec.materialize(spark, gz)
    val p2 = DumpCodec.materialize(spark, gz)
    assert(p1 === p2)
    assert(p1 !== gz)
    assert(DumpCodec.isGzip(gz, spark.sessionState.newHadoopConf()))
    assert(!DumpCodec.isGzip(p1, spark.sessionState.newHadoopConf()))
  }

  test("scratchDir accepts an explicit Hadoop-scheme path (file:)") {
    // the multi-executor deployment shape: spark.graft.dump.scratchDir
    // points at a SHARED filesystem addressed by scheme (hdfs://…,
    // s3a://…). Everything in the inflate path goes through
    // path.getFileSystem(conf), so a `file:`-scheme URI exercises the
    // exact same code path as an object-store one.
    val scratch = Files.createTempDirectory("graft_hscratch_").toString
    val prev = spark.conf.getOption("spark.graft.dump.scratchDir")
    spark.conf.set("spark.graft.dump.scratchDir", s"file:$scratch")
    try {
      val gz = gzipped(pgFixture)
      val inflated = DumpCodec.materialize(spark, gz)
      assert(inflated.startsWith(s"file:$scratch"),
        s"inflated copy $inflated not under the scheme'd scratch dir")
      // and the migration over the scheme'd scratch copy is identical
      val plain = PgDumpReader.migrate(spark, pgFixture)
      val viaGz = PgDumpReader.migrate(spark, gz)
      try {
        viaGz.tables.keySet.foreach { t =>
          assert(canon(viaGz.tables(t)._1) === canon(plain.tables(t)._1), s"table $t")
        }
      } finally { plain.release(); viaGz.release() }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.dump.scratchDir", v)
        case None => spark.conf.unset("spark.graft.dump.scratchDir")
      }
    }
  }
}
