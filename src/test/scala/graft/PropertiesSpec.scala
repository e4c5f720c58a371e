package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.schema.NameRegistry
import graft.sink.{BatchWriter, MutRow}

/** Property-style invariants over generated inputs (ScalaCheck Gen with
  * fixed seeds — deterministic, no scalatestplus bridge needed). */
class PropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  private val weird: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '-', '.', 'ä', '€', '_', '"', '\'')))
    .map(_.mkString)

  test("fixName always yields a legal Spanner identifier") {
    samples(weird, 200).foreach { s =>
      val (fixed, _) = NameRegistry.fixName(s)
      assert(fixed.matches("^[a-zA-Z][a-zA-Z0-9_]*$"), s"input: ${s.take(30)}")
    }
  }

  test("registry column allocation is consistent and collision-free") {
    samples(Gen.listOfN(30, weird.suchThat(_.nonEmpty)), 20).foreach { cols =>
      val reg = new NameRegistry
      reg.spannerTable("t")
      val mapped = cols.distinct.map(c => c -> reg.spannerCol("t", c).toOption.get)
      mapped.foreach { case (src, sp) => // stable on re-query
        assert(reg.spannerCol("t", src).toOption.get === sp)
      }
      val bySrc = mapped.toMap // distinct sources → distinct targets
      assert(bySrc.values.toSeq.distinct.length === bySrc.size)
    }
  }

  test("BatchWriter conservation: every row written exactly once or dropped") {
    samples(Gen.listOf(Gen.chooseNum(1L, 200L)).map(_.toSet), 25).foreach { bad =>
      val written = scala.collection.mutable.ArrayBuffer.empty[Long]
      val bw = new BatchWriter(rows => {
        if (rows.exists(r => bad(r.vals.head.asInstanceOf[Long])))
          throw new RuntimeException("boom")
        written ++= rows.map(_.vals.head.asInstanceOf[Long])
      }, countThreshold = 17, byteThreshold = Long.MaxValue)
      (1L to 200L).foreach(i => bw.addRow(MutRow("t", Seq("a"), Seq(i))))
      bw.flush()
      val dropped = bw.droppedRows.getOrElse("t", 0L)
      assert(written.distinct.length === written.length) // no duplicates
      assert(written.length + dropped === 200L)          // conservation
      assert(written.toSet === (1L to 200L).toSet.diff(bad)) // exact split
    }
  }

  test("mysql tuple literal inverts mysqldump string escaping") {
    import graft.sources.mysqldump.MySqlDumpReader
    val strings = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\'', '\\', '\n', '\t', ' ', ','))).map(_.mkString)
    samples(strings, 300).foreach { s =>
      val escaped = "'" + s.replace("\\", "\\\\").replace("'", "\\'")
        .replace("\n", "\\n").replace("\t", "\\t") + "'"
      assert(MySqlDumpReader.Tuples.literal(escaped) === s, s"input: ${s.take(30)}")
    }
  }

  test("pg COPY escape/unescape round-trips through the column expression") {
    val spark = GraftSession.build("graft-test")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\\', ' ', 'x', '\n', '\t', '\r'))).map(_.mkString)
    val strings = samples(gen, 300)
    val escaped = strings.map(s => s.replace("\\", "\\\\")
      .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r"))
    val out = escaped.toDF("c")
      .select(graft.sources.pgdump.PgDumpReader.unescapeCopy(col("c")).as("u"))
      .collect().map(_.getString(0)).toSeq
    assert(out === strings)
  }
}
