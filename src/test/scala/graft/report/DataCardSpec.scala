package graft.report

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** DataCard: the JSON artifact carries exactly the c15 relation's
  * numbers, cross-checked against directly-computed corpus facts. */
class DataCardSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.001"

  test("card metrics match directly computed corpus facts") {
    val m = DataCard.metrics(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(m("n_docs") === docs.count())
    val langTotal = m.collect { case (k, v) if k.startsWith("lang:") => v }.sum
    assert(langTotal === m("n_docs")) // language histogram partitions the corpus
    val srcTotal = m.collect { case (k, v) if k.startsWith("source:") => v }.sum
    assert(srcTotal === m("n_docs"))
    assert(m("exact_dup_permille") ===
      m("exact_dup_docs") * 1000 / m("n_docs"))
    assert(m("n_tokens") > 0 && m("n_bytes") > m("n_tokens"))
  }

  test("write emits parseable, byte-stable JSON") {
    val out = java.nio.file.Files.createTempFile("graft_card_", ".json")
    try {
      DataCard.write(spark, dir, out.toString)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(java.nio.file.Files.readString(out))
      assert(node.get("n_docs").asLong() === DataCard.metrics(spark, dir)("n_docs"))
      val first = java.nio.file.Files.readString(out)
      DataCard.write(spark, dir, out.toString)
      assert(java.nio.file.Files.readString(out) === first)
    } finally java.nio.file.Files.deleteIfExists(out)
  }

  test("drift: hand-computed shares/deltas/TVD, absent langs as zero") {
    import spark.implicits._
    // old: en 3, de 1 (4 docs); new: en 1, de 1, fr 2 (4 docs)
    // old ppm: en 750000, de 250000, fr 0; new: en 250000, de 250000,
    // fr 500000 → deltas en -500000, de 0, fr +500000; TVD 500000
    def frame(rows: Seq[(Long, String)]) =
      rows.map { case (id, l) => (id, s"text $id", l, "s0", 7L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val oldDocs = frame(Seq((0L, "en"), (1L, "en"), (2L, "en"), (3L, "de")))
    val newDocs = frame(Seq((10L, "en"), (11L, "de"), (12L, "fr"), (13L, "fr")))
    val got = DataCard.drift(oldDocs, newDocs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("_TOTAL", 4L, 4L, 1000000L, 1000000L, 500000L),
      ("de", 1L, 1L, 250000L, 250000L, 0L),
      ("en", 3L, 1L, 750000L, 250000L, -500000L),
      ("fr", 0L, 2L, 0L, 500000L, 500000L)))
  }

  test("drift IS the oracled d25 relation on d25's own parity split") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val viaApi = DataCard.drift(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0))
      .collect().map(_.toSeq)
    val viaQuery = graft.queries.Documents.defs("d25_composition_drift")
      .build(spark, dir).collect().map(_.toSeq)
    assert(viaApi.nonEmpty && viaApi.toSeq === viaQuery.toSeq)
    graft.queries.QueryDef.drainCleanups()
  }

  test("embeddingDrift IS the oracled e21 relation on e21's own parity split") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val viaApi = DataCard.embeddingDrift(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 =!= 0))
      .collect().map(_.toSeq)
    val viaQuery = graft.queries.Similarity.defs("e21_embedding_drift")
      .build(spark, dir).collect().map(_.toSeq)
    assert(viaApi.nonEmpty && viaApi.toSeq === viaQuery.toSeq)
    graft.queries.QueryDef.drainCleanups()
    // empty-side convention: zero means, not an error (first-generation
    // report), and the delta is then just the new side's means
    val firstGen = DataCard.embeddingDrift(emb.limit(0), emb).collect()
    assert(firstGen.length === 64)
    assert(firstGen.forall(r => r.getLong(1) === 0L &&
      r.getLong(3) === r.getLong(2)))
  }

  test("drift by an alternate stratum column: source composition") {
    import spark.implicits._
    def frame(rows: Seq[(Long, String)]) =
      rows.map { case (id, s) => (id, s"text $id", "en", s, 7L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // old: s0 1, s1 3; new: s0 2, s1 2 → s0 250000→500000 (+250000),
    // s1 750000→500000 (−250000); TVD 250000
    val oldDocs = frame(Seq((0L, "s1"), (1L, "s1"), (2L, "s1"), (3L, "s0")))
    val newDocs = frame(Seq((10L, "s0"), (11L, "s0"), (12L, "s1"), (13L, "s1")))
    val got = DataCard.drift(oldDocs, newDocs, by = "source")
    assert(got.columns.head === "source")
    val rows = got.collect().map(r => (r.getString(0), r.getLong(5)))
    assert(rows.toSeq === Seq(
      ("_TOTAL", 250000L), ("s0", 250000L), ("s1", -250000L)))
  }

  test("drift refuses an empty snapshot loudly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val empty = docs.filter(col("doc_id") < 0)
    intercept[IllegalArgumentException](DataCard.drift(empty, docs))
    intercept[IllegalArgumentException](DataCard.drift(docs, empty))
  }

  test("churn IS the oracled c23 relation on c23's own parity stand-in") {
    import org.apache.spark.sql.functions.{pmod, lit, when, concat}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val old = docs.filter(pmod(col("doc_id"), lit(10)) < 9)
    val neu = docs.filter(pmod(col("doc_id"), lit(10)) > 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
    val viaApi = DataCard.churn(old, neu).collect().map(_.toSeq)
    val viaQuery = graft.queries.Documents.defs("c23_snapshot_diff")
      .build(spark, dir).collect().map(_.toSeq)
    assert(viaApi.nonEmpty && viaApi.toSeq === viaQuery.toSeq)
  }

  test("lengthSummary: exact discrete quantiles, NULL text excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, when}
    val noop: (() => Unit) => Unit = f => { f(); () }
    // lengths 10..19 via n_chars; one NULL-text doc must not rank
    val docs = ((10L to 19L).map(n =>
        (n, Option("x" * n.toInt), "en", "s", Option(n))) :+
      ((99L, Option.empty[String], "en", "s", Option.empty[Long])))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DataCard.lengthSummary(docs, Seq(0, 500, 1000))(noop)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(0L -> ((10L, 10L)), 500L -> ((14L, 10L)),
      1000L -> ((19L, 10L))))
    // without n_chars it derives from the live text
    val viaText = DataCard.lengthSummary(
      docs.drop("n_chars"), Seq(1000))(noop).collect()
    assert(viaText.map(r => r.getLong(2)).toSeq === Seq(19L))
    // a partially populated n_chars column falls back per-row to
    // length(text) instead of silently excluding the row
    val holey = docs.withColumn("n_chars",
      when(col("doc_id") === 19L, lit(null)).otherwise(col("n_chars")))
    val viaHoley = DataCard.lengthSummary(holey, Seq(1000))(noop)
      .collect()
    assert(viaHoley.map(r => (r.getLong(2), r.getLong(3))).toSeq ===
      Seq((19L, 10L)))
  }

  test("churn accepts an empty side: everything added / removed") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(3)
    val empty = docs.limit(0)
    val added = DataCard.churn(empty, docs).collect()
    assert(added.map(_.getString(0)).toSeq === Seq("added"))
    assert(added(0).getLong(1) === 3L && added(0).getLong(2) === 0L)
    val removed = DataCard.churn(docs, empty).collect()
    assert(removed.map(_.getString(0)).toSeq === Seq("removed"))
    assert(removed(0).getLong(1) === 3L && removed(0).getLong(3) === 0L)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
