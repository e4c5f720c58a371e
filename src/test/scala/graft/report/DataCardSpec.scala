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
}
