package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.jsonl.JsonlDocs

/** JsonlDocs: quarantine posture on malformed lines, round trip of the
  * documents shape including JSON-hostile text. */
class JsonlDocsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_jsonl_").toString

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete(); ()
    }
    go(new java.io.File(path))
  }

  test("malformed lines quarantine with their raw text; good rows type") {
    val dir = tmpDir()
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/in.jsonl"),
        """{"doc_id": 1, "text": "ok", "lang": "en", "source": "web"}
{"doc_id": 2, "text": "quote \" and \t tab", "lang": "de", "source": "web"}
this is not json
{"text": "no id", "lang": "en", "source": "web"}
{"doc_id": 3, "text": null, "lang": "fr", "source": "book"}
""")
      val (good, bad) = JsonlDocs.read(spark, s"$dir/in.jsonl")
      val ids = good.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L)) // null text is data, not corruption
      assert(good.filter(col("doc_id") === 2)
        .select("text").head.getString(0) === "quote \" and \t tab")
      val rawBad = bad.collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
      assert(rawBad.length === 2)
      assert(rawBad.exists(l => l != null && l.contains("not json")))
    } finally rm(dir)
  }

  test("readCounted agrees with read()'s frames in one parse") {
    val dir = tmpDir()
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/in.jsonl"),
        """{"doc_id": 1, "text": "a", "lang": "en", "source": "s"}
{"doc_id": 2, "text": "b", "lang": "en", "source": "s"}
nope
{"text": "no id", "lang": "en", "source": "s"}
""")
      val (good, nGood, nBad) = JsonlDocs.readCounted(spark, s"$dir/in.jsonl")
      assert((nGood, nBad) === (2L, 2L))
      assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(1L, 2L))
      // empty input: zero/zero, no NULL-aggregate crash
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/empty.jsonl"), "")
      val (_, g0, b0) = JsonlDocs.readCounted(spark, s"$dir/empty.jsonl")
      assert((g0, b0) === (0L, 0L))
    } finally rm(dir)
  }

  test("documents round-trip through write + read") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir()
    try {
      JsonlDocs.write(docs.select("doc_id", "text", "lang", "source"), s"$dir/out")
      val (good, bad) = JsonlDocs.read(spark, s"$dir/out")
      assert(bad.count() === 0)
      val want = docs.select("doc_id", "text", "lang", "source")
      val diff = good.exceptAll(want).count() + want.exceptAll(good).count()
      assert(diff === 0, s"round-trip drift: $diff")
    } finally rm(dir)
  }
}
