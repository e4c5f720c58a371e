package graft.queries

import java.nio.file.{Files, Path}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Known-answer checks for the corpus-evolution analytics (d27 growth
  * curves, c23 snapshot diff) — the intent contracts the DuckDB oracle
  * (cross-engine agreement on the synthetic corpus) can't express.
  */
class SnapshotSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = GraftSession.build("graft-test")

  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[Path]

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_snapshot")
    tmpDirs += p
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$p/documents.parquet")
    p.toString
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach { p =>
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
    }
    super.afterAll()
  }

  test("d27: unigram curve counts first occurrences by exact decile membership") {
    // token stream in doc_id order:
    //   doc0: a(0) b(1) a(2)   doc1: c(3) a(4)
    //   doc2: b(5) c(6) d(7) e(8) f(9) g(10) h(11) i(12) j(13) k(14)
    // total = 15; type first seen at p is in decile i iff 10p < 15i
    val dir = docsDir(Seq(
      (0L, "a b a", "en", "s"),
      (1L, "c a", "en", "s"),
      (2L, "b c d e f g h i j k", "en", "s")))
    val out = Documents.defs("d27_vocab_growth").build(spark, dir).collect()
    val uni = out.filter(_.getString(0) == "1gram")
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(uni === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 4L,
      6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 10L, 10L -> 11L))
    // cp_tokens is floor(i*total/10) for display
    val cps = out.filter(_.getString(0) == "1gram")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(cps(1L) === 1L && cps(10L) === 15L)
    // bigram curve: nondecreasing, ends at the distinct-bigram count
    // (doc0: "a b","b a"; doc1: "c a"; doc2: 9 distinct) = 12
    val bi = out.filter(_.getString(0) == "2gram").sortBy(_.getLong(1))
      .map(_.getLong(3))
    assert(bi.last === 12L)
    assert(bi.zip(bi.tail).forall { case (x, y) => x <= y })
  }

  test("d27: empty, whitespace-only, and NULL-text docs contribute no grams") {
    // NULL text is the sizeOfNull trap: size(NULL array) is -1 under
    // the session's legacy setting, and an uncaught -1 shifts every
    // later doc's stream position (total would read 1, not 2)
    val dir = docsDir(Seq(
      (0L, "x y", "en", "s"),
      (1L, "", "en", "s"),
      (2L, "   ", "en", "s"),
      (3L, null, "en", "s")))
    val out = Documents.defs("d27_vocab_growth").build(spark, dir).collect()
    val uni = out.filter(_.getString(0) == "1gram")
    assert(uni.map(_.getLong(2)).max === 2L) // total tokens = 2
    assert(uni.map(_.getLong(3)).max === 2L) // types x, y
    val bi = out.filter(_.getString(0) == "2gram")
    assert(bi.map(_.getLong(2)).max === 1L) // one bigram "x y"
    assert(bi.map(_.getLong(3)).max === 1L)
  }

  test("d27: a fully empty corpus yields an empty relation, not NULL checkpoints") {
    // the oracle's per-gram GROUP BY emits nothing on an empty table;
    // Spark's global aggregate emits one NULL-total row — the build
    // must filter it or the engines diverge on the degenerate corpus
    val dir = docsDir(Seq.empty)
    val out = Documents.defs("d27_vocab_growth").build(spark, dir).collect()
    assert(out.isEmpty, out.mkString(";"))
  }

  test("c23: statuses partition the key union; NULL-text pairs are unchanged") {
    // ids 0..29: old side = last digit < 9, new side = last digit > 0,
    // new text edited when id % 3 == 0. Expected:
    //   removed  = {0,10,20}                          → 3
    //   added    = {9,19,29}                          → 3
    //   shared   = last digit 1..8                    → 24
    //   changed  = shared ∧ id%3=0 ∧ text non-NULL:
    //              {6,12,15,18,21,24,27} (3 is NULL)  → 7
    //   unchanged = 24 - 7                            → 17
    val rows = (0L to 29L).map { i =>
      val text = if (i == 3L) null else s"doc $i body"
      (i, text, "en", "s")
    }
    val dir = docsDir(rows)
    val out = Documents.defs("c23_snapshot_diff").build(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("added" -> 3L, "removed" -> 3L,
      "changed" -> 7L, "unchanged" -> 17L))
  }

  test("c23: char volumes count each side's own text") {
    // two unchanged docs of known length; 'added'/'removed' rows count
    // chars only on the side that has them
    val rows = Seq(
      (1L, "abcd", "en", "s"), // shared, id%3!=0 → unchanged, 4 chars
      (10L, "xyz", "en", "s"), // old only → removed
      (19L, "pq", "en", "s")) // new only → added
    val dir = docsDir(rows)
    val out = Documents.defs("c23_snapshot_diff").build(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("unchanged") === ((4L, 4L)))
    assert(out("removed") === ((3L, 0L)))
    assert(out("added") === ((0L, 2L)))
  }
}
