package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Known-answer checks for the exact-integer PageRank fold — the
  * intent contract the e23 DuckDB oracle (cross-engine agreement on
  * the kNN composition) can't express. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def edgeDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  test("hand-computed two rounds on a 3-node loop") {
    // 1→{2,3}, 2→1, 3→1; deg(1)=2, deg(2)=deg(3)=1; start 1e6 each.
    // r1: s2 = s3 = 150000 + ((1e6 div 2)·17) div 20 = 575000
    //     s1 = 150000 + ((1e6 + 1e6)·17) div 20 = 1850000
    // r2: s2 = s3 = 150000 + ((1850000 div 2)·17) div 20 = 936250
    //     s1 = 150000 + ((575000 + 575000)·17) div 20 = 1127500
    val edges = edgeDf(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)))
    val r1 = PageRank.scores(edges, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    val r2 = PageRank.scores(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("zero rounds is the uniform start; no-in-link nodes settle at the floor") {
    val edges = edgeDf(Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    val r0 = PageRank.scores(edges, 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r0 === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    // node 3 emits but never receives: exactly the 150000 ppm floor
    // from round 1 on
    val r3 = PageRank.scores(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3(3L) === 150000L)
    intercept[IllegalArgumentException](PageRank.scores(edges, -1))
  }

  test("a regular graph is a fixed point at the uniform score") {
    // complete digraph on 4 nodes: in_sum = 3 · (1e6 div 3) = 999999
    // → 150000 + (999999·17) div 20 = 999999 — one integer ulp under
    // 1e6, then STAYS at 999999 (999999 div 3 = 333333, ×3 = 999999,
    // ·17 div 20 = 849999 (truncation), + 150000 = 999999): the
    // truncation loss is absorbed once, not compounded
    val es = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    val r1 = PageRank.scores(edgeDf(es), 1).collect().map(_.getLong(1))
    assert(r1.forall(_ === 999999L), r1.toSeq)
    val r5 = PageRank.scores(edgeDf(es), 5).collect().map(_.getLong(1))
    assert(r5.forall(_ === 999999L), r5.toSeq)
  }

  private def boardScores(name: String, dir: String): Map[Long, Long] = {
    val m = graft.SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.queries.QueryDef.drainCleanups()
    m
  }

  test("e23b: approx-graph PageRank is BIT-EQUAL to exact where the dial is exact") {
    // sf0.01: sqrt(500) = 22 <= nprobe 36, every cluster is probed, so
    // the scale-dial graph IS the exact graph and the self-loop fill
    // finds nothing to fill — the production path must reproduce e23
    // exactly, not merely approximate it
    val dir = "/root/testdata/sf0.01"
    val exact = boardScores("e23_knn_pagerank", dir)
    val approx = boardScores("e23b_pagerank_approx_graph", dir)
    assert(exact.nonEmpty && exact === approx)
  }

  test("e23b: centrality agreement holds where the dial genuinely prunes (sf0.1)") {
    // sqrt(2000) = 44 > nprobe 36 — the graph is approximate (edge
    // recall 0.9815 measured). Calibration on this corpus: Spearman
    // 0.976, top-100 overlap 0.88, mean relative score delta 0.059;
    // gates carry margin below each
    val dir = "/root/testdata/sf0.1"
    val exact = boardScores("e23_knn_pagerank", dir)
    val approx = boardScores("e23b_pagerank_approx_graph", dir)
    assert(exact.keySet === approx.keySet)
    def rankOf(m: Map[Long, Long]): Map[Long, Double] =
      m.toSeq.sortBy(t => (-t._2, t._1)).map(_._1)
        .zipWithIndex.map { case (v, i) => v -> i.toDouble }.toMap
    val (r1, r2) = (rankOf(exact), rankOf(approx))
    val n = exact.size.toDouble
    val d2 = exact.keys.toSeq.map(v => math.pow(r1(v) - r2(v), 2)).sum
    val spearman = 1.0 - 6.0 * d2 / (n * (n * n - 1))
    assert(spearman >= 0.95, f"spearman $spearman%.4f < 0.95")
    val top = (m: Map[Long, Double]) =>
      m.toSeq.sortBy(_._2).take(100).map(_._1).toSet
    val overlap = top(r1).intersect(top(r2)).size / 100.0
    assert(overlap >= 0.75, f"top-100 overlap $overlap%.2f < 0.75")
  }
}
