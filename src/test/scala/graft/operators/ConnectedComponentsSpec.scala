package graft.operators

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Distributed min-label propagation contract: component = min reachable
  * id, convergence beyond one round (path graphs), edge-direction and
  * parallel-edge insensitivity. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def components(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.resolve(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // force the distributed min-label loop (threshold 0 disables the
  // driver union-find shortcut) so both strategies stay covered
  private def distComponents(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.resolve(edges.toDF("a", "b"), "a", "b",
        driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components: a triangle and a disjoint pair") {
    val cc = components((5L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    assert(cc === Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 10L -> 10L, 11L -> 10L))
  }

  test("path graph needs multiple propagation rounds") {
    // 1-2-3-...-12 as a chain with the min at one end: the worst case
    // for one-round propagation; must still converge to all-1s
    val chain = (1L until 12L).map(i => (i, i + 1))
    val cc = components(chain: _*)
    assert(cc.values.toSet === Set(1L))
    assert(cc.keySet === (1L to 12L).toSet)
    // same answer from the distributed loop (driver shortcut disabled)
    assert(distComponents(chain: _*) === cc)
  }

  test("driver union-find and distributed loop agree on random graphs") {
    val rnd = new scala.util.Random(1234)
    (1 to 6).foreach { trial =>
      val n = 2 + rnd.nextInt(40)
      val edges = Seq.fill(1 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty)
        assert(distComponents(edges: _*) === components(edges: _*),
          s"trial $trial: $edges")
    }
  }

  test("edge direction and duplicates don't matter") {
    val cc = components((7L, 2L), (2L, 7L), (7L, 2L), (9L, 7L))
    assert(cc === Map(2L -> 2L, 7L -> 2L, 9L -> 2L))
  }

  test("random graphs match a driver-side union-find oracle") {
    // property-style: 20 random graphs vs the textbook sequential
    // algorithm — catches frontier/compression interaction bugs that
    // hand-picked shapes miss
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      val n = 2 + rnd.nextInt(40)
      val edges = Seq.fill(1 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // sequential union-find with path compression
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(v => v -> find(v)).toMap
        // find() roots are component minima because union always hangs
        // the larger root under the smaller
        assert(components(edges: _*) === expected, s"trial $trial: $edges")
      }
    }
  }

  private def starComponents(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.resolveStarContraction(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star contraction agrees with label propagation") {
    // the contraction variant's motivating case: a long chain, where
    // propagation needs diameter rounds but contraction needs O(log²)
    val chain = (1L until 64L).map(i => (i, i + 1))
    assert(starComponents(chain: _*) === components(chain: _*))
    // mixed shapes incl. self-contained triangle + pair
    val mixed = Seq((5L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (2L, 40L))
    assert(starComponents(mixed: _*) === components(mixed: _*))
    // random graphs, both resolvers, same answer
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { trial =>
      val n = 2 + rnd.nextInt(30)
      val edges = Seq.fill(1 + rnd.nextInt(50))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty)
        assert(starComponents(edges: _*) === components(edges: _*),
          s"trial $trial: $edges")
    }
  }

  test("keep flag semantics: exactly one canonical per cluster") {
    val cc = components((1L, 2L), (2L, 3L), (8L, 9L))
    val keepers = cc.filter { case (v, label) => v == label }.keys.toSet
    assert(keepers === Set(1L, 8L))
  }
}
