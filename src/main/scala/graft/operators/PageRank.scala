package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round PageRank over an edge list, in EXACT integer ppm —
  * the centrality companion to [[ConnectedComponents]] on the
  * similarity/kNN graph family (a document whose neighborhood keeps
  * getting cited by other neighborhoods is corpus-central; data
  * selection literature weights training mixes by exactly this kind
  * of graph importance).
  *
  * Arithmetic, chosen so a DuckDB oracle reproduces every bit:
  * scores live in ppm (uniform start 1 000 000), damping is the exact
  * rational 17/20 = 0.85 applied as `(Σ (score div deg)) * 17 div 20`
  * — integer division everywhere, and Spark's `div` and DuckDB's `//`
  * both truncate toward zero, so no float or rounding seam crosses
  * the engines. A fixed round count (not convergence-tested) keeps
  * the relation a pure function of the graph. BIGINT headroom: the
  * damped sum is bounded by 17 × total score mass ≈ 1.7e7 × |V|,
  * overflow-safe beyond 5·10¹¹ nodes.
  *
  * 100 TB shape: one round = one join of the edge list against the
  * |V|-sized score frame plus a dst-keyed aggregate — the canonical
  * iterative-join pattern. Rounds chain LINEARLY in the plan (each
  * round references the previous exactly once, so no e18-style 3^k
  * tree blowup), and callers pass a persisted edge frame so the graph
  * is scanned from cache, not recomputed per round. Nodes with no
  * in-links settle at the 150 000 ppm floor; a kNN graph has no
  * dangling nodes (every node emits exactly k edges), so no dangling
  * redistribution term is needed — [[scores]] requires that posture
  * instead of silently leaking mass. */
object PageRank {

  /** @param edges (src, dst) — the node set is `DISTINCT src`: every
    *              graph node must appear as a source (true of a kNN
    *              graph, where each node emits exactly k edges). A
    *              dst-only node would be silently dropped from the
    *              output and its received mass discarded — callers
    *              with such graphs add (v, v) self-loops first
    *              (self-loops are legal and feed a node its own
    *              contribution)
    * @param rounds fixed iteration count (≥ 0; 0 = uniform start) */
  def scores(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    // deg and nodes are referenced by EVERY round: without a persist
    // each reference is a fresh shuffle over the edge list (10
    // redundant aggregates at corpus scale).
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist(lvl)
    val nodes = edges.select(col("src").as("vec_id")).distinct().persist(lvl)
    try {
      // Force the graph side to materialize BEFORE the round loop. The
      // caller's edge frame often carries an expensive lineage (an
      // entire ANN graph build): if its cache is still cold — or gets
      // evicted — when a round references it, ONE miss replays that
      // build, and a lazy multi-round chain references it ~2× per
      // round. Counting deg and nodes here runs the build exactly once
      // and fills all three caches (both scans pull `edges` through
      // its own persist) while nothing else occupies executor memory.
      deg.count(); nodes.count()
      var s = nodes.withColumn("score", lit(1000000L))
      for (_ <- 1 to rounds) {
        val contrib = edges
          .join(s.select(col("vec_id").as("src"), col("score")), "src")
          .join(deg, "src")
          .select(col("dst"), expr("score div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("in_sum"))
        // Materialize EVERY round and cut its lineage (eager
        // localCheckpoint): plan depth stays constant across rounds
        // and a cache MISS re-reads round N−1's |V|-row blocks instead
        // of replaying the whole chain back through the graph build
        // (measured: the lazy 10-round form swung 28 s → 300 s on the
        // same box when the caches churned). Earlier rounds' blocks
        // are unreferenced after the next checkpoint and are reclaimed
        // by the context cleaner; peak extra footprint is O(|V|) rows
        // per live round — two orders below the edge list it protects.
        // Honest fault trade: localCheckpoint blocks live ON executors,
        // so on a multi-executor cluster a LOST executor mid-loop fails
        // the job fast (no lineage to recompute from) and the caller
        // retries the whole scores() call — bounded at rounds× the
        // per-round cost, vs the lazy chain's unbounded re-derivation
        // of the upstream graph build per reference. A deployment that
        // must survive executor loss in-flight swaps this for reliable
        // checkpoint() against a checkpoint dir (same call shape).
        s = nodes
          .join(contrib.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
          .select(col("vec_id"),
            (lit(150000L) +
              expr("(coalesce(in_sum, 0L) * 17) div 20")).as("score"))
          .localCheckpoint(true)
      }
      // the returned frame's lineage is one sort over the final
      // checkpoint — nothing pins the graph caches dropped below
      if (rounds == 0) s.orderBy("vec_id").localCheckpoint(true)
      else s.orderBy("vec_id")
    } finally {
      deg.unpersist(false)
      nodes.unpersist(false)
      ()
    }
  }
}
