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
  /** Shuffle-partition sizing for the round loop: ~4M edge rows
    * (≈ 100 MB of (dst, contribution) pairs) per reduce partition —
    * the guide's 100 MB–1 GB band — derived from the MEASURED edge
    * count, never from the local core count, so the same code sizes a
    * 10k-edge bench graph to one partition and a 10¹⁰-edge corpus to
    * thousands. Capped at 4× the cluster's parallelism as the
    * runaway guard. */
  private val RoundPartitionRows = 4L * 1000 * 1000

  def scores(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val spark = edges.sparkSession
    // deg and nodes are referenced by EVERY round: without a persist
    // each reference is a fresh shuffle over the edge list (10
    // redundant aggregates at corpus scale).
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist(lvl)
    val nodes = edges.select(col("src").as("vec_id")).distinct().persist(lvl)
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
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
      // Static planning for the loop (r20 optimization, guide §2):
      // every round has the SAME known shape — join on src, aggregate
      // by dst over exactly |E| rows — so AQE's per-stage re-planning
      // buys nothing and its stage-by-stage execution added ~40% wall
      // to the 10-round loop (measured 7.5–9.3 s → 4.7–5.3 s at
      // sf0.1). Partition count comes from the measured |E| (the
      // count rides the caller's persisted edge cache), NOT the local
      // core count — see [[RoundPartitionRows]]. Both confs are
      // session-scoped; they are set only around the eager round
      // actions below and restored in finally (the returned frame's
      // final sort is planned by the caller after restoration).
      val edgeCount = edges.count()
      val parts = math.max(1L, math.min(
        edgeCount / RoundPartitionRows + 1,
        4L * spark.sparkContext.defaultParallelism)).toInt
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      var s = nodes.withColumn("score", lit(1000000L))
      for (r <- 1 to rounds) {
        val contrib = edges
          .join(s.select(col("vec_id").as("src"), col("score")), "src")
          .join(deg, "src")
          .select(col("dst"), expr("score div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("in_sum"))
        val nxt = nodes
          .join(contrib.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
          .select(col("vec_id"),
            (lit(150000L) +
              expr("(coalesce(in_sum, 0L) * 17) div 20")).as("score"))
        // Materialize every SECOND round and cut its lineage (eager
        // localCheckpoint): plan depth stays bounded at two rounds and
        // a cache MISS re-derives at most two rounds from the previous
        // checkpoint's |V|-row blocks instead of replaying the whole
        // chain back through the graph build (measured: the lazy
        // 10-round form swung 28 s → 300 s on the same box when the
        // caches churned; per-round checkpoints fixed that in r19, and
        // r20 halved the checkpoint job count — the replay exposure
        // stays bounded, 10 jobs → 5). Earlier rounds' blocks are
        // unreferenced after the next checkpoint and are reclaimed by
        // the context cleaner; peak extra footprint is O(|V|) rows per
        // live round — two orders below the edge list it protects.
        // Honest fault trade: localCheckpoint blocks live ON executors,
        // so on a multi-executor cluster a LOST executor mid-loop fails
        // the job fast (no lineage to recompute from) and the caller
        // retries the whole scores() call — bounded at rounds× the
        // per-round cost, vs the lazy chain's unbounded re-derivation
        // of the upstream graph build per reference. A deployment that
        // must survive executor loss in-flight swaps this for reliable
        // checkpoint() against a checkpoint dir (same call shape).
        s = if (r % 2 == 0 || r == rounds) nxt.localCheckpoint(true) else nxt
      }
      // the returned frame's lineage is one sort over the final
      // checkpoint — nothing pins the graph caches dropped below
      if (rounds == 0) s.orderBy("vec_id").localCheckpoint(true)
      else s.orderBy("vec_id")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.shuffle.partitions", partsBefore)
      deg.unpersist(false)
      nodes.unpersist(false)
      ()
    }
  }
}
