package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * — integer division everywhere (Scala's `Long./` and Spark's `div`
  * and DuckDB's `//` all truncate toward zero on the nonnegative
  * domain the scores live in), so no float or rounding seam crosses
  * the engines. A fixed round count (not convergence-tested) keeps
  * the relation a pure function of the graph. BIGINT headroom: the
  * damped sum is bounded by 17 × total score mass ≈ 1.7e7 × |V|,
  * overflow-safe beyond 5·10¹¹ nodes.
  *
  * 100 TB shape (r21, the [[ConnectedComponents]] pattern — guide
  * §2.4): the graph lives on ONE `HashPartitioner` shared by the
  * edge, degree, and score RDDs, so a round is a narrow co-partitioned
  * join (edges × scores, zero shuffle), one `reduceByKey` of the
  * (dst, contribution) pairs — the single per-round shuffle, sized by
  * the measured |E| — and a narrow leftOuterJoin back onto the node
  * set. Nothing is broadcast, and no Catalyst round-plan is built:
  * the r20 DataFrame loop paid two broadcast builds plus an eagerly
  * checkpointed 2-round plan per cycle, ~0.5 s of fixed overhead per
  * round at |V| = 2000 that this form does not have. The whole loop
  * is one lazy RDD chain materialized by a single job; shuffle files
  * double as recomputation barriers, and the final scores are
  * localCheckpointed so the returned frame's lineage never replays
  * the caller's graph build. */
object PageRank {

  /** Shuffle-partition sizing for the per-round contribution
    * reduceByKey: ~4M edge rows (≈ 100 MB of (dst, contribution)
    * pairs) per reduce partition — the guide's 100 MB–1 GB band —
    * derived from the MEASURED edge count, never from the local core
    * count, so the same code sizes a 10k-edge bench graph to one
    * partition and a 10¹⁰-edge corpus to thousands. Capped at 4× the
    * cluster's parallelism as the runaway guard. */
  private val RoundPartitionRows = 4L * 1000 * 1000

  /** @param edges (src, dst) — the node set is `DISTINCT src`: every
    *              graph node must appear as a source (true of a kNN
    *              graph, where each node emits exactly k edges). A
    *              dst-only node would be silently dropped from the
    *              output and its received mass discarded — callers
    *              with such graphs add (v, v) self-loops first
    *              (self-loops are legal and feed a node its own
    *              contribution). Callers pass a PERSISTED frame: the
    *              one |E| sizing count and the one partitioning pass
    *              below are the only two reads of it
    * @param rounds fixed iteration count (≥ 0; 0 = uniform start) */
  def scores(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val spark = edges.sparkSession
    import spark.implicits._
    // the output's vec_id keeps the caller's src dtype (the RDD loop
    // runs on longs; integral widths narrower than long round-trip)
    val srcType = edges.schema("src").dataType
    val lvl = StorageLevel.MEMORY_AND_DISK
    val edgeCount = edges.count() // sizing read — rides the caller's persist
    val parts = math.max(1L, math.min(
      edgeCount / RoundPartitionRows + 1,
      4L * spark.sparkContext.defaultParallelism)).toInt
    val part = new HashPartitioner(parts)
    // ONE O(E) shuffle establishes the src partitioning every round
    // reuses; deg and the (dst, deg) edge view derive from it narrowly
    val edgesP = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .partitionBy(part)
      .persist(lvl)
    val deg = edgesP.mapValues(_ => 1L)
      .reduceByKey(part, _ + _) // same partitioner — no shuffle
      .persist(lvl)
    val withDeg = edgesP.join(deg).persist(lvl) // narrow: (src, (dst, deg))
    try {
      // materialize the round inputs once (fills deg's cache on the
      // way); edgesP is unreferenced beyond this point
      withDeg.count()
      var s = deg.mapValues(_ => 1000000L) // partitioned by `part`
      for (_ <- 1 to rounds) {
        val contrib = withDeg.join(s) // narrow co-partitioned join
          .map { case (_, ((dst, dg), sc)) => (dst, sc / dg) }
          .reduceByKey(part, _ + _) // THE per-round shuffle
        // floor + damped in-sum over the full node set (deg's keys);
        // a node nobody links to settles at the 150 000 ppm floor
        s = deg.leftOuterJoin(contrib, part).mapValues { case (_, in) =>
          150000L + in.getOrElse(0L) * 17L / 20L
        }
      }
      // eager localCheckpoint: the returned frame's lineage is the
      // checkpointed |V|-row blocks, so unpersisting the graph RDDs
      // below can never force a replay of the caller's graph build
      val fin = s.localCheckpoint()
      fin.count()
      fin.toDF("vec_id", "score")
        .select(col("vec_id").cast(srcType).as("vec_id"), col("score"))
        .orderBy("vec_id")
    } finally {
      withDeg.unpersist(false)
      deg.unpersist(false)
      edgesP.unpersist(false)
      ()
    }
  }
}
