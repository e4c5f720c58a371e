package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: connected components over a near-dup
  * pair graph, the step that turns pairwise "A ~ B" evidence into a
  * keep/drop decision per document (cluster id = min doc id in the
  * component; the canonical survivor is the doc equal to its cluster
  * id).
  *
  * Algorithm: distributed min-label propagation to fixpoint with
  *   - delta messages (Pregel's vote-to-halt: only vertices whose label
  *     improved last round send, so late rounds move O(frontier) rows,
  *     not O(E)), and
  *   - pointer compression (label(v) ← label(label(v)) for updated
  *     vertices, so chains collapse in O(log diameter) rounds instead
  *     of O(diameter)).
  *
  * Why the loop body is RDDs and not DataFrames: an iterative fixpoint
  * re-plans, re-codegens, and — because checkpointed frames carry no
  * stats — re-sorts for stats-blind sort-merge joins EVERY round; a
  * measured DataFrame version of this loop spent ~2 s/round on a 90k-
  * vertex graph with a 4-row frontier, all fixed overhead. With one
  * `HashPartitioner` shared by the edge and label RDDs, every per-round
  * join is narrow (cogroup over co-located partitions, no sort, no
  * replan), and the only shuffles are the O(frontier) message reduce
  * and label-lookup — the same partitioner-reuse design GraphX's Pregel
  * uses. The DataFrame API remains the operator's boundary.
  *
  * Scale notes (100 TB): edges shuffle exactly once (the adjacency
  * partitionBy) and persist as per-vertex arrays — RDD cogroup
  * hash-builds every row of its inputs, so joining the frontier against
  * adjacency costs O(V) map inserts per round instead of O(E); labels
  * localCheckpoint each round so lineage stays O(1) deep (swap in
  * reliable `checkpoint()` + a checkpoint dir under executor churn);
  * per-round network cost is proportional to the frontier, which for
  * near-dup blobs collapses after 2–3 rounds. Round count is bounded by
  * the min vertex's eccentricity; for adversarial giant-diameter
  * graphs use [[resolveStarContraction]], whose round count is
  * O(log² n) regardless of diameter.
  */
object ConnectedComponents {

  // returned label DataFrames are lazy views over a persisted RDD; the
  // registry lets callers release that cache once they have materialized
  // their own downstream result (identity-keyed: DataFrame does not
  // override equals)
  private val labelRdds =
    new java.util.concurrent.ConcurrentHashMap[DataFrame, RDD[(Long, Long)]]()

  /** Unpersist the label RDD backing a DataFrame returned by [[resolve]]
    * or [[resolveStarContraction]]. Call only after materializing (or
    * persisting) everything derived from it. */
  def releaseLabels(df: DataFrame): Unit = {
    val r = labelRdds.remove(df)
    if (r != null) r.unpersist(false)
  }

  /** Driver-side union-find for graphs under the collect threshold:
    * path-halving find + union-by-size, then one sweep assigning each
    * root its component minimum. O(E α(V)) time, O(V) memory — a 5M-edge
    * graph resolves in tens of milliseconds where the distributed loop
    * pays seconds of scheduling per round. */
  private def resolveDriver(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    // Primitive collect: flatten each partition to one Long array INSIDE
    // the executors (InternalRow.getLong on the columnar execution — no
    // Row allocation, no Tuple2 boxing) and collect those. The earlier
    // pairs.collect() materialized a GenericRowWithSchema + two boxed
    // Longs per edge, ~10x the 16 bytes/edge the flat arrays cost.
    val chunks: Array[Array[Long]] = pairs.queryExecution.toRdd
      .mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r =>
          // InternalRow.getLong on a NULL slot silently decodes as 0L —
          // a malformed edge input would fabricate edges to vertex 0
          // where the old Row.getLong collect threw. Fail loudly instead.
          require(!r.isNullAt(0) && !r.isNullAt(1),
            "connected-components edge input contains NULL vertex ids")
          buf += r.getLong(0); buf += r.getLong(1)
        }
        Iterator(buf.result())
      }.collect()
    val parent = new scala.collection.mutable.LongMap[Long]()
    val size = new scala.collection.mutable.LongMap[Long]()

    def find(x0: Long): Long = {
      var x = x0
      while (parent(x) != x) {
        val g = parent(parent(x)) // path halving
        parent(x) = g
        x = g
      }
      x
    }
    def add(v: Long): Unit =
      if (!parent.contains(v)) { parent(v) = v; size(v) = 1L }

    chunks.foreach { arr =>
      var k = 0
      while (k < arr.length) {
        val a = arr(k); val b = arr(k + 1)
        add(a); add(b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (size(ra) >= size(rb)) { parent(rb) = ra; size(ra) += size(rb) }
          else { parent(ra) = rb; size(rb) += size(ra) }
        }
        k += 2
      }
    }
    // component minimum per root, then (v, label) for every seen vertex
    val minOfRoot = new scala.collection.mutable.LongMap[Long]()
    parent.keysIterator.foreach { v =>
      val r = find(v)
      val cur = minOfRoot.getOrElse(r, Long.MaxValue)
      if (v < cur) minOfRoot(r) = v
    }
    val rows = parent.keysIterator
      .map(v => Row(v, minOfRoot(find(v)))).toSeq
    val schema = StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("label", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(rows.size / 100000, 32))), schema)
  }

  /** Resolve components of the undirected graph given by `edges`
    * (two integral columns: endpoints). Returns (v, label) with
    * label = min vertex id reachable. Only vertices that appear in an
    * edge are returned — isolated docs are their own cluster by
    * definition and never shuffle.
    *
    * SIZE-ADAPTIVE (the AQE-broadcast decision applied to iteration):
    * below `driverEdgeThreshold` edges the graph is collected and
    * solved with union-find on the driver, where the iterative cluster
    * path would pay multi-second scheduler overhead PER ROUND for a
    * graph union-find finishes in milliseconds. Threshold calibration
    * (measured via gc-sampled peak heap on a synthetic graph, JDK 17):
    * the primitive edge collect is exactly 16 B/edge; peak driver heap
    * including the union-find maps and the output rows is ~200 B/edge
    * at V=E/4 (dup-heavy, the contracted-c01 shape) and ~460 B/edge at
    * V≈1.25E (sparse worst case) — per-VERTEX structures dominate
    * (two LongMaps with boxed values + the label Row seq). 5M edges ≈
    * ≤2.3 GB peak worst-case, comfortable in the 8 GB driver with the
    * session's own baseline, which is why the default stays 5M rather
    * than the ~10x a pure 16 B/edge reading would suggest. Above the
    * threshold, the distributed min-label loop runs with its
    * partitioner sized to the edge count, not the global shuffle
    * default — a 20M-edge graph does not need 200 reducers per
    * frontier hop. The contraction step feeding this operator (c01
    * collapses identical signatures first) is what makes the small
    * side common in practice: even 100 TB corpora contract to
    * edge-per-distinct-signature graphs. */
  def resolve(edges: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50,
      driverEdgeThreshold: Long = 5000000L): DataFrame = {
    val spark = edges.sparkSession
    val pairs = edges.select(col(aCol).cast("long"), col(bCol).cast("long"))
    // cardinality probe: one cheap count on a (usually caller-persisted)
    // two-column frame decides the strategy, exactly like AQE reading a
    // shuffle stage's statistics before choosing the join
    val edgeCount = pairs.count()
    if (edgeCount <= driverEdgeThreshold) return resolveDriver(pairs)

    val maxPart = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val part = new HashPartitioner(
      math.max(1, math.min(maxPart, (edgeCount / 2000000L).toInt)))

    // No edge distinct(): parallel edges are harmless under min-reduce
    // (idempotent) and deduping them would cost a full extra shuffle of
    // O(E) — the one-time partitionBy below is the only O(E) shuffle.
    // Edges then collapse into per-vertex adjacency arrays: RDD cogroup
    // hash-builds EVERY row of both sides, so joining the frontier
    // against raw (src, dst) pairs would rebuild an O(E) map each round;
    // against adjacency it rebuilds O(V) — groupByKey over the shared
    // partitioner is narrow (no shuffle, local grouping only).
    val adj = pairs.rdd
      .flatMap { r => val a = r.getLong(0); val b = r.getLong(1)
        Seq((a, b), (b, a)) }
      .partitionBy(part)
      .groupByKey(part)
      .mapValues(_.toArray)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // adjacency keys ARE the vertex set, already partitioned like part.
    // Seed label(v) = min(v, neighbors(v)) — the first hook round's
    // result, computed per partition for free since the neighbors are
    // right there in the adjacency array; the min then spreads two hops
    // per round (seed + hook) instead of one, shaving rounds off the
    // eccentricity bound. Delta invariant is unaffected: round 1 still
    // sends from every vertex.
    var labels: RDD[(Long, Long)] = adj
      .mapPartitions(_.map { case (v, nbrs) =>
        var m = v
        var i = 0
        while (i < nbrs.length) { if (nbrs(i) < m) m = nbrs(i); i += 1 }
        (v, m)
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = labels
    var changedCount = labels.count()

    var round = 0
    val initialLabels = labels
    while (changedCount > 0 && round < maxRounds) {
      round += 1
      // hook: neighbors of changed vertices take the min offered label.
      // adj is part-partitioned, so this join is narrow on the edge side;
      // only the (small) frontier shuffles in.
      val msgs = adj.join(changed, part)
        .flatMap { case (_, (nbrs, lab)) => nbrs.iterator.map((_, lab)) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      val improved = msgs.join(labels, part)
        .flatMap { case (v, (cand, cur)) =>
          if (cand < cur) Some((v, cand)) else None }
      // compress (pointer jumping): the new label is itself a vertex id
      // whose label is already ≤ it — jump straight there. One extra
      // O(frontier) shuffle against the label map. (Round count is
      // ultimately bounded below by the min vertex's eccentricity —
      // labels flood edge-by-edge — so deeper per-round jumping buys
      // nothing; measured identical with a double hop.)
      val compressed = improved
        .map { case (v, l) => (l, v) }
        .join(labels, part)
        .map { case (_, (v, ll)) => (v, ll) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      val next = labels.leftOuterJoin(compressed, part)
        .mapValues { case (old, upd) => upd.getOrElse(old) }
      next.localCheckpoint() // truncate lineage: O(1) plan depth per round
      // one heavy job per round: materializing next runs the whole
      // message→hook→compress pipeline and fills compressed's persist;
      // the frontier count after it is a cached-scan triviality
      next.count()
      changedCount = compressed.count()
      // retire the superseded generation NOW — next is checkpointed and
      // no longer references them, and keeping every round cached would
      // make peak storage O(rounds × V) instead of O(V)
      labels.unpersist(false)
      if (!(changed eq labels)) changed.unpersist(false)
      labels = next
      changed = compressed
    }
    require(changedCount == 0, s"did not converge in $maxRounds rounds")
    adj.unpersist(false)
    if (!(changed eq labels)) changed.unpersist(false) // final empty frontier
    if (!(initialLabels eq labels)) initialLabels.unpersist(false)

    val schema = StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("label", LongType, nullable = false)))
    val out =
      spark.createDataFrame(labels.map { case (v, l) => Row(v, l) }, schema)
    labelRdds.put(out, labels)
    out
  }

  /** Alternative resolver for adversarial graphs: the two-phase
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", 2014). Label propagation
    * ([[resolve]]) needs rounds proportional to the min vertex's
    * eccentricity — fine for near-dup blobs, painful for a 10⁶-long
    * chain; star contraction rewrites the EDGE SET each round
    * (large-star hangs every neighbor larger than u off Γ(u)'s min,
    * small-star re-parents u's smaller neighbors), which provably
    * converges in O(log² n) rounds regardless of diameter. Same output
    * contract as [[resolve]]: (v, label) with label = component min,
    * edge-participating vertices only.
    *
    * Cost shape: every round shuffles the current edge set twice (one
    * groupByKey per phase) — more per-round IO than resolve's delta
    * frontiers, which is why resolve is the default and this is the
    * diameter-insurance variant. */
  def resolveStarContraction(edges: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val part = new HashPartitioner(
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)

    def largeStar(e: RDD[(Long, Long)]): RDD[(Long, Long)] =
      e.flatMap { case (u, v) => Seq((u, v), (v, u)) }
        .groupByKey(part)
        .flatMap { case (u, nbrs) =>
          var m = u
          nbrs.foreach(n => if (n < m) m = n)
          // hang every LARGER neighbor off the minimum of Γ(u) ∪ {u}
          nbrs.iterator.filter(_ > u).map(x => (x, m)) ++
            (if (m != u) Iterator((u, m)) else Iterator.empty)
        }
        .distinct()

    def smallStar(e: RDD[(Long, Long)]): RDD[(Long, Long)] =
      e.map { case (u, v) => if (u > v) (u, v) else (v, u) }
        .groupByKey(part)
        .flatMap { case (u, smaller) =>
          var m = u
          smaller.foreach(n => if (n < m) m = n)
          // re-parent u and its smaller neighbors onto the minimum
          smaller.iterator.filter(_ != m).map(x => (x, m)) ++
            (if (m != u) Iterator((u, m)) else Iterator.empty)
        }
        .distinct()

    var e: RDD[(Long, Long)] = edges
      .select(col(aCol).cast("long"), col(bCol).cast("long")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }
      .persist(StorageLevel.MEMORY_AND_DISK)
    // all vertices, to re-attach roots and isolated-within-the-edge-set
    // vertices at the end
    val vertices = e.flatMap { case (a, b) => Seq(a, b) }.distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var round = 0
    var converged = e.isEmpty()
    var checksum = (e.count(), e.map(_._1).sum(), e.map(_._2).sum())
    while (!converged && round < maxRounds) {
      round += 1
      val next = smallStar(largeStar(e)).persist(StorageLevel.MEMORY_AND_DISK)
      next.localCheckpoint()
      val nextSum = (next.count(), next.map(_._1).sum(), next.map(_._2).sum())
      e.unpersist(false)
      e = next
      converged = nextSum == checksum
      checksum = nextSum
    }
    require(converged, s"did not converge in $maxRounds rounds")

    // converged edge set is a star forest: each non-root points at its
    // component min; roots get themselves back via the vertex set.
    // Materialize + checkpoint BEFORE releasing the inputs — the labels
    // RDD is lazy, and unpersisting a localCheckpointed parent deletes
    // the only copy of its partitions.
    val labels = vertices.map(v => (v, v))
      .leftOuterJoin(e.reduceByKey(math.min(_: Long, _: Long)), part)
      .map { case (v, (_, root)) => (v, root.getOrElse(v)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.localCheckpoint()
    labels.count()
    e.unpersist(false)
    vertices.unpersist(false)
    val schema = StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("label", LongType, nullable = false)))
    val out =
      spark.createDataFrame(labels.map { case (v, l) => Row(v, l) }, schema)
    labelRdds.put(out, labels)
    out
  }
}
