package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TRAINER over a document corpus — the iterative
  * merge learning d15 exposes one step of (Sennrich et al., ACL 2016:
  * public algorithm, re-derived here Spark-first).
  *
  * Shape: the corpus collapses ONCE into the frequency-weighted
  * vocabulary (map-side-combined groupBy over exploded tokens); every
  * merge iteration then runs over the VOCABULARY — (term, weight,
  * symbol array) rows — which is what makes N merges tractable at
  * corpus scale: 100 TB of text is a few hundred million distinct
  * terms, and each iteration is one narrow job, never a corpus re-scan.
  *
  * Incremental pair maintenance (the part that makes MANY merges
  * tractable): pair counts live in a driver-side map — the same
  * driver-size statistic d15 returns (≈|alphabet|² keys initially,
  * growing only by the novel pairs each merge creates next to its merge
  * sites; this is the footprint every single-node BPE trainer carries,
  * while the vocabulary itself stays distributed — and it is guarded:
  * a corpus whose distinct-pair space explodes past `maxPairs` fails
  * loudly with a diagnosis instead of OOMing the driver). Each
  * iteration:
  *
  *   1. the argmax pair comes from a lazy-deletion heap over that map —
  *      no Spark job, exact ties on (count DESC, left ASC, right ASC);
  *   2. ONE narrow PARTITION-PRUNED job visits only the vocabulary
  *      partitions that contain the merged pair — the driver keeps an
  *      inverted index pair → {partition → count} (maintained from the
  *      same deltas the job returns), so untouched partitions are never
  *      even scheduled, let alone scanned ([[BpeTrainerSpec]] pins the
  *      task count). Within a visited partition the merges learned
  *      since the last compaction apply lazily per row (map fusion —
  *      no join, no materialization) and only rows that actually
  *      contain the new pair emit pair-count DELTAS, collected as a
  *      few-KB map merge on the driver. Untouched terms contribute
  *      nothing and are never rewritten or re-persisted — a
  *      full-vocabulary rewrite+persist per merge (see [[trainRescan]])
  *      is ~3 jobs and two vocabulary materializations per merge,
  *      i.e. days at 32k merges, and even a full-vocabulary SCAN per
  *      merge is days of cumulative scan at a 100M-term vocabulary ×
  *      32k merges;
  *   3. every `compactEvery` merges the accumulated lazy rewrites fold
  *      into a fresh checkpointed base (`localCheckpoint` truncates
  *      both plan and RDD lineage, so analyzer cost stays flat across
  *      thousands of iterations).
  *
  * Determinism: delta accounting is exact integer multiset arithmetic,
  * so the learned sequence is bit-identical to the full-rescan
  * reference ([[BpeTrainerSpec]] pins parity on the classic fixture, a
  * randomized corpus, and real testdata, including forced-compaction
  * cadences).
  */
object BpeTrainer {

  final case class VocabEntry(term: String, n: Long, syms: Seq[String])
  final case class Merge(left: String, right: String, count: Long)

  /** Measured driver-map footprint after seeding: `distinctPairs` is
    * the count-map size, `postingEntries` the inverted index's total
    * (pair, partition) entries — the quantity the seed collect actually
    * materializes — and `keyChars` the MEASURED char payload of all
    * pair keys. `estBytes` applies a documented conservative JVM model
    * on top: per count entry ≈ two String objects (16B header + 16B
    * array header + 2B/char) + 24B tuple + 40B HashMap node + 24B boxed
    * Long ≈ 168B + 2·chars; per posting entry ≈ 40B node + two 24B
    * boxes = 88B. The production dial: size `maxPairs` so
    * `maxPairs · (168 + 2·avgPairChars) + maxPairs·P̄·88` fits the
    * driver heap, where P̄ = mean partitions-per-pair (≤ the coalesced
    * partition count; Zipf corpora sit near 1 for the tail). */
  final case class Footprint(distinctPairs: Long, postingEntries: Long,
      keyChars: Long) {
    def estBytes: Long =
      distinctPairs * 168L + 2L * keyChars + postingEntries * 88L
  }

  /** Frequency-weighted vocabulary with initial character symbols. */
  def vocabulary(docs: DataFrame): DataFrame = {
    val toks = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"
    docs.select(explode(expr(toks)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .withColumn("syms", expr("transform(split(term, ''), c -> c)"))
      .filter(expr("size(syms) >= 1"))
  }

  /** Learn `nMerges` merges incrementally. Stops early when no pair
    * reaches `minPairCount`. Returns merges in learned order.
    *
    * `maxPairs` bounds the DRIVER pair-map footprint: training fails
    * loudly (with the corpus diagnosis) instead of grinding the driver
    * into GC death when a byte-noise corpus explodes the distinct-pair
    * space. `rowsPerPartition` is the coalesce target for the cached
    * vocabulary (test dial — production keeps the default). */
  def train(spark: SparkSession, docs: DataFrame, nMerges: Int,
      minPairCount: Long = 2L, compactEvery: Int = 16,
      maxPairs: Long = 10000000L,
      rowsPerPartition: Long = 65536L,
      heapCompactFactor: Int = 4,
      onFootprint: Footprint => Unit = _ => ()): Seq[Merge] = {
    import spark.implicits._
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    require(heapCompactFactor >= 0, s"heapCompactFactor $heapCompactFactor")
    require(rowsPerPartition >= 1, s"rowsPerPartition must be >= 1")
    var base = vocabulary(docs).as[VocabEntry]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocabCount = base.count() // materialize before the loop builds on the cache
    // right-size the per-merge jobs: the vocabulary arrives in
    // shuffle-partition-count partitions regardless of its size, and the
    // merge loop runs ONE JOB PER MERGE over it — a 31-term vocab on 32
    // partitions pays 32 empty task launches per merge, ~all of the
    // loop's wall clock. Coalesce (narrow, reads the cache) toward ~64k
    // rows/partition, floor 1, never widening; a corpus-scale vocabulary
    // keeps its parallelism untouched.
    val targetParts = math.max(1L, math.min(
      base.rdd.getNumPartitions.toLong,
      (vocabCount + rowsPerPartition - 1L) / rowsPerPartition)).toInt
    if (targetParts < base.rdd.getNumPartitions) {
      val sized = base.coalesce(targetParts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sized.count()
      base.unpersist(false)
      base = sized
    }
    // the original CacheManager-persisted base; compacted bases are
    // checkpoint-backed and release through the ContextCleaner instead
    val original = base

    // Driver pair statistics, maintained at PARTITION granularity: the
    // global count map feeds the argmax heap, and the per-pair postings
    // (pair -> {partition -> count}) are the INVERTED INDEX that lets a
    // merge's delta job read ONLY the partitions holding the merged
    // pair (PartitionPruningRDD below) instead of scanning the full
    // cached vocabulary — the difference between O(affected) and
    // O(vocabulary) per merge at a 32k-merge production run. Footprint:
    // postings add one (partition -> count) entry per pair per
    // partition CONTAINING it — Zipf-bounded like the count map itself
    // (hot pairs are few and dense, the long tail is 1-partition), and
    // both are guarded by `maxPairs`.
    val counts = scala.collection.mutable.HashMap[(String, String), Long]()
    val postings =
      scala.collection.mutable.HashMap[(String, String),
        scala.collection.mutable.HashMap[Int, Long]]()
    def applyDelta(pid: Int, p: (String, String), d: Long): Long = {
      val ng = counts.getOrElse(p, 0L) + d
      if (ng <= 0L) counts.remove(p) else counts(p) = ng
      val pm = postings.getOrElseUpdate(p,
        scala.collection.mutable.HashMap[Int, Long]())
      val np = pm.getOrElse(pid, 0L) + d
      if (np <= 0L) {
        pm.remove(pid)
        if (pm.isEmpty) { postings.remove(p); () }
      } else pm(pid) = np
      ng
    }
    def pairBudgetError(n: Long): IllegalStateException =
      new IllegalStateException(
        s"BPE pair map exceeded the driver budget: $n distinct " +
          s"adjacent pairs > maxPairs=$maxPairs. The corpus's symbol " +
          "distribution is noise-like (random bytes / binary content " +
          "produce ~|vocab| unique pairs, where natural text stays near " +
          "|alphabet|^2) — filter the corpus, or raise maxPairs if the " +
          "driver heap genuinely has room")
    def guardPairs(): Unit =
      if (counts.size > maxPairs) throw pairBudgetError(counts.size)
    // pre-flight budget check, DISTRIBUTED: a guard placed only after
    // the seed collect documents the blow-up it cannot prevent — by the
    // time it runs, every (partition, pair, count) triple has already
    // been materialized on the driver. Count the distinct pair space in
    // the cluster first (one shuffle over the cached vocabulary,
    // seconds next to a training run), so a noise-like corpus fails
    // with the diagnosis before a single pair lands on the driver.
    val preflightPairs = base.rdd.mapPartitions { rows =>
      val acc = scala.collection.mutable.HashMap[(String, String), Long]()
      rows.foreach(v => addPairs(acc, v.syms, v.n))
      acc.keysIterator
    }.distinct().count()
    if (preflightPairs > maxPairs) throw pairBudgetError(preflightPairs)
    // seeded by one shuffle-free job: each partition folds its rows
    // into a local map; the driver folds the per-partition maps
    base.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val acc = scala.collection.mutable.HashMap[(String, String), Long]()
      rows.foreach(v => addPairs(acc, v.syms, v.n))
      acc.iterator.map(kv => (pid, kv._1, kv._2))
    }.collect().foreach { case (pid, p, c) => applyDelta(pid, p, c) }
    guardPairs()
    // measured footprint of what the seed actually built — the
    // production-sizing line (Footprint documents the byte model and
    // the maxPairs dial; BpeTrainerSpec pins the model on a real run)
    locally {
      val fp = Footprint(counts.size.toLong,
        postings.valuesIterator.map(_.size.toLong).sum,
        counts.keysIterator.map(k => (k._1.length + k._2.length).toLong).sum)
      System.err.println(s"[bpe] seeded driver maps: ${fp.distinctPairs} " +
        s"pairs, ${fp.postingEntries} posting entries, ~${fp.estBytes} bytes " +
        s"(maxPairs=$maxPairs)")
      onFootprint(fp)
    }

    // max-heap with lazy deletion: entries are (count, left, right)
    // snapshots; an entry is live iff it matches the map's current count.
    // Tie-breaks compare UTF-8 BYTES, not String.compareTo (UTF-16 code
    // units): trainRescan's orderBy sorts Spark UTF8Strings in binary
    // UTF-8 order, and the two orders DISAGREE for supplementary-plane
    // symbols vs BMP chars in [U+E000, U+FFFF] — a code-unit tie-break
    // would silently break the advertised bit-identical parity on any
    // corpus with emoji next to fullwidth/CJK-compat characters
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c // larger count wins
          else {
            val l = utf8Compare(y._2, x._2) // smaller left wins
            if (l != 0) l else utf8Compare(y._3, x._3)
          }
        }
      })
    counts.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }

    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var pending = List.empty[(String, String)] // merges since last compaction, in order
    // the current base's checkpoint blocks (None while base is the
    // CacheManager-persisted original): released explicitly at the next
    // compaction — Dataset.unpersist can't see checkpoint storage, and
    // waiting for the ContextCleaner leaves up to one dead full-vocab
    // copy per compaction in executor storage between driver GCs
    var baseCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    try {
      var exhausted = false
      while (merges.size < nMerges && !exhausted) {
        // pop the best LIVE pair (stale snapshots are skipped)
        var best: Option[(Long, String, String)] = None
        while (best.isEmpty && heap.nonEmpty) {
          val e = heap.dequeue()
          if (counts.get((e._2, e._3)).contains(e._1)) best = Some(e)
        }
        best match {
          case Some((c, a, b)) if c >= minPairCount =>
            // one narrow PRUNED job: the postings name exactly the
            // partitions holding (a, b) — only those are scheduled
            // (PartitionPruningRDD: untouched partitions get no task,
            // their cached blocks are never deserialized). Within a
            // visited partition, pending rewrites apply lazily per row
            // and only rows containing (a, b) emit deltas.
            val pids = postings.get((a, b))
              .map(_.keysIterator.toArray.sorted).getOrElse(Array.empty[Int])
            assert(pids.nonEmpty, s"postings lost pair ($a,$b) with count $c")
            val pidSet = pids.toSet
            val hist = pending.reverse
            val sc = spark.sparkContext
            sc.setJobDescription(s"bpe-merge-delta:${merges.size}")
            val deltas =
              try {
                org.apache.spark.rdd.PartitionPruningRDD
                  .create(base.rdd, pidSet.contains)
                  .mapPartitionsWithIndex { (i, rows) =>
                    val pid = pids(i) // pruned partitions keep parent order
                    val acc = scala.collection.mutable.HashMap[(String, String), Long]()
                    rows.foreach { v =>
                      val cur = applyMerges(v.syms, hist)
                      if (containsAdjacent(cur, a, b)) {
                        addPairs(acc, cur, -v.n)
                        addPairs(acc, mergeOnce(cur, a, b), v.n)
                      }
                    }
                    acc.iterator.filter(_._2 != 0L)
                      .map(kv => (pid, kv._1, kv._2))
                  }.collect()
              } finally sc.setJobDescription(null)
            deltas.foreach { case (pid, p, d) =>
              val nc = applyDelta(pid, p, d)
              if (nc > 0L) heap.enqueue((nc, p._1, p._2))
            }
            guardPairs()
            // lazy deletion means the heap only ever GROWS (one stale
            // snapshot per applied delta survives until dequeued); over
            // a 32k-merge production run that is a slow driver-memory
            // leak. When stale entries dominate, rebuild from the live
            // count map — O(pairs), amortized free against the deltas
            // that grew it, and semantics-neutral (every live pair is
            // re-enqueued at its current count)
            if (heap.size > heapCompactFactor * math.max(counts.size, 1024)) {
              heap.clear()
              counts.foreach { case ((a2, b2), c2) => heap.enqueue((c2, a2, b2)) }
            }
            merges += Merge(a, b, c)
            pending = (a, b) :: pending
            if (pending.size >= compactEvery) {
              // fold the lazy rewrites into a fresh lineage-free base
              // (eager checkpoint, so the outgoing base can be released
              // immediately after — a localCheckpoint's blocks are the
              // data itself; truncated lineage means lost blocks are
              // unrecoverable either way, so dropping ancestors loses
              // no fault tolerance the checkpoint still had)
              val hist2 = pending.reverse
              val folded = base.map(v => v.copy(syms = applyMerges(v.syms, hist2)))
                .localCheckpoint(true)
              baseCkpt.foreach(_.unpersist(false))
              baseCkpt = folded.queryExecution.analyzed.collectFirst {
                case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
              }
              base.unpersist(false) // no-op on checkpoint-backed bases
              base = folded
              pending = Nil
            }
          case _ => exhausted = true
        }
      }
    } finally {
      original.unpersist(false)
      baseCkpt.foreach(_.unpersist(false)) // release the final checkpoint too
    }
    merges.toSeq
  }

  /** Full-rescan reference implementation: recomputes global pair
    * counts and rewrites + re-persists the ENTIRE vocabulary every
    * merge (~3 jobs and two vocabulary materializations per
    * iteration). Kept as the obviously-correct oracle the incremental
    * [[train]] is spec-pinned against — do not use at corpus scale. */
  def trainRescan(spark: SparkSession, docs: DataFrame, nMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    import spark.implicits._
    var vocab = vocabulary(docs).as[VocabEntry]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count() // materialize before the loop mutates the lineage
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    try {
      var i = 0
      var exhausted = false
      while (i < nMerges && !exhausted) {
        // pair counts over the vocabulary, weighted by term frequency
        val top = vocab.flatMap { v =>
          if (v.syms.length < 2) Iterator.empty
          else v.syms.iterator.zip(v.syms.iterator.drop(1))
            .map { case (a, b) => ((a, b), v.n) }
        }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .map { case ((a, b), c) => Merge(a, b, c) }
          .orderBy(col("count").desc, col("left"), col("right"))
          .limit(1).collect().headOption
        top match {
          case Some(m) if m.count >= minPairCount =>
            merges += m
            val next = vocab.map(v => v.copy(syms = mergeOnce(v.syms, m.left, m.right)))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            next.count()
            vocab.unpersist(false)
            vocab = next
            i += 1
          case _ => exhausted = true
        }
      }
    } finally vocab.unpersist(false)
    merges.toSeq
  }

  /** Persist a learned merge list as one JSON artifact (learned order
    * preserved — BPE inference is order-sensitive). Hadoop-FS + atomic
    * temp/rename like every other index sidecar here, so a tokenizer
    * trained on the cluster lands beside its corpus on HDFS/S3 and a
    * reader never sees a torn file. */
  def saveMerges(merges: Seq[Merge], path: String,
      c: org.apache.hadoop.conf.Configuration): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("format", "graft-bpe-merges-v1")
    val arr = root.putArray("merges")
    merges.foreach { m =>
      val n = arr.addObject()
      n.put("left", m.left); n.put("right", m.right); n.put("count", m.count)
      ()
    }
    graft.util.Fs.writeStringAtomic(path, mapper.writeValueAsString(root), c)
  }

  /** Load a [[saveMerges]] artifact, learned order preserved. */
  def loadMerges(path: String,
      c: org.apache.hadoop.conf.Configuration): Seq[Merge] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(graft.util.Fs.readString(path, c))
    require(root.path("format").asText() == "graft-bpe-merges-v1",
      s"$path is not a graft BPE merges artifact")
    import scala.jdk.CollectionConverters._
    root.get("merges").elements().asScala.map { n =>
      Merge(n.get("left").asText(), n.get("right").asText(),
        n.get("count").asLong())
    }.toSeq
  }

  /** Binary UTF-8 comparison — the order Spark's UTF8String sort uses
    * (unsigned byte-wise), so driver-side tie-breaks match trainRescan's
    * `orderBy` exactly. */
  private[operators] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  /** Add the weighted adjacent-pair multiset of `syms` into `acc`. */
  private def addPairs(acc: scala.collection.mutable.HashMap[(String, String), Long],
      syms: Seq[String], w: Long): Unit = {
    var i = 0
    val n = syms.length
    while (i + 1 < n) {
      val k = (syms(i), syms(i + 1))
      val nv = acc.getOrElse(k, 0L) + w
      if (nv == 0L) acc.remove(k) else acc(k) = nv
      i += 1
    }
  }

  private[operators] def containsAdjacent(syms: Seq[String], left: String,
      right: String): Boolean = {
    var i = 0
    val n = syms.length
    while (i + 1 < n) {
      if (syms(i) == left && syms(i + 1) == right) return true
      i += 1
    }
    false
  }

  /** Apply a learned-order merge list, one pass each (the training
    * rewrite — NOT the to-fixpoint inference pass of [[encode]]).
    * No-op rows return the input object unchanged (no allocation). */
  private[operators] def applyMerges(syms: Seq[String],
      ms: List[(String, String)]): Seq[String] = {
    var cur = syms
    var rest = ms
    while (rest.nonEmpty) {
      val (a, b) = rest.head
      if (containsAdjacent(cur, a, b)) cur = mergeOnce(cur, a, b)
      rest = rest.tail
    }
    cur
  }

  /** One left-to-right pass replacing adjacent (left, right) with the
    * concatenation — the canonical BPE rewrite (overlaps consume
    * greedily: a a a with merge (a,a) → aa a). */
  private[operators] def mergeOnce(syms: Seq[String], left: String,
      right: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Encode one term with a learned merge list (applied in learned
    * order, each to fixpoint — standard BPE inference). Driver-side
    * kernel; distributed encoding wraps it in [[encodeCounts]]. */
  def encode(term: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = term.split("").toSeq.filter(_.nonEmpty)
    merges.foreach { m =>
      var changed = true
      while (changed) {
        val next = mergeOnce(syms, m.left, m.right)
        changed = next != syms // value equality: mergeOnce always allocates
        syms = next
      }
    }
    syms
  }

  /** Distributed corpus encoding: per-document BPE token count under
    * the learned merges — the "how many tokens is my corpus under this
    * tokenizer" question every training-data budget starts from.
    * Zero-shuffle: merges broadcast, one narrow pass over the corpus,
    * with a per-partition TERM memo (Zipf does the rest — the hot
    * vocabulary encodes once per task, not once per occurrence; the
    * memo is size-capped so an adversarial all-unique-terms partition
    * degrades to straight encoding, never to memory growth). */
  def encodeCounts(spark: SparkSession, docs: DataFrame,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val toks = "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), t -> t != '')"
    docs.select(col("doc_id"), expr(toks).as("tk"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap[String, Long]()
        def tokCount(t: String): Long =
          memo.getOrElse(t, {
            val n = encode(t, bc.value).length.toLong
            if (memo.size < (1 << 20)) memo(t) = n
            n
          })
        it.map { case (id, tk) => (id, tk.iterator.map(tokCount).sum) }
      }
      .toDF("doc_id", "n_bpe_tokens")
  }
}
