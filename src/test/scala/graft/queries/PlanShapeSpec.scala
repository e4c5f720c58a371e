package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Physical-plan shape assertions — the "would this survive 100×"
  * properties that row counts can't see. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private val dir = "/root/testdata/sf0.001"

  test("q19 CMS build scans events exactly once") {
    val df = Relational.defs("q19_cms_sketch").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"expected one events scan, plan had $scans:\n$plan")
  }

  /** Shared fence/filter-hygiene assertions for both migrate data
    * paths: the OptimizerBarrier must survive optimization (without it
    * PushDownPredicates inlines every cast chain into one filter
    * predicate whose generated method blows the JVM JIT's 8 KB limit),
    * and no Filter may carry the cast machinery — quarantine filtering
    * is on the fenced ATTRIBUTE only. */
  private def assertCastStageHygiene(
      good: org.apache.spark.sql.DataFrame): String = {
    val plan = good.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("optimizer_barrier"), s)
    val filters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition.toString }
    assert(filters.nonEmpty, s)
    filters.foreach { c =>
      assert(!c.contains("copy_unescape") && !c.contains("RLIKE") &&
        !c.contains("gettimestamp"),
        s"cast chain leaked into a Filter predicate: $c")
    }
    s
  }

  test("pg dump cast stage (V2 default): fence present, byte-range scan, no cast in Filter") {
    val m = graft.sources.pgdump.PgDumpReader.migrate(spark,
      "src/test/resources/fixtures/sample.pgdump")
    val (good, _) = m.tables("inventory")
    val s = assertCastStageHygiene(good)
    // the default data path reads through the V2 byte-range source:
    // unescape runs inside the PartitionReader (single-pass, shared
    // between filter eval and row construction), so the plan shows a
    // pgdump BatchScan, not a text scan + expression chain
    assert(s.contains("BatchScan pgdump"), s)
    m.release()
  }

  test("pg dump cast stage (line-ranged fallback): fence present, scan stage codegens") {
    val m = graft.sources.pgdump.PgDumpReader.migrate(spark,
      "src/test/resources/fixtures/sample.pgdump", dataViaV2 = false)
    val (good, _) = m.tables("inventory")
    val s = assertCastStageHygiene(good)
    // the fallback's bulk scan stage (line split + copy_unescape +
    // field projection) must stay inside whole-stage codegen — the hot
    // O(dump bytes) path a Spark upgrade must not silently de-compile
    val wsc = good.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString }
    assert(wsc.exists(_.contains("copy_unescape")),
      s"bulk unescape stage fell out of whole-stage codegen:\n$s")
    m.release()
  }

  test("e04/e07 cosine verify: dot fold fenced out of the join condition") {
    for (name <- Seq("e04_cosine_neardup", "e07_semantic_dedup")) {
      val df = TextMedia.defs(name).build(spark, dir)
      // string-level walk: SparkPlan.collect does not descend into an
      // unexecuted AdaptiveSparkPlan wrapper, but every join operator
      // prints its condition on its own plan line
      val plan = df.queryExecution.executedPlan.toString
      // the fence survives optimization...
      assert(plan.contains("optimizer_barrier"), s"$name: $plan")
      // ...and no join line carries the 64-element aggregate fold
      // (unfenced, PushDownPredicates inlines it 3× per candidate pair)
      val joinLines = plan.linesIterator.filter(_.contains("Join")).toSeq
      assert(joinLines.nonEmpty, s"$name: no join in plan\n$plan")
      joinLines.foreach { l =>
        assert(!l.contains("aggregate("),
          s"$name: dot fold leaked into a join condition: $l")
      }
    }
  }

  test("m01 verify: array_intersect fenced to exactly one evaluation per pair") {
    val df = Similarity.defs("m01_minhash_lsh_neardup").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("optimizer_barrier"), plan)
    // one occurrence total: in the fenced projection, never in a join
    // condition (unfenced it appears 3x — twice in the jaccard filter
    // pushed into the join, once in the output projection)
    val n = "array_intersect".r.findAllIn(plan).size
    assert(n === 1, s"expected exactly one array_intersect, got $n:\n$plan")
    graft.queries.QueryDef.drainCleanups()
  }

  test("e12 graph build: codegen dot kernel, partial top-k, no cartesian") {
    // e12's QueryDef entry is retired (r20) — pin the operator's frozen
    // dial directly; e12b rides the same knnGraph body with scaled k
    val df = graft.operators.IvfAnn.knnGraph(spark, dir, topK = 5)
    val plan = df.queryExecution.executedPlan.toString
    // the r11 regression class this guards: the rerank dot as an
    // interpreted HOF fold priced the sf0.1 graph at 55 s; the native
    // kernel runs it inside codegen at ~2 s
    assert(plan.contains("array_dot"), plan)
    assert(!plan.contains("zip_with"), s"interpreted HOF fold in the hot path:\n$plan")
    // top-k must shrink BEFORE the per-query shuffle (WindowGroupLimit
    // partial mode), or 100× the corpus shuffles 100× the pairs
    assert(plan.contains("WindowGroupLimit"), plan)
    // the only unconstrained join allowed is corpus × broadcast k-row
    // centroid frame; a CartesianProduct means the candidate join
    // degenerated to all-pairs
    assert(!plan.contains("CartesianProduct"), plan)
    graft.queries.QueryDef.drainCleanups()
  }

  test("q23 argmin shrinks via partial WindowGroupLimit before the shuffle") {
    val df = Relational.defs("q23_min_cost_supplier").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // both phases present: Partial limits per map task, Final after the
    // exchange — at 100× the (part, supplier) rows, only per-part top-1
    // survivors shuffle
    assert(plan.contains("WindowGroupLimit"), plan)
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q18 bucketed range join emits no duplicate pairs without a distinct") {
    val df = Relational.defs("q18_range_join").build(spark, dir)
    // no dedup operator in the plan...
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Deduplicate"), plan)
    // ...and the result is duplicate-free anyway: each pair matches in
    // exactly one exploded bucket
    val n = df.count()
    assert(n === df.dropDuplicates("err_id", "click_id").count())
    assert(n > 0, "fixture range join should produce pairs")
  }

  test("q26 EXISTS stays a semi join — no pair materialization, no dedup") {
    val df = Relational.defs("q26_priority_check").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the semi join short-circuits per order; an inner-join+distinct
    // rewrite would materialize every (order, late-line) pair first
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("Deduplicate") && !plan.contains("CartesianProduct"), plan)
  }

  test("d18 repetition stats shuffle nothing but the output sort") {
    val df = Documents.defs("d18_repetition_filter").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the within-doc gram counts are per-row expression work (sorted
    // array + neighbor scan + run-length fold) — at 100× the corpus the
    // only exchanges are the deterministic ORDER BY of the output and
    // QueryDef.spread's round-robin scan fan-out; a hashpartitioning
    // exchange would mean the grams exploded into a (doc, gram)
    // aggregate after all
    assert(!plan.contains("hashpartitioning"),
      s"per-doc stats turned into a key shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"grams exploded instead of folded:\n$plan")
    val n = "Exchange".r.findAllIn(plan).size
    assert(n === 2, s"expected sort + spread exchanges only, got $n:\n$plan")
  }

  test("d19 novelty: distinct-before-explode bounds the gram shuffle") {
    val df = Documents.defs("d19_ngram_novelty").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // partial aggregation must run map-side on the gram key so the
    // exchange carries combined (gram, count) rows, not raw occurrences
    assert(plan.contains("HashAggregate"), plan)
    assert("array_distinct".r.findFirstIn(plan).isDefined,
      s"per-doc distinct dropped before the explode:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q27 big orders: lineitem scan prunes to its two join/agg columns") {
    val df = Relational.defs("q27_big_orders").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the fact table must reach parquet with only (l_orderkey,
    // l_quantity) in ReadSchema — a scan dragging all 16 lineitem
    // columns through the qualifying-set aggregate reads ~8x the bytes
    val liScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem"))
      .toSeq
    assert(liScans.size === 1, s"lineitem must be scanned exactly once:\n$plan")
    val rs = liScans.head.split("ReadSchema: ").last
    assert(rs.contains("l_orderkey") && rs.contains("l_quantity"), rs)
    assert(!rs.contains("l_comment") && !rs.contains("l_extendedprice"),
      s"column pruning failed: $rs")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q30 NOT IN blacklist compiles to one anti join, no dedup") {
    val df = Relational.defs("q30_supplier_diversity").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    // countDistinct rewrites to a two-level aggregate, never a
    // Deduplicate/exploded pair set; and nothing goes cartesian
    assert(!plan.contains("Deduplicate") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("q31 disjunction: implied filters reach BOTH scans") {
    val df = Relational.defs("q31_disjunctive_revenue").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // Catalyst cannot push the OR itself, but it must derive and push
    // the per-table envelopes: the three-brand IN-set to part, the
    // quantity bounds to lineitem — PushedFilters on each scan. If
    // either scan line loses its pushed predicate, the join processes
    // the full fact table at 100x.
    val scan = (t: String) => plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains(s"$t.parquet"))
      .toSeq
    val part = scan("part"); val li = scan("lineitem")
    assert(part.size === 1 && li.size === 1, plan)
    assert(part.head.contains("PushedFilters") && part.head.contains("p_brand"),
      s"brand envelope not pushed to part scan: ${part.head}")
    assert(li.head.contains("PushedFilters") && li.head.contains("l_quantity"),
      s"quantity envelope not pushed to lineitem scan: ${li.head}")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q33 agg-vs-global-agg: two fact scans, 1-row broadcast, no per-group subquery") {
    val df = Relational.defs("q33_value_concentration").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
      .size
    assert(scans === 2,
      s"expected exactly groups + total scans of lineitem, got $scans:\n$plan")
    // the global total rides as a broadcast single row — the legitimate
    // bounded NLJ shape (q09/q22's) — never a cartesian of real data
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q32 exists/not-exists chain stays semi + anti over id-only pairs") {
    val df = Relational.defs("q32_waiting_supplier").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the self-join operands are the collapsed (orderkey, suppkey)
    // pairs: no join may carry lineitem's measure columns
    val joinLines = plan.linesIterator.filter(_.contains("Join")).toSeq
    joinLines.foreach { l =>
      assert(!l.contains("l_extendedprice") && !l.contains("l_quantity"),
        s"wide lineitem columns entered a join: $l")
    }
  }

  test("q34 promo share: ONE fact scan, numerator as conditional agg") {
    val df = Relational.defs("q34_promo_revenue").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the promo numerator must ride inside the same aggregate pass —
    // a second lineitem scan (or a self-join) to split promo/total
    // doubles the 100 TB read for a CASE's worth of work
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
      .size
    assert(scans === 1, s"expected one lineitem scan, got $scans:\n$plan")
    // the quarter filter reaches the scan
    val li = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
      .toSeq.head
    assert(li.contains("PushedFilters") && li.contains("l_shipdate"),
      s"shipdate window not pushed: $li")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q36 decorrelated avg: per-part stats equi-join back, never a per-row re-scan") {
    val df = Relational.defs("q36_small_quantity_revenue").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the correlated form would re-scan lineitem per outer row; the
    // decorrelated plan has exactly two fact scans (rows + stats) and
    // joins them hash-equi on the part key
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
      .size
    assert(scans === 2, s"expected rows + stats scans, got $scans:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the threshold must join on the part key, not re-scan:\n$plan")
  }

  test("q37 nested IN chain: two semi joins over id-only frames") {
    val df = Relational.defs("q37_promotable_suppliers").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val semis = plan.linesIterator.count(_.contains("LeftSemi"))
    assert(semis >= 2, s"expected the family AND supplier semi joins:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the supplier probe side must be id-only: no volume or quantity
    // columns may ride into the outer semi join
    val joinLines = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("s_suppkey")).toSeq
    joinLines.foreach { l =>
      assert(!l.contains("l_quantity") && !l.contains(" v#"),
        s"non-id columns entered the supplier semi join: $l")
    }
  }

  test("q38 twice-aliased nation dims broadcast; ship window reaches the fact scan") {
    val df = Relational.defs("q38_volume_shipping").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // two nation copies, each a broadcast hash join — if either falls
    // back to a shuffle, 25 dim rows reshuffle the whole fact stream
    val nationScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("nation.parquet"))
      .size
    assert(nationScans === 2, s"expected two aliased nation scans:\n$plan")
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"both nation joins must broadcast, saw $bhj:\n$plan")
    val li = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
      .toSeq
    assert(li.size === 1, s"expected one lineitem scan:\n$plan")
    assert(li.head.contains("PushedFilters") && li.head.contains("l_shipdate"),
      s"ship-year window not pushed: ${li.head}")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q39 profit: both sums ride ONE aggregate over one fact scan") {
    val df = Relational.defs("q39_product_profit").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // revenue and cost are a difference of two SUMs over the same
    // joined rows — a plan that scans lineitem twice (self-join or
    // per-term pass) doubles the 100 TB read
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
      .size
    assert(scans === 1, s"expected one lineitem scan, got $scans:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("d22 PII scrub is a map-only pass: no joins, no aggregate exchange") {
    val df = Documents.defs("d22_pii_scrub").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // redaction is per-row regex work — any join or aggregate in this
    // plan means the scrub stopped pipelining at 100 TB. The only
    // exchange allowed is the output sort's range partitioning.
    assert(!plan.contains("Join"), s"scrub must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"scrub must not aggregate:\n$plan")
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("documents.parquet"))
      .size
    assert(scans === 1, s"expected one documents scan:\n$plan")
  }

  test("d23 boilerplate marking joins the corpus against a BROADCAST line set") {
    val df = Documents.defs("d23_boilerplate_lines").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the qualifying set is structurally tiny (> total/40 distinct docs
    // per line caps it at 40x mean lines-per-doc), so marking must be a
    // broadcast join — a sort-merge join here reshuffles every line of
    // the corpus against a <100-row table
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side reshuffle against a tiny line set:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q40 distribution keeps the LEFT OUTER join (zero bucket survives)") {
    val df = Relational.defs("q40_order_count_distribution").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the zero-order bucket exists ONLY if the outer join survives
    // optimization — count(match_col) must not let Catalyst rewrite it
    // to inner; and the histogram is two hash aggregates, never a
    // dedup/explode pair
    assert(plan.contains("LeftOuter"), s"outer join rewritten away:\n$plan")
    assert(!plan.contains("Deduplicate") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("c20 canonical selection: the per-cluster argmax is an aggregate, never a window") {
    val df = TextMedia.defs("c20_canonical_docs").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // keep-longest must ride max(struct(n_chars, -doc_id)) — a
    // map-side-combinable aggregate. A Window here means a full
    // per-cluster sort, which a million-member cluster turns into the
    // query's bottleneck at 100x.
    assert(!plan.contains("Window"),
      s"per-cluster argmax compiled to a window sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    graft.queries.QueryDef.drainCleanups()
  }

  test("d24 source caps: over-cap set broadcasts; no corpus-side sort-merge join") {
    val df = Documents.defs("d24_source_caps").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the source list is domain-sized: the corpus joins it as a
    // broadcast — an SMJ here shuffles the full corpus twice (once for
    // the join, once for the rank window) instead of once
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"over-cap source set entered a shuffle join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    graft.queries.QueryDef.drainCleanups()
  }

  test("d25 drift: every branch reads the cached lang aggregate — no direct corpus leaf") {
    val df = Documents.defs("d25_composition_drift").build(spark, dir)
    // four consumers (shares, totals, and the summary's re-aggregation)
    // must all read the persisted lang-sized frame: every LEAF of the
    // optimized plan is the InMemoryRelation — a LogicalRelation leaf
    // here means some branch re-scans the corpus (once per branch at
    // 100x). The one real file scan lives inside the cached relation's
    // build plan, executed exactly once. (String-counting "FileScan"
    // is a trap: each InMemoryTableScan PRINTS its cached build plan.)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty)
    val offenders = leaves.filterNot(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation])
    assert(offenders.isEmpty,
      s"branches bypassed the cached aggregate: ${offenders.map(_.nodeName)}")
    // and it still runs
    assert(df.count() >= 2)
    graft.queries.QueryDef.drainCleanups()
  }

  test("e18 MMR: probes broadcast; greedy fold adds no exchange after the top-M") {
    val df = Similarity.defs("e18_mmr_rerank").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the probe side must broadcast (e01's contract)...
    assert(plan.contains("BroadcastExchange"), plan)
    // ...and the per-query greedy chain is projection-only: the plan's
    // shuffles are the top-M window, the candidate-array groupBy, and
    // the output sort — nothing per-step. One exchange per step (8
    // extra) would put 8 barriers into a per-row fold.
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 3,
      s"greedy fold introduced per-step exchanges ($exchanges):\n$plan")
  }

  test("q41 payload extraction: the events scan reads ONLY (event_type, props)") {
    val df = Relational.defs("q41_props_json").build(spark, dir)
    // the point of the declared-schema parse: ts and the other fixed
    // columns never leave disk — on a log table the payload+type pair
    // is a fraction of the row
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.requiredSchema.fieldNames.toSet
    }
    assert(scans === Seq(Set("event_type", "props")), scans.toString)
  }

  test("q42 retention: no self-join; only the output sort is global") {
    val df = Relational.defs("q42_retention_cohorts").build(spark, dir)
    val plan = df.queryExecution.sparkPlan
    // cohort week comes from a window MIN over the user partition, not
    // a per-user aggregate joined back — the corpus never joins itself
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(joins.isEmpty, s"retention grew a join:\n$plan")
    // the window's sort is partition-LOCAL (key ordering only); the
    // single global sort is the final ORDER BY on the tiny matrix
    val globalSorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s }
    assert(globalSorts.size === 1, s"extra global sorts:\n$plan")
    // and the scan is pruned to (ts, user_id)
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.requiredSchema.fieldNames.toSet }
    assert(scans === Seq(Set("ts", "user_id")), scans.toString)
  }

  test("c23 snapshot diff: the full-outer join never carries document text") {
    val df = Documents.defs("c23_snapshot_diff").build(spark, dir)
    val plan = df.queryExecution.sparkPlan
    val smjs = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge full-outer diff:\n$plan")
    // md5 + length are projected BEFORE the exchange: both join inputs
    // are (key, 32-hex hash, counter, flag) — a text attribute here
    // means the corpus bodies ride the shuffle
    smjs.foreach { j =>
      j.children.foreach { side =>
        val names = side.output.map(_.name)
        assert(!names.exists(_.startsWith("text")),
          s"join side carries text: $names")
      }
    }
  }

  // ExactQuantiles persists its histogram (the four downstream
  // branches would otherwise re-run the corpus-scale upstream — the
  // measured q45 plan ran the fact join 4× unpersisted), so the source
  // scans live under InMemoryRelation's build plan: descend into it
  private def scansThroughCaches(
      p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        // cachedPlan is AQE-wrapped, and AdaptiveSparkPlanExec hides
        // its input from collect — descend explicitly
        scansThroughCaches(m.relation.cachedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.inputPlan
          case other => other
        })
    }.flatten

  test("q43 quantiles: no single-partition window touches the gaps; scan pruned") {
    val df = Relational.defs("q43_time_to_convert").build(spark, dir)
    val plan = df.queryExecution.sparkPlan
    // the ExactQuantiles contract: ranks come from the value histogram
    // + sharded prefix sums — the only empty-partition window reads the
    // shard-count frame (shard, sn), never gap rows
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    wins.filterNot(_.partitionSpec.nonEmpty).foreach { w =>
      val names = w.child.output.map(_.name).toSet
      assert(names.subsetOf(Set("shard", "sn")),
        s"single-partition window over a non-count frame: $names")
    }
    // and the events scan reads only what the gap needs
    val scans = scansThroughCaches(plan)
      .map(_.requiredSchema.fieldNames.toSet)
    assert(scans.nonEmpty &&
      scans.forall(_ === Set("ts", "user_id", "event_type")),
      scans.toString)
    graft.queries.QueryDef.drainCleanups()
  }

  test("c24 layout audit: ONE corpus scan, z computed in the scan's project") {
    val df = Documents.defs("c24_zorder_layout").build(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"expected one documents scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"), plan)
  }

  test("q44 stickiness: the activity table never joins itself; no windows at all") {
    val df = Relational.defs("q44_stickiness").build(spark, dir)
    val plan = df.queryExecution.sparkPlan
    // both counts are DISTINCT aggregates over the exploded activity —
    // the naive per-week self-join (activity ⋈ activity on a week
    // range) or a RANGE window would put the corpus on both sides
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    // exactly the final |weeks|-sized wau ⋈ m4au join survives
    assert(joins.size === 1, s"expected one weeks-sized join:\n$plan")
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.isEmpty, s"stickiness grew a window:\n$plan")
  }

  test("q45 latency quantiles: one fact join, windows only over the shard-count frame") {
    val df = Relational.defs("q45_ship_latency").build(spark, dir)
    val plan = df.queryExecution.sparkPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    wins.filterNot(_.partitionSpec.nonEmpty).foreach { w =>
      val names = w.child.output.map(_.name).toSet
      assert(names.subsetOf(Set("shard", "sn")),
        s"single-partition window over a non-count frame: $names")
    }
    // scans pruned to the join key + date on each side
    val scans = scansThroughCaches(plan)
      .map(_.requiredSchema.fieldNames.toSet)
    assert(scans.toSet === Set(Set("l_orderkey", "l_shipdate"),
      Set("o_orderkey", "o_orderdate")), scans.toString)
    graft.queries.QueryDef.drainCleanups()
  }

  test("d27 growth curves: corpus-wide windows are sharded; the only single-partition window reads the count frame") {
    val df = Documents.defs("d27_vocab_growth").build(spark, dir)
    val plan = df.queryExecution.sparkPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    // the gram-bearing prefix sums must be partitioned (by shard);
    // an empty partition spec is legal ONLY over the ≤256-row
    // per-shard count frame (shard, sn) — anywhere else it means the
    // whole corpus funnels through one task
    wins.filterNot(_.partitionSpec.nonEmpty).foreach { w =>
      val names = w.child.output.map(_.name).toSet
      assert(names.subsetOf(Set("shard", "sn")),
        s"single-partition window over a non-count frame: $names")
    }
    assert(wins.exists(_.partitionSpec.nonEmpty),
      "expected sharded prefix-sum windows")
    graft.queries.QueryDef.drainCleanups()
  }
}
