package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage over the driver testdata (TPC-H-ish).
  *
  * The reference (harbourbridge) has no relational query surface of its own
  * — SURVEY.md §2.7 records joins/aggs/windows/setops as absent-and-
  * inherited-from-Catalyst. These queries are that inheritance made
  * concrete: each one exercises a Catalyst-native operator family the
  * engine exposes (hash/broadcast join, partial+final hash agg, window,
  * sort/limit/top-k, semi/anti join, set ops, rollup, distinct).
  *
  * Output discipline (hash-match safety, round-2): every output column is
  * BIGINT or STRING. Money/quantity aggregates are computed exactly —
  * per-row cast to a fixed-scale DECIMAL, decimal SUM — and emitted as
  * BIGINT minor units (×10^scale). Timestamps are emitted as epoch
  * microseconds. The same conversions appear verbatim in the DuckDB
  * oracle so both engines produce bit-identical integers.
  *
  * Scale notes (100 TB design): every query is a straight
  * scan→(broadcast|shuffle)→agg pipeline with no driver-side loops. Only
  * genuinely bounded dimensions (region: 5 rows, nation: 25 rows — fixed,
  * SF-independent) carry explicit broadcast hints; fact-proportional
  * tables (customer, orders, supplier, part all grow with SF) use plain
  * joins and let AQE choose broadcast when the runtime build side is
  * actually small. A hard-coded broadcast on a growing table is correct
  * at sf0.01 and an executor OOM at 100×.
  */
object Relational {
  import QueryDef.table

  /** Per-row exact decimal view of a double column (matches DuckDB's
    * CAST(x AS DECIMAL(18,s)) bit-for-bit). */
  private def dec(c: Column, s: Int): Column = c.cast(s"decimal(18,$s)")

  /** Exact decimal SUM emitted as BIGINT minor units (×10^s). */
  private def sumMinor(c: Column, s: Int): Column =
    (sum(dec(c, s)).cast(s"decimal(38,$s)") * lit(math.pow(10, s).toLong))
      .cast("bigint")

  val defs: Map[String, QueryDef] = Map(
    // ---------------------------------------------------------------- q01
    // TPC-H Q1: full-scan partial+final hash aggregation; map-side combine
    // means shuffle volume = |groups| × partitions, independent of SF.
    "q01_pricing_summary" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sumMinor(col("l_quantity"), 2).as("sum_qty"),
            sumMinor(col("l_extendedprice"), 2).as("sum_base_price"),
            sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
              .as("sum_disc_price"),
            sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6)
              .as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      headline = true),

    // ---------------------------------------------------------------- q03
    // TPC-H Q3: top-k over a 3-way join. Only the BUILDING-filtered
    // customer slice is broadcast (selective filter on a dimension);
    // lineitem⋈orders shuffles on orderkey — at 100 TB orders is
    // fact-proportional and must never be a broadcast build side.
    "q03_shipping_priority" -> QueryDef(
      build = (spark, dir) => {
        val cust = table(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val ord = table(spark, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-06-30").cast("timestamp"))
        val li = table(spark, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp"))
        li.join(ord.join(broadcast(cust),
            ord("o_custkey") === cust("c_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
          .select(col("l_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      oracle = Some("""
        SELECT l_orderkey,
               epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
               o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10"""),
      headline = true),

    // ---------------------------------------------------------------- q05
    // 5-way join through the star schema. region (5 rows) and nation
    // (25 rows) are the only SF-independent dims — they broadcast.
    // lineitem⋈orders⋈customer⋈supplier shuffle on their keys; AQE
    // promotes any side to broadcast at runtime if it measures small.
    "q05_revenue_by_nation" -> QueryDef(
      build = (spark, dir) => {
        val region = table(spark, dir, "region")
        val nation = table(spark, dir, "nation")
        val cust = table(spark, dir, "customer")
        val ord = table(spark, dir, "orders")
        val li = table(spark, dir, "lineitem")
        val supp = table(spark, dir, "supplier")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      oracle = Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue
        FROM lineitem, orders, customer, supplier, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name"""),
      headline = true),

    // ---------------------------------------------------------------- q06
    // TPC-H Q6: the pushdown showcase — all three predicates reach the
    // parquet scan (PushedFilters), projection prunes to 4 columns.
    "q06_forecast_revenue" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
        li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 10)
          .agg(sumMinor(col("l_extendedprice") * col("l_discount"), 6)
            .as("revenue"))
      },
      oracle = Some("""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 10"""),
      headline = true),

    // ---------------------------------------------------------------- q07
    // Window functions: one shuffle on the partition key, then sort within
    // partitions — no driver involvement; (o_orderdate, o_orderkey) is a
    // total order per customer so the running sum is deterministic.
    "q07_window_running" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ord = table(spark, dir, "orders")
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        ord.select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(w).cast("bigint").as("rn"),
            (sum(dec(col("o_totalprice"), 2))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("decimal(38,2)") * lit(100L)).cast("bigint")
              .as("running_total"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w * 100 AS BIGINT) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, rn"""),
      headline = true),

    // ---------------------------------------------------------------- q08
    // Top-k: local top-k per partition then merge at the driver via
    // TakeOrderedAndProject — no global sort at scale. customer grows
    // with SF → no broadcast hint; AQE decides at runtime.
    "q08_top_customers" -> QueryDef(
      build = (spark, dir) => {
        val cust = table(spark, dir, "customer")
        val ord = table(spark, dir, "orders")
        ord.join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(sumMinor(col("o_totalprice"), 2).as("total_spend"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("total_spend").desc, col("c_custkey"))
          .limit(20)
      },
      oracle = Some("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_spend,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spend DESC, c_custkey
        LIMIT 20""")),

    // ---------------------------------------------------------------- q09
    // Left-semi + left-anti joins (EXISTS / NOT EXISTS).
    "q09_semi_anti" -> QueryDef(
      build = (spark, dir) => {
        val cust = table(spark, dir, "customer")
        val ord = table(spark, dir, "orders")
        val withO = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("with_orders"))
        val withoutO = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("without_orders"))
        withO.crossJoin(withoutO)
      },
      oracle = Some("""
        SELECT (SELECT COUNT(*) FROM customer WHERE EXISTS
                 (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
               (SELECT COUNT(*) FROM customer WHERE NOT EXISTS
                 (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders""")),

    // ---------------------------------------------------------------- q10
    // Set operations: INTERSECT / EXCEPT / UNION (distinct), tagged and
    // stacked so one query covers all three.
    "q10_setops" -> QueryDef(
      build = (spark, dir) => {
        val cn = table(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sn = table(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        val i = cn.intersect(sn).select(lit("intersect").as("op"), col("nationkey"))
        val e = cn.except(sn).select(lit("except").as("op"), col("nationkey"))
        val u = cn.union(sn).distinct().select(lit("union").as("op"), col("nationkey"))
        i.unionAll(e).unionAll(u).orderBy(col("op"), col("nationkey"))
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT 'intersect' AS op, nationkey FROM
            (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
          UNION ALL
          SELECT 'except' AS op, nationkey FROM
            (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
          UNION ALL
          SELECT 'union' AS op, nationkey FROM
            (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
        ) ORDER BY op, nationkey""")),

    // ---------------------------------------------------------------- q11
    // ROLLUP grouping sets; NULL grouping cells coalesced to '(all)' so
    // null-ordering differences between engines can't bite.
    "q11_rollup" -> QueryDef(
      build = (spark, dir) => {
        val ord = table(spark, dir, "orders")
        ord.rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sumMinor(col("o_totalprice"), 2).as("total"))
          .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("n"), col("total"))
          .orderBy("status", "priority")
      },
      oracle = Some("""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---------------------------------------------------------------- q12
    // Exact distinct aggregation (expand + two-phase agg under the hood).
    "q12_distinct_counts" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
        li.agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
      },
      oracle = Some("""
        SELECT COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(*) AS n_rows
        FROM lineitem""")),

    // ---------------------------------------------------------------- q13
    // Tumbling-window aggregation over the events stream table (batch
    // form; the streaming form with watermarks lives in graft.streaming).
    // events.ts is ns in parquet → µs on both sides; hour emitted as
    // epoch micros so the output is pure BIGINT.
    "q13_events_hourly" -> QueryDef(
      build = (spark, dir) => {
        val ev = QueryDef.events(spark, dir)
        ev.groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sumMinor(col("value"), 6).as("total_value"))
          .orderBy("hour_us", "event_type")
      },
      oracle = Some("""
        SELECT epoch_us(CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS hour_us, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2"""),
      headline = true),

    // ---------------------------------------------------------------- q14
    // Sessionization: gap > 30 min starts a new session. Pure-integer µs
    // arithmetic so both engines agree bit-for-bit.
    "q14_sessionize" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = QueryDef.events(spark, dir)
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        ev.select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"),
            lag(unix_micros(col("ts")), 1).over(w).as("prev_us"))
          .select(col("user_id"), col("event_id"),
            when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L).as("is_new_session"))
          .groupBy("user_id")
          .agg(sum(col("is_new_session")).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH marked AS (
          SELECT user_id,
                 CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new_session
          FROM (
            SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events))
        SELECT user_id, CAST(SUM(is_new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM marked GROUP BY user_id ORDER BY user_id""")),

    // ---------------------------------------------------------------- q15
    // Fact ⋈ dim grouped revenue by part brand. part grows with SF →
    // no explicit broadcast; AQE promotes it when actually small.
    "q15_brand_revenue" -> QueryDef(
      build = (spark, dir) => {
        val part = table(spark, dir, "part")
        val li = table(spark, dir, "lineitem")
        li.join(part, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
              .as("revenue"))
          .orderBy("p_brand")
      },
      oracle = Some("""
        SELECT p_brand, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // ---------------------------------------------------------------- q16
    // Date-part extraction + grouped agg.
    "q16_orders_by_year" -> QueryDef(
      build = (spark, dir) => {
        val ord = table(spark, dir, "orders")
        ord.groupBy(year(col("o_orderdate")).cast("bigint").as("yr"))
          .agg(count(lit(1)).as("n_orders"),
            sumMinor(col("o_totalprice"), 2).as("total"))
          .orderBy("yr")
      },
      oracle = Some("""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
        FROM orders
        GROUP BY 1
        ORDER BY 1""")),

    // ---------------------------------------------------------------- q17
    // As-of join (brief §2.7's named missing operator): each click joins
    // to the latest prior view by the same user. Composed from existing
    // ops — a single running last_value(ignore nulls) window over the
    // event stream — so it's ONE shuffle on user_id, no join at all
    // (the classic union+window as-of formulation; a sort-merge
    // inequality join would shuffle twice and skew on hot users).
    "q17_asof_join" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = QueryDef.events(spark, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("event_type"))
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("last_view_us",
            last(when(col("event_type") === "view", col("us")), ignoreNulls = true).over(w))
          .withColumn("last_view_id",
            last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("last_view_id").as("view_id"),
            (col("us") - col("last_view_us")).as("gap_us"))
          .orderBy("click_id")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
          FROM events),
        m AS (
          SELECT event_id, event_type, us,
            last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS last_view_us,
            last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS last_view_id
          FROM ev)
        SELECT event_id AS click_id, last_view_id AS view_id, us - last_view_us AS gap_us
        FROM m WHERE event_type = 'click' ORDER BY click_id""")),

    // ---------------------------------------------------------------- q18
    // Range join (±5 min), bucketed: each error event pairs with click
    // events of the same user within the band. The scale path explodes
    // the smaller side into its 3 adjacent time buckets and equi-joins
    // on (user, bucket) — shuffle volume is O(rows), never the O(n·m)
    // a naive inequality join risks; the oracle IS the naive range join,
    // proving the bucketed plan computes the identical relation.
    "q18_range_join" -> QueryDef(
      build = (spark, dir) => {
        val band = 300L * 1000000L // ±5 min in µs
        val ev = QueryDef.events(spark, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("event_type"))
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"), col("us").as("eus"))
          .withColumn("bucket", explode(expr(
            s"array(eus div $band - 1, eus div $band, eus div $band + 1)")))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("event_id").as("click_id"),
            col("us").as("cus"))
          .withColumn("cbucket", expr(s"cus div $band"))
        errs.join(clicks,
            col("user_id") === col("cu") && col("bucket") === col("cbucket") &&
              abs(col("cus") - col("eus")) <= band)
          // no distinct needed: each (error, click) pair matches in exactly
          // one exploded bucket — the click's single bucket value — so the
          // equi-join cannot duplicate a pair; a distinct here would be a
          // whole extra shuffle of the result
          .select(col("err_id"), col("click_id"), (col("cus") - col("eus")).as("delta_us"))
          .orderBy("err_id", "click_id")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
          FROM events)
        SELECT e.event_id AS err_id, c.event_id AS click_id,
               c.us - e.us AS delta_us
        FROM ev e JOIN ev c
          ON e.user_id = c.user_id
         AND e.event_type = 'error' AND c.event_type = 'click'
         AND abs(c.us - e.us) <= 300 * 1000000
        ORDER BY err_id, click_id""")),

    // ---------------------------------------------------------------- q19
    // Count-Min sketch build (4 rows × 64 buckets over user activity):
    // the distributed-sketch pattern — one groupBy with map-side combine
    // builds the whole table; md5-derived bucket hashing makes the
    // counters bit-identical across engines (no approximate divergence).
    // ONE scan of events: explode(sequence(0,3)) emits all four sketch
    // rows per event in a single pass (the earlier 4-way unionAll read
    // the table four times — 4× the scan I/O for the same result).
    "q19_cms_sketch" -> QueryDef(
      build = (spark, dir) => {
        QueryDef.events(spark, dir).select(col("user_id"))
          .select(explode(expr("sequence(0L, 3L)")).as("row"), col("user_id"))
          .select(col("row"),
            expr("cast(conv(substring(md5(concat(cast(row as string), ':', cast(user_id as string))), 1, 8), 16, 10) as bigint) % 64")
              .as("bucket"))
          .groupBy("row", "bucket")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("row", "bucket")
      },
      oracle = Some("""
        WITH h AS (
          SELECT j AS row,
                 CAST('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS bucket
          FROM events, (SELECT unnest([0,1,2,3]) AS j))
        SELECT row, bucket, COUNT(*) AS cnt
        FROM h GROUP BY row, bucket ORDER BY row, bucket""")),

    // ---------------------------------------------------------------- q20
    // CUBE over (returnflag, linestatus): all four grouping combinations
    // in one pass (completes the rollup/cube/grouping-sets surface; q11
    // covers ROLLUP). NULL group keys are coalesced to a sentinel so the
    // subtotal rows hash identically across engines.
    "q20_cube" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sumMinor(col("l_quantity"), 2).as("sum_qty"))
          .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
            coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
            col("n"), col("sum_qty"))
          .orderBy("rf", "ls")
      },
      oracle = Some("""
        SELECT COALESCE(l_returnflag, '(all)') AS rf,
               COALESCE(l_linestatus, '(all)') AS ls,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // ---------------------------------------------------------------- q21
    // Ordered conversion funnel signup → view → click → purchase: a user
    // reaches stage k when their FIRST stage-k event lands strictly
    // after their first stage-(k-1) event. One scan → per-(user, type)
    // min-timestamp aggregate (map-side combined) → per-user stage
    // predicate → 4-row histogram; no self-joins, no window over the
    // raw stream, so the whole thing is two tiny shuffles regardless of
    // event volume. Stages emit as 's1_signup'… strings so the rows
    // sort deterministically in both engines.
    "q21_funnel" -> QueryDef(
      build = (spark, dir) => {
        val ev = QueryDef.events(spark, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val firsts = ev.groupBy("user_id")
          .agg(
            min(when(col("event_type") === "signup", col("us"))).as("t1"),
            min(when(col("event_type") === "view", col("us"))).as("t2"),
            min(when(col("event_type") === "click", col("us"))).as("t3"),
            min(when(col("event_type") === "purchase", col("us"))).as("t4"))
        val stages = firsts.select(
          when(col("t1").isNotNull, 1L).otherwise(0L).as("r1"),
          when(col("t1").isNotNull && col("t2") > col("t1"), 1L)
            .otherwise(0L).as("r2"),
          when(col("t1").isNotNull && col("t2") > col("t1") &&
               col("t3") > col("t2"), 1L).otherwise(0L).as("r3"),
          when(col("t1").isNotNull && col("t2") > col("t1") &&
               col("t3") > col("t2") && col("t4") > col("t3"), 1L)
            .otherwise(0L).as("r4"))
        stages.agg(sum("r1").as("s1"), sum("r2").as("s2"),
            sum("r3").as("s3"), sum("r4").as("s4"))
          .select(explode(expr(
            """array(named_struct('stage', 's1_signup',   'n_users', s1),
                     named_struct('stage', 's2_view',     'n_users', s2),
                     named_struct('stage', 's3_click',    'n_users', s3),
                     named_struct('stage', 's4_purchase', 'n_users', s4))"""))
            .as("x"))
          .select(col("x.stage").as("stage"), col("x.n_users").as("n_users"))
          .orderBy("stage")
      },
      oracle = Some("""
        WITH firsts AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup'   THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t1,
                 MIN(CASE WHEN event_type = 'view'     THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t2,
                 MIN(CASE WHEN event_type = 'click'    THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t3,
                 MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t4
          FROM events GROUP BY user_id),
        stages AS (
          SELECT CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS r1,
                 CASE WHEN t1 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END AS r2,
                 CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 THEN 1 ELSE 0 END AS r3,
                 CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 AND t4 > t3 THEN 1 ELSE 0 END AS r4
          FROM firsts),
        tot AS (
          SELECT CAST(SUM(r1) AS BIGINT) AS s1, CAST(SUM(r2) AS BIGINT) AS s2,
                 CAST(SUM(r3) AS BIGINT) AS s3, CAST(SUM(r4) AS BIGINT) AS s4
          FROM stages)
        SELECT 's1_signup' AS stage, s1 AS n_users FROM tot
        UNION ALL SELECT 's2_view', s2 FROM tot
        UNION ALL SELECT 's3_click', s3 FROM tot
        UNION ALL SELECT 's4_purchase', s4 FROM tot
        ORDER BY stage""")),

    // ---------------------------------------------------------------- q22
    // TPC-H Q22 shape: dormant prospects — customers whose balance
    // beats the positive-balance average but who placed no order since
    // 2000-01-01, grouped by nation (every synthetic customer has SOME
    // order, so the classic never-ordered form is vacuous here; the
    // date-bounded anti join keeps the shape and yields real rows —
    // 55 across 23 nations at sf0.01).
    // The threshold comparison is EXACT on both engines: instead of
    // comparing against an average (Spark decimal avg vs DuckDB double
    // avg can disagree by 1 ulp at the boundary), multiply through by
    // the count — c_minor · n > total — all BIGINT arithmetic. Plan:
    // the 1-row (total, n) aggregate broadcast-joins under every
    // customer (q09's scalar-subquery shape), the no-orders test is a
    // LEFT ANTI join on the orders key, and the nation rollup is one
    // partial-agg shuffle. At 100×, orders-side anti join shuffles by
    // custkey and AQE broadcasts the filtered prospect side.
    "q22_prospects" -> QueryDef(
      build = (spark, dir) => {
        val cust = table(spark, dir, "customer")
        val ord = table(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        val thr = cust.filter(col("c_acctbal") > 0)
          .agg(sumMinor(col("c_acctbal"), 2).as("tot"), count(lit(1)).as("n"))
        val rich = cust
          .withColumn("c_minor",
            (dec(col("c_acctbal"), 2) * lit(100)).cast("bigint"))
          .crossJoin(broadcast(thr)) // 1-row scalar aggregate
          .filter(col("c_minor") * col("n") > col("tot"))
        rich.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_cust"), sum(col("c_minor")).as("total_bal"))
          .orderBy("c_nationkey")
      },
      oracle = Some("""
        WITH t AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS tot,
                 COUNT(*) AS n
          FROM customer WHERE c_acctbal > 0),
        rich AS (
          SELECT c_custkey, c_nationkey,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS c_minor
          FROM customer, t
          WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * t.n > t.tot),
        p AS (
          SELECT * FROM rich r
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
        SELECT c_nationkey, COUNT(*) AS n_cust, CAST(SUM(c_minor) AS BIGINT) AS total_bal
        FROM p GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ---------------------------------------------------------------- q23
    // TPC-H Q2 shape: the cheapest supplier per small part (lineitem
    // stands in for partsupp: a supplier's cost for a part = its summed
    // extended price, exact minor units). Spark side is the SCALABLE
    // argmin — row_number over (cost, suppkey) per part, which the
    // optimizer executes as partial WindowGroupLimit before the
    // shuffle, so 100× more (part, supplier) rows shuffle only their
    // per-part top-1 survivors; the small filtered part set broadcasts
    // under lineitem BEFORE aggregation (no wasted agg over excluded
    // parts). The oracle derives the same relation from first
    // principles — MIN(cost) then MIN(suppkey) among cost-ties — with
    // no window, so the plan and the definition stay independent.
    "q23_min_cost_supplier" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = table(spark, dir, "lineitem")
        val parts = table(spark, dir, "part")
          .filter(col("p_size") <= 5).select("p_partkey")
        val sup = table(spark, dir, "supplier").select("s_suppkey", "s_name")
        val cost = li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(sumMinor(col("l_extendedprice"), 2).as("cost"))
        val w = Window.partitionBy("l_partkey")
          .orderBy(col("cost"), col("l_suppkey"))
        cost.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey").as("p_partkey"),
            col("s_suppkey"), col("s_name"), col("cost").as("best_cost"))
          .orderBy("p_partkey")
      },
      oracle = Some("""
        WITH ps AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cost
          FROM lineitem JOIN part ON l_partkey = p_partkey AND p_size <= 5
          GROUP BY 1, 2),
        best AS (SELECT pk, MIN(cost) AS mc FROM ps GROUP BY pk),
        tie AS (
          SELECT ps.pk, ps.cost, MIN(ps.sk) AS msk
          FROM ps JOIN best ON ps.pk = best.pk AND ps.cost = best.mc
          GROUP BY ps.pk, ps.cost)
        SELECT t.pk AS p_partkey, t.msk AS s_suppkey, s.s_name, t.cost AS best_cost
        FROM tie t JOIN supplier s ON s.s_suppkey = t.msk
        ORDER BY p_partkey""")),

    // ---------------------------------------------------------------- q24
    // Trailing 7-day revenue window — the RANGE-frame windowing shape
    // (q07 covers ROWS/running): daily order revenue plus the sum and
    // day-count of the trailing week BY VALUE (range on epoch-µs, not
    // row position — gap days shrink the window, which a ROWS frame
    // gets wrong). Integer-exact: the window emits (sum, n) rather
    // than an average, so no engine-specific division/rounding crosses
    // the oracle boundary. One aggregation shuffle + one value-range
    // window over ~date-count rows — scale-free after the daily
    // rollup.
    "q24_trailing_week" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ord = table(spark, dir, "orders")
        val daily = ord.groupBy(col("o_orderdate"))
          .agg(sumMinor(col("o_totalprice"), 2).as("rev"))
          .select(unix_micros(col("o_orderdate").cast("timestamp")).as("day_us"), col("rev"))
        val w = Window.orderBy(col("day_us"))
          .rangeBetween(-6L * 86400L * 1000000L, 0L)
        daily
          .withColumn("rev_7d", sum(col("rev")).over(w))
          .withColumn("n_days_7d", count(lit(1)).over(w))
          .orderBy("day_us")
      },
      oracle = Some("""
        WITH daily AS (
          SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS day_us,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev
          FROM orders GROUP BY 1)
        SELECT day_us, rev,
               CAST(SUM(rev) OVER w AS BIGINT) AS rev_7d,
               COUNT(*) OVER w AS n_days_7d
        FROM daily
        WINDOW w AS (ORDER BY day_us
                     RANGE BETWEEN 518400000000 PRECEDING AND CURRENT ROW)
        ORDER BY day_us""")),

    // ---------------------------------------------------------------- q25
    // Market share (TPC-H Q8 shape): per order year, the revenue share
    // of suppliers from one nation (nationkey 7) — conditional
    // aggregation over the lineitem ⋈ orders ⋈ supplier join. Share is
    // emitted as (numerator, denominator, permille): all integers, the
    // division is a single integer DIV on both engines. Plan: supplier
    // (small dim) broadcasts; lineitem ⋈ orders shuffles once on the
    // order key; the year rollup is map-side combined — the only
    // corpus-scale shuffle is the fact-fact equi-join, as it should
    // be.
    "q25_market_share" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
        val ord = table(spark, dir, "orders")
          .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("yr"))
        val sup = table(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .withColumn("rev_minor",
            (dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
              .cast("decimal(38,6)") * lit(1000000L)).cast("bigint"))
          .groupBy("yr")
          .agg(sum(when(col("s_nationkey") === 7, col("rev_minor"))
              .otherwise(0L)).as("nation_rev"),
            sum(col("rev_minor")).as("total_rev"))
          .withColumn("share_permille",
            expr("nation_rev * 1000 div total_rev"))
          .orderBy("yr")
      },
      oracle = Some("""
        WITH j AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
                 s_nationkey,
                 CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS rev_minor
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey)
        SELECT yr,
               CAST(SUM(CASE WHEN s_nationkey = 7 THEN rev_minor ELSE 0 END) AS BIGINT) AS nation_rev,
               CAST(SUM(rev_minor) AS BIGINT) AS total_rev,
               CAST(SUM(CASE WHEN s_nationkey = 7 THEN rev_minor ELSE 0 END) * 1000
                    // SUM(rev_minor) AS BIGINT) AS share_permille
        FROM j GROUP BY yr ORDER BY yr""")),

    // ---------------------------------------------------------------- q26
    // Order-priority checking — TPC-H Q4's EXISTS shape (the one join
    // form the surface lacked): orders with at least one LATE line
    // (shipped > 60 days after the order date), counted per priority.
    // The EXISTS compiles to a LEFT SEMI join, the shape that matters
    // at 100 TB because the probe side short-circuits on first match
    // and emits each order at most once — an inner join + distinct
    // would materialize every (order, late-line) pair first. The
    // predicate mixes the equi key with a cross-side range condition,
    // which Spark keeps as the semi-join's extra condition (no
    // pair blow-up, no dedup operator).
    "q26_priority_check" -> QueryDef(
      build = (spark, dir) => {
        val ord = table(spark, dir, "orders")
        val li = table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        ord.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""))
,

    // ---------------------------------------------------------------- q27
    // Large-volume orders (TPC-H Q18 shape): customers whose orders
    // exceed a total-quantity threshold — the classic IN-over-a-grouped-
    // HAVING subquery. Spark shape: the qualifying set is computed ONCE
    // by a map-side-combined groupBy over lineitem's (orderkey, qty)
    // columns only, then joined INNER against orders — semantically the
    // semi-join (groupBy output is unique per orderkey) while carrying
    // total_qty into the output, pruning orders before the customer
    // join. The big fact table is touched once, and the wide rows that
    // survive are the few qualifying orders. Threshold 250 (25000 minor
    // units) is calibrated non-vacuous on the testdata generator
    // (sf-invariant shape). total_qty follows the repo's exact
    // minor-units convention (q28 below is the model): quantities have
    // ≤2 decimals, so Σqty×100 is an exact BIGINT on both engines —
    // no raw DECIMAL crosses the oracle-compare boundary.
    //
    // 100 TB: lineitem groupBy shuffles (orderkey, partial-sum) pairs
    // with map-side combine; the semi-join and the customer join move
    // qualifying orders only; customer joins via its key. No step
    // carries more than one fact-table-keyed shuffle.
    "q27_big_orders" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val big = li.groupBy("l_orderkey")
          .agg(sumMinor(col("l_quantity"), 2).as("total_qty_minor"))
          .filter(col("total_qty_minor") > 25000L)
        val ord = table(spark, dir, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
        table(spark, dir, "customer")
          .join(ord, col("c_custkey") === col("o_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty_minor"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      oracle = Some("""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               t.total_qty_minor
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS total_qty_minor
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) > 25000
        ) t ON o_orderkey = t.l_orderkey
        ORDER BY o_totalprice DESC, o_orderkey"""))
,

    // ---------------------------------------------------------------- q28
    // Returned-item reporting (TPC-H Q10 shape): top-20 customers by
    // revenue lost to returns in one quarter. Exercises the
    // filter-early join order: lineitem is cut by the returnflag
    // predicate AT THE SCAN (PushedFilters), orders by the date range,
    // and only the surviving quarter of returns shuffles into the
    // customer join; nation (25 rows, SF-independent) broadcasts.
    // Revenue in exact minor units, acctbal likewise; top-k through
    // the rank window so ties are deterministic.
    "q28_returned_items" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
        val ord = table(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        val cust = table(spark, dir, "customer")
        val nat = table(spark, dir, "nation")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"))
          .agg(sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
          .select(col("c_custkey"), col("c_name"),
            dec(col("c_acctbal"), 2).multiply(lit(100)).cast("bigint")
              .as("acctbal_minor"),
            col("n_name"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      oracle = Some("""
        SELECT c_custkey, c_name,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_minor,
               n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    // ---------------------------------------------------------------- q29
    // Late-shipment priority split (TPC-H Q12 shape adapted to this
    // schema — no l_shipmode/l_commitdate here, so "late" is shipped
    // ≥ 365 days after the order date). Exercises the
    // join-then-conditional-aggregation pattern: ONE pass over the
    // joined rows produces both priority counters via sum(CASE), never
    // two scans or a self-join; the date-gap predicate is a post-join
    // filter by necessity (it spans both tables), but each scan still
    // prunes to exactly the join keys + the two columns the predicate
    // and aggregation need.
    "q29_late_shipment_priority" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
        val ord = table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 365 DAYS"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate + INTERVAL 365 DAY
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---------------------------------------------------------------- q30
    // Supplier diversity per part family (TPC-H Q16 shape; lineitem
    // stands in for the absent partsupp as the part↔supplier bridge).
    // Exercises NOT IN as a LEFT ANTI join (the blacklist is a
    // subquery, not a literal list) composed with a distinct
    // aggregation. Anti-join build side is the 6-row blacklist —
    // broadcast by AQE; countDistinct shuffles (brand, bucket,
    // suppkey) triples once, then counts — never a row explosion.
    "q30_supplier_diversity" -> QueryDef(
      build = (spark, dir) => {
        val bridge = table(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"))
        val prt = table(spark, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").between(10, 40))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val blacklist = table(spark, dir, "supplier")
          .filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        bridge
          .join(blacklist, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(prt, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"),
            expr("CAST(p_size DIV 10 AS BIGINT)").as("size_bucket"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("size_bucket"))
      },
      oracle = Some("""
        SELECT p_brand, CAST(p_size // 10 AS BIGINT) AS size_bucket,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size BETWEEN 10 AND 40
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, size_bucket
        ORDER BY supplier_cnt DESC, p_brand, size_bucket""")),

    // ---------------------------------------------------------------- q31
    // Disjunctive-predicate revenue (TPC-H Q19 shape): three OR'd
    // conjunctions that each span BOTH tables. The optimizer shape
    // under test: Catalyst cannot push the disjunction itself to
    // either scan, but it derives the per-table IMPLIED filters —
    // p_brand IN (three brands) reaches the part scan and the
    // quantity envelope reaches lineitem (PushedFilters on both) —
    // so the join sees only candidate rows and the full predicate
    // re-applies post-join. One exact minor-unit revenue row out.
    "q31_disjunctive_revenue" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_discount"))
        val prt = table(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        li.join(prt, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 35)) ||
            (col("p_brand") === "Brand#4" && col("p_size").between(20, 50) &&
              col("l_quantity").between(25, 50)))
          .agg(sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
      },
      oracle = Some("""
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#4'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 50)""")),

    // ---------------------------------------------------------------- q32
    // Suppliers who kept finished orders waiting (TPC-H Q21 shape,
    // "late" as in q29): the SOLE late supplier in a multi-supplier
    // order. Exercises the semi + anti SELF-join chain — the classic
    // EXISTS / NOT EXISTS pair over the same fact table. Shape
    // discipline: the late set collapses to DISTINCT (order, supplier)
    // pairs FIRST (id-only, tiny), so the semi probe runs against
    // distinct order/supplier pairs and the anti side is the late set
    // itself — lineitem's wide rows never enter either join.
    "q32_waiting_supplier" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val ord = table(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 365 DAYS"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        val pairs = li.select(col("l_orderkey").as("ok2"),
          col("l_suppkey").as("sk2")).distinct()
        val sole = late
          .join(pairs, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
            "left_semi")
          .join(late.select(col("ok").as("ok3"), col("sk").as("sk3")),
            col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
        sole.join(table(spark, dir, "supplier"),
            col("sk") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      oracle = Some("""
        WITH late AS (
          SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
            AND l_shipdate >= o_orderdate + INTERVAL 365 DAY),
        sole AS (
          SELECT * FROM late l1
          WHERE EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk)
            AND NOT EXISTS (SELECT 1 FROM late l3
                            WHERE l3.ok = l1.ok AND l3.sk <> l1.sk))
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM sole JOIN supplier ON sk = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20""")),

    // ---------------------------------------------------------------- q33
    // Important-value concentration (TPC-H Q11 shape): parts whose
    // revenue exceeds 1.3x the per-part MEAN — an aggregate filtered
    // against a GLOBAL aggregate of the same relation. The optimizer
    // shape: the scalar subquery becomes a 1-row frame broadcast-
    // crossed under the grouped aggregate (q09/q22's pattern applied
    // to agg-vs-agg), so the fact table is scanned once for the
    // groups and once for the total — never once per group. The
    // threshold is mean-relative (rev·n·10 > 13·total, exact DECIMAL(38)
    // cross-multiplication — BIGINT would wrap at realistic SFs), so
    // the selected tail is SF-invariant
    // where a fixed fraction-of-total cutoff would silently empty at
    // 10x the part count.
    "q33_value_concentration" -> QueryDef(
      build = (spark, dir) => {
        val pv = table(spark, dir, "lineitem")
          .select(col("l_partkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
          .groupBy("l_partkey")
          .agg(sumMinor(col("r"), 6).as("rev"))
        // DECIMAL(38) cross-multiplication, not Long: rev·n·10 wraps a
        // BIGINT at realistic SFs (rev ~5e12 minor units x n ~2e5 parts
        // already passes 2^63) and non-ANSI Spark would wrap SILENTLY
        // while DuckDB's HUGEINT does not — the exact silent-divergence
        // class the minor-units convention exists to prevent. 38 digits
        // give headroom past any reachable corpus.
        val tot = pv.agg(sum(col("rev").cast("decimal(38,0)")).as("t"),
          count(lit(1)).as("n"))
        pv.crossJoin(broadcast(tot))
          .filter(col("rev").cast("decimal(38,0)") * col("n") * lit(10) >
            col("t") * lit(13))
          .select(col("l_partkey"), col("rev"))
          .orderBy(col("rev").desc, col("l_partkey"))
      },
      oracle = Some("""
        WITH pv AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS rev
          FROM lineitem GROUP BY l_partkey),
        tot AS (SELECT SUM(CAST(rev AS HUGEINT)) AS t, COUNT(*) AS n FROM pv)
        SELECT l_partkey, rev
        FROM pv, tot
        WHERE CAST(rev AS HUGEINT) * n * 10 > 13 * t
        ORDER BY rev DESC, l_partkey""")),

    // ---------------------------------------------------------------- q34
    // Promotion revenue share (TPC-H Q14 shape): one scan, one
    // conditional aggregate — the promo numerator rides as a CASE
    // inside the same SUM pass, never a second scan or a self-join.
    // The share is emitted as an exact integer permille (BIGINT DIV on
    // minor units), not a float division — the q27/q33 decimal
    // discipline applied to a ratio.
    "q34_promo_revenue" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        val prt = table(spark, dir, "part")
          .select(col("p_partkey"), col("p_type"))
        li.join(prt, col("l_partkey") === col("p_partkey"))
          .agg(
            sumMinor(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount")))
              .otherwise(lit(0.0)), 6).as("promo_revenue"),
            sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
              .as("total_revenue"))
          .select(col("promo_revenue"), col("total_revenue"),
            // DECIMAL(38) cross-multiplication, q33's rule: revenue
            // minor units (x10^6) times 1000 leaves only ~50x Long
            // headroom at sf0.1 — at SF ~5 Spark (non-ANSI) would wrap
            // SILENTLY while DuckDB's overflow throws, the exact
            // silent-divergence class the minor-units discipline
            // exists to prevent
            expr("CAST(promo_revenue AS DECIMAL(38,0)) * 1000 DIV total_revenue")
              .as("promo_permille"))
      },
      oracle = Some("""
        WITH q AS (
          SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000 AS BIGINT) AS promo_revenue,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01')
        SELECT promo_revenue, total_revenue,
               CAST(CAST(promo_revenue AS HUGEINT) * 1000 // total_revenue AS BIGINT) AS promo_permille
        FROM q""")),

    // ---------------------------------------------------------------- q35
    // Top supplier (TPC-H Q15 shape): the classic revenue VIEW whose
    // max selects the winner — an aggregate equi-filtered against the
    // GLOBAL max of the same aggregate. Optimizer shape: the per-
    // supplier revenue frame is computed ONCE, its 1-row max broadcast-
    // crosses back under it (q33's agg-vs-global-agg pattern with
    // equality instead of a threshold), so the fact table scans twice
    // (groups + max-of-groups), never once per supplier. Equality on
    // exact BIGINT minor units — float revenue would make "the max"
    // engine-dependent; ties (all suppliers at the max) are returned,
    // Q15's documented semantics.
    "q35_top_supplier" -> QueryDef(
      build = (spark, dir) => {
        val rev = table(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("total_revenue"))
        val top = rev.agg(max(col("total_revenue")).as("mx"))
        rev.crossJoin(broadcast(top))
          .filter(col("total_revenue") === col("mx"))
          .join(table(spark, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey""")),

    // ---------------------------------------------------------------- q36
    // Small-quantity revenue (TPC-H Q17 shape): rows whose quantity is
    // below HALF the per-part average — the classic correlated scalar
    // subquery, DECORRELATED by hand into one per-part aggregate
    // joined back on the part key (what a good optimizer does to the
    // correlated form; writing it decorrelated pins the plan we want:
    // an equi-join against a grouped frame, never a per-row re-scan).
    // The avg comparison is exact integer cross-multiplication on
    // quantity minor units — qty < total/(2n) ⇔ 2·qty·n < total —
    // never a float division. Long suffices here (unlike q33's
    // rev·n·10): 2 · qty_minor(≤5000) · per-part row count stays 9+
    // orders under 2^63 even at 1000× the corpus.
    "q36_small_quantity_revenue" -> QueryDef(
      build = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val prt = table(spark, dir, "part")
          .filter(col("p_brand") === "Brand#13")
          .select(col("p_partkey"))
        // the correlation filter pushes INTO the aggregate side (what
        // textbook decorrelation actually does): stats aggregate only
        // the brand's parts — a per-part average is unchanged by
        // dropping other parts' groups, and the stats-side shuffle
        // carries 1/25th of the part domain instead of all of it
        val stats = li
          .join(prt, col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey").as("pk"))
          .agg(sumMinor(col("l_quantity"), 2).as("qty_total"),
            count(lit(1)).as("n"))
        li.join(prt, col("l_partkey") === col("p_partkey"))
          .join(stats, col("l_partkey") === col("pk"))
          .filter((dec(col("l_quantity"), 2) * lit(100)).cast("bigint")
            * col("n") * lit(2) < col("qty_total"))
          .agg(count(lit(1)).as("n_small"),
            sumMinor(col("l_extendedprice"), 6).as("small_revenue"))
      },
      oracle = Some("""
        WITH stats AS (
          SELECT l_partkey AS pk,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty_total,
                 COUNT(*) AS n
          FROM lineitem GROUP BY l_partkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS small_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN stats ON l_partkey = pk
        WHERE p_brand = 'Brand#13'
          AND CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) * n * 2 < qty_total""")),

    // ---------------------------------------------------------------- q37
    // Part-promotion suppliers (TPC-H Q20 shape): the nested IN chain —
    // suppliers IN (part-supplier pairs whose shipped volume clears a
    // floor, for parts IN (a name-prefix family)). Both membership
    // tests are LEFT SEMI joins over ID-ONLY frames (the inner one
    // feeds the grouped volume frame, the outer one probes supplier),
    // so no dedup-then-join explosion and supplier's wide rows move
    // only for the winners. The floor is RELATIVE — pair volume above
    // 3x the mean pair volume, exact integer cross-multiplication on
    // quantity minor units (q33's SF-invariance lesson: a fixed
    // absolute floor selects everything at one scale factor and
    // nothing at another; the mean-relative form keeps a hot tail at
    // every corpus size). The 1-row mean broadcasts under the pair
    // frame; HUGEINT-class care is unnecessary here only because
    // vol·n stays 9+ orders under 2^63 at any reachable SF — the
    // DECIMAL(38) escalation is q33's, documented there.
    "q37_promotable_suppliers" -> QueryDef(
      build = (spark, dir) => {
        val family = table(spark, dir, "part")
          .filter(col("p_name").startsWith("large"))
          .select(col("p_partkey"))
        val vol = table(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
          .join(family, col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sumMinor(col("l_quantity"), 2).as("v"))
        val m = vol.agg(sum(col("v").cast("decimal(38,0)")).as("t"),
          count(lit(1)).as("n"))
        // no distinct: the semi join below already deduplicates its
        // probe side — an explicit dedup here would just add an
        // exchange + hash-aggregate stage for nothing
        val hot = vol.crossJoin(broadcast(m))
          .filter(col("v").cast("decimal(38,0)") * col("n") > col("t") * lit(3))
          .select(col("l_suppkey"))
        table(spark, dir, "supplier")
          .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        WITH vol AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS v
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
          GROUP BY l_partkey, l_suppkey),
        m AS (SELECT SUM(CAST(v AS HUGEINT)) AS t, COUNT(*) AS n FROM vol)
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM vol, m WHERE CAST(v AS HUGEINT) * n > 3 * t)
        ORDER BY s_suppkey""")),

    // ---------------------------------------------------------------- q38
    // Volume shipping (TPC-H Q7 shape): revenue flowing between TWO
    // trading nations keyed by (supplier nation, customer nation, ship
    // year) — the classic twice-aliased-dimension join. nation joins
    // BOTH fact sides as two separate broadcast copies, each
    // pre-filtered to the two partners (the IN pushes to the 25-row
    // dim scan), so the pair disjunction ((A,B) ∪ (B,A)) collapses to
    // one inequality over the two surviving keys — no OR reaches the
    // join. The only corpus-scale shuffle is lineitem ⋈ orders;
    // customer/supplier hash-join on their keys (AQE promotes them to
    // broadcast at gate SFs). The ship-year window prunes the fact
    // scan (PushedFilters) before anything joins.
    "q38_volume_shipping" -> QueryDef(
      build = (spark, dir) => {
        val n1 = table(spark, dir, "nation")
          .filter(col("n_nationkey").isin(7, 12))
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = table(spark, dir, "nation")
          .filter(col("n_nationkey").isin(7, 12))
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        val li = table(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
        val ord = table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val cust = table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val supp = table(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .join(broadcast(n2), col("c_nationkey") === col("ck"))
          .filter(col("sk") =!= col("ck"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      oracle = Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_nationkey IN (7, 12) AND n2.n_nationkey IN (7, 12)
          AND n1.n_nationkey <> n2.n_nationkey
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")),

    // ---------------------------------------------------------------- q39
    // Product-type profit (TPC-H Q9 shape, adapted: this corpus has no
    // partsupp table, so supply cost is proxied at a fixed 80% of the
    // part's retail price — the shape under test is the part-family
    // filter + multi-fact join + profit expression + (nation, year)
    // rollup, not the cost model). The name filter prunes part BEFORE
    // its join (pushed to the scan: ~13% of parts survive), lineitem ⋈
    // part shuffles on partkey, orders arrives on the orderkey
    // shuffle, supplier/nation ride as broadcasts (supplier is the
    // smallest SF-scaled table, 600x under lineitem). Profit is the
    // DIFFERENCE of two exact BIGINT minor-unit sums, each
    // decimal-cast per row before scaling; headroom at 100x the bench
    // SF stays >3 orders under 2^63 (~1e15 per sum at sf10).
    "q39_product_profit" -> QueryDef(
      build = (spark, dir) => {
        val part = table(spark, dir, "part")
          .filter(col("p_name").contains("red"))
          .select(col("p_partkey"), col("p_retailprice"))
        val li = table(spark, dir, "lineitem")
        val ord = table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
        val supp = table(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val nation = table(spark, dir, "nation")
        li.join(part, col("l_partkey") === col("p_partkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg((sumMinor(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            - sumMinor(col("p_retailprice") * lit(0.8) * col("l_quantity"), 6))
            .as("profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      oracle = Some("""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT)
                  - CAST(SUM(CAST(p_retailprice * 0.8 * l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS BIGINT) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
        ORDER BY n_name, o_year DESC""")),

    // ---------------------------------------------------------------- q40
    // Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    // join customer → a filtered orders subset, COUNT the match column
    // per customer (NULL-safe — zero-match customers survive with
    // count 0, the bucket an inner join silently drops), then a second
    // aggregation folds customers into the (c_count, custdist)
    // histogram. Q13's o_comment anti-pattern filter adapts to this
    // corpus as status 'P' (~a third of orders), leaving a real zero
    // bucket. Corpus-scale data moves ONCE (the per-customer shuffle);
    // the histogram's second shuffle sees one row per customer.
    // Filtering orders BEFORE the join is exactly the ON-clause
    // predicate of the reference form — for a left outer join the two
    // are equivalent and the pre-filter keeps the pushed scan.
    "q40_order_count_distribution" -> QueryDef(
      build = (spark, dir) => {
        val cust = table(spark, dir, "customer").select(col("c_custkey"))
        val ord = table(spark, dir, "orders")
          .filter(col("o_orderstatus") === "P")
          .select(col("o_orderkey"), col("o_custkey"))
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      oracle = Some("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderstatus = 'P'
          GROUP BY c_custkey) co
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")),

    // ---------------------------------------------------------------- q41
    // Semi-structured extraction: the events table carries a JSON
    // `props` payload; parse it ONCE with a declared schema
    // (from_json — schema'd, codegen'd, no UDF) and aggregate the
    // extracted field per event type. This is the log-analytics shape
    // where the payload column dwarfs the fixed columns: the scan
    // reads only (event_type, props), the parse is a per-row
    // projection inside the same whole-stage-codegen span as the
    // partial aggregate, and the shuffle carries |event_type| groups,
    // not rows. A malformed payload yields NULL (from_json's PERMISSIVE
    // default) and drops out of SUM/MIN/MAX/COUNT(k) on both engines.
    // The oracle extracts with an anchored regexp instead of a JSON
    // function so it carries no DuckDB-extension dependency; on this
    // single-key payload the two extractions are value-identical.
    "q41_props_json" -> QueryDef(
      build = (spark, dir) => {
        val ev = QueryDef.events(spark, dir)
        ev.select(col("event_type"),
            expr("from_json(props, 'k BIGINT').k").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("k")).as("n_with_k"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH p AS (
          SELECT event_type,
                 CAST(NULLIF(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1), '') AS BIGINT) AS k
          FROM events)
        SELECT event_type, COUNT(*) AS n,
               CAST(COUNT(k) AS BIGINT) AS n_with_k,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               MIN(k) AS min_k, MAX(k) AS max_k
        FROM p GROUP BY event_type ORDER BY event_type""")),

    // ---------------------------------------------------------------- q42
    // Weekly cohort retention — the classic product-analytics matrix:
    // each user's cohort is their first active epoch-week, and cell
    // (cohort, offset) counts users from that cohort still active
    // `offset` weeks later. Weeks are pure-integer epoch-microsecond
    // buckets (us div 604800e6) — no calendar truncation crosses the
    // engine boundary, so there is no Monday-vs-Sunday or timezone
    // hazard to reconcile.
    //
    // 100 TB shape: the (user, week) DISTINCT is the big reduction and
    // it map-side-combines before its shuffle; the cohort week comes
    // from an UNORDERED window MIN over the user partition — one
    // user-keyed exchange and a partition-LOCAL sort on the key only
    // (no global sort, no self-join back to a per-user aggregate) —
    // and the final matrix is |cohorts × offsets|, bounded by the
    // calendar, not the data.
    "q42_retention_cohorts" -> QueryDef(
      build = (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = QueryDef.events(spark, dir)
        val act = ev.select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .distinct()
        act.withColumn("cohort_wk",
            min("wk").over(Window.partitionBy("user_id")))
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_wk", "wk_offset")
      },
      oracle = Some("""
        WITH act AS (
          SELECT DISTINCT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
          FROM events),
        coh AS (SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY user_id)
        SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
               CAST(wk - cohort_wk AS BIGINT) AS wk_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM act JOIN coh USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---------------------------------------------------------------- q43
    // Time-to-convert distribution: for every user whose first
    // 'purchase' follows their first 'view', the µs gap between the
    // two — reported as an EXACT five-number summary (min / p50 /
    // p90 / max as lower discrete quantiles). q21 counts how many
    // users convert; this says how LONG conversion takes, the latency
    // SLA question. Quantiles come from operators/ExactQuantiles: the
    // textbook global row_number() is a corpus-wide single-partition
    // window, so the operator reduces to the value histogram (shuffle
    // = distinct gaps) and range-shards the prefix sums on the value
    // order itself — exact integer ranks, no corpus-wide window,
    // no approx_percentile epsilon. The oracle picks the same ranks
    // out of a plain window (fine at oracle scale).
    "q43_time_to_convert" -> QueryDef(
      build = (spark, dir) => {
        val ev = QueryDef.events(spark, dir)
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("us"))
        def firstOf(t: String, as: String) =
          ev.filter(col("event_type") === t)
            .groupBy("user_id").agg(min("us").as(as))
        val gaps = firstOf("view", "v_us")
          .join(firstOf("purchase", "p_us"), "user_id")
          .filter(col("p_us") > col("v_us"))
          .select((col("p_us") - col("v_us")).as("dt_us"))
        graft.operators.ExactQuantiles.of(
            gaps, "dt_us", Seq(0, 500, 900, 1000))(QueryDef.deferCleanup)
          .withColumnRenamed("n", "n_converters")
      },
      oracle = Some("""
        WITH v AS (
          SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS v_us
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        p AS (
          SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS p_us
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        d AS (
          SELECT p.p_us - v.v_us AS dt
          FROM v JOIN p USING (user_id) WHERE p.p_us > v.v_us),
        r AS (
          SELECT dt, ROW_NUMBER() OVER (ORDER BY dt) AS rn,
                 COUNT(*) OVER () AS n
          FROM d),
        qs AS (SELECT q FROM (VALUES (0), (500), (900), (1000)) t(q))
        SELECT CAST(q AS BIGINT) AS q_permille,
               CAST((q * (n - 1)) // 1000 AS BIGINT) AS rank_idx,
               dt AS dt_us, CAST(n AS BIGINT) AS n_converters
        FROM qs JOIN r ON rn = (q * (n - 1)) // 1000 + 1
        ORDER BY q""")),

    // ---------------------------------------------------------------- q44
    // Weekly stickiness (the WAU/MAU engagement ratio on q42's
    // pure-integer epoch-week buckets): for each active week w, the
    // distinct users active IN w over the distinct users active in
    // the trailing 4-week window [w−3, w], in exact ppm. The naive
    // form is a per-week self-join (or a RANGE window over distinct
    // user-weeks — a corpus-wide sort); instead each (user, week)
    // activity row EXPLODES into the ≤4 future windows it funds
    // (sequence(wk, wk+3)), and both counts are map-side-combined
    // DISTINCT aggregates — shuffle is ≤5× the distinct activity
    // pairs, the final join is |weeks|-sized. Output restricted to
    // weeks with their own activity (a window fed only by history is
    // reporting on a dead week).
    "q44_stickiness" -> QueryDef(
      build = (spark, dir) => {
        val act = QueryDef.events(spark, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .distinct()
        val wau = act.groupBy("wk").agg(count(lit(1)).as("wau"))
        val m4 = act
          .select(col("user_id"), explode(expr("sequence(wk, wk + 3)")).as("w"))
          .distinct()
          .groupBy(col("w").as("wk")).agg(count(lit(1)).as("m4au"))
        wau.join(m4, "wk")
          .select(col("wk"), col("wau"), col("m4au"),
            expr("wau * 1000000 div m4au").as("stickiness_ppm"))
          .orderBy("wk")
      },
      oracle = Some("""
        WITH act AS (
          SELECT DISTINCT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
          FROM events),
        wau AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS wau FROM act GROUP BY wk),
        m4 AS (
          SELECT w AS wk, CAST(COUNT(*) AS BIGINT) AS m4au FROM (
            SELECT DISTINCT user_id, unnest(range(wk, wk + 4)) AS w FROM act) z
          GROUP BY w)
        SELECT CAST(wau.wk AS BIGINT) AS wk, wau, m4au,
               CAST(wau * 1000000 // m4au AS BIGINT) AS stickiness_ppm
        FROM wau JOIN m4 ON wau.wk = m4.wk
        ORDER BY wk""")),

    // ---------------------------------------------------------------- q45
    // Order-to-ship latency distribution — ExactQuantiles on the FACT
    // side: exact integer-day quantiles of l_shipdate − o_orderdate
    // over the full lineitem ⋈ orders join. The operator's histogram
    // reduction is the whole story here: latency days live in a tiny
    // domain (~200 distinct values regardless of SF), so after the one
    // corpus-scale shuffle (the orderkey join) the quantile machinery
    // runs on a ~200-row frame — exact p99 at 100 TB for the cost of
    // the join Spark needed anyway. Pure-integer µs→day buckets (no
    // calendar/timezone seam, q42's convention).
    "q45_ship_latency" -> QueryDef(
      build = (spark, dir) => {
        val li = QueryDef.table(spark, dir, "lineitem")
          .select(col("l_orderkey"),
            expr("unix_micros(cast(l_shipdate as timestamp))").as("s_us"))
        val ord = QueryDef.table(spark, dir, "orders")
          .select(col("o_orderkey"),
            expr("unix_micros(cast(o_orderdate as timestamp))").as("o_us"))
        val days = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(expr("(s_us - o_us) div 86400000000").as("lat_days"))
        graft.operators.ExactQuantiles.of(
            days, "lat_days",
            Seq(0, 250, 500, 750, 900, 990, 1000))(QueryDef.deferCleanup)
          .withColumnRenamed("n", "n_items")
      },
      oracle = Some("""
        WITH d AS (
          SELECT (epoch_us(CAST(l_shipdate AS TIMESTAMP)) -
                  epoch_us(CAST(o_orderdate AS TIMESTAMP))) // 86400000000 AS lat_days
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        r AS (
          SELECT lat_days, ROW_NUMBER() OVER (ORDER BY lat_days) AS rn,
                 COUNT(*) OVER () AS n
          FROM d),
        qs AS (SELECT q FROM (VALUES (0), (250), (500), (750), (900), (990), (1000)) t(q))
        SELECT CAST(q AS BIGINT) AS q_permille,
               CAST((q * (n - 1)) // 1000 AS BIGINT) AS rank_idx,
               lat_days, CAST(n AS BIGINT) AS n_items
        FROM qs JOIN r ON rn = (q * (n - 1)) // 1000 + 1
        ORDER BY q""")),

    // ---------------------------------------------------------------- q46
    // AS-OF attribution: each purchase picks the LATEST click by the
    // same user at-or-before it — the point-in-time lookup Spark has
    // no built-in join for (operators/AsofJoin: union the tagged
    // sides, ONE shuffle on user_id, a per-key running last() window —
    // no per-key cross product, no re-scan; the theta-join encoding
    // materializes every (purchase × earlier-click) pair first). Ties:
    // two clicks at one (user, µs) are ordered by event_id inside the
    // operator for determinism, and the OUTPUT carries only the
    // click's timestamp, which exact ties share — so the relation is
    // tie-invariant and DuckDB's native ASOF (which picks an arbitrary
    // winner among exact ties) is a valid oracle. Purchases with no
    // prior click keep NULLs (LEFT asof), counted in-band.
    "q46_asof_attribution" -> QueryDef(
      build = (spark, dir) => {
        val ev = QueryDef.events(spark, dir)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"), col("event_type"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("us").as("purchase_us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("us").as("click_us"),
            col("event_id").as("click_eid"))
        // shards = 8: the skew-proof range-sharded plan (r20) — a hot
        // user is 8 sorted runs on 8 tasks instead of one; exactness
        // is the operator's carry-in argument and THIS oracle gates it
        graft.operators.AsofJoin.asof(purchases, clicks,
            key = "user_id", leftTs = "purchase_us", rightTs = "click_us",
            rightVals = Seq("click_us"), tieBreak = Seq("click_eid"),
            shards = 8)
          .select(col("event_id"), col("user_id"), col("purchase_us"),
            col("click_us"),
            (col("purchase_us") - col("click_us")).as("latency_us"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_id, user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
          FROM events),
        p AS (SELECT event_id, user_id, us AS purchase_us FROM e WHERE event_type = 'purchase'),
        c AS (SELECT user_id, us AS click_us FROM e WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.purchase_us, c.click_us,
               p.purchase_us - c.click_us AS latency_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.purchase_us >= c.click_us
        ORDER BY p.event_id""")),

    // ---------------------------------------------------------------- q47
    // Banded range join: for every view event, the number of error
    // events within ±5 minutes ANYWHERE in the system — the error-burst
    // correlation query whose bare |Δts| <= band condition Spark plans
    // as a broadcast-nested-loop over |V|·|E| comparisons.
    // operators/BandJoin rewrites it: bucket the time axis at the band
    // width, replicate the error side to {b−1, b, b+1}, equi-join on
    // the bucket, filter the exact band — every qualifying pair meets
    // in exactly ONE bucket, candidates are ±1-bucket pairs instead of
    // the cross product. Views with no nearby error keep n_nearby = 0
    // (left join of the pair counts back onto the view set). DuckDB's
    // IEJoin evaluates the same predicate exactly for the oracle.
    "q47_error_proximity" -> QueryDef(
      build = (spark, dir) => {
        val ev = QueryDef.events(spark, dir)
          .select(col("event_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("us"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("us").as("err_us"))
        val counts = graft.operators.BandJoin
          .pairs(views, errors, leftTs = "us", rightTs = "err_us",
            band = 300L * 1000000L)
          .groupBy("event_id").agg(count(lit(1)).as("n"))
        views.join(counts, Seq("event_id"), "left")
          .select(col("event_id"),
            coalesce(col("n"), lit(0L)).as("n_nearby_errors"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH v AS (
          SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_type = 'view'),
        e AS (
          SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_type = 'error')
        SELECT v.event_id, CAST(COUNT(e.us) AS BIGINT) AS n_nearby_errors
        FROM v LEFT JOIN e ON abs(v.us - e.us) <= 300000000
        GROUP BY v.event_id ORDER BY v.event_id""")),

    // ---------------------------------------------------------------- q47b
    // q47's PRODUCTION face for dense windows (BandJoin.nearest): per
    // view, only the 3 NEAREST in-band errors — q47's full pair
    // relation is quadratic in event density BY SEMANTICS (10× traffic
    // = 100× pairs), so the consumer-facing variant caps inside the
    // operator: the row_number cap runs as a PARTIAL WindowGroupLimit
    // below the window exchange (plan-pinned in BandJoinSpec), so a
    // dense window's pair volume never crosses the shuffle, let alone
    // reaches a consumer. Ties (equidistant before/after errors) break
    // on the error's event id — fully deterministic, so the plain
    // QUALIFY SQL is a true oracle. Inner semantics: views with no
    // in-band error emit no rows (q47 carries the zero counts).
    "q47b_error_proximity_topk" -> QueryDef(
      build = (spark, dir) => {
        val ev = QueryDef.events(spark, dir)
          .select(col("event_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("us"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_eid"), col("us").as("err_us"))
        graft.operators.BandJoin
          .nearest(views, errors, leftId = "event_id",
            leftTs = "us", rightTs = "err_us", band = 300L * 1000000L,
            k = 3, tieBreak = Seq("err_eid"))
          .select(col("event_id"), col("err_eid"), col("err_us"), col("rnk"))
          .orderBy("event_id", "rnk")
      },
      oracle = Some("""
        WITH v AS (
          SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_type = 'view'),
        e AS (
          SELECT event_id AS err_eid, epoch_us(CAST(ts AS TIMESTAMP)) AS err_us
          FROM events WHERE event_type = 'error')
        SELECT event_id, err_eid, err_us, CAST(rnk AS BIGINT) AS rnk FROM (
          SELECT v.event_id, e.err_eid, e.err_us,
                 ROW_NUMBER() OVER (PARTITION BY v.event_id
                   ORDER BY abs(v.us - e.err_us), e.err_eid, e.err_us) AS rnk
          FROM v JOIN e ON abs(v.us - e.err_us) <= 300000000) z
        WHERE rnk <= 3 ORDER BY event_id, rnk"""))
  )
}
