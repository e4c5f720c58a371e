package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Scale notes (100 TB design): every query below is a straight
  * scan→(broadcast|shuffle)→agg pipeline with no driver-side loops;
  * small dimensions (region/nation/customer/part at TPC-H proportions)
  * are broadcast explicitly; everything else relies on AQE for skew and
  * partition coalescing.
  */
object Relational {
  import QueryDef.table

  private def dec(c: org.apache.spark.sql.Column, p: Int, s: Int) =
    c.cast(s"decimal($p,$s)")

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
            dec(sum(dec(col("l_quantity"), 18, 2)), 38, 2).as("sum_qty"),
            dec(sum(dec(col("l_extendedprice"), 18, 2)), 38, 2).as("sum_base_price"),
            dec(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 18, 6)), 38, 6)
              .as("sum_disc_price"),
            dec(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 18, 6)), 38, 6)
              .as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      headline = true),

    // ---------------------------------------------------------------- q03
    // TPC-H Q3: broadcast(customer-filter) ⋈ orders ⋈ lineitem, top-k.
    // Top-k by a DECIMAL sum ⇒ deterministic even under ties (orderkey
    // tiebreak). At cluster scale: customer(BUILDING) is ~1/5 of customer
    // — still broadcastable at TPC-H proportions (customer ≪ lineitem).
    "q03_shipping_priority" -> QueryDef(
      build = (spark, dir) => {
        val cust = table(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val ord = table(spark, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-06-30").cast("timestamp"))
        val li = table(spark, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp"))
        li.join(broadcast(ord.join(broadcast(cust),
            ord("o_custkey") === cust("c_custkey"))),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dec(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 18, 6)), 38, 6)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      oracle = Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
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
    // 5-way join through the star schema; all dims broadcast, lineitem is
    // the only shuffled side (and only for the final group-by).
    "q05_revenue_by_nation" -> QueryDef(
      build = (spark, dir) => {
        val region = table(spark, dir, "region")
        val nation = table(spark, dir, "nation")
        val cust = table(spark, dir, "customer")
        val ord = table(spark, dir, "orders")
        val li = table(spark, dir, "lineitem")
        val supp = table(spark, dir, "supplier")
        li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dec(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 18, 6)), 38, 6)
            .as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      oracle = Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
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
          .agg(dec(sum(dec(col("l_extendedprice") * col("l_discount"), 18, 6)), 38, 6)
            .as("revenue"))
      },
      oracle = Some("""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
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
            row_number().over(w).as("rn"),
            dec(sum(dec(col("o_totalprice"), 18, 2))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 38, 2)
              .as("running_total"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER w AS rn,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, rn"""),
      headline = true),

    // ---------------------------------------------------------------- q08
    // Top-k: local top-k per partition then merge at the driver via
    // TakeOrderedAndProject — no global sort at scale.
    "q08_top_customers" -> QueryDef(
      build = (spark, dir) => {
        val cust = table(spark, dir, "customer")
        val ord = table(spark, dir, "orders")
        ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(dec(sum(dec(col("o_totalprice"), 18, 2)), 38, 2).as("total_spend"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("total_spend").desc, col("c_custkey"))
          .limit(20)
      },
      oracle = Some("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_spend,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spend DESC, c_custkey
        LIMIT 20""")),

    // ---------------------------------------------------------------- q09
    // Left-semi + left-anti joins (EXISTS / NOT EXISTS) — broadcast both.
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
            dec(sum(dec(col("o_totalprice"), 18, 2)), 38, 2).as("total"))
          .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("n"), col("total"))
          .orderBy("status", "priority")
      },
      oracle = Some("""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
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
    // events.ts is ns in parquet → truncate to µs on both sides.
    "q13_events_hourly" -> QueryDef(
      build = (spark, dir) => {
        val ev = QueryDef.events(spark, dir)
        ev.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            dec(sum(dec(col("value"), 18, 6)), 38, 6).as("total_value"))
          .orderBy("hour", "event_type")
      },
      oracle = Some("""
        SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total_value
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
    // Fact ⋈ broadcast dim with grouped revenue by part brand.
    "q15_brand_revenue" -> QueryDef(
      build = (spark, dir) => {
        val part = table(spark, dir, "part")
        val li = table(spark, dir, "lineitem")
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            dec(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 18, 6)), 38, 6)
              .as("revenue"))
          .orderBy("p_brand")
      },
      oracle = Some("""
        SELECT p_brand, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // ---------------------------------------------------------------- q16
    // Date-part extraction + grouped agg.
    "q16_orders_by_year" -> QueryDef(
      build = (spark, dir) => {
        val ord = table(spark, dir, "orders")
        ord.groupBy(year(col("o_orderdate")).as("yr"))
          .agg(count(lit(1)).as("n_orders"),
            dec(sum(dec(col("o_totalprice"), 18, 2)), 38, 2).as("total"))
          .orderBy("yr")
      },
      oracle = Some("""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
        FROM orders
        GROUP BY 1
        ORDER BY 1"""))
  )
}
