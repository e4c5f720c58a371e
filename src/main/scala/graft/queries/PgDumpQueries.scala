package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.pgdump.PgDumpReader

/** Driver-checked pg_dump pipeline query: runs the full slice (chunk →
  * DDL interpret → type-map → distributed COPY read → casts → synth PK)
  * on the repo fixture and emits the migrated `inventory` table in
  * hash-stable form. The oracle is a VALUES literal — the expected rows
  * of the migration, independently spelled out (the same technique as
  * the reference's expected-spannerData golden structs,
  * postgres/pgdump_test.go:33-37).
  */
object PgDumpQueries {
  private val fixture = "/root/repo/src/test/resources/fixtures/sample.pgdump"

  val defs: Map[String, QueryDef] = Map(
    "p01_pgdump_inventory" -> QueryDef(
      build = (spark, _) => {
        val m = PgDumpReader.migrate(spark, fixture)
        val (inv, _) = m.tables("inventory")
        inv.select(
          col("sku"),
          col("owner_id"),
          col("qty"),
          col("price").cast("string").as("price_str"),
          col("in_stock").cast("string").as("in_stock_str"),
          (col("weight") * 1000000).cast("bigint").as("weight_micro"),
          unix_micros(col("added_at")).as("added_us"),
          col("restock_on").cast("string").as("restock_str"),
          lower(hex(col("blob"))).as("blob_hex"),
          concat_ws("|", transform(col("tags"),
            x => coalesce(x, lit("(null)")))).as("tags_str"),
          when(col("counts").isNull, lit(null: String))
            .otherwise(concat_ws("|", transform(col("counts"),
              x => coalesce(x.cast("string"), lit("(null)"))))).as("counts_str"))
          .orderBy("sku")
      },
      oracle = Some("""
        SELECT * FROM (VALUES
          (e'tab\tsep', 'u3', 7, '100.000000000', 'true', 2250000,
           CAST(NULL AS BIGINT), '2020-01-15', 'ff', 'x,y|(null)', '3'),
          ('widget-1', 'u1', 42, '19.990000000', 'true', 1500000,
           epoch_us(TIMESTAMP '2019-10-28 19:30:00'), '2019-11-01',
           '0001beef', 'a|b|c d', '1|2|(null)'),
          ('widget-2', 'u2', CAST(NULL AS BIGINT), '0.500000000', 'false',
           CAST(NULL AS BIGINT), epoch_us(TIMESTAMP '2019-10-29 00:00:00'),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '',
           CAST(NULL AS VARCHAR))
        ) AS t(sku, owner_id, qty, price_str, in_stock_str, weight_micro,
               added_us, restock_str, blob_hex, tags_str, counts_str)
        ORDER BY sku"""))
  )
}
