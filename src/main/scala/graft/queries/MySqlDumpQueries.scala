package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.mysqldump.MySqlDumpReader

/** Driver-checked mysqldump pipeline query: full slice (scan → DDL
  * interpret → type-map → distributed INSERT-line read → casts) on the
  * repo fixture, emitting the migrated `customers` table hash-stable
  * (BIGINT/STRING only). Oracle = VALUES literal of the expected rows,
  * independently spelled out (mysql/mysqldump_test.go golden-struct
  * technique). */
object MySqlDumpQueries {
  private val fixture = "/root/repo/src/test/resources/fixtures/sample.mysqldump"

  val defs: Map[String, QueryDef] = Map(
    "p02_mysqldump_customers" -> QueryDef(
      build = (spark, _) => {
        val m = MySqlDumpReader.migrate(spark, fixture)
        val (cust, _) = m.tables("customers")
        cust.select(
          col("id"),
          col("name"),
          col("active").cast("string").as("active_str"),
          col("balance").cast("string").as("balance_str"),
          col("joined").cast("string").as("joined_str"),
          unix_micros(col("last_seen")).as("last_seen_us"),
          unix_micros(col("birthday")).as("birthday_us"),
          concat_ws("|", col("tags")).as("tags_str"),
          col("tier"),
          col("notes"),
          lower(hex(col("photo"))).as("photo_hex"),
          col("meta"))
          .orderBy("id")
      },
      oracle = Some("""
        SELECT * FROM (VALUES
          (1, 'Alice', 'true', '12.500000000', '2020-06-06',
           epoch_us(TIMESTAMP '2020-07-19 23:40:26'),
           epoch_us(TIMESTAMP '2020-07-20 05:10:26'),
           'new|vip', 'gold', e'it''s fine', '62696e0064617461', '{"a": 1}'),
          (2, e'Bob''s shop', 'false', CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           '', 'basic', e'line1\nline2', CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR))
        ) AS t(id, name, active_str, balance_str, joined_str, last_seen_us,
               birthday_us, tags_str, tier, notes, photo_hex, meta)
        ORDER BY id"""))
  )
}
