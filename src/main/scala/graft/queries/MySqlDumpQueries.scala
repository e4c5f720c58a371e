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

  /** Generate (once per sf dir) a mysqldump-format file carrying the
    * full lineitem table as extended INSERTs (1000 tuples per
    * statement/line, mysqldump's shape), written distributed and
    * stream-concatenated. */
  private def bulkDump(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val sfName = new java.io.File(dir).getName
    val path = s"/tmp/graft_bulk_$sfName.mysqldump"
    if (new java.io.File(path).exists()) return path
    // concurrency-safe cache fill: assemble under pid-unique scratch
    // names, then ONE atomic rename into place — a concurrent driver
    // either sees no file (and generates its own identical copy; the
    // content is deterministic, so whichever rename lands last is
    // byte-equal) or a complete file, never a torn half-assembly
    val pid = ProcessHandle.current().pid()
    val tuples = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(concat(lit("("),
        col("l_orderkey"), lit(","), col("l_linenumber"), lit(","),
        col("l_quantity"), lit(",'"),
        col("l_shipdate").cast("date").cast("string"), lit("','"),
        col("l_returnflag"), lit("')")).as("t"),
        (col("l_orderkey") % 64).as("g"))
    import org.apache.spark.sql.expressions.Window
    val numbered = tuples.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("t")) - 1)
    val lines = numbered.groupBy(col("g"), (col("rn") / 1000).cast("int").as("chunk"))
      .agg(concat_ws(",", collect_list(col("t"))).as("body"))
      .select(concat(lit("INSERT INTO `lineitem` VALUES "), col("body"), lit(";")))
    val tmp = s"$path.payload.$pid"
    lines.coalesce(1).write.mode("overwrite").text(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.startsWith("part-")).get
    val staged = s"$path.staged.$pid"
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(staged))
    try {
      out.write(
        """/*!40103 SET TIME_ZONE='+00:00' */;
          |CREATE TABLE `lineitem` (
          |  `l_orderkey` bigint(20) NOT NULL,
          |  `l_linenumber` bigint(20) NOT NULL,
          |  `l_quantity` decimal(12,2) DEFAULT NULL,
          |  `l_shipdate` date DEFAULT NULL,
          |  `l_returnflag` char(1) DEFAULT NULL,
          |  PRIMARY KEY (`l_orderkey`,`l_linenumber`)
          |) ENGINE=InnoDB;
          |""".stripMargin.getBytes("UTF-8"))
      java.nio.file.Files.copy(part.toPath, out)
    } finally out.close()
    java.nio.file.Files.move(java.nio.file.Paths.get(staged),
      java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(tmp)) // drop the pid-scratch payload dir
    path
  }

  val defs: Map[String, QueryDef] = Map(
    // ---------------------------------------------------------------- p04
    // Bulk throughput through the extended-INSERT path: line filter →
    // per-partition tuple lexer → casts. Count pinned to the source.
    "p04_mysqldump_bulk" -> QueryDef(
      build = (spark, dir) => {
        val path = bulkDump(spark, dir)
        val m = MySqlDumpReader.migrate(spark, path)
        QueryDef.deferCleanup(m.release)
        val (good, _) = m.tables("lineitem")
        good.agg(count(lit(1)).as("n_rows"))
      },
      oracle = Some("SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem"),
      headline = true),
    // ---------------------------------------------------------------- p06
    // The DataSource V2 mysqldump table end-to-end: byte-chunked scan →
    // per-reader tuple lexing → pruned string columns → relational agg,
    // checked against DuckDB over the source parquet (p05's sibling —
    // p04 times the full migration, p06 the format("mysqldump") scan).
    // ---------------------------------------------------------------- p08
    // mysqldump sink round trip (p07's MySQL counterpart): parquet
    // lineitem → MySqlDumpSink extended INSERTs → format("mysqldump")
    // read of the written file → aggregate vs the direct-parquet
    // oracle.
    "p08_mysqldump_roundtrip" -> QueryDef(
      build = (spark, dir) => {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        val out = java.nio.file.Files
          .createTempDirectory("graft_p08_").toString + "/lineitem.sql"
        QueryDef.deferCleanup(() => {
          val d = new java.io.File(out).getParentFile
          Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete(); ()
        })
        graft.sink.MySqlDumpSink.writeFile(li, "lineitem", out)
        spark.read.format("mysqldump").option("table", "lineitem").load(out)
          .filter(!col("__ragged"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            (sum(col("l_quantity").cast("decimal(18,2)")) * 100)
              .cast("bigint").as("qty_cents"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS qty_cents
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    "p06_mysqldump_v2" -> QueryDef(
      build = (spark, dir) => {
        val path = bulkDump(spark, dir)
        spark.read.format("mysqldump").option("table", "lineitem").load(path)
          .filter(!col("__ragged"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            (sum(col("l_quantity").cast("decimal(18,2)")) * 100)
              .cast("bigint").as("qty_cents"))
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS qty_cents
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      headline = true),
    "p02_mysqldump_customers" -> QueryDef(
      build = (spark, _) => {
        val m = MySqlDumpReader.migrate(spark, fixture)
        QueryDef.deferCleanup(m.release)
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
