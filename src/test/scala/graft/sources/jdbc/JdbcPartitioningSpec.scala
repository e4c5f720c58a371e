package graft.sources.jdbc

import org.scalatest.funsuite.AnyFunSuite

/** S7's parallel-read discipline: stride bounds must come from the data
  * (MIN/MAX probe) — never a fixed guess — and the derived partition
  * predicates must be non-degenerate: every range intersects [min, max],
  * so every partition has work on a dense serial PK.
  *
  * The end-to-end half runs against embedded Derby (shipped in the Spark
  * jars dir), so unlike the env-gated JdbcIntegrationSpec it executes
  * everywhere: a 1..1000 serial-PK table — exactly the shape the old
  * [0, 2^40) default served from a single stride — must produce one
  * NON-EMPTY Spark partition per predicate.
  */
class JdbcPartitioningSpec extends AnyFunSuite {
  private lazy val spark = graft.GraftSession.build("graft-jdbc-part")

  // --- pure predicate derivation -----------------------------------------

  test("even split: each range intersects the bounds, ends unbounded, NULLs caught") {
    val p = JdbcData.partitionPredicates("id", 0, 99, 4)
    assert(p === Seq(
      "id < 25 OR id IS NULL",
      "id >= 25 AND id < 50",
      "id >= 50 AND id < 75",
      "id >= 75"))
  }

  test("remainder spreads without empty ranges") {
    val p = JdbcData.partitionPredicates("id", 0, 9, 3)
    assert(p === Seq("id < 3 OR id IS NULL", "id >= 3 AND id < 6", "id >= 6"))
  }

  test("requested > key-span clamps to span (no empty-range partitions)") {
    // span 3 with 8 requested: 3 predicates, each holding exactly one key
    val p = JdbcData.partitionPredicates("id", 5, 7, 8)
    assert(p === Seq("id < 6 OR id IS NULL", "id >= 6 AND id < 7", "id >= 7"))
  }

  test("single-valued or single-partition keys mean: don't partition") {
    assert(JdbcData.partitionPredicates("id", 42, 42, 8).isEmpty)
    assert(JdbcData.partitionPredicates("id", 0, 100, 1).isEmpty)
  }

  test("negative bounds and the full Long span derive without overflow") {
    val neg = JdbcData.partitionPredicates("id", -100, -1, 2)
    assert(neg === Seq("id < -50 OR id IS NULL", "id >= -50"))
    val full = JdbcData.partitionPredicates("id", Long.MinValue, Long.MaxValue, 4)
    assert(full.size === 4)
    // cuts near -2^62, 0, 2^62 — monotone, inside the span
    val cuts = full.tail.map(_.split(" ")(2).toLong)
    assert(cuts === cuts.sorted && cuts.head < 0 && cuts.last > 0)
  }

  test("inverted bounds are refused loudly") {
    intercept[IllegalArgumentException] {
      JdbcData.partitionPredicates("id", 10, 5, 4)
    }
  }

  test("probed values beyond Long saturate instead of wrapping") {
    // MySQL BIGINT UNSIGNED / wide DECIMAL PKs come back as BigDecimal;
    // Number.longValue past Long.MaxValue wraps NEGATIVE — inverting
    // the bounds and failing the very read the old fixed default
    // handled. Saturation keeps them ordered; the unbounded end
    // predicates keep coverage total for rows beyond the clamp.
    val big = new java.math.BigDecimal("18446744073709551615") // 2^64-1
    val negBig = new java.math.BigDecimal("-99999999999999999999")
    assert(JdbcData.clampToLong(big) === Long.MaxValue)
    assert(JdbcData.clampToLong(negBig) === Long.MinValue)
    assert(JdbcData.clampToLong(new java.math.BigDecimal("42")) === 42L)
    assert(JdbcData.clampToLong(
      new java.math.BigInteger("18446744073709551615")) === Long.MaxValue)
    assert(JdbcData.clampToLong(java.lang.Double.valueOf(1e30)) === Long.MaxValue)
    assert(JdbcData.clampToLong(java.lang.Long.valueOf(-7L)) === -7L)
    // derivation over saturated bounds stays valid (no inversion throw)
    assert(JdbcData.partitionPredicates("id", 1L, Long.MaxValue, 4).size === 4)
  }

  test("a DECIMAL key wider than Long probes to saturated, ordered bounds") {
    val url = "jdbc:derby:memory:graftwide;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try {
        st.execute("CREATE TABLE wide_pk (id DECIMAL(24,0), v VARCHAR(8))")
        st.execute("INSERT INTO wide_pk VALUES (1, 'a'), " +
          "(18446744073709551615, 'b')") // 2^64-1 > Long.MaxValue
      } finally st.close()
    } finally c.close()
    assert(JdbcData.probeBounds(spark, url, new java.util.Properties(),
      "wide_pk", "id") === Some((1L, Long.MaxValue)))
  }

  // --- end-to-end against embedded Derby ---------------------------------

  private lazy val derbyUrl = {
    val url = "jdbc:derby:memory:graftpart;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try {
        st.execute("CREATE TABLE serial_pk (id BIGINT, v VARCHAR(16))")
        val ps = c.prepareStatement("INSERT INTO serial_pk VALUES (?, ?)")
        (1 to 1000).foreach { i =>
          ps.setLong(1, i.toLong); ps.setString(2, s"v$i"); ps.addBatch()
        }
        ps.setNull(1, java.sql.Types.BIGINT); ps.setString(2, "nullkey")
        ps.addBatch()
        ps.executeBatch(); ps.close()
        st.execute("CREATE TABLE empty_t (id BIGINT, v VARCHAR(16))")
      } finally st.close()
    } finally c.close()
    url
  }

  test("probeBounds finds the real key range; empty table probes to None") {
    assert(JdbcData.probeBounds(spark, derbyUrl,
      new java.util.Properties(), "serial_pk", "id") === Some((1L, 1000L)))
    assert(JdbcData.probeBounds(spark, derbyUrl,
      new java.util.Properties(), "empty_t", "id") === None)
  }

  test("serial-PK table reads with every partition non-empty, no row lost") {
    val df = JdbcData.readTable(spark, derbyUrl, new java.util.Properties(),
      "serial_pk", partitionCol = Some("id"), numPartitions = 8)
    val perPartition = df.rdd
      .mapPartitionsWithIndex((i, it) => Iterator(i -> it.size))
      .collect().toMap
    assert(perPartition.size === 8)
    assert(perPartition.values.forall(_ > 0),
      s"degenerate partitions: $perPartition")
    // the old [0, 2^40) default put all 1001 rows in partition 0
    assert(perPartition.values.max < 1001)
    assert(df.count() === 1001) // incl. the NULL-key row (first predicate)
    assert(df.where("id IS NULL").count() === 1)
    import org.apache.spark.sql.functions.sum
    assert(df.agg(sum("id")).collect()(0).getLong(0) === 500500L)
  }

  test("caller-supplied bounds skip the probe and still cover outliers") {
    // bounds deliberately narrower than the data: unbounded end predicates
    // must still pick up rows outside [200, 800]
    val df = JdbcData.readTable(spark, derbyUrl, new java.util.Properties(),
      "serial_pk", partitionCol = Some("id"), numPartitions = 4,
      bounds = Some((200L, 800L)))
    assert(df.count() === 1001)
    assert(df.rdd.getNumPartitions === 4)
  }

  test("empty table degrades to a single-stream read") {
    val df = JdbcData.readTable(spark, derbyUrl, new java.util.Properties(),
      "empty_t", partitionCol = Some("id"), numPartitions = 8)
    assert(df.count() === 0)
  }
}
