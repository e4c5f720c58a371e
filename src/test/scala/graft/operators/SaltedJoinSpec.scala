package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Salted join: identical relation to the plain join on a skewed key
  * distribution, with the hot key spread over all salt partitions. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  test("same result as plain join under heavy key skew") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val big = (1L to 10000L)
      .map(i => (if (i % 10 == 0) i % 7 else 42L, i))
      .toDF("k", "v")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SaltedJoin.join(big, small, "k", salts = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.size === 10000)
  }

  test("salt spreads the hot key across buckets deterministically") {
    import spark.implicits._
    val big = (1L to 1000L).map(i => (42L, i)).toDF("k", "v")
    val salts1 = big.withColumn("s",
      pmod(xxhash64(col("k"), col("v")), lit(8)).cast("int"))
      .groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // all 8 buckets used, none holding everything
    assert(salts1.keySet === (0 until 8).toSet)
    assert(salts1.values.max < 1000)
    // deterministic: same salting on recompute
    val salts2 = big.withColumn("s",
      pmod(xxhash64(col("k"), col("v")), lit(8)).cast("int"))
      .groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salts1 === salts2)
  }
}
