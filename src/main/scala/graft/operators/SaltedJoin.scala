package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed joins — the fallback when AQE's
  * skew-join splitting can't help (e.g. a single hot key on BOTH the
  * build of an aggregation and a non-broadcastable dimension).
  *
  * Shape: the skewed (big) side gets a random-but-deterministic salt in
  * [0, salts); the small side is replicated `salts` times; the join key
  * becomes (key, salt), spreading one hot key over `salts` reducers.
  * Replication multiplies the small side's shuffle volume by `salts` —
  * use only when skew is measured, and prefer AQE/broadcast first
  * (that's why the relational queries here don't salt by default).
  *
  * Determinism: salt = positive_mod(xxhash64(whole row), salts) — stable
  * across retries (a task re-run salts identically, so no duplicate or
  * lost pairs on speculative execution, unlike rand()-based salting).
  */
object SaltedJoin {

  /** Equi-join big⋈small on `key` with `salts`-way salting. */
  def join(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)).cast("int"))
    val saltRange = explode(expr(s"sequence(0, ${salts - 1})"))
    val smallS = small.withColumn("__salt", saltRange)
    bigS.join(smallS,
        bigS(key) === smallS(key) && bigS("__salt") === smallS("__salt"),
        joinType)
      .drop(smallS(key)).drop("__salt")
  }
}
