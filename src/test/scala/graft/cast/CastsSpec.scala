package graft.cast

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col
import graft.GraftSession
import graft.types.{SpScalar, SpType}
import java.time.Instant

/** Cast-library semantics, ported from the reference's table-driven
  * tests (postgres/data_test.go:33-120, mysql/data_test.go:40-150). */
class CastsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  /** Convert one string value through a Column function. */
  private def conv(v: String, f: Column => Column): Any = {
    import spark.implicits._
    val df = Seq(Option(v)).toDF("a").select(f(col("a")).as("r"))
    val r = df.collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }
  private def ts(s: String): Instant = Instant.parse(s)
  private def gotTs(v: Any): Instant = v.asInstanceOf[java.sql.Timestamp].toInstant

  // ------------------------------------------------------------------ pg
  test("pg bool: strict ParseBool set") {
    for (s <- Seq("1", "t", "T", "TRUE", "true", "True"))
      assert(conv(s, PgCasts.bool) === true, s)
    for (s <- Seq("0", "f", "F", "FALSE", "false", "False"))
      assert(conv(s, PgCasts.bool) === false, s)
    for (s <- Seq("yes", "junk", "2", "")) // Spark's own cast accepts yes!
      assert(conv(s, PgCasts.bool) === null, s)
  }

  test("pg bytes: \\x-prefixed hex") {
    assert(conv("\\x0001beef", PgCasts.bytes)
      .asInstanceOf[Array[Byte]].toSeq === Seq[Byte](0x0, 0x1, 0xbe.toByte, 0xef.toByte))
    assert(conv("0001", PgCasts.bytes) === null)       // missing prefix
    assert(conv("\\x000", PgCasts.bytes) === null)     // odd length
    assert(conv("\\xzz", PgCasts.bytes) === null)      // not hex
    assert(conv("\\x", PgCasts.bytes).asInstanceOf[Array[Byte]].isEmpty)
  }

  test("date: strict RFC3339 full-date") {
    assert(conv("2019-10-29", Casts.date).toString === "2019-10-29")
    assert(conv("2019-10-29 05:30:00", Casts.date) === null) // civil.ParseDate rejects
    assert(conv("2019-13-40", Casts.date) === null)
  }

  test("int64: ParseInt semantics incl. overflow -> NULL") {
    assert(conv("42", Casts.int64) === 42L)
    assert(conv("-42", Casts.int64) === -42L)
    assert(conv("+42", Casts.int64) === 42L)
    assert(conv("9223372036854775807", Casts.int64) === Long.MaxValue)
    assert(conv("-9223372036854775808", Casts.int64) === Long.MinValue)
    assert(conv("9223372036854775808", Casts.int64) === null)  // overflow
    assert(conv("42.1", Casts.int64) === null)
    assert(conv("4e3", Casts.int64) === null)
    assert(conv("", Casts.int64) === null)
  }

  test("float64: ParseFloat semantics") {
    assert(conv("42.6", Casts.float64) === 42.6)
    assert(conv("-1e-3", Casts.float64) === -0.001)
    assert(conv(".5", Casts.float64) === 0.5)
    assert(conv("Inf", Casts.float64) === Double.PositiveInfinity)
    assert(conv("-Infinity", Casts.float64) === Double.NegativeInfinity)
    assert(conv("NaN", Casts.float64).asInstanceOf[Double].isNaN)
    assert(conv("4.2.1", Casts.float64) === null)
  }

  test("numeric: NUMERIC(38,9), overflow -> NULL") {
    assert(conv("12.345678912", Casts.numeric).toString === "12.345678912")
    assert(conv("42", Casts.numeric).toString === "42.000000000")
    assert(conv("1" * 30, Casts.numeric) === null) // 30 integer digits > (38,9)
    assert(conv("junk", Casts.numeric) === null)
  }

  test("pg timestamptz: three-format fallback") {
    // hour-only zone abbreviation (pg_dump's usual output)
    assert(gotTs(conv("2019-10-29 05:30:00+10", PgCasts.timestampTz(_)))
      === ts("2019-10-28T19:30:00Z"))
    // hour:minute zone
    assert(gotTs(conv("2019-10-29 05:30:00+05:30", PgCasts.timestampTz(_)))
      === ts("2019-10-29T00:00:00Z"))
    // naive, interpreted in the dump's session zone
    assert(gotTs(conv("2019-10-29 05:30:00", PgCasts.timestampTz(_, "Asia/Kolkata")))
      === ts("2019-10-29T00:00:00Z"))
    assert(gotTs(conv("2019-10-29 05:30:00", PgCasts.timestampTz(_)))
      === ts("2019-10-29T05:30:00Z"))
    // fractional seconds beyond micros are truncated
    assert(gotTs(conv("2019-10-29 05:30:00.123456789+10", PgCasts.timestampTz(_)))
      === ts("2019-10-28T19:30:00.123456Z"))
    assert(conv("junk", PgCasts.timestampTz(_)) === null)
  }

  test("pg timestamp (no tz): naive stored as UTC") {
    assert(gotTs(conv("2019-10-29 05:30:00", PgCasts.timestampNoTz))
      === ts("2019-10-29T05:30:00Z"))
  }

  private def pgArr(v: String, sp: SpType, srcTy: String = ""): Seq[Any] = {
    val r = conv(v, c => PgCasts.array(sp, srcTy, c))
    if (r == null) null else r.asInstanceOf[scala.collection.Seq[Any]].toSeq
  }

  test("pg array: per-type element conversion with NULL elements") {
    assert(pgArr("{true,false,NULL}", SpType(SpScalar.Bool))
      === Seq(true, false, null))
    assert(pgArr("{NULL,1,2,3}", SpType(SpScalar.Int64)) === Seq(null, 1L, 2L, 3L))
    assert(pgArr("{1.1,NULL,2.2,3.3}", SpType(SpScalar.Float64))
      === Seq(1.1, null, 2.2, 3.3))
    assert(pgArr("{2019-10-29,NULL,2019-10-28}", SpType(SpScalar.Date))
      .map(d => if (d == null) null else d.toString)
      === Seq("2019-10-29", null, "2019-10-28"))
  }

  test("pg array: quoted elements, escaped quotes, literal NULL string") {
    assert(pgArr("""{1,NULL,3,"NULL"}""", SpType(SpScalar.StringMax))
      === Seq("1", null, "3", "NULL"))
    assert(pgArr("""{"a,b","q\"x",plain}""", SpType(SpScalar.StringMax))
      === Seq("a,b", "q\"x", "plain"))
    val bytes = pgArr("""{"\\x0001beef",NULL}""", SpType(SpScalar.BytesMax))
    assert(bytes(0).asInstanceOf[Array[Byte]].toSeq
      === Seq[Byte](0x0, 0x1, 0xbe.toByte, 0xef.toByte))
    assert(bytes(1) === null)
    val t = pgArr("""{"2019-10-29 05:30:00+10",NULL}""",
      SpType(SpScalar.Timestamp), "timestamptz")
    assert(gotTs(t(0)) === ts("2019-10-28T19:30:00Z"))
    assert(t(1) === null)
  }

  test("pg array: empty and malformed") {
    assert(pgArr("{}", SpType(SpScalar.StringMax)) === Seq())
    assert(pgArr("1,2,3", SpType(SpScalar.Int64)) === null) // no braces
  }

  // --------------------------------------------------------------- mysql
  test("mysql bool: ParseBool else tinyint in [-128,127]") {
    assert(conv("true", MySqlCasts.bool) === true)
    assert(conv("5", MySqlCasts.bool) === true)
    assert(conv("-12", MySqlCasts.bool) === true)
    assert(conv("0", MySqlCasts.bool) === false)
    assert(conv("130", MySqlCasts.bool) === null)  // out of tinyint range
    assert(conv("junk", MySqlCasts.bool) === null)
  }

  test("mysql bytes: raw string bytes") {
    assert(conv("ab", MySqlCasts.bytes).asInstanceOf[Array[Byte]].toSeq
      === "ab".getBytes("UTF-8").toSeq)
  }

  test("mysql timestamp: session offset applied; datetime naive") {
    assert(gotTs(conv("2019-10-29 05:30:00", MySqlCasts.timestampWithOffset(_, "+05:30")))
      === ts("2019-10-29T00:00:00Z"))
    assert(gotTs(conv("2019-10-29 05:30:00", MySqlCasts.timestampWithOffset(_, "")))
      === ts("2019-10-29T05:30:00Z"))
    assert(gotTs(conv("2019-10-29 05:30:00", MySqlCasts.datetime))
      === ts("2019-10-29T05:30:00Z"))
  }

  test("mysql SET -> ARRAY<STRING>") {
    val r = conv("a,b,c", MySqlCasts.setArray)
      .asInstanceOf[scala.collection.Seq[Any]].toSeq
    assert(r === Seq("a", "b", "c"))
    assert(conv("", MySqlCasts.setArray)
      .asInstanceOf[scala.collection.Seq[Any]].isEmpty)
  }

  test("failure flag feeds the quarantine split") {
    import spark.implicits._
    val df = Seq("42", "junk", null).toDF("a")
    val out = df.select(col("a"), Casts.int64(col("a")).as("v"))
      .select(Casts.failed(col("a"), col("v")).as("bad"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out === Seq(false, true, false))
  }
}
