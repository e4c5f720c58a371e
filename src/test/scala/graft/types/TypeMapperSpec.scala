package graft.types

import org.scalatest.funsuite.AnyFunSuite
import SpScalar._
import SpLen._

/** Dialect type-mapping tables, mirroring the reference's semantics spec
  * (postgres/toddl.go:107-163, mysql/toddl.go:114-168,
  * dynamodb/toddl.go:76-95 and their *_test.go smoke tests). */
class TypeMapperSpec extends AnyFunSuite {

  private def pg(name: String, mods: Seq[Long] = Nil, ab: Int = 0) =
    PostgresTypeMapper.toSpanner(SrcType(name, mods, ab))
  private def my(name: String, mods: Seq[Long] = Nil, ab: Int = 0) =
    MySqlTypeMapper.toSpanner(SrcType(name, mods, ab))
  private def dy(name: String) = DynamoTypeMapper.toSpanner(SrcType(name))

  // ------------------------------------------------------------ postgres
  test("postgres scalar mappings") {
    val cases: Seq[(SrcType, SpType, Seq[Issue])] = Seq(
      (SrcType("bool"), SpType(Bool), Nil),
      (SrcType("boolean"), SpType(Bool), Nil),
      (SrcType("bigserial"), SpType(Int64), Seq(Issue.Serial)),
      (SrcType("serial"), SpType(Int64), Seq(Issue.Serial)),
      (SrcType("bpchar", Seq(42)), SpType(SpString(Fixed(42))), Nil),
      (SrcType("bpchar"), SpType(SpString(Fixed(1))), Nil), // no mod = char(1)
      (SrcType("character", Seq(6)), SpType(SpString(Fixed(6))), Nil),
      (SrcType("bytea"), SpType(BytesMax), Nil),
      (SrcType("date"), SpType(Date), Nil),
      (SrcType("float8"), SpType(Float64), Nil),
      (SrcType("double precision"), SpType(Float64), Nil),
      (SrcType("float4"), SpType(Float64), Seq(Issue.Widened)),
      (SrcType("real"), SpType(Float64), Seq(Issue.Widened)),
      (SrcType("int8"), SpType(Int64), Nil),
      (SrcType("bigint"), SpType(Int64), Nil),
      (SrcType("int4"), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("integer"), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("int2"), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("smallint"), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("numeric"), SpType(Numeric), Nil),
      (SrcType("numeric", Seq(6, 4)), SpType(Numeric), Nil),
      (SrcType("text"), SpType(StringMax), Nil),
      (SrcType("timestamptz"), SpType(Timestamp), Nil),
      (SrcType("timestamp with time zone"), SpType(Timestamp), Nil),
      (SrcType("timestamp"), SpType(Timestamp), Seq(Issue.TimestampNoZone)),
      (SrcType("timestamp without time zone"), SpType(Timestamp), Seq(Issue.TimestampNoZone)),
      (SrcType("varchar", Seq(6)), SpType(SpString(Fixed(6))), Nil),
      (SrcType("varchar"), SpType(SpString(Max)), Nil),
      (SrcType("character varying"), SpType(SpString(Max)), Nil),
      (SrcType("path"), SpType(StringMax), Seq(Issue.NoGoodType)),
      (SrcType("circle"), SpType(StringMax), Seq(Issue.NoGoodType)),
    )
    for ((src, ty, issues) <- cases) {
      assert(pg(src.name, src.mods, src.arrayBounds) === ((ty, issues)),
        s"for ${src.print}")
    }
  }

  test("postgres 1-D arrays become ARRAY<T>") {
    assert(pg("int8", ab = 1) === ((SpType(Int64, isArray = true), Nil)))
    assert(pg("text", ab = 1) === ((SpType(StringMax, isArray = true), Nil)))
    assert(pg("float4", ab = 1) ===
      ((SpType(Float64, isArray = true), Seq(Issue.Widened))))
  }

  test("multi-dimensional arrays collapse to STRING(MAX) keeping scalar issues") {
    // reference appends MultiDimensionalArray to the scalar issues
    assert(pg("int8", ab = 2) ===
      ((SpType(StringMax), Seq(Issue.MultiDimensionalArray))))
    assert(pg("serial", ab = 2) ===
      ((SpType(StringMax), Seq(Issue.Serial, Issue.MultiDimensionalArray))))
  }

  // --------------------------------------------------------------- mysql
  test("mysql scalar mappings") {
    val cases: Seq[(SrcType, SpType, Seq[Issue])] = Seq(
      (SrcType("bool"), SpType(Bool), Nil),
      (SrcType("tinyint", Seq(1)), SpType(Bool), Nil), // tinyint(1) = bool
      (SrcType("tinyint", Seq(4)), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("tinyint"), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("double"), SpType(Float64), Nil),
      (SrcType("float"), SpType(Float64), Seq(Issue.Widened)),
      (SrcType("numeric"), SpType(Numeric), Nil),
      (SrcType("decimal", Seq(10, 2)), SpType(Numeric), Nil),
      (SrcType("bigint"), SpType(Int64), Nil),
      (SrcType("smallint"), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("mediumint"), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("int"), SpType(Int64), Seq(Issue.Widened)),
      (SrcType("bit"), SpType(BytesMax), Nil),
      (SrcType("varchar", Seq(30)), SpType(SpString(Fixed(30))), Nil),
      (SrcType("varchar"), SpType(SpString(Max)), Nil),
      (SrcType("char", Seq(5)), SpType(SpString(Fixed(5))), Nil),
      (SrcType("text"), SpType(StringMax), Nil),
      (SrcType("tinytext"), SpType(StringMax), Nil),
      (SrcType("mediumtext"), SpType(StringMax), Nil),
      (SrcType("longtext"), SpType(StringMax), Nil),
      (SrcType("set"), SpType(StringMax), Nil),
      (SrcType("enum"), SpType(StringMax), Nil),
      (SrcType("json"), SpType(StringMax), Nil),
      (SrcType("binary"), SpType(BytesMax), Nil),
      (SrcType("varbinary"), SpType(BytesMax), Nil),
      (SrcType("blob"), SpType(BytesMax), Nil),
      (SrcType("longblob"), SpType(BytesMax), Nil),
      (SrcType("date"), SpType(Date), Nil),
      (SrcType("datetime"), SpType(Timestamp), Seq(Issue.Datetime)),
      (SrcType("timestamp"), SpType(Timestamp), Nil),
      (SrcType("time"), SpType(StringMax), Seq(Issue.Time)),
      (SrcType("year"), SpType(StringMax), Seq(Issue.Time)),
      (SrcType("geometry"), SpType(StringMax), Seq(Issue.NoGoodType)),
    )
    for ((src, ty, issues) <- cases) {
      assert(my(src.name, src.mods, src.arrayBounds) === ((ty, issues)),
        s"for ${src.print}")
    }
  }

  // ------------------------------------------------------------- dynamo
  test("dynamodb inferred-type mappings") {
    val cases: Seq[(String, SpType)] = Seq(
      ("String", SpType(StringMax)),
      ("Number", SpType(Numeric)),
      ("NumberString", SpType(StringMax)),
      ("Bool", SpType(Bool)),
      ("Binary", SpType(BytesMax)),
      ("List", SpType(StringMax)),
      ("Map", SpType(StringMax)),
      ("StringSet", SpType(StringMax, isArray = true)),
      ("BinarySet", SpType(BytesMax, isArray = true)),
      ("NumberSet", SpType(Numeric, isArray = true)),
      ("NumberStringSet", SpType(StringMax, isArray = true)),
    )
    for ((name, ty) <- cases) {
      val (actual, issues) = dy(name)
      assert(actual === ty, s"for $name")
      assert(issues.isEmpty, s"for $name")
    }
    assert(dy("Unknown") === ((SpType(StringMax), Seq(Issue.NoGoodType))))
  }

  // ------------------------------------------------------------- render
  test("DDL type rendering") {
    assert(SpType(SpString(Max)).render === "STRING(MAX)")
    assert(SpType(SpString(Fixed(42))).render === "STRING(42)")
    assert(SpType(SpBytes(Max), isArray = true).render === "ARRAY<BYTES(MAX)>")
    assert(SpType(Numeric).render === "NUMERIC")
  }
}
