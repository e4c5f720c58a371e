package graft.sources.dynamodb

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.types.DynamoTypeMapper

/** DynamoDB inference + conversion tests (reference contract:
  * dynamodb/schema_test.go, dynamodb/data_test.go, toddl_test.go). */
class DynamoInferSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  import DynamoInfer._

  test("control plane: paginated ListTables + DescribeTable drive inference") {
    import spark.implicits._
    // in-memory fake client standing where the AWS SDK impl would
    // (reference mock: dynamodb/schema_test.go), with 2-name pages
    val gsi = Seq("by_qty" -> Seq("qty"))
    val fake = new DynamoControlPlane {
      private val all = Seq("alpha", "beta", "gamma")
      def listTablesPage(start: Option[String]) = {
        val from = start.map(s => all.indexOf(s) + 1).getOrElse(0)
        val page = all.slice(from, from + 2)
        (page, if (from + 2 < all.length) Some(page.last) else None)
      }
      def describeTable(name: String) =
        DynamoControlPlane.TableDescription(name, Seq("id", "sk"),
          if (name == "beta") gsi else Nil)
    }
    assert(DynamoControlPlane.listTables(fake) === Seq("alpha", "beta", "gamma"))

    val items = Seq(
      """{"id": {"S": "a"}, "sk": {"N": "1"}, "qty": {"N": "5"}}""",
      """{"id": {"S": "b"}, "sk": {"N": "2"}, "qty": {"N": "7"}}""").toDS()
    val tables = DynamoControlPlane.inferAll(spark, fake, _ => items)
    assert(tables.map(_.name) === Seq("alpha", "beta", "gamma"))
    val beta = tables(1)
    assert(beta.primaryKeys === Seq(graft.schema.SrcKey("id"),
      graft.schema.SrcKey("sk")))
    assert(beta.indexes.map(_.name) === Seq("by_qty"))
    assert(beta.colDefs("qty").tpe.name === "Number")
  }

  test("numericParsable: Spanner NUMERIC(38,9) bounds") {
    assert(numericParsable("1234.5"))
    assert(numericParsable("-0.999999999"))
    assert(numericParsable("1" + "0" * 28)) // 29 int digits
    assert(!numericParsable("1" + "0" * 29)) // 30 int digits
    assert(!numericParsable("0.0000000001")) // 10 decimal digits
    assert(numericParsable("0.1000000000")) // trailing zeros strip
    assert(!numericParsable("abc"))
  }

  test("histogram thresholds: noise dropped, conflicts → String, nullable") {
    val meta = TableMeta("t", "id")
    val rows = 10000L
    val hist = Seq(
      ("id", "String", 10000L),
      // 9 bad values in 10k = 0.09% < errThreshold → noise, ignored
      ("qty", "Number", 9991L), ("qty", "String", 9L),
      // 30% vs 70% split: both above conflict threshold → String
      ("mixed", "Number", 7000L), ("mixed", "String", 3000L),
      // present in only half the rows → nullable
      ("opt", "Bool", 5000L),
      // 4% minority below conflictThreshold of presentRows → majority wins
      ("mostly", "Number", 9600L), ("mostly", "Bool", 400L))
    val t = inferFromHistogram(hist, rows, meta)
    assert(t.colDefs("id").tpe.name === "String")
    assert(t.colDefs("id").notNull) // PK never nullable
    assert(t.colDefs("qty").tpe.name === "Number")
    assert(t.colDefs("qty").notNull) // 0.09% absent < errThreshold
    assert(t.colDefs("mixed").tpe.name === "String")
    assert(t.colDefs("opt").tpe.name === "Bool")
    assert(!t.colDefs("opt").notNull)
    assert(t.colDefs("mostly").tpe.name === "Number")
    assert(t.primaryKeys.map(_.column) === Seq("id"))
  }

  test("distributed inference over DynamoDB-JSON items") {
    import spark.implicits._
    val items = Seq(
      """{"id": {"S": "a"}, "n": {"N": "1.5"}, "tags": {"SS": ["x","y"]}}""",
      """{"id": {"S": "b"}, "n": {"N": "2"}, "doc": {"M": {"k": {"N": "1"}}}}""",
      """{"id": {"S": "c"}, "n": {"N": "99"}, "tags": {"SS": ["z"]}}"""
    ).toDS
    val t = inferTable(items, TableMeta("t", "id"))
    assert(t.colDefs("id").tpe.name === "String")
    assert(t.colDefs("n").tpe.name === "Number")
    assert(t.colDefs("tags").tpe.name === "StringSet")
    assert(!t.colDefs("tags").notNull) // absent in 1/3 of rows
    assert(t.colDefs("doc").tpe.name === "Map")
    // toddl: sets become arrays
    assert(DynamoTypeMapper.toSpanner(t.colDefs("tags").tpe)._1.render
      === "ARRAY<STRING(MAX)>")
    assert(DynamoTypeMapper.toSpanner(t.colDefs("n").tpe)._1.render
      === "NUMERIC")
  }

  test("conversion: typed values, stripped JSON, base64 binary, quarantine") {
    import spark.implicits._
    val items = Seq(
      """{"id": {"S": "a"}, "n": {"N": "1.5"}, "ok": {"BOOL": true},
          "bin": {"B": "aGk="}, "lst": {"L": [{"N": "1"}, {"S": "x"}]},
          "doc": {"M": {"k": {"S": "v"}, "nested": {"L": [{"BOOL": false}]}}},
          "ns": {"NS": ["1", "2.5"]}}""".replaceAll("\n\\s*", " "),
      """{"n": {"N": "7"}, "ok": {"BOOL": false}}""" // missing PK → quarantine
    ).toDS
    val src = inferFromHistogram(Seq(
      ("id", "String", 2), ("n", "Number", 2), ("ok", "Bool", 2),
      ("bin", "Binary", 2), ("lst", "List", 2), ("doc", "Map", 2),
      ("ns", "NumberSet", 2)), 2, TableMeta("t", "id"))
    val (good, bad) = convert(spark, items, src)
    assert(bad.count() === 1)
    val r = good.collect().head
    assert(r.getString(r.fieldIndex("id")) === "a")
    assert(r.getDecimal(r.fieldIndex("n")).toPlainString === "1.500000000")
    assert(r.getBoolean(r.fieldIndex("ok")))
    assert(r.getAs[Array[Byte]]("bin").toSeq === "hi".getBytes.toSeq)
    // union wrappers stripped; N keeps its string form, exactly as the
    // reference's stripNull returns *a.N (data.go:229-230)
    assert(r.getString(r.fieldIndex("lst")) === """["1","x"]""")
    assert(r.getString(r.fieldIndex("doc")) === """{"k":"v","nested":[false]}""")
    assert(r.getSeq[java.math.BigDecimal](r.fieldIndex("ns")).map(_.toPlainString)
      === Seq("1.000000000", "2.500000000"))
  }
}
