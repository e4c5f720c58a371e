package graft.sources.dynamodb

import graft.schema.{SourceTable, SrcIndex, SrcKey}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.SparkSession

/** S10: the DynamoDB control plane as an explicit seam (reference:
  * dynamodb/schema.go:59-142 — `dynamoClient` interface + listTables /
  * analyzeMetadata over ListTables/DescribeTable).
  *
  * The reference injects a `dynamoClient` interface and tests with a
  * mock (dynamodb/schema_test.go); the AWS SDK implementation is one
  * `DynamoDB.New(session)` away. Same here: implement this trait with
  * the AWS SDK v2 client to go live — the sandbox has no AWS, so the
  * shipped implementations are the in-memory fake (tests) and whatever
  * the caller wires. Everything downstream (inference, conversion,
  * migration) consumes only this trait plus an item `Dataset[String]`,
  * so the control plane stays a driver-side detail, never part of the
  * distributed dataflow.
  */
trait DynamoControlPlane {

  /** One ListTables page: (names, lastEvaluatedTableName). The AWS API
    * pages at 100 names (dynamodb/schema.go:78-95). */
  def listTablesPage(exclusiveStart: Option[String]): (Seq[String], Option[String])

  /** DescribeTable: key schema (partition key, then optional sort key)
    * and global secondary indexes (dynamodb/schema.go:117-142). */
  def describeTable(name: String): DynamoControlPlane.TableDescription
}

object DynamoControlPlane {

  /** The DescribeTable subset the schema pass consumes. */
  final case class TableDescription(
      name: String,
      keySchema: Seq[String], // partition key first, sort key second
      globalSecondaryIndexes: Seq[(String, Seq[String])] = Nil)

  /** Drain ListTables pagination (reference listTables loop). */
  def listTables(client: DynamoControlPlane): Seq[String] = {
    val out = Seq.newBuilder[String]
    var cursor: Option[String] = None
    var first = true
    while (first || cursor.nonEmpty) {
      first = false
      val (names, next) = client.listTablesPage(cursor)
      out ++= names
      cursor = next
    }
    out.result()
  }

  /** DescribeTable → the sampling pass's TableMeta + GSI indexes. */
  def discover(client: DynamoControlPlane,
      table: String): (DynamoInfer.TableMeta, Seq[SrcIndex]) = {
    val d = client.describeTable(table)
    require(d.keySchema.nonEmpty, s"table $table has no key schema")
    val meta = DynamoInfer.TableMeta(d.name, d.keySchema.head,
      d.keySchema.lift(1))
    val ixs = d.globalSecondaryIndexes.map { case (name, keys) =>
      SrcIndex(name, unique = false, keys.map(SrcKey(_)))
    }
    (meta, ixs)
  }

  /** The reference's whole control-plane schema pass (processTable,
    * dynamodb/schema.go:98-115): every table via ListTables, metadata
    * via DescribeTable, types inferred from a sampled item scan.
    * `itemsFor` supplies each table's DynamoDB-JSON items (S3 export
    * path, connector read, or test literals). */
  def inferAll(spark: SparkSession, client: DynamoControlPlane,
      itemsFor: String => Dataset[String],
      sampleSize: Long = DynamoInfer.DefaultSampleSize): Seq[SourceTable] =
    listTables(client).map { t =>
      val (meta, ixs) = discover(client, t)
      DynamoInfer.inferTable(itemsFor(t), meta, sampleSize)
        .copy(indexes = ixs)
    }
}
