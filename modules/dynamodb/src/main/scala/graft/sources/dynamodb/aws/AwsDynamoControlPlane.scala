package graft.sources.dynamodb.aws

import scala.jdk.CollectionConverters._
import software.amazon.awssdk.services.dynamodb.DynamoDbClient
import software.amazon.awssdk.services.dynamodb.model.{
  AttributeValue, DescribeTableRequest, KeySchemaElement, KeyType,
  ListTablesRequest, ScanRequest}
import graft.sources.dynamodb.DynamoControlPlane

/** AWS SDK v2 implementation of the S10 DynamoDB control-plane seam
  * (OPTIONAL MODULE — compiled only with GRAFT_WITH_AWS_DYNAMO=1; see
  * modules/README.md). Reference: dynamodb/schema.go:78-142 against the
  * v1 SDK — same pagination contract (ListTables pages at 100 names),
  * same DescribeTable projection (partition key, sort key, GSIs).
  *
  * The inference/conversion pipeline consumes only the
  * [[DynamoControlPlane]] trait plus DynamoDB-JSON item strings, so
  * this class plus [[AwsDynamoControlPlane.scanJsonItems]] is the whole
  * live wiring: control-plane calls stay on the driver, item JSON goes
  * through `spark.createDataset` (small tables) or an S3 export read
  * (the 100 TB path — a table export shreds into parquet/JSON files
  * that executors read directly, no Scan API in the dataflow).
  */
final class AwsDynamoControlPlane(client: DynamoDbClient)
    extends DynamoControlPlane {

  override def listTablesPage(
      exclusiveStart: Option[String]): (Seq[String], Option[String]) = {
    val b = ListTablesRequest.builder().limit(100)
    exclusiveStart.foreach(b.exclusiveStartTableName)
    val resp = client.listTables(b.build())
    (resp.tableNames().asScala.toSeq, Option(resp.lastEvaluatedTableName()))
  }

  override def describeTable(name: String): DynamoControlPlane.TableDescription = {
    val t = client.describeTable(
      DescribeTableRequest.builder().tableName(name).build()).table()
    val gsis = Option(t.globalSecondaryIndexes())
      .map(_.asScala.toSeq).getOrElse(Nil)
      .map(g => (g.indexName(), orderedKeys(g.keySchema().asScala.toSeq)))
    DynamoControlPlane.TableDescription(
      t.tableName(), orderedKeys(t.keySchema().asScala.toSeq), gsis)
  }

  /** Partition (HASH) key first, sort (RANGE) key second. */
  private def orderedKeys(ks: Seq[KeySchemaElement]): Seq[String] =
    ks.sortBy(k => if (k.keyType() == KeyType.HASH) 0 else 1)
      .map(_.attributeName())
}

object AwsDynamoControlPlane {

  /** S11/S12 live read for modest tables: paginated Scan → one
    * DynamoDB-JSON line per item (the wire format DynamoInfer consumes).
    * Driver-side by design — at export scale use the S3 table-export
    * files as the item source instead. */
  def scanJsonItems(client: DynamoDbClient, table: String): Iterator[String] =
    client.scanPaginator(ScanRequest.builder().tableName(table).build())
      .items().iterator().asScala.map(itemJson)

  /** AttributeValue map → DynamoDB JSON (`{"a":{"S":"x"},...}`),
    * matching the encoding of DynamoDB table exports. */
  def itemJson(item: java.util.Map[String, AttributeValue]): String =
    item.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}:${attrJson(v)}" }
      .mkString("{", ",", "}")

  private def attrJson(v: AttributeValue): String =
    if (v.s() != null) s"""{"S":${q(v.s())}}"""
    else if (v.n() != null) s"""{"N":${q(v.n())}}"""
    else if (v.bool() != null) s"""{"BOOL":${v.bool()}}"""
    else if (v.nul() != null && v.nul()) """{"NULL":true}"""
    else if (v.b() != null)
      s"""{"B":${q(java.util.Base64.getEncoder.encodeToString(v.b().asByteArray()))}}"""
    else if (v.hasSs()) s"""{"SS":${arr(v.ss().asScala.map(q))}}"""
    else if (v.hasNs()) s"""{"NS":${arr(v.ns().asScala.map(q))}}"""
    else if (v.hasBs())
      s"""{"BS":${arr(v.bs().asScala.map(b =>
        q(java.util.Base64.getEncoder.encodeToString(b.asByteArray()))))}}"""
    else if (v.hasL()) s"""{"L":${arr(v.l().asScala.map(attrJson))}}"""
    else if (v.hasM())
      s"""{"M":${v.m().asScala.toSeq.sortBy(_._1)
        .map { case (k, x) => s"${q(k)}:${attrJson(x)}" }
        .mkString("{", ",", "}")}}"""
    else """{"NULL":true}"""

  private def arr(xs: Iterable[String]): String = xs.mkString("[", ",", "]")

  /** JSON string escape: quote, backslash, control chars. */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""
}
