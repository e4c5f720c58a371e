package graft.sources.dynamodb.aws

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import software.amazon.awssdk.auth.credentials.{AwsBasicCredentials, StaticCredentialsProvider}
import software.amazon.awssdk.regions.Region
import software.amazon.awssdk.services.dynamodb.DynamoDbClient
import software.amazon.awssdk.services.dynamodb.model._

/** Env-gated DynamoDB integration against dynamodb-local: create a
  * table + GSI, put typed items, then run the engine's control-plane
  * discovery and sampling inference through the live SDK client.
  * Without GRAFT_DYNAMO_ENDPOINT (e.g. http://localhost:8000) the test
  * is CANCELED — same gating posture as the reference's testing/ suite.
  */
class AwsDynamoIntegrationSpec extends AnyFunSuite {

  private def gate(): Unit = assume(sys.env.contains("GRAFT_DYNAMO_ENDPOINT"),
    "set GRAFT_DYNAMO_ENDPOINT to a dynamodb-local endpoint")

  test("discover + infer a live table through the SDK control plane") {
    gate()
    val client = DynamoDbClient.builder()
      .endpointOverride(java.net.URI.create(sys.env("GRAFT_DYNAMO_ENDPOINT")))
      .region(Region.US_EAST_1)
      .credentialsProvider(StaticCredentialsProvider.create(
        AwsBasicCredentials.create("local", "local")))
      .build()
    val table = s"graft_it_${System.currentTimeMillis() % 1000000}"
    client.createTable(CreateTableRequest.builder()
      .tableName(table)
      .attributeDefinitions(
        AttributeDefinition.builder().attributeName("pk").attributeType(ScalarAttributeType.S).build(),
        AttributeDefinition.builder().attributeName("sk").attributeType(ScalarAttributeType.N).build(),
        AttributeDefinition.builder().attributeName("g1").attributeType(ScalarAttributeType.S).build())
      .keySchema(
        KeySchemaElement.builder().attributeName("pk").keyType(KeyType.HASH).build(),
        KeySchemaElement.builder().attributeName("sk").keyType(KeyType.RANGE).build())
      .globalSecondaryIndexes(GlobalSecondaryIndex.builder()
        .indexName("by_g1")
        .keySchema(KeySchemaElement.builder().attributeName("g1").keyType(KeyType.HASH).build())
        .projection(Projection.builder().projectionType(ProjectionType.ALL).build())
        .provisionedThroughput(ProvisionedThroughput.builder()
          .readCapacityUnits(5L).writeCapacityUnits(5L).build())
        .build())
      .provisionedThroughput(ProvisionedThroughput.builder()
        .readCapacityUnits(5L).writeCapacityUnits(5L).build())
      .build())
    try {
      (1 to 5).foreach { i =>
        client.putItem(PutItemRequest.builder().tableName(table)
          .item(Map(
            "pk" -> AttributeValue.builder().s(s"p$i").build(),
            "sk" -> AttributeValue.builder().n(i.toString).build(),
            "g1" -> AttributeValue.builder().s(s"g${i % 2}").build(),
            "flag" -> AttributeValue.builder().bool(i % 2 == 0).build(),
            "tags" -> AttributeValue.builder().ss(Seq("a", "b").asJava).build()).asJava)
          .build())
      }
      val cp = new AwsDynamoControlPlane(client)
      val names = graft.sources.dynamodb.DynamoControlPlane.listTables(cp)
      assert(names.contains(table))
      val (meta, gsis) = graft.sources.dynamodb.DynamoControlPlane.discover(cp, table)
      assert(meta.partitionKey === "pk" && meta.sortKey === Some("sk"))
      assert(gsis.map(_.name) === Seq("by_g1"))
      // live items → DynamoDB JSON → the engine's sampling inference
      val spark = graft.GraftSession.build("graft-dynamo-it")
      import spark.implicits._
      val items = AwsDynamoControlPlane.scanJsonItems(client, table).toSeq.toDS()
      val inferred = graft.sources.dynamodb.DynamoInfer.inferTable(items, meta)
      assert(inferred.colDefs("pk").tpe.name === "String")
      assert(inferred.colDefs("sk").tpe.name === "Number")
      assert(inferred.colDefs("flag").tpe.name === "Bool")
      assert(inferred.colDefs("tags").tpe.name === "StringSet")
    } finally client.deleteTable(
      DeleteTableRequest.builder().tableName(table).build())
  }

  test("S12 data plane: segment scan drains a live table exactly-once") {
    gate()
    val endpoint = sys.env("GRAFT_DYNAMO_ENDPOINT")
    val client = DynamoDbClient.builder()
      .endpointOverride(java.net.URI.create(endpoint))
      .region(Region.US_EAST_1)
      .credentialsProvider(StaticCredentialsProvider.create(
        AwsBasicCredentials.create("local", "local")))
      .build()
    val table = s"graft_scan_${System.currentTimeMillis() % 1000000}"
    client.createTable(CreateTableRequest.builder()
      .tableName(table)
      .attributeDefinitions(
        AttributeDefinition.builder().attributeName("pk").attributeType(ScalarAttributeType.S).build())
      .keySchema(
        KeySchemaElement.builder().attributeName("pk").keyType(KeyType.HASH).build())
      .provisionedThroughput(ProvisionedThroughput.builder()
        .readCapacityUnits(5L).writeCapacityUnits(5L).build())
      .build())
    try {
      (1 to 25).foreach { i =>
        client.putItem(PutItemRequest.builder().tableName(table)
          .item(Map(
            "pk" -> AttributeValue.builder().s(s"k$i").build(),
            "v" -> AttributeValue.builder().n(i.toString).build()).asJava)
          .build())
      }
      val spark = graft.GraftSession.build("graft-dynamo-it")
      // pageLimit=2 forces ExclusiveStartKey pagination inside every
      // segment; 4 segments exercise the parallel-Scan partitioning
      val scan = new AwsDynamoScanClient(endpoint = Some(endpoint),
        staticTestCreds = true, pageLimit = Some(2))
      val items = graft.sources.dynamodb.DynamoScan
        .items(spark, scan, table, totalSegments = 4)
        .collect()
      assert(items.length === 25, "every item exactly once across segments")
      val pks = items.map { j =>
        val m = """"pk":\{"S":"([^"]+)"\}""".r
        m.findFirstMatchIn(j).map(_.group(1)).getOrElse(sys.error(s"no pk in $j"))
      }
      assert(pks.toSet === (1 to 25).map(i => s"k$i").toSet)
    } finally client.deleteTable(
      DeleteTableRequest.builder().tableName(table).build())
  }

  test("cursor round-trip: itemJson → parseKey preserves scalar keys") {
    // no endpoint needed — pure serialization contract of the seam
    val key = Map(
      "pk" -> AttributeValue.builder().s("a\"b\\c\nd").build(),
      "sk" -> AttributeValue.builder().n("42").build(),
      "bk" -> AttributeValue.builder().b(
        software.amazon.awssdk.core.SdkBytes.fromByteArray(
          Array[Byte](1, 2, 0xFF.toByte))).build())
    val json = AwsDynamoControlPlane.itemJson(key.asJava)
    val back = AwsDynamoScanClient.parseKey(json)
    assert(back("pk").s() === "a\"b\\c\nd")
    assert(back("sk").n() === "42")
    assert(back("bk").b().asByteArray().toSeq === Seq[Byte](1, 2, 0xFF.toByte))
    intercept[IllegalArgumentException] {
      AwsDynamoScanClient.parseKey("""{"x":{"SS":["a"]}}""")
    }
  }
}
