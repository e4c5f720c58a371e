package graft.sources.dynamodb.aws

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.auth.credentials.{AwsBasicCredentials, StaticCredentialsProvider}
import software.amazon.awssdk.regions.Region
import software.amazon.awssdk.services.dynamodb.DynamoDbClient
import software.amazon.awssdk.services.dynamodb.model.{AttributeValue, ScanRequest}

import graft.sources.dynamodb.DynamoScan

/** AWS SDK v2 implementation of the S12 segment-scan data-plane seam
  * ([[DynamoScan.Client]]) — the live counterpart of the in-memory fake
  * DynamoScanSpec drives, completing the pattern the control plane
  * (AwsDynamoControlPlane) and the Spanner sink already follow.
  * Reference: dynamodb/data.go:64-91 (v1 SDK, one serial segment); here
  * each Spark task owns one `Segment` of a parallel Scan and drains it
  * with `ExclusiveStartKey` pagination.
  *
  * Serialization contract: the class ships CONFIG (endpoint, region,
  * static test credentials) to executors and opens the SDK client
  * lazily per JVM — `DynamoDbClient` itself is not serializable and
  * must never be constructed on the driver for executor use. With no
  * explicit config the SDK's default provider chain applies (env vars,
  * instance profile — the posture of a real cluster).
  *
  * The page cursor crosses the seam as a DynamoDB-JSON object (the same
  * encoding [[AwsDynamoControlPlane.itemJson]] uses for items), parsed
  * back with [[AwsDynamoScanClient.parseKey]]. Key attributes are
  * scalar by DynamoDB's own contract, so the parser accepts exactly
  * S / N / B and refuses anything else loudly.
  */
final class AwsDynamoScanClient(
    endpoint: Option[String] = None,
    region: String = "us-east-1",
    staticTestCreds: Boolean = false,
    pageLimit: Option[Int] = None) extends DynamoScan.Client {

  @transient private lazy val client: DynamoDbClient = {
    val b = DynamoDbClient.builder().region(Region.of(region))
    endpoint.foreach(e => b.endpointOverride(java.net.URI.create(e)))
    if (staticTestCreds)
      b.credentialsProvider(StaticCredentialsProvider.create(
        AwsBasicCredentials.create("local", "local")))
    b.build()
  }

  override def scanPage(table: String, segment: Int, totalSegments: Int,
      exclusiveStartKey: Option[String]): (Seq[String], Option[String]) = {
    val b = ScanRequest.builder()
      .tableName(table)
      .segment(segment)
      .totalSegments(totalSegments)
    pageLimit.foreach(l => b.limit(l))
    exclusiveStartKey.foreach(k =>
      b.exclusiveStartKey(AwsDynamoScanClient.parseKey(k).asJava))
    val resp = client.scan(b.build())
    val items = resp.items().asScala.toSeq
      .map(AwsDynamoControlPlane.itemJson)
    val next =
      if (resp.hasLastEvaluatedKey && !resp.lastEvaluatedKey().isEmpty)
        Some(AwsDynamoControlPlane.itemJson(resp.lastEvaluatedKey()))
      else None
    (items, next)
  }
}

object AwsDynamoScanClient {

  /** DynamoDB-JSON key object → AttributeValue map. Accepts the scalar
    * key types only (S, N, B) — LastEvaluatedKey is built from key
    * attributes, which DynamoDB restricts to scalars. */
  def parseKey(json: String): Map[String, AttributeValue] =
    new KeyParser(json).parseObject()

  /** Minimal recursive-descent parser for the flat two-level object
    * itemJson emits for keys: {"attr":{"S":"v"},...}. */
  private final class KeyParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      require(i < s.length && s.charAt(i) == c,
        s"cursor parse: expected '$c' at $i in $s")
      i += 1
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case x => sb.append(x)
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }

    /** Parses {"name": <scalar-attr>, ...}. */
    def parseObject(): Map[String, AttributeValue] = {
      val out = Map.newBuilder[String, AttributeValue]
      expect('{')
      ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return out.result() }
      var done = false
      while (!done) {
        val name = string()
        expect(':')
        out += name -> attr()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1 else done = true
      }
      expect('}')
      out.result()
    }

    private def attr(): AttributeValue = {
      expect('{')
      val tpe = string()
      expect(':')
      val v = tpe match {
        case "S" => AttributeValue.builder().s(string()).build()
        case "N" => AttributeValue.builder().n(string()).build()
        case "B" => AttributeValue.builder().b(
          software.amazon.awssdk.core.SdkBytes.fromByteArray(
            java.util.Base64.getDecoder.decode(string()))).build()
        case other => throw new IllegalArgumentException(
          s"cursor parse: non-scalar key type '$other' in $s")
      }
      expect('}')
      v
    }
  }
}
