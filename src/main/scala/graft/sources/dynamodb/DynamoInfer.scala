package graft.sources.dynamodb

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.schema.{SourceTable, SrcColumn, SrcKey}
import graft.types.SrcType
import scala.jdk.CollectionConverters._

/** DynamoDB source: schema inference by sampling + item conversion
  * (S10–S12, A5, C14; reference: dynamodb/schema.go:144-327,
  * dynamodb/data.go:118-242).
  *
  * Items arrive as DynamoDB-JSON documents — `{"attr": {"S": "x"},
  * "n": {"N": "1.5"}, ...}` — the wire encoding every DynamoDB export
  * (and the AWS SDK) uses, so the pipeline is connector-agnostic: point
  * it at an S3 export, a Spark connector read, or test literals alike.
  *
  * Scale shape: classification is a distributed flatMap over items →
  * `groupBy(attr, type).count` (A5's histogram as a real aggregation,
  * map-side combined); only the tiny (attr × type) count table reaches
  * the driver, where the threshold logic runs. Sampling (S11) is
  * `df.limit(n)` upstream. Conversion (C14) is a per-partition typed
  * mapper producing the inferred StructType.
  */
object DynamoInfer {

  /** Inference thresholds (dynamodb/schema.go:43-44) and sample size
    * default (main.go:55). */
  val ErrThreshold = 0.001
  val ConflictThreshold = 0.05
  val DefaultSampleSize = 100000L

  /** S10 stand-in: table metadata normally fetched via
    * ListTables/DescribeTable — supplied by the caller (control-plane
    * calls happen outside the dataflow). */
  final case class TableMeta(name: String, partitionKey: String,
      sortKey: Option[String] = None)

  // -------------------------------------------------- classification

  /** DynamoDB attribute type tags (dynamodb/schema.go:30-41). */
  private[dynamodb] def classify(attr: JsonNode): Option[String] = {
    val f = attr.properties.asScala.headOption.getOrElse(return None)
    (f.getKey, f.getValue) match {
      case ("S", _)    => Some("String")
      case ("BOOL", _) => Some("Bool")
      case ("N", v)    =>
        Some(if (numericParsable(v.asText)) "Number" else "NumberString")
      case ("B", _)    => Some("Binary")
      case ("NULL", _) => None // absent ⇒ nullable
      case ("L", _)    => Some("List")
      case ("M", _)    => Some("Map")
      case ("SS", _)   => Some("StringSet")
      case ("NS", v)   =>
        val ok = v.elements.asScala.forall(n => numericParsable(n.asText))
        Some(if (ok) "NumberSet" else "NumberStringSet")
      case ("BS", _)   => Some("BinarySet")
      case _           => None
    }
  }

  /** Fits Spanner NUMERIC(38,9): ≤29 digits before the point, ≤9 after
    * (dynamodb/schema.go:298-327). */
  private[dynamodb] def numericParsable(n: String): Boolean =
    try {
      val d = new java.math.BigDecimal(n).stripTrailingZeros
      val scale = math.max(d.scale, 0)
      val intDigits = d.precision - d.scale // digits before the point
      scale <= 9 && intDigits <= 29
    } catch { case _: NumberFormatException => false }

  // ----------------------------------------------------- inference

  /** S11+A5: sample up to `sampleSize` items, build the per-attribute
    * type histogram distributed, apply the threshold logic driver-side. */
  def inferTable(items: Dataset[String], meta: TableMeta,
      sampleSize: Long = DefaultSampleSize): SourceTable = {
    val spark = items.sparkSession
    import spark.implicits._
    val sample = items.limit(math.min(sampleSize, Int.MaxValue).toInt)
    val rows = sample.count()
    val hist = sample.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.flatMap { json =>
        val m = mapper.readTree(json)
        m.properties.asScala.flatMap(e =>
          classify(e.getValue).map(t => (e.getKey, t))).toSeq
      }
    }.toDF("attr", "dtype")
      .groupBy("attr", "dtype").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    inferFromHistogram(hist.toSeq, rows, meta)
  }

  /** The pure threshold logic (dynamodb/schema.go:236-292): drop types
    * under the 0.1% error threshold, keep candidates above the 5%
    * conflict threshold, >1 or 0 candidates → String; nullable when the
    * attribute is absent from >0.1% of rows (PK columns never null). */
  def inferFromHistogram(hist: Seq[(String, String, Long)], rows: Long,
      meta: TableMeta): SourceTable = {
    val pks = Seq(SrcKey(meta.partitionKey)) ++ meta.sortKey.map(SrcKey(_))
    val byAttr = hist.groupBy(_._1)
    // deterministic column order: PKs first, then alphabetical
    val attrs = byAttr.keys.toSeq.sortBy(a =>
      (pks.indexWhere(_.column == a) match {
        case -1 => Int.MaxValue; case i => i
      }, a))
    val cols = attrs.flatMap { attr =>
      val counts = byAttr(attr).map { case (_, t, c) => (t, c) }
      val presentRows = counts.map(_._2).sum
      val kept = counts.filter { case (_, c) => c.toDouble / rows > ErrThreshold }
      if (kept.isEmpty) None
      else {
        val isPk = pks.exists(_.column == attr)
        val nullable = !isPk &&
          (rows - presentRows).toDouble / rows > ErrThreshold
        val candidates = kept.filter { case (_, c) =>
          c.toDouble / presentRows > ConflictThreshold
        }
        val tpe = if (candidates.length == 1) candidates.head._1 else "String"
        Some(SrcColumn(attr, SrcType(tpe), notNull = !nullable))
      }
    }
    SourceTable(meta.name, cols.map(_.name),
      cols.map(c => c.name -> c).toMap, primaryKeys = pks)
  }

  // ---------------------------------------------------- conversion

  /** C14: DynamoDB-JSON items → typed rows per the inferred schema
    * (dynamodb/data.go:118-242). L/M serialize to plain JSON with the
    * AttributeValue union wrappers stripped (stripNull); B/BS are
    * base64 (the DynamoDB JSON binary encoding). Unconvertible values
    * null out; rows where a NOT NULL column nulls out land in the
    * quarantine frame. */
  def convert(spark: SparkSession, items: Dataset[String],
      src: SourceTable): (DataFrame, DataFrame) = {
    val fields = src.colNames.map { c =>
      StructField(c, graft.types.DynamoTypeMapper.toSpanner(
        src.colDefs(c).tpe)._1.sparkType)
    }
    val schema = StructType(fields)
    val colNames = src.colNames
    val colTypes = colNames.map(c => src.colDefs(c).tpe.name)
    val rdd = items.rdd.mapPartitions { it =>
      val mapper = new ObjectMapper() // one per partition, not per row
      it.map { json =>
        val m = mapper.readTree(json)
        Row.fromSeq(colNames.zip(colTypes).map { case (c, t) =>
          Option(m.get(c)).flatMap(v => cvtValue(v, t)).orNull
        })
      }
    }
    val df = spark.createDataFrame(rdd, schema)
    val notNullCols = colNames.filter(c => src.colDefs(c).notNull)
    if (notNullCols.isEmpty) (df, spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema))
    else {
      import org.apache.spark.sql.functions.col
      val bad = notNullCols.map(col(_).isNull).reduce(_ || _)
      (df.filter(!bad), df.filter(bad))
    }
  }

  private[dynamodb] def cvtValue(attr: JsonNode, inferred: String): Option[Any] = {
    val f = attr.properties.asScala.headOption.getOrElse(return None)
    val (tag, v) = (f.getKey, f.getValue)
    (inferred, tag) match {
      case (_, "NULL") => None
      case ("String", "S") => Some(v.asText)
      // conflicted column inferred String: stringify whatever arrived
      case ("String", "N") => Some(v.asText)
      case ("String", "BOOL") => Some(v.asText)
      case ("String", _) => Some(stripNode(attr).toString)
      case ("Bool", "BOOL") => Some(v.asBoolean)
      case ("Number", "N") =>
        try Some(new java.math.BigDecimal(v.asText).setScale(9))
        catch { case _: ArithmeticException | _: NumberFormatException => None }
      case ("NumberString", "N") => Some(v.asText)
      case ("Binary", "B") =>
        try Some(java.util.Base64.getDecoder.decode(v.asText))
        catch { case _: IllegalArgumentException => None }
      case ("List", "L") | ("Map", "M") => Some(stripNode(attr).toString)
      case ("StringSet", "SS") =>
        Some(v.elements.asScala.map(_.asText).toSeq)
      case ("NumberSet", "NS") =>
        val parsed = v.elements.asScala.map { n =>
          try Some(new java.math.BigDecimal(n.asText).setScale(9))
          catch { case _: ArithmeticException | _: NumberFormatException => None }
        }.toSeq
        if (parsed.forall(_.isDefined)) Some(parsed.map(_.get)) else None
      case ("NumberStringSet", "NS") =>
        Some(v.elements.asScala.map(_.asText).toSeq)
      case ("BinarySet", "BS") =>
        try Some(v.elements.asScala.map(e =>
          java.util.Base64.getDecoder.decode(e.asText)).toSeq)
        catch { case _: IllegalArgumentException => None }
      case _ => None // type mismatch vs inferred schema → bad value
    }
  }

  /** stripNull (dynamodb/data.go:210-242): unwrap the AttributeValue
    * union so L/M serialize as natural JSON. */
  private def stripNode(n: JsonNode): JsonNode = {
    val mapper = new ObjectMapper()
    def strip(x: JsonNode): JsonNode =
      if (x.isObject && x.size == 1) {
        val f = x.properties.asScala.head
        f.getKey match {
          case "S" | "N" | "BOOL" | "B" => f.getValue
          case "NULL" => mapper.nullNode
          case "L" | "SS" | "NS" | "BS" =>
            val a = mapper.createArrayNode()
            f.getValue.elements.asScala.foreach(e => a.add(strip(e)))
            a
          case "M" =>
            val o = mapper.createObjectNode()
            f.getValue.properties.asScala.foreach(e =>
              o.set[JsonNode](e.getKey, strip(e.getValue)))
            o
          case _ => x
        }
      } else x
    strip(n)
  }
}
