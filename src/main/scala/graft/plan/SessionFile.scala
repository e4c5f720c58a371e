package graft.plan

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.schema._
import graft.schema.SchemaConverter.ConversionPlan
import graft.types.{Issue, SpType, SrcType}
import scala.jdk.CollectionConverters._

import graft.util.Fs

/** K5/S14: session-file round-trip (reference:
  * conversion/conversion.go:605-657 WriteSessionFile/ReadSessionFile).
  * Serializes the full ConversionPlan so a schema-only run's output can
  * drive a later data-only run. Explicit tree construction keeps the
  * format stable and engine-independent (SpTypes as their DDL render,
  * issues by name). */
object SessionFile {

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- write

  def write(plan: ConversionPlan, path: String,
      c: org.apache.hadoop.conf.Configuration,
      driver: Option[String] = None): Unit = {
    val root = toJson(plan)
    // optional source-driver tag: the web session needs it back on
    // resume (typemap/overview are driver-keyed); the Migrate data-only
    // path takes the driver on the CLI and ignores it
    driver.foreach(root.put("driver", _))
    Fs.writeStringAtomic(path,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root), c)
  }

  /** The driver tag written by [[write]], if the file carries one. */
  def readDriver(path: String,
      c: org.apache.hadoop.conf.Configuration): Option[String] = {
    val root = mapper.readTree(Fs.readString(path, c))
    Option(root.get("driver")).map(_.asText).filter(_.nonEmpty)
  }

  def toJson(plan: ConversionPlan): ObjectNode = {
    val root = mapper.createObjectNode()
    plan.timezone.foreach(root.put("timezone", _))
    val tables = root.putArray("tables")
    // serialize in source order so tableOrder survives the round-trip
    val spToSrc = plan.toSpannerTable.map(_.swap)
    plan.tableOrder.foreach { spName =>
      val srcName = spToSrc(spName)
      val src = plan.srcSchema(srcName)
      val sp = plan.spSchema(spName)
      val colMap = plan.toSpannerCols(srcName)
      val t = tables.addObject()
      t.put("srcName", srcName)
      t.put("spName", spName)
      plan.syntheticPks.get(spName).foreach(t.put("syntheticPk", _))
      sp.parent.foreach(t.put("parent", _))
      val cols = t.putArray("cols")
      // a source column may have no Spanner counterpart (removed via a
      // PlanEdits edit) — such columns simply don't round-trip
      src.colNames.filter(colMap.contains).foreach { cn =>
        val c = src.colDefs(cn)
        val spCol = sp.colDefs(colMap(cn))
        val o = cols.addObject()
        o.put("srcName", cn)
        o.put("spName", spCol.name)
        o.put("srcType", c.tpe.name)
        val mods = o.putArray("mods"); c.tpe.mods.foreach(mods.add)
        o.put("arrayBounds", c.tpe.arrayBounds)
        o.put("notNull", c.notNull)
        o.put("unique", c.unique)
        o.put("default", c.ignored.default)
        o.put("autoIncrement", c.ignored.autoIncrement)
        o.put("spType", spCol.t.render)
        o.put("spNotNull", spCol.notNull)
        o.put("comment", spCol.comment)
      }
      putKeys(t.putArray("srcPks"), src.primaryKeys)
      putKeys(t.putArray("spPks"), sp.pks)
      putFks(t.putArray("srcFks"), src.foreignKeys)
      putFks(t.putArray("spFks"), sp.fks)
      putIndexes(t.putArray("srcIndexes"), src.indexes)
      putIndexes(t.putArray("spIndexes"), sp.indexes)
    }
    val issues = root.putObject("issues")
    plan.issues.foreach { case (tbl, cols) =>
      val o = issues.putObject(tbl)
      cols.foreach { case (c, is) =>
        val a = o.putArray(c); is.foreach(i => a.add(i.toString))
      }
    }
    val notes = root.putArray("notes"); plan.notes.foreach(notes.add)
    root
  }

  private def putKeys(a: ArrayNode, keys: Seq[SrcKey]): Unit =
    keys.foreach { k =>
      val o = a.addObject(); o.put("col", k.column); o.put("desc", k.desc)
    }

  private def putFks(a: ArrayNode, fks: Seq[SrcForeignKey]): Unit =
    fks.foreach { fk =>
      val o = a.addObject()
      o.put("name", fk.name)
      val c = o.putArray("cols"); fk.columns.foreach(c.add)
      o.put("referTable", fk.referTable)
      val rc = o.putArray("referCols"); fk.referColumns.foreach(rc.add)
    }

  private def putIndexes(a: ArrayNode, ixs: Seq[SrcIndex]): Unit =
    ixs.foreach { ix =>
      val o = a.addObject()
      o.put("name", ix.name); o.put("unique", ix.unique)
      putKeys(o.putArray("keys"), ix.keys)
    }

  // -------------------------------------------------------------- read

  def read(path: String,
      c: org.apache.hadoop.conf.Configuration): ConversionPlan =
    fromJson(mapper.readTree(Fs.readString(path, c)))

  def fromJson(root: JsonNode): ConversionPlan = {
    def strs(n: JsonNode): Seq[String] = n.elements.asScala.map(_.asText).toSeq
    def keys(n: JsonNode): Seq[SrcKey] = n.elements.asScala.map(k =>
      SrcKey(k.get("col").asText, k.get("desc").asBoolean)).toSeq
    def fks(n: JsonNode): Seq[SrcForeignKey] = n.elements.asScala.map(f =>
      SrcForeignKey(f.get("name").asText, strs(f.get("cols")),
        f.get("referTable").asText, strs(f.get("referCols")))).toSeq
    def ixs(n: JsonNode): Seq[SrcIndex] = n.elements.asScala.map(i =>
      SrcIndex(i.get("name").asText, i.get("unique").asBoolean,
        keys(i.get("keys")))).toSeq

    val srcSchema = Map.newBuilder[String, SourceTable]
    val spSchema = Map.newBuilder[String, SpannerTable]
    val order = Seq.newBuilder[String]
    val toSp = Map.newBuilder[String, String]
    val toSpCols = Map.newBuilder[String, Map[String, String]]
    val synths = Map.newBuilder[String, String]

    root.get("tables").elements.asScala.foreach { t =>
      val srcName = t.get("srcName").asText
      val spName = t.get("spName").asText
      order += spName
      toSp += srcName -> spName
      val synth = Option(t.get("syntheticPk")).map(_.asText)
      synth.foreach(s => synths += spName -> s)

      val srcCols = Seq.newBuilder[SrcColumn]
      val spCols = Seq.newBuilder[SpColumn]
      val colMap = Map.newBuilder[String, String]
      t.get("cols").elements.asScala.foreach { c =>
        val sn = c.get("srcName").asText
        val pn = c.get("spName").asText
        colMap += sn -> pn
        srcCols += SrcColumn(sn,
          SrcType(c.get("srcType").asText,
            c.get("mods").elements.asScala.map(_.asLong).toSeq,
            c.get("arrayBounds").asInt),
          notNull = c.get("notNull").asBoolean,
          unique = c.get("unique").asBoolean,
          ignored = Ignored(
            default = c.get("default").asBoolean,
            autoIncrement = c.get("autoIncrement").asBoolean))
        spCols += SpColumn(pn, SpType.parse(c.get("spType").asText),
          notNull = c.get("spNotNull").asBoolean,
          comment = c.get("comment").asText)
      }
      // synthetic PK column lives only in the Spanner schema
      synth.foreach(s =>
        spCols += SpColumn(s, SpType(graft.types.SpScalar.Int64)))

      val srcColSeq = srcCols.result()
      val spColSeq = spCols.result()
      srcSchema += srcName -> SourceTable(srcName, srcColSeq.map(_.name),
        srcColSeq.map(c => c.name -> c).toMap,
        primaryKeys = keys(t.get("srcPks")),
        foreignKeys = fks(t.get("srcFks")),
        indexes = ixs(t.get("srcIndexes")))
      spSchema += spName -> SpannerTable(spName, spColSeq.map(_.name),
        spColSeq.map(c => c.name -> c).toMap,
        pks = keys(t.get("spPks")),
        fks = fks(t.get("spFks")),
        indexes = ixs(t.get("spIndexes")),
        parent = Option(t.get("parent")).map(_.asText))
      toSpCols += srcName -> colMap.result()
    }

    val issues = Option(root.get("issues")).map { n =>
      n.properties.asScala.map { e =>
        e.getKey -> e.getValue.properties.asScala.map { ce =>
          ce.getKey -> strs(ce.getValue).map(Issue.fromName)
        }.toMap
      }.toMap
    }.getOrElse(Map.empty)

    ConversionPlan(
      srcSchema = srcSchema.result(),
      spSchema = spSchema.result(),
      tableOrder = order.result(),
      toSpannerTable = toSp.result(),
      toSpannerCols = toSpCols.result(),
      syntheticPks = synths.result(),
      issues = issues,
      timezone = Option(root.get("timezone")).map(_.asText),
      notes = Option(root.get("notes")).map(strs).getOrElse(Nil))
  }
}
