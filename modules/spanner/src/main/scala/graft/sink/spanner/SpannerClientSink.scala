package graft.sink.spanner

import scala.jdk.CollectionConverters._
import com.google.cloud.{ByteArray, Date => GDate, Timestamp => GTimestamp}
import com.google.cloud.spanner.{DatabaseAdminClient, DatabaseClient, DatabaseId,
  Mutation, SpannerOptions, Value}
import graft.schema.SpannerTable
import graft.sink.{DdlSink, MutRow}

/** Live Cloud Spanner implementations of the engine's two external
  * seams (OPTIONAL MODULE — compiled only with GRAFT_WITH_SPANNER=1;
  * see modules/README.md):
  *
  *   K1  the BatchWriter write closure → DatabaseClient.write, one
  *       commit per batch (reference spanner/batchwriter.go:284-295
  *       writeBatch / client.Apply)
  *   K2  CreateDatabase carrying the no-FK schema batch (reference
  *       conversion/conversion.go:412-447: ids backtick-protected,
  *       comments stripped, FKs deferred)
  *   K3  serial FK backfill via UpdateDatabaseDdl, one statement per
  *       call, per-statement progress, failures recorded not fatal
  *       (conversion/conversion.go:449-480)
  *
  * Everything above the seam (batch thresholds, split-retry, statement
  * batches, interleave order) lives in graft.sink and is tested there
  * without this module; this file is only the client glue.
  */
object SpannerClientSink {

  /** BatchWriter/sinkDataFrame write closure over a DatabaseClient.
    * Build one client per executor (it is heavyweight and thread-safe);
    * pass e.g. `SpannerClientSink.writeClosure(client)` into
    * `BatchWriter.sinkDataFrame`. */
  def writeClosure(client: DatabaseClient): Seq[MutRow] => Unit =
    rows => { client.write(rows.map(toMutation).asJava); () }

  /** Serializable per-executor write closure — the form to hand to
    * `BatchWriter.sinkDataFrame`, whose write closure is serialized
    * into Spark tasks: the heavyweight client is built lazily once per
    * executor JVM, never on the wire. (SPANNER_EMULATOR_HOST in the
    * executor environment redirects it to an emulator, the same switch
    * the reference's integration tests use.) */
  final class PerExecutorWrite(project: String, instance: String, db: String)
      extends (Seq[MutRow] => Unit) with Serializable {
    @transient private lazy val client: DatabaseClient =
      SpannerOptions.newBuilder().setProjectId(project).build().getService
        .getDatabaseClient(DatabaseId.of(project, instance, db))
    override def apply(rows: Seq[MutRow]): Unit = {
      client.write(rows.map(toMutation).asJava); ()
    }
  }

  /** MutRow → INSERT_OR_UPDATE mutation. Null values are omitted:
    * Spanner reads an absent column as NULL on insert, and the
    * migration writes each row exactly once. */
  def toMutation(r: MutRow): Mutation = {
    val b = Mutation.newInsertOrUpdateBuilder(r.table)
    r.cols.zip(r.vals).foreach { case (c, v) =>
      if (v != null) b.set(c).to(toValue(v))
    }
    b.build()
  }

  /** Spark row value → Spanner Value, over the engine's 8-type lattice
    * (BOOL BYTES DATE FLOAT64 INT64 STRING TIMESTAMP NUMERIC + arrays). */
  def toValue(v: Any): Value = v match {
    case s: String               => Value.string(s)
    case l: Long                 => Value.int64(l)
    case i: Int                  => Value.int64(i.toLong)
    case s: Short                => Value.int64(s.toLong)
    case b: Byte                 => Value.int64(b.toLong)
    case d: Double               => Value.float64(d)
    case f: Float                => Value.float64(f.toDouble)
    case b: Boolean              => Value.bool(b)
    case d: java.math.BigDecimal => Value.numeric(d)
    case d: BigDecimal           => Value.numeric(d.bigDecimal)
    case t: java.sql.Timestamp   => Value.timestamp(GTimestamp.of(t))
    case i: java.time.Instant =>
      Value.timestamp(GTimestamp.ofTimeSecondsAndNanos(i.getEpochSecond, i.getNano))
    case d: java.sql.Date =>
      val ld = d.toLocalDate
      Value.date(GDate.fromYearMonthDay(ld.getYear, ld.getMonthValue, ld.getDayOfMonth))
    case ld: java.time.LocalDate =>
      Value.date(GDate.fromYearMonthDay(ld.getYear, ld.getMonthValue, ld.getDayOfMonth))
    case b: Array[Byte]          => Value.bytes(ByteArray.copyFrom(b))
    case s: Seq[_]               => toArrayValue(s)
    // no toString fallback: a type drifting outside the lattice would be
    // written as a Spanner STRING and fail (or corrupt) at commit time,
    // far from the cause — fail here, where the offending type is visible
    case other => throw new IllegalArgumentException(
      s"unsupported Spark value type for Spanner write: ${other.getClass.getName}")
  }

  /** Array column → typed Spanner array; element type from the first
    * non-null element (empty / all-null arrays fall back to STRING,
    * which Spanner accepts for any NULL-element-only array write).
    * Same fail-fast posture as [[toValue]]: an element type outside the
    * lattice throws here, where the offending type is visible, instead
    * of toString-corrupting at commit time. */
  private def toArrayValue(s: Seq[_]): Value = s.find(_ != null) match {
    case Some(_: Long) | Some(_: Int) | Some(_: Short) | Some(_: Byte) =>
      Value.int64Array(s.map(x => if (x == null) null
        else java.lang.Long.valueOf(x.asInstanceOf[Number].longValue)).asJava)
    case Some(_: Double) | Some(_: Float) =>
      Value.float64Array(s.map(x => if (x == null) null
        else java.lang.Double.valueOf(x.asInstanceOf[Number].doubleValue)).asJava)
    case Some(_: Boolean) =>
      Value.boolArray(s.map(x => if (x == null) null
        else java.lang.Boolean.valueOf(x.asInstanceOf[Boolean])).asJava)
    case Some(_: java.math.BigDecimal) =>
      Value.numericArray(s.map(x =>
        if (x == null) null else x.asInstanceOf[java.math.BigDecimal]).asJava)
    case Some(_: BigDecimal) =>
      Value.numericArray(s.map(x =>
        if (x == null) null else x.asInstanceOf[BigDecimal].bigDecimal).asJava)
    case Some(_: Array[Byte]) =>
      Value.bytesArray(s.map(x => if (x == null) null
        else ByteArray.copyFrom(x.asInstanceOf[Array[Byte]])).asJava)
    case Some(_: java.sql.Timestamp) =>
      Value.timestampArray(s.map(x => if (x == null) null
        else GTimestamp.of(x.asInstanceOf[java.sql.Timestamp])).asJava)
    case Some(_: java.time.Instant) =>
      Value.timestampArray(s.map(x => if (x == null) null else {
        val i = x.asInstanceOf[java.time.Instant]
        GTimestamp.ofTimeSecondsAndNanos(i.getEpochSecond, i.getNano)
      }).asJava)
    case Some(_: java.sql.Date) =>
      Value.dateArray(s.map(x => if (x == null) null else {
        val ld = x.asInstanceOf[java.sql.Date].toLocalDate
        GDate.fromYearMonthDay(ld.getYear, ld.getMonthValue, ld.getDayOfMonth)
      }).asJava)
    case Some(_: java.time.LocalDate) =>
      Value.dateArray(s.map(x => if (x == null) null else {
        val ld = x.asInstanceOf[java.time.LocalDate]
        GDate.fromYearMonthDay(ld.getYear, ld.getMonthValue, ld.getDayOfMonth)
      }).asJava)
    case Some(_: String) | None =>
      Value.stringArray(s.map(x => if (x == null) null else x.toString).asJava)
    case Some(other) => throw new IllegalArgumentException(
      s"unsupported Spark array element type for Spanner write: ${other.getClass.getName}")
  }

  /** K2: create the database with the no-FK schema batch; blocks until
    * the admin operation completes (conversion.go:412-447). */
  def createDatabase(admin: DatabaseAdminClient, instance: String,
      dbName: String, schema: Map[String, SpannerTable]): Unit = {
    admin.createDatabase(instance, dbName,
      DdlSink.createStatements(schema).asJava).get()
    ()
  }

  /** K3: serial FK backfill. Each ALTER is its own UpdateDatabaseDdl
    * call (awaited before the next — the reference's TODO to parallelize
    * applies here too); a failed statement is reported through `onError`
    * and the rest still apply, matching conversion.go:465-477. */
  def updateDdlForeignKeys(admin: DatabaseAdminClient, instance: String,
      dbName: String, schema: Map[String, SpannerTable],
      progress: (Int, Int) => Unit = (_, _) => (),
      onError: (String, Throwable) => Unit = (_, _) => ()): Unit =
    DdlSink.applySerially(DdlSink.fkBackfillStatements(schema),
      stmt =>
        try { admin.updateDatabaseDdl(instance, dbName, Seq(stmt).asJava, null).get(); () }
        catch { case e: Exception => onError(stmt, e) },
      progress)
}
