package graft.sources.dynamodb

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import scala.collection.mutable
import graft.plan.SessionFile
import graft.report.{ProgressReporter, Report}
import graft.schema.{DdlRender, SchemaConverter}
import graft.sink.DdlSink
import graft.types.DynamoTypeMapper

/** The DynamoDB end-to-end migration driver — the `-driver=dynamodb`
  * lifecycle of the reference's single binary (main.go:54-55 with
  * `-schema-sample-size`; cmd/cmd.go drives the same schema→data→report
  * pair of passes for every driver): ListTables/DescribeTable control
  * plane (S10) → sampled type inference with A5's histogram (S11) →
  * conversion plan (T1's Dynamo face) → schema artifacts → parallel
  * segment Scan data pass (S12) converted per C14 → per-table parquet
  * (the Spanner stand-in) + quarantine side output → report. Exactly
  * [[graft.Migrate]]'s artifact set and staged-run contract with the
  * dump reader swapped for the DynamoDB control/data planes.
  *
  * Client seams, not SDK calls: `control` is the [[DynamoControlPlane]]
  * trait (driver-side metadata), `scan` is [[DynamoScan.Client]] (the
  * serializable per-segment data plane). The live implementations are
  * modules/dynamodb's AwsDynamoControlPlane/AwsDynamoScanClient (SDK v2,
  * compiled only with GRAFT_WITH_AWS_DYNAMO=1 — the build image has no
  * AWS artifacts); [[main]] wires them reflectively so the CLI works
  * exactly when that glue is on the classpath, and the E2E test drives
  * the same orchestration through canned fakes the way the reference's
  * dynamodb/schema_test.go mocks its dynamoClient interface.
  *
  * Scale shape: inference reads at most `schemaSampleSize` items per
  * table (limit pushes into the lazy segment pagination — a 10 TB table
  * costs a sample, not a scan); the data pass is one distributed job
  * per table with `totalSegments` parallel Scan segments, each task
  * draining its segment page-by-page (never buffering the segment).
  */
object DynamoMigrate {

  final case class Result(tables: Map[String, (Long, Long)], report: String)

  /** Reference main.go:55: -schema-sample-size default. */
  val DefaultSampleSize: Long = DynamoInfer.DefaultSampleSize

  def run(spark: SparkSession, control: DynamoControlPlane,
      scan: DynamoScan.Client, outDir: String, mode: String = "full",
      schemaSampleSize: Long = DefaultSampleSize,
      totalSegments: Int = 8,
      progressOut: String => Unit = println,
      filePrefix: String = "", verbose: Boolean = false,
      sessionPath: Option[String] = None): Result = {
    require(Set("full", "schema-only", "data-only").contains(mode), mode)
    require(schemaSampleSize > 0, s"schema-sample-size must be > 0")
    val hc = spark.sessionState.newHadoopConf()
    graft.util.Fs.mkdirs(outDir, hc)
    val defaultSession = s"$outDir/${filePrefix}session.json"

    // Schema pass (or session restore): the sampling scan reuses the
    // same segment-partitioned data plane as the data pass — limit()
    // stops the lazy pagination after the sample, so inference cost is
    // bounded by the sample, not the table.
    val plan =
      if (mode == "data-only")
        SessionFile.read(sessionPath.getOrElse(defaultSession), hc)
      else {
        val names = DynamoControlPlane.listTables(control)
        val tables = names.map { t =>
          val (meta, ixs) = DynamoControlPlane.discover(control, t)
          val src = DynamoInfer.inferTable(
            DynamoScan.items(spark, scan, t, totalSegments), meta,
            schemaSampleSize).copy(indexes = ixs)
          if (verbose) progressOut(
            s"inferred schema for $t: ${src.colNames.size} columns")
          t -> src
        }
        SchemaConverter.convert(DynamoTypeMapper, tables.toMap, names)
      }

    if (mode != "data-only") {
      // Same artifact order as Migrate: schema files land before any
      // data moves, so a failed data pass still leaves a usable plan.
      DdlRender.writeSchemaFile(plan.spSchema,
        s"$outDir/${filePrefix}schema.ddl.txt", pretty = true, hc)
      DdlRender.writeSchemaFile(plan.spSchema,
        s"$outDir/${filePrefix}schema.ddl.sql", pretty = false, hc)
      graft.util.Fs.writeStringAtomic(s"$outDir/${filePrefix}fk_backfill.sql",
        DdlSink.fkBackfillStatements(plan.spSchema)
          .mkString("", ";\n", ";\n"), hc)
      SessionFile.write(plan, defaultSession, hc)
    }
    if (mode == "schema-only") {
      val report = Report.render("dynamodb", plan, Map.empty)
      graft.util.Fs.writeStringAtomic(
        s"$outDir/${filePrefix}report.txt", report, hc)
      return Result(Map.empty, report)
    }

    // Data pass: full segment Scan per table, C14 conversion onto the
    // inferred schema, rename to the plan's Spanner names, parquet +
    // quarantine — one distributed job per table, metered like Migrate.
    val bySp = plan.toSpannerTable.map(_.swap)
    val itemCaches = mutable.ListBuffer.empty[org.apache.spark.sql.Dataset[String]]
    val frames = plan.tableOrder.map { spName =>
      val srcName = bySp(spName)
      val src = plan.srcSchema(srcName)
      val sp = plan.spSchema(spName)
      // persist the raw item scan: the parquet write, the quarantine
      // write, AND Report.tableStats' counts all derive from it — an
      // uncached frame would re-Scan the LIVE table once per consumer
      // (3× the billed RCUs, and counts from a mutating table could
      // disagree with the rows actually written). One point-in-time
      // read per table instead; MEMORY_AND_DISK spills big tables.
      val items = DynamoScan.items(spark, scan, srcName, totalSegments)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      itemCaches += items
      val (good, bad) = DynamoInfer.convert(spark, items, src)
      val colMap = plan.toSpannerCols(srcName)
      // honor staged-run session edits exactly like the dump path's
      // convertTable: a column the user REMOVED (no Spanner
      // counterpart) is dropped, and each survivor casts to the
      // (possibly RETYPED) Spanner column's type, not the inferred one
      val mapped = src.colNames.filter(c =>
        colMap.get(c).exists(sp.colDefs.contains))
      val renamed = good.select(mapped.map { c =>
        val spCol = colMap(c)
        col(c).cast(sp.colDefs(spCol).t.sparkType).as(spCol)
      }: _*)
      spName -> (renamed, bad)
    }.toMap

    val progress =
      new ProgressReporter(graft.Migrate.ProgressPrefix, progressOut)
    spark.sparkContext.addSparkListener(progress)
    try {
      frames.foreach { case (name, (good, _)) =>
        spark.sparkContext
          .setJobDescription(graft.Migrate.ProgressPrefix + name)
        try good.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
        finally spark.sparkContext.setJobDescription(null)
      }
      Report.writeQuarantine(frames, outDir)
    } finally {
      progress.drain(expectedJobs = frames.size)
      spark.sparkContext.removeSparkListener(progress)
    }

    val stats =
      try Report.tableStats(frames)
      finally { itemCaches.foreach(_.unpersist(false)); () }
    if (verbose)
      stats.toSeq.sortBy(_._1).foreach { case (t, s) =>
        progressOut(s"table $t: ${s.rows} rows written, ${s.badRows} quarantined")
      }
    val report = Report.render("dynamodb", plan, stats)
    graft.util.Fs.writeStringAtomic(
      s"$outDir/${filePrefix}report.txt", report, hc)
    Result(stats.map { case (t, s) => t -> (s.rows, s.badRows) }, report)
  }

  /** CLI: runMain graft.sources.dynamodb.DynamoMigrate <outDir>
    *      [full|schema-only|data-only] [--schema-sample-size=<n>]
    *      [--segments=<n>] [--prefix=<p>] [--session=<path>]
    *      [-v|--verbose]
    *
    * Wires the LIVE AWS clients reflectively (modules/dynamodb must be
    * on the classpath — the default build image is zero-egress and
    * can't resolve the SDK, the same reason the module is opt-in), so
    * the binary grows the `-driver=dynamodb` face exactly where the
    * reference has it without making the default build depend on AWS. */
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(a => a.startsWith("-") && a != "-")
    def flagVal(names: String*): Option[String] = flags.collectFirst {
      case f if names.exists(n => f.startsWith(n + "=")) =>
        f.substring(f.indexOf('=') + 1)
    }
    val sampleSize = flagVal("--schema-sample-size", "-schema-sample-size")
      .map(_.toLong).getOrElse(DefaultSampleSize)
    val segments = flagVal("--segments", "-segments").map(_.toInt).getOrElse(8)
    val filePrefix = flagVal("--prefix", "-prefix").getOrElse("")
    val sessionPath = flagVal("--session", "-session")
    val verbose = flags.exists(Set("-v", "--verbose"))
    val known = Set("--schema-sample-size", "-schema-sample-size",
      "--segments", "-segments", "--prefix", "-prefix",
      "--session", "-session")
    val unknown = flags.filterNot(f => f == "-v" || f == "--verbose" ||
      known.exists(n => f.startsWith(n + "=")))
    require(unknown.isEmpty, s"unknown flags: ${unknown.mkString(", ")}")
    val outDir = pos.headOption.getOrElse(
      throw new IllegalArgumentException("usage: DynamoMigrate <outDir> [mode]"))
    val mode = pos.lift(1).getOrElse("full")

    val (control, scan) = liveClients()
    val spark = graft.GraftSession.build("graft-dynamodb-migrate")
    val r = run(spark, control, scan, outDir, mode,
      schemaSampleSize = sampleSize, totalSegments = segments,
      filePrefix = filePrefix, verbose = verbose, sessionPath = sessionPath)
    println(r.report)
    spark.stop()
  }

  /** Reflective wiring of modules/dynamodb's SDK glue: DynamoDbClient
    * .create() (default credential/region chain) into
    * AwsDynamoControlPlane + AwsDynamoScanClient. Fails with an
    * actionable message when the module isn't compiled in. */
  private def liveClients(): (DynamoControlPlane, DynamoScan.Client) =
    try {
      val sdk = Class.forName(
        "software.amazon.awssdk.services.dynamodb.DynamoDbClient")
      val client = sdk.getMethod("create").invoke(null)
      val control = Class
        .forName("graft.sources.dynamodb.aws.AwsDynamoControlPlane")
        .getConstructor(sdk).newInstance(client)
        .asInstanceOf[DynamoControlPlane]
      // (endpoint, region, staticTestCreds, pageLimit) — endpoint/creds
      // stay on the SDK default chain. The scan client's constructor
      // REQUIRES an explicit region (it cannot consult the default
      // chain), so honor both standard env names before falling back;
      // a profile-configured region still needs AWS_REGION exported —
      // the control plane (full default chain) would otherwise target
      // a different region than the executors' scans.
      val scan = Class
        .forName("graft.sources.dynamodb.aws.AwsDynamoScanClient")
        .getConstructors.head
        .newInstance(None,
          sys.env.get("AWS_REGION")
            .orElse(sys.env.get("AWS_DEFAULT_REGION"))
            .getOrElse("us-east-1"),
          java.lang.Boolean.FALSE, None)
        .asInstanceOf[DynamoScan.Client]
      (control, scan)
    } catch {
      // InvocationTargetException (a ReflectiveOperationException
      // subclass) wraps failures thrown BY the invoked code —
      // DynamoDbClient.create() raising SdkClientException on a missing
      // region/credential chain is a runtime misconfiguration, not a
      // classpath problem; surface the real cause instead of the
      // misleading build hint
      case e: java.lang.reflect.InvocationTargetException =>
        throw new IllegalStateException(
          "live DynamoDB client initialization failed: " +
            e.getCause.getMessage, e.getCause)
      case e: ReflectiveOperationException =>
        throw new IllegalStateException(
          "live DynamoDB migration needs modules/dynamodb on the " +
            "classpath (build with GRAFT_WITH_AWS_DYNAMO=1); the " +
            "orchestration itself is fully covered by DynamoMigrateSpec " +
            "against canned clients", e)
    }
}
