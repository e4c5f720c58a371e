package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end migration CLI test: both dump dialects through the full
  * lifecycle, asserting every artifact lands and reads back. */
class MigrateSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")
  private lazy val hc = spark.sessionState.newHadoopConf()

  test("pg_dump end-to-end: parquet + DDL + session + report") {
    val out = java.nio.file.Files.createTempDirectory("graft-mig-pg").toString
    val r = Migrate.run(spark, "pgdump",
      "src/test/resources/fixtures/sample.pgdump", out)
    assert(r.tables("inventory") === (3L, 0L))
    assert(r.tables("order_log") === (3L, 0L))
    assert(r.tables("unkeyed") === (3L, 0L))
    // parquet reads back with Spanner names/types
    val inv = spark.read.parquet(s"$out/inventory.parquet")
    assert(inv.count() === 3)
    assert(inv.schema("price").dataType.typeName === "decimal(38,9)")
    // artifacts
    val dir = new java.io.File(out).list().toSet
    assert(dir.contains("schema.ddl.txt") && dir.contains("schema.ddl.sql"))
    assert(dir.contains("session.json") && dir.contains("report.txt"))
    assert(dir.contains("fk_backfill.sql"))
    val legal = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/schema.ddl.sql"))
    // K4 schema files carry the full DDL including FK alters (the no-FK
    // creation batch is DdlSink.createStatements, tested separately)
    assert(legal.contains("`order_log`") && legal.contains("FOREIGN KEY"))
    val fks = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/fk_backfill.sql"))
    assert(fks.contains("ADD CONSTRAINT `fk_sku` FOREIGN KEY"))
    assert(r.report.contains("Summary of Conversion"))
    // session round-trips to the same DDL
    val back = graft.plan.SessionFile.read(s"$out/session.json", hc)
    assert(graft.schema.DdlRender.schemaDdl(back.spSchema,
      graft.schema.DdlRender.Config()).mkString(";") ===
      graft.schema.DdlRender.schemaDdl(
        graft.sources.pgdump.PgDumpReader.schemaPass(
          "src/test/resources/fixtures/sample.pgdump")._2.spSchema,
        graft.schema.DdlRender.Config()).mkString(";"))
  }

  test("artifacts land on an explicit file:-scheme Hadoop outDir") {
    // every driver artifact (DDL, session, fk, report, parquet) goes
    // through the Hadoop FileSystem of the outDir's scheme — a URI
    // outDir (the HDFS/S3 shape) must work end to end, not just a bare
    // POSIX path the java.nio fallback would have accepted
    val out = "file:" +
      java.nio.file.Files.createTempDirectory("graft-mig-fs").toString + "/run"
    val r = Migrate.run(spark, "pgdump",
      "src/test/resources/fixtures/sample.pgdump", out)
    assert(r.tables("inventory") === (3L, 0L))
    val c = spark.sessionState.newHadoopConf()
    for (a <- Seq("schema.ddl.txt", "schema.ddl.sql", "fk_backfill.sql",
        "session.json", "report.txt"))
      assert(graft.util.Fs.exists(s"$out/$a", c), s"missing $a")
    assert(graft.util.Fs.readString(s"$out/report.txt", c)
      .contains("Summary of Conversion"))
    assert(spark.read.parquet(s"$out/inventory.parquet").count() === 3)
    // and the session file reads back through the same scheme
    assert(graft.plan.SessionFile.read(s"$out/session.json", hc)
      .spSchema.contains("inventory"))
  }

  test("progress meter emits per-table percent lines during the data pass") {
    val out = java.nio.file.Files.createTempDirectory("graft-mig-prog").toString
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Migrate.run(spark, "pgdump",
      "src/test/resources/fixtures/sample.pgdump", out,
      progressOut = lines.add(_))
    val got = lines.toArray(Array.empty[String]).toSeq
    // every table's write is metered and closes at 100%
    Seq("inventory", "order_log", "unkeyed").foreach { t =>
      assert(got.exists(_.startsWith(s"Writing data for table $t:")), got)
      assert(got.contains(s"Writing data for table $t: 100%"), got)
    }
    // integer-pct gating: per table, percentages strictly increase
    // (the FK-phase lines share the channel but aren't meter lines)
    got.filter(_.startsWith(Migrate.ProgressPrefix))
      .groupBy(_.takeWhile(_ != ':')).values.foreach { ls =>
      val pcts = ls.map(_.split(": ").last.trim.stripSuffix("%").trim.toInt)
      assert(pcts === pcts.sorted.distinct, ls)
    }
  }

  test("--prefix namespaces generated artifacts and -v adds stat lines (reference main.go:53,56)") {
    val out = java.nio.file.Files.createTempDirectory("graft-mig-prefix").toString
    val fixture = "src/test/resources/fixtures/sample.pgdump"
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val r = Migrate.run(spark, "pgdump", fixture, out,
      progressOut = lines.add(_), filePrefix = "runA.", verbose = true)
    assert(r.tables("inventory") === (3L, 0L))
    val dir = new java.io.File(out).list().toSet
    // generated artifacts carry the prefix; bare names must NOT exist
    for (a <- Seq("schema.ddl.txt", "schema.ddl.sql", "fk_backfill.sql",
        "session.json", "report.txt")) {
      assert(dir.contains(s"runA.$a"), s"missing runA.$a in $dir")
      assert(!dir.contains(a), s"unprefixed $a leaked into $dir")
    }
    // table data is the Spanner-write stand-in, not a generated file —
    // unprefixed by design
    assert(dir.contains("inventory.parquet"))
    // -v: statement stats + per-table row/quarantine lines
    val got = lines.toArray(Array.empty[String]).toSeq
    assert(got.exists(_.startsWith("statements: ")), got)
    assert(got.contains("table inventory: 3 rows written, 0 quarantined"), got)
    // staged rerun under the SAME prefix: data-only restores the
    // prefixed session (the round-trip the prefix must not break)
    val r2 = Migrate.run(spark, "pgdump", fixture, out,
      mode = "data-only", filePrefix = "runA.")
    assert(r2.tables("inventory") === (3L, 0L))
    // a second prefix coexists in the same outDir — the reference's
    // use case for -prefix
    Migrate.run(spark, "pgdump", fixture, out,
      mode = "schema-only", filePrefix = "runB.")
    val dir2 = new java.io.File(out).list().toSet
    assert(dir2.contains("runB.session.json") && dir2.contains("runA.session.json"))
  }

  test("--skip-foreign-keys skips the FK phase; fk_backfill.sql still written (reference main.go:59)") {
    val fixture = "src/test/resources/fixtures/sample.pgdump"
    // default: the FK phase applies K3's ALTERs through the exec seam
    // with per-statement progress (cmd.go:82-87)
    val out1 = java.nio.file.Files.createTempDirectory("graft-mig-fk").toString
    val applied = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lines1 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Migrate.run(spark, "pgdump", fixture, out1,
      progressOut = lines1.add(_), fkExec = applied.add(_))
    assert(applied.toArray(Array.empty[String])
      .exists(_.contains("ADD CONSTRAINT")), applied.toString)
    assert(lines1.toArray(Array.empty[String])
      .exists(_.startsWith("foreign keys: applied ")), lines1.toString)
    // skipped: nothing applied, no FK progress, artifact still written
    val out2 = java.nio.file.Files.createTempDirectory("graft-mig-nofk").toString
    val skipped = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lines2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val r = Migrate.run(spark, "pgdump", fixture, out2,
      progressOut = lines2.add(_), skipForeignKeys = true,
      fkExec = skipped.add(_))
    assert(r.tables("inventory") === (3L, 0L))
    assert(skipped.isEmpty)
    val got2 = lines2.toArray(Array.empty[String]).toSeq
    assert(!got2.exists(_.startsWith("foreign keys: applied ")), got2)
    assert(got2.exists(_.startsWith("skipping foreign key creation")), got2)
    val fks = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out2/fk_backfill.sql"))
    assert(fks.contains("ADD CONSTRAINT"), fks)
    // reference main.go:99-100: refused together with schema-only
    val ex = intercept[IllegalArgumentException](
      Migrate.run(spark, "pgdump", fixture, out2,
        mode = "schema-only", skipForeignKeys = true))
    assert(ex.getMessage.contains("schema-only and skip-foreign-keys"))
  }

  test("staged: schema-only then edited session drives data-only") {
    val out = java.nio.file.Files.createTempDirectory("graft-mig-staged").toString
    val fixture = "src/test/resources/fixtures/sample.pgdump"
    // pass 1: schema only — artifacts, no data
    val r1 = Migrate.run(spark, "pgdump", fixture, out, mode = "schema-only")
    assert(r1.tables.isEmpty)
    assert(new java.io.File(s"$out/session.json").exists())
    assert(!new java.io.File(s"$out/inventory.parquet").exists())
    // edit the session between stages: rename a column (T8 workflow)
    val plan = graft.plan.SessionFile.read(s"$out/session.json", hc)
    val edited = graft.schema.PlanEdits
      .renameColumn(plan, "inventory", "qty", "quantity")
      .getOrElse(fail("edit failed"))
    graft.plan.SessionFile.write(edited, s"$out/session.json", hc)
    // pass 2: data only — edited plan drives the conversion
    val r2 = Migrate.run(spark, "pgdump", fixture, out, mode = "data-only")
    assert(r2.tables("inventory") === (3L, 0L))
    val inv = spark.read.parquet(s"$out/inventory.parquet")
    assert(inv.columns.contains("quantity") && !inv.columns.contains("qty"))
  }

  test("staged: --session restores the plan from a foreign dir") {
    // reference main.go:60 — the session flag names the file to restore
    // from, enabling "convert on one machine, load from another dir":
    // schema pass lands in dirA, the data-only load runs into dirB
    // naming dirA's (edited) session explicitly.
    val dirA = java.nio.file.Files.createTempDirectory("graft-mig-sesA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-mig-sesB").toString
    val fixture = "src/test/resources/fixtures/sample.pgdump"
    Migrate.run(spark, "pgdump", fixture, dirA, mode = "schema-only")
    val plan = graft.plan.SessionFile.read(s"$dirA/session.json", hc)
    val edited = graft.schema.PlanEdits
      .renameColumn(plan, "inventory", "qty", "quantity")
      .getOrElse(fail("edit failed"))
    graft.plan.SessionFile.write(edited, s"$dirA/session.json", hc)
    val r = Migrate.run(spark, "pgdump", fixture, dirB, mode = "data-only",
      sessionPath = Some(s"$dirA/session.json"))
    assert(r.tables("inventory") === (3L, 0L))
    // the edit carried — proof the foreign session drove the pass, not
    // some default; and dirB has no session.json of its own to fall
    // back on, so the restore path itself is what's exercised
    val inv = spark.read.parquet(s"$dirB/inventory.parquet")
    assert(inv.columns.contains("quantity") && !inv.columns.contains("qty"))
    assert(!new java.io.File(s"$dirB/session.json").exists())
  }

  test("staged: remove-column edit drives data-only without crashing") {
    val out = java.nio.file.Files.createTempDirectory("graft-mig-rm").toString
    val fixture = "src/test/resources/fixtures/sample.pgdump"
    Migrate.run(spark, "pgdump", fixture, out, mode = "schema-only")
    val plan = graft.plan.SessionFile.read(s"$out/session.json", hc)
    val edited = graft.schema.PlanEdits
      .removeColumn(plan, "inventory", "qty")
      .getOrElse(fail("edit failed"))
    graft.plan.SessionFile.write(edited, s"$out/session.json", hc)
    val r2 = Migrate.run(spark, "pgdump", fixture, out, mode = "data-only")
    assert(r2.tables("inventory") === (3L, 0L))
    val inv = spark.read.parquet(s"$out/inventory.parquet")
    assert(!inv.columns.contains("qty"))
  }

  test("dump-line cache is released once the run completes") {
    val fixture = "src/test/resources/fixtures/sample.pgdump"
    val out = java.nio.file.Files.createTempDirectory("graft-mig-rel").toString
    Migrate.run(spark, "pgdump", fixture, out)
    // Dataset.storageLevel consults the shared CacheManager by plan
    // equality — a fresh build of the same scan reports NONE only if the
    // run's cache was actually unpersisted
    val again = graft.sources.pgdump.PgDumpReader.indexedLines(spark, fixture)
    assert(again.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    // and the Migration handle itself is idempotent + keeps frames usable
    val m = graft.sources.pgdump.PgDumpReader.migrate(spark, fixture)
    m.release(); m.release()
    assert(m.tables("inventory")._1.count() === 3)
    assert(graft.sources.pgdump.PgDumpReader.indexedLines(spark, fixture)
      .storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("mysqldump end-to-end") {
    val out = java.nio.file.Files.createTempDirectory("graft-mig-my").toString
    val r = Migrate.run(spark, "mysqldump",
      "src/test/resources/fixtures/sample.mysqldump", out)
    assert(r.tables("customers") === (2L, 0L))
    val cust = spark.read.parquet(s"$out/customers.parquet")
    assert(cust.schema("tags").dataType.typeName === "array")
    assert(r.report.contains("Table order log (mapped to Spanner table order_log)"))
  }

  test("stdin ingestion: a piped dump produces the same artifacts as a path") {
    // the reference's headline UX — `pg_dump mydb | harbourbridge`
    // (conversion/conversion.go:377-406): the stream is teed to scratch
    // once, then the normal two-pass pipeline runs. Same plan, same
    // data, same report as the path-based run over the same bytes.
    val fixture = "src/test/resources/fixtures/sample.pgdump"
    val pathOut = java.nio.file.Files.createTempDirectory("graft-mig-path").toString
    val streamOut = java.nio.file.Files.createTempDirectory("graft-mig-pipe").toString
    val byPath = Migrate.run(spark, "pgdump", fixture, pathOut)
    val in = new java.io.FileInputStream(fixture)
    val byStream =
      try Migrate.runStream(spark, "pgdump", in, streamOut)
      finally in.close()
    assert(byStream.tables === byPath.tables)
    assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$streamOut/schema.ddl.sql")) ===
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$pathOut/schema.ddl.sql")))
    // JSON-serialized rows: value comparison that survives nested
    // array columns (raw Row Arrays compare by reference)
    val rows = (d: String) => spark.read.parquet(s"$d/inventory.parquet")
      .toJSON.collect().sorted.toSeq
    assert(rows(streamOut) === rows(pathOut))
    assert(byStream.report.contains("Summary of Conversion"))
    // scratch copy is dropped after the run
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    assert(!tmp.listFiles().exists(_.getName.startsWith("graft_stream_")))
  }

  test("stdin ingestion: a GZIP'D pipe goes through the same sniffing path") {
    // `pg_dump | gzip | harbourbridge`: the raw compressed bytes land in
    // scratch, DumpCodec's magic-byte sniff inflates on first read —
    // no flag, no special-casing
    val fixture = "src/test/resources/fixtures/sample.pgdump"
    val gzBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture)))
      gz.close()
      bos.toByteArray
    }
    val out = java.nio.file.Files.createTempDirectory("graft-mig-gzpipe").toString
    val r = Migrate.runStream(spark, "pgdump",
      new java.io.ByteArrayInputStream(gzBytes), out)
    assert(r.tables("inventory") === (3L, 0L))
    assert(spark.read.parquet(s"$out/inventory.parquet").count() === 3)
  }
}
