package graft.util

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** A local FS under a scheme that exists ONLY in the Configuration that
  * registers it — the discriminator for the explicit-conf contract
  * below. (RawLocal, not Local: no .crc sidecars to confuse listParts.) */
class ProbeFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("probe:///")
}

/** FileContext-side registration of the same scheme (writeStringAtomic
  * renames through FileContext, which resolves `fs.AbstractFileSystem.
  * <scheme>.impl`, a separate registry from `fs.<scheme>.impl`). */
class ProbeAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new ProbeFs, conf, "probe", false)

/** Pins the artifact-IO conf contract: every persisted-artifact API
  * takes its Hadoop Configuration EXPLICITLY and resolves paths through
  * it — never through the thread-local active SparkSession. The trap:
  * a `probe://` filesystem registered only in an explicit conf, while
  * the active session's conf does not know the scheme. Any regression
  * back to active-session resolution makes these calls throw
  * "No FileSystem for scheme: probe". */
class FsConfSpec extends AnyFunSuite {

  // an ACTIVE session whose hadoop conf cannot resolve probe:// — the
  // session a thread-local fallback would wrongly consult
  private lazy val spark = GraftSession.build("graft-test")

  private def probeConf(): Configuration = {
    val c = new Configuration()
    c.set("fs.probe.impl", classOf[ProbeFs].getName)
    c.set("fs.AbstractFileSystem.probe.impl", classOf[ProbeAbstractFs].getName)
    c
  }

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-fsconf").toString

  test("active session conf does NOT resolve probe:// (trap is armed)") {
    spark.sparkContext // force-start so the session is active
    val sessionConf = spark.sessionState.newHadoopConf()
    val e = intercept[java.io.IOException] {
      Fs.exists(s"probe:${tmpDir()}/x", sessionConf)
    }
    assert(e.getMessage.contains("probe"))
  }

  test("SessionFile round-trips on a scheme only the explicit conf knows") {
    spark.sparkContext
    val plan = graft.sources.pgdump.PgDumpReader
      .schemaPass("src/test/resources/fixtures/sample.pgdump")._2
    val c = probeConf()
    val path = s"probe:${tmpDir()}/session.json"
    graft.plan.SessionFile.write(plan, path, c, Some("pgdump"))
    val back = graft.plan.SessionFile.read(path, c)
    assert(back.tableOrder === plan.tableOrder)
    assert(back.toSpannerTable === plan.toSpannerTable)
    assert(graft.plan.SessionFile.readDriver(path, c) === Some("pgdump"))
  }

  test("schema files + BPE merges write through the explicit conf") {
    spark.sparkContext
    val plan = graft.sources.pgdump.PgDumpReader
      .schemaPass("src/test/resources/fixtures/sample.pgdump")._2
    val c = probeConf()
    val dir = tmpDir()
    graft.schema.DdlRender.writeSchemaFile(
      plan.spSchema, s"probe:$dir/schema.txt", pretty = true, c)
    assert(Fs.readString(s"probe:$dir/schema.txt", c).contains("CREATE TABLE"))

    val merges = Seq(graft.operators.BpeTrainer.Merge("a", "b", 7L))
    graft.operators.BpeTrainer.saveMerges(merges, s"probe:$dir/merges.json", c)
    assert(graft.operators.BpeTrainer.loadMerges(s"probe:$dir/merges.json", c)
      === merges)
  }
}
