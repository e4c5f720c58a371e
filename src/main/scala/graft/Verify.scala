package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: query names to dump (iteration aid; the
    // driver passes exactly two args and gets the full set)
    val only = args.drop(2).toSet
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally graft.queries.QueryDef.drainCleanups()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Gate-SF-specific oracles (QueryDef.oracleMaxSf): omit them when
    // this run's scale factor exceeds the bound — the entry degrades to
    // a rows-only check instead of a FALSE red (the oracle is provably
    // exact only below the threshold). An unparseable dir name keeps
    // every oracle: the driver's testdata dirs always parse, and
    // failing open would silently weaken the gate.
    val sfHere: Option[Double] =
      "sf([0-9]+(?:\\.[0-9]+)?)".r.findFirstMatchIn(
        new java.io.File(sfDir).getName).map(_.group(1).toDouble)
    val omit: Set[String] = SparkEntry.defs.collect {
      case (name, d) if d.oracleMaxSf.exists(mx => sfHere.exists(_ > mx)) =>
        System.err.println(
          s"[verify] $name: oracle valid only to sf${d.oracleMaxSf.get} — " +
            s"omitted at sf${sfHere.get} (rows-only)")
        name
    }.toSet
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => !omit(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
