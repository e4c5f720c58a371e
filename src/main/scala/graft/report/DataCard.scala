package graft.report

import org.apache.spark.sql.SparkSession

/** Dataset-card artifact: the c15_data_card relation (docs/tokens/bytes,
  * exact-dup rate, language and source composition) serialized as one
  * JSON object — the governance file a training-data release ships.
  * Every number in the card is the oracle-checked query's output, not a
  * separately-computed figure that can drift from it. */
object DataCard {

  /** Metric map, computed via the same plan the driver verifies. */
  def metrics(spark: SparkSession, sfDir: String): Map[String, Long] =
    graft.queries.Curation.defs("c15_data_card").build(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Same relation over an arbitrary documents frame (what the Curate
    * CLI cards its actual input with — batch dirs included). */
  def metricsOf(docs: org.apache.spark.sql.DataFrame): Map[String, Long] =
    graft.queries.Curation.dataCard(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Composition DRIFT between two corpus snapshots — the report a
    * generation-over-generation ingest (StreamingCurate's chained
    * generations, or any two crawls) runs before accepting the new
    * one: per-language document shares in exact ppm for each snapshot,
    * signed deltas, and a '_TOTAL' row whose delta_ppm is the
    * total-variation distance between the two composition
    * distributions. The arithmetic is the oracle-verified d25 scheme,
    * SAME definition ([[graft.queries.Documents.driftFromCounts]]) —
    * DataCardSpec pins this API bit-exact against the d25 query on the
    * query's own parity split.
    *
    * A language absent from one snapshot appears with a 0 count/share
    * (full-outer join of the two composition aggregates). An EMPTY
    * snapshot refuses loudly — every share of the other side would be
    * a division by zero dressed up as drift.
    *
    * Cost: one counting aggregate per snapshot; the drift arithmetic
    * runs on the stratum-sized frame, which is persisted only for the
    * duration of the call (the returned frame is localCheckpoint'ed —
    * stratum-count rows — so no lineage pins the inputs afterwards).
    *
    * @param by the stratum column (default "lang"; "source" gives the
    *           per-domain composition drift — the anti-spam monitor's
    *           view). The output's stratum column carries this name. */
  def drift(oldDocs: org.apache.spark.sql.DataFrame,
      newDocs: org.apache.spark.sql.DataFrame,
      by: String = "lang")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // NULL strata fold into one named stratum BEFORE the join: NULL
    // join keys never match, so a NULL group on each side would
    // emerge as two unpaired rows (old_n=0 and new_n=0) instead of a
    // comparison — and a NULL would also sort before '_TOTAL' and
    // NPE any string consumer. '_unknown' sorts after '_TOTAL'
    // ('T' < 'u'), keeping the summary row first.
    def counted(docs: org.apache.spark.sql.DataFrame, as: String) =
      docs.select(coalesce(col(by), lit("_unknown")).as("lang"))
        .groupBy("lang").agg(count(lit(1)).as(as))
    val perLang = counted(oldDocs, "old_n")
      .join(counted(newDocs, "new_n"), Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val t = perLang.groupBy()
        .agg(sum("old_n").as("o"), sum("new_n").as("n")).collect()
      require(t.nonEmpty && !t(0).isNullAt(0) && t(0).getLong(0) > 0 &&
        t(0).getLong(1) > 0,
        "drift needs two non-empty snapshots (an empty side turns every " +
          "share into a division by zero)")
      graft.queries.Documents.driftFromCounts(perLang)
        .withColumnRenamed("lang", by)
        .localCheckpoint(true)
    } finally {
      perLang.unpersist(false); ()
    }
  }

  /** Global EXACT length quantiles of a corpus — the five-number
    * summary a data card quotes beside [[metrics]]' totals. Uses
    * [[graft.operators.ExactQuantiles]] (q43's operator: value
    * histogram + sharded prefix sums, no corpus-wide window, no
    * approx_percentile epsilon), so the numbers are reproducible
    * bit-for-bit across runs and engines. Lengths come from n_chars
    * when present — falling back per-row to length(text) where n_chars
    * is NULL but text isn't, so a partially populated stats column
    * can't silently shrink the summary — and docs with neither are
    * excluded (the operator's NULL posture). `cleanup` receives the
    * operator's cache-release thunk (run it after materializing the
    * summary — the crossNearDupPairs convention). */
  def lengthSummary(docs: org.apache.spark.sql.DataFrame,
      qPermille: Seq[Int] = Seq(0, 250, 500, 750, 900, 1000))
      (cleanup: (() => Unit) => Unit)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val hasStats = docs.columns.contains("n_chars")
    val hasText = docs.columns.contains("text")
    require(hasStats || hasText,
      "lengthSummary needs an n_chars or text column")
    val len =
      if (hasStats && hasText)
        coalesce(col("n_chars"), length(col("text")).cast("long"))
      else if (hasStats) col("n_chars")
      else length(col("text")).cast("long")
    graft.operators.ExactQuantiles.of(
      docs.select(len.as("len")), "len", qPermille)(cleanup)
  }

  /** Row-level churn between two snapshot corpora — the companion
    * [[drift]] can't express: drift says the composition moved,
    * churn says how many documents were added / removed / changed /
    * unchanged (and the character volume on each side) — the audit a
    * versioned corpus runs before promoting a generation. ONE
    * definition with the oracled c23 query
    * ([[graft.queries.Documents.snapshotChurn]]); DataCardSpec pins
    * this API bit-exact to it. Inputs need (doc_id, text) with doc_id
    * unique per side. Unlike drift, an EMPTY side is a legitimate
    * comparison (everything is 'added' or 'removed' — no division
    * exists to blow up), so no refusal. */
  def churn(oldDocs: org.apache.spark.sql.DataFrame,
      newDocs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.queries.Documents.snapshotChurn(oldDocs, newDocs)

  /** Embedding-space drift between two snapshot corpora — [[drift]]'s
    * sibling on the vector side and the retrain trigger an index
    * operator reads (a large per-dim quantized centroid shift means
    * IvfIndex/PqIndex coarse centroids no longer sit where the data
    * is). The arithmetic lives ONCE in
    * [[graft.queries.Similarity.embeddingDriftCore]] (driftFromCounts'
    * shared-definition pattern), so this API is pinned bit-exact to
    * the oracled e21 relation by DataCardSpec. Inputs need only an
    * `embedding` column; an empty side yields zero means (the
    * guarded-division convention), not an error — callers comparing a
    * first generation against nothing get an all-new_mean report. */
  def embeddingDrift(oldEmb: org.apache.spark.sql.DataFrame,
      newEmb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.queries.Similarity.embeddingDriftCore(
      oldEmb.select(lit(true).as("is_old"), col("embedding"))
        .unionByName(
          newEmb.select(lit(false).as("is_old"), col("embedding"))))
  }

  /** Write the card JSON (sorted keys — byte-stable across runs). */
  def write(spark: SparkSession, sfDir: String, outPath: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    metrics(spark, sfDir).toSeq.sortBy(_._1).foreach { case (k, v) =>
      root.put(k, v)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }
}
