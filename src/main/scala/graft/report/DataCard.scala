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
