package graft.queries

import org.apache.spark.sql.functions._

/** JSONL interchange queries — the training-data import/export format
  * certified the same way as the dump sinks (p07/p08): export, re-ingest
  * through the library's own reader, aggregate, and let the DuckDB
  * oracle compute the same aggregate from the original parquet. */
object JsonlQueries {

  val defs: Map[String, QueryDef] = Map(
    // ---------------------------------------------------------------- p09
    // JSONL round trip, driver-verified: documents → JsonlDocs.write
    // (distributed shard dir) → JsonlDocs.read (quarantine posture) →
    // per-language count + whitespace-token sum. Green means JSON
    // string escaping, the PERMISSIVE parse, and the id-presence gate
    // lose nothing the aggregate can see.
    "p09_jsonl_roundtrip" -> QueryDef(
      build = (spark, dir) => {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "text", "lang", "source")
        val out = java.nio.file.Files
          .createTempDirectory("graft_p09_").toString + "/docs"
        QueryDef.deferCleanup(() => {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(new java.io.File(out).getParentFile)
        })
        graft.sources.jsonl.JsonlDocs.write(docs, out)
        val (good, _) = graft.sources.jsonl.JsonlDocs.read(spark, out)
        good.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(expr(s"size(${TextMedia.toks})")).as("n_tokens"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), t -> t <> ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang ORDER BY lang"""))
  )
}
