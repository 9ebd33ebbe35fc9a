package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Composite training-corpus preparation pipeline — the text-analysis
  * and dedup operators chained the way a real 100 TB ingest run chains
  * them. Per-row scoring is scan-parallel codegen; the only shuffle is
  * the content-hash dedup (partitioned by hash, no skew: hashes are
  * uniform); the final aggregate is partial+final.
  */
object PipelineQueries {

  private val stop = Seq("the", "a", "of", "and", "to")
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "key", "hash"),
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "row", "scan"),
    "fr" -> Seq("order", "query", "value"),
    "zh" -> Seq("spark", "join", "merge"))

  /** p01 — quality-score filter (≥ 0.4) → predicted-language filter
    * (en) → exact dedup (first doc per content hash) → corpus stats.
    * Sums are exact (long token counts, 1e9 fixed-point quality) so the
    * result is identical at any parallelism. */
  def p01_corpus_pipeline(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_ratio",
        size(filter(col("toks"), t => t.isInCollection(stop))).cast("double") /
          size(col("toks")).cast("double"))
      .withColumn("quality",
        (lit(1.0) - col("stop_ratio")) *
          least(lit(1.0), col("n_tokens").cast("double") / 100.0))
    val scored = markers.foldLeft(base) { case (df, (lg, ms)) =>
      df.withColumn(s"s_$lg",
        size(filter(col("toks"), t => t.isInCollection(ms))).cast("long"))
    }
    val best = greatest(markers.map { case (lg, _) => col(s"s_$lg") }: _*)
    val pred = markers.reverse.foldLeft(lit("??")) { case (els, (lg, _)) =>
      when(col(s"s_$lg") === best, lit(lg)).otherwise(els)
    }
    scored
      .filter(col("quality") >= 0.4 && pred === "en")
      .withColumn("rep",
        min("doc_id").over(Window.partitionBy(md5Long60(col("text")))))
      .filter(col("doc_id") === col("rep"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(floor(col("quality") * 1e9).cast("long")).as("quality_fp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_corpus_pipeline" -> (p01_corpus_pipeline _),
  )

  val oracles: Map[String, String] = Map(
    "p01_corpus_pipeline" ->
      """WITH scored AS (SELECT doc_id, text, n_tokens, quality,
           s_de, s_en, s_es, s_fr, s_zh,
           greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
         FROM (SELECT doc_id, text,
           len(toks)::BIGINT AS n_tokens,
           (1.0 - len(list_filter(toks, t -> t IN ('the','a','of','and','to')))::DOUBLE
             / len(toks)::DOUBLE) * least(1.0, len(toks)::DOUBLE / 100.0) AS quality,
           len(list_filter(toks, t -> t IN ('table','key','hash')))::BIGINT AS s_de,
           len(list_filter(toks, t -> t IN ('the','a','fast','slow')))::BIGINT AS s_en,
           len(list_filter(toks, t -> t IN ('data','row','scan')))::BIGINT AS s_es,
           len(list_filter(toks, t -> t IN ('order','query','value')))::BIGINT AS s_fr,
           len(list_filter(toks, t -> t IN ('spark','join','merge')))::BIGINT AS s_zh
           FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))),
       kept AS (SELECT doc_id, text, n_tokens, quality FROM scored
         WHERE quality >= 0.4 AND
           (CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                 WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                 ELSE 'zh' END) = 'en'),
       dedup AS (SELECT doc_id, n_tokens, quality FROM (
           SELECT doc_id, n_tokens, quality,
             min(doc_id) OVER (PARTITION BY md5(text)) AS rep FROM kept)
         WHERE doc_id = rep)
       SELECT count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(CAST(floor(quality * 1e9) AS BIGINT)) AS BIGINT) AS quality_fp
       FROM dedup""",
  )
}
