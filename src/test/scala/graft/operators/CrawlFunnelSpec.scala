package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** p30's funnel books at sf0.001: stages are monotone, the mirror
  * fixture is present, and the dedup stage removes EXACTLY the mirror
  * pairs whose both URIs escaped quarantine and whose page passed the
  * quality gate — recomputed here independently from the parquet via
  * the same synth/extract pair the fixture uses. */
class CrawlFunnelSpec extends SparkSpec {

  test("funnel stages are monotone and dedup removes exactly the mirrors") {
    import graft.sources.Html
    val rows = PipelineQueries.p30_crawl_funnel(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val m = docs.map(_._1).max
    def tokens(id: Long, lang: String, source: String, text: String): Int = {
      val t = Html.extractText(Html.synth(id, lang, source, text))
      if (t.isEmpty) 0 else t.count(_ == ' ') + 1
    }
    val nMirrors = docs.count(_._1 % 23 == 0).toLong
    assert(rows("1_raw")._1 == docs.length + nMirrors)
    val surviving = docs.count { case (id, lang, source, text) =>
      id % 23 == 0 && id % 17 != 0 && (id + m + 1) % 17 != 0 &&
        tokens(id, lang, source, text) >= 12
    }.toLong
    assert(surviving > 0, "fixture lost its surviving-mirror class")
    assert(rows("3_quality")._1 - rows("4_unique")._1 == surviving)
    val ns = Seq("1_raw", "2_parsed", "3_quality", "4_unique").map(rows(_)._1)
    assert(ns == ns.sorted.reverse && ns.last > 0)
  }
}
