package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-18 optimization profiler: stage-level timings for the shared
  * dedup chain (exact-collapse → LSH verified pairs → component
  * closure) that d03/d05/d07/d14/d20/d22/d24/p13/p27 all ride, so the
  * optimization effort lands on the measured hot stage instead of the
  * per-query symptom. Each step runs TWICE (cold chain each time); the
  * second reading is steady-state (JIT/codegen warm). Scratch tool,
  * not part of the library API. */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def reset(): Unit = {
      graft.core.SessionMemo.clear(spark)
      spark.catalog.clearCache()
    }
    def time2(name: String, cold: Boolean = true)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        if (cold) reset()
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name: ${ts(0)}%.2f s / ${ts(1)}%.2f s (2nd is steady)")
    }
    // warm-up (Bench's posture)
    Tables.documents(spark, sfDir).count()
    noop(Tables.documents(spark, sfDir).limit(10))

    import graft.operators.{DedupQueries, GraphComponents, SimilarityQueries}
    time2("d03 cold (collapsed+sketch+LSH)") {
      noop(DedupQueries.d03_minhash_lsh(spark, sfDir))
    }
    // pairs stay memoized from the last d03 run above
    val pairs = DedupQueries.d03_minhash_lsh(spark, sfDir)
      .select("doc_a", "doc_b")
    println("[prof] pair count: " + pairs.count())
    time2("closure on memoized pairs", cold = false) {
      GraphComponents.labels(pairs).write.format("noop")
        .mode("overwrite").save()
    }
    time2("d14 warm (memoized chain)", cold = false) {
      noop(DedupQueries.d14_dedup_components(spark, sfDir))
    }
    time2("d14 cold (full chain)") {
      noop(DedupQueries.d14_dedup_components(spark, sfDir))
    }
    // p13 warm tail: chain memoized by the previous cold run
    time2("p13 warm tail", cold = false) {
      noop(DedupQueries.p13_dedup_aware_sample(spark, sfDir))
    }
    time2("p13 cold (full chain)") {
      noop(DedupQueries.p13_dedup_aware_sample(spark, sfDir))
    }
    time2("d22 warm tail", cold = false) {
      noop(DedupQueries.d22_cluster_keep_best(spark, sfDir))
    }
    time2("d24 warm tail", cold = false) {
      noop(DedupQueries.d24_cluster_histogram(spark, sfDir))
    }
    time2("d05 cold") {
      noop(DedupQueries.d05_ngram_jaccard(spark, sfDir))
    }
    time2("d07 warm tail", cold = false) {
      noop(DedupQueries.d07_dedup_apply(spark, sfDir))
    }
    time2("d21 cold") {
      noop(DedupQueries.d21_substring_spans(spark, sfDir))
    }
    time2("d20 cold") {
      noop(SimilarityQueries.d20_knn_clusters(spark, sfDir))
    }
    spark.stop()
  }
}
