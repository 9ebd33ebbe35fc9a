package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Scratch profiler for dedup hotspots (not part of the library API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    Tables.documents(spark, sfDir).count()

    // d03 stage timings (mirrors DedupQueries.verifiedPairs0)
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        md5(col("text").cast("binary")).as("digest"))
    val groups = base.groupBy("digest")
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("gsz"))
    val members = base.join(groups, "digest")
      .select("doc_id", "rep_id", "gsz").cache()
    time("collapse members fill") { members.count() }
    val reps = Tables.documents(spark, sfDir).select("doc_id", "text")
      .join(members.filter(col("doc_id") === col("rep_id"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val docs = reps
      .withColumn("hs", tokenHashes(col("text")))
      .select(col("doc_id"),
        minhashFromHashes(col("hs")).as("sig"),
        array_sort(col("hs")).as("tk"))
      .cache()
    time("sketch docs fill") { docs.count() }
    val bands0 = docs.select(col("doc_id"), explode(
      transform(sequence(lit(0), lit(1)), b =>
        struct(b.as("band"),
          concat_ws("_", slice(col("sig"), b * 8 + 1, lit(8))).as("key"))))
      .as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val counts = bands0.groupBy("band", "key")
      .agg(count(lit(1)).as("bucket_n")).cache()
    time("histogram fill") { counts.count() }
    val bands = bands0.join(counts, Seq("band", "key"))
      .withColumn("bsalt", when(col("bucket_n") > 2048,
        pmod(xxhash64(col("doc_id")),
          ceil(col("bucket_n") / lit(2048.0)))).otherwise(lit(0L)))
      .drop("bucket_n")
    val sigs = docs.select(col("doc_id"), col("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.bsalt") === col("y.bsalt") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      .filter(aggregate(zip_with(col("siga"), col("sigb"),
        (p, q) => when(p === q, 1).otherwise(0)), lit(0), _ + _) >= 14)
      .select("doc_a", "doc_b")
    time("band join + estimate prefilter") {
      cand.write.format("noop").mode("overwrite").save()
    }
    val verified = cand
      .join(docs.select(col("doc_id").as("doc_a"), col("tk").as("tka")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("tk").as("tkb")), "doc_b")
      .filter(least(size(col("tka")), size(col("tkb"))) * 100 >=
        greatest(size(col("tka")), size(col("tkb"))) * 99)
      .withColumn("inter",
        graft.plans.SortedIntersectSize(col("tka"), col("tkb")).cast("double"))
      .withColumn("jaccard", col("inter") /
        (size(col("tka")) + size(col("tkb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.99)
      .select("doc_a", "doc_b", "jaccard")
    time("verify stage") {
      verified.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
