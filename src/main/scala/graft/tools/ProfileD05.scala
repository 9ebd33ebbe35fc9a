package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Stage-level profile of the d05 pipeline (scratch tool). */
object ProfileD05 {
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
    val docs = Tables.documents(spark, sfDir)
      .withColumn("hs", tokenHashes(col("text")))
      .select(col("doc_id"),
        minhashFromHashes(col("hs")).as("sig"),
        array_sort(array_distinct(transform(
          array_distinct(transform(sequence(lit(1), length(col("text")) - 3),
            i => col("text").substr(i, lit(4)))),
          g => md5Long60(g)))).as("grams"))
      .cache()
    time("cache fill (sig+grams)") { docs.count() }
    val bands = docs.select(col("doc_id"), explode(
      transform(sequence(lit(0), lit(1)), b =>
        struct(b.as("band"),
          concat_ws("_", slice(col("sig"), b * 8 + 1, lit(8))).as("key"))))
      .as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val cand0 = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    time("band join (no distinct)") { cand0.write.format("noop").mode("overwrite").save() }
    val cand1 = cand0.distinct()
    time("+ distinct") { cand1.write.format("noop").mode("overwrite").save() }
    val sigs = docs.select(col("doc_id"), col("sig"))
    val cand2 = cand1
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      .filter(aggregate(zip_with(col("siga"), col("sigb"),
        (p, q) => when(p === q, 1).otherwise(0)), lit(0), _ + _) >= 14)
      .select("doc_a", "doc_b")
    time("+ est prefilter") { cand2.write.format("noop").mode("overwrite").save() }
    println(s"[prof] survivors: ${cand2.count()}")
    val verified = cand2
      .join(docs.select(col("doc_id").as("doc_a"), col("grams").as("ga")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("grams").as("gb")), "doc_b")
      .withColumn("inter", graft.plans.SortedIntersectSize(col("ga"), col("gb")).cast("double"))
      .withColumn("jaccard4", col("inter") /
        (size(col("ga")) + size(col("gb")) - col("inter")).cast("double"))
      .filter(col("jaccard4") >= 0.9)
    time("+ gram verify") { verified.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
