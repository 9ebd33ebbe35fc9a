package graft.operators
// placed in graft.operators for access to the package-private split helpers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Scratch profiler: d05 stage timings (not part of the library API). */
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
      .withColumn("g4", graft.plans.Gram4HashSet(col("text")))
      .select(col("doc_id"),
        minhashFromHashes(col("g4")).as("sig"),
        col("g4").as("grams"))
      .cache()
    time("gram sketch fill") { docs.count() }
    println("[prof] avg grams/doc: " +
      docs.select(avg(size(col("grams")))).first().getDouble(0))
    val bands0 = docs.select(col("doc_id"), col("sig"), col("grams"), explode(
      transform(sequence(lit(0), lit(1)), b =>
        struct(b.as("band"),
          concat_ws("_", slice(col("sig"), b * 8 + 1, lit(8))).as("key"))))
      .as("bk"))
      .select(col("doc_id"), col("sig"), col("grams"),
        col("bk.band"), col("bk.key"))
    val bands = DedupQueries.triangleSplit(
      bands0, "doc_id", DedupQueries.BucketCap, "band", "key")
    val verified = bands.as("x").join(bands.as("y"),
        DedupQueries.triangleCond("doc_id", "band", "key"))
      .filter(graft.plans.EqCount(col("x.sig"), col("y.sig")) >= 14)
      .filter(least(size(col("x.grams")), size(col("y.grams"))) * 10 >=
        greatest(size(col("x.grams")), size(col("y.grams"))) * 9)
      .withColumn("inter",
        graft.plans.SortedIntersectSize(col("x.grams"), col("y.grams")).cast("double"))
      .withColumn("jaccard4", col("inter") /
        (size(col("x.grams")) + size(col("y.grams")) - col("inter")).cast("double"))
      .filter(col("jaccard4") >= 0.9)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("jaccard4"))
      .distinct()
    time("band join + inline verify") {
      verified.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
