package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Scratch profiler: d03 cascade cardinalities (not part of the library API). */
object ProfileD05 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        md5(col("text").cast("binary")).as("digest"))
    val groups = base.groupBy("digest")
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("gsz"))
    val members = base.join(groups, "digest")
      .select("doc_id", "rep_id", "gsz").cache()
    println(s"[card] docs=${Tables.documents(spark, sfDir).count()} reps=${members.filter(col("doc_id")===col("rep_id")).count()}")
    val reps = Tables.documents(spark, sfDir).select("doc_id", "text")
      .join(members.filter(col("doc_id") === col("rep_id"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val docs = reps
      .withColumn("hs", tokenHashes(col("text")))
      .select(col("doc_id"),
        minhashFromHashes(col("hs")).as("sig"),
        array_sort(col("hs")).as("tk"))
      .cache()
    docs.count()
    val bands0 = docs.select(col("doc_id"), col("sig"), explode(
      transform(sequence(lit(0), lit(1)), b =>
        struct(b.as("band"),
          concat_ws("_", slice(col("sig"), b * 8 + 1, lit(8))).as("key"))))
      .as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
    val hist = bands0.groupBy("band", "key").agg(count(lit(1)).as("n"))
    println("[card] top buckets:")
    hist.orderBy(col("n").desc).limit(5).collect().foreach(r => println(s"  band=${r.get(0)} n=${r.get(2)}"))
    val raw = bands0.as("x").join(bands0.as("y"),
      col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
    println(s"[card] raw band collisions=${raw.count()}")
    val est = raw.filter(graft.plans.EqCount(col("x.sig"), col("y.sig")) >= 14)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    println(s"[card] post-estimate distinct pairs=${est.count()}")
    val ver = est
      .join(docs.select(col("doc_id").as("doc_a"), col("tk").as("tka")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("tk").as("tkb")), "doc_b")
      .filter(least(size(col("tka")), size(col("tkb"))) * 100 >=
        greatest(size(col("tka")), size(col("tkb"))) * 99)
      .withColumn("inter",
        graft.plans.SortedIntersectSize(col("tka"), col("tkb")).cast("double"))
      .withColumn("jaccard", col("inter") /
        (size(col("tka")) + size(col("tkb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.99)
    println(s"[card] verified rep pairs=${ver.count()}")
    println(s"[card] avg tk size=${docs.select(avg(size(col("tk")))).first().getDouble(0)}")
    spark.stop()
  }
}
