package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Round-18 profiler, part 2: replicates verifiedPairs0's internals
  * stage by stage (they are private in DedupQueries) so the hot stage
  * inside the shared LSH chain is measurable. Second iteration is
  * steady-state. Scratch tool, not part of the library API. */
object ProfileR18b {
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).count()

    for (iter <- 1 to 2) {
      spark.catalog.clearCache()
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof$iter] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      // === collapsed0 ===
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"),
          md5(col("text").cast("binary")).as("digest"))
      val groups = base.groupBy("digest")
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("gsz"))
      val members = base.join(groups, "digest")
        .select("doc_id", "rep_id", "gsz").cache()
      time("collapsed: members fill")(members.count())
      val reps = Tables.documents(spark, sfDir).select("doc_id", "text")
        .join(members.filter(col("doc_id") === col("rep_id"))
          .select("doc_id"), Seq("doc_id"), "left_semi")
      // === sketch fill ===
      val r = 8
      val docs = reps
        .withColumn("hs", graft.plans.TokenHashesSorted(col("text")))
        .select(col("doc_id"),
          minhashFromHashes(col("hs"), 2 * r).as("sig"),
          col("hs").as("tk"))
        .cache()
      time("sketch: docs fill")(docs.count())
      // === band explode + triangle split histogram ===
      val bands0 = docs.select(col("doc_id"), col("sig"), col("tk"), explode(
        transform(sequence(lit(0), lit(1)), b =>
          struct(b.as("band"),
            concat_ws("_", slice(col("sig"), b * r + 1, lit(r))).as("key"))))
        .as("bk"))
        .select(col("doc_id"), col("sig"), col("tk"),
          col("bk.band"), col("bk.key"))
      val counts = bands0.groupBy("band", "key")
        .agg(count(lit(1)).as("bucket_n")).cache()
      time("lsh: bucket histogram fill")(counts.count())
      val joined = bands0.join(counts, Seq("band", "key"))
        .filter(col("bucket_n") <= 1024)
        .withColumn("bsalt", lit(0L)).withColumn("tgrp", lit(0L))
        .drop("bucket_n")
      val (pa, pb) = (col("x.tk"), col("y.tk"))
      val repPairs = joined.as("x").join(joined.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.tgrp") === col("y.tgrp") &&
            least(col("x.bsalt"), col("y.bsalt")) * 1048576L +
              greatest(col("x.bsalt"), col("y.bsalt")) === col("x.tgrp") &&
            col("x.doc_id") < col("y.doc_id"))
        .filter(graft.plans.EqCount(col("x.sig"), col("y.sig")) >= 2 * r - 2)
        .filter(least(size(pa), size(pb)) * 100 >=
          greatest(size(pa), size(pb)) * 99)
        .withColumn("inter",
          graft.plans.SortedIntersectSize(pa, pb).cast("double"))
        .withColumn("jaccard", col("inter") /
          (size(pa) + size(pb) - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.99)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("jaccard"))
        .distinct()
      time("lsh: band self-join + verify + distinct")(noop(repPairs))
      // === expand ===
      val m = members.select(col("doc_id"), col("rep_id"))
      val cross = repPairs
        .join(m.select(col("rep_id").as("doc_a"), col("doc_id").as("ma")), "doc_a")
        .join(m.select(col("rep_id").as("doc_b"), col("doc_id").as("mb")), "doc_b")
        .select(least(col("ma"), col("mb")).as("doc_a"),
          greatest(col("ma"), col("mb")).as("doc_b"), col("jaccard"))
      val dups = members.filter(col("gsz") > 1)
      val within = dups.as("x").join(dups.as("y"),
          col("x.rep_id") === col("y.rep_id") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          lit(1.0).as("jaccard"))
      val expanded = cross.unionByName(within).cache()
      time("expand: fill")(expanded.count())
      time("orderBy tail (d03 shape)")(noop(expanded.orderBy("doc_a", "doc_b")))
    }
    spark.stop()
  }
}
