package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.core.Tables
import graft.functions.KeyAlgebra

/** Round-19 optimization profiler: stage-level timings for
  *  (a) the shared dedup chain (collapse → sketch → LSH verify →
  *      closure → consumer tails) that the whole d14/d22/d24/p13/p27
  *      family pays cold in every bench rep, and
  *  (b) the q48-shaped file-source streaming harness, phase by phase
  *      (bounds agg, drop writes, per-micro-batch engine time, collect),
  * so round-19 effort lands on the measured hot phase. Scratch tool,
  * not part of the library API. */
object ProfileR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def reset(): Unit = {
      graft.core.SessionMemo.clear(spark)
      spark.catalog.clearCache()
    }
    def time1(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $name: $t%.2f s")
      t
    }
    // warm-up (Bench posture)
    Tables.all.foreach { t =>
      try Tables.t(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    noop(Tables.documents(spark, sfDir).limit(10))

    val what = if (args.isEmpty) Set("dedup", "stream") else args.toSet

    if (what("sub")) {
      // fine-grained replica of verifiedPairs0's stages (scratch copy,
      // kept in lockstep with DedupQueries)
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions._
      for (round <- 1 to 2) {
        println(s"--- verifiedPairs sub-stages, pass $round ---")
        reset()
        val base = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"),
            md5(col("text").cast("binary")).as("digest"))
        val groups = base.groupBy("digest")
          .agg(min("doc_id").as("rep_id"), count(lit(1)).as("gsz"))
        val members = base.join(groups, "digest")
          .select("doc_id", "rep_id", "gsz").cache()
        time1("sub: members cache fill") { members.count() }
        val reps = Tables.documents(spark, sfDir).select("doc_id", "text")
          .join(members.filter(col("doc_id") === col("rep_id"))
            .select("doc_id"), Seq("doc_id"), "left_semi")
        val r = 8
        val docsNoCache = reps
          .withColumn("hs", graft.plans.TokenHashesSorted(col("text")))
          .select(col("doc_id"),
            minhashFromHashes(col("hs"), 2 * r).as("sig"),
            col("hs").as("tk"))
        time1("sub: tokenize+sketch noop (no cache)") {
          noop(docsNoCache)
        }
        val docs = docsNoCache.cache()
        time1("sub: docs cache fill (count)") { docs.count() }
        val bands0 = docs.select(col("doc_id"), col("sig"), col("tk"), explode(
          transform(sequence(lit(0), lit(1)), b =>
            struct(b.as("band"),
              concat_ws("_", slice(col("sig"), b * r + 1, lit(r))).as("key"))))
          .as("bk"))
          .select(col("doc_id"), col("sig"), col("tk"),
            col("bk.band"), col("bk.key"))
        val counts = bands0.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("bucket_n")).cache()
        time1("sub: bucket counts cache fill") { counts.count() }
        val joined = bands0.join(counts, Seq("band", "key"))
          .withColumn("bsalt", lit(0L)).withColumn("tgrp", lit(0L))
          .drop("bucket_n")
        val pairs = joined.as("x").join(joined.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
              col("x.tgrp") === col("y.tgrp") &&
              col("x.doc_id") < col("y.doc_id"))
          .filter(graft.plans.EqCount(col("x.sig"), col("y.sig")) >= 2 * r - 2)
          .filter(least(size(col("x.tk")), size(col("y.tk"))) * 100 >=
            greatest(size(col("x.tk")), size(col("y.tk"))) * 99)
          .withColumn("inter",
            graft.plans.SortedIntersectSize(col("x.tk"), col("y.tk")).cast("double"))
          .withColumn("jaccard", col("inter") /
            (size(col("x.tk")) + size(col("y.tk")) - col("inter")).cast("double"))
          .filter(col("jaccard") >= 0.99)
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            col("jaccard"))
          .distinct()
        time1("sub: band self-join + verify + distinct (approx, no split)") {
          noop(pairs)
        }
        members.unpersist(); docs.unpersist(); counts.unpersist()
      }
    }

    if (what("dedup")) {
      import graft.operators.DedupQueries
      // run twice: first pass absorbs JIT, read the second
      for (round <- 1 to 2) {
        println(s"--- dedup chain, pass $round ---")
        reset()
        // stage 1: exact collapse (members cache fill happens inside)
        time1("collapsed (md5 groupBy + members cache)") {
          noop(DedupQueries.d01_dedup_exact(spark, sfDir).limit(1))
        }
        reset()
        time1("d03 cold total (collapse+sketch+LSH+expand)") {
          noop(DedupQueries.d03_minhash_lsh(spark, sfDir))
        }
        // memo is now warm: closure alone
        time1("closure on memoized pairs (labels+checkpoint)") {
          noop(DedupQueries.d14_dedup_components(spark, sfDir))
        }
        time1("d14 tail (memoized labels)") {
          noop(DedupQueries.d14_dedup_components(spark, sfDir))
        }
        time1("d24 tail (memoized labels)") {
          noop(DedupQueries.d24_cluster_histogram(spark, sfDir))
        }
        time1("d22 tail (memoized labels)") {
          noop(DedupQueries.d22_cluster_keep_best(spark, sfDir))
        }
        time1("p27 tail (memoized labels)") {
          noop(graft.operators.PipelineQueries.p27_dedup_reweight(spark, sfDir))
        }
        time1("p13 tail (memoized labels)") {
          noop(DedupQueries.p13_dedup_aware_sample(spark, sfDir))
        }
      }
    }

    if (what("stream")) {
      // q48 phase profile: inline copy of q48_outer_join_filesource0 with
      // per-phase timing (kept in lockstep with StreamQueries — scratch)
      import spark.implicits._
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      for (round <- 1 to 2) {
        println(s"--- q48 phases, pass $round ---")
        reset()
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try {
          val ev = Tables.events(spark, sfDir)
            .filter(col("event_type").isin("click", "purchase"))
            .select(col("ts").as("tns"), col("event_id"), col("user_id"),
              col("event_type"))
          var lo = 0L; var hi = 0L
          time1("q48: tsBounds agg") {
            val r = ev.agg(min("tns").as("lo"), max("tns").as("hi")).head()
            lo = r.getLong(0); hi = r.getLong(1)
          }
          val splitTs = lo + (hi - lo) / 2
          val sentinelNs = hi + (86400L + 7200L) * 1000000000L
          val cSchema = StructType(Seq(
            StructField("ctns", LongType), StructField("click_id", LongType),
            StructField("c_user", LongType)))
          val pSchema = StructType(Seq(
            StructField("ptns", LongType), StructField("purchase_id", LongType),
            StructField("p_user", LongType)))
          val watchC = java.nio.file.Files.createTempDirectory("prof_q48_c").toString
          val watchP = java.nio.file.Files.createTempDirectory("prof_q48_p").toString
          try {
            val clicks = spark.readStream.schema(cSchema).parquet(watchC)
              .withColumn("cts", timestamp_micros(KeyAlgebra.ldiv(col("ctns"), lit(1000L))))
              .withWatermark("cts", "0 seconds")
            val purchases = spark.readStream.schema(pSchema).parquet(watchP)
              .withColumn("pts", timestamp_micros(KeyAlgebra.ldiv(col("ptns"), lit(1000L))))
              .withWatermark("pts", "0 seconds")
            val joined = clicks.join(purchases,
                expr("c_user = p_user AND pts BETWEEN cts - INTERVAL 24 HOURS AND cts"),
                "leftOuter")
              .select(col("click_id"),
                coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
                col("c_user").as("user_id"),
                coalesce(KeyAlgebra.ldiv(col("ctns"), lit(1000L)) -
                  KeyAlgebra.ldiv(col("ptns"), lit(1000L)), lit(-1L)).as("lag_us"))
            var q: org.apache.spark.sql.streaming.StreamingQuery = null
            val ckptBase = sys.env.get("PROF_CKPT_BASE")
            time1("q48: stream start") {
              val w0 = joined.writeStream.outputMode(OutputMode.Append)
                .format("memory").queryName("prof_q48_out")
              val w = ckptBase.fold(w0)(b => w0.option("checkpointLocation",
                java.nio.file.Files.createTempDirectory(
                  java.nio.file.Paths.get(b), "prof_ckpt").toString))
              q = w.start()
            }
            // mirrors StreamQueries.stageDrop (r19): stage both sides,
            // then rename both in back-to-back, then process
            def stageSide(p: Column, typ: String, dst: String, tag: String,
                names: Seq[String]): () => Unit = {
              val stage = java.nio.file.Files.createTempDirectory(s"prof_stage_$tag")
              ev.filter(p && col("event_type") === typ)
                .select(col("tns").as(names(0)), col("event_id").as(names(1)),
                  col("user_id").as(names(2)))
                .coalesce(4).write.mode("overwrite").parquet(stage.toString)
              () => {
                val d = java.nio.file.Paths.get(dst)
                Option(stage.toFile.listFiles()).getOrElse(Array.empty)
                  .filter(_.getName.endsWith(".parquet")).foreach { f =>
                    java.nio.file.Files.move(f.toPath,
                      d.resolve(s"$tag-${f.getName}"))
                  }
                org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
              }
            }
            try {
              var i = 0
              Seq(col("tns") <= splitTs, col("tns") > splitTs).foreach { p =>
                i += 1
                time1(s"q48: drop $i writes") {
                  val mvC = stageSide(p, "click", watchC, s"c$i",
                    Seq("ctns", "click_id", "c_user"))
                  val mvP = stageSide(p, "purchase", watchP, s"p$i",
                    Seq("ptns", "purchase_id", "p_user"))
                  mvC(); mvP()
                }
                time1(s"q48: micro-batch $i") { q.processAllAvailable() }
                q.recentProgress.foreach(pr =>
                  println(s"[prof] q48 progress: batch=${pr.batchId} " +
                    s"durationMs=${pr.durationMs} " +
                    s"stateRows=${pr.stateOperators.map(_.numRowsTotal).mkString(",")} " +
                    s"stateCommitMs=${pr.stateOperators.map(_.commitTimeMs).mkString(",")}"))
              }
              time1("q48: sentinel writes") {
                Seq((sentinelNs, -1L, -1L)).toDF("ctns", "click_id", "c_user")
                  .write.mode("append").parquet(watchC)
                Seq((sentinelNs, -1L, -1L)).toDF("ptns", "purchase_id", "p_user")
                  .write.mode("append").parquet(watchP)
              }
              time1("q48: micro-batch 3 (sentinel)") { q.processAllAvailable() }
            } finally q.stop()
            time1("q48: collect + reparallelize + sort") {
              val sink = spark.table("prof_q48_out").filter(col("user_id") >= 0L)
              val result = sink.collect().toIndexedSeq
              val schemaOut = sink.schema
              spark.catalog.dropTempView("prof_q48_out")
              noop(spark.createDataFrame(
                spark.sparkContext.parallelize(result, 1), schemaOut)
                .orderBy("click_id", "purchase_id"))
            }
          } finally {
            org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(watchC))
            org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(watchP))
          }
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
    }
    spark.stop()
  }
}
