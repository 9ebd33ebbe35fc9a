package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property test for the TopKPerKey whole-operator: on random data the
  * heap plan must emit EXACTLY the rows and ranks of the declarative
  * `row_number() OVER (PARTITION BY key ORDER BY ord DESC, tie ASC)`
  * window plan, for every k. Covers skewed key distributions, duplicate
  * ord values (tie-break path), sub-k groups, negative and extreme
  * doubles. Fixed seeds (offline scalatest bridge unavailable). */
class TopKPerKeyPropSpec extends SparkSpec {

  private val rowGen: Gen[(Long, Double, Long)] = for {
    key <- Gen.chooseNum(0L, 7L) // few keys → deep groups + ties
    // small value set forces ord collisions so ties are exercised
    ord <- Gen.oneOf(Gen.chooseNum(-5, 5).map(_ * 0.25),
      Gen.oneOf(Double.MinPositiveValue, -1e300, 1e300, 0.0))
    tie <- Gen.chooseNum(0L, 1000000L)
  } yield (key, ord, tie)

  private def dataset(seed: Long, n: Int): Seq[(Long, Double, Long)] = {
    val rows = (0 until n).flatMap(i =>
      rowGen.apply(Gen.Parameters.default, Seed(seed + i)))
    // tie must be unique per key for a deterministic total order
    rows.zipWithIndex.map { case ((k, o, _), i) => (k, o, i.toLong) }
  }

  test("heap operator == window row_number for random data and several k") {
    import spark.implicits._
    for (seed <- Seq(1L, 99L); k <- Seq(1, 3, 8)) {
      val df = dataset(seed, 300).toDF("key", "ord", "tie").repartition(5)
      val viaHeap = TopKPerKey(df, Seq("key"), "ord", "tie", k)
        .select("key", "ord", "tie", "rank")
        .collect().map(_.toSeq).sortBy(_.toString)
      val w = Window.partitionBy("key").orderBy(col("ord").desc, col("tie"))
      val viaWindow = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("key", "ord", "tie", "rank")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(viaHeap.toSeq == viaWindow.toSeq, s"seed=$seed k=$k")
    }
  }

  test("long ord ranks exactly above 2^53 (where a double cast would tie)") {
    import spark.implicits._
    // consecutive longs above 2^53 are indistinguishable after a double
    // cast (2^53 and 2^53+1 round to the same double) — the long-ord
    // path must still order them exactly, for every k and under spill
    val base = 1L << 53
    val rows = for (key <- 0L to 3L; i <- 0L until 40L)
      yield (key, base + i, key * 1000L + i) // ord strictly increasing
    for (k <- Seq(1, 5); spill <- Seq(None, Some("3"))) {
      spill.foreach(spark.conf.set(TopKPerKeyExec.SpillKeysConf, _))
      try {
        val df = rows.toDF("key", "ord", "tie").repartition(5)
        val viaHeap = TopKPerKey(df, Seq("key"), "ord", "tie", k)
          .select("key", "ord", "tie", "rank")
          .collect().map(_.toSeq).sortBy(_.toString)
        val w = Window.partitionBy("key").orderBy(col("ord").desc, col("tie"))
        val viaWindow = df
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select("key", "ord", "tie", "rank")
          .collect().map(_.toSeq).sortBy(_.toString)
        assert(viaHeap.toSeq == viaWindow.toSeq, s"long-ord k=$k spill=$spill")
        // the top-1 of each key must be the true max (base+39), which a
        // double-cast ord could not distinguish from base+32..38
        val top1 = TopKPerKey(df, Seq("key"), "ord", "tie", 1)
          .select("ord").as[Long].collect().toSet
        assert(top1 == Set(base + 39L), s"exact >2^53 max, spill=$spill")
      } finally spark.conf.unset(TopKPerKeyExec.SpillKeysConf)
    }
  }

  test("final-stage spill (forced) is oracle-identical to the in-memory path") {
    import spark.implicits._
    // 120 distinct keys against a 7-key spill budget: every partition
    // flushes several sorted runs to disk and the emit phase merge-joins
    // them with the in-memory remainder; the window oracle must match
    // exactly, including ties and sub-k groups
    spark.conf.set(TopKPerKeyExec.SpillKeysConf, "7")
    try {
      for (seed <- Seq(5L, 42L); k <- Seq(1, 4)) {
        val rows = (0 until 900).flatMap(i =>
          rowGen.apply(Gen.Parameters.default, Seed(seed + i)))
          .zipWithIndex.map { case ((_, o, _), i) =>
            ((i % 120).toLong, o, i.toLong) // many keys → spill
          }
        val df = rows.toDF("key", "ord", "tie").repartition(5)
        val viaHeap = TopKPerKey(df, Seq("key"), "ord", "tie", k)
          .select("key", "ord", "tie", "rank")
          .collect().map(_.toSeq).sortBy(_.toString)
        val w = Window.partitionBy("key").orderBy(col("ord").desc, col("tie"))
        val viaWindow = df
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select("key", "ord", "tie", "rank")
          .collect().map(_.toSeq).sortBy(_.toString)
        assert(viaHeap.toSeq == viaWindow.toSeq, s"spill seed=$seed k=$k")
      }
    } finally spark.conf.unset(TopKPerKeyExec.SpillKeysConf)
  }

  test("early-terminated consumer over a spilled run leaves no orphaned spill files") {
    import spark.implicits._
    // limit(1) abandons the merge iterator mid-run; the task-completion
    // listener must still close the run streams and delete the spill
    // files (before the fix, handles stayed open until GC)
    spark.conf.set(TopKPerKeyExec.SpillKeysConf, "5")
    try {
      val rows = (0 until 4000).map(i => ((i % 200).toLong, i.toDouble, i.toLong))
      val df = rows.toDF("key", "ord", "tie").repartition(3)
      val one = TopKPerKey(df, Seq("key"), "ord", "tie", 2).limit(1).collect()
      assert(one.length == 1)
      // spills land in THIS app's block-manager dirs; none may outlive
      // their task — poll briefly since listener cleanup is post-task.
      // Scoped to this JVM's dirs: a concurrent Spark process's own
      // temp_local files must not fail the assertion
      val localRoots = org.apache.spark.GraftSparkShims.spillLocalDirs()
      assert(localRoots.nonEmpty, "no block-manager local dirs resolved")
      def orphans(): Seq[java.io.File] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        localRoots.flatMap(walk).filter(_.getName.startsWith("temp_local"))
      }
      val deadline = System.currentTimeMillis() + 5000
      while (orphans().nonEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(orphans().isEmpty, s"orphaned spill files: ${orphans()}")
    } finally spark.conf.unset(TopKPerKeyExec.SpillKeysConf)
  }

  test("NaN ord values follow Spark sort semantics (NaN largest → rank 1 under DESC)") {
    import spark.implicits._
    // NaN must participate in a TOTAL order: Spark sorts NaN as the
    // largest double, so under ord DESC the NaN rows rank first. Raw
    // >/== comparisons would leave NaN in arbitrary insertion order.
    val rows = Seq(
      (0L, Double.NaN, 1L), (0L, 5.0, 2L), (0L, Double.NaN, 3L),
      (0L, Double.PositiveInfinity, 4L), (0L, -1.0, 5L),
      (1L, 2.0, 6L), (1L, Double.NaN, 7L), (1L, 3.0, 8L))
    val df = rows.toDF("key", "ord", "tie").repartition(3)
    // compare string forms: NaN != NaN under Seq equality
    val viaHeap = TopKPerKey(df, Seq("key"), "ord", "tie", 3)
      .select("key", "ord", "tie", "rank")
      .collect().map(_.toSeq.toString).sorted
    val w = Window.partitionBy("key").orderBy(col("ord").desc, col("tie"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("key", "ord", "tie", "rank")
      .collect().map(_.toSeq.toString).sorted
    assert(viaHeap.toSeq == viaWindow.toSeq)
    // and the NaN rows concretely outrank +Inf: key 0's ranks 1,2 are
    // the two NaN ties (tie 1 then 3), rank 3 is +Inf
    val k0 = TopKPerKey(df.filter(col("key") === 0L), Seq("key"), "ord", "tie", 3)
      .orderBy("rank").select("tie").as[Long].collect().toSeq
    assert(k0 == Seq(1L, 3L, 4L))
  }

  test("-0.0 and 0.0 tie like Spark's sort (tie column decides)") {
    import spark.implicits._
    // Spark SQL orders -0.0 == 0.0; a raw Double.compare would rank 0.0
    // strictly above -0.0 and pick the wrong row at k=1
    val rows = Seq((0L, -0.0, 1L), (0L, 0.0, 2L), (1L, 0.0, 3L), (1L, -0.0, 4L))
    val df = rows.toDF("key", "ord", "tie").repartition(2)
    val viaHeap = TopKPerKey(df, Seq("key"), "ord", "tie", 1)
      .select("key", "tie", "rank")
      .collect().map(_.toSeq.toString).sorted
    val w = Window.partitionBy("key").orderBy(col("ord").desc, col("tie"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 1)
      .select("key", "tie", "rank")
      .collect().map(_.toSeq.toString).sorted
    assert(viaHeap.toSeq == viaWindow.toSeq)
  }

  test("multi-column keys and sub-k groups") {
    import spark.implicits._
    val rows = for (a <- 0L to 2L; b <- 0L to 2L; i <- 0L until (a + b + 1))
      yield (a, b, (a * 7 + b * 3 + i).toDouble % 5.0, i)
    val df = rows.toDF("ka", "kb", "ord", "tie").repartition(3)
    val viaHeap = TopKPerKey(df, Seq("ka", "kb"), "ord", "tie", 2)
      .select("ka", "kb", "ord", "tie", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    val w = Window.partitionBy("ka", "kb").orderBy(col("ord").desc, col("tie"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2)
      .select("ka", "kb", "ord", "tie", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaHeap.toSeq == viaWindow.toSeq)
  }
}
