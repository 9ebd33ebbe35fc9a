package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t34's trained NB classifier: train/serve feature-hash consistency
  * (the t22→t30 rule), a hand-checked closed-form model on a tiny
  * corpus, and eval-shape invariants at sf0.001. */
class NbTrainSpec extends SparkSpec {

  test("one hash serves train and inference, and matches md5Long60 mod B") {
    import spark.implicits._
    val df = Seq("the", "fast", "", "query").toDF("tok")
    val got = df.select(TextQueries.nbFeat(col("tok")).as("f"),
      pmod(graft.functions.TextFunctions.md5Long60(col("tok")),
        lit(TextQueries.NbBuckets.toLong)).as("g")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(got.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 1024))
  }

  test("NB decision matches the closed-form hand computation") {
    import spark.implicits._
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_t34").toString
    // train: 'aa' dominated by lang a, 'bb' by lang b; test doc 0/5/10
    // (doc_id % 5 == 0) carry an unambiguous signal token
    Seq(
      (1L, "a", "aa aa aa"), (2L, "a", "aa cc"), (6L, "a", "aa aa"),
      (3L, "b", "bb bb bb"), (4L, "b", "bb cc"), (7L, "b", "bb bb"),
      (0L, "a", "aa aa"), (5L, "b", "bb bb"), (10L, "a", "cc cc"))
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s")).withColumn("n_chars", lit(5L))
      .write.mode("overwrite")
      .parquet(new java.io.File(tmp, "documents.parquet").getAbsolutePath)
    val out = TextQueries.t34_nb_train(s, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0 ('aa aa') → a (tp), doc 5 ('bb bb') → b (tp); doc 10
    // ('cc cc'): cc count is 1 in each class, totals tie, priors tie
    // (3 docs each) → score tie → tie-break picks 'a' = actual (tp)
    assert(out("a") == (2L, 2L)) // (support, tp)
    assert(out("b") == (1L, 1L))
    assert(out("~macro")._1 == 3L && out("~macro")._2 == 3L)
  }

  test("eval shape at sf0.001: supports tie out to the held-out split") {
    val rows = TextQueries.t34_nb_train(spark, sf()).collect()
    val macroRow = rows.find(_.getString(0) == "~macro").get
    val perCls = rows.filter(_.getString(0) != "~macro")
    assert(perCls.map(_.getLong(1)).sum == macroRow.getLong(1))
    val nTest = graft.core.Tables.documents(spark, sf())
      .filter(col("doc_id") % 5 === 0).count()
    assert(macroRow.getLong(1) == nTest) // every held-out doc classified
    perCls.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // tp <= support
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L)
    }
  }
}
