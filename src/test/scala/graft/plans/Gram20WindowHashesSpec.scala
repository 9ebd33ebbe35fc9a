package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r18: d21's window-hash kernel must be bit-identical to the
  * expression chain it replaced — xxhash64(substr(p, 20)) per 1-based
  * position, and the seeded twin xxhash64(substr(p, 20), lit(7)) must
  * equal XXH64.hashInt(7, g1) (Spark folds multi-arg xxhash64
  * left-to-right). Covers ASCII, multi-byte UTF-8, exact-20 and
  * shorter-than-20 edge lengths. */
class Gram20WindowHashesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog near the river bank",
    "exactly twenty chars",          // length 20: one window
    "nineteen character!",           // length 19: no window
    "",                              // empty
    "héllo wörld with ünïcode — mültibyte chars stretching past twenty",
    "ααββγγδδεεζζηηθθιικκλλμμννξξοοππ", // 2-byte greek, 32 chars
    "a" * 25)

  test("kernel matches xxhash64(substr) per position, both seeds") {
    val df = texts.toDF("text")
    val K = 20
    val old = df
      .select(col("text"), explode(
        when(length(col("text")) < K, array().cast("array<int>"))
          .otherwise(sequence(lit(1), (length(col("text")) - (K - 1)).cast("int"))))
        .as("p"))
      .select(col("text"), col("p").cast("long").as("p"),
        xxhash64(col("text").substr(col("p"), lit(K))).as("g1"),
        xxhash64(col("text").substr(col("p"), lit(K)), lit(7)).as("g2"))
    val kern = df
      .select(col("text"), posexplode(Gram20WindowHashes(col("text"))))
      .select(col("text"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("g1"), Xx64IntWithSeed(7, col("col")).as("g2"))
    val a = old.orderBy("text", "p").collect().toSeq
    val b = kern.orderBy("text", "p").collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }
}
