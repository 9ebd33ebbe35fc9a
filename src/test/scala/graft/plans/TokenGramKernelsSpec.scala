package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions.md5Long60

/** r18: the token-gram kernels must be bit-identical to the HOF chains
  * they replaced.
  *  - c12's [[TokenGramXxSorted]] vs
  *    `sort_array(transform(sequence(0, size(tk)-n),
  *       i => xxhash64(concat_ws(" ", slice(tk, i+1, n)))))`
  *    (empty array below n tokens, duplicates kept, sorted).
  *  - d15's [[TokenGramMd5Positional]] vs
  *    `transform(sequence(0, size(tk)-n),
  *       i => md5Long60(concat_ws(" ", slice(tk, i+1, n))))`
  *    (positional, duplicates kept).
  * Covers repeated grams, exact-n and below-n lengths, multi-byte
  * UTF-8 tokens, and several n values. */
class TokenGramKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b a b a b a b a b a b",          // heavy gram repetition
    "uno dos tres",                      // exactly 3 tokens
    "solo",                              // below every n
    "héllo wörld ünïcode tökens hère ågain ße",
    "x y z w v u t s r q p o n m l k j i h g f e d c b a")

  private def oldXx(tk: org.apache.spark.sql.Column, n: Int) =
    when(size(tk) >= n, sort_array(transform(
      sequence(lit(0), size(tk) - n),
      i => xxhash64(concat_ws(" ", slice(tk, i + 1, lit(n)))))))
      .otherwise(array().cast("array<long>"))

  private def oldMd5(tk: org.apache.spark.sql.Column, n: Int) =
    when(size(tk) >= n, transform(
      sequence(lit(0), size(tk) - n),
      i => md5Long60(concat_ws(" ", slice(tk, i + 1, lit(n))))))
      .otherwise(array().cast("array<long>"))

  test("TokenGramXxSorted matches the sorted xxhash64 HOF chain") {
    val df = texts.toDF("text")
      .select(split(col("text"), " ").as("tk"))
    for (n <- Seq(1, 2, 3, 4)) {
      val a = df.select(oldXx(col("tk"), n).as("g")).collect().toSeq
      val b = df.select(TokenGramXxSorted(col("tk"), n).as("g")).collect().toSeq
      assert(a == b, s"n=$n")
    }
  }

  test("TokenGramMd5Positional matches the positional md5Long60 HOF chain") {
    val df = texts.toDF("text")
      .select(split(col("text"), " ").as("tk"))
    for (n <- Seq(1, 2, 5, 10)) {
      val a = df.select(oldMd5(col("tk"), n).as("g")).collect().toSeq
      val b = df.select(TokenGramMd5Positional(col("tk"), n).as("g"))
        .collect().toSeq
      assert(a == b, s"n=$n")
    }
  }
}
