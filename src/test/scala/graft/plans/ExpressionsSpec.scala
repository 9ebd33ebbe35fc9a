package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom codegen expressions vs their HOF/scala references —
  * interpreted path (nullSafeEval) and codegen path must both agree. */
class ExpressionsSpec extends SparkSpec {

  test("DotProduct equals the HOF left-fold on random-ish vectors") {
    import spark.implicits._
    val a = Seq(1.5, -2.0, 3.25, 0.0, 7.125)
    val b = Seq(2.0, 4.5, -1.25, 9.0, 0.5)
    val df = Seq((a, b)).toDF("a", "b")
    val native = df.select(DotProduct(col("a"), col("b"))).head.getDouble(0)
    val hof = df.select(aggregate(zip_with(col("a"), col("b"), _ * _),
      lit(0.0), _ + _)).head.getDouble(0)
    assert(native == hof)
    assert(native == a.zip(b).map { case (x, y) => x * y }.sum)
  }

  test("SortedIntersectSize equals set-intersection size") {
    import spark.implicits._
    val a = Seq(1L, 3L, 5L, 7L, 9L, 11L)
    val b = Seq(2L, 3L, 5L, 8L, 11L, 20L)
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(SortedIntersectSize(col("a"), col("b"))).head.getInt(0)
    assert(got == a.toSet.intersect(b.toSet).size)
    // degenerate cases
    val e = Seq((Seq.empty[Long], b)).toDF("a", "b")
    assert(e.select(SortedIntersectSize(col("a"), col("b"))).head.getInt(0) == 0)
  }

  test("SimHash60 native equals the HOF formulation") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val texts = Seq("spark join merge window batch", "the a fast slow key value",
      "hash table scan row part dup dup dup")
    val df = texts.toDF("text")
      .withColumn("hs", TextFunctions.tokenHashes(col("text")))
    val native = df.select(SimHash60(col("hs"))).collect().map(_.getLong(0)).toSeq
    val hof = df.select(TextFunctions.simhashFromHashesHof(col("hs")))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
    assert(native.forall(v => v >= 0 && v < (1L << 60)))
  }


  test("TextHashKernels reproduce the declarative md5 formulations exactly") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaa aaaa bbbb", // duplicate tokens + repeated grams
      "x yy  zz ",      // double space + trailing space -> empty tokens
      "abcd",           // exactly one gram
      "ünïcødé tæxt wïth ünïcødé glyphs")
    val df = texts.toDF("text")
    // token hashes: sorted, token-distinct, hash-value duplicates kept
    val declT = df.select(array_sort(tokenHashes(col("text"))).as("h"))
      .collect().map(_.getSeq[Long](0))
    val natT = df.select(TokenHashesSorted(col("text")).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(natT.toSeq == declT.toSeq)
    // gram-hash set: string-distinct grams, value-distinct hashes, sorted
    val declG = df.select(
      array_sort(array_distinct(transform(
        array_distinct(transform(sequence(lit(1), length(col("text")) - 3),
          i => col("text").substr(i, lit(4)))),
        g => md5Long60(g)))).as("g"))
      .collect().map(_.getSeq[Long](0))
    val natG = df.select(Gram4HashSet(col("text")).as("g"))
      .collect().map(_.getSeq[Long](0))
    assert(natG.toSeq == declG.toSeq)
    // interpreted path (no codegen) agrees with the static value too
    assert(graft.plans.TextHashKernels.md5Long60("abcd".getBytes("UTF-8")) ==
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("abcd".getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString.take(15), 16))
  }


  test("MinhashSignature equals the HOF formulation, incl. empty input") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq(
      Seq(17L, 923456789L, 0L, 2147483646L, 17L),
      Seq(42L),
      Seq.empty[Long]).toDF("hs")
    val nat = df.select(minhashFromHashes(col("hs")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[java.lang.Long](0))
    val hof = df.select(minhashFromHashesHof(col("hs")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[java.lang.Long](0))
    assert(nat.toSeq == hof.toSeq)
  }


  test("Gram5TokenHashSet equals the declarative token-5-gram set") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val texts = Seq(
      "a b c d e f g h",
      "one two three four five",
      "too few tokens",
      "x  y z w v u") // double space -> empty token participates
    val df = texts.toDF("text")
    val decl = df
      .withColumn("toks", tokens(col("text")))
      .select(when(size(col("toks")) >= 5,
        array_distinct(transform(sequence(lit(1), size(col("toks")) - 4),
          i => md5Long60(concat_ws(" ", slice(col("toks"), i, lit(5)))))))
        .otherwise(array().cast("array<bigint>")).as("g"))
      .collect().map(_.getSeq[Long](0).sorted)
    val nat = df.select(Gram5TokenHashSet(col("text")).as("g"))
      .collect().map(_.getSeq[Long](0).sorted)
    assert(nat.toSeq == decl.toSeq)
  }

  test("RepetitionStats equals the nested-lambda counting formulation") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a b",      // heavy word + bigram repetition
      "x y x y x y",    // repeated bigrams with alternation
      "solo",           // single token -> zero bigrams
      "ü ü wïth glyphs ü")
    val df = texts.toDF("text")
    def topCount(xs: org.apache.spark.sql.Column) =
      array_max(transform(array_distinct(xs), u =>
        size(filter(xs, x => x === u))))
    val decl = df
      .withColumn("toks", split(col("text"), " "))
      .withColumn("grams", when(size(col("toks")) > 1,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat(element_at(col("toks"), i), lit(" "),
            element_at(col("toks"), i + 1))))
        .otherwise(array()))
      .select(size(col("toks")).cast("long"),
        size(array_distinct(col("toks"))).cast("long"),
        topCount(col("toks")).cast("long"),
        coalesce(topCount(col("grams")), lit(0L)).cast("long"))
      .collect().map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nat = df.select(graft.plans.RepetitionStats(col("text")).as("st"))
      .collect().map(_.getSeq[Long](0))
    assert(nat.toSeq == decl.toSeq)
  }
}
