package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** zBoxRanges must be EXACT: the union of its z-ranges is precisely the
  * Morton image of the box — any gap, overlap, or edge off-by-one makes
  * the q43 range predicate diverge from the raw box predicate. Checked
  * against brute force over the full 128×128 domain. (Raw ScalaCheck
  * generators with fixed seeds — the scalatest bridge isn't available
  * offline, same convention as KeyAlgebraPropSpec.) */
class ZOrderSpec extends SparkSpec {

  private def mortonRef(x: Long, y: Long): Long =
    (0 until 7).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  private val boxGen = for {
    xlo <- Gen.choose(0L, 127L); xhi <- Gen.choose(xlo, 127L)
    ylo <- Gen.choose(0L, 127L); yhi <- Gen.choose(ylo, 127L)
  } yield (xlo, xhi, ylo, yhi)

  test("range union equals the brute-force Morton image of the box") {
    val boxes = (0 until 80).flatMap(i =>
      boxGen.apply(Gen.Parameters.default, Seed(7L + i))) :+
      (0L, 0L, 0L, 0L) :+ (127L, 127L, 127L, 127L) :+ (0L, 127L, 64L, 64L)
    boxes.foreach { case (xlo, xhi, ylo, yhi) =>
      val ranges = RelationalQueries.zBoxRanges(xlo, xhi, ylo, yhi)
      val viaRanges = ranges.flatMap { case (lo, hi) => lo to hi }
      val brute = (for {
        x <- xlo to xhi; y <- ylo to yhi
      } yield mortonRef(x, y)).sorted
      assert(viaRanges.size == viaRanges.distinct.size,
        s"overlapping ranges for box ($xlo,$xhi,$ylo,$yhi)")
      assert(viaRanges.sorted == brute,
        s"coverage mismatch for box ($xlo,$xhi,$ylo,$yhi)")
      ranges.sliding(2).foreach {
        case Seq((_, e0), (s1, _)) =>
          assert(s1 > e0 + 1, s"unmerged adjacent ranges at $e0/$s1")
        case _ =>
      }
    }
  }

  test("SortedRangeContains decides membership exactly at every edge") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val ranges = Seq((5L, 9L), (20L, 20L), (30L, 40L))
    val vals = Seq(4L, 5L, 7L, 9L, 10L, 19L, 20L, 21L, 29L, 30L, 40L, 41L)
    val expect = Set(5L, 7L, 9L, 20L, 30L, 40L)
    // interpreted eval AND codegen (collect drives whole-stage codegen)
    val got = vals.toDF("v")
      .filter(graft.plans.SortedRangeContains(col("v"), ranges))
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("q43 plan: pushable envelope + O(log r) membership, no OR chain") {
    val df = RelationalQueries.q43_zorder_bigmin(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(zval,153)"),
      s"envelope not pushed to the scan:\n$p")
    assert(p.toLowerCase.contains("sortedrangecontains") ||
      p.contains("graft_in_sorted_ranges"),
      s"expected the binary-search membership expression:\n$p")
  }

  test("aligned cells collapse to one range; range count stays small") {
    assert(RelationalQueries.zBoxRanges(8, 15, 24, 31) == Seq((704L, 767L)))
    assert(RelationalQueries.zBoxRanges(0, 127, 0, 127) == Seq((0L, 16383L)))
    // worst case: a maximally unaligned box is O(width+height) ranges
    // (376 measured — every perimeter cell is its own run); quadratic
    // degeneration would blow far past this
    val n = RelationalQueries.zBoxRanges(1, 126, 1, 126).size
    assert(n <= 400, s"$n ranges — decomposition degenerating")
  }
}
