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

  test("hilbert: canonical first-quadrant walk and full-curve bijectivity") {
    import RelationalQueries.hilbertLong
    // the canonical order-1 U: (0,0)→(0,1)→(1,1)→(1,0)
    assert(hilbertLong(0, 0) == 0 && hilbertLong(0, 1) == 1)
    assert(hilbertLong(1, 1) == 2 && hilbertLong(1, 0) == 3)
    // bijective over the full 128×128 domain
    val img = for (x <- 0L until 128L; y <- 0L until 128L)
      yield hilbertLong(x, y)
    assert(img.toSet.size == 16384 && img.min == 0L && img.max == 16383L)
  }

  test("hilbert: consecutive indexes are Manhattan-ADJACENT (the curve property)") {
    import RelationalQueries.hilbertLong
    val byD = new Array[(Long, Long)](16384)
    for (x <- 0L until 128L; y <- 0L until 128L)
      byD(hilbertLong(x, y).toInt) = (x, y)
    byD.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbert: q84's aligned d-window is exactly its 16x16 box") {
    import RelationalQueries.hilbertLong
    val inWindow = for (x <- 0L until 64L; y <- 0L until 80L
      if hilbertLong(x, y) >= 512 && hilbertLong(x, y) <= 767)
      yield (x, y)
    assert(inWindow.size == 256)
    assert(inWindow.forall { case (x, y) =>
      x >= 16 && x <= 31 && y >= 16 && y <= 31 })
  }

  test("hilbert beats morton on populated-domain locality (q84's reason to exist)") {
    import RelationalQueries.hilbertLong
    def meanStep(f: (Long, Long) => Long): Double = {
      val pts = (for (x <- 0L until 64L; y <- 0L until 80L)
        yield (f(x, y), (x, y))).sortBy(_._1).map(_._2)
      pts.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        (math.abs(x1 - x2) + math.abs(y1 - y2)).toDouble
      }.sum / (pts.size - 1)
    }
    val h = meanStep(hilbertLong)
    val m = meanStep(RelationalQueries.mortonLongForSpec)
    assert(h < 1.1, s"hilbert mean step $h")
    assert(m > 1.5 * h, s"morton $m not meaningfully worse than hilbert $h")
  }
}
