package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The data-derived parameter formulas must (a) be no-ops at the oracle
  * SFs — the gate outputs are pinned there — and (b) follow the corpus
  * at scale with the documented bounds. */
class AutoScaleSpec extends AnyFunSuite {

  test("bandBits keeps occupancy in (target/2, target] and floors at minB") {
    // gate SFs: n <= 2048 with target 8 stays at the historical 8 bits
    assert(AutoScale.bandBits(500, 8, 8, 20) == 8)
    assert(AutoScale.bandBits(2000, 8, 8, 20) == 8)
    // growth: occupancy bound holds at every step up to the cap
    for (n <- Seq(20000L, 100000L, 1000000L, 1000000000L)) {
      val b = AutoScale.bandBits(n, 8, 8, 30)
      assert((1L << b) * 8 >= n, s"occupancy above target at n=$n")
      if (b > 8) assert((1L << (b - 1)) * 8 < n, s"b not minimal at n=$n")
    }
    assert(AutoScale.bandBits(Long.MaxValue / 4, 8, 8, 20) == 20) // cap
    // exact pins at second-scale inputs: a formula edit that shifts
    // these also shifts the oracle-SF outputs (same code path) — red
    // here before the gate goes red
    assert(AutoScale.bandBits(1000000L, 8, 8, 30) == 17)
    assert(AutoScale.bandBits(1000000000L, 8, 8, 30) == 27)
    // sawtooth edge: occupancy target exactly met vs exceeded by one
    assert(AutoScale.bandBits((1L << 20) * 8, 8, 8, 30) == 20)
    assert(AutoScale.bandBits((1L << 20) * 8 + 1, 8, 8, 30) == 21)
  }

  test("log2Ceil is the exact integer ceiling") {
    assert(AutoScale.log2Ceil(1) == 0)
    assert(AutoScale.log2Ceil(2) == 1)
    assert(AutoScale.log2Ceil(3) == 2)
    assert(AutoScale.log2Ceil(1024) == 10)
    assert(AutoScale.log2Ceil(1025) == 11)
  }

  test("minhashRows is 8 at every oracle-reachable size, grows past 64k") {
    for (n <- Seq(1L, 500L, 5000L, 50000L, 65536L))
      assert(AutoScale.minhashRows(n, 8) == 8, s"changed at n=$n")
    assert(AutoScale.minhashRows(65537L, 8) == 9)
    assert(AutoScale.minhashRows(1000000000L, 8) == 15)
    // breakpoint pins: r steps exactly at powers of two of the corpus
    assert(AutoScale.minhashRows(1L << 28, 8) == 14)
    assert(AutoScale.minhashRows((1L << 28) + 1, 8) == 15)
  }

  test("bloomBits: floored at 65536, then the smallest pow2 >= 19 bits/key") {
    // gate SFs: a few thousand keys stay on the historical floor
    assert(AutoScale.bloomBits(1) == 65536)
    assert(AutoScale.bloomBits(3000) == 65536)
    // 19*3449 = 65531 <= 65536; 19*3450 = 65550 -> next pow2
    assert(AutoScale.bloomBits(3449) == 65536)
    assert(AutoScale.bloomBits(3450) == 131072)
    // growth keeps density (2 hashes) near the ~1% FP design point
    for (n <- Seq(100000L, 10000000L, 1000000000L)) {
      val m = AutoScale.bloomBits(n)
      assert(m >= 19 * n && m < 38 * n, s"m=$m out of band at n=$n")
    }
    assert(AutoScale.bloomBits(1000000000L) == (1L << 35)) // 10^9-key pin
  }

  test("compactionTarget: size-derived, parallelism floor, min-file guard, cap") {
    val MiB = 1L << 20
    // tiny table: one file, never 32 sub-4MiB shards
    assert(AutoScale.compactionTarget(300 * 1024, 32) == 1)
    // 40 MB on 32 cores: floor(40/4)=10 parallel files beat ceil(40/128)=1
    assert(AutoScale.compactionTarget(40 * MiB, 32) == 10)
    // 400 MB: full 32-way parallel read, 12.5 MiB files
    assert(AutoScale.compactionTarget(400 * MiB, 32) == 32)
    // 100 GB: size-derived 128 MiB files beat the parallelism floor
    assert(AutoScale.compactionTarget(100 * 1024 * MiB, 32) == 800)
    // 100 TB: count saturates at the cap, file SIZE grows instead
    assert(AutoScale.compactionTarget(100L * 1024 * 1024 * MiB, 4096) == 65536)
  }
}
