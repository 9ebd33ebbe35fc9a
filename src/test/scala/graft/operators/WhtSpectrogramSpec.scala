package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** m20 — the 16-point fast-WHT butterfly must equal the definition
  * X_k = Σ_i s_i·(−1)^popcount(k AND i) (natural Hadamard order), and
  * the banded energies must satisfy Parseval (Σ_k X_k² = 16·Σ_i s_i²).
  * The test replays the definition directly (no butterfly) over the
  * same text→PCM synthesis and compares per-doc band sums, covering
  * tail-drop (len % 16 ≠ 0) and the nw = 0 short-doc edge. */
class WhtSpectrogramSpec extends SparkSpec {

  private def pcm(text: String): Array[Long] =
    text.getBytes("US-ASCII").map(b => (((b & 0xFF) - 96) * 128).toLong)

  /** Definition-order WHT of one 16-sample window. */
  private def whtDef(s: Array[Long]): Array[Long] =
    Array.tabulate(16) { k =>
      var acc = 0L
      var i = 0
      while (i < 16) {
        val sign = if (java.lang.Integer.bitCount(k & i) % 2 == 0) 1L else -1L
        acc += sign * s(i)
        i += 1
      }
      acc
    }

  private def bandsDef(text: String): (Long, Array[Long]) = {
    val s = pcm(text)
    val nw = s.length / 16
    val bands = new Array[Long](4)
    for (w <- 0 until nw) {
      val x = whtDef(s.slice(16 * w, 16 * w + 16))
      for (k <- 0 until 16) bands(k / 4) += x(k) * x(k)
    }
    (nw.toLong, bands)
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_wht").toString
    import spark.implicits._
    Seq(
      (0L, "short", "en", "web", 5L), // len 5 < 16 → nw = 0, all bands 0
      (1L, "The quick brown fox jumps over the lazy dog!", "en", "web", 44L),
      (2L, "a" * 32, "en", "web", 32L), // exact multiple, constant signal
      (3L, "Mixed CASE with digits 0123456789 and punct !?;:", "en", "web", 48L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("butterfly output matches the popcount definition per band") {
    val rows = MultimodalQueries.m20_wht_spectrogram(spark, dir).collect()
    val texts = Map(0L -> "short",
      1L -> "The quick brown fox jumps over the lazy dog!",
      2L -> "a" * 32,
      3L -> "Mixed CASE with digits 0123456789 and punct !?;:")
    assert(rows.length == 4)
    rows.foreach { r =>
      val (nw, b) = bandsDef(texts(r.getLong(0)))
      assert(r.getLong(1) == nw, s"doc ${r.getLong(0)} n_windows")
      for (k <- 0 until 4)
        assert(r.getLong(2 + k) == b(k), s"doc ${r.getLong(0)} band$k")
    }
  }

  test("Parseval: band total equals 16 × in-window sample energy") {
    val rows = MultimodalQueries.m20_wht_spectrogram(spark, dir).collect()
    val texts = Map(0L -> "short",
      1L -> "The quick brown fox jumps over the lazy dog!",
      2L -> "a" * 32,
      3L -> "Mixed CASE with digits 0123456789 and punct !?;:")
    rows.foreach { r =>
      val s = pcm(texts(r.getLong(0)))
      val nw = s.length / 16
      val energy = s.take(16 * nw).map(v => v * v).sum
      val total = (2 to 5).map(r.getLong).sum
      assert(total == 16L * energy, s"doc ${r.getLong(0)} Parseval")
    }
  }

  test("short doc (nw = 0) emits zero bands; constant signal is pure DC") {
    val rows = MultimodalQueries.m20_wht_spectrogram(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val shortDoc = rows(0L)
    assert(shortDoc.getLong(1) == 0L &&
      (2 to 5).forall(shortDoc.getLong(_) == 0L))
    // "a"*32: every sample equal → only X_0 ≠ 0 → all energy in band0
    val const = rows(2L)
    assert(const.getLong(1) == 2L)
    assert(const.getLong(2) > 0L &&
      (3 to 5).forall(const.getLong(_) == 0L))
  }
}
