package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Edge-case regression: an EMPTY document must not crash the PGM codec
  * family (m03/m04/m06) — the encode pads to one all-zero row, whose
  * decode-side features are all zeros (exactly what the DuckDB oracles
  * compute for empty text, where every ascii('') tap is 0). */
class MultimodalEdgeSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_mm_edge").toString
    import spark.implicits._
    Seq(
      (0L, "", "en", "web", 0L),
      (1L, "abc", "en", "web", 3L),
      (2L, "abc", "en", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("m03/m04 survive an empty document and emit zero features for it") {
    val m3 = MultimodalQueries.m03_resize_sample(spark, dir).collect()
    assert(m3.length == 3)
    assert(m3.head.getLong(0) == 0L && m3.head.getLong(2) == 0L) // byte_sum 0
    val m4 = MultimodalQueries.m04_resize_bilinear(spark, dir).collect()
    assert(m4.length == 3)
    assert(m4.head.getLong(0) == 0L && m4.head.getLong(2) == 0L) // bl_sum 0
  }

  test("m07 survives an empty document; frame walk sees all-zero frames") {
    val m7 = MultimodalQueries.m07_video_motion(spark, dir).collect()
    assert(m7.length == 3)
    // empty doc: len%6+2 = 2 zero frames → luma0 = 0, motion = 0
    assert(m7.head.getLong(1) == 2L && m7.head.getLong(2) == 0L &&
      m7.head.getLong(3) == 0L)
  }

  test("m09 survives an empty document: one all-zero band of 4 patches") {
    val m9 = MultimodalQueries.m09_vit_patches(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val empty = m9.filter(_._1 == 0L)
    // empty doc → h = 1 → a single short band, 4 patches of 8 px, all 0
    assert(empty.length == 4)
    assert(empty.forall(p => p._4 == 8L && p._5 == 0L && p._6 == 0L))
    // "abc": 3 bytes pad to one 32-px row: a b c then 29× 'c'
    val abc = m9.filter(t => t._1 == 1L && t._3 == 0L).head
    assert(abc._5 == ('a' + 'b' + 6 * 'c').toLong)
  }

  test("m10: identical pair scores exactly 1e6; empty-vs-text stays defined") {
    val d = Files.createTempDirectory("graft_m10_edge").toString
    import spark.implicits._
    Seq(
      (0L, "same text here", "en", "web", 14L),
      (1L, "same text here", "en", "web", 14L), // pair 0: identical
      (2L, "", "en", "web", 0L),
      (3L, "totally different words", "en", "web", 23L)) // pair 2: 0 vs text
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = MultimodalQueries.m10_patch_ssim(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(rows.toSeq.map(_._1) == Seq(0L, 2L))
    assert(rows.head._2 == 1000000L) // identical images: exact unity
    // the all-zero image drives the luminance term to ~0 but stays
    // finite and deterministic via the stabilizer constants
    assert(rows(1)._2 < 1000000L)
  }

  test("m06 survives an empty document; identical docs pair in BOTH containers") {
    // since the JPEG routing (odd ids -> jpegGrid) identical text only
    // yields identical images at equal parity: 1/3 pair through the
    // JPEG path, 2/4 through the PGM path; the empty doc (id 0, PGM)
    // hashes to 0, which may band-collide but must not crash
    val d = Files.createTempDirectory("graft_m06_edge").toString
    import spark.implicits._
    Seq(
      (0L, "", "en", "web", 0L),
      (1L, "abc", "en", "web", 3L),
      (3L, "abc", "en", "web", 3L),
      (2L, "xyz pq", "en", "web", 6L),
      (4L, "xyz pq", "en", "web", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = MultimodalQueries.m06_image_dhash(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 3L, 0L)), "JPEG-path identical pair")
    assert(pairs.contains((2L, 4L, 0L)), "PGM-path identical pair")
  }

  private lazy val audioDir: String = {
    val d = Files.createTempDirectory("graft_m08_edge").toString
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and more"
    Seq(
      (0L, "", "en", "web", 0L),          // below the 33-sample floor
      (1L, "short", "en", "web", 5L),     // below the floor too
      (2L, base, "en", "web", base.length.toLong),
      (3L, base, "en", "web", base.length.toLong), // exact audio dup
      (4L, base.replace("quick", "quack"), "en", "web", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("m11: blank and solid images are dropped, textured text is kept") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_m11").toString
    val textured = "the quick brown fox JUMPS over 13 lazy dogs! " * 3
    Seq(
      (0L, "", "en", "web", 0L),              // all-zero row: contrast 0
      (1L, "aaaaaaaaaaaaaaaaaaaa", "en", "web", 20L), // solid tone
      (2L, textured, "en", "web", textured.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = MultimodalQueries.m11_histogram_gate(spark, d)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    // empty doc: one all-zero 32px row -> contrast 0, dominant 100%
    assert(got(0L) === ((32L, 0L, 1000000L, 0L)))
    // solid 'a' padded with 'a': one bin, zero contrast -> dropped
    assert(got(1L)._2 === 0L && got(1L)._3 === 1000000L && got(1L)._4 === 0L)
    // mixed-case + digits + punctuation: wide histogram -> kept
    assert(got(2L)._2 >= 16L && got(2L)._3 < 750000L && got(2L)._4 === 1L)
  }

  test("m12: VAD islands match a hand-built frame pattern; empty clip is silent") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_m12").toString
    // 'a' frames: |(97-96)*128| = 128 < 3072 (unvoiced); '0' frames:
    // |(48-96)*128| = 6144 >= 3072 (voiced). Pattern u,u,v,u,u,v,v.
    val t = "a" * 64 + "0" * 32 + "a" * 64 + "0" * 64
    Seq((0L, "", "en", "web", 0L), (1L, t, "en", "web", t.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = MultimodalQueries.m12_vad_segments(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(0L) === ((0L, 0L, 0L, 0L, 0L)))
    assert(got(1L) === ((7L, 3L, 2L, 2L, 3L * 1000000L / 7L)))
  }

  test("m21: identical images pair at hamming 0; empty doc survives; level shift preserved") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_m21").toString
    // 2/4: identical text, BOTH even -> same PGM image -> hamming 0.
    // 3/5: identical text, both odd -> same JPEG image -> hamming 0.
    // 7: the 3/5 text with every byte level-shifted by a constant —
    //    block-mean bits are unchanged (rank order of block sums is
    //    shift-invariant), so 7 pairs with 3 and 5 at hamming 0 too.
    val base = ('a' to 'z').mkString * 8
    val shifted = base.map(c => (c + 1).toChar).mkString
    Seq((0L, "", "en", "web", 0L),
      (2L, base, "en", "web", base.length.toLong),
      (4L, base, "en", "web", base.length.toLong),
      (3L, base, "en", "web", base.length.toLong),
      (5L, base, "en", "web", base.length.toLong),
      (7L, shifted, "en", "web", shifted.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = MultimodalQueries.m21_block_phash(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((2L, 4L, 0L)), s"PGM twin missing: $pairs")
    assert(pairs.contains((3L, 5L, 0L)), s"JPEG twin missing: $pairs")
    assert(pairs.contains((3L, 7L, 0L)) && pairs.contains((5L, 7L, 0L)),
      s"level-shift invariance lost: $pairs")
    // PGM and JPEG builders lay pixels out differently — the cross-
    // format pair must NOT collide at hamming 0 for non-trivial text
    assert(!pairs.contains((2L, 3L, 0L)))
    pairs.foreach { case (a, b, h) => assert(a < b && h >= 0 && h <= 6) }
  }

  test("m08: sub-segment clips are excluded; identical clips pair at hamming 0") {
    val pairs = MultimodalQueries.m08_audio_fingerprint(spark, audioDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((2L, 3L, 0L)), s"exact dup missing: ${pairs.toList}")
    // the <33-char clips never reach the band join
    assert(pairs.forall { case (a, b, _) => a >= 2 && b >= 2 })
    // every emitted pair respects ordering and the verify threshold
    assert(pairs.forall { case (a, b, h) => a < b && h >= 0 && h <= 4 })
  }
}
