package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{Avi, Jpeg}

/** Pins d25's content-defined-chunking properties and m30's demux-slice
  * fidelity:
  *
  *  - CDC re-synchronization — the reason CDC beats fixed-stride
  *    grams: prepending text to a document shifts every fixed window,
  *    but the boundary rule depends only on the trailing 8 chars, so
  *    chunk boundaries (and therefore chunk hashes) re-synchronize
  *    after at most one window. The test builds doc B = junk + A and
  *    asserts the two share dup chunks covering most of A's bytes.
  *  - boundary determinism — same text twice ⇒ 100 % dup share.
  *  - m30 slice preservation — the AVI round-trip returns the exact
  *    per-01wb sample counts the encoder was given (merging or
  *    re-splitting slices is the failure the operator exists to catch),
  *    and the drift arithmetic flags d=2 docs only.
  */
class CdcAvSyncSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val d = Files.createTempDirectory("graft_cdc").toString
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("d25: identical documents are 100% duplicated chunks") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val dir = docsDir(Seq((1L, t), (2L, t)))
    val out = DedupQueries.d25_cdc_chunks(spark, dir).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("dup_share_fp") === 1000000L)
      assert(r.getAs[Long]("n_dup_chunks") === r.getAs[Long]("n_chunks"))
    }
  }

  test("d25: boundaries re-synchronize after an inserted prefix " +
    "(the CDC property fixed-stride grams lack)") {
    val a = ("table key hash value scan merge window sort batch part " +
      "row line fast slow group order data column agg join") * 3
    val dir = docsDir(Seq((1L, a), (2L, "zzz unrelated prefix " + a)))
    val out = DedupQueries.d25_cdc_chunks(spark, dir)
      .orderBy("doc_id").collect()
    // doc 1 is a suffix of doc 2: after re-sync, most of doc 1's chunks
    // appear verbatim in doc 2 — require over half its characters dup'd
    val share1 = out(0).getAs[Long]("dup_share_fp")
    assert(share1 > 500000L,
      s"only $share1 ppm of the shared suffix deduplicated — " +
        "boundaries failed to re-synchronize")
  }

  test("m30: AVI round-trip preserves per-slice sample counts and the " +
    "drift rule flags only d=2") {
    val frames = (0 until 4).map(_ =>
      Jpeg.encodeGrayFlat(16, 16, Array(10, 20, 30, 40)))
    val slices = Array(52, 54, 56, 58) // d = 2 pattern
    val samples = Array.fill(slices.sum)(100.toShort)
    val av = Avi.decodeAv(
      Avi.encodeMjpegAv(frames, 16, 16, 10, 500, samples, slices))
    assert(av.audioSlices === slices.toSeq)
    // drift: cum − 50·(f+1) = 2, 6, 12, 20 — max 20 samples = 40 ms
    val dir = docsDir(Seq((0L, "aaaa bbbb cccc"), (1L, "dddd eeee"),
      (2L, "ffff gggg hhhh iiii")))
    val out = MultimodalQueries.m30_av_sync(spark, dir)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("max_drift_samples")).toSeq ===
      Seq(0L, 10L, 20L))
    assert(out.map(_.getAs[Long]("out_of_sync")).toSeq === Seq(0L, 0L, 1L))
  }
}
