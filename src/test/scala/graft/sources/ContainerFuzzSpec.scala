package graft.sources

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Randomized coverage for the container walks (MP4/ISO-BMFF, Ogg,
  * EBML/Matroska): random fixture shapes must round-trip exactly;
  * random garbage, truncations of real files, and single-bit flips
  * must either parse or fail with IllegalArgumentException — never
  * hang, loop, or escape with an uncontrolled error. Fixed seed. */
class ContainerFuzzSpec extends AnyFunSuite {

  private val rnd = new Random(0xB0C4D)

  private def guarded(f: => Unit): Unit =
    try f catch { case _: IllegalArgumentException => () }

  test("mp4 roundtrips across random shapes") {
    for (_ <- 1 to 60) {
      val ts = Seq(600L, 1000L, 90000L)(rnd.nextInt(3))
      val dur = rnd.nextInt(1000000).toLong
      val nt = rnd.nextInt(5) + 1
      val fp = if (rnd.nextBoolean()) rnd.nextInt(200) else -1
      val mp = rnd.nextInt(2000)
      val mm = rnd.nextInt(3)
      val bytes = Mp4.encode(ts, dur, nt, fp, mp, mm)
      val b = Mp4.parse(bytes)
      assert(b.nBytes == bytes.length && b.mdatBytes == mp &&
        b.nVideo + b.nAudio == nt && b.durationMs == dur * 1000L / ts)
    }
  }

  test("ogg roundtrips across random shapes (incl. 255-boundary packets)") {
    for (_ <- 1 to 60) {
      val np = rnd.nextInt(6) + 1
      val span = np >= 2 && rnd.nextBoolean()
      val pages = (0 until np).map { j =>
        val k = rnd.nextInt(4) + 1
        Ogg.Page((j + 1) * 1000L,
          (0 until k).map(_ => Seq(0, 1, 254, 255, 256, 510, 511)(rnd.nextInt(7))))
      }
      val bytes = Ogg.encode(rnd.nextLong() & 0xFFFFFFFFL, pages, span)
      val b = Ogg.parse(bytes)
      assert(b.nBytes == bytes.length && b.nPages == np)
      assert(b.nPackets == pages.map(_.packets.length).sum + (if (span) 1 else 0))
      assert(b.payloadBytes ==
        pages.map(_.packets.map(_.toLong).sum).sum + (if (span) 300 else 0))
    }
  }

  test("ebml roundtrips across random shapes") {
    for (_ <- 1 to 60) {
      val nc = rnd.nextInt(5) + 1
      val clusters = (0 until nc).map { c =>
        Ebml.Cluster(c * 40L,
          (0 until rnd.nextInt(4) + 1).map(_ => rnd.nextInt(400)))
      }
      val unknown = rnd.nextBoolean()
      val bytes = Ebml.encode(clusters, unknown)
      val b = Ebml.parse(bytes)
      assert(b.nBytes == bytes.length && b.nClusters == nc)
      assert(b.nBlocks == clusters.map(_.blockPayloads.length).sum)
      assert(b.blockBytes == clusters.map(_.blockPayloads.map(_.toLong).sum).sum)
    }
  }

  test("webp roundtrips across random shapes") {
    for (_ <- 1 to 60) {
      val v = rnd.nextInt(3)
      val w = rnd.nextInt(0x4000) + 1
      val h = rnd.nextInt(0x4000) + 1
      val nf = rnd.nextInt(4) + 1
      val junks = Array.fill(nf)(rnd.nextInt(9))
      val bytes = Webp.encode(v, w, h, rnd.nextBoolean(), nf, junks(_))
      val b = Webp.parse(bytes)
      assert(b.nBytes == bytes.length && b.width == w && b.height == h)
      assert(b.nFrames == (if (v == 2) nf else 1))
    }
  }

  test("srt roundtrips and garbage text never hangs or escapes") {
    for (_ <- 1 to 60) {
      val cues = (0 until rnd.nextInt(5) + 1).map { i =>
        Srt.Cue(i * 5000L, rnd.nextInt(4000) + 1L,
          (0 until rnd.nextInt(3) + 1).map(k => s"line $k"),
          malformTiming = rnd.nextInt(4) == 0)
      }
      val b = Srt.parse(Srt.encode(cues))
      assert(b.nCues + b.nBad == cues.length)
      assert(b.nBad == cues.count(_.malformTiming))
    }
    val alphabet = "01:,9 ->\nabc"
    for (_ <- 1 to 300) {
      val junk = (0 until rnd.nextInt(120)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      guarded(Srt.parse(junk))
    }
  }

  test("tar roundtrips and garbage never hangs or escapes") {
    for (_ <- 1 to 60) {
      val n = rnd.nextInt(5) + 1
      val members = (0 until n).map { i =>
        val data = Array.fill(rnd.nextInt(1200))(rnd.nextInt(256).toByte)
        (s"m$i.bin", data, rnd.nextInt(5) == 0)
      }
      val buf = members.map { case (nm, d, bad) =>
        Tar.encodeMember(nm, d, breakChecksum = bad)
      }.reduce(_ ++ _) ++ Tar.trailer
      val ms = Tar.walk(buf)
      assert(ms.length == n)
      assert(ms.count(!_.checksumOk) == members.count(_._3))
      assert(ms.map(_.size).sum == members.map(_._2.length.toLong).sum)
    }
    for (i <- 1 to 200) {
      val n = rnd.nextInt(1400) + 1
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      if (i % 2 == 0 && n > 262) {
        junk(257) = 'u'; junk(258) = 's'; junk(259) = 't'
        junk(260) = 'a'; junk(261) = 'r'
      }
      guarded { Tar.walk(junk); () }
    }
    val real = Tar.encodeMember("x.bin", Array.fill[Byte](700)(3)) ++ Tar.trailer
    for (cut <- 1 until real.length by 7) {
      guarded { Tar.walk(java.util.Arrays.copyOf(real, cut)); () }
    }
  }

  test("zip roundtrips and garbage never hangs or escapes") {
    for (_ <- 1 to 60) {
      val n = rnd.nextInt(5) + 1
      val entries = (0 until n).map { i =>
        Zip.Entry(s"e$i.bin",
          Array.fill(rnd.nextInt(900))(rnd.nextInt(256).toByte),
          breakCrc = rnd.nextInt(5) == 0)
      }
      val ms = Zip.walk(Zip.encode(entries))
      assert(ms.length == n)
      assert(ms.count(!_.crcOk) == entries.count(_.breakCrc))
      assert(ms.map(_.size).sum == entries.map(_.data.length.toLong).sum)
    }
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(400) + 1)(rnd.nextInt(256).toByte)
      guarded { Zip.walk(junk); () }
    }
    val real = Zip.encode(Seq(Zip.Entry("x.bin", Array.fill[Byte](333)(7))))
    for (cut <- 1 until real.length by 3) {
      guarded { Zip.walk(java.util.Arrays.copyOf(real, cut)); () }
    }
    for (pos <- real.indices; bit <- Seq(0, 7)) {
      val b = real.clone(); b(pos) = (b(pos) ^ (1 << bit)).toByte
      guarded { Zip.walk(b); () }
    }
  }

  test("pdf roundtrips and garbage never hangs or escapes") {
    for (_ <- 1 to 60) {
      val n = rnd.nextInt(8) + 2
      val sl = rnd.nextInt(500)
      val bad = rnd.nextBoolean()
      val b = Pdf.parse(Pdf.encode(rnd.nextInt(10), n, sl,
        rnd.nextLong() & 0xFFFFFFL, breakEntry2 = bad))
      assert(b.nObjects == n && b.streamBytes == sl)
      assert(b.nXrefBad == (if (bad) 1 else 0))
    }
    val seed = "%PDF-1.4\nstartxref\nxref\n0 %%EOF\n0123456789 n f \n"
    for (_ <- 1 to 300) {
      val junk = (0 until rnd.nextInt(200)).map(_ =>
        seed(rnd.nextInt(seed.length))).mkString.getBytes("US-ASCII")
      guarded { Pdf.parse(junk); () }
    }
    val real = Pdf.encode(4, 3, 80, 5L, breakEntry2 = false)
    for (cut <- 1 until real.length by 2) {
      guarded { Pdf.parse(java.util.Arrays.copyOf(real, cut)); () }
    }
    for (pos <- real.indices; bit <- Seq(0, 7)) {
      val b = real.clone(); b(pos) = (b(pos) ^ (1 << bit)).toByte
      guarded { Pdf.parse(b); () }
    }
  }

  test("garbage never hangs or escapes (all three walks)") {
    for (i <- 1 to 300) {
      val n = rnd.nextInt(400) + 1
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      if (i % 3 == 0 && n >= 4) {
        junk(0) = 'O'; junk(1) = 'g'; junk(2) = 'g'; junk(3) = 'S'
      }
      if (i % 3 == 1 && n >= 8) {
        junk(4) = 'm'; junk(5) = 'o'; junk(6) = 'o'; junk(7) = 'v'
      }
      guarded(Mp4.parse(junk))
      guarded(Ogg.parse(junk))
      guarded(Ebml.parse(junk))
      if (i % 4 == 0 && n >= 12) {
        junk(0) = 'R'; junk(1) = 'I'; junk(2) = 'F'; junk(3) = 'F'
        junk(8) = 'W'; junk(9) = 'E'; junk(10) = 'B'; junk(11) = 'P'
      }
      guarded(Webp.parse(junk))
    }
  }

  test("truncations of real files exercise deeper walk states") {
    val mp4 = Mp4.encode(1000L, 5000L, 2, 9, 300, 1)
    val ogg = Ogg.encode(42L,
      Seq(Ogg.Page(10L, Seq(300)), Ogg.Page(20L, Seq(40))), span = true)
    val mkv = Ebml.encode(
      Seq(Ebml.Cluster(0L, Seq(50, 260)), Ebml.Cluster(40L, Seq(30))),
      unknownSegmentSize = true)
    for (cut <- 1 until mp4.length by 3) {
      guarded(Mp4.parse(java.util.Arrays.copyOf(mp4, cut)))
    }
    for (cut <- 1 until ogg.length by 3) {
      guarded(Ogg.parse(java.util.Arrays.copyOf(ogg, cut)))
    }
    for (cut <- 1 until mkv.length by 3) {
      guarded(Ebml.parse(java.util.Arrays.copyOf(mkv, cut)))
    }
    val webp = Webp.encode(2, 40, 30, alpha = true, 3, f => f % 5)
    for (cut <- 1 until webp.length by 3) {
      guarded(Webp.parse(java.util.Arrays.copyOf(webp, cut)))
    }
  }

  test("single-bit flips never hang or escape; ogg flips always reject (CRC)") {
    val mp4 = Mp4.encode(600L, 700L, 1, -1, 64, 0)
    val ogg = Ogg.encode(7L,
      Seq(Ogg.Page(10L, Seq(30, 255)), Ogg.Page(20L, Seq(25))), span = false)
    val mkv = Ebml.encode(Seq(Ebml.Cluster(0L, Seq(40))),
      unknownSegmentSize = false)
    for (pos <- mp4.indices; bit <- Seq(0, 3, 7)) {
      val b = mp4.clone(); b(pos) = (b(pos) ^ (1 << bit)).toByte
      guarded(Mp4.parse(b))
    }
    for (pos <- mkv.indices; bit <- Seq(0, 3, 7)) {
      val b = mkv.clone(); b(pos) = (b(pos) ^ (1 << bit)).toByte
      guarded(Ebml.parse(b))
    }
    for (pos <- ogg.indices; bit <- Seq(0, 3, 7)) {
      val b = ogg.clone(); b(pos) = (b(pos) ^ (1 << bit)).toByte
      // any in-page flip lands inside some page's CRC span, so a
      // successful parse would mean the CRC failed to catch a flip
      assert(intercept[IllegalArgumentException] { Ogg.parse(b); () } != null,
        s"ogg bit flip at $pos/$bit parsed")
    }
  }
}
