package graft.sources

/** From-spec MP3 container METADATA walk (MPEG-1 Audio Layer III frame
  * headers + the ID3v2 prefix tag): the audio-corpus bookkeeping pass —
  * frame counts, durations, byte volumes — that runs at ingest scale
  * WITHOUT decoding audio (the decode itself is float-DSP and lives
  * outside the exact-integer contract; see m35's ADPCM choice).
  *
  * Frame header (ISO/IEC 11172-3): 11 sync bits, version (MPEG-1),
  * layer (III), CRC flag, 4-bit bitrate index, 2-bit sampling-rate
  * index, padding bit; frame length = 144 · bitrate / samplerate +
  * padding (integer division — the spec's own formula). ID3v2 sizes
  * are SYNCSAFE (4 × 7 bits) and untrusted: the declared size is
  * bounds-checked as Long against the buffer before any skip. */
object Mp3 {
  /** MPEG-1 Layer III bitrates, kbps, index 1..14 (0 = free, 15 = bad). */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sampling rates, index 0..2 (3 = reserved). */
  val SampleRates: Array[Int] = Array(44100, 48000, 32000)
  val SamplesPerFrame = 1152

  def frameLength(bitrateIdx: Int, srIdx: Int, padding: Boolean): Int =
    144000 * BitrateKbps(bitrateIdx) / SampleRates(srIdx) +
      (if (padding) 1 else 0)

  /** Deterministic fixture encoder: an ID3v2.4 tag of `id3Payload`
    * junk bytes, then the given frames (header + deterministic fill).
    * Preallocated single array — this runs per corpus row. */
  def encode(id3Payload: Int, frames: Seq[(Int, Int, Boolean)]): Array[Byte] = {
    var total = 10 + id3Payload
    frames.foreach { case (bi, sr, pad) =>
      require(bi >= 1 && bi <= 14 && sr >= 0 && sr <= 2, "fixture indices")
      total += frameLength(bi, sr, pad)
    }
    val out = new Array[Byte](total)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'
    out(3) = 4 // v2.4.0, flags 0 at (4)(5) already
    // syncsafe size: 4 x 7 bits, high bit of each byte zero
    out(6) = ((id3Payload >>> 21) & 0x7F).toByte
    out(7) = ((id3Payload >>> 14) & 0x7F).toByte
    out(8) = ((id3Payload >>> 7) & 0x7F).toByte
    out(9) = (id3Payload & 0x7F).toByte
    var p = 10
    var i = 0
    while (i < id3Payload) { out(p) = ((i * 31 + 7) & 0xFF).toByte; p += 1; i += 1 }
    frames.foreach { case (bi, sr, pad) =>
      val len = frameLength(bi, sr, pad)
      out(p) = 0xFF.toByte; out(p + 1) = 0xFB.toByte // sync+MPEG-1+III+noCRC
      out(p + 2) = ((bi << 4) | (sr << 2) | (if (pad) 2 else 0)).toByte
      out(p + 3) = 0x40 // joint stereo, no emphasis
      var k = 4
      while (k < len) { out(p + k) = ((k * 17 + bi) & 0xFF).toByte; k += 1 }
      p += len
    }
    out
  }

  final case class Books(nFrames: Long, durationUs: Long, nBytes: Long)

  /** Walk the container: skip the ID3v2 tag (syncsafe size, Long
    * bounds-checked), then every frame header in sequence. Rejects
    * loudly (IllegalArgumentException) on bad sync, free-format/bad
    * bitrate, reserved sampling rate, truncated frames, mixed sampling
    * rates, or trailing garbage — a books pass must balance exactly. */
  def parse(bytes: Array[Byte]): Books = {
    var off = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      require(((bytes(6) & 0x80) | (bytes(7) & 0x80) | (bytes(8) & 0x80) |
          (bytes(9) & 0x80)) == 0,
        "ID3v2: non-syncsafe size byte")
      val size = ((bytes(6) & 0x7FL) << 21) | ((bytes(7) & 0x7FL) << 14) |
        ((bytes(8) & 0x7FL) << 7) | (bytes(9) & 0x7FL)
      require(10L + size <= bytes.length,
        s"ID3v2: declared tag size $size exceeds the ${bytes.length}-byte buffer")
      off = 10 + size.toInt
    }
    var n = 0L
    var srIdx = -1
    while (off < bytes.length) {
      require(bytes.length - off >= 4, s"truncated frame header at $off")
      require((bytes(off) & 0xFF) == 0xFF && (bytes(off + 1) & 0xFF) == 0xFB,
        f"bad frame sync at $off: ${bytes(off) & 0xFF}%02X${bytes(off + 1) & 0xFF}%02X")
      val b2 = bytes(off + 2) & 0xFF
      val bi = b2 >>> 4
      val sr = (b2 >>> 2) & 0x3
      require(bi >= 1 && bi <= 14, s"frame at $off: bitrate index $bi")
      require(sr <= 2, s"frame at $off: reserved sampling-rate index")
      require(srIdx < 0 || srIdx == sr,
        s"frame at $off: sampling rate changes mid-stream")
      srIdx = sr
      val len = frameLength(bi, sr, (b2 & 0x2) != 0)
      require(off + len <= bytes.length,
        s"frame at $off: length $len runs past the buffer")
      off += len
      n += 1
    }
    require(n > 0, "no frames")
    Books(n, n * SamplesPerFrame * 1000000L / SampleRates(srIdx),
      bytes.length.toLong)
  }
}
