package graft.sources

import java.io.ByteArrayOutputStream

/** From-spec AIFF / AIFF-C (Apple "Audio Interchange File Format",
  * EA IFF 85 container): the BIG-endian sibling of RIFF/WAVE that
  * scientific and broadcast archives still ship. Structure: FORM chunk
  * wrapping typed sub-chunks (4-byte id + u32 size + data, odd sizes
  * padded); COMM carries channels / sample frames / bit depth and the
  * sample rate as an 80-bit IEEE EXTENDED float (the format's one
  * genuinely exotic field); SSND carries the PCM payload. AIFF-C adds
  * an FVER chunk and a compression type in COMM — 'NONE'/'twos' is
  * big-endian PCM, 'sowt' ("twos" reversed) is little-endian PCM, the
  * variant every Mac-originated file uses. Implemented from the public
  * specification (AIFF-1.3 / AIFF-C draft); the reference engine has no
  * media path (LLM-pipeline brief, as with WAV/FLAC/G.711). */
object Aiff {

  // ---------------------------------------------------- 80-bit extended

  /** Pack a positive integer-valued rate as an 80-bit extended float
    * (1 sign + 15 exponent bits biased 16383, 64-bit mantissa with an
    * EXPLICIT integer bit). */
  private[sources] def packExtended(rate: Int): Array[Byte] = {
    require(rate > 0, s"sample rate $rate")
    val k = 31 - Integer.numberOfLeadingZeros(rate) // floor log2
    val exp = 16383 + k
    val mant = rate.toLong << (63 - k)
    val out = new Array[Byte](10)
    out(0) = ((exp >> 8) & 0x7F).toByte
    out(1) = (exp & 0xFF).toByte
    var i = 0
    while (i < 8) { out(2 + i) = ((mant >>> (56 - 8 * i)) & 0xFF).toByte; i += 1 }
    out
  }

  /** Unpack an 80-bit extended float. The top 53 mantissa bits carry
    * every value a sample-rate field holds exactly (rates are small
    * integers); the tail below double precision is dropped. */
  private[sources] def unpackExtended(b: Array[Byte], at: Int): Double = {
    require(at + 10 <= b.length, "extended float runs past the chunk")
    val se = ((b(at) & 0xFF) << 8) | (b(at + 1) & 0xFF)
    val sign = if ((se & 0x8000) != 0) -1.0 else 1.0
    val exp = se & 0x7FFF
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(at + 2 + i) & 0xFFL); i += 1 }
    if (exp == 0 && mant == 0L) return 0.0
    // use the top 53 bits (unsigned shift keeps the explicit integer bit)
    sign * Math.scalb((mant >>> 11).toDouble, exp - 16383 - 52)
  }

  // -------------------------------------------------------------- encode

  /** Encode 16-bit PCM as plain AIFF (big-endian samples) or AIFF-C
    * with the 'sowt' compression type (little-endian samples). */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short],
             sowt: Boolean = false): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    val out = new ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write((v >> 24) & 0xFF); out.write((v >> 16) & 0xFF)
      out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
    }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def id(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val frames = samples.length / channels
    val dataBytes = samples.length * 2
    // COMM: 18 base; AIFC adds 4-byte compression type + pstring name ""
    val commSize = if (sowt) 18 + 4 + 2 else 18
    val fverSize = if (sowt) 8 + 4 else 0
    val ssndSize = 8 + dataBytes
    val formSize = 4 + fverSize + (8 + commSize) + (8 + ssndSize)
    id("FORM"); u32(formSize); id(if (sowt) "AIFC" else "AIFF")
    if (sowt) { id("FVER"); u32(4); u32(0xA2805140) } // AIFC version 1
    id("COMM"); u32(commSize)
    u16(channels); u32(frames); u16(16)
    out.write(packExtended(sampleRate))
    if (sowt) { id("sowt"); out.write(0); out.write(0) } // empty pstring
    id("SSND"); u32(ssndSize); u32(0); u32(0) // offset, blockSize
    samples.foreach { s =>
      if (sowt) { out.write(s & 0xFF); out.write((s >> 8) & 0xFF) }
      else { out.write((s >> 8) & 0xFF); out.write(s & 0xFF) }
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- decode

  /** Decode AIFF / AIFF-C 16-bit PCM through the real chunk walk. */
  def decode(bytes: Array[Byte]): MediaCodec.Audio = {
    require(bytes.length >= 12, "truncated AIFF")
    def id(at: Int): String = new String(bytes, at, 4, "US-ASCII")
    def u32(at: Int): Int =
      ((bytes(at) & 0xFF) << 24) | ((bytes(at + 1) & 0xFF) << 16) |
        ((bytes(at + 2) & 0xFF) << 8) | (bytes(at + 3) & 0xFF)
    def u16(at: Int): Int = ((bytes(at) & 0xFF) << 8) | (bytes(at + 1) & 0xFF)
    require(id(0) == "FORM", "not an IFF FORM file")
    val formType = id(8)
    require(formType == "AIFF" || formType == "AIFC",
      s"FORM type $formType is not AIFF/AIFC")
    var pos = 12
    var channels = 0; var frames = 0; var bits = 0
    var rate = 0.0
    var littleEndian = false
    var haveComm = false
    var data: Option[(Int, Int)] = None // (offset in bytes, byte length)
    while (pos + 8 <= bytes.length) {
      val cid = id(pos)
      val sz = u32(pos + 4)
      // Long arithmetic: a size near Int.MaxValue would wrap `pos+8+sz`
      // negative and sneak past an Int-typed bound (the Jpeg IFD lesson)
      require(sz >= 0 && pos.toLong + 8 + sz <= bytes.length,
        s"chunk $cid declares $sz bytes past the file end")
      val body = pos + 8
      cid match {
        case "COMM" =>
          require(sz >= 18, s"COMM chunk of $sz bytes")
          channels = u16(body)
          frames = u32(body + 2)
          bits = u16(body + 6)
          rate = unpackExtended(bytes, body + 8)
          if (formType == "AIFC") {
            require(sz >= 22, "AIFC COMM missing compression type")
            id(body + 18) match {
              case "NONE" | "twos" => littleEndian = false
              case "sowt" => littleEndian = true
              case o => throw new IllegalArgumentException(
                s"AIFC compression '$o' unsupported (NONE/twos/sowt only)")
            }
          }
          haveComm = true
        case "SSND" =>
          require(sz >= 8, s"SSND chunk of $sz bytes")
          val off = u32(body)
          require(off >= 0 && off <= sz - 8, s"SSND offset $off")
          data = Some((body + 8 + off, sz - 8 - off))
        case _ => // FVER, MARK, annotations: skipped
      }
      pos = body + sz + (sz & 1) // chunks pad to even
    }
    require(haveComm, "AIFF carries no COMM chunk")
    require(bits == 16, s"only 16-bit PCM served, got $bits")
    require(channels > 0 && frames >= 0, s"COMM: $channels ch, $frames frames")
    val (dAt, dLen) = data.getOrElse(
      throw new IllegalArgumentException("AIFF carries no SSND chunk"))
    // Long arithmetic: hostile COMM counts (frames·channels near 2^31)
    // would wrap `n * 2` and bypass the bound, then hit a raw negative-
    // size or multi-GiB allocation below
    val nL = frames.toLong * channels
    require(nL * 2 <= dLen,
      s"COMM declares $nL samples but SSND holds ${dLen / 2}")
    val n = nL.toInt
    val rateInt = math.round(rate).toInt
    require(rateInt > 0, s"implausible sample rate $rate")
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val a = dAt + 2 * i
      samples(i) =
        if (littleEndian)
          ((bytes(a) & 0xFF) | ((bytes(a + 1) & 0xFF) << 8)).toShort
        else
          (((bytes(a) & 0xFF) << 8) | (bytes(a + 1) & 0xFF)).toShort
      i += 1
    }
    MediaCodec.Audio(rateInt, channels, samples)
  }
}
