package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The reference's packed-binary measure codec: one BLOB cell =
  * `array_length` packed little-endian C values (reference:
  * src/common/oph-lib-binary-io.h:61-68, element types
  * src/common/oph_server_utility.h:35-41) plus the zlib cell codec
  * behind `oph_compress`/`oph_uncompress`
  * (etc/oph_primitives_list.in:45,345).
  *
  * Native mode stores measures as `ArrayType` columns and lets
  * Parquet/Tungsten handle encoding; this codec exists for byte-level
  * compatibility with reference dumps and for ingesting reference-format
  * fragments. UDF-based by design — codec conversion is an ingest/egress
  * step, never in the hot analytic path.
  */
object BinaryCodec {

  def packDoubles(a: Seq[Double]): Array[Byte] = {
    if (a == null) return null
    val bb = ByteBuffer.allocate(8 * a.length).order(ByteOrder.LITTLE_ENDIAN)
    a.foreach(bb.putDouble)
    bb.array()
  }

  def unpackDoubles(b: Array[Byte]): Seq[Double] = {
    if (b == null) return null
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 8)(bb.getDouble)
  }

  def packFloats(a: Seq[Float]): Array[Byte] = {
    if (a == null) return null
    val bb = ByteBuffer.allocate(4 * a.length).order(ByteOrder.LITTLE_ENDIAN)
    a.foreach(bb.putFloat)
    bb.array()
  }

  def unpackFloats(b: Array[Byte]): Seq[Float] = {
    if (b == null) return null
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 4)(bb.getFloat)
  }

  def packLongs(a: Seq[Long]): Array[Byte] = {
    if (a == null) return null
    val bb = ByteBuffer.allocate(8 * a.length).order(ByteOrder.LITTLE_ENDIAN)
    a.foreach(bb.putLong)
    bb.array()
  }

  def unpackLongs(b: Array[Byte]): Seq[Long] = {
    if (b == null) return null
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 8)(bb.getLong)
  }

  def unpackInts(b: Array[Byte]): Seq[Int] = {
    if (b == null) return null
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Seq.fill(b.length / 4)(bb.getInt)
  }

  /** Bytes per element for the reference's seven in-array types
    * (oph_server_utility.h:35-48). `bit` cells are stored as one char
    * each in the reference (oph_server_utility.c:295), not bit-packed. */
  def typeWidth(t: String): Int = t.toLowerCase.stripPrefix("oph_") match {
    case "byte" | "bit" => 1
    case "short" => 2
    case "int" | "float" => 4
    case "long" | "double" => 8
    case o => throw new IllegalArgumentException(s"unknown element type: $o")
  }

  /** Pack a double-valued array into the reference's little-endian C cell
    * layout for element type `t`, narrowing with C-cast (truncating)
    * semantics; `bit` collapses to one 0/1 char per value. NOTE the
    * double intermediate is exact for byte/short/int/float and for longs
    * up to 2^53 — use [[packLongs]] for the exact 64-bit-integer path. */
  def packTyped(a: Seq[Double], t: String): Array[Byte] = {
    if (a == null) return null
    val w = typeWidth(t)
    val bb = ByteBuffer.allocate(w * a.length).order(ByteOrder.LITTLE_ENDIAN)
    t.toLowerCase.stripPrefix("oph_") match {
      case "double" => a.foreach(bb.putDouble)
      case "float"  => a.foreach(d => bb.putFloat(d.toFloat))
      case "long"   => a.foreach(d => bb.putLong(d.toLong))
      case "int"    => a.foreach(d => bb.putInt(d.toInt))
      case "short"  => a.foreach(d => bb.putShort(d.toShort))
      case "byte"   => a.foreach(d => bb.put(d.toByte))
      case "bit"    => a.foreach(d => bb.put((if (d != 0.0) 1 else 0).toByte))
    }
    bb.array()
  }

  /** Unpack a typed cell back to doubles (the engine's lingua franca). */
  def unpackTyped(b: Array[Byte], t: String): Seq[Double] = {
    if (b == null) return null
    val w = typeWidth(t)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = b.length / w
    t.toLowerCase.stripPrefix("oph_") match {
      case "double" => Seq.fill(n)(bb.getDouble)
      case "float"  => Seq.fill(n)(bb.getFloat.toDouble)
      case "long"   => Seq.fill(n)(bb.getLong.toDouble)
      case "int"    => Seq.fill(n)(bb.getInt.toDouble)
      case "short"  => Seq.fill(n)(bb.getShort.toDouble)
      case "byte" | "bit" => Seq.fill(n)(bb.get.toDouble)
    }
  }

  /** zlib-deflate (oph_compress). */
  def deflate(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    val d = new Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 16)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** zlib-inflate (oph_uncompress). */
  def inflate(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    val inf = new Inflater()
    inf.setInput(b)
    val out = new java.io.ByteArrayOutputStream(b.length * 3 + 16)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
    inf.end()
    out.toByteArray
  }

  // Column-level UDFs (oph_to_bin:341 / oph_value_to_bin:349 / oph_dump:77
  // live as dialect names over these).
  private val packDoublesUdf = udf(packDoubles _)
  private val unpackDoublesUdf = udf(unpackDoubles _)
  private val deflateUdf = udf(deflate _)
  private val inflateUdf = udf(inflate _)
  private val packTypedUdf = udf(packTyped _)
  private val unpackTypedUdf = udf(unpackTyped _)
  private val packLongsUdf = udf(packLongs _)
  private val unpackLongsUdf = udf(unpackLongs _)

  def oph_to_bin(a: Column): Column = packDoublesUdf(a)
  def oph_from_bin(b: Column): Column = unpackDoublesUdf(b)
  def oph_to_bin_typed(a: Column, t: Column): Column = packTypedUdf(a, t)
  def oph_from_bin_typed(b: Column, t: Column): Column = unpackTypedUdf(b, t)
  /** EXACT 64-bit-integer cells: no double intermediate, so values beyond
    * 2^53 survive bit-for-bit (the typed pack/unpack above documents its
    * double lingua franca as exact only up to 2^53). The dialect routes
    * `oph_long`-hinted oph_to_bin through this pair. */
  def oph_to_bin_long(a: Column): Column = packLongsUdf(a)
  def oph_from_bin_long(b: Column): Column = unpackLongsUdf(b)
  def oph_compress(b: Column): Column = deflateUdf(b)
  def oph_uncompress(b: Column): Column = inflateUdf(b)
}
