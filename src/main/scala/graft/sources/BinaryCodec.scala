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

  def oph_to_bin(a: Column): Column = packDoublesUdf(a)
  def oph_from_bin(b: Column): Column = unpackDoublesUdf(b)
  def oph_compress(b: Column): Column = deflateUdf(b)
  def oph_uncompress(b: Column): Column = inflateUdf(b)
}
