package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable

/** Pure-JVM reader/writer for the subset of the public HDF5 file format
  * that NetCDF-4 files use — the reference's NetCDF-4 ingest path
  * (src/server/oph_io_server_nc.c:1612 `_oph_ioserver_nc_read_v0_n4`,
  * dispatch 2716-3243). No hdf5/netcdf-java in this container, so the
  * container format is parsed directly from the public HDF5 File Format
  * Specification:
  *
  *  - superblock v0 (the netCDF-4 default) and v2/v3 (libver=latest);
  *  - v1 object headers (+ continuation blocks) and v2 `OHDR` headers
  *    (+ `OCHK` continuations);
  *  - groups as symbol tables (v1 B-tree → SNOD → local heap — the
  *    default "original" group format) and as compact Link messages;
  *    dense (fractal-heap) link storage is rejected with a clear error;
  *  - dataspace v1/v2, datatype classes 0 (fixed) and 1 (IEEE float) in
  *    either byte order, sizes 1/2/4/8;
  *  - data layout v3, contiguous and chunked (v1 B-tree chunk index);
  *  - filter pipeline v1/v2 with deflate (1), shuffle (2) and
  *    fletcher32 (3 — checksum stripped).
  *
  * Everything is decoded to doubles, the engine's lingua franca, same as
  * the CDF-1/2 path in [[NetCDF3]].
  *
  * Scale posture: [[Hdf5Reader.readSlab]] is hyperslab-granular like the
  * CDF reader, so each Spark input partition touches only the byte
  * ranges (or chunks) its rows need; decompressed chunks are cached per
  * reader (one reader per partition) with a small LRU, so a partition
  * scanning consecutive rows inflates each chunk once.
  */
object HDF5 {

  val Signature: Array[Byte] =
    Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF

  def isHdf5(path: String): Boolean = {
    val src = RandomInput.open(path)
    try {
      val b = new Array[Byte](8)
      if (src.length() < 8) return false
      src.readFully(0, b)
      b.sameElements(Signature)
    } finally src.close()
  }

  /** Element type: HDF5 class 0 (fixed) / 1 (float), byte size, order. */
  final case class DType(clazz: Int, size: Int, littleEndian: Boolean,
                         signed: Boolean)

  final case class Filter(id: Int, clientValues: Seq[Int])

  private final case class Msg(tpe: Int, body: Array[Byte])

  /** One dataset: shape, element type, layout. For chunked layout,
    * `chunkDims` has one entry per dataspace dim (the trailing
    * element-size entry of the stored chunk dimensionality is dropped)
    * and `chunkIndex` maps chunk-grid origin → (address, storedSize). */
  final case class Dataset(name: String, shape: Seq[Int], dtype: DType,
                           contiguousAddr: Long, contiguousSize: Long,
                           chunkDims: Seq[Int],
                           chunkBTree: Long,
                           filters: Seq[Filter]) {
    def isChunked: Boolean = chunkDims.nonEmpty
  }

  // ================================================================ READ

  final class Hdf5Reader(path: String) extends AutoCloseable {
    private val src = RandomInput.open(path) // local path or Hadoop URI
    private val datasets: Map[String, Dataset] = parseFile()
    // decompressed-chunk LRU: readers are per-partition and rows arrive
    // in order, so a handful of chunks covers the working set
    private val chunkCache =
      new java.util.LinkedHashMap[Long, Array[Byte]](8, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Long, Array[Byte]]): Boolean = size() > 4
      }

    def varNames: Seq[String] = datasets.keys.toSeq.sorted
    def dataset(name: String): Dataset = datasets.getOrElse(name,
      throw new IllegalArgumentException(
        s"no variable $name in $path (have: ${varNames.mkString(", ")})"))
    def shape(name: String): Seq[Int] = dataset(name).shape

    override def close(): Unit = src.close()

    // ---- low-level positioned LE reads ----
    private def bytesAt(off: Long, n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      src.readFully(off, b); b
    }
    private def bb(off: Long, n: Int): ByteBuffer =
      ByteBuffer.wrap(bytesAt(off, n)).order(ByteOrder.LITTLE_ENDIAN)

    // ---- superblock ----
    private def parseFile(): Map[String, Dataset] = {
      val sbOff = findSuperblock()
      val head = bb(sbOff + 8, 5)
      val ver = head.get(0) & 0xFF
      ver match {
        case 0 | 1 =>
          val b = bb(sbOff + 8, 88)
          val offSize = b.get(5) & 0xFF
          val lenSize = b.get(6) & 0xFF
          require(offSize == 8 && lenSize == 8,
            s"only 8-byte offsets/lengths supported (got $offSize/$lenSize)")
          // v0: sizes at +5,+6; root symbol-table entry after 4 addresses
          // (base, free-space, EOF, driver-info) = sb+24, entry at sb+24+32
          val rootEntryOff = sbOff + 8 + 16 + 32 + (if (ver == 1) 4 else 0)
          val e = bb(rootEntryOff, 40)
          val rootHeader = e.getLong(8)
          collectGroup(rootHeader, "", mutable.Map.empty).toMap
        case 2 | 3 =>
          val b = bb(sbOff + 8, 40)
          require((b.get(1) & 0xFF) == 8 && (b.get(2) & 0xFF) == 8,
            "only 8-byte offsets/lengths supported")
          val rootHeader = b.getLong(28) // base(4+8=12)... layout: ver,offs,lens,flags then base@4
          collectGroup(rootHeader, "", mutable.Map.empty).toMap
        case v => throw new IllegalArgumentException(s"superblock v$v unsupported")
      }
    }

    private def findSuperblock(): Long = {
      var off = 0L
      while (off < src.length()) {
        if (bytesAt(off, 8).sameElements(Signature)) return off
        off = if (off == 0) 512 else off * 2
      }
      throw new IllegalArgumentException(s"$path: no HDF5 superblock")
    }

    // ---- object headers (v1 + v2) → messages ----
    private def readMessages(headerAddr: Long): Seq[Msg] = {
      val first = bytesAt(headerAddr, 4)
      if (first.sameElements("OHDR".getBytes)) readMessagesV2(headerAddr)
      else readMessagesV1(headerAddr)
    }

    private def readMessagesV1(headerAddr: Long): Seq[Msg] = {
      val out = mutable.ArrayBuffer.empty[Msg]
      val pre = bb(headerAddr, 16)
      require((pre.get(0) & 0xFF) == 1, "object header v1 expected")
      var remaining = pre.getShort(2) & 0xFFFF
      // blocks of (address, size); first block starts after 16-byte prefix
      var blocks = List((headerAddr + 16, pre.getInt(8).toLong))
      while (remaining > 0 && blocks.nonEmpty) {
        val (addr, size) = blocks.head
        blocks = blocks.tail
        val buf = bb(addr, size.toInt)
        var p = 0
        while (remaining > 0 && p + 8 <= size) {
          val tpe = buf.getShort(p) & 0xFFFF
          val msz = buf.getShort(p + 2) & 0xFFFF
          val body = new Array[Byte](msz)
          buf.position(p + 8); buf.get(body); buf.position(0)
          if (tpe == 0x0010) { // continuation: (offset 8, length 8)
            val c = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            blocks = blocks :+ ((c.getLong(0), c.getLong(8)))
          } else out += Msg(tpe, body)
          remaining -= 1
          p += 8 + msz
        }
      }
      out.toSeq
    }

    private def readMessagesV2(headerAddr: Long): Seq[Msg] = {
      val out = mutable.ArrayBuffer.empty[Msg]
      val h = bb(headerAddr, 16)
      require((h.get(4) & 0xFF) == 2, "object header v2 expected")
      val flags = h.get(5) & 0xFF
      var p = headerAddr + 6
      if ((flags & 0x20) != 0) p += 16 // times
      if ((flags & 0x10) != 0) p += 4  // max compact / min dense
      val szBytes = 1 << (flags & 3)
      val chunk0 = bb(p, szBytes)
      val chunk0Size = szBytes match {
        case 1 => chunk0.get(0) & 0xFFL
        case 2 => chunk0.getShort(0) & 0xFFFFL
        case 4 => chunk0.getInt(0) & 0xFFFFFFFFL
        case _ => chunk0.getLong(0)
      }
      p += szBytes
      val track = (flags & 0x04) != 0
      // (addr, usableSize): chunk 0's size field counts message data only;
      // an OCHK continuation's length includes its 4-byte signature and
      // trailing 4-byte checksum
      var blocks = List((p, chunk0Size))
      while (blocks.nonEmpty) {
        val (addr, size) = blocks.head
        blocks = blocks.tail
        val buf = bb(addr, size.toInt)
        var q = 0
        val msgHdr = 4 + (if (track) 2 else 0)
        while (q + msgHdr <= size) {
          val tpe = buf.get(q) & 0xFF
          val msz = buf.getShort(q + 1) & 0xFFFF
          val bodyOff = q + msgHdr
          val body = new Array[Byte](msz)
          buf.position(bodyOff); buf.get(body); buf.position(0)
          if (tpe == 0x10) {
            val c = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            blocks = blocks :+ ((c.getLong(0) + 4, c.getLong(8) - 8)) // OCHK
          } else if (tpe != 0) out += Msg(tpe, body)
          q = bodyOff + msz
        }
      }
      out.toSeq
    }

    // ---- groups ----
    private def collectGroup(headerAddr: Long, prefix: String,
        acc: mutable.Map[String, Dataset]): mutable.Map[String, Dataset] = {
      val msgs = readMessages(headerAddr)
      val isGroup = msgs.exists(m => m.tpe == 0x0011 || m.tpe == 0x0002 ||
        m.tpe == 0x0006)
      if (!isGroup) {
        parseDataset(prefix.stripSuffix("/"), msgs).foreach(d =>
          acc(d.name) = d)
        return acc
      }
      msgs.foreach { m =>
        val b = ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN)
        m.tpe match {
          case 0x0011 => // symbol table: btree addr, heap addr
            val btree = b.getLong(0); val heap = b.getLong(8)
            walkGroupBtree(btree, heap).foreach { case (nm, oh) =>
              collectGroup(oh, s"$prefix$nm/", acc)
            }
          case 0x0002 => // link info: reject dense storage
            val flags = b.get(1) & 0xFF
            var q = 2
            if ((flags & 1) != 0) q += 8
            val fheap = b.getLong(q)
            if (fheap != Undef)
              throw new IllegalArgumentException(
                "dense (fractal heap) link storage not supported")
          case 0x0006 => // compact link message
            val flags = b.get(1) & 0xFF
            var q = 2
            val ltype = if ((flags & 0x08) != 0) { val t = b.get(q) & 0xFF; q += 1; t }
                        else 0
            if ((flags & 0x04) != 0) q += 8 // creation order
            if ((flags & 0x10) != 0) q += 1 // charset
            val lenSz = 1 << (flags & 3)
            val nameLen = lenSz match {
              case 1 => b.get(q) & 0xFF
              case 2 => b.getShort(q) & 0xFFFF
              case 4 => b.getInt(q)
              case _ => b.getLong(q).toInt
            }
            q += lenSz
            val nameB = new Array[Byte](nameLen)
            b.position(q); b.get(nameB); b.position(0)
            if (ltype == 0) { // hard link → object header address
              val oh = b.getLong(q + nameLen)
              collectGroup(oh, s"$prefix${new String(nameB, "UTF-8")}/", acc)
            }
          case _ =>
        }
      }
      acc
    }

    private def walkGroupBtree(btreeAddr: Long, heapAddr: Long)
        : Seq[(String, Long)] = {
      // local heap: data segment address at +24 (sig4,ver1,res3,size8,free8,addr8)
      val heapData = bb(heapAddr, 32).getLong(24)
      def heapName(off: Long): String = {
        val sb = new StringBuilder
        var p = heapData + off
        var c = bytesAt(p, 1)(0)
        while (c != 0) { sb.append(c.toChar); p += 1; c = bytesAt(p, 1)(0) }
        sb.toString()
      }
      def walkNode(addr: Long): Seq[(String, Long)] = {
        val hd = bb(addr, 24)
        require(bytesAt(addr, 4).sameElements("TREE".getBytes),
          "group B-tree v1 node expected")
        val level = hd.get(5) & 0xFF
        val n = hd.getShort(6) & 0xFFFF
        // keys/children: key0(8) child0(8) key1(8) ... child{n-1} key{n}
        val body = bb(addr + 24, (2 * n + 1) * 8)
        val children = (0 until n).map(i => body.getLong((2 * i + 1) * 8))
        if (level > 0) children.flatMap(walkNode)
        else children.flatMap { snod =>
          require(bytesAt(snod, 4).sameElements("SNOD".getBytes),
            "SNOD expected under group B-tree leaf")
          val ns = bb(snod, 8).getShort(6) & 0xFFFF
          (0 until ns).map { i =>
            val e = bb(snod + 8 + i * 40, 40)
            (heapName(e.getLong(0)), e.getLong(8))
          }
        }
      }
      walkNode(btreeAddr)
    }

    // ---- dataset messages ----
    private def parseDataset(name: String, msgs: Seq[Msg]): Option[Dataset] = {
      var shape: Seq[Int] = null
      var dtype: DType = null
      var contAddr = Undef; var contSize = 0L
      var chunkDims: Seq[Int] = Nil
      var chunkBTree = Undef
      var filters: Seq[Filter] = Nil
      msgs.foreach { m =>
        val b = ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN)
        m.tpe match {
          case 0x0001 => // dataspace
            val ver = b.get(0) & 0xFF
            val rank = b.get(1) & 0xFF
            val base = if (ver == 1) 8 else 4
            shape = (0 until rank).map(i => b.getLong(base + i * 8).toInt)
          case 0x0003 => // datatype
            val cv = b.get(0) & 0xFF
            val clazz = cv & 0x0F
            val bits0 = b.get(1) & 0xFF
            val size = b.getInt(4)
            require(clazz == 0 || clazz == 1,
              s"datatype class $clazz unsupported (fixed/float only)")
            dtype = DType(clazz, size, littleEndian = (bits0 & 1) == 0,
              signed = clazz != 0 || (bits0 & 0x08) != 0)
          case 0x0008 => // layout
            val ver = b.get(0) & 0xFF
            require(ver == 3, s"data layout v$ver unsupported (v3 only)")
            val clazz = b.get(1) & 0xFF
            clazz match {
              case 1 => contAddr = b.getLong(2); contSize = b.getLong(10)
              case 2 =>
                val dimensionality = b.get(2) & 0xFF // rank + 1
                chunkBTree = b.getLong(3)
                chunkDims = (0 until dimensionality - 1).map(i =>
                  b.getInt(11 + i * 4))
              case 0 => throw new IllegalArgumentException(
                "compact data layout not supported")
            }
          case 0x000B => // filter pipeline
            val ver = b.get(0) & 0xFF
            val n = b.get(1) & 0xFF
            var p = if (ver == 1) 8 else 2
            filters = (0 until n).map { _ =>
              val id = b.getShort(p) & 0xFFFF
              val nameLen =
                if (ver == 1 || id >= 256) { val l = b.getShort(p + 2) & 0xFFFF; l }
                else 0
              val hdrLen = if (ver == 1 || id >= 256) 8 else 6
              val nVals = b.getShort(p + hdrLen - 2) & 0xFFFF
              var q = p + hdrLen
              q += (if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen)
              val vals = (0 until nVals).map(i => b.getInt(q + i * 4))
              q += nVals * 4
              if (ver == 1 && nVals % 2 == 1) q += 4
              p = q
              Filter(id, vals)
            }
          case _ => // fill value, attributes, mtime … not needed
        }
      }
      if (shape == null || dtype == null) None
      else Some(Dataset(name, shape, dtype, contAddr, contSize,
        chunkDims, chunkBTree, filters))
    }

    // ---- chunk index ----
    private val chunkIndexCache = mutable.Map.empty[Long, Seq[(Seq[Long], Long, Long)]]
    /** All (gridOrigin, address, storedByteSize) entries of a chunk B-tree. */
    private def chunkEntries(d: Dataset): Seq[(Seq[Long], Long, Long)] =
      chunkIndexCache.getOrElseUpdate(d.chunkBTree, {
        val ndims = d.chunkDims.size + 1
        val keySize = 8 + ndims * 8
        def walk(addr: Long): Seq[(Seq[Long], Long, Long)] = {
          require(bytesAt(addr, 4).sameElements("TREE".getBytes),
            "chunk B-tree v1 node expected")
          val hd = bb(addr, 24)
          val level = hd.get(5) & 0xFF
          val n = hd.getShort(6) & 0xFFFF
          val body = bb(addr + 24, n * (keySize + 8) + keySize)
          (0 until n).flatMap { i =>
            val kOff = i * (keySize + 8)
            val size = body.getInt(kOff) & 0xFFFFFFFFL
            val offsets = (0 until ndims - 1).map(j => body.getLong(kOff + 8 + j * 8))
            val child = body.getLong(kOff + keySize)
            if (level > 0) walk(child) else Seq((offsets, child, size))
          }
        }
        walk(d.chunkBTree)
      })

    private def inflateBytes(b: Array[Byte], hint: Int): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(math.max(hint, 64))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) throw new java.io.EOFException(
          "truncated deflate stream in chunk")
        out.write(buf, 0, k)
      }
      inf.end()
      out.toByteArray
    }

    private def unshuffle(b: Array[Byte], es: Int): Array[Byte] = {
      val n = b.length / es
      val out = new Array[Byte](b.length)
      var j = 0
      var byteIdx = 0
      while (byteIdx < es) {
        var i = 0
        while (i < n) { out(i * es + byteIdx) = b(j); j += 1; i += 1 }
        byteIdx += 1
      }
      out
    }

    /** Raw (defiltered) bytes of the chunk stored at `addr`. */
    private def chunkBytes(d: Dataset, addr: Long, stored: Long): Array[Byte] = {
      val cached = chunkCache.get(addr)
      if (cached != null) return cached
      var data = bytesAt(addr, stored.toInt)
      // filters apply in reverse order on read
      d.filters.reverse.foreach { f =>
        f.id match {
          case 1 => data = inflateBytes(data,
            d.chunkDims.product * d.dtype.size)
          case 2 => data = unshuffle(data, d.dtype.size)
          case 3 => data = data.dropRight(4) // fletcher32 checksum
          case o => throw new IllegalArgumentException(s"filter $o unsupported")
        }
      }
      chunkCache.put(addr, data)
      data
    }

    private def decoder(d: DType): (ByteBuffer, Int) => Double = {
      val es = d.size
      (d.clazz, es, d.signed) match {
        case (1, 8, _) => (b, i) => b.getDouble(i * es)
        case (1, 4, _) => (b, i) => b.getFloat(i * es).toDouble
        case (0, 8, _) => (b, i) => b.getLong(i * es).toDouble
        case (0, 4, true) => (b, i) => b.getInt(i * es).toDouble
        case (0, 4, false) => (b, i) => (b.getInt(i * es) & 0xFFFFFFFFL).toDouble
        case (0, 2, true) => (b, i) => b.getShort(i * es).toDouble
        case (0, 2, false) => (b, i) => (b.getShort(i * es) & 0xFFFF).toDouble
        case (0, 1, true) => (b, i) => b.get(i * es).toDouble
        case (0, 1, false) => (b, i) => (b.get(i * es) & 0xFF).toDouble
        case o => throw new IllegalArgumentException(s"dtype $o unsupported")
      }
    }

    /** Read a hyperslab as doubles, row-major, like [[NetCDF3.readSlab]]:
      * contiguous layout does one positioned read per innermost run;
      * chunked layout copies each intersecting chunk's overlap (chunks
      * inflate once into the per-reader LRU). */
    def readSlab(varName: String, origin: Seq[Int], shape: Seq[Int])
        : Array[Double] = {
      val d = dataset(varName)
      require(origin.size == d.shape.size && shape.size == d.shape.size,
        s"rank mismatch: $varName has shape ${d.shape}")
      val out = new Array[Double](shape.product)
      if (!d.isChunked) readContiguous(d, origin, shape, out)
      else readChunked(d, origin, shape, out)
      out
    }

    private def readContiguous(d: Dataset, origin: Seq[Int], shape: Seq[Int],
        out: Array[Double]): Unit = {
      require(d.contiguousAddr != Undef, s"${d.name}: no data allocated")
      val es = d.dtype.size
      val rank = d.shape.size
      val dec = decoder(d.dtype)
      val order = if (d.dtype.littleEndian) ByteOrder.LITTLE_ENDIAN
                  else ByteOrder.BIG_ENDIAN
      val strides = d.shape.scanRight(1L)(_ * _).tail
      // innermost run: the contiguous suffix where the full extent is taken
      var runDims = 0
      while (runDims < rank && origin(rank - 1 - runDims) == 0 &&
        shape(rank - 1 - runDims) == d.shape(rank - 1 - runDims)) runDims += 1
      val splitAt = rank - runDims
      val runLen = (splitAt until rank).foldLeft(
        if (splitAt > 0) shape(splitAt - 1).toLong else 1L)((a, i) => a * shape(i))
      val outerEnd = math.max(splitAt - 1, 0)
      val buf = new Array[Byte]((runLen * es).toInt)
      var outPos = 0
      def rec(dim: Int, idx: Array[Int]): Unit = {
        if (dim == outerEnd) {
          val full = (0 until rank).map(i =>
            if (i < outerEnd) idx(i)
            else if (i == outerEnd && splitAt > 0) origin(i)
            else origin(i)).toArray
          val off = (0 until rank).map(i => full(i) * strides(i)).sum
          src.readFully(d.contiguousAddr + off * es, buf)
          val bbuf = ByteBuffer.wrap(buf).order(order)
          var i = 0
          while (i < runLen) { out(outPos) = dec(bbuf, i); outPos += 1; i += 1 }
        } else {
          var j = 0
          while (j < shape(dim)) { idx(dim) = origin(dim) + j; rec(dim + 1, idx); j += 1 }
        }
      }
      if (rank == 0) { // scalar
        val b1 = new Array[Byte](es); src.readFully(d.contiguousAddr, b1)
        out(0) = dec(ByteBuffer.wrap(b1).order(order), 0)
      } else rec(0, new Array[Int](math.max(outerEnd, 0)))
    }

    private def readChunked(d: Dataset, origin: Seq[Int], shape: Seq[Int],
        out: Array[Double]): Unit = {
      val rank = d.shape.size
      val cd = d.chunkDims
      val es = d.dtype.size
      val dec = decoder(d.dtype)
      val order = if (d.dtype.littleEndian) ByteOrder.LITTLE_ENDIAN
                  else ByteOrder.BIG_ENDIAN
      val outStrides = shape.scanRight(1)(_ * _).tail
      val chunkStrides = cd.scanRight(1)(_ * _).tail
      for ((gridOrigin, addr, stored) <- chunkEntries(d)) {
        // intersection of [origin, origin+shape) with this chunk's box
        val lo = (0 until rank).map(i => math.max(origin(i).toLong, gridOrigin(i)))
        val hi = (0 until rank).map(i => math.min(origin(i) + shape(i).toLong,
          gridOrigin(i) + cd(i)))
        if ((0 until rank).forall(i => lo(i) < hi(i))) {
          val bytes = chunkBytes(d, addr, stored)
          val bbuf = ByteBuffer.wrap(bytes).order(order)
          // nested copy over the intersection, innermost dim tight loop
          def rec(dim: Int, outBase: Int, chunkBase: Int): Unit = {
            if (dim == rank - 1) {
              val n = (hi(dim) - lo(dim)).toInt
              var i = 0
              val ob = outBase + ((lo(dim) - origin(dim)).toInt) * outStrides(dim)
              val cb = chunkBase + ((lo(dim) - gridOrigin(dim)).toInt) * chunkStrides(dim)
              while (i < n) { out(ob + i) = dec(bbuf, cb + i); i += 1 }
            } else {
              var v = lo(dim)
              while (v < hi(dim)) {
                rec(dim + 1,
                  outBase + ((v - origin(dim)).toInt) * outStrides(dim),
                  chunkBase + ((v - gridOrigin(dim)).toInt) * chunkStrides(dim))
                v += 1
              }
            }
          }
          if (rank == 0) out(0) = dec(bbuf, 0) else rec(0, 0, 0)
        }
      }
    }
  }

  // =============================================================== WRITE

  /** Little-endian growable buffer with address patching. */
  private final class Buf {
    private var arr = new Array[Byte](4096)
    var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > arr.length) {
        val na = new Array[Byte](math.max(arr.length * 2, pos + n))
        System.arraycopy(arr, 0, na, 0, pos); arr = na
      }
    def u8(v: Int): Unit = { ensure(1); arr(pos) = v.toByte; pos += 1 }
    def u16(v: Int): Unit = { u8(v & 0xFF); u8((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = { u16((v & 0xFFFF).toInt); u16(((v >> 16) & 0xFFFF).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xFFFFFFFFL); u32((v >>> 32) & 0xFFFFFFFFL) }
    def f64(v: Double): Unit = u64(java.lang.Double.doubleToLongBits(v))
    def bytes(b: Array[Byte]): Unit = { ensure(b.length)
      System.arraycopy(b, 0, arr, pos, b.length); pos += b.length }
    def zero(n: Int): Unit = { ensure(n); pos += n }
    def patch64(at: Int, v: Long): Unit = {
      val save = pos; pos = at; u64(v); pos = math.max(save, pos) }
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, pos)
  }

  /** One float64 variable for [[writeDoubleVars]]. */
  final case class H5Var(name: String, dims: Seq[(String, Int)],
                         data: Array[Double],
                         chunkDims: Option[Seq[Int]] = None)

  /** Write a minimal HDF5 file with one n-dimensional float64
    * little-endian dataset at the root group (the shape `oph_export`'s
    * NetCDF-4 twin needs): superblock v0, symbol-table root group, data
    * layout v3 contiguous — or chunked + deflate when `chunkDims` is
    * given — exactly the "original format" profile a default netCDF-4
    * library build produces. */
  def writeDoubleVar(path: String, dims: Seq[(String, Int)], varName: String,
      data: Array[Double], chunkDims: Option[Seq[Int]] = None,
      deflateLevel: Int = 6): Unit =
    writeDoubleVars(path, Seq(H5Var(varName, dims, data, chunkDims)),
      deflateLevel)

  /** Multi-variable form: several datasets under one symbol-table root
    * group (real netCDF-4 files always hold several — coordinate vars
    * plus measures), entries name-ordered as the group B-tree
    * requires. */
  def writeDoubleVars(path: String, vars0: Seq[H5Var],
      deflateLevel: Int = 6): Unit = {
    require(vars0.nonEmpty, "at least one variable")
    vars0.foreach { v =>
      require(v.data.length == v.dims.map(_._2).product,
        s"${v.name}: data size != dim product")
      require(v.chunkDims.forall(_.size == v.dims.size),
        s"${v.name}: chunk rank != rank")
    }
    val vars = vars0.sortBy(_.name) // symbol-table entries are name-ordered
    val b = new Buf

    // --- superblock v0 (96 bytes) ---
    b.bytes(Signature)
    b.u8(0); b.u8(0); b.u8(0); b.u8(0) // sb ver, freespace ver, root ver, res
    b.u8(0); b.u8(8); b.u8(8); b.u8(0) // shared ver, offsets, lengths, res
    b.u16(4); b.u16(16)                // group leaf k, internal k
    b.u32(0)                           // consistency flags
    b.u64(0)                           // base address
    b.u64(Undef)                       // free-space info
    val eofPatch = b.pos; b.u64(0)     // EOF address (patched)
    b.u64(Undef)                       // driver info
    // root symbol table entry
    b.u64(0)                           // link name offset ("")
    val rootOhPatch = b.pos; b.u64(0)  // root object header addr (patched)
    b.u32(0); b.u32(0)                 // cache type, reserved
    b.zero(16)                         // scratch

    // --- root group object header v1: one symbol-table message ---
    val rootOh = b.pos
    b.patch64(rootOhPatch, rootOh)
    b.u8(1); b.u8(0); b.u16(1)         // ver, res, nmsgs
    b.u32(1); b.u32(24); b.u32(0)      // refcount, header size, pad
    b.u16(0x0011); b.u16(16); b.u8(0); b.u8(0); b.u16(0)
    val stabBtreePatch = b.pos; b.u64(0)
    val stabHeapPatch = b.pos; b.u64(0)

    // heap offsets of the names: 0 is the empty-string slot, names
    // follow 8-aligned
    val nameBytes = vars.map(_.name.getBytes("UTF-8"))
    val nameOffsets = nameBytes.scanLeft(8L) { (off, nb) =>
      off + (nb.length + 1 + 7) / 8 * 8
    }
    val heapDataSize = nameOffsets.last

    // --- group B-tree v1 (1 child → one SNOD with all entries) ---
    val btreeAddr = b.pos
    b.patch64(stabBtreePatch, btreeAddr)
    b.bytes("TREE".getBytes); b.u8(0); b.u8(0); b.u16(1)
    b.u64(Undef); b.u64(Undef)
    b.u64(0)                           // key0: heap offset of ""
    val snodPatch = b.pos; b.u64(0)    // child0 → SNOD
    b.u64(nameOffsets(vars.size - 1))  // key1: offset of the LAST name

    // --- local heap ---
    val heapAddr = b.pos
    b.patch64(stabHeapPatch, heapAddr)
    b.bytes("HEAP".getBytes); b.u8(0); b.u8(0); b.u16(0)
    b.u64(heapDataSize)
    b.u64(Undef)                       // no free list
    val heapDataPatch = b.pos; b.u64(0)
    val heapData = b.pos
    b.patch64(heapDataPatch, heapData)
    b.zero(8)                          // offset 0: empty string slot
    vars.indices.foreach { i =>
      b.bytes(nameBytes(i))
      b.zero((nameOffsets(i + 1) - nameOffsets(i)).toInt - nameBytes(i).length)
    }

    // --- SNOD: one entry per dataset, name-ordered ---
    val snodAddr = b.pos
    b.patch64(snodPatch, snodAddr)
    b.bytes("SNOD".getBytes); b.u8(1); b.u8(0); b.u16(vars.size)
    val dsOhPatches = vars.indices.map { i =>
      b.u64(nameOffsets(i))
      val patch = b.pos; b.u64(0)
      b.u32(0); b.u32(0); b.zero(16)
      patch
    }

    // --- datasets ---
    vars.indices.foreach { i =>
      b.patch64(dsOhPatches(i), writeDataset(b, vars(i), deflateLevel))
    }

    b.patch64(eofPatch, b.pos)
    val out = new java.io.FileOutputStream(path)
    try out.write(b.result) finally out.close()
  }

  /** Append one dataset (v1 object header + layout + data) to `b`,
    * returning its object header address. */
  private def writeDataset(b: Buf, v: H5Var, deflateLevel: Int): Long = {
    val shape = v.dims.map(_._2)
    val data = v.data
    val rank = shape.size
    val chunked = v.chunkDims.isDefined
    val dsOh = b.pos
    val nmsgs = if (chunked) 4 else 3  // dataspace, datatype, [filters], layout
    val spaceSz = 8 + rank * 8
    val dtSz = 24                      // 8 hdr + 12 props + 4 pad
    val filtSz = 24
    val layoutSz = if (chunked) (3 + 8 + (rank + 1) * 4 + 7) / 8 * 8 else 24
    val hdrSize = (8 + spaceSz) + (8 + dtSz) +
      (if (chunked) 8 + filtSz else 0) + (8 + layoutSz)
    b.u8(1); b.u8(0); b.u16(nmsgs)
    b.u32(1); b.u32(hdrSize); b.u32(0)
    // dataspace v1
    b.u16(0x0001); b.u16(spaceSz); b.u8(0); b.u8(0); b.u16(0)
    b.u8(1); b.u8(rank); b.u8(0); b.u8(0); b.u32(0)
    shape.foreach(s => b.u64(s.toLong))
    // datatype: IEEE F64LE
    b.u16(0x0003); b.u16(dtSz); b.u8(0); b.u8(0); b.u16(0)
    b.u8(0x11)                         // version 1, class 1 (float)
    b.u8(0x20); b.u8(0x3F); b.u8(0)    // LE, implied-msb norm, sign bit 63
    b.u32(8)                           // size
    b.u16(0); b.u16(64)                // bit offset, precision
    b.u8(52); b.u8(11)                 // exponent location, size
    b.u8(0); b.u8(52)                  // mantissa location, size
    b.u32(1023)                        // exponent bias
    b.u32(0)                           // pad to 24
    if (chunked) {
      // filter pipeline v1: deflate
      b.u16(0x000B); b.u16(filtSz); b.u8(0); b.u8(0); b.u16(0)
      b.u8(1); b.u8(1); b.u16(0); b.u32(0)
      b.u16(1); b.u16(0); b.u16(0); b.u16(1) // id=1, no name, flags, 1 value
      b.u32(deflateLevel.toLong)
      b.u32(0)                         // pad (odd value count)
    }
    // layout v3
    b.u16(0x0008); b.u16(layoutSz); b.u8(0); b.u8(0); b.u16(0)
    val layoutStart = b.pos
    b.u8(3)
    if (!chunked) {
      b.u8(1)
      val dataAddrPatch = b.pos; b.u64(0)
      b.u64(data.length.toLong * 8)
      b.zero(layoutSz - (b.pos - layoutStart))
      // --- contiguous data ---
      val dataAddr = b.pos
      b.patch64(dataAddrPatch, dataAddr)
      data.foreach(b.f64)
    } else {
      val cd = v.chunkDims.get
      b.u8(2)
      b.u8(rank + 1)
      val btreePatch = b.pos; b.u64(0)
      cd.foreach(c => b.u32(c.toLong))
      b.u32(8)                         // element size tail entry
      b.zero(layoutSz - (b.pos - layoutStart))
      // --- chunks (deflated), then the chunk B-tree ---
      val grid = shape.zip(cd).map { case (s, c) => (s + c - 1) / c }
      val chunkCount = grid.product
      val strides = shape.scanRight(1)(_ * _).tail
      val chunkStrides = cd.scanRight(1)(_ * _).tail
      val entries = (0 until chunkCount).map { ci =>
        var rem = ci
        val gidx = new Array[Int](rank)
        var i = rank - 1
        while (i >= 0) { gidx(i) = rem % grid(i); rem /= grid(i); i -= 1 }
        val originC = gidx.toSeq.zip(cd).map { case (g, c) => g * c }
        val raw = new Array[Byte](cd.product * 8)
        val rbb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        def fill(dim: Int, srcBase: Int, dstBase: Int): Unit = {
          if (dim == rank) rbb.putDouble(dstBase * 8, data(srcBase))
          else {
            var j = 0
            val lim = math.min(cd(dim), shape(dim) - originC(dim))
            while (j < lim) {
              fill(dim + 1, srcBase + (originC(dim) + j) * strides(dim),
                dstBase + j * chunkStrides(dim))
              j += 1
            }
          }
        }
        fill(0, 0, 0)
        val comp = {
          val d = new Deflater(deflateLevel)
          d.setInput(raw); d.finish()
          val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
          val buf = new Array[Byte](8192)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end(); out.toByteArray
        }
        val addr = b.pos
        b.bytes(comp)
        (originC, addr, comp.length)
      }
      // chunk B-tree v1 leaf: n entries, n+1 keys
      val btreeAddr2 = b.pos
      b.patch64(btreePatch, btreeAddr2)
      b.bytes("TREE".getBytes); b.u8(1); b.u8(0); b.u16(chunkCount)
      b.u64(Undef); b.u64(Undef)
      entries.foreach { case (originC, addr, csize) =>
        b.u32(csize.toLong); b.u32(0)
        originC.foreach(o => b.u64(o.toLong)); b.u64(0)
        b.u64(addr)
      }
      // final sentinel key: one past the last chunk in every dim
      b.u32(0); b.u32(0)
      shape.zip(cd).foreach { case (sh, c) => b.u64(((sh + c - 1) / c).toLong * c) }
      b.u64(8)
    }
    dsOh
  }
}
