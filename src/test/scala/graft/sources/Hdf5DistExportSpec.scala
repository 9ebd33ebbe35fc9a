package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executor-parallel HDF5 export: the driver writes only the implicit-
  * index metadata head, executors write chunk payloads at disjoint
  * offsets. The file must read back value-exact through the from-spec
  * reader on both the contiguous-id fast path and the sort fallback,
  * with partial tail chunks zero-padded to their full slot. */
class Hdf5DistExportSpec extends SparkSpec {

  private def grid(n: Int, m: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map(i => (i.toLong, (0 until m).map(j => i * 0.5 + j * 0.125)))

  private def readAll(p: String, n: Int, m: Int): Array[Double] = {
    val r = new HDF5.Hdf5Reader(p)
    try r.readSlab("measure", Seq(0, 0), Seq(n, m)) finally r.close()
  }

  test("multi-chunk distributed write reads back value-exact") {
    import spark.implicits._
    val (n, m) = (60, 8)
    val df = grid(n, m).toDF("id", "a")
    val p = java.nio.file.Files.createTempDirectory("h5dist")
      .resolve("d.h5").toString
    val (rows, chunks) = HDF5.writeDoubleVarDistributed(df, "id", "a", p,
      "measure", rowsPerChunk = 16)
    assert(rows == n)
    assert(chunks == 4, "16-row chunks over 60 rows must give 4 chunks " +
      "(a multi-task parallel write, incl. a partial tail)")
    val got = readAll(p, n, m)
    val want = grid(n, m).flatMap(_._2)
    assert(got.toSeq == want, "distributed chunk placement mismatch")
  }

  test("non-contiguous ids take the sort fallback and still place correctly") {
    import spark.implicits._
    val (n, m) = (30, 4)
    // ids 0,2,4,... — hi-lo+1 != n forces the sort+zipWithIndex path
    val rowsIn = (0 until n).map(i =>
      ((i * 2).toLong, (0 until m).map(j => i * 1.0 + j * 0.25)))
    val df = rowsIn.toDF("id", "a")
    val p = java.nio.file.Files.createTempDirectory("h5dist")
      .resolve("s.h5").toString
    val (rows, chunks) = HDF5.writeDoubleVarDistributed(df, "id", "a", p,
      "measure", rowsPerChunk = 7)
    assert(rows == n && chunks == 5)
    val got = readAll(p, n, m)
    val want = rowsIn.flatMap(_._2)
    assert(got.toSeq == want)
  }

  test("matches the sequential streamed writer value-for-value") {
    import spark.implicits._
    val (n, m) = (23, 3)
    val df = grid(n, m).toDF("id", "a")
    val pd = java.nio.file.Files.createTempDirectory("h5dist")
      .resolve("par.h5").toString
    val ps = java.nio.file.Files.createTempDirectory("h5dist")
      .resolve("seq.h5").toString
    HDF5.writeDoubleVarDistributed(df, "id", "a", pd, "measure",
      rowsPerChunk = 5)
    HDF5.writeDoubleVarStreamed(ps, Seq("id_dim" -> n, "elem" -> m),
      "measure", grid(n, m).map(_._2.toArray).iterator)
    assert(readAll(pd, n, m).toSeq == readAll(ps, n, m).toSeq,
      "parallel and sequential sinks must be interchangeable")
  }

  test("shape edges round-trip: 1-row, 1-col, chunk==n, chunk>n, tail=1") {
    import spark.implicits._
    for ((n, m, rpc) <- Seq((1, 8, 4), (16, 1, 4), (12, 3, 12), (5, 2, 9),
        (17, 4, 8))) {
      val df = grid(n, m).toDF("id", "a")
      val p = java.nio.file.Files.createTempDirectory("h5dist")
        .resolve(s"e_${n}_${m}_$rpc.h5").toString
      val (rows, chunks) = HDF5.writeDoubleVarDistributed(df, "id", "a", p,
        "measure", rowsPerChunk = rpc)
      assert(rows == n && chunks == (n + rpc - 1) / rpc, s"($n,$m,$rpc)")
      assert(readAll(p, n, m).toSeq == grid(n, m).flatMap(_._2),
        s"roundtrip mismatch at ($n,$m,$rpc)")
    }
  }

  test("fixed-array and v2-B-tree indexed distributed exports round-trip") {
    import spark.implicits._
    val (n, m) = (60, 8)
    val df = grid(n, m).toDF("id", "a")
    val want = grid(n, m).flatMap(_._2)
    for ((idx, expected) <- Seq(
        "fixedarray" -> classOf[HDF5.IdxFixedArray],
        "btree2" -> classOf[HDF5.IdxBTreeV2])) {
      val p = java.nio.file.Files.createTempDirectory("h5dist")
        .resolve(s"$idx.h5").toString
      // 16-row chunks over 60 rows: 4 chunks written by >1 task
      val (rows, chunks) = HDF5.writeDoubleVarDistributed(df, "id", "a", p,
        "measure", rowsPerChunk = 16, index = idx)
      assert(rows == n && chunks == 4, idx)
      // the file must really carry the requested index structure (a
      // silent fall-through to implicit would also read back fine)
      val r = new HDF5.Hdf5Reader(p)
      try {
        assert(r.dataset("measure").chunkIndex.getClass == expected,
          s"$idx: wrong on-disk chunk index")
        assert(r.readSlab("measure", Seq(0, 0), Seq(n, m)).toSeq == want, idx)
      } finally r.close()
    }
  }

  test("extensible-array indexed distributed export round-trips at " +
    "every element home: inline, one EADB, multi-generation") {
    import spark.implicits._
    // chunk counts chosen against the EA creation params (32/4/16/4/10):
    //  3  -> all elements inline in the EAIB index block
    //  15 -> 4 inline + one generation-0 EADB (16 slots, 11 used)
    //  120-> inline + generations 0..3 (16+32+32+64 slots), all five
    //        data blocks addressed straight from the index block
    for ((n, m, rpc, nChunks) <- Seq((12, 3, 4, 3), (60, 8, 4, 15),
        (120, 2, 1, 120))) {
      val df = grid(n, m).toDF("id", "a")
      val p = java.nio.file.Files.createTempDirectory("h5dist")
        .resolve(s"ea$n.h5").toString
      val (rows, chunks) = HDF5.writeDoubleVarDistributed(df, "id", "a", p,
        "measure", rowsPerChunk = rpc, index = "extarray")
      assert(rows == n && chunks == nChunks, s"n=$n")
      val r = new HDF5.Hdf5Reader(p)
      try {
        val d = r.dataset("measure")
        assert(d.chunkIndex.getClass == classOf[HDF5.IdxExtArray],
          s"n=$n: wrong on-disk chunk index")
        // the dataspace must declare dim 0 unlimited (the whole point
        // of the EA index: the file stays append-able)
        assert(d.maxShape.exists(_.headOption.contains(-1L)),
          s"n=$n: dim 0 not H5S_UNLIMITED")
        assert(r.readSlab("measure", Seq(0, 0), Seq(n, m)).toSeq ==
          grid(n, m).flatMap(_._2), s"n=$n")
      } finally r.close()
    }
  }

  test("paged fixed-array data block: entry count past 2^pageBits") {
    import spark.implicits._
    // rowsPerChunk 1 over 40 rows -> 40 entries; the builder's
    // faPageBits default (10) keeps one page, so request the paged
    // shape through a tiny page via the writer's head builder contract:
    // 40 chunks with pageBits 10 stays unpaged — this case pins the
    // UNPAGED branch at a chunk count well above the other tests
    val (n, m) = (40, 2)
    val df = grid(n, m).toDF("id", "a")
    val p = java.nio.file.Files.createTempDirectory("h5dist")
      .resolve("fa40.h5").toString
    val (rows, chunks) = HDF5.writeDoubleVarDistributed(df, "id", "a", p,
      "measure", rowsPerChunk = 1, index = "fixedarray")
    assert(rows == n && chunks == 40)
    assert(readAll(p, n, m).toSeq == grid(n, m).flatMap(_._2))
  }

  test("duplicate ids fail loud instead of silently misplacing rows") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0)), (1L, Seq(2.0))).toDF("id", "a")
    val p = java.nio.file.Files.createTempDirectory("h5dist")
      .resolve("dup.h5").toString
    val e = intercept[Exception] {
      HDF5.writeDoubleVarDistributed(df, "id", "a", p, "measure", 4)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  // ------------------------------------------------ FILTERED (two-phase)

  test("filtered distributed write round-trips through all three indexes") {
    import spark.implicits._
    val (n, m) = (60, 8)
    val df = grid(n, m).toDF("id", "a")
    val want = grid(n, m).flatMap(_._2)
    for (idx <- Seq("fixedarray", "btree2", "extarray")) {
      val p = java.nio.file.Files.createTempDirectory("h5distz")
        .resolve(s"z_$idx.h5").toString
      val (rows, chunks, zBytes) = HDF5.writeDoubleVarDistributedFiltered(
        df, "id", "a", p, "measure", rowsPerChunk = 16, index = idx)
      assert(rows == n && chunks == 4, idx)
      assert(zBytes > 0 && zBytes < n.toLong * m * 8,
        s"$idx: shuffle+deflate must beat raw on this regular grid " +
          s"($zBytes vs ${n * m * 8})")
      assert(!new java.io.File(p + ".chunks").exists,
        s"$idx: spill directory must be cleaned up")
      assert(readAll(p, n, m).toSeq == want, idx)
    }
  }

  test("filtered export matches the sequential filtered writer value-exact") {
    import spark.implicits._
    val (n, m) = (23, 3)
    val df = grid(n, m).toDF("id", "a")
    val pd = java.nio.file.Files.createTempDirectory("h5distz")
      .resolve("par.h5").toString
    val ps = java.nio.file.Files.createTempDirectory("h5distz")
      .resolve("seq.h5").toString
    HDF5.writeDoubleVarDistributedFiltered(df, "id", "a", pd, "measure",
      rowsPerChunk = 5, index = "btree2")
    HDF5.writeLatestVars(ps, Seq(HDF5.H5Var("measure",
      Seq("id_dim" -> n, "elem" -> m), grid(n, m).flatMap(_._2).toArray,
      Some(Seq(5, m)))), index = "btree2")
    assert(readAll(pd, n, m).toSeq == readAll(ps, n, m).toSeq,
      "parallel-filtered and sequential-filtered sinks must agree")
  }

  test("a flipped payload byte fails the fletcher32 verify on read") {
    import spark.implicits._
    val (n, m) = (20, 4)
    val df = grid(n, m).toDF("id", "a")
    val p = java.nio.file.Files.createTempDirectory("h5distz")
      .resolve("corrupt.h5").toString
    HDF5.writeDoubleVarDistributedFiltered(df, "id", "a", p, "measure",
      rowsPerChunk = 10, index = "fixedarray")
    // corrupt one byte in the LAST 64 bytes of the file — payload, not head
    val raf = new java.io.RandomAccessFile(p, "rw")
    try {
      raf.seek(raf.length - 32)
      val b = raf.read()
      raf.seek(raf.length - 32)
      raf.write(b ^ 0xFF)
    } finally raf.close()
    val e = intercept[Exception] { readAll(p, n, m) }
    assert(e.getMessage.contains("fletcher32") ||
      e.getMessage.contains("deflate"),
      s"corruption must be detected, got: ${e.getMessage}")
  }

  test("filtered write with don't-filter-partial stores the tail raw") {
    import spark.implicits._
    val (n, m) = (22, 4) // 3 chunks of 8: tail has 6 rows -> partial
    val df = grid(n, m).toDF("id", "a")
    val p = java.nio.file.Files.createTempDirectory("h5distz")
      .resolve("dfp.h5").toString
    val (rows, chunks, zBytes) = HDF5.writeDoubleVarDistributedFiltered(
      df, "id", "a", p, "measure", rowsPerChunk = 8, index = "fixedarray",
      dontFilterPartial = true)
    assert(rows == n && chunks == 3)
    // the raw tail occupies its full nominal slot (8*4*8 bytes), so the
    // payload must be at least that plus two nonempty filtered chunks
    assert(zBytes >= 8 * 4 * 8 + 2, s"payload $zBytes")
    assert(readAll(p, n, m).toSeq == grid(n, m).flatMap(_._2),
      "raw tail must decode under layout flag bit 0 (filters skipped)")
    // same grid, full filtering: smaller payload (tail compresses too)
    val p2 = java.nio.file.Files.createTempDirectory("h5distz")
      .resolve("dfp2.h5").toString
    val (_, _, zBytes2) = HDF5.writeDoubleVarDistributedFiltered(
      df, "id", "a", p2, "measure", rowsPerChunk = 8, index = "fixedarray")
    assert(zBytes2 < zBytes, "filtering the tail must shrink the payload")
  }

  test("filtered write with non-contiguous ids and a partial tail chunk") {
    import spark.implicits._
    val (n, m) = (17, 4)
    val rowsIn = (0 until n).map(i =>
      ((i * 3).toLong, (0 until m).map(j => i * 1.0 + j * 0.25)))
    val df = rowsIn.toDF("id", "a")
    val p = java.nio.file.Files.createTempDirectory("h5distz")
      .resolve("gap.h5").toString
    val (rows, chunks, _) = HDF5.writeDoubleVarDistributedFiltered(
      df, "id", "a", p, "measure", rowsPerChunk = 8, index = "extarray")
    assert(rows == n && chunks == 3)
    assert(readAll(p, n, m).toSeq == rowsIn.flatMap(_._2))
  }

  test("a non-shared spill path fails loud before any file placement") {
    // the shared-filesystem contract check the writer runs between
    // phase 1 and the head write: blobs an executor spilled must be
    // visible from the driver, else fail with the descriptive message
    val dir = java.nio.file.Files.createTempDirectory("h5spill").toString
    new java.io.FileOutputStream(s"$dir/c0").close() // c1, c2 "missing"
    val e = intercept[IllegalArgumentException] {
      HDF5.requireSharedSpill(dir, 3, "/data/out.h5")
    }
    assert(e.getMessage.contains("SHARED filesystem"))
    assert(e.getMessage.contains("2 of 3"))
  }
}
