package graft.sources

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The single-file `.nc` export path (oph_export classic/cdf5/netcdf4):
  * bytes must pass through one sequential writer, but driver MEMORY must
  * stay bounded — the sorted fragment is pumped partition-by-partition
  * through `toLocalIterator` into the CDF / HDF5-contiguous data section.
  * The listener test is the [[ZarrExportSpec]] counterpart: there no row
  * bytes reach the driver at all; here each TASK result is one partition,
  * so the PEAK (max single task result) is bounded even though the total
  * equals the data size. */
class NcExportStreamSpec extends SparkSpec {

  private def tmpFile(ext: String): String =
    Files.createTempDirectory("graft_ncstream").resolve(s"out.$ext").toString

  /** The IoServer oph_export pump shape. */
  private def pump(df: org.apache.spark.sql.DataFrame) = {
    import scala.jdk.CollectionConverters._
    df.orderBy("id_dim").select("id_dim", "measure")
      .toLocalIterator().asScala.map(_.getSeq[Double](1).toArray)
  }

  test("classic CDF streamed export: peak driver task-result is one partition") {
    val maxTask = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          maxTask.accumulateAndGet(e.taskMetrics.resultSize, Math.max(_, _))
    }
    // ~10 MiB of array data across 16 partitions: a collect()-style
    // export would ship it as one task-result wave; the partition pump
    // bounds every single task result to ~1/16 of the data
    val (n, m) = (20000, 64)
    val df = spark.range(1, n + 1).select(col("id").as("id_dim"))
      .withColumn("measure",
        transform(sequence(lit(1), lit(m)), x => x.cast("double") + col("id_dim")))
      .repartition(16)
    val p = tmpFile("nc")
    spark.sparkContext.addSparkListener(listener)
    try {
      NetCDF3.writeDoubleVarStreamed(p, Seq("id_dim" -> n, "elem" -> m),
        "measure", pump(df))
      Thread.sleep(2000) // listener bus drains asynchronously
      val dataBytes = n.toLong * m * 8
      assert(dataBytes > 8L * 1024 * 1024)
      assert(maxTask.get() < dataBytes / 4,
        s"peak task result ${maxTask.get()} — export collected, not streamed")
    } finally spark.sparkContext.removeSparkListener(listener)
    // readback: first and last rows landed sorted and intact
    val hdr = NetCDF3.readHeader(p)
    val v = hdr.variable("measure")
    assert(NetCDF3.readSlab(p, hdr, v, Seq(0, 0), Seq(1, 3)).toSeq ==
      Seq(2.0, 3.0, 4.0)) // id_dim 1 + elem 1..3
    assert(NetCDF3.readSlab(p, hdr, v, Seq(n - 1, 0), Seq(1, 2)).toSeq ==
      Seq(n + 1.0, n + 2.0))
  }

  test("cdf5 streamed export round-trips") {
    import spark.implicits._
    val (n, m) = (40, 5)
    val df = (1 to n).map(i =>
      (i.toLong, Array.tabulate(m)(j => i * 10.0 + j)))
      .toDF("id_dim", "measure").repartition(6)
    val p = tmpFile("nc")
    NetCDF3.writeDoubleVarStreamed(p, Seq("id_dim" -> n, "elem" -> m),
      "measure", pump(df), version = 5)
    val hdr = NetCDF3.readHeader(p)
    assert(hdr.version == 5)
    val v = hdr.variable("measure")
    val got = NetCDF3.readSlab(p, hdr, v, Seq(0, 0), Seq(n, m)).toSeq
    val want = (1 to n).flatMap(i => (0 until m).map(j => i * 10.0 + j))
    assert(got == want)
  }

  test("netcdf4 (HDF5 contiguous) streamed export round-trips") {
    import spark.implicits._
    val (n, m) = (60, 7)
    val df = (1 to n).map(i =>
      (i.toLong, Array.tabulate(m)(j => i * 2.0 - j * 0.5)))
      .toDF("id_dim", "measure").repartition(5)
    val p = tmpFile("h5")
    HDF5.writeDoubleVarStreamed(p, Seq("id_dim" -> n, "elem" -> m),
      "measure", pump(df))
    val r = new HDF5.Hdf5Reader(p)
    try {
      val got = r.readSlab("measure", Seq(0, 0), Seq(n, m)).toSeq
      val want = (1 to n).flatMap(i => (0 until m).map(j => i * 2.0 - j * 0.5))
      assert(got == want)
      // interior hyperslab through the contiguous layout
      val slab = r.readSlab("measure", Seq(10, 2), Seq(2, 3)).toSeq
      val wantSlab = for (i <- 11 to 12; j <- 2 until 5)
        yield i * 2.0 - j * 0.5
      assert(slab == wantSlab)
    } finally r.close()
  }

  test("streamed writers verify the element count against the dims") {
    val p = tmpFile("nc")
    val under = intercept[IllegalArgumentException] {
      NetCDF3.writeDoubleVarStreamed(p, Seq("x" -> 3), "m",
        Iterator(Array(1.0, 2.0)))
    }
    assert(under.getMessage.contains("streamed 2"))
    val over = intercept[IllegalArgumentException] {
      HDF5.writeDoubleVarStreamed(tmpFile("h5"), Seq("x" -> 2), "m",
        Iterator(Array(1.0, 2.0), Array(3.0)))
    }
    assert(over.getMessage.contains("more than 2"))
  }
}
