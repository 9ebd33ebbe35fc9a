package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q90's format-native skip machinery, pinned STRICTLY on a controlled
  * fixture (the operator's own require keeps a stats-exact escape for
  * arbitrary data; here the fixture guarantees pages must drop):
  * parquet-written blooms reject an absent key in every row group, and
  * column-index filtering returns strictly fewer rows than the
  * surviving row groups hold — pages were actually skipped — without
  * ever dropping a matching row. */
class ParquetNativeSkipSpec extends SparkSpec {
  import org.apache.hadoop.fs.Path
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.filter2.predicate.FilterApi
  import org.apache.parquet.filter2.compat.FilterCompat
  import org.apache.parquet.ParquetReadOptions
  import scala.jdk.CollectionConverters._

  test("blooms reject absent keys per row group; column index drops pages") {
    val s = spark
    import s.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_q90_spec").toString
    // 20k sorted rows, one file: 16 KiB pages with a 1000-row cap →
    // ~20 pages; keys 0..19999, custkey-style second column 0..499
    (0L until 20000L).map(i => (i, i % 500L, i.toDouble))
      .toDF("k", "ck", "v")
      .coalesce(1).sortWithinPartitions("k")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#ck", "true")
      .option("parquet.enable.dictionary#ck", "false")
      .option("parquet.page.size", (16 * 1024).toString)
      .option("parquet.page.row.count.limit", "1000")
      .parquet(p)
    val f = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val conf = s.sparkContext.hadoopConfiguration
    // --- bloom tier ---
    val r0 = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
    try {
      val blocks = r0.getFooter.getBlocks.asScala
      assert(blocks.nonEmpty)
      blocks.foreach { b =>
        val ccmd = b.getColumns.asScala.find(_.getPath.toDotString == "ck").get
        assert(ccmd.getBloomFilterOffset >= 0, "bloom filter not written")
        val bloom = r0.getBloomFilterDataReader(b).readBloomFilter(ccmd)
        assert(bloom != null)
        assert(!bloom.findHash(bloom.hash(987654321L)), // absent: every group
          "absent key not bloom-rejected")
        assert(bloom.findHash(bloom.hash(7L)), "present key bloom-rejected")
      }
    } finally r0.close()
    // --- page-skip tier: a 300-row range out of 20k MUST drop pages ---
    val pred = FilterApi.and(
      FilterApi.gtEq(FilterApi.longColumn("k"), java.lang.Long.valueOf(5000L)),
      FilterApi.ltEq(FilterApi.longColumn("k"), java.lang.Long.valueOf(5299L)))
    val r1 = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf),
      ParquetReadOptions.builder()
        .withRecordFilter(FilterCompat.get(pred))
        .useColumnIndexFilter(true).build())
    try {
      val total = r1.getRecordCount
      val filtered = r1.getFilteredRecordCount
      assert(filtered < total, s"no pages dropped ($filtered of $total)")
      assert(filtered >= 300L, s"matching rows dropped ($filtered < 300)")
    } finally r1.close()
  }

  test("q90 serves the three probes and its native-structure pins hold") {
    val out = RelationalQueries
      .q90_parquet_native_skip(spark, sf()).collect()
    assert(out.length == 3)
    val byProbe = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byProbe("ck_eq_absent") == 0L)
    assert(byProbe("ck_eq_lo") > 0L)
    assert(byProbe("ok_range") > 0L)
  }
}
