package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers the native expressions as SQL functions") {
    // an isolated session so the extension injection is exercised
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 2)
      .withExtensions(new GraftExtensions)
      .appName("graft-ext-spec")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val r = spark.sql(
        """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
           graft_sorted_intersect_size(array(1L, 3L, 5L), array(3L, 5L, 9L)) AS i
        """).head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getInt(1) == 2)
    } finally spark.stop()
  }
}
