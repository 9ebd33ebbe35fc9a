package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native PQ kernels must be BIT-EXACT replacements for the HOF
  * formulation s08/s09 shipped with (same fold order, same first-min
  * argmin) — the DuckDB oracles replay that arithmetic, so any drift
  * here is an oracle break. */
class PQKernelSpec extends SparkSpec {

  test("PQEncode/PQLut/PQAdc match the HOF build bit-exactly") {
    val (m8, k16, d8) = (8, 16, 8)
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
    val cb: Seq[Seq[Double]] = emb.filter(col("vec_id") % 31 === 1)
      .orderBy("vec_id").limit(k16).collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    assert(cb.length == k16)
    val cbCol = typedlit(cb)
    val cbFlat = cb.flatten
    def subDist(x: Column, cbc: Column, m: Column): Column =
      aggregate(sequence(lit(0), lit(d8 - 1)), lit(0.0), (acc, i) =>
        acc + (element_at(x, m * d8 + i + 1) - element_at(cbc, m * d8 + i + 1)) *
          (element_at(x, m * d8 + i + 1) - element_at(cbc, m * d8 + i + 1)))
    val both = emb
      .withColumn("hof_codes",
        transform(sequence(lit(0), lit(m8 - 1)), m => {
          val dists = transform(sequence(lit(0), lit(k16 - 1)), c =>
            subDist(col("a"), element_at(cbCol, c.cast("int") + 1), m))
          array_position(dists, array_min(dists)) - 1
        }))
      .withColumn("nat_codes", PQEncode(col("a"), cbFlat))
      .withColumn("hof_lut",
        transform(sequence(lit(0), lit(m8 - 1)), m =>
          transform(sequence(lit(0), lit(k16 - 1)), c =>
            subDist(col("a"), element_at(cbCol, c.cast("int") + 1), m))))
      .withColumn("nat_lut", PQLut(col("a"), cbFlat))
      .withColumn("hof_adc",
        aggregate(sequence(lit(0), lit(m8 - 1)), lit(0.0),
          (acc, m) => acc + element_at(
            element_at(col("hof_lut"), m.cast("int") + 1),
            element_at(col("hof_codes"), m.cast("int") + 1).cast("int") + 1)))
      .withColumn("nat_adc", PQAdc(col("nat_lut"), col("nat_codes")))
      .cache()
    assert(both.count() > 0)
    assert(both.filter(col("hof_codes") =!= col("nat_codes")).count() == 0)
    assert(both.filter(col("hof_lut") =!= col("nat_lut")).count() == 0)
    assert(both.filter(col("hof_adc") =!= col("nat_adc")).count() == 0)
    both.unpersist()
  }
}
