package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.plans.TextHashKernels
import org.apache.spark.sql.functions._

/** p24 DSIR importance resampling: re-derived by an independent
  * in-memory replay (same md5-60 bucket hash, same add-one smoothing,
  * same fixed-point freeze of the per-bucket log-ratio before the
  * integer doc sum), so the spec is an oracle of its own. */
class DsirSpec extends SparkSpec {

  test("p24 equals an in-memory hashed-ngram importance replay") {
    val B = 1024
    val out = PipelineQueries.p24_dsir_selection(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList

    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).map(t =>
          (TextHashKernels.md5Long60(t.getBytes("UTF-8")) % B).toInt)))
    val ct = Array.fill(B)(0L); val cr = Array.fill(B)(0L)
    docs.foreach { case (_, src, bs) =>
      val tgt = src == "src0"
      bs.foreach(b => if (tgt) ct(b) += 1 else cr(b) += 1)
    }
    val nt = ct.sum; val nr = cr.sum
    val wfp = Array.tabulate(B)(b =>
      math.floor(math.log((ct(b) + 1.0) / (nt + B)) * 1e6).toLong -
      math.floor(math.log((cr(b) + 1.0) / (nr + B)) * 1e6).toLong)
    val cand = docs.filter(_._2 != "src0")
    val scored = cand.map { case (id, _, bs) =>
      (id, bs.length.toLong, bs.map(wfp).sum)
    }
    val k = (cand.length + 9) / 10
    val expected = scored.sortBy(d => (-d._3, d._1)).take(k)
      .zipWithIndex.map { case ((id, n, w), i) => (i + 1L, id, n, w) }.toList
    assert(out == expected)
    assert(out.size == k && out.nonEmpty)
    // the kept set's minimum weight dominates the dropped set's maximum
    val keptMin = out.map(_._4).min
    val dropped = scored.sortBy(d => (-d._3, d._1)).drop(k)
    if (dropped.nonEmpty) assert(keptMin >= dropped.map(_._3).max)
  }
}
