package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join is row-identical to the plain join on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of fact rows hit one hot key
    val fact = (1 to 5000).map(i =>
      (if (i % 10 == 0) (i % 7).toLong else 1L, i.toLong)).toDF("k", "v")
    val dim = (0L to 7L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "v", "name")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
