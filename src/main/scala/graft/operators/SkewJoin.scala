package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handling splits
  * oversized SORT-MERGE partitions at runtime, but when one hot key
  * dominates (the classic power-law fact table), explicit salting is the
  * reliable fix at 100 TB:
  *
  *  - the LEFT (large, skewed) side gets a random salt in [0, n);
  *  - the RIGHT side is replicated n× (one copy per salt value);
  *  - the join key becomes (key, salt) — the hot key's rows now spread
  *    over n reducers instead of one.
  *
  * Result is row-identical to the plain join (the salt never leaves the
  * join), verified by SkewJoinSpec.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("__salt",
      (rand(42L) * salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop(saltedRight(key))
      .drop("__salt")
  }
}
