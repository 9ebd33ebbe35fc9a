package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the id-algebra (SURVEY.md §5 calls these out as the
  * missing test layer of the reference): verified against direct Scala
  * evaluation of the documented formulas. Uses raw ScalaCheck generators
  * with a fixed seed (the scalatest bridge artifact isn't available
  * offline).
  */
class KeyAlgebraPropSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  /** Evaluate column formulas over a batch of parameter rows in ONE Spark
    * job (row-at-a-time would be 60 jobs per property). */
  private def evalBatch(rows: Seq[(Long, Long, Long, Long)],
                        f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
                            org.apache.spark.sql.Column, org.apache.spark.sql.Column)
                          => org.apache.spark.sql.Column): Seq[Long] = {
    import spark.implicits._
    rows.toDF("p1", "p2", "p3", "p4")
      .select(f(col("p1"), col("p2"), col("p3"), col("p4")).cast("long"))
      .collect().map(_.getLong(0)).toSeq
  }

  private val ids = Gen.choose(1L, 1000000L)

  test("oph_id = 1 + (id-1)/size (floor), matches direct formula") {
    val rows = samples(Gen.zip(ids, Gen.choose(1L, 1000L)))
      .map { case (a, b) => (a, b, 0L, 0L) }
    val got = evalBatch(rows, (id, size, _, _) => KeyAlgebra.oph_id(id, size))
    rows.zip(got).foreach { case ((id, size, _, _), g) =>
      assert(g == 1 + (id - 1) / size, s"id=$id size=$size")
    }
  }

  test("oph_id2 block-preserving collapse formula") {
    val rows = samples(Gen.zip(ids, Gen.choose(1L, 100L), Gen.choose(1L, 100L)))
      .map { case (a, b, c) => (a, b, c, 0L) }
    val got = evalBatch(rows, (id, size, bs, _) => KeyAlgebra.oph_id2(id, size, bs))
    rows.zip(got).foreach { case ((id, size, bs, _), g) =>
      assert(g == 1 + (id - 1) % bs + ((id - 1) / (size * bs)) * bs,
        s"id=$id size=$size bs=$bs")
    }
  }

  test("oph_id_to_index2 = 1 + (floor((id-1)/bs) mod size)") {
    val rows = samples(Gen.zip(ids, Gen.choose(1L, 100L), Gen.choose(1L, 100L)))
      .map { case (a, b, c) => (a, b, c, 0L) }
    val got = evalBatch(rows,
      (id, bs, size, _) => KeyAlgebra.oph_id_to_index2(id, bs, size))
    rows.zip(got).foreach { case ((id, bs, size, _), g) =>
      assert(g == 1 + ((id - 1) / bs) % size, s"id=$id bs=$bs size=$size")
    }
  }

  test("oph_id_to_index decodes the coordinate along the last dim") {
    import spark.implicits._
    samples(Gen.zip(Gen.choose(1L, 20L), Gen.choose(1L, 20L)), 8)
      .foreach { case (s1, s2) =>
        val i = 1 + (s2 - 1) / 2 // a coordinate along the last dim
        val id = (i - 1) * s1 + 1 // row-major encode with c1 = 1
        val got = Seq(1).toDF("d")
          .select(KeyAlgebra.oph_id_to_index(lit(id), s1, s2).cast("long"))
          .head.getLong(0)
        assert(got == i, s"s1=$s1 s2=$s2 id=$id")
      }
  }

  test("oph_is_in_subset agrees with strided-range membership") {
    val rows = samples(Gen.zip(ids, Gen.choose(1L, 50L), Gen.choose(1L, 20L),
      Gen.choose(1L, 2000L)))
    import spark.implicits._
    val got = rows.toDF("id", "st", "sp", "mx")
      .select(KeyAlgebra.oph_is_in_subset(col("id"), col("st"), col("sp"), col("mx")))
      .collect().map(_.getBoolean(0)).toSeq
    rows.zip(got).foreach { case ((id, start, step, max), g) =>
      assert(g == (id >= start && id <= max && (id - start) % step == 0),
        s"id=$id start=$start step=$step max=$max")
    }
  }

  test("subset resolve agrees with direct range for random clauses") {
    samples(Gen.zip(Gen.choose(1, 30), Gen.choose(1, 5), Gen.choose(0, 30),
      Gen.choose(5, 40))).foreach { case (start, stride, len, size) =>
      val end = math.min(start + len, size)
      if (start <= end) {
        val resolved = Subset.resolve(Subset.parse(s"$start:$stride:$end"), size)
        assert(resolved == (start to end by stride).filter(_ <= size),
          s"clause $start:$stride:$end size=$size")
      }
    }
  }
}
