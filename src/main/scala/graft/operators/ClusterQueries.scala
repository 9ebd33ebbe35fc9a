package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ArrayPrimitives => AP, KeyAlgebra, TextFunctions}

/** Native-mode clustering: the reference's oph_ccluster_kcluster
  * (etc/oph_primitives_list.in:37) clusters WITHIN one row's array (see
  * graft.functions.Numeric.oph_ccluster_kcluster); the natural Spark
  * upgrade clusters ACROSS rows — the distributed k-means the reference
  * cannot express.
  *
  * Two variants:
  *  - c01: MLlib KMeans (the production path; seeded but its k-means||
  *    init is not oracle-expressible — rows-only check).
  *  - c02: hand-rolled Lloyd iterations in pure DataFrame algebra with
  *    deterministic init (first k rows) and fixed-point arithmetic, so a
  *    DuckDB oracle replays it exactly. Same distribution shape as MLlib:
  *    per iteration one distributed aggregation + a k×64-long collect
  *    and broadcast-back — the only driver traffic is the centroids.
  */
object ClusterQueries {

  /** c01 — KMeans over the embedding vectors, k=5, fixed seed; output:
    * cluster sizes and intra-cluster mean distance to centroid. */
  def c01_kmeans_embeddings(s: SparkSession, dir: String): DataFrame = {
    val toVec = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val data = Tables.embeddings(s, dir)
      .withColumn("features", toVec(col("embedding").cast("array<double>")))
      .cache()
    val model = new KMeans().setK(5).setSeed(42L).setMaxIter(20)
      .setFeaturesCol("features")
      .fit(data)
    model.transform(data)
      .groupBy("prediction")
      .agg(count(lit(1)).as("n"))
      .orderBy("prediction")
  }

  /** c02 — two deterministic Lloyd iterations, k=5: vectors as 1e9
    * fixed-point longs (exact both engines), init = the k lowest vec_ids,
    * assignment = first-minimal squared distance (ties → lowest centroid
    * id), centroid update = elementwise truncating integer mean. Output:
    * final cluster sizes + fixed-point centroids. */
  def c02_kmeans_lloyd(s: SparkSession, dir: String): DataFrame = {
    val a2 = lloydAssignments(s, dir)
    a2.groupBy("cid")
      .agg(ArrayAggregates.ewSumLong(col("v")).as("sv"), count(lit(1)).as("n"))
      .select(col("cid"), col("n"),
        AP.joinLongs(transform(col("sv"), x => KeyAlgebra.ldiv(x, col("n"))))
          .as("centroid"))
      .orderBy("cid")
  }

  /** The assignment after one centroid update (the a2 step of
    * [[c02_kmeans_lloyd]]): one row per vector with its fixed-point
    * coordinates `v` and final cluster id `cid`. Shared by c02 and the
    * SemDeDup pass (DedupQueries.d12), whose DuckDB oracles replay the
    * same two deterministic Lloyd iterations. */
  def lloydAssignments(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    val e = Tables.embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1e9).cast("long")).as("v"))
      .cache()

    // assignment against the current (cid-sorted) centroid list: the
    // distance fold and argmin are pure codegen expressions per row
    def assign(cents: Seq[(Long, Seq[Long])]): DataFrame = {
      val sorted = cents.sortBy(_._1)
      val ids = lit(sorted.map(_._1).toArray)
      val ds = array(sorted.map { case (_, c) =>
        aggregate(
          zip_with(col("v"), lit(c.toArray), (x, y) => {
            val d = (x - y).cast("double"); d * d
          }),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
      e.withColumn("cid", TextFunctions.bindOnce(ds, d =>
        element_at(ids, array_position(d, array_min(d)).cast("int"))))
    }

    // one distributed partial+final aggregation; only k centroids reach
    // the driver (MLlib's own per-iteration traffic shape)
    def update(asg: DataFrame): Seq[(Long, Seq[Long])] =
      asg.groupBy("cid")
        .agg(ArrayAggregates.ewSumLong(col("v")).as("sv"), count(lit(1)).as("n"))
        .collect().toSeq.map { r =>
          val n = r.getLong(2)
          (r.getLong(0), r.getSeq[Long](1).map(_ / n)) // truncating division
        }

    val c0 = e.filter(col("vec_id") < k).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val c1 = update(assign(c0))
    assign(c1)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_kmeans_embeddings" -> (c01_kmeans_embeddings _),
    "c02_kmeans_lloyd" -> (c02_kmeans_lloyd _),
  )

  /** c01 has no DuckDB oracle (MLlib init; driver records the weaker
    * rows-only check); c02 replays exactly. */
  /** Shared CTE prefix replaying the two deterministic Lloyd iterations
    * in DuckDB (e → c0 → a1 → c1 → a2); a2 = (vec_id, v, cid). Reused by
    * the c02 and d12 oracles so their cluster ids come from one text. */
  private[operators] val lloydCte: String =
    """WITH e AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1e9) AS BIGINT)) AS v
         FROM embeddings),
       c0 AS (SELECT list(v ORDER BY vec_id) AS cs, list(vec_id ORDER BY vec_id) AS ids
              FROM e WHERE vec_id < 5),
       a1 AS (SELECT vec_id, v, ids[list_indexof(ds, list_min(ds))] AS cid
              FROM (SELECT e.vec_id, e.v, c0.ids,
                      list_transform(c0.cs, c -> list_reduce(
                        list_transform(range(1, 65),
                          i -> (e.v[i]-c[i])::DOUBLE * (e.v[i]-c[i])::DOUBLE),
                        (x,y) -> x+y)) AS ds
                    FROM e, c0)),
       c1 AS (SELECT list(m ORDER BY cid) AS cs, list(cid ORDER BY cid) AS ids FROM (
                SELECT cid, list(q ORDER BY i) AS m FROM (
                  SELECT cid, i, CAST(sum(v[i]) AS BIGINT) // count(*) AS q
                  FROM a1, range(1, 65) t(i) GROUP BY cid, i)
                GROUP BY cid)),
       a2 AS (SELECT vec_id, v, ids[list_indexof(ds, list_min(ds))] AS cid
              FROM (SELECT e.vec_id, e.v, c1.ids,
                      list_transform(c1.cs, c -> list_reduce(
                        list_transform(range(1, 65),
                          i -> (e.v[i]-c[i])::DOUBLE * (e.v[i]-c[i])::DOUBLE),
                        (x,y) -> x+y)) AS ds
                    FROM e, c1))"""

  val oracles: Map[String, String] = Map(
    "c02_kmeans_lloyd" ->
      s"""$lloydCte
       SELECT cid, any_value(n) AS n,
         array_to_string(list(q ORDER BY i), ',') AS centroid
       FROM (SELECT cid, i, CAST(sum(v[i]) AS BIGINT) // count(*) AS q,
               count(*) AS n
             FROM a2, range(1, 65) t(i) GROUP BY cid, i)
       GROUP BY cid ORDER BY cid""",
  )
}
