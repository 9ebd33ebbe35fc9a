package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Native-mode clustering: the reference's oph_ccluster_kcluster
  * (etc/oph_primitives_list.in:37) clusters WITHIN one row's array (see
  * graft.functions.Numeric.oph_ccluster_kcluster); the natural Spark
  * upgrade clusters ACROSS rows with MLlib KMeans — the distributed
  * k-means the reference cannot express. Rows-only check (MLlib init is
  * seeded but not oracle-expressible in SQL).
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_kmeans_embeddings" -> (c01_kmeans_embeddings _),
  )
  /** No DuckDB oracle (driver records the weaker rows-only check). */
  val oracles: Map[String, String] = Map.empty
}
