package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.cube.Cube

/** The cube API exercised end-to-end against DuckDB: embeddings as a
  * 1-explicit × (8×8)-implicit cube, run through the canonical Ophidia
  * workload chain (subset → in-array reduce → across-row aggregate).
  */
object CubeQueries {

  private def cube(s: SparkSession, dir: String): Cube = {
    val base = Tables.embeddings(s, dir)
      .select((col("vec_id") + 1).as("id_dim"),
        col("embedding").cast("array<double>").as("measure"))
    Cube(base, Seq("row" -> base.count().toInt), Seq("x" -> 8, "y" -> 8))
  }

  /** qc01 — subset the explicit dim (odd rows), average out the implicit
    * y dim, then elementwise-max-reduce blocks of 50 rows... kept as the
    * 2-stage version so the oracle stays a readable mirror. */
  def qc01_cube_pipeline(s: SparkSession, dir: String): DataFrame =
    cube(s, dir)
      .subsetExplicit("row", "1:2:end")
      .reduceImplicit("y", "avg")
      .df.orderBy("id_dim")
      .withColumn("measure", graft.functions.ArrayPrimitives.fx12(col("measure")))

  /** qc02 — OPH_AGGREGATE path: reduce an EXPLICIT dim (elementwise max
    * across 50-row blocks, partial+final Aggregator — exact for max),
    * then average out the implicit y dim, through a refragment (the
    * reference's MERGE: repartition, no semantic change). */
  def qc02_cube_aggregate(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .select((col("vec_id") + 1).as("id_dim"),
        col("embedding").cast("array<double>").as("measure"))
    val n = base.count().toInt
    Cube(base, Seq("outer" -> (n / 50), "inner" -> 50), Seq("x" -> 8, "y" -> 8))
      .reduceExplicit("inner", "max")
      .reduceImplicit("y", "avg")
      .refragment(4)
      .df.orderBy("id_dim")
      .withColumn("measure", graft.functions.ArrayPrimitives.fx12(col("measure")))
  }

  /** qc03 — the reshape family end-to-end: subset the implicit y dim to
    * its first half (OPH_SUBSET on an in-array dim), permute the
    * implicit order to (y, x) (OPH_PERMUTE index remap), then expand the
    * now-outermost y into rows (OPH_EXPAND drill-down, re-keying
    * id_dim row-major). All three stay declarative: two in-array index
    * remaps and one posexplode — no shuffle until the output sort. */
  def qc03_cube_reshape(s: SparkSession, dir: String): DataFrame =
    cube(s, dir)
      .subsetImplicit("y", "1:4")
      .permuteImplicit(Seq("y", "x"))
      .expand()
      .df.orderBy("id_dim")
      .withColumn("measure", graft.functions.ArrayPrimitives.fx12(col("measure")))

  /** qc04 — DISTRIBUTED n-D Zarr export round trip: a formula cube with
    * TWO explicit dims (60×4) and one implicit (3) exports via
    * [[Cube.exportZarr]] (executors write chunks along the outer dim,
    * full 3-D shape in the metadata, no collect anywhere), then the
    * store re-imports through file_import (explicit=1 → 60 rows of the
    * flattened 4×3 inner block) and the oracle replays the formula. */
  def qc04_cube_zarr_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.engine.IoServer
    val (d0, d1, m) = (60, 4, 3)
    val rows = (0 until d0).flatMap(i => (0 until d1).map { j =>
      ((i * d1 + j + 1).toLong,
        Array.tabulate(m)(k => i * 0.5 + j * 0.25 + k * 0.125)) // exact
    })
    import s.implicits._
    val df = rows.toDF("id_dim", "measure").repartition(5)
    val tmp = java.nio.file.Files.createTempDirectory("graft_qc4")
    val path = tmp.resolve("cube.zarr").toString
    val shardedPath = tmp.resolve("cube_sharded.zarr").toString
    val cube = Cube(df, Seq("t" -> d0, "lat" -> d1), Seq("lon" -> m))
    cube.exportZarr(path, v3 = true, rowsPerChunk = 16) // 4-chunk grid
    // sharding_indexed twin: 2-outer-slab inner chunks, 4 per shard →
    // 8 shard objects, last one partial; re-imported through the ranged
    // index reads
    cube.exportZarrSharded(shardedPath, rowsPerChunk = 8, chunksPerShard = 4)
    val ses = new IoServer(s).newSession()
    ses.execute(s"operation=file_import;frag_name=czr;src_path=@$path;" +
      "measure=measure;explicit=1")
    ses.execute(s"operation=file_import;frag_name=czs;src_path=@$shardedPath;" +
      "measure=measure;explicit=1")
    val zr = ses.execute(
      "operation=select;field=id_dim|measure;from=czr;order=id_dim").get
      .select(col("id_dim"),
        graft.functions.ArrayPrimitives.fx12(col("measure")).as("m_zarr"))
    val zs = ses.execute(
      "operation=select;field=id_dim|measure;from=czs;order=id_dim").get
      .select(col("id_dim"),
        graft.functions.ArrayPrimitives.fx12(col("measure")).as("m_sharded"))
    zr.join(zs, "id_dim").orderBy("id_dim")
  }

  /** qc05 — climatological anomaly, the reference's signature climate
    * workload (oph_reduce2 over time concept levels + oph_intercube
    * subtraction): the embedding rows form a (month × year) explicit
    * grid over a 64-cell implicit field; the per-month climatology is an
    * OPH_AGGREGATE (reduceExplicit "sum" across the 50 years, then /ny),
    * and the anomaly is the intercube difference between each row and
    * its month's climatology, joined back by broadcast.
    *
    * Determinism: the measure is scaled to integer-valued doubles
    * (floor ×1e6) FIRST, so the cross-row partial sums are exact in any
    * order and the single /50 is one correctly-rounded division — the
    * same trick that makes c03/p17 engine-portable, applied to the cube
    * algebra. Scale shape: one groupBy for the climatology (nm rows),
    * broadcast join back, no other shuffle. */
  def qc05_cube_anomaly(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra
    val ny = 50
    val base = Tables.embeddings(s, dir)
      .select((col("vec_id") + 1).as("id_dim"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1e6).cast("double")).as("measure"))
    val n = base.count().toInt
    require(n % ny == 0, s"grid needs a whole number of years: $n/$ny")
    val c = Cube(base, Seq("month" -> (n / ny), "year" -> ny),
      Seq("cell" -> 64))
    val clim = c.reduceExplicit("year", "sum")
      .apply_(m => transform(m, v => v / ny))
      .df.select(col("id_dim").as("mid"), col("measure").as("clim"))
    c.df
      .withColumn("mid", KeyAlgebra.oph_id(col("id_dim"), ny))
      .join(broadcast(clim), "mid")
      .select(col("id_dim"),
        graft.functions.ArrayPrimitives.fx12(
          zip_with(col("measure"), col("clim"), (a, b) => a - b))
          .as("anomaly"))
      .orderBy("id_dim")
  }

  /** qc06 — 2× REGRID (coarsening), the OPH_REDUCE2-with-group-size
    * workload that halves resolution along one spatial axis AND the
    * time axis: the implicit x dim coarsens 8→4 by pairwise mean
    * (in-array remap, [[graft.cube.Cube.coarsenImplicit]] — no
    * shuffle), and consecutive row pairs aggregate by elementwise sum
    * then halve (the qc02 outer/inner explicit-dim trick). Measures are
    * integer-scaled first (the qc05 determinism trick), so every value
    * stays on an exact ¼-integer dyadic grid — both engines replay the
    * identical doubles, fx12 freezes them.
    *
    * Scale shape: one in-array pass + one 2-row groupBy (partial agg
    * collapses pairs map-side when co-located; one narrow exchange
    * otherwise). The regrid never explodes cells. */
  def qc06_cube_regrid(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .select((col("vec_id") + 1).as("id_dim"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1e6).cast("double")).as("measure"))
    val n = base.count().toInt
    require(n % 2 == 0, s"regrid pairs rows: even count needed, got $n")
    Cube(base, Seq("outer" -> (n / 2), "inner" -> 2), Seq("x" -> 8, "y" -> 8))
      .coarsenImplicit("x", 2, "avg")
      .reduceExplicit("inner", "sum")
      .apply_(m => transform(m, v => v / 2.0))
      .df.orderBy("id_dim")
      .withColumn("measure", graft.functions.ArrayPrimitives.fx12(col("measure")))
  }

  /** qc07 — OPH_INTERCUBE, the two-cube elementwise algebra (the
    * upstream framework's cube-vs-cube operator; qc05 uses the same
    * arithmetic inline for its anomaly, this exercises it as the
    * FIRST-CLASS [[Cube.intercube]] API): the corpus splits into two
    * half-cubes by row parity (ensemble member A = odd rows, member B
    * = even rows — OPH_SUBSET re-keys both densely, so the id spaces
    * align 1:1), the intercube difference A − B runs as one zip_with
    * over the aligned join, and the y dim max-reduces the result to
    * the per-row spread profile.
    *
    * Scale shape: BUCKET-ELIMINATED join — both members persist once as
    * id_dim-bucketed sorted tables (memoized, ingest-attributed; the
    * production shape, since ensemble members are stored cubes, not
    * in-flight subsets), so the intercube join aligns bucket-to-bucket
    * with ZERO exchange on either side (PlanSpec pins no
    * hashpartitioning(id_dim) in the plan) and the reduce stays
    * in-array. At 100 TB the difference is re-shuffling two full cubes
    * per algebra step vs none. Elementwise double subtraction is a
    * single IEEE operation — deterministic across engines, the README
    * elementwise-math contract. */
  def qc07_intercube(s: SparkSession, dir: String): DataFrame = {
    val base = cube(s, dir)
    val aC = base.subsetExplicit("row", "1:2:end") // odd ids → member A
    val bC = base.subsetExplicit("row", "2:2:end") // even ids → member B
    val (ta, tb) =
      graft.core.SessionMemo.memoize(s, "qc07-buckets:" + dir) {
        val tag = graft.core.SessionMemo.pathTag(s, dir)
        val wh = new java.io.File(
          System.getProperty("java.io.tmpdir"), s"graft_qc07_wh_$tag")
        def persist(name: String, df: org.apache.spark.sql.DataFrame)
            : String = {
          val t = s"graft_qc07_${name}_$tag"
          df.repartition(8, col("id_dim"))
            .write.bucketBy(8, "id_dim").sortBy("id_dim")
            .option("path", new java.io.File(wh, name).getAbsolutePath)
            .mode("overwrite").saveAsTable(t)
          t
        }
        (persist("a", aC.df), persist("b", bC.df))
      }
    Cube(s.table(ta), aC.explicitDims, aC.implicitDims)
      .intercube(Cube(s.table(tb), bC.explicitDims, bC.implicitDims), _ - _)
      .reduceImplicit("y", "max")
      .df.orderBy("id_dim")
      .withColumn("measure", graft.functions.ArrayPrimitives.fx12(col("measure")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc07_intercube" -> (qc07_intercube _),
    "qc06_cube_regrid" -> (qc06_cube_regrid _),
    "qc05_cube_anomaly" -> (qc05_cube_anomaly _),
    "qc01_cube_pipeline" -> (qc01_cube_pipeline _),
    "qc02_cube_aggregate" -> (qc02_cube_aggregate _),
    "qc03_cube_reshape" -> (qc03_cube_reshape _),
    "qc04_cube_zarr_roundtrip" -> (qc04_cube_zarr_roundtrip _),
  )

  val oracles: Map[String, String] = Map(
    // same integer-scaled measures, same pairwise-mean folds with the
    // 0.0 seed, same (wa+wb)/2 row pairing — all values on an exact
    // quarter-integer dyadic grid
    "qc06_cube_regrid" ->
      """WITH e AS (SELECT vec_id,
           list_transform(embedding, v -> floor(v::DOUBLE * 1e6)) AS m
         FROM embeddings),
       c AS (SELECT vec_id, list_transform(range(0, 32), k ->
           (0.0 + m[((k // 8) * 16 + (k % 8))::INT + 1]
                + m[((k // 8) * 16 + 8 + (k % 8))::INT + 1]) / 2.0) AS w
         FROM e),
       a AS (SELECT vec_id // 2 AS g, w FROM c WHERE vec_id % 2 = 0),
       b AS (SELECT vec_id // 2 AS g, w FROM c WHERE vec_id % 2 = 1)
       SELECT a.g + 1 AS id_dim,
         array_to_string(list_transform(range(0, 32), k ->
           CAST(floor(((a.w[k::INT + 1] + b.w[k::INT + 1]) / 2.0) * 1e12)
             AS BIGINT)), ',') AS measure
       FROM a JOIN b USING (g) ORDER BY id_dim""",
    // exact replay: integer-valued scaled measures sum exactly in any
    // order; one /50 division; anomaly per (row, cell)
    "qc05_cube_anomaly" ->
      """WITH u AS (SELECT vec_id, vec_id // 50 AS m, j,
           floor(embedding[j + 1]::DOUBLE * 1e6) AS v
         FROM embeddings, (SELECT unnest(range(0, 64)) AS j)),
       clim AS (SELECT m, j, sum(v) / 50 AS cv FROM u GROUP BY m, j),
       a AS (SELECT u.vec_id, u.j, u.v - c.cv AS av
         FROM u JOIN clim c ON u.m = c.m AND u.j = c.j)
       SELECT vec_id + 1 AS id_dim,
         array_to_string(list_transform(list(av ORDER BY j),
           x -> CAST(floor(x * 1e12) AS BIGINT)), ',') AS anomaly
       FROM a GROUP BY vec_id ORDER BY id_dim""",
    "qc04_cube_zarr_roundtrip" ->
      """SELECT i AS id_dim,
         array_to_string(list_transform(range(0, 12),
           x -> CAST(floor(((i-1) * 0.5 + (x // 3) * 0.25 + (x % 3) * 0.125)
             * 1e12) AS BIGINT)), ',') AS m_zarr,
         array_to_string(list_transform(range(0, 12),
           x -> CAST(floor(((i-1) * 0.5 + (x // 3) * 0.25 + (x % 3) * 0.125)
             * 1e12) AS BIGINT)), ',') AS m_sharded
         FROM range(1, 61) t(i)
         ORDER BY id_dim""",
    // member A = even vec_ids (odd ids), member B = the following odd
    // vec_id; one IEEE subtraction per cell, then the x-profile max
    "qc07_intercube" ->
      """SELECT (e1.vec_id / 2)::BIGINT + 1 AS id_dim,
         array_to_string(list_transform(range(0, 8), x ->
           CAST(floor(list_reduce(list_transform(range(1, 9),
             y -> e1.embedding[x*8 + y]::DOUBLE - e2.embedding[x*8 + y]::DOUBLE),
             (p, q) -> greatest(p, q)) * 1e12) AS BIGINT)), ',') AS measure
         FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
         WHERE e1.vec_id % 2 = 0
         ORDER BY id_dim""",
    "qc01_cube_pipeline" ->
      """SELECT (vec_id / 2)::BIGINT + 1 AS id_dim,
         array_to_string(list_transform(
           list_transform(range(0, 8), x ->
             list_reduce(list_transform(range(0, 8), y -> embedding[x*8 + y + 1]::DOUBLE),
               (p,q) -> p+q) / 8.0),
           v -> CAST(floor(v * 1e12) AS BIGINT)), ',') AS measure
         FROM embeddings WHERE vec_id % 2 = 0
         ORDER BY id_dim""",
    "qc03_cube_reshape" ->
      """SELECT vec_id * 4 + y + 1 AS id_dim,
         array_to_string(list_transform(range(0, 8), x ->
           CAST(floor(embedding[x*8 + y + 1]::DOUBLE * 1e12) AS BIGINT)), ',')
           AS measure
         FROM embeddings, range(0, 4) t(y)
         ORDER BY id_dim""",
    "qc02_cube_aggregate" ->
      """WITH gm AS (SELECT 1 + vec_id // 50 AS g, i,
           max(embedding[i]::DOUBLE) AS m
         FROM embeddings, range(1, 65) t(i) GROUP BY g, i),
       arr AS (SELECT g, list(m ORDER BY i) AS ma FROM gm GROUP BY g)
       SELECT g AS id_dim,
         array_to_string(list_transform(
           list_transform(range(0, 8), x ->
             list_reduce(list_transform(range(0, 8), y -> ma[x*8 + y + 1]),
               (p,q) -> p+q) / 8.0),
           v -> CAST(floor(v * 1e12) AS BIGINT)), ',') AS measure
       FROM arr ORDER BY id_dim""",
  )
}
