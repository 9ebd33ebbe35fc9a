package graft.operators

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
  *  - c01: MLlib KMeans (the production path; fixed init via
  *    `setInitialModel` + integer-valued features make even the MLlib
  *    run hash-checkable against a DuckDB replay).
  *  - c02: hand-rolled Lloyd iterations in pure DataFrame algebra with
  *    deterministic init (first k rows) and fixed-point arithmetic, so a
  *    DuckDB oracle replays it exactly. Same distribution shape as MLlib:
  *    per iteration one distributed aggregation + a k×64-long collect
  *    and broadcast-back — the only driver traffic is the centroids.
  */
object ClusterQueries {

  /** c01 — KMeans over the embedding vectors through the MLlib API
    * (the production path), made ORACLE-CHECKABLE by pinning every
    * source of nondeterminism:
    *
    *  - init = the k lowest-vec_id vectors via `setInitialModel` (the
    *    public fixed-init API; no k-means|| sampling), maxIterations=1;
    *  - features are floor(x·1e6) — INTEGER-VALUED doubles, so every
    *    sum MLlib computes during its one Lloyd step (per-cluster
    *    coordinate sums < 2⁵³) is exact in IEEE double and therefore
    *    independent of partition order; the updated centers are the
    *    exactly-rounded sum·(1/n) both engines reproduce bit-for-bit;
    *  - the reported assignment runs in DataFrame algebra against the
    *    model's centers with a defined left-fold distance (the same
    *    expression sequence the DuckDB oracle replays), not MLlib's
    *    norm-shortcut `fastSquaredDistance`, whose ±1e-16-relative
    *    error term is not SQL-expressible. With integer-valued inputs
    *    the two agree except on exact integer distance ties (~1e-13
    *    probability per row).
    *
    * Output: cluster sizes + 1e-6 fixed-point centroid fingerprints.
    * c02 is the from-scratch Lloyd twin; this row proves the MLlib API
    * wiring end-to-end. Distribution shape: one RDD aggregation per
    * Lloyd step (only k×64 doubles reach the driver), broadcast-back
    * scan-parallel assignment. */
  def c01_kmeans_embeddings(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.mllib.clustering.{KMeans => RddKMeans, KMeansModel => RddKMeansModel}
    import org.apache.spark.mllib.linalg.{Vectors => RddVectors}
    import s.implicits._
    val k = 5
    val e = Tables.embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1e6)).as("v"))
      .cache()
    val init = e.filter(col("vec_id") < k).orderBy("vec_id")
      .select("v").as[Seq[Double]].collect()
      .map(a => RddVectors.dense(a.toArray))
    val data = e.select("v").as[Seq[Double]].rdd
      .map(a => RddVectors.dense(a.toArray))
    val model = new RddKMeans().setK(k).setMaxIterations(1)
      .setInitialModel(new RddKMeansModel(init))
      .run(data)
    val centers: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
    // deterministic final assignment: first-minimal left-fold distance
    val ids = lit((0 until k).map(_.toLong).toArray)
    val ds = array(centers.map { c =>
      aggregate(
        zip_with(col("v"), lit(c), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
    val asg = e.withColumn("cid", TextFunctions.bindOnce(ds, d =>
      element_at(ids, array_position(d, array_min(d)).cast("int"))))
    val fps = centers.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.map(x => math.floor(x * 1e6).toLong).mkString(","))
    }.toSeq.toDF("cid", "centroid")
    asg.groupBy("cid").agg(count(lit(1)).as("n"))
      .join(broadcast(fps), "cid")
      .select("cid", "n", "centroid")
      .orderBy("cid")
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

  /** c03 — PCA of the embedding cloud by power iteration, the
    * dimensionality-reduction step an embedding pipeline runs before
    * whitening / visualization / IVF training. Distribution shape:
    * ONE partial+final aggregation builds the 64×64 Gram matrix of
    * centered fixed-point vectors (4096 longs of aggregate state —
    * constant, independent of row count), the eigensolve runs on the
    * driver over that 32 KB artifact (the same model-artifact pattern
    * as c02's centroids / s08's codebook), and the final component is
    * broadcast back for a scan-parallel projection pass. At 100 TB
    * nothing but the 4096-long state crosses the cluster.
    *
    * Determinism: vectors at 1e6 fixed point, Gram entries exact
    * longs; the Gram is rescaled to ±1e12 and 20 power steps run in
    * BigInt with ±1e6 renormalization each step — every division
    * truncates toward zero, so DuckDB replays the identical integer
    * sequence (HUGEINT + sign-guarded //). Output: the dominant
    * eigenvector (64 fixed-point rows), a Rayleigh eigenvalue row,
    * and per-label projection sums proving the distributed pass. */
  def c03_pca_power(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1e6).cast("long")).as("v"))
      .cache()
    val nRows = e.count()
    require(nRows > 0, "c03: empty embeddings table")
    // per-dim truncating mean (64 longs to the driver)
    val mSum = e.agg(ArrayAggregates.ewSumLong(col("v")).as("sv"))
      .collect()(0).getSeq[Long](0)
    val m: Array[Long] = mSum.map(_ / nRows).toArray
    val centered = e.withColumn("c",
      zip_with(col("v"), lit(m), (x, y) => x - y))
    // Gram: per-partition 4096-long accumulators in a tight primitive
    // loop (a 4096-wide array UDAF pays Seq[Long] boxing per ROW; this
    // pays one small array per PARTITION), merged through treeAggregate
    // depth 2 so the driver receives O(√P) partials instead of P — at
    // 100-TB partition counts (10⁵–10⁶) a flat collect would ship
    // 3–30 GB of 32 KB partials to one box; the tree merges them on
    // executors first. Addition is associative+commutative on exact
    // longs, so the result is bit-identical at any depth/parallelism.
    // The only distributed reduction of the fit.
    import s.implicits._
    val g: Array[Long] = centered.select("c")
      .as[Seq[Long]].rdd
      .treeAggregate(new Array[Long](4096))(
        seqOp = { (acc, c) =>
          var j = 0
          while (j < 64) {
            val cj = c(j)
            var k = 0
            while (k < 64) { acc(j * 64 + k) += cj * c(k); k += 1 }
            j += 1
          }
          acc
        },
        combOp = { (a, b) =>
          var i = 0; while (i < 4096) { a(i) += b(i); i += 1 }; a
        },
        depth = 2)
    // driver-side eigensolve in exact integer arithmetic (BigInt
    // division truncates toward zero — mirrored in SQL by a
    // sign-guarded HUGEINT //)
    val gmax = math.max(g.map(math.abs).max, 1L)
    val gs: Array[Long] =
      g.map(x => (BigInt(x) * BigInt(1000000000000L) / gmax).toLong)
    var w: Array[Long] = Array.fill(64)(1000000L)
    def matvec(wv: Array[Long]): Array[BigInt] = Array.tabulate(64) { j =>
      (0 until 64).foldLeft(BigInt(0))((acc, k) =>
        acc + BigInt(gs(j * 64 + k)) * wv(k))
    }
    for (_ <- 1 to 20) {
      val u = matvec(w)
      val mx = u.map(_.abs).max.max(BigInt(1))
      w = u.map(x => (x * 1000000 / mx).toLong)
    }
    val u8 = matvec(w)
    val num = (0 until 64).foldLeft(BigInt(0))((a, j) => a + u8(j) * w(j))
    val den = w.foldLeft(BigInt(0))((a, x) => a + BigInt(x) * x).max(BigInt(1))
    val lambdaFp = (num * 1000000 / den).toLong
    val model = (w.zipWithIndex.map { case (x, j) => ("eig", j.toLong, x) } :+
      (("lambda", -1L, lambdaFp))).toSeq.toDF("kind", "id", "val")
    // broadcast projection: one scan-parallel pass, per-label sums
    val proj = centered
      .withColumn("p", aggregate(
        zip_with(col("c"), lit(w), (x, y) => x * y), lit(0L), _ + _))
      .groupBy("label")
      .agg(sum("p").as("val"))
      .select(lit("proj").as("kind"), col("label").cast("long").as("id"),
        col("val"))
    model.unionByName(proj).orderBy("kind", "id")
  }

  /** c04 — per-segment linear regression (price-vs-quantity OLS per
    * (returnflag, ship-year)) fitted entirely from SUFFICIENT STATISTICS:
    * one map-side-combined aggregate computes (n, Σx, Σy, Σxy, Σx²) per
    * group and the closed-form solve runs inside the same plan — the
    * canonical "train a per-domain calibration model on 100 TB in one
    * pass" shape. No iteration, no driver round-trip: the d×d normal-
    * equations solve for d=1 is two integer expressions (c03's Gram
    * pass is the d>1 generalization of exactly this aggregate).
    *
    * Determinism: x (quantity) and y (price cents, via one IEEE-exact
    * double multiply + floor both engines share) are exact longs;
    * per-row products fit a long (xy ≤ 5e8); cross-row sums and the
    * n·Σxy − ΣxΣy moments run in decimal(38,0) (HUGEINT in the oracle)
    * so they stay exact past the long range — at web scale n·Σxy ≈ 1e30
    * still fits 38 digits. Slope/intercept emerge as 1e-6 fixed point
    * through `div`, Spark's IntegralDivide, which truncates toward zero
    * exactly like DuckDB's HUGEINT `//`. */
  def c04_ols_suffstats(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("flag"),
        year(col("l_shipdate")).cast("long").as("yr"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * lit(100)).cast("long").as("y"))
      .groupBy("flag", "yr")
      .agg(count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"),
        sum(d38(col("y"))).as("sy"),
        sum(d38(col("x") * col("y"))).as("sxy"),
        sum(d38(col("x") * col("x"))).as("sx2"))
      .withColumn("num", d38(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", d38(col("n")) * col("sx2") - col("sx") * col("sx"))
      .withColumn("slope_fp",
        expr("CAST((num * 1000000) div den AS BIGINT)"))
      .withColumn("intercept_fp", expr(
        "CAST((sy * 1000000 - CAST(slope_fp AS DECIMAL(38,0)) * sx) div n AS BIGINT)"))
      .select(col("flag"), col("yr"), col("n"),
        col("slope_fp"), col("intercept_fp"),
        expr("CAST((sx * 1000000) div n AS BIGINT)").as("mx_fp"),
        expr("CAST((sy * 1000000) div n AS BIGINT)").as("my_fp"))
      .orderBy("flag", "yr")
  }

  /** c05 — exact ROC-AUC of a scorer against binary labels, by the
    * Mann-Whitney rank identity with midrank tie handling — the
    * classifier-evaluation pass a data-quality model (fastText-style
    * filter, perplexity gate) gets before its threshold is trusted.
    * AUC = (ΣR₊ − n₊(n₊+1)/2) / (n₊ n₀); everything stays integer by
    * carrying 2×ranks (a tie group's midrank ×2 = 2·minrank + cnt − 1),
    * so the result is an exact rational plus a 1e-9 fixed-point quotient.
    *
    * Score = fixed-point signed sum of the embedding under the d08 Knuth
    * ±1 hyperplane (left-to-right double adds — both engines evaluate
    * HOF folds in list order, so the floor(×1e6) longs agree bitwise).
    *
    * Scale shape: the global rank is [[SequentialId]] (range exchange +
    * broadcast offsets — no single-task window at any n); tie statistics
    * are one groupBy(score); the rest is two 1-row aggregates joined by
    * broadcast. Rank sums stay < 2n² so longs hold to ~10⁹ rows; the
    * c04 decimal(38,0) pattern is the drop-in past that. */
  def c05_auc_rank(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val signs = lit((1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
        floor(aggregate(zip_with(col("a"), signs, (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long").as("s_fp"))
    val ranked = SequentialId.withSequentialId(
      sc, "rn", Seq(col("s_fp"), col("vec_id")))
    val sumR2 = ranked.groupBy("s_fp")
      .agg(min("rn").as("mr"), count(lit(1)).as("cnt"), sum("y").as("n1g"))
      .agg(sum(col("n1g") * (col("mr") * 2L + col("cnt") - 1L)).as("sum_r2"))
    val nn = sc.agg(sum("y").as("n1"),
      (count(lit(1)) - sum("y")).as("n0"))
    sumR2.crossJoin(broadcast(nn))
      .withColumn("auc_num", col("sum_r2") - col("n1") * (col("n1") + 1L))
      .withColumn("auc_den", col("n1") * col("n0") * 2L)
      .select(col("n1"), col("n0"), col("auc_num"), col("auc_den"),
        ldiv(col("auc_num") * 1000000000L, col("auc_den")).as("auc_fp"))
  }

  /** c06 — calibration (reliability) table for the c05 scorer: decile
    * bins by global score rank, per bin the exact positive rate and mean
    * score as 1e-9 / 1e-6 fixed point — the companion diagnostic to AUC
    * (a scorer can rank well and still be badly calibrated; the gap
    * between mean score and positive rate per bin is what a threshold
    * picker actually reads).
    *
    * Scale shape: the only global structure is the [[SequentialId]] rank
    * (range exchange + broadcast offsets); deciles are integer rank
    * arithmetic, the rest is one 10-group aggregate. All integers —
    * bit-identical at any parallelism. */
  def c06_calibration_bins(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val signs = lit((1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
        floor(aggregate(zip_with(col("a"), signs, (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long").as("s_fp"))
    val n = sc.agg(count(lit(1)).as("n_tot"))
    SequentialId.withSequentialId(sc, "rn", Seq(col("s_fp"), col("vec_id")))
      .crossJoin(broadcast(n))
      .withColumn("decile", ldiv((col("rn") - 1L) * 10L, col("n_tot")))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        sum("y").as("n_pos"),
        sum("s_fp").as("ssum"))
      .select(col("decile"), col("n"), col("n_pos"),
        ldiv(col("n_pos") * 1000000000L, col("n")).as("pos_rate_fp"),
        ldiv(col("ssum"), col("n")).as("mean_score_fp"))
      .orderBy("decile")
  }

  /** c21 — RISK–COVERAGE curve (selective prediction): rank the c06
    * linear scorer's predictions by CONFIDENCE (|score| — distance from
    * the decision boundary), then for each coverage decile report the
    * cumulative error rate if the model only answers on its most
    * confident fraction and abstains on the rest. This is the curve a
    * deployment reads to pick an abstention threshold ("at 70% coverage
    * the selective risk is X") — the operating decision c06's
    * calibration bins inform but do not answer. Exact integers
    * throughout: the score is the c06 fixed-point functional, the
    * ranking key (|s_fp| desc, vec_id) is total, and risk is one
    * truncating divide per decile row.
    *
    * Scale shape: one scan builds scores; the global confidence
    * ranking is [[SequentialId]] (range-partition + zipWithIndex — no
    * single-partition window over the data); the cumulative fold runs
    * over the 10-row decile frame, bounded by construction (the
    * PrefixSum discipline). */
  def c21_risk_coverage(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    import org.apache.spark.sql.expressions.Window
    val signs = lit((1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
        floor(aggregate(zip_with(col("a"), signs, (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long").as("s_fp"))
    val n = sc.agg(count(lit(1)).as("n_tot"))
    val dec = SequentialId.withSequentialId(sc, "rn",
        Seq(negate(abs(col("s_fp"))), col("vec_id")))
      .crossJoin(broadcast(n))
      .withColumn("decile", ldiv((col("rn") - 1L) * 10L, col("n_tot")))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        sum(when((col("s_fp") > 0L) =!= (col("y") === 1L), 1L)
          .otherwise(0L)).as("err"))
    // bounded global window: exactly 10 decile rows regardless of volume
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec.withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_err", sum("err").over(w))
      .withColumn("risk_fp", ldiv(col("cum_err") * 1000000000L, col("cum_n")))
      .select("decile", "n", "err", "cum_n", "cum_err", "risk_fp")
      .orderBy("decile")
  }

  /** c07 — per-class precision/recall/F1 + macro summary for the t02
    * language-ID predictor (the eval every production classifier gate
    * reads before a corpus-wide keep/drop run; c05/c06 grade a SCORER,
    * this grades a hard LABELER). All exact-integer: per class,
    * tp / fp / fn from two small groupBys, precision = tp/(tp+fp),
    * recall = tp/(tp+fn) and F1 = 2tp/(2tp+fp+fn) (the harmonic mean in
    * single-division form, so one truncating integral divide per metric)
    * at 1e-6 fixed point, plus one `~macro` row carrying count sums and
    * unweighted metric means.
    *
    * Scale shape: ONE scan of the prediction table feeds two
    * map-combined groupBys on a 5-value key; everything after is
    * constant-size (|classes| rows) — the macro fold is an aggregation
    * over that constant set, not a second data pass. At 100 TB the
    * labeler output is never re-read: eval piggybacks on the same scan
    * that writes the keep/drop column. */
  def c07_langid_eval(s: SparkSession, dir: String): DataFrame =
    prf1Eval(TextQueries.t02_langid(s, dir)
      .select(col("doc_id"), col("actual_lang"), col("pred_lang")))

  /** The c07 P/R/F1 machinery over any (doc_id, actual_lang, pred_lang)
    * prediction set — shared with t34's trained-classifier eval:
    * per-class support/tp/fp/fn, fixed-point (1e6) precision/recall/F1
    * via integer division, plus the `~macro` unweighted-average row. */
  private[operators] def prf1Eval(preds: DataFrame): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val byActual = preds.groupBy(col("actual_lang").as("cls"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("pred_lang") === col("actual_lang"), 1L)
          .otherwise(0L)).as("tp"))
    val byPred = preds.groupBy(col("pred_lang").as("cls"))
      .agg(count(lit(1)).as("n_pred"))
    val per = byActual.join(byPred, Seq("cls"), "full_outer")
      .select(col("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"))
      .withColumn("prec_fp", when(col("tp") + col("fp") === 0L, 0L)
        .otherwise(ldiv(col("tp") * 1000000L, col("tp") + col("fp"))))
      .withColumn("rec_fp", when(col("support") === 0L, 0L)
        .otherwise(ldiv(col("tp") * 1000000L, col("support"))))
      .withColumn("f1_fp",
        when(col("tp") * 2L + col("fp") + col("fn") === 0L, 0L)
        .otherwise(ldiv(col("tp") * 2000000L,
          col("tp") * 2L + col("fp") + col("fn"))))
    val macroRow = per.agg(
      lit("~macro").as("cls"),
      sum("support").as("support"), sum("tp").as("tp"),
      sum("fp").as("fp"), sum("fn").as("fn"),
      ldiv(sum("prec_fp"), count(lit(1))).as("prec_fp"),
      ldiv(sum("rec_fp"), count(lit(1))).as("rec_fp"),
      ldiv(sum("f1_fp"), count(lit(1))).as("f1_fp"))
    per.unionByName(macroRow).orderBy("cls")
  }

  /** Shared integer NDCG LUTs: disc(i) = floor(2^20 / log2(i+1)) for
    * ranks 1..10, gains(r) = 2^r − 1 for grades 0..20. Headroom note:
    * at the max grade, gain·disc ≈ (2^20−1)·2^20 ≈ 2^40, and a 10-deep
    * DCG ·1e6 lands within ~2× of Long.MaxValue — the grade cap (20),
    * k (10) and the 1e6 fixed-point scale are jointly tight; raising
    * any of them needs a decimal(38) carry. Computed ONCE here
    * and embedded verbatim in BOTH the Spark plan and the DuckDB oracle
    * text (the t19 entLut pattern) — the irrational log never crosses an
    * engine boundary. */
  private[operators] val ndcgDisc: Array[Long] = Array.tabulate(10)(i =>
    math.floor(1048576.0 / (math.log(i + 2) / math.log(2))).toLong)
  private[operators] val ndcgGains: Array[Long] =
    Array.tabulate(21)(r => (1L << r) - 1L)

  /** c08 — NDCG@10 ranking evaluation for the t16 BM25 retriever: the
    * graded-relevance companion to s13's recall@k (c05–c08 now grade a
    * scorer, a labeler, an ANN index and a ranker). Relevance judgments
    * are an INDEPENDENT graded signal — total query-term frequency in
    * the document capped at grade 20 (raw tf ignores BM25's idf and
    * length normalization, so the ranker genuinely can and does diverge
    * from the ideal ordering); DCG discounts come from the shared
    * integer LUT so NDCG_fp = DCG·1e6 ÷ IDCG is exact in both engines.
    *
    * Scale shape: the relevance table is one scan-parallel term
    * aggregation (broadcast query terms prune at the scan exactly like
    * t16); the DCG side joins it against t16's ≤ 10-row-per-query
    * output, the ideal side is a per-query bounded window over it.
    * Nothing global but the |queries|-row join. */
  def c08_ndcg_eval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.KeyAlgebra.ldiv
    import graft.functions.TextFunctions.tokens
    val disc = lit(ndcgDisc)
    val gains = lit(ndcgGains)
    val qterms = TextQueries.bm25QueryTerms.toDF("q_id", "term")
    // r18 measured negative: caching rel for its two consumers (+ eager
    // result checkpoint) REGRESSED 1.75→2.75 s at sf0.1 — the explode +
    // broadcast-join recompute from the tiny parquet is cheaper than the
    // cache materialization. Left lazy deliberately.
    val rel = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .join(broadcast(qterms), "term")
      .groupBy("q_id", "doc_id")
      .agg(least(count(lit(1)), lit(20L)).as("rel"))
    val dcg = TextQueries.t16_bm25_topk(s, dir)
      .select("q_id", "rank", "doc_id")
      .join(rel, Seq("q_id", "doc_id"))
      .select(col("q_id"),
        (element_at(gains, col("rel").cast("int") + 1) *
          element_at(disc, col("rank").cast("int"))).as("g"))
      .groupBy("q_id").agg(sum("g").as("dcg_fp"))
    val iw = Window.partitionBy("q_id")
      .orderBy(col("rel").desc, col("doc_id"))
    val idcg = rel.withColumn("irank", row_number().over(iw))
      .filter(col("irank") <= 10)
      .select(col("q_id"),
        (element_at(gains, col("rel").cast("int") + 1) *
          element_at(disc, col("irank"))).as("g"))
      .groupBy("q_id").agg(sum("g").as("idcg_fp"))
    dcg.join(idcg, "q_id")
      .withColumn("ndcg_fp", ldiv(col("dcg_fp") * 1000000L, col("idcg_fp")))
      .orderBy("q_id")
  }

  /** c09 — Cohen's-kappa inter-rater agreement between the t02 n-gram
    * language-ID labeler and the gold `lang` column: chance-corrected
    * agreement, the number a Landis–Koch band is read off before a
    * cheap labeler is allowed to gate a corpus (raw accuracy flatters
    * any labeler that just predicts the majority class).
    * kappa = (N·agree − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k) at
    * 1e-6 fixed point, with the N²-scale numerator carried in
    * decimal(38,0) (the q55/c04 pattern — Spark's decimal `div` and
    * DuckDB's HUGEINT `//` both truncate toward zero) so nothing ever
    * leaves exact integer arithmetic.
    *
    * Scale shape: identical to c07 — ONE labeler scan feeds two
    * map-combined groupBys on a 5-value class key; the kappa fold is an
    * aggregation over that constant |classes|-row join. At 100 TB the
    * eval costs one pass it can share with the keep/drop writer. */
  def c09_kappa_agreement(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val preds = TextQueries.t02_langid(s, dir)
      .select(col("doc_id"), col("actual_lang"), col("pred_lang"))
    val byActual = preds.groupBy(col("actual_lang").as("cls"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("pred_lang") === col("actual_lang"), 1L)
          .otherwise(0L)).as("tp"))
    val byPred = preds.groupBy(col("pred_lang").as("cls"))
      .agg(count(lit(1)).as("n_pred"))
    byActual.join(byPred, Seq("cls"), "full_outer")
      .agg(sum(coalesce(col("support"), lit(0L))).as("n"),
        sum(coalesce(col("tp"), lit(0L))).as("agree"),
        sum(coalesce(col("support"), lit(0L)) *
          coalesce(col("n_pred"), lit(0L))).as("chance"))
      .withColumn("po_fp", ldiv(col("agree") * 1000000L, col("n")))
      .select(col("n"), col("agree"), col("chance"), col("po_fp"),
        expr("""CAST((CAST(chance AS DECIMAL(38,0)) * 1000000) div
          (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""").as("pe_fp"),
        expr("""CAST(((CAST(n AS DECIMAL(38,0)) * agree - chance) *
          1000000) div (CAST(n AS DECIMAL(38,0)) * n - chance)
          AS BIGINT)""").as("kappa_fp"))
  }

  /** c22 — KRIPPENDORFF'S ALPHA over THREE raters (the multi-annotator
    * generalization of c09's two-party kappa — the agreement statistic
    * an annotation pipeline reads before trusting a labeled set):
    * rater 1 is ground truth, rater 2 the t02 predictor, rater 3 a
    * systematically-degraded truth (follows the predictor on every
    * third unit). Nominal-metric alpha = 1 − Do/De with EXACT integer
    * disagreement sums: for 3 raters the per-unit coincidence
    * disagreement Σ_c n_uc(3 − n_uc) collapses to a 3-way CASE
    * (0 unanimous / 4 split two-one / 6 all distinct — no explode in
    * the unit pass), and the expected disagreement is Σ_c n_c(N − n_c)
    * over the 5-category totals. The final ratio runs in decimal(38)
    * (both cross terms exceed int64 at 26×; the c09/c11 carry), with
    * positivity on this data pinned by ClusterSpec so the trunc-vs-
    * floor divide question never arises.
    *
    * Scale shape: one scan computes per-unit disagreements
    * (map-combined sum) and the category totals (5-row aggregate);
    * everything after is constant-size arithmetic. */
  def c22_krippendorff(s: SparkSession, dir: String): DataFrame = {
    val rated = TextQueries.t02_langid(s, dir)
      .select(col("doc_id"), col("actual_lang").as("r1"),
        col("pred_lang").as("r2"),
        when(col("doc_id") % 3 === 0, col("pred_lang"))
          .otherwise(col("actual_lang")).as("r3"))
    val tot = rated.withColumn("d_u",
        when(col("r1") === col("r2") && col("r2") === col("r3"), 0L)
          .when(col("r1") =!= col("r2") && col("r2") =!= col("r3") &&
            col("r1") =!= col("r3"), 6L)
          .otherwise(4L))
      .agg(count(lit(1)).as("n_units"), sum("d_u").as("do_int"))
    val de = rated
      .select(explode(array(col("r1"), col("r2"), col("r3"))).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n_c"))
      .crossJoin(broadcast(tot))
      .agg(sum(col("n_c") * (lit(3L) * col("n_units") - col("n_c")))
        .as("de_int"))
    tot.crossJoin(broadcast(de))
      .select(col("n_units"), col("do_int"), col("de_int"),
        expr("""CAST(((2 * CAST(de_int AS DECIMAL(38,0))
            - CAST(do_int AS DECIMAL(38,0)) * (3 * n_units - 1))
          * 1000000) div (2 * CAST(de_int AS DECIMAL(38,0)))
          AS BIGINT)""").as("alpha_fp"))
  }

  /** c10 — Poisson-bootstrap confidence interval for a corpus metric
    * (mean tokens/doc): every (doc, replicate) pair gets a weight drawn
    * from a Poisson(1)-shaped integer table keyed by a Lehmer hash of
    * (doc_id, rep), each of the 32 replicates recomputes the weighted
    * mean, and the 5/95 % band is read off the sorted replicate means —
    * the error bar a data card should print next to every corpus-level
    * number. The resample is the STREAMING bootstrap (per-row
    * independent weights, no sampling-without-replacement pass), the
    * only bootstrap that exists at 100 TB.
    *
    * Determinism: the "Poisson" draw is bucket(h) over a two-step
    * Lehmer LCG (mod 2^31−1, multiplier 16807) in plain BIGINT-safe
    * integer arithmetic, so the DuckDB oracle replays every weight
    * bit-for-bit; means are 1e-6 fixed-point longs.
    *
    * Scale shape: one scan × constant 32-way sequence-explode →
    * map-side-combined 32-group aggregate; driver sees 32 rows. The
    * quantile step sorts a 32-long array inside one row — no window,
    * no second scan. */
  def c10_bootstrap_ci(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    import graft.functions.TextFunctions.tokens
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
    val byRep = docs
      .withColumn("rep", explode(sequence(lit(0L), lit(31L))))
      // doc_id is reduced mod 2^31−1 BEFORE the multiply (the p14 pmod
      // pattern): id·1103515245 would wrap int64 past id ≈ 8.4e9 —
      // silently in Spark, loudly in DuckDB — right at 100 TB corpus
      // sizes. The reduction is a no-op below 2^31−1, so oracle-SF
      // hashes are unchanged.
      .withColumn("h1", (pmod(col("doc_id"), lit(2147483647L)) *
        1103515245L + (col("rep") + 1L) * 12345L + 6789L) % 2147483647L)
      .withColumn("b", (col("h1") * 16807L) % 2147483647L % 100L)
      // Poisson(1) pmf ≈ .368/.368/.184/.061/.019 as integer buckets
      .withColumn("w", when(col("b") < 37L, 0L).when(col("b") < 74L, 1L)
        .when(col("b") < 92L, 2L).when(col("b") < 98L, 3L).otherwise(4L))
      .groupBy("rep")
      .agg(sum("w").as("n_eff"), sum(col("w") * col("n_tok")).as("tok_sum"))
      .withColumn("mean_fp", ldiv(col("tok_sum") * 1000000L, col("n_eff")))
    val band = byRep
      .agg(sort_array(collect_list(col("mean_fp"))).as("ms"))
      .select(element_at(col("ms"), 2).as("lo_fp"),
        element_at(col("ms"), 31).as("hi_fp"))
    byRep.crossJoin(broadcast(band))
      .select("rep", "n_eff", "tok_sum", "mean_fp", "lo_fp", "hi_fp")
      .orderBy("rep")
  }

  /** c11 — multiclass Matthews correlation (Gorodkin's R_K) for the
    * t02 labeler: the single-number eval that stays honest under class
    * imbalance where accuracy (c07) and even kappa (c09) can flatter —
    * completing the eval triple. MCC's square is RATIONAL in the
    * confusion-matrix marginals, so instead of an engine-dependent
    * floating sqrt the output carries mcc_sign and mcc2_fp =
    * num²·1e6 / ((n²−Σp²)(n²−Σt²)) in exact DECIMAL(38,0) arithmetic
    * (the c09/q55 pattern). The division runs in TWO steps —
    * (|num|·1e6 div D₁)·|num| div D₂ — never materializing num²:
    * num is n²-scale, so num²·1e6 would blow the 38-digit ceiling
    * already at n ≈ 5·10⁷ (silent NULL in Spark's non-ANSI decimal,
    * error in DuckDB's HUGEINT). Cauchy–Schwarz gives |num| ≤ √(D₁D₂),
    * so every two-step intermediate stays ≤ 1e6·n², pushing the true
    * bound to n ≲ 10¹⁶ — comfortably past any 100 TB corpus. Both
    * engines replay the identical step order, so truncation agrees.
    * Degenerate marginals (all predictions one class) short-circuit
    * to 0 rather than divide by zero.
    *
    * Scale shape: identical to c07/c09 — one labeler scan, two
    * map-combined groupBys on the 5-value class key, one constant-size
    * fold. */
  /** c11's two-step MCC² division chain over columns (n, num, sum_p2,
    * sum_t2), extracted so OverflowGuardSpec can drive it at n²-scale
    * inputs: the naive num²·1e6 form blows DECIMAL(38,0) already at
    * n ≈ 5·10⁷ (silent NULL non-ANSI, error under ANSI/DuckDB); this
    * chain never materializes num² and is exact to n ≲ 10¹⁶. The
    * re-CAST after the first div is load-bearing: Spark's IntegralDivide
    * returns LongType, so without it the step-1 quotient × |num| product
    * runs in int64 and wraps already at n ≈ 5·10⁷ — the exact overflow
    * the two-step order exists to avoid (found by OverflowGuardSpec;
    * DuckDB never had the problem because its HUGEINT division stays
    * HUGEINT). Editing the chain turns the spec red before the oracle
    * gate does. */
  private[operators] val Mcc2TwoStepExpr: String =
    """CASE WHEN n * n = sum_p2 OR n * n = sum_t2 THEN 0
       ELSE CAST(CAST(abs(CAST(num AS DECIMAL(38,0))) * 1000000 div
         (CAST(n AS DECIMAL(38,0)) * n - sum_p2) AS DECIMAL(38,0))
         * abs(num) div
         (CAST(n AS DECIMAL(38,0)) * n - sum_t2) AS BIGINT) END"""

  def c11_mcc_eval(s: SparkSession, dir: String): DataFrame = {
    val preds = TextQueries.t02_langid(s, dir)
      .select(col("actual_lang"), col("pred_lang"))
    val byActual = preds.groupBy(col("actual_lang").as("cls"))
      .agg(count(lit(1)).as("t_k"),
        sum(when(col("pred_lang") === col("actual_lang"), 1L)
          .otherwise(0L)).as("tp"))
    val byPred = preds.groupBy(col("pred_lang").as("cls"))
      .agg(count(lit(1)).as("p_k"))
    byActual.join(byPred, Seq("cls"), "full_outer")
      .agg(sum(coalesce(col("t_k"), lit(0L))).as("n"),
        sum(coalesce(col("tp"), lit(0L))).as("correct"),
        sum(coalesce(col("t_k"), lit(0L)) * coalesce(col("p_k"), lit(0L)))
          .as("sum_pt"),
        sum(coalesce(col("p_k"), lit(0L)) * coalesce(col("p_k"), lit(0L)))
          .as("sum_p2"),
        sum(coalesce(col("t_k"), lit(0L)) * coalesce(col("t_k"), lit(0L)))
          .as("sum_t2"))
      .withColumn("num", col("correct") * col("n") - col("sum_pt"))
      .withColumn("mcc_sign", signum(col("num")).cast("long"))
      .withColumn("mcc2_fp", expr(Mcc2TwoStepExpr))
      .select("n", "correct", "sum_pt", "sum_p2", "sum_t2", "num",
        "mcc_sign", "mcc2_fp")
  }

  /** c12 — BLEU-style clipped n-gram overlap between paired documents
    * (candidate = even doc_id, reference = its successor — m10's
    * pairing): per pair and per n ∈ 1..4, the sacreBLEU sufficient
    * statistics — clipped match count Σ_g min(count_cand(g),
    * count_ref(g)) and candidate gram total — plus both lengths for the
    * brevity penalty, all exact integers (the final geometric mean /
    * exp is the consumer's one scalar fold). This is how a distributed
    * eval pipeline actually ships BLEU: emit per-pair statistics, never
    * per-pair floats.
    *
    * Scale shape: ONE successor self-join (shuffle on doc_id), then
    * everything is in-row: gram multiset hashes sort per row and the
    * clipped count is the allocation-free
    * [[graft.plans.SortedIntersectSize]] merge loop — on sorted arrays
    * WITH duplicates that loop yields Σ min counts (multiset ∩)
    * directly, so no per-gram explode/shuffle exists anywhere. The
    * oracle replays the same md5-hashed grams relationally (unnest +
    * per-value min) — an independent formulation of the same clip. */
  def c12_ngram_overlap_eval(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    import graft.functions.TextFunctions.tokens
    import graft.plans.SortedIntersectSize
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    // grams carry 64-bit xxhash64 keys (the d21 lesson: codegen-native,
    // ~4x cheaper than the md5 route it replaced — 3.9 s -> measured in
    // PERF.md). The oracle stays on RAW gram strings, so a false hash
    // merge (p ~ m^2·2^-64 per pair) would hash-fail the compare rather
    // than hide inside a shared hash.
    // r18: native one-pass kernel (values bit-identical to the HOF
    // chain it replaced — sort_array(transform(sequence, i =>
    // xxhash64(concat_ws(slice)))) — pinned in TokenGramKernelsSpec);
    // the lambda route paid an interpreted per-gram concat+hash 8x per
    // pair (4 n values x 2 sides)
    def grams(tk: Column, n: Int): Column =
      graft.plans.TokenGramXxSorted(tk, n)
    val a = docs.select(col("doc_id").as("doc_a"), col("tk").as("ta"))
      .filter(col("doc_a") % 2 === 0)
    val b = docs.select((col("doc_id") - 1).as("doc_a"), col("tk").as("tb"))
    val pairs = a.join(b, "doc_a")
    val withN = (1 to 4).foldLeft(
      pairs.select(col("doc_a"), (col("doc_a") + 1).as("doc_b"),
        size(col("ta")).cast("long").as("len_c"),
        size(col("tb")).cast("long").as("len_r"),
        col("ta"), col("tb"))) { (df, n) =>
      df.withColumn(s"p${n}_num",
          SortedIntersectSize(grams(col("ta"), n), grams(col("tb"), n))
            .cast("long"))
        .withColumn(s"p${n}_den",
          greatest(size(col("ta")).cast("long") - (n - 1), lit(0L)))
        .withColumn(s"p${n}_fp", when(col(s"p${n}_den") === 0L, 0L)
          .otherwise(ldiv(col(s"p${n}_num") * 1000000L, col(s"p${n}_den"))))
    }
    withN.drop("ta", "tb").orderBy("doc_a")
  }

  /** c13 — SPAN-level F1 (the sequence-labeling / NER evaluation
    * shape): gold spans are maximal runs of tokens from the document's
    * ACTUAL language's marker profile, predicted spans the same runs
    * under the PREDICTED language (t02's argmax) — so a
    * correctly-classified document scores perfectly and every
    * misclassification produces genuine span-level FP/FN. A span counts
    * only on EXACT boundary match (the strict CoNLL convention);
    * per-language precision/recall/F1 use the exact-integer identity
    * F1 = 2·TP / (gold + pred), never a nested division.
    *
    * Scale shape: everything per-row until one partial+final aggregate
    * — the language scores, the argmax, and BOTH span sets come from
    * single-pass `aggregate` folds over the token array (no explode,
    * no self-join: spans are encoded start·100000+end longs and
    * matched with array_intersect inside the row). At 100 TB this is a
    * scan plus a 5-row aggregate. */
  def c13_span_f1(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    import graft.functions.TextFunctions.tokens
    val markers = TextQueries.markers
    def isMarker(t: Column, lg: Column): Column =
      markers.foldLeft(lit(false)) { case (els, (l, ms)) =>
        when(lg === l, t.isInCollection(ms)).otherwise(els)
      }
    /** Maximal marker runs as start·100000+end (0-based, end exclusive),
      * one O(n) fold: state = (closed spans, current run start or −1). */
    def spanArr(tk: Column, lg: Column): Column = {
      val m = size(tk)
      aggregate(
        sequence(lit(0), m - 1),
        struct(array().cast("array<bigint>").as("sp"), lit(-1).as("cur")),
        (acc, i) => {
          val isM = isMarker(element_at(tk, i + 1), lg)
          val closed = concat(acc.getField("sp"),
            array(acc.getField("cur").cast("bigint") * 100000L +
              i.cast("bigint")))
          when(isM && acc.getField("cur") === -1,
            struct(acc.getField("sp").as("sp"), i.cast("int").as("cur")))
            .when(isM, acc)
            .when(acc.getField("cur") =!= -1,
              struct(closed.as("sp"), lit(-1).as("cur")))
            .otherwise(acc)
        },
        acc => when(acc.getField("cur") =!= -1,
          concat(acc.getField("sp"),
            array(acc.getField("cur").cast("bigint") * 100000L +
              m.cast("bigint"))))
          .otherwise(acc.getField("sp")))
    }
    // inline t02 scoring (same profile table) keeps this a single scan
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("tk"))
    val scored = markers.foldLeft(base) { case (df, (lg, ms)) =>
      df.withColumn(s"s_$lg",
        size(filter(col("tk"), t => t.isInCollection(ms))).cast("long"))
    }
    val best = greatest(markers.map { case (lg, _) => col(s"s_$lg") }: _*)
    val predFirst = markers.reverse.foldLeft(lit("??")) { case (els, (lg, _)) =>
      when(col(s"s_$lg") === best, lit(lg)).otherwise(els)
    }
    scored.withColumn("pred", predFirst)
      .withColumn("gold_sp", spanArr(col("tk"), col("lang")))
      .withColumn("pred_sp", spanArr(col("tk"), col("pred")))
      .select(col("lang"),
        size(col("gold_sp")).cast("long").as("g"),
        size(col("pred_sp")).cast("long").as("p"),
        size(array_intersect(col("gold_sp"), col("pred_sp")))
          .cast("long").as("tp"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("g").as("n_gold"),
        sum("p").as("n_pred"), sum("tp").as("n_tp"))
      .withColumn("prec_fp", when(col("n_pred") === 0L, 0L)
        .otherwise(ldiv(col("n_tp") * 1000000L, col("n_pred"))))
      .withColumn("rec_fp", when(col("n_gold") === 0L, 0L)
        .otherwise(ldiv(col("n_tp") * 1000000L, col("n_gold"))))
      .withColumn("f1_fp", when(col("n_gold") + col("n_pred") === 0L, 0L)
        .otherwise(ldiv(col("n_tp") * 2000000L,
          col("n_gold") + col("n_pred"))))
      .orderBy("lang")
  }

  /** c14 — Brier-score (Murphy) decomposition over calibration bins:
    * where c06 reports per-decile counts and mean scores, c14 reports
    * the decomposition terms a model-eval pipeline actually tracks —
    * per-bin mean Brier error and the reliability term n-weighted into
    * bin-local form. The probability is the rank-percentile transform
    * of c06's fixed signed projection (monotone, replayable:
    * p_fp = (rank−1)·10⁶ // (n−1)), the outcome is label parity, bins
    * are p-deciles. Squared terms run at 10³ fixed point so the per-bin
    * SUM stays int64-exact past 10¹² rows (10⁶-scale squares would
    * overflow a Long at ~9·10⁶ rows/bin — the c11 lesson); means and
    * rates stay at the 10⁶/10⁹ scales the family uses. All divisions
    * are IntegralDivide replayed by the oracle.
    *
    * Scale shape: one global rank (SequentialId's prefix-offset
    * numbering — no single-partition window), one broadcast 1-row
    * count, one 10-group aggregate. */
  def c14_brier_decomposition(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val signs = lit((1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
        floor(aggregate(zip_with(col("a"), signs, (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long").as("s_fp"))
    val n = sc.agg(count(lit(1)).as("n_tot"))
    val ranked = SequentialId.withSequentialId(sc, "rn",
        Seq(col("s_fp"), col("vec_id")))
      .crossJoin(broadcast(n))
      .withColumn("p_fp", ldiv((col("rn") - 1L) * 1000000L,
        greatest(col("n_tot") - 1L, lit(1L))))
      .withColumn("q3", ldiv(col("p_fp"), lit(1000L)))
      .withColumn("bin", ldiv(col("p_fp") * 10L, lit(1000001L)))
      .withColumn("se", (col("q3") - col("y") * 1000L) *
        (col("q3") - col("y") * 1000L))
    ranked.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("p_fp").as("psum"), sum("q3").as("qsum"), sum("se").as("sesum"))
      .select(col("bin"), col("n"), col("n_pos"),
        ldiv(col("psum"), col("n")).as("mean_p_fp"),
        ldiv(col("n_pos") * 1000000L, col("n")).as("pos_rate_fp"),
        ldiv(col("sesum"), col("n")).as("brier_x6"),
        ((ldiv(col("qsum"), col("n")) - ldiv(col("n_pos") * 1000L, col("n"))) *
          (ldiv(col("qsum"), col("n")) - ldiv(col("n_pos") * 1000L, col("n"))))
          .as("rel_x6"))
      .orderBy("bin")
  }

  /** c15 — average precision (area under the precision-recall curve,
    * the retrieval/imbalanced-eval companion to c05's ROC-AUC): rank by
    * the deterministic c05 linear scorer descending (ties break to the
    * lower vec_id — a documented total order, the practical convention
    * when scores collide), then AP = mean over positives of
    * precision@their-rank. The key identity that keeps this distributed:
    * for the positive at global rank rn, precision@rn = rp/rn where rp
    * is its rank AMONG positives — so two [[SequentialId]] passes (one
    * over all rows, one over the positives) replace any global running
    * sum. Each per-positive term is frozen to integer fixed point
    * (ldiv(rp·1e9, rn)) before the mean, so the result is exact at any
    * parallelism. R-precision (positives found in the top n_pos) rides
    * the same ranks for free.
    *
    * Scale shape: two range exchanges (the SequentialId idiom, no
    * single-partition window), one total aggregate. No driver state. */
  def c15_average_precision(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val signs = lit((1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
        floor(aggregate(zip_with(col("a"), signs, (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long").as("s_fp"))
    val ranked = SequentialId.withSequentialId(
      sc, "rn", Seq(col("s_fp").desc, col("vec_id")))
    val pos = SequentialId.withSequentialId(
      ranked.filter(col("y") === 1L), "rp", Seq(col("rn")))
    val nn = sc.agg(sum("y").as("n_pos"),
      (count(lit(1)) - sum("y")).as("n_neg"))
    pos.crossJoin(broadcast(nn))
      .agg(first("n_pos").as("n_pos"), first("n_neg").as("n_neg"),
        sum(ldiv(col("rp") * 1000000000L, col("rn"))).as("ap_sum"),
        sum(when(col("rn") <= col("n_pos"), 1L).otherwise(0L))
          .as("hits_at_npos"))
      .select(col("n_pos"), col("n_neg"),
        ldiv(col("ap_sum"), col("n_pos")).as("ap_fp"),
        ldiv(col("hits_at_npos") * 1000000000L, col("n_pos"))
          .as("r_precision_fp"))
  }

  /** c16 — McNemar paired-classifier comparison (the standard test for
    * "is model B actually better than model A on the SAME eval set",
    * which a per-model accuracy diff cannot answer because it ignores
    * pairing): two deterministic linear scorers (the c05 hyperplane and
    * a second fixed hyperplane) predict label parity at threshold 0;
    * the disagreement cells n01 (A wrong, B right) / n10 (A right, B
    * wrong) feed the continuity-corrected McNemar statistic
    * (|n01−n10|−1)²/(n01+n10), shipped ×1e6 as an exact integer ratio —
    * no chi-square tail, no doubles. Both per-model accuracies ride
    * along so the report is self-contained.
    *
    * Scale shape: one scan, one 4-cell partial+final aggregate — the
    * cheapest possible eval reduction; nothing grows with data. */
  def c16_mcnemar_paired(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val signsA = lit((1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    val signsB = lit((1 to 64).map(i =>
      if (i.toLong * 2246822519L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    def scoreFp(signs: Column): Column =
      floor(aggregate(zip_with(col("a"), signs, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long")
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select((col("label") % 2).cast("long").as("y"),
        (scoreFp(signsA) > 0L).cast("long").as("pa"),
        (scoreFp(signsB) > 0L).cast("long").as("pb"))
      .select(col("y"),
        (col("pa") === col("y")).cast("long").as("ca"),
        (col("pb") === col("y")).cast("long").as("cb"))
    sc.agg(
        sum(when(col("ca") === 0L && col("cb") === 0L, 1L).otherwise(0L))
          .as("n00"),
        sum(when(col("ca") === 0L && col("cb") === 1L, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col("ca") === 1L && col("cb") === 0L, 1L).otherwise(0L))
          .as("n10"),
        sum(when(col("ca") === 1L && col("cb") === 1L, 1L).otherwise(0L))
          .as("n11"),
        count(lit(1)).as("n"))
      .select(col("n00"), col("n01"), col("n10"), col("n11"),
        ldiv((col("n10") + col("n11")) * 1000000L, col("n")).as("acc_a_fp"),
        ldiv((col("n01") + col("n11")) * 1000000L, col("n")).as("acc_b_fp"),
        when(col("n01") + col("n10") === 0L, 0L).otherwise(
          ldiv((abs(col("n01") - col("n10")) - 1L) *
            (abs(col("n01") - col("n10")) - 1L) * 1000000L,
            col("n01") + col("n10"))).as("mcnemar_fp"))
  }

  /** c17 — population stability index (PSI, the industry-standard
    * drift score a model monitor reports next to q55's χ²): per event
    * type, the first/second-half value histograms compare as
    * Σ_bins (p_b − q_b)·ln(p_b/q_b) with add-one smoothing over the
    * FULL 16-bin grid (empty bins matter — they are where drift
    * concentrates). Each bin term freezes to 1e6 fixed point before
    * the per-type sum, so the score is an order-independent integer;
    * p and q are exact integer ratios evaluated identically by both
    * engines (the ln ulp note from t09 applies, 1e-12 of a grid cell).
    * χ² answers "is the shift statistically surprising"; PSI is the
    * magnitude-calibrated score thresholds are written against
    * (0.1 / 0.25 action bands) — monitors want both.
    *
    * Scale shape: one event scan → ≤ |types|·16 cells (partial+final),
    * a broadcast grid completion, one ≤16-row-per-type aggregate. */
  def c17_psi_drift(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val ev = Tables.events(s, dir).select("ts", "event_type", "value")
    val mid = ev.agg((min("ts") + ldiv(max("ts") - min("ts"), lit(2L)))
      .as("mid"))
    val cells = ev.crossJoin(broadcast(mid))
      .withColumn("bin",
        least(ldiv(floor(col("value")).cast("long"), lit(32L)), lit(15L)))
      .groupBy("event_type", "bin")
      .agg(sum(when(col("ts") <= col("mid"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("ts") > col("mid"), 1L).otherwise(0L)).as("n2"))
      .localCheckpoint()
    val grid = cells.select("event_type").distinct()
      .crossJoin(s.range(16).withColumnRenamed("id", "bin"))
    val full = grid.join(cells, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("n1", "n2"))
    val tot = full.groupBy("event_type")
      .agg(sum("n1").as("tn1"), sum("n2").as("tn2"))
    full.join(broadcast(tot), "event_type")
      .withColumn("p", (col("n1") + 1L).cast("double") /
        (col("tn1") + 16L).cast("double"))
      .withColumn("q", (col("n2") + 1L).cast("double") /
        (col("tn2") + 16L).cast("double"))
      .withColumn("term_fp",
        floor((col("p") - col("q")) * log(col("p") / col("q")) * 1e6)
          .cast("long"))
      .groupBy("event_type")
      .agg(first("tn1").as("n_first_half"), first("tn2").as("n_second_half"),
        sum("term_fp").as("psi_fp"))
      .orderBy("event_type")
  }

  /** c18 — Spearman rank correlation between two scorers (the c16
    * hyperplane pair): "do the models RANK the data the same way",
    * the agreement view that precedes an ensemble or a distillation
    * decision — Pearson on scores rewards calibration, Spearman only
    * ordering. Ranks come from two [[SequentialId]] passes over the
    * (score, vec_id) total orders (ties broken by id, documented), so
    * ρ = 1 − 6·Σd²/(n(n²−1)) is EXACT integer arithmetic end to end:
    * Σd² ≤ n³/3 fits a long to n ≈ 2·10⁶ and the decimal(38) carry
    * beyond — shipped ×1e6 with one integral divide.
    *
    * Scale shape: two range exchanges + one total aggregate. */
  def c18_spearman(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    def signs(m: Long) = lit((1 to 64).map(i =>
      if (i.toLong * m / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    def scoreFp(w: Column): Column =
      floor(aggregate(zip_with(col("a"), w, (x, ww) => x * ww),
        lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long")
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select(col("vec_id"),
        scoreFp(signs(2654435761L)).as("sa"),
        scoreFp(signs(2246822519L)).as("sb"))
    val ra = SequentialId.withSequentialId(sc, "ra", Seq(col("sa"), col("vec_id")))
    val rb = SequentialId.withSequentialId(
      ra.select("vec_id", "ra", "sb"), "rb", Seq(col("sb"), col("vec_id")))
    rb.agg(count(lit(1)).as("n"),
        sum((col("ra") - col("rb")) * (col("ra") - col("rb"))).as("d2"))
      // d2·6e6 must fit a long: d2 ≤ n³/3 bounds this to n ≈ 16500 —
      // raise loudly beyond (the q55/t19 guard pattern; a 100 TB run
      // would sample pairs instead of ranking the full corpus)
      .withColumn("guard", when(col("d2") > 1537228672809L,
        raise_error(lit("c18: sum d² too large for the 1e6 carry — " +
          "sample the corpus"))).otherwise(lit(0L)))
      .select(col("n"), (col("d2") + col("guard")).as("sum_d2"),
        (lit(1000000L) - ldiv(col("d2") * 6000000L,
          col("n") * (col("n") * col("n") - 1L))).as("rho_fp"))
  }

  /** c19 — paired-bootstrap confidence interval on the ACCURACY DELTA
    * between the two c16 classifiers (Koehn's paired bootstrap, the
    * standard companion to McNemar: c16 answers "is the disagreement
    * skewed", c19 answers "how big is the gap and how wide is its error
    * bar"). Pairing is what the resample preserves: each replicate
    * reweights WHOLE examples, so both models see the identical
    * resampled eval set and per-example correctness differences never
    * decouple. The 32 replicates reuse c10's deterministic streaming
    * bootstrap (Poisson(1)-shaped integer weights off a two-step Lehmer
    * hash of (vec_id, rep) with the pmod pre-reduction), the delta is
    * an exact ±1e-6 fixed-point ratio (sign split so both engines
    * truncate toward zero), and the 5/95 % band + the count of
    * A-favoring replicates are read off the sorted 32-long array.
    *
    * Scale shape: one embedding scan × constant 32-way explode →
    * map-side-combined 32-group aggregate; the band is a 1-row
    * broadcast over 32 rows. Nothing grows with data. */
  def c19_paired_bootstrap(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val signsA = lit((1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    val signsB = lit((1 to 64).map(i =>
      if (i.toLong * 2246822519L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    def scoreFp(signs: Column): Column =
      floor(aggregate(zip_with(col("a"), signs, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long")
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
        (scoreFp(signsA) > 0L).cast("long").as("pa"),
        (scoreFp(signsB) > 0L).cast("long").as("pb"))
      .select(col("vec_id"),
        (col("pa") === col("y")).cast("long").as("ca"),
        (col("pb") === col("y")).cast("long").as("cb"))
    val byRep = sc
      .withColumn("rep", explode(sequence(lit(0L), lit(31L))))
      .withColumn("h1", (pmod(col("vec_id"), lit(2147483647L)) *
        1103515245L + (col("rep") + 1L) * 12345L + 6789L) % 2147483647L)
      .withColumn("b", (col("h1") * 16807L) % 2147483647L % 100L)
      .withColumn("w", when(col("b") < 37L, 0L).when(col("b") < 74L, 1L)
        .when(col("b") < 92L, 2L).when(col("b") < 98L, 3L).otherwise(4L))
      .groupBy("rep")
      .agg(sum("w").as("n_eff"),
        sum(col("w") * (col("ca") - col("cb"))).as("delta_num"))
      // truncate-toward-zero in BOTH engines: split the sign off before
      // the integral divide (Spark div and DuckDB // disagree on
      // negative operands — flooring vs truncation)
      .withColumn("delta_fp", when(col("delta_num") >= 0L,
          ldiv(col("delta_num") * 1000000L, col("n_eff")))
        .otherwise(-ldiv(-col("delta_num") * 1000000L, col("n_eff"))))
    val band = byRep
      .agg(sort_array(collect_list(col("delta_fp"))).as("ds"),
        sum(when(col("delta_fp") > 0L, 1L).otherwise(0L)).as("n_a_better"))
      .select(element_at(col("ds"), 2).as("lo_fp"),
        element_at(col("ds"), 31).as("hi_fp"), col("n_a_better"))
    byRep.crossJoin(broadcast(band))
      .select("rep", "n_eff", "delta_fp", "lo_fp", "hi_fp", "n_a_better")
      .orderBy("rep")
  }

  /** c20 — Bradley–Terry "arena" ranking of 4 fixed scorers: every
    * document stages all 6 pairwise battles (higher score wins, exact
    * ties abstain), the battle scan reduces to a 4×4 win matrix, and a
    * 3-step minorization–maximization fit turns pair win rates into BT
    * strengths γ — the chatbot-arena/reward-model leaderboard
    * computation, which unlike raw win counts is transitive-consistent
    * and schedule-invariant (a model that only battled weak opponents
    * doesn't outrank one that battled strong ones). Counts are
    * RATE-normalized per pair (ppm) before the fit, which (a) makes the
    * fit independent of corpus size, so every product below stays
    * < 2^62 in plain longs at ANY scale — no decimal needed — and (b)
    * weighs each matchup equally, the arena convention. The MM
    * iteration is exact integer arithmetic (1e12 carry, floor division
    * at defined points, renormalized to Σγ = 4e6), so the DuckDB oracle
    * replays it step for step.
    *
    * Scale shape: ONE embedding scan → constant 6-way explode →
    * map-side-combined 6-group aggregate; the driver sees 6 rows (the
    * t22 argmax pattern) and the γ fit is O(models²) arithmetic on
    * them. Nothing downstream grows with data. */
  def c20_bt_arena(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val muls = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
    def signs(m: Long) = lit((1 to 64).map(i =>
      if (i.toLong * m / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    def scoreFp(m: Long): Column =
      floor(aggregate(zip_with(col("a"), signs(m), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long")
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select((0 until 4).map(i => scoreFp(muls(i)).as(s"s$i")): _*)
    val pairs = for (i <- 0 until 4; j <- i + 1 until 4) yield (i, j)
    val battles = sc.select(explode(array(pairs.map { case (i, j) =>
        struct(lit(i).as("i"), lit(j).as("j"),
          when(col(s"s$i") > col(s"s$j"), 1L)
            .when(col(s"s$j") > col(s"s$i"), 0L).as("wi"))
      }: _*)).as("b"))
      .select(col("b.i"), col("b.j"), col("b.wi"))
      .filter(col("wi").isNotNull) // exact ties abstain
      .groupBy("i", "j")
      .agg(sum("wi").as("n_ij"), (count(lit(1)) - sum("wi")).as("n_ji"))
      .collect()
    // rate-normalized win matrix p(i)(j) in ppm; pairs with no decided
    // battle stay 0 and drop out of the denominators
    val p = Array.ofDim[Long](4, 4)
    battles.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val (nij, nji) = (r.getAs[Long]("n_ij"), r.getAs[Long]("n_ji"))
      val dec = nij + nji
      if (dec > 0) {
        p(i)(j) = nij * 1000000L / dec
        p(j)(i) = nji * 1000000L / dec
      }
    }
    val w = Array.tabulate(4)(i => (0 until 4).map(p(i)).sum)
    var g = Array.fill(4)(1000000L)
    for (_ <- 1 to 3) {
      val denom = Array.tabulate(4) { i =>
        (0 until 4).filter(j => j != i && p(i)(j) + p(j)(i) > 0)
          .map(j => (p(i)(j) + p(j)(i)) * 1000000000000L / (g(i) + g(j)))
          .sum
      }
      val gu = Array.tabulate(4)(i =>
        if (denom(i) == 0) g(i) else w(i) * 1000000000000L / denom(i))
      val tot = gu.sum
      g = gu.map(x => x * 4000000L / tot)
    }
    val ranked = (0 until 4).sortBy(i => (-g(i), i.toLong))
    ranked.zipWithIndex.map { case (m, r) =>
      (r.toLong + 1L, m.toLong, w(m), g(m))
    }.toDF("rank", "model", "wins_ppm", "gamma_fp")
      .orderBy("rank")
  }

  /** c23 — EXPECTED / MAXIMUM CALIBRATION ERROR (ECE / MCE) of the
    * rank-calibrated c05 scorer — the third calibration output next to
    * c06 (the per-bin reliability TABLE) and c14 (the Brier/Murphy
    * decomposition): c14's reliability term is the L2 (squared) bin
    * gap; ECE is the L1 gap the LLM-eval literature actually headlines
    * (Guo et al. 2017), and MCE its worst-bin companion — the two
    * scalars a model card quotes, which neither c06 nor c14 emits.
    * Predicted
    * probability = the score's empirical-CDF rank percentile
    * p = rank·1e9/(n+1) (the standard rank calibration transform, exact
    * integers), ten equal-width probability bins (= rank deciles under
    * the uniform transform), and per bin the absolute gap between total
    * predicted mass and observed positives — ECE is the count-weighted
    * mean gap, MCE the worst bin. The per-bin identity
    * |mean_p − pos_rate|·n = |Σp − pos·1e9| keeps everything in exact
    * integer arithmetic with a single division per output value, so
    * Spark and the oracle agree bit-for-bit.
    *
    * Scale shape: the only global structure is the [[SequentialId]]
    * rank c05/c06/c21 already pay (range exchange + broadcast offsets);
    * the rest is one 10-group aggregate and a broadcast of the 10-row
    * frame for the ECE/MCE fold. */
  def c23_calibration_error(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KeyAlgebra.ldiv
    val signs = lit((1 to 64).map(i =>
      if (i.toLong * 2654435761L / 65536L % 2L == 1L) 1.0 else -1.0).toArray)
    val sc = Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))
      .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
        floor(aggregate(zip_with(col("a"), signs, (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x) * lit(1e6)).cast("long").as("s_fp"))
    val n = sc.agg(count(lit(1)).as("n_tot"))
    val bins = SequentialId.withSequentialId(sc, "rn", Seq(col("s_fp"), col("vec_id")))
      .crossJoin(broadcast(n))
      .withColumn("p_fp", ldiv(col("rn") * 1000000000L, col("n_tot") + 1L))
      .withColumn("decile", ldiv((col("rn") - 1L) * 10L, col("n_tot")))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("p_fp").as("psum_fp"))
      .withColumn("abs_gap_fp",
        abs(col("psum_fp") - col("n_pos") * 1000000000L))
    val totals = bins.agg(
      ldiv(sum("abs_gap_fp"), sum("n")).as("ece_fp"),
      max(ldiv(col("abs_gap_fp"), col("n"))).as("mce_fp"))
    bins.crossJoin(broadcast(totals))
      .select(col("decile"), col("n"), col("n_pos"), col("psum_fp"),
        col("abs_gap_fp"), col("ece_fp"), col("mce_fp"))
      .orderBy("decile")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c23_calibration_error" -> (c23_calibration_error _),
    "c20_bt_arena" -> (c20_bt_arena _),
    "c21_risk_coverage" -> (c21_risk_coverage _),
    "c22_krippendorff" -> (c22_krippendorff _),
    "c19_paired_bootstrap" -> (c19_paired_bootstrap _),
    "c18_spearman" -> (c18_spearman _),
    "c17_psi_drift" -> (c17_psi_drift _),
    "c16_mcnemar_paired" -> (c16_mcnemar_paired _),
    "c15_average_precision" -> (c15_average_precision _),
    "c14_brier_decomposition" -> (c14_brier_decomposition _),
    "c13_span_f1" -> (c13_span_f1 _),
    "c12_ngram_overlap_eval" -> (c12_ngram_overlap_eval _),
    "c11_mcc_eval" -> (c11_mcc_eval _),
    "c10_bootstrap_ci" -> (c10_bootstrap_ci _),
    "c09_kappa_agreement" -> (c09_kappa_agreement _),
    "c08_ndcg_eval" -> (c08_ndcg_eval _),
    "c07_langid_eval" -> (c07_langid_eval _),
    "c06_calibration_bins" -> (c06_calibration_bins _),
    "c01_kmeans_embeddings" -> (c01_kmeans_embeddings _),
    "c02_kmeans_lloyd" -> (c02_kmeans_lloyd _),
    "c03_pca_power" -> (c03_pca_power _),
    "c04_ols_suffstats" -> (c04_ols_suffstats _),
    "c05_auc_rank" -> (c05_auc_rank _),
  )

  /** c01 oracle: replays MLlib's single fixed-init Lloyd step exactly —
    * integer-valued floor(x·1e6) features make every internal sum exact
    * in IEEE double (order-free), the center update is the decompiled
    * `scal(1.0/count, sum)` i.e. `sum * (1.0 / n)` (division FIRST,
    * then multiply — not sum/n), empty clusters keep their init
    * center, and the final assignment is the same left-fold distance
    * the Spark side computes. */
  private val c01Sql: String =
    """WITH e AS (SELECT vec_id,
           list_transform(embedding, x -> floor(x::DOUBLE * 1e6)) AS v
         FROM embeddings),
       c0 AS (SELECT list(v ORDER BY vec_id) AS cs FROM e WHERE vec_id < 5),
       a1 AS (SELECT vec_id, v,
               CAST(list_indexof(ds, list_min(ds)) - 1 AS BIGINT) AS cid
              FROM (SELECT e.vec_id, e.v,
                      list_transform(c0.cs, c -> list_reduce(
                        list_transform(range(1, 65),
                          i -> (e.v[i]-c[i]) * (e.v[i]-c[i])),
                        (x,y) -> x+y)) AS ds
                    FROM e, c0)),
       c1m AS (SELECT cid, list(m ORDER BY i) AS m FROM (
                 SELECT cid, i, sum(v[i]) * (1.0 / count(*)) AS m
                 FROM a1, range(1, 65) t(i) GROUP BY cid, i)
               GROUP BY cid),
       c0j AS (SELECT CAST(j - 1 AS BIGINT) AS cid, c0.cs[j] AS c
               FROM c0, range(1, 6) t(j)),
       cm AS (SELECT c0j.cid, coalesce(c1m.m, c0j.c) AS m
              FROM c0j LEFT JOIN c1m ON c1m.cid = c0j.cid),
       c1 AS (SELECT list(m ORDER BY cid) AS cs FROM cm),
       a2 AS (SELECT vec_id,
               CAST(list_indexof(ds, list_min(ds)) - 1 AS BIGINT) AS cid
              FROM (SELECT e.vec_id,
                      list_transform(c1.cs, c -> list_reduce(
                        list_transform(range(1, 65),
                          i -> (e.v[i]-c[i]) * (e.v[i]-c[i])),
                        (x,y) -> x+y)) AS ds
                    FROM e, c1)),
       fp AS (SELECT cid, array_to_string(list_transform(m,
                x -> CAST(floor(x * 1e6) AS BIGINT)), ',') AS centroid
              FROM cm)
       SELECT a2.cid, count(*) AS n, any_value(fp.centroid) AS centroid
       FROM a2 JOIN fp ON a2.cid = fp.cid
       GROUP BY a2.cid ORDER BY a2.cid"""

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

  /** c03 oracle: the 20 power steps unroll into generated CTEs w1..w20 —
    * all integer arithmetic (DuckDB's BIGINT/HUGEINT `//` truncates
    * toward zero exactly like the driver's BigInt), so the eigenvector
    * replays bit-for-bit. */
  private val pcaSql: String = {
    def step(prev: String, t: Int): String =
      s"""u$t AS (SELECT list_transform(range(0, 64), j ->
             list_reduce(list_transform(range(0, 64),
               k -> gs[j*64 + k + 1]::HUGEINT * w[k+1]::HUGEINT),
               (a, b) -> a + b)) AS u
           FROM gsc, $prev),
       w$t AS (SELECT list_transform(u, x ->
             CAST((x * 1000000) // mx AS BIGINT)) AS w
           FROM (SELECT u, greatest(list_max(list_transform(u,
             y -> abs(y))), 1::HUGEINT) AS mx FROM u$t))"""
    val steps = (1 to 20).map(t => step(if (t == 1) "w0" else s"w${t - 1}", t))
      .mkString(",\n       ")
    s"""WITH e AS (SELECT vec_id, label,
           list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1e6) AS BIGINT))
             AS v
         FROM embeddings),
       nn AS (SELECT count(*) AS n FROM e),
       msum AS (SELECT i, CAST(sum(v[i]) AS BIGINT) AS s
         FROM e, range(1, 65) t(i) GROUP BY i),
       m AS (SELECT list(s // n ORDER BY i) AS m FROM msum, nn GROUP BY n),
       c AS (SELECT e.vec_id, e.label,
           list_transform(range(1, 65), i -> e.v[i] - m.m[i]) AS c
         FROM e, m),
       gf AS (SELECT jk, CAST(sum(c[jk // 64 + 1] * c[jk % 64 + 1]) AS BIGINT)
             AS s
         FROM c, range(0, 4096) t(jk) GROUP BY jk),
       g AS (SELECT list(s ORDER BY jk) AS g FROM gf),
       gmx AS (SELECT greatest(list_max(list_transform(g, x -> abs(x))),
           1::BIGINT) AS gmax FROM g),
       gsc AS (SELECT list_transform(g.g, x ->
           CAST((x::HUGEINT * 1000000000000) // gmax AS BIGINT)) AS gs
         FROM g, gmx),
       w0 AS (SELECT list_transform(range(0, 64), j -> 1000000::BIGINT) AS w),
       $steps,
       uf AS (SELECT list_transform(range(0, 64), j ->
             list_reduce(list_transform(range(0, 64),
               k -> gs[j*64 + k + 1]::HUGEINT * w[k+1]::HUGEINT),
               (a, b) -> a + b)) AS u
           FROM gsc, w20),
       lam AS (SELECT CAST((num * 1000000) // den AS BIGINT) AS l
         FROM (SELECT
             list_reduce(list_transform(range(0, 64),
               j -> u[j+1] * w[j+1]::HUGEINT), (a, b) -> a + b) AS num,
             greatest(list_reduce(list_transform(w,
               x -> x::HUGEINT * x::HUGEINT), (a, b) -> a + b),
               1::HUGEINT) AS den
           FROM uf, w20))
       SELECT kind, id, val FROM (
         SELECT 'eig' AS kind, j::BIGINT AS id, w[j+1] AS val
           FROM w20, range(0, 64) t(j)
         UNION ALL SELECT 'lambda', -1::BIGINT, l FROM lam
         UNION ALL SELECT 'proj', label::BIGINT, CAST(sum(p) AS BIGINT)
           FROM (SELECT c.label, list_reduce(list_transform(range(1, 65),
               i -> c.c[i] * w20.w[i]), (a, b) -> a + b) AS p
             FROM c, w20) GROUP BY label)
       ORDER BY kind, id"""
  }

  private val discSql = ndcgDisc.mkString("[", ", ", "]")
  private val gainsSql = ndcgGains.mkString("[", ", ", "]")

  /** c20 oracle: the four c16-style scorers, the 6-way battle union,
    * rate normalization and the 3 MM steps replayed as CTE chains with
    * the identical integer truncation points. Assumes every model has
    * ≥ 1 decided battle (true at any realistic SF — exact score ties
    * are the only abstention); a fully-tied model would drop here but
    * be kept by the engine, which the gate would surface loudly. */
  private lazy val c20Sql: String = {
    def score(m: Long, alias: String) =
      s"""CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
           i -> (embedding[i]::DOUBLE) *
             (CASE WHEN i * $m // 65536 % 2 = 1
              THEN 1.0 ELSE -1.0 END)),
           (p, q) -> p + q)) AS BIGINT) AS $alias"""
    val muls = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
    val pairs = for (i <- 0 until 4; j <- i + 1 until 4) yield (i, j)
    val battleUnion = pairs.map { case (i, j) =>
      s"""SELECT $i AS i, $j AS j,
          CASE WHEN s$i > s$j THEN 1 WHEN s$j > s$i THEN 0 END AS wi
        FROM sc"""
    }.mkString(" UNION ALL ")
    def iter(t: Int): String = {
      val prev = if (t == 1) "g0" else s"g${t - 1}"
      s"""d$t AS (SELECT dirp.i AS m,
           CAST(sum((pij + pji) * 1000000000000 // (gi.g + gj.g))
             AS BIGINT) AS d
         FROM dirp JOIN $prev gi ON gi.m = dirp.i
           JOIN $prev gj ON gj.m = dirp.j GROUP BY dirp.i),
       u$t AS (SELECT w.m,
           CASE WHEN d.d = 0 THEN p.g
             ELSE CAST(w.w * 1000000000000 // d.d AS BIGINT) END AS gu
         FROM wtot w JOIN d$t d ON d.m = w.m JOIN $prev p ON p.m = w.m),
       g$t AS (SELECT m, CAST(gu * 4000000 //
           (SELECT sum(gu) FROM u$t) AS BIGINT) AS g FROM u$t)"""
    }
    s"""WITH sc AS (SELECT ${muls.zipWithIndex.map { case (m, i) =>
           score(m, s"s$i") }.mkString(", ")} FROM embeddings),
       b AS ($battleUnion),
       praw AS (SELECT i, j, CAST(sum(wi) AS BIGINT) AS nij,
           CAST(count(*) - sum(wi) AS BIGINT) AS nji
         FROM b WHERE wi IS NOT NULL GROUP BY i, j),
       pd AS (SELECT i, j,
           nij * 1000000 // (nij + nji) AS pij,
           nji * 1000000 // (nij + nji) AS pji FROM praw),
       dirp AS (SELECT i, j, pij, pji FROM pd
         UNION ALL SELECT j AS i, i AS j, pji AS pij, pij AS pji FROM pd),
       wtot AS (SELECT i AS m, CAST(sum(pij) AS BIGINT) AS w
         FROM dirp GROUP BY i),
       g0 AS (SELECT unnest(range(0, 4))::BIGINT AS m,
         1000000::BIGINT AS g),
       ${iter(1)}, ${iter(2)}, ${iter(3)}
       SELECT row_number() OVER (ORDER BY g3.g DESC, g3.m)::BIGINT
           AS rank,
         g3.m::BIGINT AS model, wtot.w AS wins_ppm, g3.g AS gamma_fp
       FROM g3 JOIN wtot ON wtot.m = g3.m
       ORDER BY rank"""
  }

  val oracles: Map[String, String] = Map(
    "c20_bt_arena" -> c20Sql,
    // same two scorers, same (score, vec_id) rank order, same exact
    // integer rho formula
    "c18_spearman" ->
      """WITH sc AS (SELECT vec_id,
           CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)), (p, q) -> p + q)) AS BIGINT) AS sa,
           CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2246822519 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)), (p, q) -> p + q)) AS BIGINT) AS sb
         FROM embeddings),
       r AS (SELECT row_number() OVER (ORDER BY sa, vec_id) AS ra,
           row_number() OVER (ORDER BY sb, vec_id) AS rb FROM sc),
       t AS (SELECT count(*)::BIGINT AS n,
           CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS d2 FROM r)
       SELECT n, d2 AS sum_d2,
         CAST(1000000 - (d2 * 6000000) // (n * (n * n - 1)) AS BIGINT)
           AS rho_fp
       FROM t""",
    // same 16-bin grid with add-one smoothing, same per-bin 1e6 freeze
    // before the per-type integer sum
    "c17_psi_drift" ->
      """WITH e AS (SELECT epoch_ns(ts) AS tns, event_type, value
           FROM events),
         m AS (SELECT min(tns) + (max(tns) - min(tns)) // 2 AS mid FROM e),
         cells AS (SELECT event_type,
             least(CAST(floor(value) AS BIGINT) // 32, 15) AS bin,
             CAST(sum(CASE WHEN tns <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN tns > mid THEN 1 ELSE 0 END) AS BIGINT) AS n2
           FROM e, m GROUP BY 1, 2),
         grid AS (SELECT t.event_type, r.range AS bin
           FROM (SELECT DISTINCT event_type FROM cells) t, range(16) r),
         fl AS (SELECT g.event_type, g.bin,
             coalesce(c.n1, 0) AS n1, coalesce(c.n2, 0) AS n2
           FROM grid g LEFT JOIN cells c
             ON c.event_type = g.event_type AND c.bin = g.bin),
         tot AS (SELECT event_type, CAST(sum(n1) AS BIGINT) AS tn1,
             CAST(sum(n2) AS BIGINT) AS tn2 FROM fl GROUP BY 1),
         terms AS (SELECT f.event_type, t.tn1, t.tn2,
             CAST(floor((((f.n1 + 1)::DOUBLE / (t.tn1 + 16)::DOUBLE)
               - ((f.n2 + 1)::DOUBLE / (t.tn2 + 16)::DOUBLE))
               * ln(((f.n1 + 1)::DOUBLE / (t.tn1 + 16)::DOUBLE)
                  / ((f.n2 + 1)::DOUBLE / (t.tn2 + 16)::DOUBLE))
               * 1e6) AS BIGINT) AS term_fp
           FROM fl f JOIN tot t USING (event_type))
         SELECT event_type, any_value(tn1) AS n_first_half,
           any_value(tn2) AS n_second_half,
           CAST(sum(term_fp) AS BIGINT) AS psi_fp
         FROM terms GROUP BY event_type ORDER BY event_type""",
    // same two fixed hyperplanes, same integer contingency cells and
    // continuity-corrected ratio
    // c16's scorer pair + c10's deterministic Poisson weights; the
    // delta divide is sign-split so // only ever sees nonnegatives
    "c19_paired_bootstrap" ->
      """WITH sc AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
           CASE WHEN CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) > 0 THEN 1 ELSE 0 END AS pa,
           CASE WHEN CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2246822519 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) > 0 THEN 1 ELSE 0 END AS pb
         FROM embeddings),
       c AS (SELECT vec_id,
           CASE WHEN pa = y THEN 1 ELSE 0 END AS ca,
           CASE WHEN pb = y THEN 1 ELSE 0 END AS cb FROM sc),
       w AS (SELECT r.rep, c.ca, c.cb,
           (((c.vec_id % 2147483647) * 1103515245
             + (r.rep + 1) * 12345 + 6789)
             % 2147483647 * 16807) % 2147483647 % 100 AS b
         FROM c, (SELECT unnest(range(0, 32))::BIGINT AS rep) r),
       w2 AS (SELECT rep, ca, cb,
           CASE WHEN b < 37 THEN 0 WHEN b < 74 THEN 1
             WHEN b < 92 THEN 2 WHEN b < 98 THEN 3 ELSE 4 END AS w
         FROM w),
       br AS (SELECT rep, CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(sum(w * (ca - cb)) AS BIGINT) AS delta_num
         FROM w2 GROUP BY rep),
       br2 AS (SELECT rep, n_eff,
           CASE WHEN delta_num >= 0
             THEN CAST((delta_num * 1000000) // n_eff AS BIGINT)
             ELSE -CAST(((-delta_num) * 1000000) // n_eff AS BIGINT)
           END AS delta_fp FROM br),
       band AS (SELECT list_sort(list(delta_fp)) AS ds,
           CAST(sum(CASE WHEN delta_fp > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a_better FROM br2)
       SELECT rep, n_eff, delta_fp,
         (SELECT ds[2] FROM band) AS lo_fp,
         (SELECT ds[31] FROM band) AS hi_fp,
         (SELECT n_a_better FROM band) AS n_a_better
       FROM br2 ORDER BY rep""",
    "c16_mcnemar_paired" ->
      """WITH sc AS (SELECT CAST(label % 2 AS BIGINT) AS y,
           CASE WHEN CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) > 0 THEN 1 ELSE 0 END AS pa,
           CASE WHEN CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2246822519 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) > 0 THEN 1 ELSE 0 END AS pb
         FROM embeddings),
       c AS (SELECT CASE WHEN pa = y THEN 1 ELSE 0 END AS ca,
           CASE WHEN pb = y THEN 1 ELSE 0 END AS cb FROM sc),
       t AS (SELECT
           sum(CASE WHEN ca = 0 AND cb = 0 THEN 1 ELSE 0 END)::BIGINT AS n00,
           sum(CASE WHEN ca = 0 AND cb = 1 THEN 1 ELSE 0 END)::BIGINT AS n01,
           sum(CASE WHEN ca = 1 AND cb = 0 THEN 1 ELSE 0 END)::BIGINT AS n10,
           sum(CASE WHEN ca = 1 AND cb = 1 THEN 1 ELSE 0 END)::BIGINT AS n11,
           count(*)::BIGINT AS n FROM c)
       SELECT n00, n01, n10, n11,
         CAST(((n10 + n11) * 1000000) // n AS BIGINT) AS acc_a_fp,
         CAST(((n01 + n11) * 1000000) // n AS BIGINT) AS acc_b_fp,
         CASE WHEN n01 + n10 = 0 THEN 0 ELSE
           CAST(((abs(n01 - n10) - 1) * (abs(n01 - n10) - 1) * 1000000)
             // (n01 + n10) AS BIGINT) END AS mcnemar_fp
       FROM t""",
    // same scorer, same (s_fp DESC, vec_id) total order, same integer
    // freeze of each precision@rank term before the mean
    "c15_average_precision" ->
      """WITH sc AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
           CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) AS s_fp
         FROM embeddings),
       r AS (SELECT y, s_fp,
           row_number() OVER (ORDER BY s_fp DESC, vec_id) AS rn FROM sc),
       p AS (SELECT rn,
           row_number() OVER (ORDER BY rn) AS rp FROM r WHERE y = 1),
       n AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(count(*) - sum(y) AS BIGINT) AS n_neg FROM sc),
       t AS (SELECT CAST(sum((rp * 1000000000) // rn) AS BIGINT) AS ap_sum,
           CAST(sum(CASE WHEN rn <= n_pos THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_npos
         FROM p, n)
       SELECT n_pos, n_neg,
         CAST(ap_sum // n_pos AS BIGINT) AS ap_fp,
         CAST((hits_at_npos * 1000000000) // n_pos AS BIGINT)
           AS r_precision_fp
       FROM t, n""",
    // independent formulation: spans via relational gaps-and-islands
    // (unnest positions, group by i - row_number), exact-match TP by
    // joining boundaries — vs the engine's in-row fold + intersect
    "c13_span_f1" ->
      """WITH sc AS (SELECT doc_id, lang, tk,
           len(list_filter(tk, t -> t IN ('table','key','hash')))::BIGINT AS s_de,
           len(list_filter(tk, t -> t IN ('the','a','fast','slow')))::BIGINT AS s_en,
           len(list_filter(tk, t -> t IN ('data','row','scan')))::BIGINT AS s_es,
           len(list_filter(tk, t -> t IN ('order','query','value')))::BIGINT AS s_fr,
           len(list_filter(tk, t -> t IN ('spark','join','merge')))::BIGINT AS s_zh
           FROM (SELECT doc_id, lang, string_split(text, ' ') AS tk
             FROM documents)),
         pr AS (SELECT doc_id, lang, tk,
           CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                ELSE 'zh' END AS pred
           FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
             FROM sc)),
         pos AS (SELECT doc_id, lang, pred,
             unnest(range(1, len(tk) + 1))::BIGINT AS i, unnest(tk) AS tok
           FROM pr),
         mem AS (SELECT doc_id, lang, pred, i,
           CASE lang WHEN 'de' THEN tok IN ('table','key','hash')
                     WHEN 'en' THEN tok IN ('the','a','fast','slow')
                     WHEN 'es' THEN tok IN ('data','row','scan')
                     WHEN 'fr' THEN tok IN ('order','query','value')
                     WHEN 'zh' THEN tok IN ('spark','join','merge')
                     ELSE FALSE END AS gm,
           CASE pred WHEN 'de' THEN tok IN ('table','key','hash')
                     WHEN 'en' THEN tok IN ('the','a','fast','slow')
                     WHEN 'es' THEN tok IN ('data','row','scan')
                     WHEN 'fr' THEN tok IN ('order','query','value')
                     WHEN 'zh' THEN tok IN ('spark','join','merge')
                     ELSE FALSE END AS pm
           FROM pos),
         gsp AS (SELECT doc_id, lang, min(i) - 1 AS st, max(i) AS en
           FROM (SELECT doc_id, lang, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
             FROM mem WHERE gm) GROUP BY doc_id, lang, grp),
         psp AS (SELECT doc_id, lang, min(i) - 1 AS st, max(i) AS en
           FROM (SELECT doc_id, lang, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
             FROM mem WHERE pm) GROUP BY doc_id, lang, grp),
         tpj AS (SELECT g.lang FROM gsp g JOIN psp p
           ON g.doc_id = p.doc_id AND g.st = p.st AND g.en = p.en),
         d AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents
           GROUP BY lang),
         gg AS (SELECT lang, count(*)::BIGINT AS n_gold FROM gsp GROUP BY lang),
         pp AS (SELECT lang, count(*)::BIGINT AS n_pred FROM psp GROUP BY lang),
         tt AS (SELECT lang, count(*)::BIGINT AS n_tp FROM tpj GROUP BY lang)
         SELECT d.lang, d.n_docs,
           CAST(coalesce(gg.n_gold, 0) AS BIGINT) AS n_gold,
           CAST(coalesce(pp.n_pred, 0) AS BIGINT) AS n_pred,
           CAST(coalesce(tt.n_tp, 0) AS BIGINT) AS n_tp,
           CASE WHEN coalesce(pp.n_pred, 0) = 0 THEN 0
             ELSE coalesce(tt.n_tp, 0) * 1000000 // pp.n_pred
           END AS prec_fp,
           CASE WHEN coalesce(gg.n_gold, 0) = 0 THEN 0
             ELSE coalesce(tt.n_tp, 0) * 1000000 // gg.n_gold
           END AS rec_fp,
           CASE WHEN coalesce(gg.n_gold, 0) + coalesce(pp.n_pred, 0) = 0
             THEN 0
             ELSE coalesce(tt.n_tp, 0) * 2000000
               // (coalesce(gg.n_gold, 0) + coalesce(pp.n_pred, 0))
           END AS f1_fp
         FROM d LEFT JOIN gg ON d.lang = gg.lang
           LEFT JOIN pp ON d.lang = pp.lang
           LEFT JOIN tt ON d.lang = tt.lang
         ORDER BY d.lang""",
    // same md5-hashed grams, but the clip is relational: unnest both
    // multisets, count per value, sum the per-value minima
    "c12_ngram_overlap_eval" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
           FROM documents),
         pair AS (SELECT a.doc_id AS doc_a, a.doc_id + 1 AS doc_b,
             a.tk AS ta, b.tk AS tb
           FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
           WHERE a.doc_id % 2 = 0),
         nn AS (SELECT unnest([1, 2, 3, 4])::BIGINT AS n),
         ga AS (SELECT doc_a, n,
             unnest(list_transform(range(0, greatest(len(ta) - n + 1, 0)),
               i -> array_to_string(ta[(i + 1)::INT : (i + n)::INT], ' ')))
               AS g
           FROM pair, nn),
         gb AS (SELECT doc_a, n,
             unnest(list_transform(range(0, greatest(len(tb) - n + 1, 0)),
               i -> array_to_string(tb[(i + 1)::INT : (i + n)::INT], ' ')))
               AS g
           FROM pair, nn),
         ca AS (SELECT doc_a, n, g, count(*) AS c FROM ga GROUP BY 1, 2, 3),
         cb AS (SELECT doc_a, n, g, count(*) AS c FROM gb GROUP BY 1, 2, 3),
         clip AS (SELECT ca.doc_a, ca.n,
             CAST(sum(least(ca.c, coalesce(cb.c, 0))) AS BIGINT) AS num
           FROM ca LEFT JOIN cb ON cb.doc_a = ca.doc_a AND cb.n = ca.n
             AND cb.g = ca.g
           GROUP BY 1, 2),
         wide AS (SELECT p.doc_a, p.doc_b,
             len(p.ta)::BIGINT AS len_c, len(p.tb)::BIGINT AS len_r,
             coalesce(max(CASE WHEN c.n = 1 THEN c.num END), 0) AS p1_num,
             greatest(len(p.ta) - 0, 0)::BIGINT AS p1_den,
             coalesce(max(CASE WHEN c.n = 2 THEN c.num END), 0) AS p2_num,
             greatest(len(p.ta) - 1, 0)::BIGINT AS p2_den,
             coalesce(max(CASE WHEN c.n = 3 THEN c.num END), 0) AS p3_num,
             greatest(len(p.ta) - 2, 0)::BIGINT AS p3_den,
             coalesce(max(CASE WHEN c.n = 4 THEN c.num END), 0) AS p4_num,
             greatest(len(p.ta) - 3, 0)::BIGINT AS p4_den
           FROM pair p LEFT JOIN clip c ON c.doc_a = p.doc_a
           GROUP BY p.doc_a, p.doc_b, p.ta, p.tb)
         SELECT doc_a, doc_b, len_c, len_r,
           p1_num, p1_den,
           CASE WHEN p1_den = 0 THEN 0 ELSE p1_num * 1000000 // p1_den END AS p1_fp,
           p2_num, p2_den,
           CASE WHEN p2_den = 0 THEN 0 ELSE p2_num * 1000000 // p2_den END AS p2_fp,
           p3_num, p3_den,
           CASE WHEN p3_den = 0 THEN 0 ELSE p3_num * 1000000 // p3_den END AS p3_fp,
           p4_num, p4_den,
           CASE WHEN p4_den = 0 THEN 0 ELSE p4_num * 1000000 // p4_den END AS p4_fp
         FROM wide ORDER BY doc_a""",
    // same confusion marginals as c09; MCC² kept rational in HUGEINT
    "c11_mcc_eval" ->
      """WITH preds AS (
           SELECT doc_id, lang AS actual_lang,
             CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                  WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                  ELSE 'zh' END AS pred_lang
           FROM (SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
             greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
             FROM (SELECT doc_id, lang,
               len(list_filter(toks, t -> t IN ('table','key','hash')))::BIGINT AS s_de,
               len(list_filter(toks, t -> t IN ('the','a','fast','slow')))::BIGINT AS s_en,
               len(list_filter(toks, t -> t IN ('data','row','scan')))::BIGINT AS s_es,
               len(list_filter(toks, t -> t IN ('order','query','value')))::BIGINT AS s_fr,
               len(list_filter(toks, t -> t IN ('spark','join','merge')))::BIGINT AS s_zh
               FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents)))),
         ba AS (SELECT actual_lang AS cls, count(*)::BIGINT AS t_k,
             sum(CASE WHEN pred_lang = actual_lang THEN 1 ELSE 0 END)::BIGINT AS tp
           FROM preds GROUP BY 1),
         bp AS (SELECT pred_lang AS cls, count(*)::BIGINT AS p_k
           FROM preds GROUP BY 1),
         per AS (SELECT coalesce(ba.cls, bp.cls) AS cls,
             coalesce(t_k, 0) AS t_k, coalesce(tp, 0) AS tp,
             coalesce(p_k, 0) AS p_k
           FROM ba FULL OUTER JOIN bp ON ba.cls = bp.cls),
         tot AS (SELECT sum(t_k)::BIGINT AS n, sum(tp)::BIGINT AS correct,
             sum(t_k * p_k)::BIGINT AS sum_pt,
             sum(p_k * p_k)::BIGINT AS sum_p2,
             sum(t_k * t_k)::BIGINT AS sum_t2 FROM per)
         SELECT n, correct, sum_pt, sum_p2, sum_t2,
           (correct * n - sum_pt) AS num,
           (CASE WHEN correct * n - sum_pt > 0 THEN 1
                 WHEN correct * n - sum_pt < 0 THEN -1
                 ELSE 0 END)::BIGINT AS mcc_sign,
           CASE WHEN n * n = sum_p2 OR n * n = sum_t2 THEN 0
             ELSE CAST((abs(correct::HUGEINT * n - sum_pt) * 1000000
               // (n::HUGEINT * n - sum_p2))
               * abs(correct::HUGEINT * n - sum_pt)
               // (n::HUGEINT * n - sum_t2)
               AS BIGINT) END AS mcc2_fp
         FROM tot""",
    // identical Lehmer weights, 32 replicate means, list-sorted band
    "c10_bootstrap_ci" ->
      """WITH d AS (SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS n_tok
           FROM documents),
         w AS (SELECT r.rep, d.n_tok,
             (((d.doc_id % 2147483647) * 1103515245
               + (r.rep + 1) * 12345 + 6789)
               % 2147483647 * 16807) % 2147483647 % 100 AS b
           FROM d, (SELECT unnest(range(0, 32))::BIGINT AS rep) r),
         w2 AS (SELECT rep, n_tok,
             CASE WHEN b < 37 THEN 0 WHEN b < 74 THEN 1
               WHEN b < 92 THEN 2 WHEN b < 98 THEN 3 ELSE 4 END AS w
           FROM w),
         br AS (SELECT rep, CAST(sum(w) AS BIGINT) AS n_eff,
             CAST(sum(w * n_tok) AS BIGINT) AS tok_sum
           FROM w2 GROUP BY rep),
         br2 AS (SELECT rep, n_eff, tok_sum,
             (tok_sum * 1000000) // n_eff AS mean_fp FROM br),
         band AS (SELECT list_sort(list(mean_fp)) AS ms FROM br2)
         SELECT rep, n_eff, tok_sum, mean_fp,
           (SELECT ms[2] FROM band) AS lo_fp,
           (SELECT ms[31] FROM band) AS hi_fp
         FROM br2 ORDER BY rep""",
    // t16's scoring chain + graded gains over the shared integer LUTs
    "c08_ndcg_eval" -> s"""
      WITH qt(q_id, term) AS (SELECT * FROM (VALUES
          (0,'spark'),(0,'join'),(0,'merge'),
          (1,'table'),(1,'scan'),(1,'fast'),(1,'slow'),
          (2,'key'),(2,'hash'),(2,'value'),
          (3,'window'),(3,'sort'),(3,'batch'),
          (4,'row'),(4,'line'),(4,'part'),
          (5,'query'),(5,'order'),(5,'the'))),
      tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      dld AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      st AS (SELECT count(*) AS n_docs,
          CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dld),
      post AS (SELECT term, doc_id, count(*) AS tf FROM tok
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
      dfv AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      sc AS (SELECT CAST(q.q_id AS BIGINT) AS q_id, p.doc_id,
          CAST(floor(
            ((st.n_docs - v.df + 0.5) / (v.df + 0.5)) *
            ((CAST(p.tf AS DOUBLE) * 2.2) /
             (CAST(p.tf AS DOUBLE) + 1.2 *
              (0.25 + 0.75 * CAST(d.dl AS DOUBLE) / st.avgdl))) *
            1e6) AS BIGINT) AS c
        FROM post p JOIN qt q USING (term) JOIN dfv v USING (term)
             JOIN dld d USING (doc_id), st),
      agg AS (SELECT q_id, doc_id, CAST(sum(c) AS BIGINT) AS score_fp
        FROM sc GROUP BY 1, 2),
      rel AS (SELECT CAST(q.q_id AS BIGINT) AS q_id, p.doc_id,
          least(sum(p.tf), 20)::BIGINT AS rel
        FROM post p JOIN qt q USING (term) GROUP BY 1, 2),
      ranked AS (SELECT a.q_id, r.rel,
          row_number() OVER (PARTITION BY a.q_id
            ORDER BY a.score_fp DESC, a.doc_id) AS rank
        FROM agg a JOIN rel r ON a.q_id = r.q_id AND a.doc_id = r.doc_id),
      dcg AS (SELECT q_id,
          sum(($gainsSql[rel + 1])::BIGINT * $discSql[rank])::BIGINT AS dcg_fp
        FROM ranked WHERE rank <= 10 GROUP BY 1),
      ideal AS (SELECT q_id, rel,
          row_number() OVER (PARTITION BY q_id
            ORDER BY rel DESC, doc_id) AS irank FROM rel),
      idcg AS (SELECT q_id,
          sum(($gainsSql[rel + 1])::BIGINT * $discSql[irank])::BIGINT AS idcg_fp
        FROM ideal WHERE irank <= 10 GROUP BY 1)
      SELECT d.q_id, d.dcg_fp, i.idcg_fp,
        d.dcg_fp * 1000000 // i.idcg_fp AS ndcg_fp
      FROM dcg d JOIN idcg i USING (q_id) ORDER BY q_id""",
    // kappa over the same preds CTE as c07; HUGEINT carry on the
    // N²-scale terms mirrors the Spark decimal(38,0) div exactly
    // the c09 predictor replay, a third systematically-degraded rater,
    // and the nominal-alpha integer sums; HUGEINT carries the final
    // ratio (both cross terms exceed int64 at 26x)
    "c22_krippendorff" ->
      """WITH preds AS (
           SELECT doc_id, lang AS actual_lang,
             CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                  WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                  ELSE 'zh' END AS pred_lang
           FROM (SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
             greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
             FROM (SELECT doc_id, lang,
               len(list_filter(toks, t -> t IN ('table','key','hash')))::BIGINT AS s_de,
               len(list_filter(toks, t -> t IN ('the','a','fast','slow')))::BIGINT AS s_en,
               len(list_filter(toks, t -> t IN ('data','row','scan')))::BIGINT AS s_es,
               len(list_filter(toks, t -> t IN ('order','query','value')))::BIGINT AS s_fr,
               len(list_filter(toks, t -> t IN ('spark','join','merge')))::BIGINT AS s_zh
               FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents)))),
         rated AS (SELECT doc_id, actual_lang AS r1, pred_lang AS r2,
             CASE WHEN doc_id % 3 = 0 THEN pred_lang
                  ELSE actual_lang END AS r3
           FROM preds),
         tot AS (SELECT count(*)::BIGINT AS n_units,
             sum(CASE WHEN r1 = r2 AND r2 = r3 THEN 0
                      WHEN r1 <> r2 AND r2 <> r3 AND r1 <> r3 THEN 6
                      ELSE 4 END)::BIGINT AS do_int
           FROM rated),
         cats AS (SELECT c, count(*)::BIGINT AS n_c FROM (
             SELECT unnest([r1, r2, r3]) AS c FROM rated) GROUP BY c),
         de AS (SELECT sum(n_c * (3 * t.n_units - n_c))::BIGINT AS de_int
           FROM cats, tot t)
         SELECT n_units, do_int, de_int,
           CAST(((2 * de_int::HUGEINT
               - do_int::HUGEINT * (3 * n_units - 1)) * 1000000)
             // (2 * de_int::HUGEINT) AS BIGINT) AS alpha_fp
         FROM tot, de""",
    "c09_kappa_agreement" ->
      """WITH preds AS (
           SELECT doc_id, lang AS actual_lang,
             CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                  WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                  ELSE 'zh' END AS pred_lang
           FROM (SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
             greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
             FROM (SELECT doc_id, lang,
               len(list_filter(toks, t -> t IN ('table','key','hash')))::BIGINT AS s_de,
               len(list_filter(toks, t -> t IN ('the','a','fast','slow')))::BIGINT AS s_en,
               len(list_filter(toks, t -> t IN ('data','row','scan')))::BIGINT AS s_es,
               len(list_filter(toks, t -> t IN ('order','query','value')))::BIGINT AS s_fr,
               len(list_filter(toks, t -> t IN ('spark','join','merge')))::BIGINT AS s_zh
               FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents)))),
         ba AS (SELECT actual_lang AS cls, count(*)::BIGINT AS support,
             sum(CASE WHEN pred_lang = actual_lang THEN 1 ELSE 0 END)::BIGINT AS tp
           FROM preds GROUP BY 1),
         bp AS (SELECT pred_lang AS cls, count(*)::BIGINT AS n_pred
           FROM preds GROUP BY 1),
         per AS (SELECT coalesce(ba.cls, bp.cls) AS cls,
             coalesce(support, 0) AS support, coalesce(tp, 0) AS tp,
             coalesce(n_pred, 0) AS n_pred
           FROM ba FULL OUTER JOIN bp ON ba.cls = bp.cls),
         tot AS (SELECT sum(support)::BIGINT AS n, sum(tp)::BIGINT AS agree,
             sum(support * n_pred)::BIGINT AS chance FROM per)
         SELECT n, agree, chance,
           agree * 1000000 // n AS po_fp,
           CAST(chance::HUGEINT * 1000000 // (n::HUGEINT * n) AS BIGINT)
             AS pe_fp,
           CAST((n::HUGEINT * agree - chance) * 1000000
             // (n::HUGEINT * n - chance) AS BIGINT) AS kappa_fp
         FROM tot""",
    "c07_langid_eval" ->
      """WITH preds AS (
           SELECT doc_id, lang AS actual_lang,
             CASE WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
                  WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr'
                  ELSE 'zh' END AS pred_lang
           FROM (SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
             greatest(s_de, s_en, s_es, s_fr, s_zh) AS best
             FROM (SELECT doc_id, lang,
               len(list_filter(toks, t -> t IN ('table','key','hash')))::BIGINT AS s_de,
               len(list_filter(toks, t -> t IN ('the','a','fast','slow')))::BIGINT AS s_en,
               len(list_filter(toks, t -> t IN ('data','row','scan')))::BIGINT AS s_es,
               len(list_filter(toks, t -> t IN ('order','query','value')))::BIGINT AS s_fr,
               len(list_filter(toks, t -> t IN ('spark','join','merge')))::BIGINT AS s_zh
               FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents)))),
         ba AS (SELECT actual_lang AS cls, count(*)::BIGINT AS support,
             sum(CASE WHEN pred_lang = actual_lang THEN 1 ELSE 0 END)::BIGINT AS tp
           FROM preds GROUP BY 1),
         bp AS (SELECT pred_lang AS cls, count(*)::BIGINT AS n_pred
           FROM preds GROUP BY 1),
         per AS (SELECT coalesce(ba.cls, bp.cls) AS cls,
             coalesce(support, 0) AS support, coalesce(tp, 0) AS tp,
             coalesce(n_pred, 0) - coalesce(tp, 0) AS fp,
             coalesce(support, 0) - coalesce(tp, 0) AS fn
           FROM ba FULL OUTER JOIN bp ON ba.cls = bp.cls),
         met AS (SELECT cls, support, tp, fp, fn,
             CASE WHEN tp + fp = 0 THEN 0
               ELSE tp * 1000000 // (tp + fp) END AS prec_fp,
             CASE WHEN support = 0 THEN 0
               ELSE tp * 1000000 // support END AS rec_fp,
             CASE WHEN tp * 2 + fp + fn = 0 THEN 0
               ELSE tp * 2000000 // (tp * 2 + fp + fn) END AS f1_fp
           FROM per)
         SELECT cls, support, tp, fp, fn, prec_fp, rec_fp, f1_fp FROM met
         UNION ALL
         SELECT '~macro', sum(support)::BIGINT, sum(tp)::BIGINT,
           sum(fp)::BIGINT, sum(fn)::BIGINT,
           sum(prec_fp)::BIGINT // count(*),
           sum(rec_fp)::BIGINT // count(*),
           sum(f1_fp)::BIGINT // count(*)
         FROM met ORDER BY cls""",
    // decile = (rank-1)*10 // n; all-integer bin stats (both engines'
    // integer division truncates toward zero, incl. negative score sums)
    // rank-percentile prob + label-parity outcome; every division is
    // integer floor (// — both operands non-negative) at the scales the
    // Spark side uses (1e6 probs, 1e3 squared terms)
    "c14_brier_decomposition" ->
      """WITH sc AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
           CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) AS s_fp
         FROM embeddings),
       r AS (SELECT y, s_fp,
           row_number() OVER (ORDER BY s_fp, vec_id) AS rn,
           count(*) OVER () AS n_tot
         FROM sc),
       b AS (SELECT y,
           CAST((rn - 1) * 1000000 // greatest(n_tot - 1, 1) AS BIGINT)
             AS p_fp
         FROM r),
       c AS (SELECT y, p_fp, p_fp // 1000 AS q3,
           p_fp * 10 // 1000001 AS bin FROM b),
       g AS (SELECT bin, count(*)::BIGINT AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(p_fp) AS BIGINT) AS psum,
           CAST(sum(q3) AS BIGINT) AS qsum,
           CAST(sum((q3 - y * 1000) * (q3 - y * 1000)) AS BIGINT) AS sesum
         FROM c GROUP BY bin)
       SELECT bin, n, n_pos,
         psum // n AS mean_p_fp,
         (n_pos * 1000000) // n AS pos_rate_fp,
         sesum // n AS brier_x6,
         ((qsum // n) - ((n_pos * 1000) // n))
           * ((qsum // n) - ((n_pos * 1000) // n)) AS rel_x6
       FROM g ORDER BY bin""",
    // c06's scorer ranked by |score| desc: the cumulative error rate
    // at each coverage decile is the selective-risk curve
    "c21_risk_coverage" ->
      """WITH sc AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
           CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) AS s_fp
         FROM embeddings),
       r AS (SELECT y, s_fp,
           row_number() OVER (ORDER BY abs(s_fp) DESC, vec_id) AS rn,
           count(*) OVER () AS n_tot
         FROM sc),
       d AS (SELECT CAST((rn - 1) * 10 // n_tot AS BIGINT) AS decile,
           count(*)::BIGINT AS n,
           sum(CASE WHEN (s_fp > 0) <> (y = 1) THEN 1 ELSE 0 END)::BIGINT
             AS err
         FROM r GROUP BY 1)
       SELECT decile, n, err,
         sum(n) OVER (ORDER BY decile)::BIGINT AS cum_n,
         sum(err) OVER (ORDER BY decile)::BIGINT AS cum_err,
         ((sum(err) OVER (ORDER BY decile)) * 1000000000
           // (sum(n) OVER (ORDER BY decile)))::BIGINT AS risk_fp
       FROM d ORDER BY decile""",
    // ECE/MCE over the same scorer CTE as c06; the per-bin identity
    // |mean_p - rate|*n = |sum_p - pos*1e9| keeps the fold exact
    "c23_calibration_error" ->
      """WITH sc AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
           CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) AS s_fp
         FROM embeddings),
       r AS (SELECT y, s_fp,
           row_number() OVER (ORDER BY s_fp, vec_id) AS rn,
           count(*) OVER () AS n_tot
         FROM sc),
       b AS (SELECT CAST((rn - 1) * 10 // n_tot AS BIGINT) AS decile, y,
           (rn * 1000000000) // (n_tot + 1) AS p_fp FROM r),
       bins AS (SELECT decile, count(*) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(p_fp) AS BIGINT) AS psum_fp
         FROM b GROUP BY decile),
       g AS (SELECT *, abs(psum_fp - n_pos * 1000000000) AS abs_gap_fp
         FROM bins),
       t AS (SELECT CAST(sum(abs_gap_fp) // sum(n) AS BIGINT) AS ece_fp,
           CAST(max(abs_gap_fp // n) AS BIGINT) AS mce_fp FROM g)
       SELECT g.decile, g.n, g.n_pos, g.psum_fp,
         CAST(g.abs_gap_fp AS BIGINT) AS abs_gap_fp, t.ece_fp, t.mce_fp
       FROM g, t ORDER BY g.decile""",
    "c06_calibration_bins" ->
      """WITH sc AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
           CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) AS s_fp
         FROM embeddings),
       r AS (SELECT y, s_fp,
           row_number() OVER (ORDER BY s_fp, vec_id) AS rn,
           count(*) OVER () AS n_tot
         FROM sc),
       b AS (SELECT CAST((rn - 1) * 10 // n_tot AS BIGINT) AS decile,
           y, s_fp FROM r)
       SELECT decile, count(*) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST((sum(y) * 1000000000) // count(*) AS BIGINT) AS pos_rate_fp,
         CAST(CAST(sum(s_fp) AS BIGINT) // count(*) AS BIGINT)
           AS mean_score_fp
       FROM b GROUP BY decile ORDER BY decile""",
    // midrank Mann-Whitney in exact integers: row_number in score order,
    // tie groups by score, 2×midrank = 2·minrank + cnt − 1
    "c05_auc_rank" ->
      """WITH sc AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
           CAST(floor(1e6 * list_reduce(list_transform(range(1, 65),
             i -> (embedding[i]::DOUBLE) *
               (CASE WHEN i * 2654435761 // 65536 % 2 = 1
                THEN 1.0 ELSE -1.0 END)),
             (p, q) -> p + q)) AS BIGINT) AS s_fp
         FROM embeddings),
       r AS (SELECT y, s_fp,
           row_number() OVER (ORDER BY s_fp, vec_id) AS rn FROM sc),
       g AS (SELECT s_fp, min(rn) AS mr, count(*) AS cnt, sum(y) AS n1g
         FROM r GROUP BY s_fp),
       t AS (SELECT CAST(sum(n1g * (2 * mr + cnt - 1)) AS BIGINT)
           AS sum_r2 FROM g),
       n AS (SELECT CAST(sum(y) AS BIGINT) AS n1,
           CAST(count(*) - sum(y) AS BIGINT) AS n0 FROM sc)
       SELECT n1, n0,
         sum_r2 - n1 * (n1 + 1) AS auc_num,
         n1 * n0 * 2 AS auc_den,
         CAST(((sum_r2 - n1 * (n1 + 1)) * 1000000000)
           // (n1 * n0 * 2) AS BIGINT) AS auc_fp
       FROM t, n""",
    // exact-integer sufficient-statistics replay; HUGEINT `//` and
    // Spark's decimal `div` both truncate toward zero
    "c04_ols_suffstats" ->
      """WITH b AS (SELECT l_returnflag AS flag,
           CAST(year(l_shipdate) AS BIGINT) AS yr,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(floor(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem),
       a AS (SELECT flag, yr, count(*) AS n,
           sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sx2
         FROM b GROUP BY 1, 2),
       m AS (SELECT flag, yr, n, sx, sy,
           CAST(n AS HUGEINT) * sxy - sx * sy AS num,
           CAST(n AS HUGEINT) * sx2 - sx * sx AS den
         FROM a)
       SELECT flag, yr, n,
         CAST((num * 1000000) // den AS BIGINT) AS slope_fp,
         CAST((sy * 1000000 - ((num * 1000000) // den) * sx) // n AS BIGINT)
           AS intercept_fp,
         CAST((sx * 1000000) // n AS BIGINT) AS mx_fp,
         CAST((sy * 1000000) // n AS BIGINT) AS my_fp
       FROM m ORDER BY flag, yr""",
    "c01_kmeans_embeddings" -> c01Sql,
    "c03_pca_power" -> pcaSql,
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
