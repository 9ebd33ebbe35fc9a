package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{ArrayPrimitives => AP, Numeric, Stats}
import graft.sources.BinaryCodec

/** The reference's array-primitive surface (SURVEY.md §2.6) exercised as
  * oracle-checked queries over the `embeddings` table (64-dim float
  * vectors = the "measure" implicit-dim array).
  *
  * Determinism notes: float→double casts are exact; elementwise +,-,*,/,
  * sqrt, abs are IEEE-correctly-rounded and thus bit-identical between
  * the JVM and DuckDB; in-array reductions left-fold in both engines;
  * across-row sums use fixed-point longs (see [[ArrayAggregates]]).
  * Transcendental-function outputs (FFT) are rounded to 3 decimals on
  * both sides.
  *
  * Output shape note: the driver's comparator hashes pandas cell values,
  * where list cells are unhashable — so every array-valued OUTPUT column
  * is serialized to a comma-joined fixed-point string ([[AP.fx12]] /
  * [[AP.joinLongs]]) with the byte-identical DuckDB mirror in the oracle.
  * The compute underneath stays native `array<double>` end to end; only
  * the final SELECT serializes.
  */
object ArrayQueries {

  /** DuckDB mirror of [[AP.fx12]]. */
  private def FX(e: String): String =
    s"coalesce(array_to_string(list_transform(($e), v -> CAST(floor(v * 1e12) AS BIGINT)), ','), '')"

  /** DuckDB mirror of [[AP.joinLongs]] (coalesce: DuckDB's
    * array_to_string returns NULL on an empty list; concat_ws gives ''). */
  private def LS(e: String): String = s"coalesce(array_to_string(($e), ','), '')"

  /** embeddings.embedding as array<double> (exact widening). */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("a", col("embedding").cast("array<double>"))

  /** a01 — scalar arithmetic over the array (oph_mul_scalar:241,
    * oph_sum_scalar:333, oph_math:221 'square'). */
  def a01_scalar_math(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(AP.oph_sum_scalar(AP.oph_mul_scalar(col("a"), 2.0), 1.0)).as("arr"),
      AP.fx12(AP.oph_math(col("a"), "square")).as("sq"))
      .orderBy("vec_id")

  /** a02 — two-array elementwise ops (oph_sum_array:329, oph_div_array:73,
    * oph_operation_array:253) pairing the array with its reverse. */
  def a02_pairwise(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(AP.oph_sum_array(col("a"), reverse(col("a")))).as("arr"),
      AP.fx12(AP.oph_div_array(col("a"),
        transform(col("a"), x => abs(x) + 1.0))).as("arr2"))
      .orderBy("vec_id")

  /** a03 — blockwise in-array reduction (oph_reduce:285): 64→8 block
    * avg/max, plus total sum (blockSize = whole array). */
  def a03_reduce(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(AP.oph_reduce(col("a"), "avg", 8)).as("avg8"),
      AP.fx12(AP.oph_reduce(col("a"), "max", 8)).as("max8"),
      AP.fx12(AP.oph_reduce(col("a"), "sum", 64)).as("sum_all"))
      .orderBy("vec_id")

  /** a04 — subsetting (oph_get_subarray2:105 subset-string '1:3:end',
    * oph_extract:89, oph_get_subarray:101). */
  def a04_subset(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(AP.oph_get_subarray2(col("a"), "1:3:end")).as("sub"),
      AP.fx12(AP.oph_extract(col("a"), Seq(1, 5, 9))).as("picked"),
      AP.fx12(AP.oph_get_subarray(col("a"), 10, 5)).as("sl"))
      .orderBy("vec_id")

  /** a05 — reshaping (oph_reverse:301, oph_rotate:309, oph_padding:265,
    * oph_shift:317, oph_sequence:313). */
  def a05_reshape(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(AP.oph_rotate(AP.oph_reverse(col("a")), 5)).as("rot"),
      AP.fx12(AP.oph_padding(AP.oph_get_subarray(col("a"), 1, 3), 6, -1.0)).as("pad"),
      AP.fx12(AP.oph_shift(col("a"), 3, 0.0)).as("shifted"),
      AP.fx12(AP.oph_sequence(0.0, 0.5, 5)).as("seq"))
      .orderBy("vec_id")

  /** a06 — predicates & masks (oph_predicate:273, oph_filter:153,
    * oph_get_index_array:97). */
  def a06_predicate(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(AP.oph_predicate(col("a"), x => x, "<", _ => lit(0.0), x => x)).as("clip"),
      size(AP.oph_filter(col("a"), _ > 0.0)).cast("long").as("npos"),
      AP.joinLongs(AP.oph_get_index_array(col("a"), _ > 0.2).cast("array<bigint>")).as("idxs"))
      .orderBy("vec_id")

  /** a07 — per-array statistics (oph_gsl_stats:193 subset, oph_gsl_sd:181;
    * GSL n-1 conventions; see Stats). */
  def a07_stats(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      Stats.mean(col("a")).as("mean"),
      Stats.variance(col("a")).as("var"),
      Stats.oph_gsl_sd(col("a")).as("sd"),
      Stats.absdev(col("a")).as("absdev"),
      array_min(col("a")).as("mn"),
      array_max(col("a")).as("mx"))
      .orderBy("vec_id")

  /** a08 — prefix ops (oph_accumulate:5 UDF scan, oph_deaccumulate:69). */
  def a08_accumulate(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(Numeric.oph_accumulate(col("a"))).as("acc"),
      AP.fx12(Stats.oph_deaccumulate(col("a"))).as("deacc"))
      .orderBy("vec_id")

  /** a09 — quantiles (oph_gsl_quantile:177, GSL interpolation),
    * histogram (oph_gsl_histogram:165), boxplot (oph_gsl_boxplot:113). */
  def a09_quantile_hist(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(Stats.oph_gsl_quantile(col("a"), Seq(0.25, 0.5, 0.75))).as("quart"),
      AP.joinLongs(Stats.oph_gsl_histogram(col("a"), 8, -0.5, 0.5)).as("hist"),
      AP.fx12(Stats.oph_gsl_boxplot(col("a"))).as("box"))
      .orderBy("vec_id")

  /** a10 — across-row elementwise aggregation (oph_aggregate_operator:9)
    * via partial+final Aggregator with exact fixed-point sums; elementwise
    * min is exact on raw doubles. */
  def a10_agg_elementwise(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("scaled",
        transform(col("a"), x => floor(x * 1e9).cast("long")))
      .groupBy("label")
      .agg(ArrayAggregates.ewSumLong(col("scaled")).as("raw_sum"),
        ArrayAggregates.ewMinDouble(col("a")).as("raw_min"),
        count(lit(1)).as("n"))
      .select(col("label"),
        AP.joinLongs(col("raw_sum")).as("vec_sum_scaled"),
        AP.fx12(col("raw_min")).as("vec_min"),
        col("n"))
      .orderBy("label")

  /** a11 — oph_roll_up:305 (dimension demotion): concatenate the group's
    * arrays in id order into one long array. */
  def a11_rollup(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < 40)
      .groupBy("label")
      .agg(AP.fx12(flatten(transform(
        array_sort(collect_list(struct(col("vec_id"), col("a")))),
        p => p.getField("a")))).as("merged"))
      .orderBy("label")

  /** a12 — oph_expand:81 (dimension promotion): array → one row per
    * element with a 1-based position key (posexplode). */
  def a12_expand(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id"), posexplode(col("a")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("val"))
      .orderBy("vec_id", "pos")

  /** a13 — index remapping: oph_permute:269 (8×8 transpose within the
    * row-major array) + oph_interlace:209 of the two halves. */
  def a13_permute_interlace(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(AP.oph_permute(col("a"), Seq(8, 8), Seq(1, 0))).as("trans"),
      AP.fx12(AP.oph_interlace(AP.oph_get_subarray(col("a"), 1, 32),
        AP.oph_get_subarray(col("a"), 33, 32))).as("inter"))
      .orderBy("vec_id")

  /** a14 — oph_gsl_fft:149 via JTransforms; oracle is a naive SQL DFT,
    * both sides rounded to 3 decimals (the identical rounded double
    * then fixed-point-serializes identically). */
  def a14_fft(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < 100)
      .select(col("vec_id"),
        AP.fx12(transform(Numeric.oph_gsl_fft(col("a")), x => round(x, 3))).as("fft"))
      .orderBy("vec_id")

  /** a15 — packed-binary codec fidelity (oph-lib-binary-io.h:61-68):
    * pack→unpack roundtrip must be identity; dump as exact integers
    * (oph_dump:77). */
  def a15_codec(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      when(BinaryCodec.oph_from_bin(BinaryCodec.oph_to_bin(col("a"))) === col("a"), 1L)
        .otherwise(0L).as("roundtrip_ok"),
      AP.oph_dump(
        transform(col("a"), x => floor(x * 1000).cast("long")), ",").as("dump"))
      .orderBy("vec_id")

  /** a16 — multi-dim in-array ops: oph_reduce3:293 (reduce one dim of the
    * row-major 8×8 array) and oph_get_subarray3:109 (per-dim subsets). */
  def a16_multidim(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(AP.oph_reduce3(col("a"), "sum", Seq(8, 8), dim = 0)).as("colsum"),
      AP.fx12(AP.oph_get_subarray3(col("a"), Seq(8, 8), Seq("1:2", "3:4"))).as("block"))
      .orderBy("vec_id")

  /** a17 — smoothing & scaling (oph_moving_avg:233 SMA, oph_normalize:249
    * 'max', oph_quantize:281, oph_replace:297). */
  def a17_smooth_scale(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(Stats.oph_moving_avg(col("a"), 5)).as("sma5"),
      AP.fx12(Stats.oph_normalize(col("a"), "max")).as("nmax"),
      AP.fx12(Stats.oph_quantize(col("a"), Seq(-0.1, 0.0, 0.1))).as("quant"),
      AP.fx12(AP.oph_replace(col("a"), 0.0, -999.0)).as("repl"))
      .orderBy("vec_id")

  /** a18 — complex-array helpers over interleaved (re, im) pairs
    * (oph_gsl_complex_get_real:129/imag:125/abs:117): the first 16
    * elements as 8 complex numbers. (arg/polar use atan2/cos which differ
    * by 1 ulp between libm and the JVM — covered by unit tests instead.) */
  def a18_complex(s: SparkSession, dir: String): DataFrame = {
    val c16 = AP.oph_get_subarray(col("a"), 1, 16)
    emb(s, dir).select(col("vec_id"),
      AP.fx12(Stats.oph_gsl_complex_get_real(c16)).as("re"),
      AP.fx12(Stats.oph_gsl_complex_get_imag(c16)).as("im"),
      AP.fx12(Stats.oph_gsl_complex_get_abs(c16)).as("mod"))
      .orderBy("vec_id")
  }

  /** a19 — per-row least-squares fit (oph_gsl_fit_linear_coeff:161) of
    * the measure against the index axis 1..64, plus Pearson correlation
    * with the reversed array (oph_gsl_correlation:141). Only add, mul,
    * div and sqrt: exact across engines. */
  def a19_fit_corr(s: SparkSession, dir: String): DataFrame = {
    val x = AP.oph_sequence(1.0, 1.0, 64)
    emb(s, dir).select(col("vec_id"),
      AP.fx12(Stats.oph_gsl_fit_linear_coeff(x, col("a"))).as("fit"),
      Stats.oph_gsl_correlation(col("a"), reverse(col("a"))).as("corr_rev"))
      .orderBy("vec_id")
  }

  /** a20 — one Haar DWT level (oph_gsl_dwt:145; /√2 is IEEE-exact both
    * engines), in-array sort (oph_gsl_sort:185), and a cast with a
    * missing-value map (oph_cast:33): negatives → -1 sentinel then long
    * floor-scale. */
  def a20_dwt_sort_cast(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.fx12(Numeric.oph_gsl_dwt(col("a"))).as("dwt"),
      AP.fx12(Stats.oph_gsl_sort(col("a"))).as("sorted"),
      AP.joinLongs(AP.oph_cast(
        AP.oph_replace(col("a"), 0.0, -999.0), "oph_long")).as("cast_miss"))
      .orderBy("vec_id")

  /** a21 — search/compare/combine primitives: oph_find:93 (tolerance
    * count), oph_count_array:65, oph_size_array:321, oph_compare:41 (vs
    * the reversed array), oph_mask_array:217 (positive mask, -999 fill),
    * oph_concat:49 with a generated sequence, oph_extend:85 (×3). */
  def a21_find_mask_concat(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"),
      AP.oph_find(col("a"), 0.1, 0.05).as("n_near"),
      AP.oph_count_array(col("a")).as("n_valid"),
      AP.oph_size_array(col("a")).as("n_elems"),
      AP.oph_compare(col("a"), reverse(col("a"))).as("is_palin"),
      AP.fx12(AP.oph_mask_array(col("a"),
        transform(col("a"), x => (x > 0.0).cast("double")), -999.0)).as("masked"),
      AP.fx12(AP.oph_concat(AP.oph_get_subarray(col("a"), 1, 4),
        AP.oph_sequence(1.0, 1.0, 4))).as("cat"),
      AP.fx12(AP.oph_extend(AP.oph_get_subarray(col("a"), 1, 2), 3)).as("ext"))
      .orderBy("vec_id")

  /** a22 — typed binary codec round trips (oph_server_utility.h:35-48,
    * oph-lib-binary-io.h:61-68): cells packed in the reference's
    * little-endian C layout per element type and unpacked back. float
    * narrows precision ((double)(float)x), the integer types truncate
    * toward zero (C cast), and bit collapses to one 0/1 char per value
    * (oph_server_utility.c:295 — the reference does not bit-pack). */
  def a22_typed_codec(s: SparkSession, dir: String): DataFrame = {
    def rt(a: Column, t: String): Column =
      BinaryCodec.oph_from_bin_typed(BinaryCodec.oph_to_bin_typed(a, lit(t)), lit(t))
    val scaled = transform(col("a"), _ * 100.0) // ±58 → in range for byte..long
    emb(s, dir).select(col("vec_id"),
      AP.fx12(rt(col("a"), "float")).as("m_float"),
      AP.fx12(rt(col("a"), "double")).as("m_double"),
      AP.joinLongs(transform(rt(scaled, "int"), _.cast("long"))).as("m_int"),
      AP.joinLongs(transform(rt(scaled, "short"), _.cast("long"))).as("m_short"),
      AP.joinLongs(transform(rt(scaled, "byte"), _.cast("long"))).as("m_byte"),
      AP.joinLongs(transform(rt(scaled, "long"), _.cast("long"))).as("m_long"),
      AP.joinLongs(transform(rt(col("a"), "bit"), _.cast("long"))).as("m_bit"),
      // exact 64-bit route (packLongs/unpackLongs, no double anywhere):
      // 2^53+1 is unrepresentable as a double, so any double intermediate
      // would come back ...992 and hash-mismatch the oracle
      AP.joinLongs(BinaryCodec.oph_from_bin_long(BinaryCodec.oph_to_bin_long(
        array(lit(9007199254740993L) + col("vec_id").cast("long"),
          lit(-9007199254740995L) - col("vec_id").cast("long")))))
        .as("m_long_exact"))
      .orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a22_typed_codec" -> (a22_typed_codec _),
    "a21_find_mask_concat" -> (a21_find_mask_concat _),
    "a20_dwt_sort_cast" -> (a20_dwt_sort_cast _),
    "a16_multidim" -> (a16_multidim _),
    "a17_smooth_scale" -> (a17_smooth_scale _),
    "a18_complex" -> (a18_complex _),
    "a19_fit_corr" -> (a19_fit_corr _),
    "a01_scalar_math" -> (a01_scalar_math _),
    "a02_pairwise" -> (a02_pairwise _),
    "a03_reduce" -> (a03_reduce _),
    "a04_subset" -> (a04_subset _),
    "a05_reshape" -> (a05_reshape _),
    "a06_predicate" -> (a06_predicate _),
    "a07_stats" -> (a07_stats _),
    "a08_accumulate" -> (a08_accumulate _),
    "a09_quantile_hist" -> (a09_quantile_hist _),
    "a10_agg_elementwise" -> (a10_agg_elementwise _),
    "a11_rollup" -> (a11_rollup _),
    "a12_expand" -> (a12_expand _),
    "a13_permute_interlace" -> (a13_permute_interlace _),
    "a14_fft" -> (a14_fft _),
    "a15_codec" -> (a15_codec _),
  )

  val oracles: Map[String, String] = Map(
    "a22_typed_codec" ->
      s"""SELECT vec_id,
         ${FX("list_transform(embedding, x -> x::DOUBLE)")} AS m_float,
         ${FX("list_transform(embedding, x -> x::DOUBLE)")} AS m_double,
         array_to_string(list_transform(embedding,
           x -> trunc(x::DOUBLE * 100.0)::BIGINT), ',') AS m_int,
         array_to_string(list_transform(embedding,
           x -> trunc(x::DOUBLE * 100.0)::BIGINT), ',') AS m_short,
         array_to_string(list_transform(embedding,
           x -> trunc(x::DOUBLE * 100.0)::BIGINT), ',') AS m_byte,
         array_to_string(list_transform(embedding,
           x -> trunc(x::DOUBLE * 100.0)::BIGINT), ',') AS m_long,
         array_to_string(list_transform(embedding,
           x -> CASE WHEN x::DOUBLE <> 0.0 THEN 1 ELSE 0 END), ',') AS m_bit,
         array_to_string(list_value(9007199254740993 + vec_id,
           -9007199254740995 - vec_id), ',') AS m_long_exact
         FROM embeddings ORDER BY vec_id""",
    "a21_find_mask_concat" ->
      s"""SELECT vec_id,
         len(list_filter(embedding, x -> abs(x::DOUBLE - 0.1) <= 0.05))::BIGINT AS n_near,
         len(list_filter(embedding, x -> NOT isnan(x::DOUBLE)))::BIGINT AS n_valid,
         len(embedding)::BIGINT AS n_elems,
         (CASE WHEN list_reduce(list_transform(range(1, 65), i ->
            CASE WHEN abs(embedding[i]::DOUBLE - embedding[65-i]::DOUBLE) <= 0.0
            THEN 1 ELSE 0 END), (x,y) -> x+y) = 64
          THEN 1 ELSE 0 END)::BIGINT AS is_palin,
         ${FX("""list_transform(embedding, x ->
           CASE WHEN x::DOUBLE > 0.0 THEN x::DOUBLE ELSE -999.0 END)""")} AS masked,
         ${FX("""list_transform(embedding[1:4], x -> x::DOUBLE) ||
           [1.0::DOUBLE, 2.0::DOUBLE, 3.0::DOUBLE, 4.0::DOUBLE]""")} AS cat,
         ${FX("""flatten(list_transform(embedding[1:2],
           x -> [x::DOUBLE, x::DOUBLE, x::DOUBLE]))""")} AS ext
         FROM embeddings ORDER BY vec_id""",
    "a20_dwt_sort_cast" ->
      s"""SELECT vec_id,
         ${FX("""list_transform(range(0, 64), k -> CASE WHEN k < 32
           THEN (embedding[2*k+1]::DOUBLE + embedding[2*k+2]::DOUBLE) / sqrt(2.0)
           ELSE (embedding[2*(k-32)+1]::DOUBLE - embedding[2*(k-32)+2]::DOUBLE) / sqrt(2.0) END)""")} AS dwt,
         ${FX("list_sort(list_transform(embedding, x -> x::DOUBLE))")} AS sorted,
         ${LS("""list_transform(embedding, x -> CAST(trunc(
           CASE WHEN abs(x::DOUBLE - 0.0) <= 0.0 THEN -999.0 ELSE x::DOUBLE END) AS BIGINT))""")} AS cast_miss
         FROM embeddings ORDER BY vec_id""",
    "a16_multidim" ->
      s"""SELECT vec_id,
         ${FX("""list_transform(range(0, 8), j ->
           list_reduce(list_transform(range(0, 8), k -> embedding[k*8 + j + 1]::DOUBLE),
             (x,y) -> x+y))""")} AS colsum,
         ${FX("list_transform([3, 4, 11, 12], i -> embedding[i]::DOUBLE)")} AS block
         FROM embeddings ORDER BY vec_id""",
    "a19_fit_corr" ->
      s"""SELECT vec_id,
         ${FX("""[(sy - ((64.0*sxy - sx*sy) / (64.0*sxx - sx*sx)) * sx) / 64.0,
          (64.0*sxy - sx*sy) / (64.0*sxx - sx*sx)]""")} AS fit,
         (64.0*sab - sa*sb) / (sqrt(64.0*saa - sa*sa) * sqrt(64.0*sbb - sb*sb)) AS corr_rev
         FROM (SELECT vec_id,
           list_reduce(list_transform(range(0, 64), i -> 1.0 + i::DOUBLE * 1.0), (p,q) -> p+q) AS sx,
           list_reduce(list_transform(embedding, y -> y::DOUBLE), (p,q) -> p+q) AS sy,
           list_reduce(list_transform(range(0, 64), i -> (1.0 + i::DOUBLE * 1.0) * (1.0 + i::DOUBLE * 1.0)), (p,q) -> p+q) AS sxx,
           list_reduce(list_transform(range(1, 65), i -> (1.0 + (i-1)::DOUBLE * 1.0) * embedding[i]::DOUBLE), (p,q) -> p+q) AS sxy,
           list_reduce(list_transform(embedding, y -> y::DOUBLE), (p,q) -> p+q) AS sa,
           -- b = reverse(a): folds run in REVERSED element order (the
           -- Spark side folds dsum(reverse(a)), order changes last bits)
           list_reduce(list_transform(range(1, 65), i -> embedding[65-i]::DOUBLE), (p,q) -> p+q) AS sb,
           list_reduce(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE), (p,q) -> p+q) AS saa,
           list_reduce(list_transform(range(1, 65), i -> embedding[65-i]::DOUBLE * embedding[65-i]::DOUBLE), (p,q) -> p+q) AS sbb,
           list_reduce(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * embedding[65-i]::DOUBLE), (p,q) -> p+q) AS sab
           FROM embeddings) ORDER BY vec_id""",
    "a18_complex" ->
      s"""SELECT vec_id,
         ${FX("list_transform(range(0, 8), i -> embedding[2*i + 1]::DOUBLE)")} AS re,
         ${FX("list_transform(range(0, 8), i -> embedding[2*i + 2]::DOUBLE)")} AS im,
         ${FX("""list_transform(range(0, 8), i -> sqrt(
           embedding[2*i + 1]::DOUBLE * embedding[2*i + 1]::DOUBLE +
           embedding[2*i + 2]::DOUBLE * embedding[2*i + 2]::DOUBLE))""")} AS mod
         FROM embeddings ORDER BY vec_id""",
    "a17_smooth_scale" ->
      s"""SELECT vec_id,
         ${FX("""list_transform(range(1, 65), i ->
           list_reduce(list_transform(embedding[greatest(1, i-4) : i], x -> x::DOUBLE),
             (x,y) -> x+y) / (i - greatest(1, i-4) + 1)::DOUBLE)""")} AS sma5,
         ${FX("""list_transform(embedding, x -> x::DOUBLE /
           list_max(list_transform(embedding, y -> abs(y::DOUBLE))))""")} AS nmax,
         ${FX("""list_transform(embedding, x -> CASE WHEN x::DOUBLE <= -0.1 THEN 0.0::DOUBLE
           WHEN x::DOUBLE <= 0.0 THEN 1.0::DOUBLE
           WHEN x::DOUBLE <= 0.1 THEN 2.0::DOUBLE ELSE 3.0::DOUBLE END)""")} AS quant,
         ${FX("""list_transform(embedding, x -> CASE WHEN abs(x::DOUBLE - 0.0) <= 0.0
           THEN -999.0::DOUBLE ELSE x::DOUBLE END)""")} AS repl
         FROM embeddings ORDER BY vec_id""",
    "a01_scalar_math" ->
      s"""SELECT vec_id,
         ${FX("list_transform(embedding, x -> x::DOUBLE * 2.0 + 1.0)")} AS arr,
         ${FX("list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)")} AS sq
         FROM embeddings ORDER BY vec_id""",
    "a02_pairwise" ->
      s"""SELECT vec_id,
         ${FX("list_transform(range(1, 65), i -> embedding[i]::DOUBLE + embedding[65 - i]::DOUBLE)")} AS arr,
         ${FX("list_transform(embedding, x -> x::DOUBLE / (abs(x::DOUBLE) + 1.0))")} AS arr2
         FROM embeddings ORDER BY vec_id""",
    "a03_reduce" ->
      s"""SELECT vec_id,
         ${FX("""list_transform(range(0, 8), b ->
           list_reduce(list_transform(embedding[b*8+1 : b*8+8], x -> x::DOUBLE), (x,y) -> x+y) / 8.0)""")} AS avg8,
         ${FX("list_transform(range(0, 8), b -> list_max(embedding[b*8+1 : b*8+8])::DOUBLE)")} AS max8,
         ${FX("[list_reduce(list_transform(embedding, x -> x::DOUBLE), (x,y) -> x+y)]")} AS sum_all
         FROM embeddings ORDER BY vec_id""",
    "a04_subset" ->
      s"""SELECT vec_id,
         ${FX("list_transform(range(1, 65, 3), i -> embedding[i]::DOUBLE)")} AS sub,
         ${FX("list_transform([1, 5, 9], i -> embedding[i]::DOUBLE)")} AS picked,
         ${FX("list_transform(embedding[10:14], x -> x::DOUBLE)")} AS sl
         FROM embeddings ORDER BY vec_id""",
    "a05_reshape" ->
      s"""SELECT vec_id,
         ${FX("list_transform(list_reverse(embedding)[60:64] || list_reverse(embedding)[1:59], x -> x::DOUBLE)")} AS rot,
         ${FX("list_transform(embedding[1:3], x -> x::DOUBLE) || [-1.0::DOUBLE, -1.0::DOUBLE, -1.0::DOUBLE]")} AS pad,
         ${FX("[0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE] || list_transform(embedding[1:61], x -> x::DOUBLE)")} AS shifted,
         ${FX("list_transform(range(0, 5), i -> 0.0::DOUBLE + i * 0.5::DOUBLE)")} AS seq
         FROM embeddings ORDER BY vec_id""",
    "a06_predicate" ->
      s"""SELECT vec_id,
         ${FX("list_transform(embedding, x -> CASE WHEN x::DOUBLE < 0.0 THEN 0.0::DOUBLE ELSE x::DOUBLE END)")} AS clip,
         len(list_filter(embedding, x -> x::DOUBLE > 0.0))::BIGINT AS npos,
         ${LS("list_filter(range(1, 65), i -> embedding[i]::DOUBLE > 0.2)")} AS idxs
         FROM embeddings ORDER BY vec_id""",
    "a07_stats" ->
      """SELECT vec_id, s1/64.0 AS mean,
         (s2 - s1*s1/64.0) / 63.0 AS var,
         sqrt((s2 - s1*s1/64.0) / 63.0) AS sd,
         list_reduce(list_transform(embedding, x -> abs(x::DOUBLE - s1/64.0)), (x,y) -> x+y) / 64.0 AS absdev,
         list_min(embedding)::DOUBLE AS mn, list_max(embedding)::DOUBLE AS mx
         FROM (SELECT vec_id, embedding,
           list_reduce(list_transform(embedding, x -> x::DOUBLE), (x,y) -> x+y) AS s1,
           list_reduce(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), (x,y) -> x+y) AS s2
           FROM embeddings) ORDER BY vec_id""",
    "a08_accumulate" ->
      s"""SELECT vec_id,
         ${FX("""list_transform(range(1, 65), i ->
           list_reduce(list_transform(embedding[1:i], x -> x::DOUBLE), (x,y) -> x+y))""")} AS acc,
         ${FX("""list_transform(range(1, 65), i ->
           CASE WHEN i = 1 THEN embedding[1]::DOUBLE
                ELSE embedding[i]::DOUBLE - embedding[i-1]::DOUBLE END)""")} AS deacc
         FROM embeddings ORDER BY vec_id""",
    "a09_quantile_hist" ->
      s"""SELECT vec_id,
         ${FX("""list_transform([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE], q ->
           s[(floor(q*63.0))::INT + 1] + (q*63.0 - floor(q*63.0)) *
             (s[least((floor(q*63.0))::INT + 2, 64)] - s[(floor(q*63.0))::INT + 1]))""")} AS quart,
         ${LS("""list_transform(range(0, 8), i ->
           len(list_filter(s, x -> x >= -0.5 + i * 0.125 AND x < -0.5 + (i+1) * 0.125))::BIGINT)""")} AS hist,
         ${FX("""[s[1],
          s[(floor(0.25*63.0))::INT + 1] + (0.25*63.0 - floor(0.25*63.0)) *
            (s[least((floor(0.25*63.0))::INT + 2, 64)] - s[(floor(0.25*63.0))::INT + 1]),
          s[(floor(0.5*63.0))::INT + 1] + (0.5*63.0 - floor(0.5*63.0)) *
            (s[least((floor(0.5*63.0))::INT + 2, 64)] - s[(floor(0.5*63.0))::INT + 1]),
          s[(floor(0.75*63.0))::INT + 1] + (0.75*63.0 - floor(0.75*63.0)) *
            (s[least((floor(0.75*63.0))::INT + 2, 64)] - s[(floor(0.75*63.0))::INT + 1]),
          s[64]]""")} AS box
         FROM (SELECT vec_id, list_sort(list_transform(embedding, x -> x::DOUBLE)) AS s
           FROM embeddings) ORDER BY vec_id""",
    "a10_agg_elementwise" ->
      s"""SELECT label,
         array_to_string(list(CAST(ssum AS BIGINT) ORDER BY i), ',') AS vec_sum_scaled,
         ${FX("list(emin ORDER BY i)")} AS vec_min,
         any_value(cnt) AS n
         FROM (SELECT label, i,
             sum(CAST(floor(embedding[i]::DOUBLE * 1e9) AS BIGINT)) AS ssum,
             min(embedding[i]::DOUBLE) AS emin,
             count(*) AS cnt
           FROM embeddings, range(1, 65) t(i) GROUP BY label, i)
         GROUP BY label ORDER BY label""",
    "a11_rollup" ->
      s"""SELECT label, ${FX("flatten(list(arr ORDER BY vec_id))")} AS merged
         FROM (SELECT label, vec_id, list_transform(embedding, x -> x::DOUBLE) AS arr
           FROM embeddings WHERE vec_id < 40)
         GROUP BY label ORDER BY label""",
    "a12_expand" ->
      """SELECT vec_id, i AS pos, embedding[i]::DOUBLE AS val
         FROM embeddings, range(1, 65) t(i) WHERE vec_id < 10
         ORDER BY vec_id, pos""",
    "a13_permute_interlace" ->
      s"""SELECT vec_id,
         ${FX("list_transform(range(0, 64), j -> embedding[((j//8) % 8) + 8*(j % 8) + 1]::DOUBLE)")} AS trans,
         ${FX("flatten(list_transform(range(1, 33), i -> [embedding[i]::DOUBLE, embedding[i+32]::DOUBLE]))")} AS inter
         FROM embeddings ORDER BY vec_id""",
    "a14_fft" ->
      s"""SELECT vec_id,
         ${FX("""flatten(list_transform(range(0, 64), k -> [
           round(list_reduce(list_transform(range(0, 64), n ->
             embedding[n+1]::DOUBLE * cos(2*pi()*k*n/64.0)), (x,y) -> x+y), 3),
           round(-list_reduce(list_transform(range(0, 64), n ->
             embedding[n+1]::DOUBLE * sin(2*pi()*k*n/64.0)), (x,y) -> x+y), 3)]))""")} AS fft
         FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""",
    "a15_codec" ->
      """SELECT vec_id, 1::BIGINT AS roundtrip_ok,
         array_to_string(list_transform(embedding,
           x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT)), ',') AS dump
         FROM embeddings ORDER BY vec_id""",
  )
}
