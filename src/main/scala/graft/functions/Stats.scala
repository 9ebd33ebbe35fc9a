package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistics / signal primitives over the implicit array (the reference's
  * GSL-backed `oph_gsl_*` family plus moving averages and prefix ops).
  *
  * All pure-Column (codegen-friendly). Heavier numeric kernels (FFT, DWT,
  * spline, k-means) live in [[Numeric]] as Scala UDFs over Array[Double].
  *
  * Statistical conventions follow GSL (the reference's backend):
  * variance/sd use the n-1 (sample) denominator; skew/kurtosis are the
  * (1/n)Σ((x-μ)/σ)^k estimators with σ the sample sd; quantiles use
  * linear interpolation at `q*(n-1)` over sorted data.
  */
object Stats {

  private def dsum(c: Column): Column = aggregate(c, lit(0.0), _ + _)
  private def n(a: Column): Column = size(a).cast(DoubleType)

  def mean(a: Column): Column = dsum(a) / n(a)

  /** Sample variance (n-1), GSL gsl_stats_variance. */
  def variance(a: Column): Column = {
    val s1 = dsum(a); val s2 = dsum(transform(a, x => x * x)); val m = n(a)
    (s2 - s1 * s1 / m) / (m - 1.0)
  }

  /** Sample standard deviation (oph_gsl_sd). */
  def oph_gsl_sd(a: Column): Column = sqrt(variance(a))

  /** Mean absolute deviation (GSL absdev). */
  def absdev(a: Column): Column = {
    val m = mean(a)
    dsum(transform(a, x => abs(x - m))) / n(a)
  }

  /** GSL skewness: (1/n)Σ((x-μ)/σ)³ with σ = sample sd. */
  def skew(a: Column): Column = {
    val m = mean(a); val sd = oph_gsl_sd(a)
    dsum(transform(a, x => pow((x - m) / sd, 3.0))) / n(a)
  }

  /** GSL excess kurtosis: (1/n)Σ((x-μ)/σ)⁴ − 3. */
  def kurtosis(a: Column): Column = {
    val m = mean(a); val sd = oph_gsl_sd(a)
    dsum(transform(a, x => pow((x - m) / sd, 4.0))) / n(a) - 3.0
  }

  /** Lag-1 autocorrelation (GSL gsl_stats_lag1_autocorrelation). */
  def lag1Autocorrelation(a: Column): Column = {
    val m = mean(a)
    val d = transform(a, x => x - m)
    val len = size(a)
    val num = dsum(zip_with(slice(d, lit(1), len - 1), slice(d, lit(2), len - 1), _ * _))
    num / dsum(transform(d, x => x * x))
  }

  /** Stats bundle by mask (oph_gsl_stats:193). Mask positions follow the
    * reference: mean, variance, std dev, abs dev, skew, kurtosis,
    * autocorrelation, min, max. Returns array of the selected stats. */
  def oph_gsl_stats(a: Column, mask: String = "111111111"): Column = {
    val all: Seq[(Char, Column)] = Seq(
      '1' -> mean(a), '1' -> variance(a), '1' -> oph_gsl_sd(a), '1' -> absdev(a),
      '1' -> skew(a), '1' -> kurtosis(a), '1' -> lag1Autocorrelation(a),
      '1' -> array_min(a), '1' -> array_max(a))
    val padded = mask.padTo(9, '0')
    val sel = all.zip(padded).collect { case ((_, c), '1') => c }
    array(sel: _*)
  }

  /** GSL quantile over sorted data: linear interpolation at q*(n-1).
    * (oph_gsl_quantile:177). */
  def quantileOfSorted(sorted: Column, q: Double): Column = {
    val len = size(sorted).cast(DoubleType)
    val pos = lit(q) * (len - 1.0)
    val lo = floor(pos).cast(IntegerType)
    val frac = pos - lo.cast(DoubleType)
    val vlo = element_at(sorted, lo + 1)
    val vhi = element_at(sorted, least(lo + 2, size(sorted)))
    vlo + frac * (vhi - vlo)
  }

  def oph_gsl_quantile(a: Column, qs: Seq[Double]): Column =
    // bindOnce: each quantile references the sorted array several times;
    // without the lambda binding the sort re-runs per reference.
    TextFunctions.bindOnce(array_sort(a), s =>
      array(qs.map(quantileOfSorted(s, _)): _*))

  /** 5-number summary [min, q1, median, q3, max] (oph_gsl_boxplot:113). */
  def oph_gsl_boxplot(a: Column): Column =
    TextFunctions.bindOnce(array_sort(a), s =>
      array(element_at(s, 1), quantileOfSorted(s, 0.25), quantileOfSorted(s, 0.5),
        quantileOfSorted(s, 0.75), element_at(s, size(s))))

  /** Histogram counts over [lo, hi) split into `bins` uniform bins
    * (GSL convention: x == hi falls outside). (oph_gsl_histogram:165). */
  def oph_gsl_histogram(a: Column, bins: Int, lo: Column, hi: Column): Column = {
    val w = (hi - lo) / bins.toDouble
    transform(sequence(lit(0), lit(bins - 1)), i => {
      val bLo = lo + i.cast(DoubleType) * w
      val bHi = lo + (i.cast(DoubleType) + 1.0) * w
      size(filter(a, x => x >= bLo && x < bHi)).cast(LongType)
    })
  }
  def oph_gsl_histogram(a: Column, bins: Int, lo: Double, hi: Double): Column =
    oph_gsl_histogram(a, bins, lit(lo), lit(hi))

  /** Sort the array (oph_gsl_sort:185). */
  def oph_gsl_sort(a: Column): Column = array_sort(a)

  /** Pearson correlation of two arrays (oph_gsl_correlation:141). */
  def oph_gsl_correlation(a: Column, b: Column): Column = {
    val m = n(a)
    val sa = dsum(a); val sb = dsum(b)
    val saa = dsum(transform(a, x => x * x)); val sbb = dsum(transform(b, x => x * x))
    val sab = dsum(zip_with(a, b, _ * _))
    (m * sab - sa * sb) / (sqrt(m * saa - sa * sa) * sqrt(m * sbb - sb * sb))
  }

  /** Least-squares line fit of y over x → [c0, c1] (intercept, slope)
    * (oph_gsl_fit_linear_coeff:161). */
  def oph_gsl_fit_linear_coeff(x: Column, y: Column): Column = {
    val m = n(x)
    val sx = dsum(x); val sy = dsum(y)
    val sxx = dsum(transform(x, v => v * v)); val sxy = dsum(zip_with(x, y, _ * _))
    val c1 = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val c0 = (sy - c1 * sx) / m
    array(c0, c1)
  }

  /** Fitted values of the least-squares line over x (oph_gsl_fit_linear:157). */
  def oph_gsl_fit_linear(x: Column, y: Column): Column = {
    val c = oph_gsl_fit_linear_coeff(x, y)
    transform(x, v => element_at(c, 1) + element_at(c, 2) * v)
  }

  /** Simple moving average with window k; leading elements use the partial
    * window (oph_moving_avg:233, type 'SMA'). */
  def oph_moving_avg(a: Column, k: Int): Column =
    transform(sequence(lit(1), size(a)), i => {
      val start = greatest(lit(1), i - (k - 1))
      val w = slice(a, start, i - start + 1)
      dsum(w) / size(w).cast(DoubleType)
    })

  /** Weighted moving average (linearly decaying weights over window k). */
  def oph_moving_avg_weighted(a: Column, k: Int): Column =
    transform(sequence(lit(1), size(a)), i => {
      val start = greatest(lit(1), i - (k - 1))
      val w = slice(a, start, i - start + 1)
      val m = size(w)
      val weighted = zip_with(w, sequence(lit(1), m), (x, j) => x * j.cast(DoubleType))
      dsum(weighted) / (m.cast(DoubleType) * (m.cast(DoubleType) + 1.0) / 2.0)
    })

  /** Inverse diff along the array (oph_deaccumulate:69): d(1)=a(1),
    * d(i)=a(i)−a(i−1). Exact inverse of [[Numeric.oph_accumulate]]. */
  def oph_deaccumulate(a: Column): Column =
    transform(sequence(lit(1), size(a)), i =>
      when(i === 1, element_at(a, 1))
        .otherwise(element_at(a, i.cast(IntegerType)) - element_at(a, i.cast(IntegerType) - 1)))

  /** Map values to quantization levels (oph_quantize:281): value i for
    * x <= thresholds(i), else thresholds.size. Levels are 0..k as doubles. */
  def oph_quantize(a: Column, thresholds: Seq[Double]): Column =
    transform(a, x =>
      thresholds.zipWithIndex.foldRight(lit(thresholds.size.toDouble): Column) {
        case ((t, i), els) => when(x <= t, lit(i.toDouble)).otherwise(els)
      })

  /** Normalize the array (oph_normalize:249): method "z" → (x−μ)/σ,
    * "max" → x/max|x|. */
  def oph_normalize(a: Column, method: String = "z"): Column = method match {
    case "z" =>
      val m = mean(a); val sd = oph_gsl_sd(a)
      transform(a, x => (x - m) / sd)
    case "max" =>
      val mx = array_max(transform(a, x => abs(x)))
      transform(a, _ / mx)
    case o => throw new IllegalArgumentException(s"unknown normalize method: $o")
  }

  // --------------------------------------------------------------------
  // Complex-array helpers (oph_gsl_complex_get_*:117-129, to_polar:133,
  // to_rect:137) — arrays of interleaved (re, im) pairs.
  // --------------------------------------------------------------------

  private def strided(a: Column, offset: Int, f: (Column, Column) => Column): Column = {
    val pairs = (size(a) / 2).cast(IntegerType)
    transform(sequence(lit(0), pairs - 1), i =>
      f(element_at(a, i.cast(IntegerType) * 2 + 1), element_at(a, i.cast(IntegerType) * 2 + 2)))
  }

  def oph_gsl_complex_get_real(a: Column): Column = strided(a, 0, (re, _) => re)
  def oph_gsl_complex_get_imag(a: Column): Column = strided(a, 1, (_, im) => im)
  def oph_gsl_complex_get_abs(a: Column): Column = strided(a, 0, (re, im) => sqrt(re * re + im * im))
  def oph_gsl_complex_get_arg(a: Column): Column = strided(a, 0, (re, im) => atan2(im, re))

  /** (re,im)* → (mod,arg)* interleaved. */
  def oph_gsl_complex_to_polar(a: Column): Column = {
    val pairs = (size(a) / 2).cast(IntegerType)
    flatten(transform(sequence(lit(0), pairs - 1), i => {
      val re = element_at(a, i.cast(IntegerType) * 2 + 1)
      val im = element_at(a, i.cast(IntegerType) * 2 + 2)
      array(sqrt(re * re + im * im), atan2(im, re))
    }))
  }

  /** (mod,arg)* → (re,im)* interleaved. */
  def oph_gsl_complex_to_rect(a: Column): Column = {
    val pairs = (size(a) / 2).cast(IntegerType)
    flatten(transform(sequence(lit(0), pairs - 1), i => {
      val mod = element_at(a, i.cast(IntegerType) * 2 + 1)
      val arg = element_at(a, i.cast(IntegerType) * 2 + 2)
      array(mod * cos(arg), mod * sin(arg))
    }))
  }
}
