package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Per-row numeric kernels that don't decompose into Catalyst HOFs:
  * prefix ops with running state, FFT/DWT, spline interpolation and
  * in-array k-means. Implemented as Scala UDFs over Array[Double] —
  * one call per row processes the whole measure array, mirroring the
  * reference's plugin-call-per-row amortization
  * (oph_query_plugin_executor.c:583). These are the only non-codegen
  * primitives; everything else in graft.functions is pure Column.
  */
object Numeric {

  /** Prefix sum along the array (oph_accumulate:5). */
  val accumulateUdf = udf { a: Seq[Double] =>
    if (a == null) null else a.scanLeft(0.0)(_ + _).drop(1)
  }
  def oph_accumulate(a: Column): Column = accumulateUdf(a)

  /** Exponentially-weighted moving average (oph_moving_avg type 'EWMA'). */
  def oph_moving_avg_ewma(a: Column, alpha: Double): Column = {
    val f = udf { xs: Seq[Double] =>
      if (xs == null || xs.isEmpty) xs
      else xs.tail.scanLeft(xs.head)((prev, x) => alpha * x + (1 - alpha) * prev)
    }
    f(a)
  }

  /** Forward FFT of a real array → interleaved (re, im) pairs
    * (oph_gsl_fft:149). Uses JTransforms (ships with Spark). */
  val fftUdf = udf { a: Seq[Double] =>
    if (a == null) null
    else {
      val n = a.length
      val buf = new Array[Double](2 * n)
      var i = 0
      while (i < n) { buf(2 * i) = a(i); i += 1 }
      new org.jtransforms.fft.DoubleFFT_1D(n.toLong).complexForward(buf)
      buf.toSeq
    }
  }
  def oph_gsl_fft(a: Column): Column = fftUdf(a)

  /** Inverse FFT of interleaved (re, im) pairs → interleaved pairs
    * (oph_gsl_ifft:173), scaled by 1/n like GSL. */
  val ifftUdf = udf { a: Seq[Double] =>
    if (a == null) null
    else {
      val buf = a.toArray
      new org.jtransforms.fft.DoubleFFT_1D((a.length / 2).toLong)
        .complexInverse(buf, true)
      buf.toSeq
    }
  }
  def oph_gsl_ifft(a: Column): Column = ifftUdf(a)

  /** One level of the Haar discrete wavelet transform: first half =
    * approximations, second half = details (oph_gsl_dwt:145). */
  val dwtUdf = udf { a: Seq[Double] =>
    if (a == null) null
    else {
      val n = a.length / 2
      val s2 = math.sqrt(2.0)
      val out = new Array[Double](2 * n)
      var i = 0
      while (i < n) {
        out(i) = (a(2 * i) + a(2 * i + 1)) / s2
        out(n + i) = (a(2 * i) - a(2 * i + 1)) / s2
        i += 1
      }
      out.toSeq
    }
  }
  def oph_gsl_dwt(a: Column): Column = dwtUdf(a)

  /** Inverse of one Haar DWT level (oph_gsl_idwt:169). */
  val idwtUdf = udf { a: Seq[Double] =>
    if (a == null) null
    else {
      val n = a.length / 2
      val s2 = math.sqrt(2.0)
      val out = new Array[Double](2 * n)
      var i = 0
      while (i < n) {
        out(2 * i) = (a(i) + a(n + i)) / s2
        out(2 * i + 1) = (a(i) - a(n + i)) / s2
        i += 1
      }
      out.toSeq
    }
  }
  def oph_gsl_idwt(a: Column): Column = idwtUdf(a)

  /** Natural cubic spline through (1..n, a), evaluated at `points`
    * (oph_gsl_spline:189). Tridiagonal solve per row. */
  def oph_gsl_spline(a: Column, points: Seq[Double]): Column = {
    val f = udf { ys: Seq[Double] =>
      if (ys == null || ys.length < 2) ys
      else {
        val n = ys.length
        // natural spline second derivatives (uniform knots x_i = i+1)
        val m = new Array[Double](n)
        val l = new Array[Double](n); val mu = new Array[Double](n); val z = new Array[Double](n)
        l(0) = 1; mu(0) = 0; z(0) = 0
        var i = 1
        while (i < n - 1) {
          l(i) = 4.0 - mu(i - 1)
          mu(i) = 1.0 / l(i)
          z(i) = (3.0 * (ys(i + 1) - 2 * ys(i) + ys(i - 1)) - z(i - 1)) / l(i)
          i += 1
        }
        l(n - 1) = 1; z(n - 1) = 0; m(n - 1) = 0
        i = n - 2
        while (i >= 0) { m(i) = z(i) - mu(i) * m(i + 1); i -= 1 }
        points.map { x =>
          val j = math.max(0, math.min(n - 2, math.floor(x - 1).toInt))
          val dx = x - (j + 1)
          val h = 1.0
          val aa = (m(j + 1) - m(j)) / (6 * h)
          val bb = m(j) / 2
          val cc = (ys(j + 1) - ys(j)) / h - h * (2 * m(j) + m(j + 1)) / 6
          ys(j) + dx * (cc + dx * (bb + dx * aa))
        }
      }
    }
    f(a)
  }

  /** Lloyd's k-means over the row's scalar values; returns each element
    * replaced by its cluster centroid (oph_ccluster_kcluster:37, the
    * in-array variant). Deterministic init: k evenly-spaced quantiles. */
  def oph_ccluster_kcluster(a: Column, k: Int, maxIter: Int = 25): Column = {
    val f = udf { xs: Seq[Double] =>
      if (xs == null || xs.isEmpty) xs
      else {
        val sorted = xs.sorted
        var centroids = Array.tabulate(k)(i => sorted(((i + 0.5) / k * xs.length).toInt.min(xs.length - 1)))
        var iter = 0
        var assign = new Array[Int](xs.length)
        while (iter < maxIter) {
          var changed = false
          var i = 0
          while (i < xs.length) {
            var best = 0; var bd = Double.MaxValue; var c = 0
            while (c < k) { val d = math.abs(xs(i) - centroids(c)); if (d < bd) { bd = d; best = c }; c += 1 }
            if (assign(i) != best) { assign(i) = best; changed = true }
            i += 1
          }
          val sums = new Array[Double](k); val cnts = new Array[Int](k)
          var j = 0
          while (j < xs.length) { sums(assign(j)) += xs(j); cnts(assign(j)) += 1; j += 1 }
          centroids = Array.tabulate(k)(c => if (cnts(c) > 0) sums(c) / cnts(c) else centroids(c))
          if (!changed) iter = maxIter else iter += 1
        }
        xs.indices.map(i => centroids(assign(i)))
      }
    }
    f(a)
  }
}
