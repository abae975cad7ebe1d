package graft.ebw

/**
 * Driver-side dense linear algebra for the k x k Newton systems (k << N).
 * Plays the role of pypardiso/scipy solves in the reference
 * (ebw_routines.py:242-257): Cholesky with the same escalate-ridge-by-10x
 * retry on indefiniteness, which is also what makes collinear moment
 * columns harmless (test_colinear.py relies on exactly this behavior).
 */
private[ebw] object DriverLinalg {

  /** Solve (G + ridge*I) x = rhs where G is packed upper-triangular SPD-ish. */
  def solveRidged(k: Int, packed: Array[Double], rhs: Array[Double], ridge0: Double): Array[Double] = {
    val diag = new Array[Double](k)
    solveWithDiag(k, packed, diag, rhs, ridge0)
  }

  /** Solve (G + diag + ridge*I) x = rhs (diag: extra per-coordinate diagonal,
   * used by the penalty solver's (P^-1 + G) system). */
  def solveWithDiag(
      k: Int,
      packed: Array[Double],
      diag: Array[Double],
      rhs: Array[Double],
      ridge0: Double): Array[Double] = {
    var ridge = ridge0
    var attempts = 0
    while (attempts < 16) {
      val a = unpack(k, packed)
      var i = 0
      while (i < k) { a(i)(i) += diag(i) + ridge; i += 1 }
      val x = cholSolve(a, rhs)
      if (x != null) return x
      ridge = math.max(ridge, 1e-12) * 10.0
      attempts += 1
    }
    throw new ArithmeticException("EBW Newton system is numerically singular")
  }

  /** Solve the subsystem restricted to `free` coordinates; zeros elsewhere. */
  def solveSubset(
      k: Int,
      packed: Array[Double],
      rhs: Array[Double],
      free: Array[Int],
      ridge0: Double): Array[Double] = {
    val m = free.length
    val out = new Array[Double](k)
    if (m == 0) return out
    var ridge = ridge0
    var attempts = 0
    while (attempts < 16) {
      val a = Array.ofDim[Double](m, m)
      val b = new Array[Double](m)
      var ii = 0
      while (ii < m) {
        val gi = free(ii)
        b(ii) = rhs(gi)
        var jj = 0
        while (jj < m) {
          val gj = free(jj)
          val lo = math.min(gi, gj)
          val hi = math.max(gi, gj)
          a(ii)(jj) = packed(EbwAggregator.pidx(k, lo, hi))
          jj += 1
        }
        a(ii)(ii) += ridge
        ii += 1
      }
      val x = cholSolve(a, b)
      if (x != null) {
        var p = 0
        while (p < m) { out(free(p)) = x(p); p += 1 }
        return out
      }
      ridge = math.max(ridge, 1e-12) * 10.0
      attempts += 1
    }
    throw new ArithmeticException("EBW Newton subsystem is numerically singular")
  }

  private def unpack(k: Int, packed: Array[Double]): Array[Array[Double]] = {
    val a = Array.ofDim[Double](k, k)
    var i = 0
    while (i < k) {
      var j = i
      while (j < k) {
        val v = packed(EbwAggregator.pidx(k, i, j))
        a(i)(j) = v
        a(j)(i) = v
        j += 1
      }
      i += 1
    }
    a
  }

  /** In-place Cholesky solve; returns null if not positive definite. */
  private def cholSolve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = a.length
    // factor: a(i)(j) for j<=i holds L
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j)
        var p = 0
        while (p < j) { s -= a(i)(p) * a(j)(p); p += 1 }
        if (i == j) {
          if (s <= 0.0 || s.isNaN) return null
          a(i)(i) = math.sqrt(s)
        } else {
          a(i)(j) = s / a(j)(j)
        }
        j += 1
      }
      i += 1
    }
    // forward: L y = b
    val y = new Array[Double](n)
    i = 0
    while (i < n) {
      var s = b(i)
      var p = 0
      while (p < i) { s -= a(i)(p) * y(p); p += 1 }
      y(i) = s / a(i)(i)
      i += 1
    }
    // backward: L^T x = y
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = y(i)
      var p = i + 1
      while (p < n) { s -= a(p)(i) * x(p); p += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  @inline def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  @inline def norm2(a: Array[Double]): Double = math.sqrt(dot(a, a))

  def axpy(alpha: Double, x: Array[Double], y: Array[Double]): Array[Double] = {
    val out = new Array[Double](y.length)
    var i = 0
    while (i < y.length) { out(i) = y(i) + alpha * x(i); i += 1 }
    out
  }
}
