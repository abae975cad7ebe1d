package graft.ebw

import org.apache.spark.rdd.RDD

/**
 * The single distributed kernel behind every solver mode: one
 * `treeAggregate` traversal computes, for the current k-dim dual iterate
 * theta,
 *
 *   s    = sum_i w0_i r_i x_i                  (k)      weighted moment totals
 *   gram = sum_i w0_i r'_i x_i x_i^T           (k(k+1)/2, packed upper tri)
 *   fval = sum_i w0_i (r_i ln r_i - r_i + 1)   KL criterion (shared.py:41-54)
 *   wrsum= sum_i w0_i r_i
 *
 * where r_i = link(x_i . theta). This is the same access pattern the
 * reference implements with MKL sparse matvecs + gram_matrix_mkl
 * (ebw_routines.py:211,226-233) — here it distributes over the N dimension
 * with O(k^2) driver traffic per pass and zero shuffles (treeAggregate is a
 * reduction). Buffers are flat primitive arrays: no per-row allocation.
 */
private[ebw] object EbwAggregator {

  final case class Pass(
      s: Array[Double],
      gram: Array[Double],
      fval: Double,
      wrsum: Double,
      count: Long,
      gramKeys: Array[Long] = null,
      gramVals: Array[Double] = null) {
    def isSparse: Boolean = gramKeys != null
  }

  /** Packed upper-triangular index for i <= j. */
  @inline def pidx(k: Int, i: Int, j: Int): Int = i * k - i * (i + 1) / 2 + j

  def run(rows: RDD[EbwRow], k: Int, theta: Array[Double], link: Link): Pass = {
    val tri = k * (k + 1) / 2
    val size = k + tri + 3
    val th = theta
    val lk = link
    val out = rows.treeAggregate(new Array[Double](size))(
      seqOp = (buf, row) => { add(buf, row, th, lk, k, tri); buf },
      combOp = (a, b) => {
        var i = 0
        while (i < size) { a(i) += b(i); i += 1 }
        a
      },
      depth = 2)
    Pass(
      s = java.util.Arrays.copyOfRange(out, 0, k),
      gram = java.util.Arrays.copyOfRange(out, k, k + tri),
      fval = out(k + tri),
      wrsum = out(k + tri + 1),
      count = out(k + tri + 2).toLong)
  }

  private def add(
      buf: Array[Double],
      row: EbwRow,
      theta: Array[Double],
      link: Link,
      k: Int,
      tri: Int): Unit = {
    val vals = row.vals
    val idx = row.idx
    // t = x . theta
    var t = 0.0
    if (idx == null) {
      var j = 0
      while (j < k) { t += vals(j) * theta(j); j += 1 }
    } else {
      var p = 0
      while (p < idx.length) { t += vals(p) * theta(idx(p)); p += 1 }
    }
    val (r, rp) = link.rAndSlope(t)
    val w0 = row.w0
    val wr = w0 * r
    // KL criterion term; r -> 0 limit of (r ln r - r + 1) is 1.
    buf(k + tri) += (if (r <= 0.0) w0 else w0 * (r * math.log(r) - r + 1.0))
    buf(k + tri + 1) += wr
    buf(k + tri + 2) += 1.0
    val wrp = w0 * rp
    if (idx == null) {
      var i = 0
      while (i < k) {
        val vi = vals(i)
        buf(i) += wr * vi
        if (wrp != 0.0 && vi != 0.0) {
          val wv = wrp * vi
          val base = k + i * k - i * (i + 1) / 2
          var j = i
          while (j < k) { buf(base + j) += wv * vals(j); j += 1 }
        }
        i += 1
      }
    } else {
      val nnz = idx.length
      var p = 0
      while (p < nnz) {
        val i = idx(p)
        val vi = vals(p)
        buf(i) += wr * vi
        if (wrp != 0.0) {
          val wv = wrp * vi
          val base = k + i * k - i * (i + 1) / 2
          var q = p
          while (q < nnz) { buf(base + idx(q)) += wv * vals(q); q += 1 }
        }
        p += 1
      }
    }
  }

  /**
   * Large-k variant: identical statistics, but the Gram is accumulated as
   * a sparse LongMap keyed by i*k+j (i <= j). For group-dummy / interaction
   * designs (the reference's "hundreds of thousands of constraints" regime,
   * README.md "models with ... hundreds of thousands of constraints") the
   * Gram has O(k) to O(k * nnz_row) entries, not k^2 — a packed dense
   * buffer would be 100 MB+/task at k = 5000 while the sparse map stays
   * proportional to the realized cross pattern. Paired with the driver-side
   * CG solve in DriverLinalg.
   */
  def runSparse(rows: RDD[EbwRow], k: Int, theta: Array[Double], link: Link,
      depth: Int = 2): Pass = {
    val th = theta
    val lk = link
    final case class Acc(
        s: Array[Double],
        gram: scala.collection.mutable.LongMap[Double],
        var fval: Double, var wrsum: Double, var count: Long)
    val out = rows.treeAggregate(
      Acc(new Array[Double](k), new scala.collection.mutable.LongMap[Double](), 0.0, 0.0, 0L))(
      seqOp = (acc, row) => {
        val vals = row.vals
        val idx = row.idx
        var t = 0.0
        if (idx == null) {
          var j = 0
          while (j < k) { t += vals(j) * th(j); j += 1 }
        } else {
          var p = 0
          while (p < idx.length) { t += vals(p) * th(idx(p)); p += 1 }
        }
        val (r, rp) = lk.rAndSlope(t)
        val w0 = row.w0
        val wr = w0 * r
        acc.fval += (if (r <= 0.0) w0 else w0 * (r * math.log(r) - r + 1.0))
        acc.wrsum += wr
        acc.count += 1
        val wrp = w0 * rp
        if (idx == null) {
          var i = 0
          while (i < k) {
            val vi = vals(i)
            if (vi != 0.0) {
              acc.s(i) += wr * vi
              if (wrp != 0.0) {
                val wv = wrp * vi
                var j = i
                while (j < k) {
                  val vj = vals(j)
                  if (vj != 0.0) {
                    val key = i.toLong * k + j
                    acc.gram.update(key, acc.gram.getOrElse(key, 0.0) + wv * vj)
                  }
                  j += 1
                }
              }
            }
            i += 1
          }
        } else {
          val nnz = idx.length
          var p = 0
          while (p < nnz) {
            val i = idx(p)
            val vi = vals(p)
            acc.s(i) += wr * vi
            if (wrp != 0.0) {
              val wv = wrp * vi
              var q = p
              while (q < nnz) {
                val key = i.toLong * k + idx(q)
                acc.gram.update(key, acc.gram.getOrElse(key, 0.0) + wv * vals(q))
                q += 1
              }
            }
            p += 1
          }
        }
        acc
      },
      combOp = (a, b) => {
        var i = 0
        while (i < k) { a.s(i) += b.s(i); i += 1 }
        b.gram.foreachEntry((key, v) => a.gram.update(key, a.gram.getOrElse(key, 0.0) + v))
        a.fval += b.fval; a.wrsum += b.wrsum; a.count += b.count
        a
      },
      depth = depth)
    val n = out.gram.size
    val keys = new Array[Long](n)
    val vals = new Array[Double](n)
    var i = 0
    out.gram.foreachEntry { (key, v) => keys(i) = key; vals(i) = v; i += 1 }
    Pass(out.s, null, out.fval, out.wrsum, out.count, keys, vals)
  }

  /**
   * Statistics-only pass: s, fval, wrsum, count — NO Gram. Θ(N·nnz)
   * instead of Θ(N·nnz²). The distributed-Gram mode's line-search
   * evaluation: Armijo trials only need the dual objective pieces, so the
   * Gram (the expensive part) is built once per ACCEPTED iterate, not per
   * trial.
   */
  def runStats(rows: RDD[EbwRow], k: Int, theta: Array[Double], link: Link): Pass = {
    val th = theta
    val lk = link
    val size = k + 3
    val out = rows.treeAggregate(new Array[Double](size))(
      seqOp = (buf, row) => {
        val vals = row.vals
        val idx = row.idx
        var t = 0.0
        if (idx == null) {
          var j = 0
          while (j < k) { t += vals(j) * th(j); j += 1 }
        } else {
          var p = 0
          while (p < idx.length) { t += vals(p) * th(idx(p)); p += 1 }
        }
        val (r, _) = lk.rAndSlope(t)
        val w0 = row.w0
        val wr = w0 * r
        buf(k) += (if (r <= 0.0) w0 else w0 * (r * math.log(r) - r + 1.0))
        buf(k + 1) += wr
        buf(k + 2) += 1.0
        if (idx == null) {
          var i = 0
          while (i < k) { buf(i) += wr * vals(i); i += 1 }
        } else {
          var p = 0
          while (p < idx.length) { buf(idx(p)) += wr * vals(p); p += 1 }
        }
        buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < size) { a(i) += b(i); i += 1 }
        a
      },
      depth = 2)
    Pass(
      s = java.util.Arrays.copyOfRange(out, 0, k),
      gram = null,
      fval = out(k),
      wrsum = out(k + 1),
      count = out(k + 2).toLong)
  }

  /**
   * The Gram as a DISTRIBUTED dataset — the no-driver-ceiling mode for
   * the large-N × large-k regime (EbwSizing decides): per-partition
   * LongMap partials (the runSparse kernel) stream out as (key, value)
   * pairs and a reduceByKey merges them ACROSS EXECUTORS; the merged Gram
   * never lands on the driver. The Newton direction is then solved by CG
   * with distributed matvecs (DriverLinalg.cgSolveRdd) — per-iteration
   * driver traffic is O(k), not O(gram nnz), so the regime that OOMed the
   * default 8 GB driver (N=1e7: ~50 M realized Gram entries) runs within
   * default budgets. Caller persists/unpersists the returned RDD.
   */
  def gramRdd(rows: RDD[EbwRow], k: Int, theta: Array[Double], link: Link,
      aggParts: Int): RDD[(Long, Double)] = {
    val th = theta
    val lk = link
    rows.mapPartitions { it =>
      val acc = new scala.collection.mutable.LongMap[Double]()
      while (it.hasNext) {
        val row = it.next()
        val vals = row.vals
        val idx = row.idx
        var t = 0.0
        if (idx == null) {
          var j = 0
          while (j < k) { t += vals(j) * th(j); j += 1 }
        } else {
          var p = 0
          while (p < idx.length) { t += vals(p) * th(idx(p)); p += 1 }
        }
        val (_, rp) = lk.rAndSlope(t)
        val wrp = row.w0 * rp
        if (wrp != 0.0) {
          if (idx == null) {
            var i = 0
            while (i < k) {
              val vi = vals(i)
              if (vi != 0.0) {
                val wv = wrp * vi
                var j = i
                while (j < k) {
                  val vj = vals(j)
                  if (vj != 0.0) {
                    val key = i.toLong * k + j
                    acc.update(key, acc.getOrElse(key, 0.0) + wv * vj)
                  }
                  j += 1
                }
              }
              i += 1
            }
          } else {
            val nnz = idx.length
            var p = 0
            while (p < nnz) {
              val vi = vals(p)
              val wv = wrp * vi
              val i = idx(p)
              var q = p
              while (q < nnz) {
                val key = i.toLong * k + idx(q)
                acc.update(key, acc.getOrElse(key, 0.0) + wv * vals(q))
                q += 1
              }
              p += 1
            }
          }
        }
      }
      acc.iterator
    }.combineByKeyWithClassTag[Double](
      createCombiner = (v: Double) => v,
      mergeValue = (a: Double, b: Double) => a + b,
      mergeCombiners = (a: Double, b: Double) => a + b,
      partitioner = new org.apache.spark.HashPartitioner(aggParts),
      // The LongMap partial above IS the map-side combine: within a
      // partition every key is already unique, so reduceByKey's default
      // map-side aggregation would build a SECOND full-partial-sized hash
      // map per task purely to rediscover that uniqueness — measured as
      // the executor heap OOM site (AppendOnlyMap.growTable) at
      // N=1e7 × 32 concurrent tasks. Streaming pairs straight to the
      // shuffle writers costs zero extra shuffle volume and caps task
      // memory at the one partial.
      mapSideCombine = false)
  }

  /**
   * One-pass weighted least squares for the primal warm start: solves
   * (sum w0 x x') lambda = sum w0 x ln(r0) — the projection of the log
   * ratio guess onto span(X). Returns (packed gram, rhs). Rows with
   * non-finite or nonpositive ratios are skipped: the guess is only a
   * seed, never a correctness input.
   */
  def ratioSeed(rows: RDD[(EbwRow, Double)], k: Int): (Array[Double], Array[Double]) = {
    val tri = k * (k + 1) / 2
    val size = tri + k
    val out = rows.treeAggregate(new Array[Double](size))(
      seqOp = (buf, rowAndRatio) => {
        val (row, ratio) = rowAndRatio
        // defensive dimension guards: the solver validates the same frame
        // separately, but this pass must never AIOOBE on its own
        val dimsOk = row.vals != null && (
          if (row.idx == null) row.vals.length == k
          else row.idx.length == row.vals.length && (row.idx.length == 0 ||
            (row.idx(0) >= 0 && row.idx(row.idx.length - 1) < k)))
        if (ratio > 0.0 && !ratio.isInfinite && !ratio.isNaN &&
            dimsOk && !row.w0.isNaN && row.w0 > 0.0) {
          val lnr = math.log(ratio)
          val w0 = row.w0
          val vals = row.vals
          val idx = row.idx
          if (idx == null) {
            var i = 0
            while (i < k) {
              val vi = vals(i)
              if (vi != 0.0) {
                buf(tri + i) += w0 * lnr * vi
                val wv = w0 * vi
                val base = i * k - i * (i + 1) / 2
                var j = i
                while (j < k) { buf(base + j) += wv * vals(j); j += 1 }
              }
              i += 1
            }
          } else {
            val nnz = idx.length
            var p = 0
            while (p < nnz) {
              val i = idx(p)
              val vi = vals(p)
              buf(tri + i) += w0 * lnr * vi
              val wv = w0 * vi
              val base = i * k - i * (i + 1) / 2
              var q = p
              while (q < nnz) { buf(base + idx(q)) += wv * vals(q); q += 1 }
              p += 1
            }
          }
        }
        buf
      },
      combOp = (a, b) => {
        var i = 0
        while (i < size) { a(i) += b(i); i += 1 }
        a
      },
      depth = 2)
    (java.util.Arrays.copyOfRange(out, 0, tri),
      java.util.Arrays.copyOfRange(out, tri, size))
  }

  /** Validation + sizing pass: returns (badRows, sumW, n, sumPairs) where
   * sumPairs = Σ_i nnz_i(nnz_i+1)/2 — the total Gram-entry contributions,
   * the input to EbwSizing's partition/depth/mode heuristic (counted in
   * the same scan that checks finiteness, so sizing costs nothing extra).
   * Mirrors inputs_are_invalid
   * (/root/reference/entropy_balance_weighting/shared.py:105-133). */
  def validate(rows: RDD[EbwRow], k: Int): (Long, Double, Long, Long) = {
    val out = rows.treeAggregate(new Array[Double](4))(
      seqOp = (buf, row) => {
        var bad = false
        var nnz = 0
        if (row.w0.isNaN || row.w0.isInfinite || row.w0 <= 0.0) bad = true
        if (row.vals == null) bad = true
        else {
          if (row.idx == null) {
            if (row.vals.length != k) bad = true
          } else {
            if (row.idx.length != row.vals.length) bad = true
            else if (row.idx.length > 0 && (row.idx(row.idx.length - 1) >= k || row.idx(0) < 0)) bad = true
          }
          if (!bad) {
            var p = 0
            while (p < row.vals.length && !bad) {
              val v = row.vals(p)
              if (v.isNaN || v.isInfinite) bad = true
              else if (v != 0.0) nnz += 1
              p += 1
            }
          }
        }
        if (bad) buf(0) += 1.0
        else {
          buf(1) += row.w0
          buf(3) += nnz.toDouble * (nnz + 1) / 2
        }
        buf(2) += 1.0
        buf
      },
      combOp = (a, b) => { a(0) += b(0); a(1) += b(1); a(2) += b(2); a(3) += b(3); a },
      depth = 2)
    (out(0).toLong, out(1), out(2).toLong, out(3).toLong)
  }
}
