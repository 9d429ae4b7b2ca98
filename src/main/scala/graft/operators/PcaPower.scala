package graft.operators

import graft.functions.GramAgg

/** Driver-side companion of the one-pass [[graft.functions.GramAgg]]
  * covariance: turns the packed [n | Σq | qqᵀ triangle] buffer into the
  * top principal direction by exact-integer power iteration. Every step
  * is deterministic long arithmetic (truncating division), so the DuckDB
  * oracle replays it bit-for-bit (q166); the pre-scaling trunc-div keeps
  * all intermediates in long range at ANY corpus size.
  */
object PcaPower {

  /** Covariance matrix scaled by n²: M = n·G − S·Sᵀ, from the GramAgg
    * buffer layout.
    */
  def covarianceScaled(buf: Array[Long], d: Int): Array[Array[Long]] = {
    val n = buf(0)
    val sums = Array.tabulate(d)(j => buf(1 + j))
    def gram(j: Int, k: Int): Long =
      if (j <= k) buf(GramAgg.triIndex(d, j, k))
      else buf(GramAgg.triIndex(d, k, j))
    Array.tabulate(d, d)((j, k) => n * gram(j, k) - sums(j) * sums(k))
  }

  /** Top component: pre-scale M below 2^33, then `rounds` iterations of
    * x ← (Mx) / max(1, maxabs(Mx)/1024), all truncating long division
    * (== the oracle's sign-decomposed `//`).
    */
  def topComponent(buf: Array[Long], d: Int, rounds: Int = 8): Array[Long] = {
    val m0 = covarianceScaled(buf, d)
    val dm = math.max(1L, m0.flatten.map(math.abs).max / 4294967296L)
    val mm = m0.map(_.map(_ / dm))
    var x = Array.fill(d)(1L)
    for (_ <- 1 to rounds) {
      val y = Array.tabulate(d) { j =>
        var acc = 0L
        var k = 0
        while (k < d) { acc += mm(j)(k) * x(k); k += 1 }
        acc
      }
      val dx = math.max(1L, y.map(math.abs).max / 1024L)
      x = y.map(_ / dx)
    }
    x
  }
}
