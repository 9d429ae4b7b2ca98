package graft.operators

import graft.functions.GramAgg

/** Driver-side companion of the one-pass [[graft.functions.GramAgg]]
  * covariance: turns the packed [n | Σq | qqᵀ triangle] buffer into the
  * top principal direction by exact-integer power iteration. The
  * covariance n·G − S·Sᵀ is formed in BigInt — its entries grow like
  * n²·q_max², which leaves Long range past ~4·10⁷ rows at q_max=64
  * while the DuckDB oracle computes the same step in 128-bit HUGEINT —
  * then the pre-scaling trunc-div (BigInt `/` truncates toward zero,
  * exactly the oracle's sign-decomposed `//`) brings every entry back
  * below 2^33, and the 8 power-iteration rounds stay in plain Long
  * (|Mx| ≤ 2^33·2^11·d). Bit-for-bit replayable at ANY corpus size
  * that fits HUGEINT (n ≲ 10^17).
  */
object PcaPower {

  /** Large-d Gram pass with hierarchical partial merge. The SQL
    * `GramAgg(d)(col)` path funnels one buffer PER INPUT PARTITION
    * through a single final reducer — at d=4096 that is 67 MB × P
    * partials into one task (the bloom fan-in trap). Repartitioning the
    * DATA first bounds the fan-in but shuffles n·d longs, which is
    * strictly worse at any n ≫ P·d/2 (measured: 200k×1024 flat 7.0 s vs
    * repartition-8 12.7 s). This path instead computes one local buffer
    * per partition and merges the P COMPACT buffers through a
    * `treeAggregate` of the given depth — shuffle volume is P × buffer
    * bytes (independent of n), final fan-in ≈ P^(1/depth). Identical
    * exact-long sums, so the result is bit-equal to the SQL path
    * (GramMacroBench gates it).
    */
  def gramTree(df: org.apache.spark.sql.DataFrame, vecCol: String, d: Int,
               depth: Int = 2): Array[Long] = {
    val agg = new GramAgg(d)
    df.select(vecCol).rdd
      .map(_.getSeq[Long](0))
      .treeAggregate(agg.zero)(agg.reduce, agg.merge, depth)
  }

  /** Covariance matrix scaled by n²: M = n·G − S·Sᵀ, from the GramAgg
    * buffer layout. BigInt: entries exceed Long past ~4e7 rows.
    */
  def covarianceScaled(buf: Array[Long], d: Int): Array[Array[BigInt]] = {
    val n = BigInt(buf(0))
    val sums = Array.tabulate(d)(j => BigInt(buf(1 + j)))
    def gram(j: Int, k: Int): BigInt =
      if (j <= k) BigInt(buf(GramAgg.triIndex(d, j, k)))
      else BigInt(buf(GramAgg.triIndex(d, k, j)))
    Array.tabulate(d, d)((j, k) => n * gram(j, k) - sums(j) * sums(k))
  }

  /** Top component: pre-scale M below 2^33, then `rounds` iterations of
    * x ← (Mx) / max(1, maxabs(Mx)/1024), all truncating division
    * (BigInt `/` and Scala Long `/` == the oracle's sign-decomposed `//`).
    */
  def topComponent(buf: Array[Long], d: Int, rounds: Int = 8): Array[Long] = {
    val m0 = covarianceScaled(buf, d)
    val big1 = BigInt(1)
    val dm = m0.flatten.map(_.abs).max / 4294967296L max big1
    val mm = m0.map(_.map(v => (v / dm).toLong))
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
