package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ArgmaxCosine, CosineSim, HyperplaneBands}

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) building blocks with
  * the two properties that matter at corpus scale:
  *
  *  1. `assign` — nearest-centroid assignment against a BROADCAST
  *     centroid index via [[graft.functions.ArgmaxCosine]]: a narrow
  *     per-row argmax (no n×k row explosion, no per-vector window
  *     shuffle), with Elkan-style triangle-inequality pruning off the
  *     Lloyd warm start. Bit-equal to the compositional
  *     crossJoin+row_number plan by construction.
  *
  *  2. `dupsWithinClusters` — the in-cluster near-dup pair scan with a
  *     SKEW GUARD: clusters at or below `sizeCap` run the plain
  *     all-pairs self-join (quadratic in CLUSTER size — the SemDeDup
  *     contract), while clusters ABOVE the cap are sub-bucketed by
  *     banded random-hyperplane LSH ([[HyperplaneBands]]) so candidate
  *     pairs meet on compact (cluster, band, signature) keys and the
  *     quadratic is bounded by BUCKET size. Without the guard one
  *     boilerplate mega-cluster (every near-identical template landing
  *     on the same centroid) degrades the whole job to O(m²) in that
  *     cluster's m; with it the per-key pair count is what AQE and the
  *     shuffle can actually carry. Exact-copy recall through the banded
  *     path is structural, not probabilistic: a positive scalar multiple
  *     of a vector has IDENTICAL hyperplane signs (the d-order fold
  *     scales by the same positive factor, and ×2 is exponent-exact in
  *     IEEE), so planted ×2 copies collide in EVERY band.
  *     General ≥-threshold pairs inside an over-cap cluster are found
  *     with the usual banded-LSH probability (bands × bits trade-off) —
  *     the same contract as the corpus-level MinHash/hyperplane dedups
  *     (q37/q46), and the DuckDB oracles rebuild the exact signatures so
  *     the gate is deterministic either way.
  *
  * Candidate generation joins on compact keys only (ids + band keys);
  * vector payloads join back AFTER the distinct pair set is known — the
  * LSH lesson from the 1M-doc dedup macro.
  */
object SemDedup {

  /** Nearest-centroid assignment: adds `cl` (and `cos_sim`) from a
    * broadcast index; `prevCl` enables the Elkan prune (use `lit(-1L)`
    * for a cold start).
    */
  def assign(df: DataFrame, vecCol: Column, prevCl: Column,
      idx: ArgmaxCosine.CentroidIndex): DataFrame = {
    val a = ArgmaxCosine(df.sparkSession, vecCol, prevCl, idx)
    df.withColumn("_amc", a)
      .withColumn("cl", col("_amc.cl"))
      .withColumn("cos_sim", col("_amc.cos_sim"))
      .drop("_amc")
  }

  /** Collect a (small) centroid table to a broadcast index. The collect
    * is O(k·dim) — the algorithm parameter, never the corpus.
    */
  def collectIndex(cent: DataFrame, clCol: String, vecCol: String)
      : ArgmaxCosine.CentroidIndex = {
    val rows = cent.select(col(clCol).cast("long"),
        col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    ArgmaxCosine.buildIndex(rows.toSeq)
  }

  /** Ids of vectors that have a SMALLER-id neighbor in the same cluster
    * at cosine ≥ `threshold` (the SemDeDup "remove all but one"
    * keep-lowest rule), with the size-cap skew guard. Output: one
    * column `dup_id`, distinct.
    *
    * @param sizeCap  clusters with more members than this are
    *                 sub-bucketed by hyperplane bands instead of
    *                 all-pairs scanned
    */
  def dupsWithinClusters(assigned: DataFrame, idCol: String, vecCol: String,
      clCol: String, threshold: Double, sizeCap: Int,
      bands: Int = 8, bits: Int = 16): DataFrame = {
    val sizes = assigned.groupBy(col(clCol)).agg(count(lit(1)).as("_cl_n"))
    val withN = assigned.join(broadcast(sizes), Seq(clCol))

    val small = withN.filter(col("_cl_n") <= sizeCap)
      .select(col(clCol), col(idCol), col(vecCol))
    val smallDups = small.as("a").join(small.as("b"),
        col(s"a.$clCol") === col(s"b.$clCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .filter(CosineSim(col(s"a.$vecCol").cast("array<double>"),
        col(s"b.$vecCol").cast("array<double>")) >= threshold)
      .select(col(s"b.$idCol").as("dup_id"))

    // Over-cap clusters: compact (cl, band, sig, id) keys meet in
    // bounded buckets; the candidate pair set is distinct'd on ids
    // BEFORE the vector payloads join back, so the exact cosine runs
    // once per unique pair. (A payload-carrying variant with a
    // first-collision-band filter was measured 6× SLOWER at 57M
    // candidates: the per-pair slice/zip_with/forall lambdas box every
    // band element — the MinhashSignature lesson again. Candidate
    // CARDINALITY is the real lever: pick `bits` so the per-bucket
    // count stays small in the biggest cluster.)
    val bigKeys = withN.filter(col("_cl_n") > sizeCap)
      .select(col(clCol), col(idCol),
        posexplode(HyperplaneBands(col(vecCol).cast("array<double>"),
          bands, bits)).as(Seq("_band", "_sig")))
    val bigPairs = bigKeys.as("a").join(bigKeys.as("b"),
        col(s"a.$clCol") === col(s"b.$clCol") &&
          col("a._band") === col("b._band") &&
          col("a._sig") === col("b._sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("_ida"), col(s"b.$idCol").as("_idb"))
      .distinct()
    val vecs = assigned.select(col(idCol).as("_vid"), col(vecCol).as("_v"))
    val bigDups = bigPairs
      .join(vecs.withColumnRenamed("_vid", "_ida").withColumnRenamed("_v", "_va"),
        Seq("_ida"))
      .join(vecs.withColumnRenamed("_vid", "_idb").withColumnRenamed("_v", "_vb"),
        Seq("_idb"))
      .filter(CosineSim(col("_va").cast("array<double>"),
        col("_vb").cast("array<double>")) >= threshold)
      .select(col("_idb").as("dup_id"))

    smallDups.union(bigDups).distinct()
  }
}
