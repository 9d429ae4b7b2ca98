package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search operators over embedding columns
  * (`array<float>`): exact cosine, and IVF (inverted-file) search — the
  * coarse-quantizer ANN pattern: vectors are bucketed by nearest
  * centroid; a query probes only the `nprobe` nearest centroid buckets,
  * scanning `nprobe/nClusters` of the data instead of all of it.
  *
  * At 100 TB the vector table is partitioned (or bucketed) BY the
  * cluster id, so a probe prunes partitions before any scan; centroids
  * are a broadcast dimension.
  */
object Similarity {

  /** dot(a, b) with per-element double casts; deterministic left fold,
    * whole-stage codegen'd (no UDF).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Per-cluster centroids: mean per dimension, returned as
    * (clusterCol, centroid: array<double>). posexplode → grouped avg →
    * re-assembled in position order.
    */
  def centroids(vecs: DataFrame, clusterCol: String, vecCol: String): DataFrame =
    vecs
      .select(col(clusterCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(clusterCol, "pos")
      .agg(avg(col("v").cast("double")).as("c"))
      .groupBy(clusterCol)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("centroid"))

  /** IVF top-k: probe the `nprobe` clusters whose centroids are nearest
    * to the query vector, brute-force cosine only inside them, return the
    * global top-k of the probed set (orderBy+limit →
    * TakeOrderedAndProject, distributed).
    */
  def ivfSearch(
      vecs: DataFrame, clusterCol: String, vecCol: String, idCol: String,
      queryVec: Seq[Double], nprobe: Int, k: Int,
      precomputedCentroids: Option[DataFrame] = None): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    val probed = precomputedCentroids
      .getOrElse(centroids(vecs, clusterCol, vecCol))
      .withColumn("c_sim", cosine(col("centroid"), q))
      .orderBy(col("c_sim").desc, col(clusterCol).asc)
      .limit(nprobe)
      .select(clusterCol)
    vecs
      .join(broadcast(probed), Seq(clusterCol), "left_semi")
      .select(col(idCol), col(clusterCol),
        cosine(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact brute-force top-k (the recall baseline for ivfSearch). */
  def bruteTopK(
      vecs: DataFrame, vecCol: String, idCol: String,
      queryVec: Seq[Double], k: Int): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    vecs.select(col(idCol), cosine(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }
}
