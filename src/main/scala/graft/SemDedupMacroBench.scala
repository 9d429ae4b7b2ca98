package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup macro arm (q144's shape at scale): Lloyd's k-means over a
  * clustered synthetic embedding table, then cosine near-dup removal
  * within final clusters. Planted duplicates are ×2-scaled copies
  * (cosine 1 by scale invariance), so the gate is closed-form: recall
  * MUST be 1.0 and false positives 0 (the hash-noise vectors top out
  * far below the 0.95 threshold).
  *
  * Scale shape under test: assignment is n×k fused-cosine work against
  * BROADCAST centroids (never n×n); the dedup pair scan is bounded by
  * cluster size (n²/k per cluster) — the parameter that makes SemDeDup
  * tractable at corpus scale. Cluster count defaults keep ~200 members
  * per cluster, the regime the method runs in practice.
  *
  * Why the gate is closed-form: each seed owns a distinct TWO-HOT axis
  * pair (32×32 pairs, value 8.0) and the 62 remaining components are
  * ±0.25 sign noise, so every vector's squared norm is the constant
  * 131.875 and the cosine of a non-identical same-seed pair is
  * (128 + 0.0625·(2m−62))/131.875 for m < 62 agreeing signs — at most
  * 0.999052; vectors of different seeds share at most one hot axis and
  * top out near 0.53. The 0.9995 threshold therefore admits exactly
  * the planted ×2 copies (cosine 1 to the ulp — ×2 commutes with every
  * IEEE add/mul/sqrt in the fused kernel) and rejects everything else
  * DETERMINISTICALLY, no distribution-tail argument needed.
  *
  * Usage: SemDedupMacroBench [nVectors] [nClusters] [lloydIters]
  * (defaults 200000, 1024, 2)
  */
object SemDedupMacroBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(1024)
    require(k <= 1024, "two-hot seed construction supports at most 32*32 clusters")
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val nPlanted = n / 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 256 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    // clustered base + ×2-scaled planted copies of every 100th vector
    val base = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        pmod(col("id"), lit(k)).cast("int").as("seed"))
      .withColumn("vec", expr(
        s"""transform(sequence(0, ${dim - 1}), i ->
            CASE WHEN i = pmod(seed, 32) OR i = 32 + (seed div 32) THEN 8.0
                 ELSE pmod(xxhash64(vec_id, i), 2) * 0.5 - 0.25 END)"""))
    val planted = base.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"), col("seed"),
        transform(col("vec"), x => x * 2.0).as("vec"))
    val vecs = base.unionByName(planted).cache()
    vecs.count()

    def centroids(assigned: DataFrame, clCol: String): DataFrame = {
      val avgs = (0 until dim).map(i =>
        avg(element_at(col("vec"), i + 1)).as(s"_c$i"))
      assigned.groupBy(col(clCol).as("cl"))
        .agg(avgs.head, avgs.tail: _*)
        .select(col("cl"),
          array((0 until dim).map(i => col(s"_c$i")): _*).as("centroid"))
    }
    def assign(cent: DataFrame): DataFrame = {
      val w = Window.partitionBy("vec_id")
        .orderBy(col("cos_sim").desc, col("cl").asc)
      vecs.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("vec"), col("cl"),
          graft.functions.CosineSim(col("vec"), col("centroid")).as("cos_sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("vec_id", "vec", "cl")
    }

    val t0 = System.nanoTime()
    var assigned = assign(centroids(vecs, "seed")).cache()
    assigned.count()
    for (_ <- 2 to iters) {
      val next = assign(centroids(assigned, "cl")).cache()
      next.count()
      assigned.unpersist()
      assigned = next
    }
    val tKmeans = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val dups = assigned.as("a").join(assigned.as("b"),
        col("a.cl") === col("b.cl") && col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.CosineSim(col("a.vec"), col("b.vec")) >= 0.9995)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .as[Long].collect().toSet
    val tDedup = (System.nanoTime() - t1) / 1e9

    val plantedIds = (0L until n.toLong by 100).map(_ + 100000000L).toSet
    val recall = plantedIds.intersect(dups).size.toDouble / plantedIds.size
    val falsePos = (dups -- plantedIds).size
    println(f"""{"metric":"semdedup_macro","value":${tKmeans + tDedup}%.2f,"unit":"sec","n_vectors":${n + nPlanted},"clusters":$k,"lloyd_iters":$iters,"kmeans_sec":$tKmeans%.2f,"dedup_sec":$tDedup%.2f,"recall":$recall%.3f,"false_pos":$falsePos}""")
    require(recall == 1.0, s"planted-dup recall $recall != 1.0")
    require(falsePos == 0, s"$falsePos false positives above 0.9995")
    spark.stop()
  }
}
