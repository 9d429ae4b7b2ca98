package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN macro benchmark: brute-force vs IVF top-k over a clustered
  * synthetic embedding table (default 5M × 64 dims, 32 clusters).
  * Reports index-build (centroids) and probe times separately — the
  * honest IVF accounting: the build is amortized over many queries, the
  * probe scans only nprobe/nClusters of the data.
  * Usage: VectorMacroBench [nVectors] [nClusters] [nprobe]
  */
object VectorMacroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000000)
    val nClusters = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val nprobe = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // clustered vectors: one dominant axis per cluster + hash noise
    val vecs = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        pmod(col("id"), lit(nClusters)).cast("int").as("cluster"))
      .withColumn("vec", expr(
        s"""transform(sequence(0, 63), i ->
            CASE WHEN i = (cluster % 16) * 4 THEN 8.0
                 ELSE (pmod(xxhash64(vec_id, i), 1000)) / 1000.0 - 0.5 END)"""))
      .cache()
    vecs.count() // materialize outside the timed region

    val query = Seq.tabulate(64)(i => if (i == 28) 8.0 else 0.05) // cluster-7 axis

    val t0 = System.nanoTime()
    val brute = Similarity.bruteTopK(vecs, "vec", "vec_id", query, 10)
      .collect()
    val tBrute = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val cents = Similarity.centroids(vecs, "cluster", "vec").cache()
    cents.count()
    val tBuild = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val ivf = Similarity.ivfSearch(vecs, "cluster", "vec", "vec_id",
      query, nprobe, 10, precomputedCentroids = Some(cents)).collect()
    val tProbe = (System.nanoTime() - t2) / 1e9

    val recall = ivf.map(_.getLong(0)).toSet
      .intersect(brute.map(_.getLong(0)).toSet).size / 10.0
    println(f"""{"metric":"vector_macro","value":$tProbe%.2f,"unit":"sec","n_vectors":$n,"brute_sec":$tBrute%.2f,"ivf_build_sec":$tBuild%.2f,"ivf_probe_sec":$tProbe%.2f,"recall_at_10":$recall%.2f,"nprobe":$nprobe,"clusters":$nClusters}""")
    spark.stop()
  }
}
