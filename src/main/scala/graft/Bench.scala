package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (BENCH_r{N}.json).
  */
object Bench {

  /** Full-materialization action: checksum EVERY output column so Catalyst
    * cannot prune away result-producing work (a bare `count()` lets the
    * optimizer drop final projections — e.g. WKT string synthesis — and
    * under-measure). `bit_xor` keeps the fold overflow-free under ANSI.
    */
  def materialize(df: DataFrame): Unit =
    df.agg(bit_xor(xxhash64(df.columns.map(col).toIndexedSeq: _*))).collect()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=q47_kmv_sketch,q60_flood_detailed → time just those
    // (iterating on one query without paying for the whole suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val targets = Registry.headlines
      .filter(q => only.forall(_.contains(q.name)))
    // one warm-up pass so JIT/codegen and file listing don't dominate;
    // warm-up failures are tolerated (the timed pass reports them)
    targets.foreach { q =>
      try materialize(q.run(spark, sfDir))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // timed pass: a failing query must surface as status=err and a
    // nonzero exit, never as a silently-near-zero timing
    val results = targets.map { q =>
      val t0 = System.nanoTime()
      val status =
        try { materialize(q.run(spark, sfDir)); "ok" }
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] ${q.name} FAILED: $e")
            "err"
        }
      (q.name, (System.nanoTime() - t0) / 1e9, status)
    }
    val qs = results
      .map { case (k, v, _) => "\"" + k + f"""\":$v%.4f""" }
      .mkString("{", ",", "}")
    val statuses = results
      .map { case (k, _, st) => "\"" + k + "\":\"" + st + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"status":$statuses,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3 == "err")) sys.exit(1)
  }
}
