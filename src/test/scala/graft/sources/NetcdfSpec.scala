package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.nc.Hdf5File

/** The graft-netcdf DSv2 source against the reference platform's REAL
  * NetCDF-4 input files (auxiliary_data/flood/RP*ythresholds_GloFASv40.nc,
  * consumed by rp_thresholds.py:37-49). The gold standard is a parquet
  * dump produced by a fully independent pure-python HDF5 parser
  * (tools/nc_to_parquet.py, committed at data/rp_*_thresh.parquet): two
  * separate implementations of the format must agree bit-for-bit.
  */
class NetcdfSpec extends SparkSpec {

  private val NcDir = "/root/reference/auxiliary_data/flood"
  private val Nc2y = s"$NcDir/RP2ythresholds_GloFASv40.nc"
  private val available = new java.io.File(Nc2y).isFile

  private def nc(path: String, varName: String) =
    spark.read.format("graft-netcdf")
      .option("path", path).option("var", varName).load()

  test("Hdf5File parses the real threshold file structure") {
    assume(available)
    val f = new Hdf5File(Nc2y)
    try {
      val ds = f.datasets
      assert(ds.keySet == Set("lat", "lon", "2yRP_GloFASv4", "wgs_1984"))
      assert(ds("2yRP_GloFASv4").dims.toSeq == Seq(460L, 1400L))
      assert(ds("2yRP_GloFASv4").elemSize == 4)
      assert(ds("lat").dims.toSeq == Seq(460L))
      assert(ds("lon").dims.toSeq == Seq(1400L))
      // lat/lon are shuffle+deflate chunked; values descend / ascend
      val lats = f.readDoubles("lat")
      val lons = f.readDoubles("lon")
      assert(lats.length == 460 && lons.length == 1400)
      assert(math.abs(lats(0) - 16.975) < 1e-9)
      assert(math.abs(lats.last - (-5.975)) < 1e-9)
      assert(math.abs(lons(0) - (-17.975)) < 1e-9)
      assert(math.abs(lons.last - 51.975) < 1e-9)
      assert(lats.sliding(2).forall(p => p(0) > p(1)))
      assert(lons.sliding(2).forall(p => p(0) < p(1)))
    } finally f.close()
  }

  test("graft-netcdf agrees bit-for-bit with the independent python parser") {
    assume(available)
    val viaScala = nc(Nc2y, "2yRP_GloFASv4")
    val viaPython = spark.read.parquet("data/rp_2y_thresh.parquet")
      .withColumnRenamed("2yRP_GloFASv4", "pyvalue")
    assert(viaScala.count() == 644000L)
    val joined = viaScala.join(viaPython, Seq("latitude", "longitude"))
    // join keys are raw doubles — exact equality, so a full join means
    // both parsers produced identical coordinate arrays
    assert(joined.count() == 644000L)
    val mismatches = joined.filter(
      col("value") =!= col("pyvalue") &&
        !(isnan(col("value")) && isnan(col("pyvalue")))).count()
    assert(mismatches == 0L)
  }

  test("graft-netcdf ranged read: latitude pushdown prunes row bands") {
    assume(available)
    val full = nc(Nc2y, "2yRP_GloFASv4")
    val pruned = full.filter(col("latitude") > 16.0)
    // 16.975 down to 16.025 inclusive = 20 rows of 1400 cols
    assert(pruned.count() == 20L * 1400)
    // pruning happened at planning: far fewer rows pass through the scan
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows")
    pruned.count()
    assert(scanned.value <= 22L * 1400, s"scan emitted ${scanned.value} rows")
  }

  test("graft-netcdf column pruning reads value without coordinates") {
    assume(available)
    val only = nc(Nc2y, "2yRP_GloFASv4").select("value")
    val plan = only.queryExecution.executedPlan.toString
    assert(!plan.contains("latitude#"))
    assert(only.count() == 644000L)
  }

  test("all three RP files open and share the grid") {
    assume(available)
    Seq("2" -> "2yRP_GloFASv4", "5" -> "5yRP_GloFASv4", "20" -> "20yRP_GloFASv4")
      .foreach { case (rp, v) =>
        val df = nc(s"$NcDir/RP${rp}ythresholds_GloFASv40.nc", v)
        assert(df.count() == 644000L, s"RP$rp")
      }
  }

  // ------ aligned multi-scan (paths/vars/cols) ------

  private def zip3 = spark.read.format("graft-netcdf")
    .option("paths", Seq(2, 5, 20)
      .map(n => s"$NcDir/RP${n}ythresholds_GloFASv40.nc").mkString(","))
    .option("vars", "2yRP_GloFASv4,5yRP_GloFASv4,20yRP_GloFASv4")
    .option("cols", "t2,t5,t20")
    .load()

  test("aligned multi-scan equals three single scans joined, no shuffle") {
    assume(available)
    val zipped = zip3
    assert(zipped.columns.toSeq ==
      Seq("latitude", "longitude", "t2", "t5", "t20"))
    // ZERO exchanges: the N-way same-grid join happens at the scan
    val shuffles = zipped.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "aligned scan must not shuffle")
    assert(zipped.count() == 644000L)
    // values equal the single-var scans, row for row (spot rows)
    val got = zipped.filter(col("latitude") > 16.9 && col("longitude") < -17.0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) ->
        (r.getFloat(2), r.getFloat(3), r.getFloat(4))).toMap
    val single = Seq("2yRP_GloFASv4", "5yRP_GloFASv4", "20yRP_GloFASv4")
      .zip(Seq(2, 5, 20)).map { case (v, n) =>
        nc(s"$NcDir/RP${n}ythresholds_GloFASv40.nc", v)
          .filter(col("latitude") > 16.9 && col("longitude") < -17.0)
          .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getFloat(2))
          .toMap
      }
    assert(got.nonEmpty)
    for ((k, (a, b, c)) <- got) {
      def eqNaN(x: Float, y: Float) = x == y || (x.isNaN && y.isNaN)
      assert(eqNaN(a, single(0)(k)) && eqNaN(b, single(1)(k)) &&
        eqNaN(c, single(2)(k)), s"$k")
    }
  }

  test("multi-var from ONE file shares the handle; pruning keeps one column") {
    assume(available)
    val df = spark.read.format("graft-netcdf")
      .option("path", Nc2y)
      .option("vars", "2yRP_GloFASv4,2yRP_GloFASv4")
      .option("cols", "a,b")
      .load()
    val rows = df.filter(col("latitude") > 16.9).select("a", "b").collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getFloat(0) == r.getFloat(1) ||
        (r.getFloat(0).isNaN && r.getFloat(1).isNaN)))
    // pruning one value column drops the other from the scan schema
    val plan = df.select("b").queryExecution.executedPlan.toString
    assert(!plan.contains("a#"))
  }

  test("misaligned inputs fail loudly at planning, never silently zip") {
    assume(available)
    val bad = spark.read.format("graft-netcdf")
      .option("paths", s"$Nc2y,/root/repo/data/classic2.nc")
      .option("vars", "2yRP_GloFASv4,v")
      .load()
    val e = intercept[Exception](bad.count())
    assert(e.getMessage.contains("dims") ||
      e.getMessage.contains("coordinate vectors differ"), e.getMessage)
  }
}
