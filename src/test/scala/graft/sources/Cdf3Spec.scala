package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.nc.{Cdf3File, NcFormat}

/** NetCDF classic (CDF-1/CDF-2) tests against the independent python
  * spec-writer fixtures (tools/cdf3_fixture.py): both offset variants,
  * big-endian decode, NaN pass-through, and the graft-netcdf dispatch.
  */
class Cdf3Spec extends SparkSpec {

  private def formula(r: Int, c: Int): Option[Float] =
    if ((r + 2 * c) % 13 == 0) None else Some((r * 19 + c * 5) % 523)

  test("header parse + row bands for both offset variants") {
    for (p <- Seq("/root/repo/data/classic1.nc", "/root/repo/data/classic2.nc")) {
      val f = new Cdf3File(p)
      try {
        val v = f.variable("v")
        assert(v.dims == Seq(32L, 56L) && v.elemSize == 4, s"$p: $v")
        val lats = f.readDoubles("lat")
        assert(lats.length == 32 && lats(0) == 48.0 && lats(1) == 47.9)
        val band = java.nio.ByteBuffer.wrap(f.readRowBand("v", 2, 4))
        // big-endian floats, rows 2..3
        for (c <- 0 until 56; r <- 2 until 4) {
          val got = band.getFloat(((r - 2) * 56 + c) * 4)
          formula(r, c) match {
            case Some(x) => assert(got == x, s"$p ($r,$c)")
            case None => assert(got.isNaN, s"$p ($r,$c) want NaN")
          }
        }
      } finally f.close()
    }
  }

  test("graft-netcdf dispatches on magic and reads classic files") {
    val df = spark.read.format("graft-netcdf")
      .option("path", "/root/repo/data/classic2.nc")
      .option("var", "v").load()
      .filter(!isnan(col("value")))
    assert(df.count() == 1655)
    val one = df.filter(col("latitude") === 48.0 && col("longitude") === -7.9)
      .head()
    assert(one.getFloat(2) == formula(0, 1).get)
  }

  test("latitude pushdown prunes row bands on classic files too") {
    val df = spark.read.format("graft-netcdf")
      .option("path", "/root/repo/data/classic2.nc")
      .option("var", "v").option("partitions", "8").load()
    val top = df.filter(col("latitude") >= 47.8)
    assert(top.rdd.getNumPartitions < 8)
  }

  test("record variables and bad magic are rejected loudly") {
    val dir = java.nio.file.Files.createTempDirectory("cdf3bad")
    val junk = dir.resolve("junk.nc")
    java.nio.file.Files.write(junk, "NOPE".getBytes)
    val e = intercept[Exception](NcFormat.open(junk.toString))
    assert(e.getMessage.contains("neither classic CDF nor HDF5"))
  }
}
