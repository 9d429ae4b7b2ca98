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

  test("bad magic is rejected loudly") {
    val dir = java.nio.file.Files.createTempDirectory("cdf3bad")
    val junk = dir.resolve("junk.nc")
    java.nio.file.Files.write(junk, "NOPE".getBytes)
    val e = intercept[Exception](NcFormat.open(junk.toString))
    assert(e.getMessage.contains("neither classic CDF nor HDF5"))
  }

  // ------ record (unlimited-dimension) variables: the interleaved
  // layout from tools/cdf3_record_fixture.py — three record vars, one
  // with a 2->4 padded slab, plus a fixed coordinate ------

  private def recFormula(r: Int, c: Int): Option[Float] =
    if ((r + 3 * c) % 11 == 0) None else Some((r * 31 + c * 7) % 211)

  test("record geometry: recSize includes slab padding; dims resolve") {
    val f = new Cdf3File("/root/repo/data/classic_rec.nc")
    try {
      assert(f.numRecs == 7)
      assert(f.recSize == 8 + 4 + 39 * 4) // time f8 + s i2(pad 4) + v row
      assert(f.variable("v").dims == Seq(7L, 39L))
      assert(f.variable("time").dims == Seq(7L))
      assert(f.variable("cell").dims == Seq(39L)) // fixed var untouched
    } finally f.close()
  }

  test("record reads: interleaved rows and coordinates decode exactly") {
    for (p <- Seq("/root/repo/data/classic_rec.nc",
        "/root/repo/data/classic_rec_stream.nc")) {
      val f = new Cdf3File(p)
      try {
        // STREAMING variant: numrecs 0xFFFFFFFF derives from file size
        assert(f.numRecs == 7, s"$p: numRecs ${f.numRecs}")
        val times = f.readDoubles("time")
        assert(times.toSeq == (0 until 7).map(1000.0 + _ * 3600.0), p)
        assert(f.readDoubles("cell").head == 5.0, p)
        val band = java.nio.ByteBuffer.wrap(f.readRowBand("v", 2, 5))
        for (r <- 2 until 5; c <- 0 until 39) {
          val got = band.getFloat(((r - 2) * 39 + c) * 4)
          recFormula(r, c) match {
            case Some(x) => assert(got == x, s"$p ($r,$c)")
            case None => assert(got.isNaN, s"$p ($r,$c) want NaN")
          }
        }
      } finally f.close()
    }
  }

  test("graft-netcdf reads a record variable end-to-end") {
    val df = spark.read.format("graft-netcdf")
      .option("path", "/root/repo/data/classic_rec.nc")
      .option("var", "v").option("latvar", "time").option("lonvar", "cell")
      .load()
      .filter(!isnan(col("value")))
    assert(df.count() == 249)
    val one = df.filter(col("latitude") === 1000.0 && col("longitude") === 5.5)
      .head()
    assert(one.getFloat(2) == recFormula(0, 1).get)
  }
}
