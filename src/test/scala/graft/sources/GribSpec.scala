package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.grib.{Grib2File, Grib2Writer}

/** Byte-level GRIB2 fixture tests: the fixtures are written by the
  * INDEPENDENT pure-python spec implementation (tools/grib2_fixture.py),
  * so agreement here cross-validates both sides of the format.
  */
class GribSpec extends SparkSpec {
  import spark.implicits._

  private val cfPath = "/root/repo/data/ens_cf.grib2"
  private val pfPath = "/root/repo/data/ens_pf.grib2"

  test("index walks messages and reads ensemble + grid headers") {
    val cf = Grib2File.index(cfPath)
    assert(cf.map(m => (m.dataType, m.number)) == Seq(("cf", 0)))
    val pf = Grib2File.index(pfPath)
    assert(pf.map(m => (m.dataType, m.number)) == Seq(("pf", 1), ("pf", 2)))
    val g = cf.head
    assert((g.ni, g.nj, g.la1, g.lo1, g.di, g.dj) == (4, 3, 60.0, 10.0, 0.5, 0.5))
  }

  test("forecast lead time (octets 18-22) parses and surfaces via withStep") {
    // e2e fixtures: 5 control steps 24..120 h (tools/flood_e2e_fixture.py)
    val idx = Grib2File.index("/root/repo/data/e2e_cf.grib2")
    assert(idx.map(_.stepHours) == Seq(24, 48, 72, 96, 120))
    assert(idx.forall(m => m.dataType == "cf" && m.number == 0))
    val df = spark.read.format("graft-grib")
      .option("path", "/root/repo/data/e2e_pf.grib2")
      .option("withStep", "true").load()
    assert(df.columns.toSeq == Seq("data_type", "number", "step_hours",
      "latitude", "longitude", "value"))
    assert(df.filter(col("step_hours") === 48)
      .select("number").distinct().count() == 10)
    // default schema is unchanged (audited plans stay identical); the
    // legacy fixture's 24 h lead still parses at the index level
    val legacy = spark.read.format("graft-grib").option("path", cfPath).load()
    assert(!legacy.columns.contains("step_hours"))
    assert(Grib2File.index(cfPath).head.stepHours == 24)
  }

  test("simple-packing decode reproduces the formula values exactly") {
    val pf = Grib2File.index(pfPath)
    val m2 = Grib2File.read(pfPath, pf.find(_.number == 2).get)
    val expected = (for (j <- 0 until 3; i <- 0 until 4)
      yield 2000.0 + j * 10 + i).toArray
    assert(m2.values.toSeq == expected.toSeq)
  }

  test("scaled simple packing decodes (R, binary, decimal scales all nonzero)") {
    // fixture: R=50.0, E=-2 (sign-magnitude), D=1, 12-bit X = k
    // value = (50.0 + k * 2^-2) * 10^-1
    val path = "/root/repo/data/ens_scaled.grib2"
    val infos = Grib2File.index(path)
    assert(infos.map(m => (m.dataType, m.number)) == Seq(("pf", 7)))
    val m = Grib2File.read(path, infos.head)
    val expected = (0 until 12).map(k => (50.0 + k * 0.25) * 0.1)
    m.values.toSeq.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"$got vs $want")
    }
  }

  private val complexPath = "/root/repo/data/ens_complex.grib2"

  test("complex packing (template 5.2) decodes group-packed values exactly") {
    val infos = Grib2File.index(complexPath)
    assert(infos.map(m => (m.dataType, m.number)) ==
      Seq(("pf", 11), ("pf", 12), ("cf", 0)))
    val m = Grib2File.read(complexPath, infos(0))
    val expected = (0 until 12).map(k => 50.0 + (k * 37) % 101)
    assert(m.values.toSeq == expected)
  }

  test("complex packing + spatial differencing order 1 (template 5.3)") {
    val infos = Grib2File.index(complexPath)
    val m = Grib2File.read(complexPath, infos(1))
    val expected = (0 until 12).map(k => 500.0 + (k * k * 13) % 89)
    assert(m.values.toSeq == expected)
  }

  test("spatial differencing order 2 on product template 4.0 -> cf/0") {
    val infos = Grib2File.index(complexPath)
    assert((infos(2).dataType, infos(2).number) == ("cf", 0))
    val m = Grib2File.read(complexPath, infos(2))
    val expected = (0 until 12).map(k => 300.0 + (k * 29) % 53)
    assert(m.values.toSeq == expected)
  }

  private val bitmapPath = "/root/repo/data/ens_bitmap.grib2"

  test("bitmap (section 6 indicator 0) expands masked points to NaN") {
    // mask drops k % 3 == 0 and the last point; present values follow the
    // fixture formulas (simple-packed cf, complex-5.3-order-1 pf)
    val infos = Grib2File.index(bitmapPath)
    assert(infos.map(m => (m.dataType, m.number)) == Seq(("cf", 0), ("pf", 7)))
    val masked = (k: Int) => k % 3 == 0 || k == 11
    val cf = Grib2File.read(bitmapPath, infos(0))
    assert(cf.values.length == 12)
    (0 until 12).foreach { k =>
      if (masked(k)) assert(cf.values(k).isNaN, s"k=$k should be NaN")
      else assert(cf.values(k) == 200.0 + (k * 31) % 83, s"k=$k")
    }
    val pf = Grib2File.read(bitmapPath, infos(1))
    (0 until 12).foreach { k =>
      if (masked(k)) assert(pf.values(k).isNaN, s"k=$k should be NaN")
      else assert(pf.values(k) == 700.0 + (k * k * 17) % 71, s"k=$k")
    }
  }

  test("bitmap indicator 254 (previously defined) is rejected loudly") {
    // hand-assemble a message whose section 6 says "use the previous
    // bitmap" — cross-message decoder state the one-message-per-task
    // model cannot honor
    val src = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(bitmapPath))
    val infos = Grib2File.index(bitmapPath)
    val msg = java.util.Arrays.copyOfRange(src, 0, infos(0).length.toInt)
    // find section 6 (walk sections from byte 16) and patch its indicator
    var cur = 16
    var patched = false
    while (!patched) {
      val len = ((msg(cur) & 0xFF) << 24) | ((msg(cur + 1) & 0xFF) << 16) |
        ((msg(cur + 2) & 0xFF) << 8) | (msg(cur + 3) & 0xFF)
      if ((msg(cur + 4) & 0xFF) == 6) { msg(cur + 5) = 254.toByte; patched = true }
      else cur += len
    }
    val f = java.io.File.createTempFile("grib254", ".grib2")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, msg)
    val info = Grib2File.index(f.getAbsolutePath).head
    val e = intercept[RuntimeException](Grib2File.read(f.getAbsolutePath, info))
    assert(e.getMessage.contains("bitmap indicator 254"))
  }

  test("distributed Grib2Writer round-trips through the reader, bitmap included") {
    val lats = Array.tabulate(9)(i => 42.0 - i * 0.5)
    val lons = Array.tabulate(14)(j => 3.0 + j * 0.5)
    val cells = for {
      m <- 0 until 3; i <- lats.indices; j <- lons.indices
      if (m + i + j) % 5 != 0 // holes → section-6 bitmap
    } yield (m, lats(i), lons(j), ((m * 31 + i * 7 + j * 3) % 997).toDouble)
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_grib_rt.grib2").getAbsolutePath
    Grib2Writer.writeEnsemble(
      cells.toDF("number", "latitude", "longitude", "value")
        .repartition(5),
      path, lats, lons)
    val infos = Grib2File.index(path)
    assert(infos.map(mi => (mi.dataType, mi.number)) ==
      Seq(("cf", 0), ("pf", 1), ("pf", 2)))
    assert((infos.head.ni, infos.head.nj, infos.head.la1, infos.head.lo1,
      infos.head.di, infos.head.dj) == (14, 9, 42.0, 3.0, 0.5, 0.5))
    val back = spark.read.format("graft-grib").option("path", path).load()
      .filter(!isnan(col("value")))
      .select(col("number"), col("latitude"), col("longitude"), col("value"))
      .as[(Int, Double, Double, Double)].collect().toSet
    assert(back == cells.map(c => (c._1, c._2, c._3, c._4)).toSet)
  }

  test("packing template 5.40 (JPEG2000) is rejected with the repack path") {
    // patch an existing message's section 5 template number to 40: the
    // DOCUMENTED decision (no pure-JVM J2K codec) must surface as a loud,
    // actionable error naming tools/grib2_j2k_repack.sh — never as a
    // garbage decode or an incidental bounds crash
    val src = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cfPath))
    val infos = Grib2File.index(cfPath)
    val msg = java.util.Arrays.copyOfRange(src, 0, infos(0).length.toInt)
    var cur = 16
    var patched = false
    while (!patched) {
      val len = ((msg(cur) & 0xFF) << 24) | ((msg(cur + 1) & 0xFF) << 16) |
        ((msg(cur + 2) & 0xFF) << 8) | (msg(cur + 3) & 0xFF)
      if ((msg(cur + 4) & 0xFF) == 5) {
        // octets 10-11 (u16 at index 9): data representation template
        msg(cur + 9) = 0; msg(cur + 10) = 40.toByte; patched = true
      } else cur += len
    }
    val f = java.io.File.createTempFile("grib540", ".grib2")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, msg)
    val e = intercept[RuntimeException](
      Grib2File.index(f.getAbsolutePath))
    assert(e.getMessage.contains("5.40"), e.getMessage)
    assert(e.getMessage.contains("grib2_j2k_repack.sh"), e.getMessage)
  }

  test("PNG packing (template 5.41) decodes 16-bit gray and 24-bit RGB") {
    val path = "/root/repo/data/ens_png.grib2"
    val infos = Grib2File.index(path)
    assert(infos.map(m => (m.dataType, m.number)) ==
      Seq(("pf", 21), ("pf", 22)))
    val m16 = Grib2File.read(path, infos(0))
    assert(m16.values.toSeq ==
      (0 until 12).map(k => ((1000 + k * 517) % 65536).toDouble))
    val m24 = Grib2File.read(path, infos(1))
    assert(m24.values.toSeq ==
      (0 until 12).map(k => ((100000L + k * 700001L) % (1 << 24)).toDouble))
  }

  test("graft-grib source unpivots messages to long rows") {
    val df = spark.read.format("graft-grib").option("path", pfPath).load()
    assert(df.columns.toSeq ==
      Seq("data_type", "number", "latitude", "longitude", "value"))
    assert(df.count() == 2 * 12)
    val row = df.filter(col("number") === 1 &&
        col("latitude") === 59.5 && col("longitude") === 11.0)
      .select("value").as[Double].head()
    assert(row == 1000.0 + 10 + 2) // member 1, j=1, i=2
  }

  test("data_type/number predicates prune whole messages at planning") {
    val both = spark.read.format("graft-grib")
      .option("path", s"$cfPath,$pfPath").load()
    assert(both.rdd.getNumPartitions == 3) // one partition per message
    val onlyPf2 = both.filter(col("data_type") === "pf" && col("number") === 2)
    assert(onlyPf2.rdd.getNumPartitions == 1)
    assert(onlyPf2.count() == 12)
    // pruning never loses rows the residual filter should keep
    assert(both.filter(col("number") >= 1).count() == 24)
  }

  test("cf+pf concat matches the reference's ensemble assembly golden") {
    val cf = spark.read.format("graft-grib").option("path", cfPath).load()
      .filter(col("data_type") === "cf").drop("data_type")
    val pf = spark.read.format("graft-grib").option("path", pfPath).load()
      .filter(col("data_type") === "pf").drop("data_type")
    val ens = RasterContract.concatEnsemble(cf, pf)
    assert(ens.count() == 36)
    assert(ens.select("number").distinct().as[Int].collect().toSet == Set(0, 1, 2))
    // spot golden: member 0 keeps its control values after renumbering
    val v = ens.filter(col("number") === 0 &&
        col("latitude") === 60.0 && col("longitude") === 10.0)
      .select("value").as[Double].head()
    assert(v == 0.0)
  }
}
