package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.grib.Grib2File

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
