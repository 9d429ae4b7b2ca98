package graft.sources

import scala.sys.process._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The documented 5.40 (JPEG2000) escape hatch, exercised END-TO-END
  * where eccodes is installed and as a loud, actionable failure where it
  * is not (this container has no eccodes — the conditional test cancels
  * with a documented skip; on a host with libeccodes-tools it runs).
  *
  * Contract under test (round-7 decision): graft ships no JVM J2K
  * codec; a real 5.40 file must (a) be rejected naming the repack
  * script, (b) convert LOSSLESSLY to complex packing via
  * tools/grib2_j2k_repack.sh, and (c) read back value-identical to the
  * original through graft-grib.
  */
class GribRepackSpec extends SparkSpec {

  private val script =
    new java.io.File("tools/grib2_j2k_repack.sh").getAbsolutePath
  private val cfPath = "/root/repo/data/ens_cf.grib2"
  private def hasEccodes: Boolean =
    Seq("bash", "-c", "command -v grib_set").! == 0

  test("repack script usage/missing-eccodes failures are loud and coded") {
    // no args -> usage, exit 2 (always testable)
    val usageErr = new StringBuilder
    val usageCode = Seq("bash", script)
      .!(ProcessLogger(_ => (), l => usageErr.append(l).append('\n')))
    assert(usageCode == 2 && usageErr.toString.contains("usage"), usageErr)
    if (!hasEccodes) {
      // without eccodes: exit 3 with install guidance, never silence
      val err = new StringBuilder
      val code = Seq("bash", script, cfPath, "/tmp/graft_repack_out.grib2")
        .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
      assert(code == 3, s"expected exit 3, got $code: $err")
      assert(err.toString.contains("eccodes"), err)
      assert(err.toString.contains("lossless"), err)
    }
  }

  test("a real 5.40 file repacks losslessly and reads back (needs eccodes)") {
    assume(hasEccodes,
      "eccodes (grib_set) not installed in this container — documented " +
        "skip; on a host with libeccodes-tools this test makes a genuine " +
        "grid_jpeg file, asserts the loud rejection, repacks, and compares")
    val dir = java.nio.file.Files.createTempDirectory("grib-repack")
    val j2k = s"$dir/cf_540.grib2"
    val back = s"$dir/cf_back.grib2"
    // make a GENUINE 5.40 file from the simple-packed fixture
    assert(Seq("grib_set", "-r", "-s", "packingType=grid_jpeg",
      cfPath, j2k).! == 0, "grib_set to grid_jpeg failed")
    // (a) loud rejection naming the script
    val e = intercept[RuntimeException](
      graft.sources.grib.Grib2File.index(j2k))
    assert(e.getMessage.contains("5.40") &&
      e.getMessage.contains("grib2_j2k_repack.sh"), e.getMessage)
    // (b) the escape hatch converts it
    assert(Seq("bash", script, j2k, back).! == 0, "repack script failed")
    // (c) value-identical read-back through graft-grib
    def load(p: String) = spark.read.format("graft-grib")
      .option("path", p).load()
      .select("number", "latitude", "longitude", "value")
      .collect().map(_.toString).sorted.toSeq
    assert(load(back) == load(cfPath))
  }
}
