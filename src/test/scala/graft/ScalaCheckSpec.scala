package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KmvSketch, MinhashSignature, PandasFloatString, TopKBy}

/** ScalaCheck properties over the pure kernels of the custom functions —
  * no SparkSession needed, hundreds of generated cases per property
  * (SURVEY §5 port strategy: generator-based checks alongside the ported
  * goldens).
  */
class ScalaCheckSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("PandasFloatString.format round-trips through BigDecimal") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0, 6)) {
      (d: Double, scale: Int) =>
        val s = PandasFloatString.format(d, scale)
        val want = new java.math.BigDecimal(d)
          .setScale(scale, java.math.RoundingMode.HALF_UP)
        // parses back to exactly the HALF_UP rounding of d at `scale`,
        // and carries at least one fractional digit
        new java.math.BigDecimal(s).compareTo(want) == 0 && s.contains(".")
    })
  }

  test("MinhashSignature.compute is the per-permutation min of singletons") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val hashes = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(hashes) { (hs: List[Long]) =>
      val sig = MinhashSignature.compute(new GenericArrayData(hs.toArray), 8)
      (0 until 8).forall { j =>
        sig.getLong(j) == hs.map { h =>
          MinhashSignature
            .compute(new GenericArrayData(Array(h)), 8).getLong(j)
        }.min
      }
    })
  }

  test("TopKBy equals brute-force sort-take under any partitioning") {
    val agg = new TopKBy(5)
    val pair = for {
      s <- Gen.chooseNum(0, 50) // narrow score range → plenty of ties
      id <- Gen.chooseNum(0L, 1000L)
    } yield TopKBy.In(s.toDouble, id)
    check(Prop.forAll(Gen.listOf(pair), Gen.listOf(pair)) {
      (a: List[TopKBy.In], b: List[TopKBy.In]) =>
        def build(vs: List[TopKBy.In]) = vs.foldLeft(agg.zero)(agg.reduce)
        val got = agg.finish(agg.merge(build(a), build(b))).toSeq
        val want = (a ++ b).sortBy(v => (-v.score, v.id)).take(5)
        got == want
    })
  }

  test("KmvSketch buffers stay sorted, distinct, bounded; merge is commutative") {
    val sketch = new KmvSketch(16)
    val values = Gen.listOf(Gen.chooseNum(0L, 200L)) // dense range → duplicates
    check(Prop.forAll(values, values) { (a: List[Long], b: List[Long]) =>
      def build(vs: List[Long]) = vs.foldLeft(sketch.zero)(sketch.reduce)
      val (ba, bb) = (build(a), build(b))
      val wellFormed = Seq(ba, bb, sketch.merge(ba, bb)).forall { buf =>
        buf.length <= 16 &&
          buf.toSeq == buf.toSeq.sorted &&
          buf.distinct.length == buf.length
      }
      wellFormed &&
        sketch.merge(ba, bb).toSeq == sketch.merge(bb, ba).toSeq &&
        sketch.merge(ba, bb).toSeq == build(a ++ b).toSeq
    })
  }

  test("WindowFingerprints.compute == the slice/aggregate fold") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val hashes = Gen.listOf(Gen.chooseNum(0L, 1000000006L))
    val spans = Gen.chooseNum(1, 40)
    // both the production 43-bit modulus and a small one (the testing
    // hook SpanRewriteSpec uses to engineer prefilter collisions)
    val mods = Gen.oneOf(graft.functions.WindowFingerprints.DefaultMod,
      2147483647L, 97L)
    check(Prop.forAll(hashes, spans, mods) {
      (hs: List[Long], span: Int, mod: Long) =>
        val got = graft.functions.WindowFingerprints
          .compute(new GenericArrayData(hs.toArray), span, mod)
          .toLongArray().toSeq
        val nOut = math.max(hs.length - span + 1, 1)
        val want = (0 until nOut).map { i =>
          hs.slice(i, i + span)
            .map(BigInt(_))
            .foldLeft(BigInt(0))((acc, h) => (acc * 1000003 + h) % mod)
            .toLong
        }
        got == want
    })
  }
}
