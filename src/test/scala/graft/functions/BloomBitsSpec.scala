package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The property q162 rests on: for ANY position multiset and ANY
  * partition/merge tree, the OR-merged bit array equals the bit array
  * of the union — so membership (all k positions set) can never miss a
  * position that was inserted (no false negatives), and the exact
  * verify join after the prefilter returns the unfiltered answer.
  */
class BloomBitsSpec extends AnyFunSuite {

  private val m = 1024

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def build(parts: Seq[Seq[Long]]): Array[Long] = {
    val agg = new BloomBits(m)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    if (bufs.isEmpty) agg.zero else bufs.reduce(agg.merge)
  }

  private def isSet(words: Array[Long], pos: Long): Boolean =
    ((words(pos.toInt >>> 6) >>> (pos.toInt & 63)) & 1L) == 1L

  private val partsGen = for {
    n <- Gen.chooseNum(0, 300)
    positions <- Gen.listOfN(n, Gen.chooseNum(0L, m - 1L))
    nSplits <- Gen.chooseNum(1, 6)
  } yield positions.zipWithIndex
    .groupBy(_._2 % nSplits).values.map(_.map(_._1)).toSeq

  test("merge tree equals single-pass union; every inserted bit is set") {
    check(Prop.forAll(partsGen) { parts =>
      val merged = build(parts)
      val flat = build(Seq(parts.flatten))
      val inserted = parts.flatten.toSet
      merged.sameElements(flat) &&
        inserted.forall(p => isSet(merged, p)) &&
        (0L until m).forall(p => !isSet(merged, p) || inserted.contains(p))
    })
  }

  test("word packing: positions land in the documented word/bit slots") {
    val agg = new BloomBits(128)
    val buf = Seq(0L, 63L, 64L, 127L).foldLeft(agg.zero)(agg.reduce)
    assert(buf(0) == (1L | (1L << 63)))
    assert(buf(1) == (1L | (1L << 63)))
  }

  test("out-of-range positions are rejected") {
    val agg = new BloomBits(128)
    intercept[IllegalArgumentException](agg.reduce(agg.zero, 128L))
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
  }
}
