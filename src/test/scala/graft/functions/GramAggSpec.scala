package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The invariant q166 rests on: for ANY vector set and ANY partition
  * split, the merged GramAgg buffer equals the naively computed
  * [n | column sums | upper-triangle Gram] — exact integer sums are
  * order-independent, so the merge tree cannot change the answer.
  */
class GramAggSpec extends AnyFunSuite {

  private val d = 5

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def naive(vs: Seq[Seq[Long]]): Array[Long] = {
    val out = new Array[Long](1 + d + d * (d + 1) / 2)
    out(0) = vs.length.toLong
    for (j <- 0 until d) out(1 + j) = vs.map(_(j)).sum
    for (j <- 0 until d; k <- j until d)
      out(GramAgg.triIndex(d, j, k)) = vs.map(v => v(j) * v(k)).sum
    out
  }

  private val setGen = for {
    n <- Gen.chooseNum(0, 60)
    vs <- Gen.listOfN(n, Gen.listOfN(d, Gen.chooseNum(-50L, 50L)))
    nSplits <- Gen.chooseNum(1, 5)
  } yield (vs, nSplits)

  test("merge tree equals naive gram/sums/count for any split") {
    check(Prop.forAll(setGen) { case (vs, nSplits) =>
      val agg = new GramAgg(d)
      val parts = vs.zipWithIndex.groupBy(_._2 % nSplits)
        .values.map(_.map(_._1)).toSeq
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged =
        if (bufs.isEmpty) agg.zero else bufs.reduce(agg.merge)
      merged.sameElements(naive(vs))
    })
  }

  test("triIndex covers the packed tail exactly once") {
    val seen = for (j <- 0 until d; k <- j until d)
      yield GramAgg.triIndex(d, j, k)
    assert(seen.sorted == (1 + d until 1 + d + d * (d + 1) / 2).toList)
  }

  test("wrong-dimension input is rejected") {
    val agg = new GramAgg(d)
    intercept[IllegalArgumentException](agg.reduce(agg.zero, Seq(1L, 2L)))
  }
}
