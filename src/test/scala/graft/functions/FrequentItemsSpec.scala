package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries invariant q136 rests on: for ANY stream and ANY
  * merge tree, every item with true frequency > N/(k+1) is in the final
  * candidate set. The query's correctness needs exactly this superset
  * property (the exact re-count pass handles the rest), so it is pinned
  * as a property over random streams with random partition splits.
  */
class FrequentItemsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def runSketch(k: Int, parts: Seq[Seq[String]]): Set[String] = {
    val agg = new FrequentItems(k)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged = if (bufs.isEmpty) agg.zero else bufs.reduce(agg.merge)
    agg.finish(merged).toSet
  }

  private val streamGen = for {
    n <- Gen.chooseNum(0, 400)
    items <- Gen.listOfN(n, Gen.chooseNum(0, 25).map(i => s"w$i"))
    nSplits <- Gen.chooseNum(1, 6)
  } yield (items, nSplits)

  test("candidates always cover every item with freq > N/(k+1)") {
    check(Prop.forAll(streamGen) { case (items, nSplits) =>
      Seq(4, 8, 16).forall { k =>
        val parts =
          if (items.isEmpty) Seq(Seq.empty[String])
          else items.grouped(math.max(1, items.length / nSplits)).toSeq
        val cand = runSketch(k, parts)
        val counts = items.groupBy(identity).view.mapValues(_.size).toMap
        val mustHave = counts.filter { case (_, c) =>
          c.toDouble > items.size.toDouble / (k + 1)
        }.keySet
        mustHave.subsetOf(cand) && cand.size <= k
      }
    })
  }

  test("exact under k distinct items: candidates are exactly the support") {
    val stream = Seq("a", "b", "a", "c", "a", "b")
    assert(runSketch(8, Seq(stream)) == Set("a", "b", "c"))
  }

  test("adversarial noise flood never evicts a guaranteed heavy hitter") {
    // one heavy item drowned in 200 singletons: decrement events consume
    // k+1 mass each, so at most N/(k+1) = 15 can ever hit the heavy count
    val stream = Seq.fill(60)("HH") ++ (1 to 200).map(i => s"n$i")
    for (splits <- Seq(1, 2, 5, 13)) {
      val parts = stream.grouped(math.max(1, stream.length / splits)).toSeq
      val cand = runSketch(16, parts)
      assert(cand.contains("HH"), s"splits=$splits lost the heavy hitter")
    }
  }
}
