package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The round-15 packed long-block state layout must be semantically
  * identical to the logical Seq[Member] it replaced: appendBlock ∘
  * packedHit over arbitrary member lists equals the original
  * exists-over-members Jaccard rule, bit for bit (same inter/union
  * integers, same double division, same corpus/smaller-id gating).
  * Pure driver-side property — no Spark session needed.
  */
class PackedStateSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private case class M(docId: Long, corpus: Boolean, shh: Array[Long])

  private def referenceHit(members: Seq[M], arrival: Array[Long],
      arrivalId: Long, thr: Double): Boolean = {
    val a = arrival.toSet
    members.exists { m =>
      (m.corpus || m.docId < arrivalId) && {
        val inter = m.shh.count(a.contains)
        val union = a.size + m.shh.length - inter
        union > 0 && inter.toDouble / union >= thr
      }
    }
  }

  private val hashGen = Gen.chooseNum(0L, 50L) // tiny space → real overlaps
  private val setGen = Gen.listOf(hashGen).map(_.distinct.toArray)
  private val memberGen = for {
    id <- Gen.chooseNum(0L, 30L)
    corpus <- Gen.oneOf(true, false)
    shh <- setGen
  } yield M(id, corpus, shh)

  test("packedHit over appendBlock-built buckets == the Seq[Member] rule") {
    check(Prop.forAll(Gen.listOf(memberGen), setGen,
      Gen.chooseNum(0L, 30L), Gen.oneOf(0.3, 0.5, 0.8, 1.0)) {
      (members: List[M], arrival: Array[Long], arrivalId: Long,
          thr: Double) =>
        var packed = Array.empty[Long]
        members.foreach { m =>
          packed = StreamDedup.appendBlock(packed, m.docId, m.corpus, m.shh)
        }
        val sortedA = arrival.clone()
        java.util.Arrays.sort(sortedA)
        StreamDedup.packedHit(packed, sortedA, arrivalId, thr) ==
          referenceHit(members, arrival, arrivalId, thr)
    })
  }

  test("NON-distinct arrival arrays: distinctSorted restores set Jaccard") {
    // the r15 advice gap: packedHit's union formula assumes SETS, and
    // the old generator only produced distinct arrays. The call-site
    // fix (sort + one-pass dedup) must make a duplicated arrival hash
    // array behave exactly like its set.
    val dupGen = Gen.listOf(hashGen).map(_.toArray) // duplicates allowed
    check(Prop.forAll(Gen.listOf(memberGen), dupGen,
      Gen.chooseNum(0L, 30L), Gen.oneOf(0.3, 0.5, 0.8, 1.0)) {
      (members: List[M], arrival: Array[Long], arrivalId: Long,
          thr: Double) =>
        var packed = Array.empty[Long]
        members.foreach { m =>
          packed = StreamDedup.appendBlock(packed, m.docId, m.corpus, m.shh)
        }
        val sortedA = StreamDedup.distinctSorted(arrival)
        // strictly increasing == sorted + distinct
        val strict = sortedA.indices.drop(1)
          .forall(i => sortedA(i - 1) < sortedA(i))
        strict && (StreamDedup.packedHit(packed, sortedA, arrivalId, thr) ==
          referenceHit(members, arrival.distinct, arrivalId, thr))
    })
  }

  test("appendBlock layout round-trips every member block") {
    check(Prop.forAll(Gen.listOf(memberGen)) { (members: List[M]) =>
      var packed = Array.empty[Long]
      members.foreach { m =>
        packed = StreamDedup.appendBlock(packed, m.docId, m.corpus, m.shh)
      }
      // walk the blocks back out
      val out = scala.collection.mutable.ArrayBuffer.empty[M]
      var p = 0
      while (p < packed.length) {
        val n = packed(p + 2).toInt
        out += M(packed(p), packed(p + 1) == 1L,
          java.util.Arrays.copyOfRange(packed, p + 3, p + 3 + n))
        p += 3 + n
      }
      out.length == members.length &&
        out.zip(members).forall { case (a, b) =>
          a.docId == b.docId && a.corpus == b.corpus &&
            a.shh.toSeq == b.shh.toSeq
        }
    })
  }
}
