package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** LabelProp.runConverged closed-form semantics: two planted 4-clique
  * communities joined by one bridge edge converge to their clique-min
  * labels in exactly 2 changed rounds (hand-derived, round by round);
  * a single symmetric edge (bipartite) 2-cycles forever and must stop
  * at the cap with run(e, cap)'s exact labels — the oracle-equivalence
  * contract (converged early ⇒ extra unrolled rounds are no-ops;
  * capped ⇒ both ran exactly cap rounds).
  */
class LabelPropConvergedSpec extends SparkSpec {

  private def edges(es: (Long, Long)*) = {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    val sym = es ++ es.map(e => (e._2, e._1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(sym.map(e => Row(e._1, e._2)), 2),
      schema)
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { i <- ids.indices; j <- i + 1 until ids.size }
      yield (ids(i), ids(j))

  test("two bridged 4-cliques converge to clique-min labels in 2 rounds") {
    val e = edges(clique(0L to 3L) ++ clique(4L to 7L) :+ (3L -> 4L): _*)
    val (labels, rounds) = LabelProp.runConverged(e, maxRounds = 10)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L to 7L).map(n => n -> (n - n % 4)).toMap
    assert(got == want, got)
    assert(rounds == 2, s"rounds=$rounds")
  }

  test("converged result equals the fixed-round run at any cap >= convergence") {
    val e = edges(clique(0L to 3L) ++ clique(4L to 7L) :+ (3L -> 4L): _*)
    val conv = LabelProp.runConverged(e, maxRounds = 10)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = LabelProp.run(e, rounds = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(conv == fixed)
  }

  test("bipartite 2-cycle stops at the cap with run(e, cap)'s labels") {
    val e = edges(0L -> 1L)
    val (labels, rounds) = LabelProp.runConverged(e, maxRounds = 5)
    assert(rounds == 5, s"rounds=$rounds")
    val conv = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = LabelProp.run(e, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(conv == fixed)
    // odd cap → one swap applied: 0 carries 1's label and vice versa
    assert(conv == Set((0L, 1L), (1L, 0L)), conv)
  }

  test("superseded rounds release their checkpoint blocks") {
    def persisted = spark.sparkContext.getPersistentRDDs.count {
      case (_, r) => r.getStorageLevel.useMemory || r.getStorageLevel.useDisk
    }
    val before = persisted
    val e = edges(clique(0L to 3L) ++ clique(4L to 7L) :+ (3L -> 4L): _*)
    val (labels, _) = LabelProp.runConverged(e, maxRounds = 10)
    labels.count()
    // nodes + edges + the live round = bounded, not O(rounds)
    assert(persisted <= before + 3,
      s"checkpoint blocks accrued: $before before, $persisted after")
  }
}
