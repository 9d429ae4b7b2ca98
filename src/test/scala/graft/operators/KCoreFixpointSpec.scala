package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** KCore.fixpoint closed-form semantics: a planted (k+1)-clique is its
  * own k-core and survives untouched; trees/paths dissolve completely;
  * a "beard" hanging off a clique peels without taking the clique.
  */
class KCoreFixpointSpec extends SparkSpec {

  private def edges(es: (Long, Long)*) = {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(es.map(e => Row(e._1, e._2)), 2),
      schema)
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { i <- ids.indices; j <- i + 1 until ids.size }
      yield (ids(i), ids(j))

  test("4-clique survives k=3 exactly; attached path dissolves") {
    // 4-clique on 0..3 plus a path 3-10-11-12 hanging off node 3
    val e = edges(clique(Seq(0L, 1L, 2L, 3L)) ++
      Seq((3L, 10L), (10L, 11L), (11L, 12L)): _*)
    val (core, rounds) = KCore.fixpoint(e, k = 3)
    val got = core.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == clique(Seq(0L, 1L, 2L, 3L)).toSet, got)
    assert(rounds >= 1)
  }

  test("pure path dissolves to empty at k=2, one endpoint pair per round") {
    val e = edges((0L to 9L).sliding(2).map(p => (p(0), p(1))).toSeq: _*)
    val (core, rounds) = KCore.fixpoint(e, k = 2)
    assert(core.count() == 0L)
    // a 10-node path peels both ends each round: 9 edges -> 7 -> 5 ... -> 0
    assert(rounds == 5, s"rounds=$rounds")
  }

  test("triangle is a k=2 fixpoint from round zero") {
    val (core, rounds) = KCore.fixpoint(edges((0L, 1L), (1L, 2L), (0L, 2L)), 2)
    assert(core.count() == 3L)
    assert(rounds == 0, s"rounds=$rounds")
  }

  test("empty input returns immediately") {
    val (core, rounds) = KCore.fixpoint(edges(), 2)
    assert(core.count() == 0L && rounds == 0)
  }

  test("superseded rounds release their checkpoint blocks (r14 advice)") {
    def persisted = spark.sparkContext.getPersistentRDDs.count {
      case (_, r) => r.getStorageLevel.useMemory || r.getStorageLevel.useDisk
    }
    val before = persisted
    // a 12-node path at k=2 peels over 6 rounds — 7 checkpointed frames
    // total; all but the final survivor must be unpersisted by the loop
    val e = edges((0L to 11L).sliding(2).map(p => (p(0), p(1))).toSeq: _*)
    val (core, rounds) = KCore.fixpoint(e, k = 2)
    assert(rounds == 6 && core.count() == 0L)
    assert(persisted <= before + 1,
      s"checkpoint blocks accrued: $before before, $persisted after")
    graft.core.Checkpoints.release(core)
  }
}
