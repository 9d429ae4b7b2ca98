package graft.operators

import graft.SparkSpec

/** Exact-integer PageRank semantics on hand-computed fixtures: the
  * recurrence rank' = base + (85 * Σ rank div outdeg) div 100 with
  * truncating division at BOTH divisions, dangling-node mass dropped,
  * and parallel edges each contributing.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), scale = 100L, rounds = rounds)
      .as[(Long, Long)].collect().toMap

  test("two rounds on a 3-node chain match the hand-unrolled recurrence") {
    // 1→2, 2→1, 3→2; scale 100, base 15
    // r1: [100, 185, 15]; r2: 1←85*185/100=157→172, 2←85*(100+15)/100=97→112
    val e = Seq((1L, 2L), (2L, 1L), (3L, 2L))
    assert(ranks(e, 1) == Map(1L -> 100L, 2L -> 185L, 3L -> 15L))
    assert(ranks(e, 2) == Map(1L -> 172L, 2L -> 112L, 3L -> 15L))
  }

  test("dangling node mass is dropped, not redistributed") {
    // only 1→2: node 2 has outdeg 0; its mass vanishes each round
    val e = Seq((1L, 2L))
    assert(ranks(e, 1) == Map(1L -> 15L, 2L -> 100L))
    // r2: contrib(1)=15 div 1; rank2 = 15 + (85*15) div 100 = 15+12 = 27
    assert(ranks(e, 2) == Map(1L -> 15L, 2L -> 27L))
  }

  test("parallel edges contribute once per edge and split outdeg") {
    // 1→2 twice + 1→3: outdeg(1)=3, contrib 33 per edge; node 2 gets 66
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L))
    val r = ranks(e, 1)
    assert(r(2L) == 15L + (85L * (33L + 33L)) / 100) // 71
    assert(r(3L) == 15L + (85L * 33L) / 100) // 43
  }

  test("oracleRounds unrolls the same recurrence (text sanity)") {
    val sql = PageRank.oracleRounds(3, 100L)
    assert(sql.contains("r3 AS MATERIALIZED"))
    assert(!sql.contains("r4 AS"))
    assert(sql.contains("CAST(15 + (85 * coalesce(s0.m, 0)) // 100"))
  }
}
