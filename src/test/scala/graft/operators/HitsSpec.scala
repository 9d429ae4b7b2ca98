package graft.operators

import graft.SparkSpec

/** Exact-integer HITS semantics on hand-computed fixtures: auth from
  * hubs, hub from the NEW auth, each half-round renormalized by
  * div-by-max(raw) div 2^20 — truncating division throughout.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val T = Hits.Target // 1048576

  private def scores(edges: Seq[(Long, Long)],
                     rounds: Int): Map[Long, (Long, Long)] =
    Hits.run(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long, Long)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap

  test("star graph is stationary: center is the authority, leaves hubs") {
    // 1..4 → 0. rawAuth(0)=4T → dA=4 → auth(0)=T; rawHub(i)=T, dH=1.
    // Identical every round thereafter.
    val e = (1L to 4L).map(i => (i, 0L))
    for (r <- Seq(1, 8)) {
      val s = scores(e, r)
      assert(s(0L) == (0L, T), s"round $r center: ${s(0L)}")
      (1L to 4L).foreach(i => assert(s(i) == (T, 0L), s"round $r leaf $i"))
    }
  }

  test("two rounds on a bipartite graph match the hand-unrolled recurrence") {
    // 1→3, 1→4, 2→3
    // r1: rawAuth(3)=2T, rawAuth(4)=T, dA=2 → auth(3)=T, auth(4)=T/2
    //     rawHub(1)=3T/2, rawHub(2)=T, dH=1
    // r2: rawAuth(3)=5T/2, rawAuth(4)=3T/2, dA=2 → auth(3)=5T/4, auth(4)=3T/4
    //     rawHub(1)=2T, rawHub(2)=5T/4, dH=2 → hub(1)=T, hub(2)=5T/8
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L))
    val r1 = scores(e, 1)
    assert(r1(3L) == (0L, T))
    assert(r1(4L) == (0L, T / 2))
    assert(r1(1L) == (3 * T / 2, 0L))
    assert(r1(2L) == (T, 0L))
    val r2 = scores(e, 2)
    assert(r2(3L) == (0L, 5 * T / 4))
    assert(r2(4L) == (0L, 3 * T / 4))
    assert(r2(1L) == (T, 0L))
    assert(r2(2L) == (5 * T / 8, 0L))
  }

  test("oracleRounds unrolls the same recurrence (text sanity)") {
    val sql = Hits.oracleRounds(2)
    assert(sql.contains("h2 AS MATERIALIZED"))
    assert(!sql.contains("h3 AS"))
    assert(sql.contains(s"// $T"))
    assert(sql.contains("greatest(1, max(abs(raw))"))
  }
}
