package graft

import graft.core.PlanHash
import graft.queries.Registry

/** Pins the plan-fingerprint contract Bench relies on: the canonicalized
  * sparkPlan hash of every headline query is identical across two
  * independent builds (fresh Dataset, fresh expression IDs) — so a hash
  * difference between rounds can only mean a genuine plan change, never
  * expression-ID churn or per-run path noise.
  */
class PlanHashSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("headline plan hashes are stable across two independent builds") {
    Registry.headlines.foreach { q =>
      val h1 = PlanHash.of(q.run(spark, dir))
      val h2 = PlanHash.of(q.run(spark, dir))
      assert(h1 == h2, s"${q.name}: $h1 != $h2 across rebuilds")
    }
  }

  test("canonicalization strips expression IDs, paths, and stats tokens") {
    val raw =
      """*(2) Project [l_orderkey#123L, revenue#4567]
        |+- Exchange hashpartitioning(k#12, 32), [plan_id=345]
        |   +- FileScan parquet [k#12] Location: InMemoryFileIndex(1 paths)[file:/root/testdata/sf0.1/lineitem.parquet], Statistics(sizeInBytes=12.3 MiB)""".stripMargin
    val canon = PlanHash.canonicalize(raw)
    assert(!canon.contains("#123"), canon)
    assert(!canon.contains("plan_id=345"), canon)
    assert(!canon.contains("sf0.1"), canon)
    assert(!canon.contains("12.3"), canon)
    // dtype suffix survives — a long→int change must move the hash
    assert(canon.contains("#xL"), canon)
  }

  test("a genuinely different plan yields a different hash") {
    import spark.implicits._
    val a = Seq((1, "a")).toDF("k", "v").groupBy("k").count()
    val b = Seq((1, "a")).toDF("k", "v").select("k")
    assert(PlanHash.of(a) != PlanHash.of(b))
  }
}
