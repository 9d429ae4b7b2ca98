package graft.operators

import graft.SparkSpec

class WorkItemsSpec extends SparkSpec {
  import spark.implicits._

  test("fanOut processes every item once at the requested parallelism") {
    val items = (1 to 40).map(i => s"tile-$i").toDS()
    val out = WorkItems.fanOut(items, parallelism = 4)(_.toUpperCase)
    assert(out.rdd.getNumPartitions == 4)
    val rows = out.collect()
    assert(rows.length == 40 && rows.forall(_.ok))
    assert(rows.map(_.outcome).sorted.toSeq ==
      (1 to 40).map(i => s"TILE-$i").sorted)
  }

  test("fanOut isolates per-item failures without failing the job") {
    val items = Seq("good-1", "bad", "good-2").toDS()
    val out = WorkItems.fanOut(items, parallelism = 2) { item =>
      if (item == "bad") throw new RuntimeException("codec exploded")
      item.reverse
    }.collect()
    val byItem = out.map(r => r.item -> r).toMap
    assert(byItem("good-1").ok && byItem("good-1").outcome == "1-doog")
    assert(byItem("good-2").ok)
    assert(!byItem("bad").ok && byItem("bad").error.contains("codec exploded"))
  }
}
