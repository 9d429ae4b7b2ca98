package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, cycles, and separate components resolve to min ids") {
    // path 1-2-3-4, triangle 10-11-12, isolated edge 20-21
    val got = cc((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("self-loops, duplicate and reversed edges are harmless") {
    val got = cc((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    // the pure self-loop node has no real edge — absent by contract
    assert(!got.contains(5L))
  }

  test("a long path converges (pointer jumping keeps rounds logarithmic)") {
    val n = 200L
    val edges = (1L until n).map(i => (i, i + 1))
    val got = cc(edges: _*)
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("empty edge set returns an empty labeling") {
    assert(cc() == Map.empty)
  }

  test("reliable-checkpoint arm matches the default and writes to the dir") {
    // the cluster-durability posture: with checkpointDir set, every
    // round goes through reliable checkpoint() (survives executor
    // loss) instead of executor-local blocks. Same labels, and the
    // checkpoint store must actually contain RDD checkpoint data.
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt-spec")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))
    val got = ConnectedComponents
      .run(edges.toDF("src", "dst"), checkpointDir = Some(dir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == cc(edges: _*))
    import scala.jdk.CollectionConverters._
    val wrote = java.nio.file.Files.walk(dir).iterator().asScala
      .exists(_.toString.contains("rdd-"))
    assert(wrote, "no reliable checkpoint data written under checkpointDir")
  }
}
