package graft.streaming

import graft.SparkSpec
import graft.queries.Registry

/** Re-runs every streaming correctness-gate query under the RocksDB
  * state-store provider and asserts the results are row-identical to the
  * default (HDFS-backed, heap-resident) provider. The default store is
  * the one remaining 100 TB scale-killer posture — keyed session state
  * lives on the executor heap — so the engine's documented posture at
  * scale is RocksDB, and this spec proves the switch is semantics-free
  * across every stateful-operator class the engine uses:
  * flatMapGroupsWithState sessionization (q83), windowed aggregation
  * (q87), mapGroupsWithState attribution (q88), dropDuplicates state
  * (q89), stream-stream interval join (q90), and running aggregation
  * (q99).
  */
class RocksDbStateStoreSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val gates = Seq(
    "q83_stream_sessionize", "q87_stream_hourly", "q88_stream_attribution",
    "q89_stream_dedup", "q90_stream_asof", "q99_stream_running")

  private def rows(name: String): Seq[String] =
    Registry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  test("streaming gates are provider-agnostic: RocksDB ≡ default store") {
    gates.foreach { name =>
      val base = rows(name)
      assert(base.nonEmpty, s"$name returned no rows under default store")
      spark.conf.set(EventStreams.ProviderClassConf,
        EventStreams.RocksDbProvider)
      try {
        val rocks = rows(name)
        assert(rocks == base,
          s"$name differs under RocksDB: ${rocks.take(3)} vs ${base.take(3)}")
      } finally spark.conf.unset(EventStreams.ProviderClassConf)
    }
  }

  test("RocksDB provider actually engages (custom metrics present)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.conf.set(EventStreams.ProviderClassConf,
      EventStreams.RocksDbProvider)
    try {
      val mem =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int](
          spark)
      mem.addData(1, 2, 2, 3)
      val sq = mem.toDF().groupBy(col("value")).count()
        .writeStream.format("memory").queryName("rocks_engage")
        .outputMode("complete").start()
      try {
        sq.processAllAvailable()
        val metrics = sq.lastProgress.stateOperators.asInstanceOf[Array[_]]
          .map(_.toString).mkString
        assert(metrics.contains("rocksdb"),
          s"no rocksdb custom metrics in state operator progress: $metrics")
      } finally sq.stop()
    } finally spark.conf.unset(EventStreams.ProviderClassConf)
  }
}
