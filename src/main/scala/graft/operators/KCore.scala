package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling to the TRUE fixpoint (Seidman 1983 degeneracy core) —
  * the convergent companion to q188's bounded-4-round gate: iteratively
  * delete every node of degree < k until no deletion fires. The result
  * is the unique maximal subgraph with minimum degree ≥ k (classic
  * fixpoint argument: the set of deleted nodes is independent of
  * deletion order, so synchronous rounds reach the same core as any
  * sequential peel).
  *
  * Scale shape (the ConnectedComponents loop pattern): each round is
  * one degree groupBy over the edge endpoints + two semi-joins against
  * the alive set; every round `localCheckpoint`s (the BPE lineage
  * lesson — unbounded rounds REQUIRE truncation, which is exactly why
  * the bounded q188 loop could skip it) and the per-round edge count
  * (the action that materializes the checkpoint) doubles as the
  * termination test: edge counts strictly decrease until the fixpoint,
  * so the loop always terminates in ≤ |V| rounds. Worst-case round
  * count is graph-shaped (a path peels 2 nodes/round — the CC
  * path-arm analogue); real crawl graphs converge in tens of rounds.
  */
object KCore {

  /** Peel `edges` (columns a, b — canonical undirected pairs) to the
    * k-core fixpoint. Returns (core edges, rounds executed), where
    * rounds counts PEELING rounds that removed something; the final
    * no-change round that proves the fixpoint is not counted.
    */
  def fixpoint(edges0: DataFrame, k: Int,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    require(k >= 1, s"kcore: k must be >= 1, got $k")
    val ck = graft.core.Checkpoints.saver(edges0, checkpointDir)
    var edges = ck(edges0)
    var nEdges = edges.count()
    var rounds = 0
    var done = nEdges == 0L
    while (!done) {
      val alive = edges
        .select(explode(array(col("a"), col("b"))).as("nd"))
        .groupBy("nd").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("nd")
      val next = ck(edges
        .join(alive.withColumnRenamed("nd", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("nd", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))) // joins rotate the key column first
      val m = next.count()
      if (m == nEdges) {
        // fixpoint confirmed: keep `edges`, drop the redundant twin
        graft.core.Checkpoints.release(next)
        done = true
      } else {
        // release the superseded round's checkpoint blocks — an
        // adversarial graph (a long path peels in O(n) rounds) would
        // otherwise accrue O(sum of round sizes) storage (r14 advice);
        // Dataset.unpersist can't reach them, Checkpoints.release can
        graft.core.Checkpoints.release(edges)
        edges = next
        nEdges = m
        rounds += 1
        done = m == 0L
      }
    }
    (edges, rounds)
  }

  /** Node degrees within the core — the q188 output shape. */
  def coreDegrees(coreEdges: DataFrame): DataFrame =
    coreEdges.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
}
