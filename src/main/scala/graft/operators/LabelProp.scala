package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) with a
  * deterministic tie rule and a fixed round count — community detection
  * over a crawl/citation graph, the domain-clustering signal a corpus
  * curation pipeline groups documents by (PageRank/HITS rank nodes;
  * LPA partitions them). The asynchronous randomized original is
  * non-reproducible by design; the synchronous fixed-round variant with
  * "max neighbor-label count, ties toward the SMALLEST label" is exact
  * and replayable term for term in SQL.
  *
  * Contract:
  *  - label_0(v) = v
  *  - label_{r+1}(v) = the most frequent label among v's in-neighbors'
  *    round-r labels, ties → smallest label; nodes with no in-edges
  *    keep their round-r label.
  * Pass a symmetrized edge list for the classic undirected semantics.
  *
  * Scale shape (the PageRank loop pattern): edges repartitioned on src
  * and cached once; each round = one hash join (labels ⋈ edges) + one
  * two-key groupBy count + one per-dst argmax via min(struct(-cnt,
  * lbl)) — a MERGEABLE aggregate, never a window over the edge list —
  * + a node-universe left join; every round localCheckpoints (the BPE
  * lineage lesson). Nothing collects to the driver.
  */
object LabelProp {

  /** Run `rounds` synchronous LPA rounds over long `src`/`dst` edges.
    * Returns (node, label) for every node appearing as src or dst.
    */
  def run(edges: DataFrame, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ck = graft.core.Checkpoints.saver(edges, checkpointDir)

    val nodes = ck(edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .repartition(parts, col("node")))
    val e = ck(edges.select(col("src"), col("dst"))
      .repartition(parts, col("src")))

    var labels = nodes.withColumn("label", col("node"))
    var r = 0
    while (r < rounds) {
      val best = labels.join(e, col("node") === col("src"))
        .groupBy(col("dst"), col("label").as("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        // min over (−cnt, lbl) ≡ ORDER BY cnt DESC, lbl ASC row 1 —
        // a mergeable aggregate instead of a window over the counts
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl"))).as("b"))
        .select(col("dst"), col("b.lbl").as("nl"))
      val stepped = ck(labels.join(best, col("node") === col("dst"), "left")
        .select(col("node"), coalesce(col("nl"), col("label")).as("label")))
      // release the superseded round (no-op on the round-0 projection)
      // — the fixed-round loop was the ONE iterative loop missing this,
      // caught by the counter-based ReliableCheckpointSpec rewrite
      graft.core.Checkpoints.release(labels)
      labels = stepped
      r += 1
    }
    labels
  }

  /** CONVERGENCE mode (the fixpoint twin k-core got in round 14 and
    * label prop lacked): iterate [[run]]'s exact per-round update until
    * no node changes its label, or `maxRounds` is hit — synchronous LPA
    * can 2-cycle on bipartite structure, so an uncapped loop would hang
    * there; the cap bounds it. Returns (labels, changedRounds) where
    * changedRounds counts only rounds that moved ≥ 1 label (the
    * fixpoint-proving no-change probe round is not counted — the
    * KCore.fixpoint convention).
    *
    * Oracle equivalence: the update is a deterministic function f of
    * the previous labels, so once labels_k = labels_{k-1} every later
    * round is identical — `runConverged(e, M)` returns EXACTLY
    * `run(e, M)`'s labels whether it stopped early (fixpoint reached,
    * extra unrolled oracle rounds are no-ops) or hit the cap (both ran
    * M rounds). Gated queries therefore pair it with `oracleRounds(M)`.
    *
    * Scale shape: per-round cost identical to [[run]]; the changed
    * count rides the same action that materializes the round's eager
    * localCheckpoint output, and superseded round checkpoints release
    * their blocks ([[graft.core.Checkpoints.release]]) so storage stays
    * O(current round), not O(sum of rounds).
    */
  def runConverged(edges: DataFrame, maxRounds: Int,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    require(maxRounds >= 1, s"labelprop: maxRounds must be >= 1, got $maxRounds")
    val spark = edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val save = graft.core.Checkpoints.saver(edges, checkpointDir)

    val nodes = save(edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .repartition(parts, col("node")))
    val e = save(edges.select(col("src"), col("dst"))
      .repartition(parts, col("src")))

    var ck = save(nodes.withColumn("label", col("node")))
    var labels = ck
    var r = 0
    var converged = false
    while (!converged && r < maxRounds) {
      val best = labels.join(e, col("node") === col("src"))
        .groupBy(col("dst"), col("label").as("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl"))).as("b"))
        .select(col("dst"), col("b.lbl").as("nl"))
      val stepped = save(labels.join(best, col("node") === col("dst"), "left")
        .select(col("node"), col("label").as("prev"),
          coalesce(col("nl"), col("label")).as("label")))
      val changed = stepped.filter(col("label") =!= col("prev")).count()
      graft.core.Checkpoints.release(ck)
      ck = stepped
      labels = stepped.select(col("node"), col("label"))
      if (changed == 0L) converged = true else r += 1
    }
    (labels, r)
  }

  /** Unrolled DuckDB oracle for [[run]] — generated from the SAME round
    * count. The caller must define `edges(src, dst)`; the final labels
    * are `l{rounds}`(node, label). The per-dst argmax replays the
    * (cnt DESC, lbl ASC) rule via row_number.
    */
  def oracleRounds(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges),
      l0 AS (SELECT node, node AS label FROM nodes)"""
    for (r <- 0 until rounds) {
      sb ++= s""",
      c$r AS (
        SELECT e.dst, l.label AS lbl, count(*) AS cnt
        FROM edges e JOIN l$r l ON l.node = e.src
        GROUP BY 1, 2),
      b$r AS (
        SELECT dst, lbl FROM (
          SELECT dst, lbl, row_number() OVER (
                   PARTITION BY dst ORDER BY cnt DESC, lbl ASC) AS rn
          FROM c$r)
        WHERE rn = 1),
      l${r + 1} AS MATERIALIZED (
        SELECT n.node, coalesce(b.lbl, l.label) AS label
        FROM nodes n JOIN l$r l USING (node)
        LEFT JOIN b$r b ON b.dst = n.node)"""
    }
    sb.toString
  }
}
