package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-14 graph/data-selection batch — wires the previously ungated
  * operators into the oracle gate (everything-gated convention):
  *
  *  - q197: synchronous label propagation (community detection over a
  *    symmetrized deterministic crawl graph) — operators/LabelProp.
  *  - q198: personalized (seeded) PageRank — TrustRank-style curation:
  *    teleport mass lands only on a trusted seed set, ranks measure
  *    proximity to it — operators/PageRank.runSeeded.
  *  - q199: dangling-mass-redistributing PageRank on a graph with
  *    PLANTED sink nodes (dst space wider than src space, so ~500 nodes
  *    never link out — the crawl-frontier shape where the drop-mass
  *    contract systematically deflates ranks) —
  *    operators/PageRank.runRedistributed.
  *  - q200: greedy k-center coreset selection (Gonzalez farthest-point)
  *    over quantized embeddings — the diversity-subset data-selection
  *    operator — operators/KCenter.
  *
  * Every oracle below is GENERATED from the same round/k count as the
  * Scala loop (the q166/q182 pattern — programmatic SQL on both sides,
  * never hand-copied), so all values gate by hash with no tolerance.
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  // -------------------------------------------------------------------
  // q197: label propagation, 4 synchronous rounds, symmetrized graph.
  // -------------------------------------------------------------------
  val q197LabelProp = Q(
    "q197_label_prop",
    (s, dir) => {
      val docs = t(s, dir)("documents")
      val fwd = docs.select((col("doc_id") % 997).as("src"),
        ((col("doc_id") * 31 + 7) % 997).as("dst"))
        .union(docs.select((col("doc_id") % 997).as("src"),
          ((col("doc_id") * 17 + 3) % 997).as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      // symmetrize for the classic undirected LPA semantics
      val edges = fwd.union(fwd.select(col("dst").as("src"),
        col("src").as("dst"))).distinct()
      graft.operators.LabelProp.run(edges, rounds = 4)
    },
    Some("""
      WITH fwd AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT doc_id % 997 AS src, (doc_id * 31 + 7) % 997 AS dst
          FROM documents
          UNION ALL
          SELECT doc_id % 997, (doc_id * 17 + 3) % 997 FROM documents)
        WHERE src <> dst),
      edges AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM fwd
          UNION ALL SELECT dst, src FROM fwd)),""" +
      graft.operators.LabelProp.oracleRounds(4) + """
      SELECT node, label FROM l4"""))

  // -------------------------------------------------------------------
  // q198: personalized PageRank seeded on node % 97 == 0, 6 rounds.
  // -------------------------------------------------------------------
  val q198PagerankSeeded = Q(
    "q198_pagerank_seeded",
    (s, dir) => {
      val docs = t(s, dir)("documents")
      val edges = docs.select((col("doc_id") % 1499).as("src"),
        ((col("doc_id") * 31 + 7) % 1499).as("dst"))
        .union(docs.select((col("doc_id") % 1499).as("src"),
          ((col("doc_id") * 17 + 3) % 1499).as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      val seeds = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .filter(col("node") % 97 === 0).distinct()
      graft.operators.PageRank.runSeeded(edges, seeds,
        scale = 1000000000L, rounds = 6)
    },
    Some("""
      WITH edges AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT doc_id % 1499 AS src, (doc_id * 31 + 7) % 1499 AS dst
          FROM documents
          UNION ALL
          SELECT doc_id % 1499, (doc_id * 17 + 3) % 1499 FROM documents)
        WHERE src <> dst),
      seeds AS (
        SELECT node FROM (
          SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges)
        WHERE node % 97 = 0),""" +
      graft.operators.PageRank.oracleRoundsSeeded(6, 1000000000L) + """
      SELECT node, rank FROM r6"""))

  // -------------------------------------------------------------------
  // q199: redistributing PageRank; dst space 2003 > src space 1499
  // plants ~500 dangling sink nodes.
  // -------------------------------------------------------------------
  val q199PagerankRedistributed = Q(
    "q199_pagerank_redistributed",
    (s, dir) => {
      val docs = t(s, dir)("documents")
      val edges = docs.select((col("doc_id") % 1499).as("src"),
        ((col("doc_id") * 31 + 7) % 2003).as("dst"))
        .union(docs.select((col("doc_id") % 1499).as("src"),
          ((col("doc_id") * 17 + 3) % 2003).as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      graft.operators.PageRank.runRedistributed(edges,
        scale = 1000000000L, rounds = 6)
    },
    Some("""
      WITH edges AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT doc_id % 1499 AS src, (doc_id * 31 + 7) % 2003 AS dst
          FROM documents
          UNION ALL
          SELECT doc_id % 1499, (doc_id * 17 + 3) % 2003 FROM documents)
        WHERE src <> dst),""" +
      graft.operators.PageRank.oracleRoundsRedistributed(6, 1000000000L) + """
      SELECT node, rank FROM r6"""),
    // headline since round 15 (verdict item 6): the 20-query set had
    // zero graph representation; this is the production PageRank shape
    // (iterative join+agg with dangling-mass redistribution), so a
    // graph-plan regression now breaks the bench, not just the gate
    headline = true)

  // -------------------------------------------------------------------
  // q200: greedy k-center (k=8) over floor(x·64)-quantized embeddings.
  // -------------------------------------------------------------------
  val q200KcenterCoreset = Q(
    "q200_kcenter_coreset",
    (s, dir) => {
      val pts = t(s, dir)("embeddings").select(
        col("vec_id").as("id"),
        expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))").as("vq"))
      graft.operators.KCenter.run(pts, k = 8)
        .select(col("id"), col("center_id"), col("dist"))
    },
    Some("""
      WITH pts AS MATERIALIZED (
        SELECT vec_id AS id,
               [CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)
                for x in embedding] AS vq
        FROM embeddings),""" +
      graft.operators.KCenter.oracleRounds(8) + """
      SELECT id, center_id, mind AS dist FROM st7"""))

  // -------------------------------------------------------------------
  // q203: label propagation run to CONVERGENCE (round-15; k-core got
  // its fixpoint twin in r14, label prop now has one too). The oracle
  // unrolls exactly maxRounds=20 rounds and is ALWAYS equal: if the
  // graph converges earlier, the update is a fixpoint and the extra
  // unrolled rounds are no-ops; if it 2-cycles (sync LPA on bipartite
  // structure), both sides run exactly 20 rounds. Different modulus
  // than q197 so the two gates exercise different graphs.
  // -------------------------------------------------------------------
  val q203LabelPropConverged = Q(
    "q203_labelprop_converged",
    (s, dir) => {
      val docs = t(s, dir)("documents")
      val fwd = docs.select((col("doc_id") % 1201).as("src"),
        ((col("doc_id") * 31 + 7) % 1201).as("dst"))
        .union(docs.select((col("doc_id") % 1201).as("src"),
          ((col("doc_id") * 17 + 3) % 1201).as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      val edges = fwd.union(fwd.select(col("dst").as("src"),
        col("src").as("dst"))).distinct()
      graft.operators.LabelProp.runConverged(edges, maxRounds = 20)._1
    },
    Some("""
      WITH fwd AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT doc_id % 1201 AS src, (doc_id * 31 + 7) % 1201 AS dst
          FROM documents
          UNION ALL
          SELECT doc_id % 1201, (doc_id * 17 + 3) % 1201 FROM documents)
        WHERE src <> dst),
      edges AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM fwd
          UNION ALL SELECT dst, src FROM fwd)),""" +
      graft.operators.LabelProp.oracleRounds(20) + """
      SELECT node, label FROM l20"""))

  // -------------------------------------------------------------------
  // q204: BATCHED k-center (round-15) — provably equal to the
  // sequential Gonzalez loop, so it gates against the SAME unrolled
  // sequential oracle as q200 (equality is the contract; m=3 forces
  // multiple batch rounds with early stops at gate scale).
  // -------------------------------------------------------------------
  val q204KcenterBatched = Q(
    "q204_kcenter_batched",
    (s, dir) => {
      val pts = t(s, dir)("embeddings").select(
        col("vec_id").as("id"),
        expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))").as("vq"))
      graft.operators.KCenter.runBatched(pts, k = 8, m = 3)
        .select(col("id"), col("center_id"), col("dist"))
    },
    Some("""
      WITH pts AS MATERIALIZED (
        SELECT vec_id AS id,
               [CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)
                for x in embedding] AS vq
        FROM embeddings),""" +
      graft.operators.KCenter.oracleRounds(8) + """
      SELECT id, center_id, mind AS dist FROM st7"""))

  val qs: Seq[Q] = Seq(q197LabelProp, q198PagerankSeeded,
    q199PagerankRedistributed, q200KcenterCoreset, q203LabelPropConverged,
    q204KcenterBatched)
}
