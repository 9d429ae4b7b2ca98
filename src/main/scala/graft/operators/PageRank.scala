package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative link-analysis rank (PageRank, Page/Brin/Motwani/Winograd
  * 1999) in EXACT integer arithmetic with a fixed round count — the
  * crawl-graph quality signal a web-corpus curation pipeline weights
  * documents by (the reference's corpus tooling stops at static graph
  * metrics; this is the iterative centrality companion to the q173/q176
  * triangle family).
  *
  * Arithmetic contract (cross-engine replayable, every value a Long):
  *
  *  - rank_0(v) = scale for every node
  *  - contrib_r(u) = rank_r(u) div outdeg(u)   (truncating; positive)
  *  - rank_{r+1}(v) = (scale*(100-d)) div 100
  *                    + (d * Σ_{u→v} contrib_r(u)) div 100
  *
  * with d the damping numerator (default 85). All divisions are
  * positive-domain truncating division, so Scala `/` ≡ DuckDB `//`
  * (the q166 lesson about sign-decomposed division never triggers).
  * Mass lost to div-remainders and to dangling nodes (outdeg 0) is
  * deliberately NOT redistributed: both engines drop it identically,
  * and the fixed-round unrolled oracle replays the recurrence term for
  * term — rank VALUES gate by hash, no tolerance anywhere.
  *
  * Scale shape (the CC/BpeTrainer iteration pattern):
  *  - `edges` with its outdeg column is computed once, repartitioned on
  *    src, and cached — the static side of every round's join.
  *  - Each round is one hash join (ranks ⋈ edges on src) + one
  *    partial-aggregated groupBy(dst) + one left join back to the node
  *    universe; nothing ever collects to the driver.
  *  - Each round `localCheckpoint`s the new ranks (eager) — without it
  *    the nested AQE plan string OOMs the driver long before the data
  *    does (the 30-round BPE lineage lesson, CLAUDE.md round-11).
  *
  * Overflow guard: Σ contrib over all in-edges of one node is bounded
  * by the total mass n*scale, so d * Σ stays in Long while
  * n * scale <= Long.MaxValue / 100 — `require`d loudly up front.
  */
object PageRank {

  /** Run `rounds` exact-integer PageRank rounds over a directed edge
    * list. Returns (node, rank) for every node appearing as src or dst.
    *
    * @param edges   DataFrame with long columns `src`, `dst` (parallel
    *                edges allowed — each contributes separately, like a
    *                weighted link; dedup upstream if unwanted)
    * @param scale   initial integer rank per node (rank_0)
    * @param rounds  fixed iteration count (the oracle unrolls this many)
    * @param damping damping numerator out of 100 (default 85)
    */
  def run(
      edges: DataFrame,
      scale: Long = 1000000000L,
      rounds: Int = 8,
      damping: Int = 85,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ck = graft.core.Checkpoints.saver(edges, checkpointDir)

    val nodes = ck(edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .repartition(parts, col("node")))
    val nNodes = nodes.count()
    require(nNodes > 0, "pagerank: empty graph")
    require(scale > 0 && nNodes <= Long.MaxValue / 100 / scale,
      s"pagerank: n*scale*$damping overflows Long (n=$nNodes scale=$scale)")

    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val linked = ck(edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(parts, col("src")))

    val base = scale * (100 - damping) / 100
    var ranks = nodes.withColumn("rank", lit(scale))
    var r = 0
    while (r < rounds) {
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division — the
      // truncating integer form must be the SQL div operator to stay
      // exact (and to mirror DuckDB's positive-domain `//`)
      val sums = ranks.join(linked, col("node") === col("src"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("m"))
      val stepped = ck(nodes.join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"${base}L + ($damping * coalesce(m, 0L)) div 100")
            .as("rank")))
      // release the superseded round (no-op on the round-0 projection)
      graft.core.Checkpoints.release(ranks)
      ranks = stepped
      r += 1
    }
    ranks
  }

  /** Dangling-mass-redistributing PageRank — the production contract:
    * [[run]] deliberately DROPS the rank mass parked on sink pages
    * (outdeg 0), which systematically deflates every rank on crawl
    * frontiers where most discovered pages are still unfetched sinks.
    * This variant redistributes it uniformly, staying exact-integer:
    *
    *  - D_r       = Σ_{outdeg(v)=0} rank_r(v)   (the dangling mass)
    *  - share_r   = D_r div n                    (truncating, positive)
    *  - rank_{r+1}(v) = scale·(100−d) div 100
    *                    + (d · (Σ_{u→v} contrib_r(u) + share_r)) div 100
    *
    * share_r is computed IN-PLAN (r20 optimization round): the node
    * universe carries a static `is_dang` flag (node never appears as
    * src), each round's dangling mass is a one-row aggregate over the
    * previous ranks, and the share attaches by broadcast cross join —
    * the same exact Long the old per-round `head()` pulled to the
    * driver, but with ZERO driver actions inside the loop (one eager
    * checkpoint per round is the loop's only action; guide §5 — no
    * driver round-trips in query paths). Measured at sf0.1: 6 dangling
    * collect jobs removed, q199 ≈2.6→≈2.1 s isolated. The oracle
    * replays share_r as a single-row CTE cross-joined into the next
    * round — textually UNCHANGED by this rewrite, so rank VALUES still
    * gate by hash with no tolerance. Overflow: the total mass is
    * still bounded by n·scale (redistribution never creates mass), so
    * the [[run]] guard applies unchanged.
    */
  def runRedistributed(
      edges: DataFrame,
      scale: Long = 1000000000L,
      rounds: Int = 8,
      damping: Int = 85,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ck = graft.core.Checkpoints.saver(edges, checkpointDir)

    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // node universe with the static dangling flag folded in (replaces
    // the separate checkpointed dangling frame + per-round semi-join)
    val nodes = ck(edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .join(outdeg.select(col("src").as("node"), lit(1L).as("has_out")),
        Seq("node"), "left")
      .select(col("node"),
        col("has_out").isNull.cast("long").as("is_dang"))
      .repartition(parts, col("node")))
    val nNodes = nodes.count()
    require(nNodes > 0, "pagerank: empty graph")
    require(scale > 0 && nNodes <= Long.MaxValue / 100 / scale,
      s"pagerank: n*scale*$damping overflows Long (n=$nNodes scale=$scale)")

    val linked = ck(edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(parts, col("src")))

    val base = scale * (100 - damping) / 100
    // ranks carries (node, is_dang, rank); is_dang is 8 bytes/row of
    // checkpoint state in exchange for no per-round dangling join
    var ranks = nodes.withColumn("rank", lit(scale))
    var r = 0
    while (r < rounds) {
      // share_r = (Σ_{is_dang} rank_r) div n as a one-row frame; the
      // broadcast cross join embeds the single Long per task (a 1-row
      // broadcast with a scalar payload — not the r16 big-payload BNLJ
      // trap)
      val share = ranks.agg(
        expr(s"coalesce(sum(if(is_dang = 1, rank, 0L)), 0L)" +
          s" div ${nNodes}L").as("share"))
      val sums = ranks.join(linked, col("node") === col("src"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("m"))
      val stepped = ck(nodes.join(sums, col("node") === col("dst"), "left")
        .crossJoin(broadcast(share))
        .select(col("node"), col("is_dang"),
          expr(s"${base}L + ($damping * (coalesce(m, 0L) + share))" +
            " div 100").as("rank")))
      graft.core.Checkpoints.release(ranks)
      ranks = stepped
      r += 1
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Unrolled DuckDB oracle for [[runRedistributed]]. The caller must
    * define `edges(src, dst)`; final ranks are `r{rounds}`(node, rank).
    * share_r is a single-row CTE (dangling sum // n) cross-joined into
    * round r+1 — the same scalar the Spark loop pulls to the driver.
    */
  def oracleRoundsRedistributed(
      rounds: Int, scale: Long, damping: Int = 85): String = {
    val base = scale * (100 - damping) / 100
    val sb = new StringBuilder
    sb ++= s"""
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges),
      ncount AS (SELECT count(*) AS n FROM nodes),
      outdeg AS MATERIALIZED (
        SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
      linked AS MATERIALIZED (
        SELECT e.src, e.dst, d.outdeg
        FROM edges e JOIN outdeg d USING (src)),
      dang AS MATERIALIZED (
        SELECT n.node FROM nodes n
        LEFT JOIN outdeg o ON o.src = n.node
        WHERE o.src IS NULL),
      r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank FROM nodes)"""
    for (r <- 0 until rounds) {
      sb ++= s""",
      sh$r AS (
        SELECT CAST(coalesce((SELECT sum(r$r.rank)
                              FROM dang JOIN r$r USING (node)), 0)
                    // ncount.n AS BIGINT) AS share
        FROM ncount),
      s$r AS (
        SELECT l.dst AS node, CAST(sum(r$r.rank // l.outdeg) AS BIGINT) AS m
        FROM linked l JOIN r$r ON r$r.node = l.src
        GROUP BY 1),
      r${r + 1} AS MATERIALIZED (
        SELECT n.node,
               CAST($base + ($damping * (coalesce(s$r.m, 0) + sh$r.share))
                    // 100 AS BIGINT) AS rank
        FROM nodes n LEFT JOIN s$r USING (node) CROSS JOIN sh$r)"""
    }
    sb.toString
  }

  /** Personalized PageRank: teleport mass lands ONLY on the seed set —
    * the "rank relative to a trusted set" centrality (TrustRank-style
    * curation: seed with known-good domains, rank the crawl by
    * proximity). Identical integer contract to [[run]] except:
    *
    *  - rank_0(v) = scale for seeds, 0 otherwise
    *  - rank_{r+1}(v) = seed(v)·(scale·(100−d) div 100)
    *                    + (d · Σ_{u→v} contrib_r(u)) div 100
    *
    * `seeds` is a one-column (node) frame, broadcast into the node
    * universe once — at cluster scale the seed list is always tiny
    * relative to the graph.
    */
  def runSeeded(
      edges: DataFrame,
      seeds: DataFrame,
      scale: Long = 1000000000L,
      rounds: Int = 8,
      damping: Int = 85,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ck = graft.core.Checkpoints.saver(edges, checkpointDir)

    val nodes = ck(edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .join(broadcast(seeds.select(col("node"), lit(1L).as("is_seed"))),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .repartition(parts, col("node")))
    val nNodes = nodes.count()
    require(nNodes > 0, "ppr: empty graph")
    require(scale > 0 && nNodes <= Long.MaxValue / 100 / scale,
      s"ppr: n*scale*$damping overflows Long (n=$nNodes scale=$scale)")

    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val linked = ck(edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(parts, col("src")))

    val base = scale * (100 - damping) / 100
    var ranks = nodes.withColumn("rank", col("is_seed") * lit(scale))
      .select("node", "rank")
    var r = 0
    while (r < rounds) {
      val sums = ranks.join(linked, col("node") === col("src"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("m"))
      val stepped = ck(nodes.join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"is_seed * ${base}L + ($damping * coalesce(m, 0L)) div 100")
            .as("rank")))
      graft.core.Checkpoints.release(ranks)
      ranks = stepped
      r += 1
    }
    ranks
  }

  /** Unrolled DuckDB oracle for [[runSeeded]]. The caller must define
    * CTEs `edges(src, dst)` AND `seeds(node)`; final ranks are
    * `r{rounds}`(node, rank).
    */
  def oracleRoundsSeeded(rounds: Int, scale: Long, damping: Int = 85): String = {
    val base = scale * (100 - damping) / 100
    val sb = new StringBuilder
    sb ++= s"""
      nodes AS MATERIALIZED (
        SELECT node, CAST(CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END
                          AS BIGINT) AS is_seed
        FROM (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges) n
        LEFT JOIN (SELECT DISTINCT node FROM seeds) s USING (node)),
      outdeg AS MATERIALIZED (
        SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
      linked AS MATERIALIZED (
        SELECT e.src, e.dst, d.outdeg
        FROM edges e JOIN outdeg d USING (src)),
      r0 AS (SELECT node, CAST(is_seed * $scale AS BIGINT) AS rank
             FROM nodes)"""
    for (r <- 0 until rounds) {
      sb ++= s""",
      s$r AS (
        SELECT l.dst AS node, CAST(sum(r$r.rank // l.outdeg) AS BIGINT) AS m
        FROM linked l JOIN r$r ON r$r.node = l.src
        GROUP BY 1),
      r${r + 1} AS MATERIALIZED (
        SELECT n.node,
               CAST(n.is_seed * $base
                    + ($damping * coalesce(s$r.m, 0)) // 100
                    AS BIGINT) AS rank
        FROM nodes n LEFT JOIN s$r USING (node))"""
    }
    sb.toString
  }

  /** The unrolled DuckDB oracle for [[run]] — generated from the SAME
    * round count so the SQL text and the Spark loop can never drift
    * (the q166/q181 suffix-parameterized chain pattern). `edgesCte`
    * must define a CTE named `edges(src, dst)`; the caller appends the
    * final SELECT over `r{rounds}`(node, rank). Multi-referenced CTEs
    * are MATERIALIZED — DuckDB re-inlines them per round otherwise
    * (the 50-round BPE "Too many open files" lesson).
    */
  def oracleRounds(rounds: Int, scale: Long, damping: Int = 85): String = {
    val base = scale * (100 - damping) / 100
    val sb = new StringBuilder
    sb ++= s"""
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges),
      outdeg AS MATERIALIZED (
        SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
      linked AS MATERIALIZED (
        SELECT e.src, e.dst, d.outdeg
        FROM edges e JOIN outdeg d USING (src)),
      r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank FROM nodes)"""
    for (r <- 0 until rounds) {
      sb ++= s""",
      s$r AS (
        SELECT l.dst AS node, CAST(sum(r$r.rank // l.outdeg) AS BIGINT) AS m
        FROM linked l JOIN r$r ON r$r.node = l.src
        GROUP BY 1),
      r${r + 1} AS MATERIALIZED (
        SELECT n.node,
               CAST($base + ($damping * coalesce(s$r.m, 0)) // 100
                    AS BIGINT) AS rank
        FROM nodes n LEFT JOIN s$r USING (node))"""
    }
    sb.toString
  }
}
