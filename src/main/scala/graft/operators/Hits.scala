package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999) in EXACT integer
  * arithmetic with a fixed round count — the directional companion to
  * [[PageRank]]: PageRank scores one centrality; HITS separates
  * AUTHORITIES (pages many good hubs point at — the quality-content
  * signal corpus curation up-weights) from HUBS (pages that point at
  * many good authorities — link farms and directories curation
  * down-weights). Reference corpus tooling stops at static degree
  * metrics; this is the mutually-recursive eigenvector pair.
  *
  * Arithmetic contract (cross-engine replayable, every value a Long):
  *
  *  - hub_0(v) = 2^20 for every node
  *  - rawAuth_{r+1}(v) = Σ_{u→v} hub_r(u)
  *  - auth_{r+1}(v)    = rawAuth_{r+1}(v) div dA, with
  *    dA = max(1, max_v |rawAuth_{r+1}(v)| div 2^20)
  *  - rawHub_{r+1}(v)  = Σ_{v→w} auth_{r+1}(w), renormalized the same
  *    way by its own dH
  *
  * The div-by-max renormalization is the [[PcaPower]] power-iteration
  * pattern: values re-enter [0, 2^21) every half-round, so a sum over
  * any in/out-neighborhood is bounded by n·2^21 — Long-safe while
  * n <= 2^42 — and every division is positive-domain truncating
  * (Scala `div` ≡ DuckDB `//`; nothing here is ever negative). The
  * fixed-round unrolled oracle replays the recurrence term for term,
  * including the renorm scalars, so hub/auth VALUES gate by hash with
  * no tolerance.
  *
  * Scale shape (the PageRank/CC iteration pattern): the edge list is
  * cached once; each half-round is one hash join (scores ⋈ edges) +
  * one partially-aggregated groupBy + a node-universe left join + one
  * scalar max aggregate (a single Long to the driver — the bounded-
  * collect family). Each round `localCheckpoint`s (the BPE lineage
  * lesson). At cluster scale the two join directions want the edge
  * list bucketed twice (by src and by dst); at fixture scale one cache
  * serves both.
  */
object Hits {

  val Target: Long = 1L << 20

  /** Run `rounds` exact-integer HITS rounds over a directed edge list.
    * Returns (node, hub, auth) for every node appearing as src or dst.
    */
  def run(edges: DataFrame, rounds: Int = 8,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"hits: rounds must be >= 1, got $rounds")
    val spark = edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ck = graft.core.Checkpoints.saver(edges, checkpointDir)

    val e = ck(edges.select(col("src"), col("dst"))
      .repartition(parts, col("src")))
    val nodes = ck(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .repartition(parts, col("node")))
    require(nodes.count() > 0, "hits: empty graph")

    // returns (renormed select, the raw checkpoint to release once the
    // caller has checkpointed the select)
    def renorm(raw0: DataFrame, c: String): (DataFrame, DataFrame) = {
      // materialize the raw aggregate ONCE: the driver-side max action
      // and the renorm select would otherwise each recompute the
      // scores-join+groupBy (round-13 advice)
      val raw = ck(raw0)
      // one Long to the driver per half-round — the oracle computes the
      // identical max over the identical pre-coalesce relation
      val mx = raw.agg(max(abs(col(c)))).head().getLong(0)
      val dv = math.max(1L, mx / Target)
      (nodes.join(raw.withColumnRenamed(c, "raw"),
          col("node") === col("n"), "left")
        .select(col("node"),
          expr(s"coalesce(raw, 0L) div ${dv}L").as(c)), raw)
    }

    var hub = nodes.withColumn("hub", lit(Target))
    var auth: DataFrame = null
    var r = 0
    while (r < rounds) {
      val rawAuth = hub.join(e, col("node") === col("src"))
        .groupBy(col("dst").as("n")).agg(sum(col("hub")).as("auth"))
      val (authSel, rawA) = renorm(rawAuth, "auth")
      val newAuth = ck(authSel)
      // superseded blocks: the half-round raw aggregate and last
      // round's auth (round-0 null / projections no-op) — r14-advice
      // pattern, Dataset.unpersist cannot reach localCheckpoint storage
      graft.core.Checkpoints.release(rawA)
      if (auth != null) graft.core.Checkpoints.release(auth)
      auth = newAuth
      val rawHub = auth.join(e, col("node") === col("dst"))
        .groupBy(col("src").as("n")).agg(sum(col("auth")).as("hub"))
      val (hubSel, rawH) = renorm(rawHub, "hub")
      val newHub = ck(hubSel)
      graft.core.Checkpoints.release(rawH)
      graft.core.Checkpoints.release(hub)
      hub = newHub
      r += 1
    }
    hub.join(auth, "node").select(col("node"), col("hub"), col("auth"))
  }

  /** The unrolled DuckDB oracle for [[run]] — generated from the SAME
    * round count so the SQL text and the Spark loop can never drift
    * (the PageRank.oracleRounds pattern). The caller must define a CTE
    * named `edges(src, dst)` and appends the final
    * `SELECT node, hub, auth FROM h{rounds} JOIN a{rounds} USING (node)`.
    * Multi-referenced CTEs are MATERIALIZED (the 50-round BPE
    * re-inlining lesson).
    */
  def oracleRounds(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges),
      h0 AS (SELECT node, CAST($Target AS BIGINT) AS hub FROM nodes)"""
    for (r <- 0 until rounds) {
      sb ++= s""",
      ar${r + 1} AS MATERIALIZED (
        SELECT e.dst AS n, CAST(sum(h$r.hub) AS BIGINT) AS raw
        FROM edges e JOIN h$r ON h$r.node = e.src
        GROUP BY 1),
      ad${r + 1} AS (
        SELECT greatest(1, max(abs(raw)) // $Target) AS dv FROM ar${r + 1}),
      a${r + 1} AS MATERIALIZED (
        SELECT nd.node,
               CAST(coalesce(ar${r + 1}.raw, 0) // ad${r + 1}.dv AS BIGINT)
                 AS auth
        FROM nodes nd
        LEFT JOIN ar${r + 1} ON ar${r + 1}.n = nd.node
        CROSS JOIN ad${r + 1}),
      hr${r + 1} AS MATERIALIZED (
        SELECT e.src AS n, CAST(sum(a${r + 1}.auth) AS BIGINT) AS raw
        FROM edges e JOIN a${r + 1} ON a${r + 1}.node = e.dst
        GROUP BY 1),
      hd${r + 1} AS (
        SELECT greatest(1, max(abs(raw)) // $Target) AS dv FROM hr${r + 1}),
      h${r + 1} AS MATERIALIZED (
        SELECT nd.node,
               CAST(coalesce(hr${r + 1}.raw, 0) // hd${r + 1}.dv AS BIGINT)
                 AS hub
        FROM nodes nd
        LEFT JOIN hr${r + 1} ON hr${r + 1}.n = nd.node
        CROSS JOIN hd${r + 1})"""
    }
    sb.toString
  }
}
