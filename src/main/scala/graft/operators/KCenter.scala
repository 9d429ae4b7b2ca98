package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SqDistLong

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal) over quantized integer embedding vectors — the classic
  * data-selection operator a training pipeline uses to pick a maximally
  * diverse subset (coreset) of a corpus: each round adds the point
  * farthest from every center chosen so far, giving a 2-approximation
  * of the optimal k-center cover.
  *
  * Arithmetic contract (cross-engine, every value a Long):
  *  - vectors are quantized longs (the q144 pattern upstream);
  *  - dist(p, c) = Σ_i (p_i − c_i)² accumulated in Long
  *    ([[graft.functions.SqDistLong]] — order-independent integer sums);
  *  - center_0 = the point with the smallest id;
  *  - center_{r+1} = argmax over points of min_{c ≤ r} dist(p, c),
  *    ties broken toward the SMALLEST id.
  *
  * Scale shape: k passes over the data (the unavoidable Gonzalez
  * structure), each pass ONE TakeOrdered(1) over a running-min column —
  * `mind` is folded incrementally as `least(mind, dist(p, c_new))` and
  * localCheckpointed each round, so round r costs one scan of the
  * checkpointed (id, vq, mind) frame + one d-element distance per row,
  * never r distances. The only driver traffic is one (id, vq) row per
  * round — O(k·d), never corpus-bound. No crossJoin anywhere.
  */
object KCenter {

  /** Run greedy k-center over a frame with long `id` and array<long>
    * `vq` columns. Returns the per-point assignment after all k centers
    * are chosen: (id, center_id, dist) where center_id is the nearest
    * center (ties toward the smallest center ROUND — i.e. the earliest
    * chosen center wins, matching the incremental fold: a later center
    * replaces the running nearest only on a STRICT improvement).
    */
  def run(points: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "kcenter: k >= 1")
    val sqd = (a: Column, b: Column) => SqDistLong(a, b)

    val first = points.orderBy(col("id").asc).limit(1)
      .select(col("id"), col("vq")).collect()(0)
    var centers = Vector[(Long, Seq[Long])](
      (first.getLong(0), first.getSeq[Long](1)))

    // running state: nearest-center id + distance so far, folded one
    // center per round (strict < keeps the EARLIEST center on ties)
    def fold(df: DataFrame, cid: Long, cvec: Seq[Long]): DataFrame = {
      val d = sqd(col("vq"), typedlit(cvec))
      df.select(col("id"), col("vq"),
        when(d < col("mind"), d).otherwise(col("mind")).as("mind"),
        when(d < col("mind"), lit(cid)).otherwise(col("center_id"))
          .as("center_id"))
    }

    var state = points.select(col("id"), col("vq"),
        sqd(col("vq"), typedlit(centers.head._2)).as("mind"),
        lit(centers.head._1).as("center_id"))
      .localCheckpoint(true)

    var r = 1
    while (r < k) {
      val next = state.orderBy(col("mind").desc, col("id").asc).limit(1)
        .select(col("id"), col("vq")).collect()(0)
      val (cid, cvec) = (next.getLong(0), next.getSeq[Long](1))
      centers :+= ((cid, cvec))
      state = fold(state, cid, cvec).localCheckpoint(true)
      r += 1
    }
    state.select(col("id"), col("center_id"), col("mind").as("dist"))
  }

  /** Unrolled DuckDB oracle for [[run]] — generated from the SAME k so
    * the SQL and the Spark loop can never drift. The caller must define
    * a CTE `pts(id, vq)` with vq a BIGINT list; the final state is
    * `st{k-1}`(id, center_id, mind). Distances replay the identical
    * integer Σ(p−c)² via list arithmetic; the argmax replays the
    * (mind DESC, id ASC) TakeOrdered; the fold replays the strict-<
    * tie rule.
    */
  def oracleRounds(k: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """
      c0 AS (SELECT id, vq FROM pts ORDER BY id ASC LIMIT 1),
      st0 AS MATERIALIZED (
        SELECT p.id, p.vq,
               CAST(list_sum([(p.vq[i] - c.vq[i]) * (p.vq[i] - c.vq[i])
                              for i in generate_series(1, len(p.vq))])
                    AS BIGINT) AS mind,
               c.id AS center_id
        FROM pts p, c0 c)"""
    for (r <- 1 until k) {
      val prev = s"st${r - 1}"
      sb ++= s""",
      c$r AS (SELECT p.id, p.vq FROM $prev s JOIN pts p USING (id)
              ORDER BY s.mind DESC, s.id ASC LIMIT 1),
      d$r AS (
        SELECT s.id, s.vq, s.mind, s.center_id,
               CAST(list_sum([(s.vq[i] - c.vq[i]) * (s.vq[i] - c.vq[i])
                              for i in generate_series(1, len(s.vq))])
                    AS BIGINT) AS nd,
               c.id AS nid
        FROM $prev s, c$r c),
      st$r AS MATERIALIZED (
        SELECT id, vq,
               CASE WHEN nd < mind THEN nd ELSE mind END AS mind,
               CASE WHEN nd < mind THEN nid ELSE center_id END AS center_id
        FROM d$r)"""
    }
    sb.toString
  }
}
