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
  def run(points: DataFrame, k: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "kcenter: k >= 1")
    val ck = graft.core.Checkpoints.saver(points, checkpointDir)
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

    var state = ck(points.select(col("id"), col("vq"),
        sqd(col("vq"), typedlit(centers.head._2)).as("mind"),
        lit(centers.head._1).as("center_id")))

    var r = 1
    while (r < k) {
      val next = state.orderBy(col("mind").desc, col("id").asc).limit(1)
        .select(col("id"), col("vq")).collect()(0)
      val (cid, cvec) = (next.getLong(0), next.getSeq[Long](1))
      centers :+= ((cid, cvec))
      val stepped = ck(fold(state, cid, cvec))
      graft.core.Checkpoints.release(state) // no O(k) block accrual
      state = stepped
      r += 1
    }
    state.select(col("id"), col("center_id"), col("mind").as("dist"))
  }

  /** BATCHED selection, PROVABLY equal to [[run]] (the BpeTrainer
    * ranked-prefix batching argument applied to Gonzalez): k sequential
    * TakeOrdered(1) jobs are barrier-latency-bound at production
    * coreset sizes (k ≥ 10³ = 10³ job launches over the full corpus),
    * so each round instead fetches the TOP-m spread candidates in ONE
    * TakeOrdered(m) and accepts them greedily on the driver while the
    * next acceptance is provable:
    *
    *  - candidate 1 of a fresh batch IS the sequential argmax (same
    *    (mind DESC, id ASC) order, same frame);
    *  - after accepting a center, the remaining candidates' running
    *    minds are re-folded ON THE DRIVER with the identical Long
    *    Σ(p−c)² arithmetic (their vectors are in hand);
    *  - every point OUTSIDE the batch has old mind ≤ b (the m-th
    *    candidate's old mind — TakeOrdered order) and updated mind ≤
    *    old, so the best remaining in-batch candidate is accepted iff
    *    its updated mind > b, or == b with id < the m-th candidate's id
    *    (out-of-batch ties all carry LARGER ids than the m-th row, by
    *    the same ordering) — otherwise the batch stops and the state
    *    re-folds distributively. Ties and strict-< semantics are
    *    bit-identical to the sequential loop, so outputs are EQUAL,
    *    never approximate (KCenterBatchedSpec + the macro subsample
    *    gate pin it; q204 gates it against q200's sequential oracle).
    *
    * Distributed work per outer round: one TakeOrdered(m) + one fold
    * select of all accepted centers + one localCheckpoint — spread-out
    * data accepts many centers per batch (far-apart candidates rarely
    * invalidate each other); adversarial clustered data degrades to
    * ≥ 1 per batch, never worse than sequential.
    */
  def runBatched(points: DataFrame, k: Int, m: Int = 64,
      checkpointDir: Option[String] = None): DataFrame =
    runBatchedStats(points, k, m, checkpointDir)._1

  /** [[runBatched]] plus (outerRounds, centersChosen) — the macro gates
    * that batching actually amortizes the TakeOrdered job count. */
  def runBatchedStats(points: DataFrame, k: Int,
      m: Int = 64,
      checkpointDir: Option[String] = None): (DataFrame, Int, Int) = {
    require(k >= 1, "kcenter: k >= 1")
    require(m >= 1, "kcenter: m >= 1")
    val ck = graft.core.Checkpoints.saver(points, checkpointDir)
    val sqd = (a: Column, b: Column) => SqDistLong(a, b)
    def distL(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    val first = points.orderBy(col("id").asc).limit(1)
      .select(col("id"), col("vq")).collect()(0)
    var nCenters = 1

    def fold(df: DataFrame, cid: Long, cvec: Seq[Long]): DataFrame = {
      val d = sqd(col("vq"), typedlit(cvec))
      df.select(col("id"), col("vq"),
        when(d < col("mind"), d).otherwise(col("mind")).as("mind"),
        when(d < col("mind"), lit(cid)).otherwise(col("center_id"))
          .as("center_id"))
    }

    var state = ck(points.select(col("id"), col("vq"),
        sqd(col("vq"), typedlit(first.getSeq[Long](1))).as("mind"),
        lit(first.getLong(0)).as("center_id")))

    var outer = 0
    var exhausted = false
    while (nCenters < k && !exhausted) {
      val cand = state.orderBy(col("mind").desc, col("id").asc).limit(m)
        .select(col("id"), col("vq"), col("mind")).collect()
      if (cand.isEmpty) exhausted = true // fewer points than centers
      else {
        outer += 1
      val full = cand.length == m
      val bMind = if (full) cand.last.getLong(2) else Long.MinValue
      val bId = if (full) cand.last.getLong(0) else Long.MaxValue
      val buf = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Array[Long], Long)]
      cand.foreach(r => buf += ((r.getLong(0),
        r.getSeq[Long](1).toArray, r.getLong(2))))
      var accepted = Vector.empty[(Long, Array[Long])]
      var stop = false
      while (!stop && nCenters + accepted.size < k && buf.nonEmpty) {
        // argmax (mind desc, id asc) among remaining candidates
        var bi = 0
        var i = 1
        while (i < buf.length) {
          if (buf(i)._3 > buf(bi)._3 ||
            (buf(i)._3 == buf(bi)._3 && buf(i)._1 < buf(bi)._1)) bi = i
          i += 1
        }
        val best = buf(bi)
        val provable = accepted.isEmpty || // fresh-batch head = argmax
          best._3 > bMind || (best._3 == bMind && best._1 < bId)
        if (!provable) stop = true
        else {
          accepted :+= ((best._1, best._2))
          buf.remove(bi)
          var j = 0
          while (j < buf.length) {
            val d = distL(buf(j)._2, best._2)
            if (d < buf(j)._3) buf(j) = (buf(j)._1, buf(j)._2, d)
            j += 1
          }
        }
      }
      var st = state
      accepted.foreach { case (cid, cvec) =>
        st = fold(st, cid, cvec.toSeq)
      }
      val stepped = ck(st)
      graft.core.Checkpoints.release(state)
      state = stepped
      nCenters += accepted.size
      }
    }
    (state.select(col("id"), col("center_id"), col("mind").as("dist")),
      outer, nCenters)
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
