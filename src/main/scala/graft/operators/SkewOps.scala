package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §7.4.7 / the 100 TB posture). AQE
  * handles sort-merge-join skew automatically; these cover the two cases
  * it does not: skewed high-cardinality aggregation state and broadcast-
  * ineligible skewed joins.
  */
object SkewOps {

  /** Deterministic per-row salt in [0, salt): a hash of the row's own
    * columns. spark_partition_id / monotonically_increasing_id would be
    * cheaper but change on task retry after shuffle-fetch failure,
    * silently re-routing rows across reduce partitions (the SPARK-23207
    * class of hazard); a row hash keeps the same uniform spread with none
    * of the nondeterminism. Duplicate rows sharing a salt is fine — the
    * goal is spreading a hot KEY, and a hot key's rows differ in payload.
    */
  private def rowSalt(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt.toLong))

  /** Two-phase salted aggregation: partial aggregate on (keys, salt) —
    * spreading one hot key over `salt` reducers — then final aggregate on
    * the keys. `partial` and `fin` must compose to the intended aggregate
    * (sum/sum, count/sum, min/min, ...).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      salt: Int,
      partial: Seq[(String, Column)],
      fin: Seq[(String, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt", rowSalt(df, salt))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(fin.head._2(col(fin.head._1)).as(fin.head._1),
        fin.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side
    * that cannot be broadcast: left rows get a random salt in [0, salt),
    * right rows are replicated `salt` times, and the join key becomes
    * (key, salt) — one hot key now lands on `salt` different reducers.
    * Blanket form: EVERY right row replicates `salt`×; at 100 TB with a
    * non-tiny right side prefer [[saltedJoinHotKeys]], which replicates
    * only the keys that are actually hot.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      key: String, salt: Int): DataFrame = {
    val l = left.withColumn("_salt", rowSalt(left, salt))
    val r = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Left-side keys whose row count reaches `threshold` — the candidates
    * that actually need salting. One map-side-combined count aggregate
    * (algebraic, so the hot key itself cannot skew the partials), and the
    * output is at most |left| / threshold keys — small by construction,
    * hence broadcastable.
    */
  def hotKeys(left: DataFrame, key: String, threshold: Long): DataFrame =
    left.groupBy(key)
      .agg(count(lit(1)).as("_freq"))
      .filter(col("_freq") >= threshold)
      .select(key)

  /** Hot-key-only salted join — the 100 TB-safe refinement of
    * [[saltedJoin]]: a cheap count pass finds the left keys at or above
    * `hotThreshold`; ONLY those keys take salted routing (right rows for
    * hot keys replicate `salt`×), while cold keys keep a constant salt 0
    * on both sides — so the whole thing stays ONE join with ONE scan per
    * side (a filter-into-two-paths split would rescan each input twice).
    * The hot-key set is broadcast to tag both sides, adding no shuffle,
    * and the result is row-for-row the plain join. Blanket `salt`×
    * replication of the right side is the difference between a skew fix
    * and a `salt`× tax when the right side is millions of rows.
    */
  def saltedJoinHotKeys(
      left: DataFrame, right: DataFrame,
      key: String, salt: Int, hotThreshold: Long): DataFrame = {
    val hot = broadcast(
      hotKeys(left, key, hotThreshold).withColumn("_hot", lit(true)))
    val l = left.join(hot, Seq(key), "left")
      .withColumn("_salt",
        when(col("_hot").isNotNull, rowSalt(left, salt))
          .otherwise(lit(0L)))
      .drop("_hot")
    val r = right.join(hot, Seq(key), "left")
      .withColumn("_salt", explode(
        when(col("_hot").isNotNull, sequence(lit(0L), lit(salt - 1L)))
          .otherwise(sequence(lit(0L), lit(0L)))))
      .drop("_hot")
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
