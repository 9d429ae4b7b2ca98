package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §7.4.7 / the 100 TB posture). AQE
  * handles sort-merge-join skew automatically; these cover the two cases
  * it does not: skewed high-cardinality aggregation state and broadcast-
  * ineligible skewed joins.
  */
object SkewOps {

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
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
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
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      key: String, salt: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val r = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
