package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic backward as-of join (SURVEY J8's family, in time): for each
  * left row, the latest right row with the same keys and
  * `rightTs <= leftTs`.
  *
  * Spark-first plan: tag both sides, union, ONE window over
  * (keys, ts, side) carrying the last right-payload forward, filter back
  * to left rows — a single shuffle on the join keys, linear work, no
  * range self-join (a range-condition join explodes to O(n·m) pairs per
  * key before filtering; this is the scalable form at 100 TB).
  *
  * Ties: a right row at exactly `leftTs` IS visible (right sorts before
  * left at equal timestamps). Multiple right rows with identical
  * (keys, ts) resolve deterministically to the one with the LARGEST value
  * struct (the window orders by the payload as a final sort key), so the
  * result never depends on partitioning or scheduling.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry; they appear on the
    *                  output prefixed with `asof_`. Left columns pass
    *                  through unchanged.
    */
  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(valueCols.map(c => right.schema(c)))
    val rTagged = right.select(
      keys.map(right(_)) ++ Seq(
        right(rightTs).as("_ts"), lit(0).as("_side"),
        struct(valueCols.map(right(_)): _*).cast(rType).as("_r"),
        lit(null).cast(lType).as("_l")): _*)
    // carry the whole left row as a struct so arbitrary schemas pass through
    val lTagged = left.select(
      keys.map(left(_)) ++ Seq(
        left(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(rType).as("_r"),
        struct(left.columns.map(left(_)): _*).cast(lType).as("_l")): _*)
    // `_r` as the final sort key breaks ties among right rows that share
    // (keys, ts) but differ in payload: `last` then always picks the
    // largest struct instead of an arbitrary one. Left rows all have
    // `_r` null, so their relative order is unaffected.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.union(lTagged)
      .withColumn("_last_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val leftCols = left.columns.map(c => col(s"_l.$c").as(c))
    val rightCols = valueCols.map(c => col(s"_last_r.$c").as(s"asof_$c"))
    matched.select(leftCols ++ rightCols: _*)
  }
}
