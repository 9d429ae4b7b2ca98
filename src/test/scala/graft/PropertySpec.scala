package graft

import org.apache.spark.sql.functions._

import graft.functions.{ExactQuantile, PandasFloatString}
import graft.operators.FloodOps

/** Property-style randomized checks (seeded, batched into single Spark
  * jobs): invariants that must hold for ANY input, mirroring the
  * reference's generator-based e2e strategy (SURVEY §5.2).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  test("ExactQuantile == built-in percentile on random grouped data") {
    val rows = (0 until 30).flatMap { g =>
      val n = 1 + rnd.nextInt(40)
      (0 until n).map(_ => (g, rnd.nextDouble() * 1000 - 500))
    }
    val df = rows.toDF("g", "v").repartition(7)
    val bad = df.groupBy("g")
      .agg(
        ExactQuantile(0.25)(col("v")).as("a25"),
        percentile(col("v"), lit(0.25)).as("p25"),
        ExactQuantile(0.5)(col("v")).as("a50"),
        percentile(col("v"), lit(0.5)).as("p50"),
        ExactQuantile(0.75)(col("v")).as("a75"),
        percentile(col("v"), lit(0.75)).as("p75"))
      .filter(abs(col("a25") - col("p25")) > 1e-9 ||
        abs(col("a50") - col("p50")) > 1e-9 ||
        abs(col("a75") - col("p75")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("PandasFloatString parses back to the rounded value") {
    val vals = (0 until 1000).map(_ => (rnd.nextDouble() * 720 - 360))
    val got = vals.toDF("v")
      .select(col("v"), PandasFloatString(col("v"), 3).as("s"))
      .as[(Double, String)].collect()
    got.foreach { case (v, s) =>
      val expected = new java.math.BigDecimal(v)
        .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(s.toDouble == expected, s"$v -> $s")
      assert(!s.endsWith("0") || s.endsWith(".0") || !s.contains("."),
        s"trailing zero in $s")
    }
  }

  test("thresholdPercentages invariants hold on random ensembles") {
    val forecast = (0 until 25).flatMap { cell =>
      val n = 1 + rnd.nextInt(20)
      (1 to n).map(m => (m, cell * 1.0, cell * 2.0, "2023-10-01", 1 + rnd.nextInt(30),
        "2023-10-05", rnd.nextDouble() * 300))
    }.toDF("number", "latitude", "longitude", "issued_on", "step", "valid_for", "dis24")
    val thresholds = (0 until 25)
      .map(c => (c * 1.0, c * 2.0, rnd.nextDouble() * 150,
        rnd.nextDouble() * 200, rnd.nextDouble() * 250))
      .toDF("latitude", "longitude", "threshold_2y", "threshold_5y", "threshold_20y")
    val out = FloodOps.thresholdPercentages(forecast, thresholds)
    val bad = out.filter(
      col("p_above_2y") < 0 || col("p_above_2y") > 1 ||
        col("p_above_5y") < 0 || col("p_above_5y") > 1 ||
        col("p_above_20y") < 0 || col("p_above_20y") > 1 ||
        col("min_dis") > col("q1_dis") || col("q1_dis") > col("median_dis") ||
        col("median_dis") > col("q3_dis") || col("q3_dis") > col("max_dis"))
    assert(bad.count() == 0)
    assert(out.count() > 0)
  }

  test("saltedJoinHotKeys == plain join on random skew/threshold/salt") {
    import graft.operators.SkewOps
    for (trial <- 1 to 4) {
      val nKeys = 1 + rnd.nextInt(20)
      val keyOf = (i: Int) => s"k${i % nKeys}"
      // zipf-ish skew: key 0 gets a heavy block, the rest a thin tail
      val leftRows = ((0 until 200 + rnd.nextInt(800)).map(i => (keyOf(0), i)) ++
        (0 until 300).map(i => (keyOf(rnd.nextInt(nKeys)), -i))).map {
        case (k, v) => (k, v.toLong)
      }
      // right side: multiple rows per key, some keys absent
      val rightRows = for {
        i <- 0 until nKeys if i % 5 != 4
        j <- 0 to rnd.nextInt(3)
      } yield (keyOf(i), s"r${i}_$j")
      val left = leftRows.toDF("k", "lv").repartition(7)
      val right = rightRows.toDF("k", "rv").repartition(3)
      val salt = 2 + rnd.nextInt(14)
      val threshold = 1L + rnd.nextInt(500)
      val got = SkewOps.saltedJoinHotKeys(left, right, "k", salt, threshold)
        .groupBy("k").agg(count(lit(1)).as("n"),
          sum(length(col("rv"))).as("s"))
        .orderBy("k").collect().map(_.toSeq).toSeq
      val want = left.join(right, Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"),
          sum(length(col("rv"))).as("s"))
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(got == want, s"trial $trial salt=$salt threshold=$threshold")
    }
  }

  test("AsOfJoin.backward == brute-force range scan on random data") {
    import graft.operators.AsOfJoin
    val keys = Seq("k0", "k1", "k2", "k3")
    // distinct (key, ts) pairs on the right so "latest at-or-before" is
    // unambiguous (the window picks the later of two equal-ts right rows;
    // a brute-force max-by does not define which one — not worth pinning)
    val leftRows = (0 until 300).map { i =>
      (keys(rnd.nextInt(4)), rnd.nextInt(1000).toLong, i.toLong)
    }
    val rightRows = rnd.shuffle(
      (for (k <- keys; t <- 0 until 1000) yield (k, t.toLong)).toVector)
      .take(400).map { case (k, t) => (k, t, rnd.nextDouble()) }
    val left = leftRows.toDF("k", "ts", "lid").repartition(5)
    val right = rightRows.toDF("k", "ts", "price").repartition(3)
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("price"))
      .select("k", "ts", "lid", "asof_price")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    val byKey = rightRows.groupBy(_._1)
    leftRows.foreach { case (k, ts, lid) =>
      val want = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got((k, ts, lid)) == want, s"key=$k ts=$ts")
    }
  }
}
