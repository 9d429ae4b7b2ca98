package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale + exactness gate for operators/SubstrDedup (q212's unaligned
  * exact-substring cut) at 1M docs / ~300M char windows — the macro the
  * r16 verdict required: planted UNALIGNED ≥24-char repeats, recall 1.0
  * REQUIRED, with a fixture designed so precision is closed-form too.
  *
  * Fixture: 1M docs of per-position-salted tokens (xxhash64(doc, i)
  * over a 10^9 space), so no 24-char run repeats across docs except the
  * planted ones — every doc_id % 200 == 199 ("B") carries a 60-char
  * slice of doc_id−1's text ("A") inserted at a VARYING character
  * offset (doc_id % 37 + 3): mid-token, different alignment per pair,
  * exactly what q202's 16-token-aligned windows cannot see.
  *
  * Closed form: the shared 60-char run yields exactly 60−24+1 = 37
  * duplicated windows per side; ownership (min doc·2^20+pos) always
  * belongs to A (smaller id ⇒ strictly smaller key for every gram), so
  * EVERY planted B must show n_cut_windows == 37 and n_chars_cut == 60
  * (windows straddling the insert boundary see different context in A
  * and B, so they never collide), and every other doc must show 0.
  * Any deviation — a missed planted pair (recall) or a spurious cut
  * (precision / hash-collision handling) — fails the require.
  *
  * Usage: SubstrMacroBench [nDocs] (default 1000000)
  */
object SubstrMacroBench {

  private def docs(spark: SparkSession, n: Long): DataFrame = {
    val nTok = (pmod(xxhash64(col("id")), lit(41)) + 20).cast("int")
    spark.range(n)
      .select(col("id").as("doc_id"),
        explode(sequence(lit(1), nTok)).as("i"))
      .select(col("doc_id"),
        concat(lit("w"),
          pmod(xxhash64(col("doc_id"), col("i")), lit(1000000000L)))
          .as("tok"))
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("tok"))).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = docs(spark, n).localCheckpoint(true)
    // plant: B (id%200==199) gets substr(A.text, 10, 60) inserted at
    // char offset (B%37 + 3) — varying, unaligned
    val bIds = base.filter(col("doc_id") % 200 === 199)
      .select(col("doc_id").as("bid"), col("text").as("btext"))
    val planted = bIds
      .join(base.select((col("doc_id") + 1).as("bid"),
        col("text").as("atext")), "bid")
      .select(col("bid").as("doc_id"),
        concat(
          expr("substring(btext, 1, cast(bid % 37 + 3 as int))"),
          // '#' sentinels bound the shared run EXACTLY at 60 chars:
          // without them a boundary char of B can coincidentally equal
          // atext[9] / atext[70] and extend the repeat (measured ~15%
          // of pairs), breaking the closed-form 37-window count.
          // '#' never occurs in the token alphabet {w,0-9,space}.
          lit("#"), expr("substring(atext, 10, 60)"), lit("#"),
          expr("substring(btext, cast(bid % 37 + 4 as int))")).as("text"))
    val corpus = base.filter(col("doc_id") % 200 =!= 199)
      .unionByName(planted)
      .localCheckpoint(true)
    val nDocs = corpus.count()
    require(nDocs == n, s"fixture lost docs: $nDocs != $n")

    val t0 = System.nanoTime()
    val out = graft.operators.SubstrDedup
      .cutStats(corpus, "doc_id", "text")
      .localCheckpoint(true)
    val secs = (System.nanoTime() - t0) / 1e9

    val nPlanted = n / 200
    val stats = out.agg(
      sum(col("n_windows")).as("wins"),
      sum(when(col("doc_id") % 200 === 199 &&
        col("n_cut_windows") === 37 && col("n_chars_cut") === 60, 1L)
        .otherwise(0L)).as("planted_exact"),
      sum(when(col("doc_id") % 200 =!= 199 && col("n_cut_windows") > 0, 1L)
        .otherwise(0L)).as("spurious"))
      .collect()(0)
    val wins = stats.getLong(0)
    val plantedExact = stats.getLong(1)
    val spurious = stats.getLong(2)
    require(plantedExact == nPlanted,
      s"recall/closed-form failure: $plantedExact of $nPlanted planted " +
        "docs show the exact 37-window/60-char cut")
    require(spurious == 0,
      s"$spurious non-planted docs were cut — precision failure")
    println(f"substr_macro: docs=$n windows=$wins planted=$nPlanted " +
      f"all EXACT (37 windows / 60 chars each, 0 spurious) " +
      f"cut_stats=$secs%.1f s")
    spark.stop()
  }
}
