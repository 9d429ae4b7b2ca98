package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** The engine's second API surface: plain `spark.sql` over registered
  * views, including graft's injected SQL functions — a user who writes
  * ANSI SQL instead of the DataFrame API gets the same plans and the
  * same results.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("spark.sql over registered views matches the DataFrame path") {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    val viaSql = spark.sql("""
      SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
             percentile(l_extendedprice, 0.5) AS med_price
      FROM lineitem GROUP BY 1""")
    val viaDf = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").cast("double").as("sum_qty"),
        percentile(col("l_extendedprice"), lit(0.5)).as("med_price"))
    assert(viaSql.orderBy("l_returnflag").collect().map(_.toSeq).toSeq ==
      viaDf.orderBy("l_returnflag").collect().map(_.toSeq).toSeq)
  }

  test("point_in_polygon and hyperplane_bands are callable from SQL") {
    GraftExtensions.register(spark)
    val in = spark.sql("""
      SELECT point_in_polygon(2.0, 0.5,
        array(0.0, 3.0, 3.0, 1.0, 1.0, 0.0),
        array(0.0, 0.0, 1.0, 1.0, 3.0, 3.0)) AS arm,
             point_in_polygon(2.0, 2.0,
        array(0.0, 3.0, 3.0, 1.0, 1.0, 0.0),
        array(0.0, 0.0, 1.0, 1.0, 3.0, 3.0)) AS notch""").collect()(0)
    assert(in.getBoolean(0) && !in.getBoolean(1))
    val sig = spark.sql("""
      SELECT hyperplane_bands(array(0.5, -0.25, 0.125, 1.0), 4, 8) AS sig""")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 4 && sig.forall(v => v >= 0 && v < 256))
  }

  test("cosine_sim is callable from SQL and matches the known formula") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT cosine_sim(array(1.0, 0.0), array(2.0, 0.0)) AS same,
             cosine_sim(array(1.0, 0.0), array(0.0, 1.0)) AS orth,
             cosine_sim(array(1.0), array(1.0, 2.0)) AS mismatch""").collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0 && r.isNullAt(2))
  }

  test("wkb_ring is callable from SQL") {
    GraftExtensions.register(spark)
    // little-endian WKB polygon, triangle ring
    val buf = java.nio.ByteBuffer.allocate(9 + 4 + 4 * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(3).putInt(1).putInt(4)
    Seq((0.0, 0.0), (4.0, 0.0), (0.0, 3.0), (0.0, 0.0))
      .foreach { case (x, y) => buf.putDouble(x); buf.putDouble(y) }
    val hex = buf.array().map(b => f"$b%02x").mkString
    val r = spark.sql(
      s"SELECT wkb_ring(unhex('$hex'), 0) AS xs, wkb_ring(unhex('$hex'), 1) AS ys")
      .collect()(0)
    assert(r.getSeq[Double](0) == Seq(0.0, 4.0, 0.0, 0.0))
    assert(r.getSeq[Double](1) == Seq(0.0, 0.0, 3.0, 0.0))
  }

  test("gopher_stats is callable from SQL and matches the kernel") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT gopher_stats(array('x', 'y', 'x', 'y', 'x')) AS g""")
      .select("g.*").collect()(0)
    // "x y" (pos 1,3) and "y x" (pos 2,4) tie at count 2; the
    // binary-smaller "x y" wins and covers token positions 1-4
    assert(r.getLong(0) == 5L, r)      // total_chars
    assert(r.getLong(1) == 4L, r)      // top2 covers 4 tokens of len 1
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L, r)
  }

  test("nfc_normalize and lang_id_scores are callable from SQL") {
    GraftExtensions.register(spark)
    // decomposed ka + voicing composes to one codepoint (escaped
    // source literals — no editor may silently recompose them)
    val n = spark.sql("SELECT nfc_normalize('が') AS n")
      .collect()(0).getString(0)
    assert(n == "が" && n.length == 1)
    val sent = "the weather is nice and the garden is green"
    val p = spark.sql(s"SELECT lang_id_scores('$sent').pred AS p")
      .collect()(0).getString(0)
    assert(p == "en", p)
    // matches the column-path model exactly (the SQL surface takes the
    // PRE-JOINED token stream; a single-spaced ASCII sentence is one)
    assert(graft.operators.LangId.fixture.forwardLocal(sent)._2 == p)
  }

  test("injected SQL functions compose with builtin SQL over views") {
    GraftExtensions.register(spark)
    Tables.load(spark, dir, "supplier").createOrReplaceTempView("supplier")
    val got = spark.sql("""
      SELECT s_suppkey,
             concat('POINT (', pandas_float_str(round(s_acctbal, 2), 2), ')') AS wkt_ish
      FROM supplier ORDER BY s_suppkey LIMIT 3""").collect()
    assert(got.length == 3)
    assert(got.forall(_.getString(1).matches("""POINT \(-?\d+\.\d+\)""")))
  }
}
