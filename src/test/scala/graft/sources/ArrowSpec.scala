package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** graft-arrow DSv2 over the pyarrow-written IPC fixture: the Scala
  * reader (bundled arrow-vector) independently consumes pyarrow's
  * bytes, cross-validating batch walk, type mapping, and null handling
  * against the formula that generated the data.
  */
class ArrowSpec extends SparkSpec {

  private def arrow = spark.read.format("graft-arrow")
    .option("path", "/root/repo/data/metrics.arrow").load()

  test("schema maps int64/utf8/float64/bool and reads all rows") {
    val df = arrow
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("id", "bigint"), ("sensor", "string"),
        ("reading", "double"), ("flag", "boolean")))
    assert(df.count() == 1000)
  }

  test("one input partition per record batch (footer-only planning)") {
    assert(arrow.rdd.getNumPartitions == 4)
  }

  test("values and nulls match the generating formula exactly") {
    val rows = arrow.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
    assert(rows.length == 1000)
    rows.foreach { case (id, sensor, reading, flag) =>
      val expSensor = if (id % 50 == 49) null else s"s${id % 7}"
      assert(sensor == expSensor, s"id=$id sensor")
      assert(reading == ((id * 31) % 997) / 4.0, s"id=$id reading")
      assert(flag == (id % 3 == 0), s"id=$id flag")
    }
  }

  test("column pruning reaches the scan's readSchema") {
    val plan = arrow.select(sum("reading"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("cols=reading"), plan)
    assert(!plan.contains("cols=id,sensor"), plan)
  }

  test("distributed sink round-trips exactly, nulls included") {
    import spark.implicits._
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_arrow_sink_spec").getAbsolutePath
    val src = spark.range(20000).select(
      col("id"),
      when(col("id") % 97 =!= 0, concat(lit("v"), col("id") % 11)).as("tag"),
      (col("id") % 13 * 0.25).as("x"),
      (col("id") % 2 === 0).as("even"))
      .repartition(4)
    graft.sources.arrow.ArrowSink.write(src, dir, batchRows = 4096)
    val back = spark.read.format("graft-arrow").option("path", dir).load()
    // 4 part files, ceil(5000/4096)=2 batches each
    assert(back.rdd.getNumPartitions == 8)
    assert(back.schema == src.schema)
    val a = src.collect().map(_.toString).sorted.toSeq
    val b = back.collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("zstd-compressed IPC (pyarrow compression option) decodes") {
    val df = spark.read.format("graft-arrow")
      .option("path", "/root/repo/data/metrics_zstd.arrow").load()
    assert(df.count() == 1000)
    import spark.implicits._
    val plain = spark.read.format("graft-arrow")
      .option("path", "/root/repo/data/metrics.arrow").load()
    assert(df.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("unsupported Arrow types are rejected loudly at planning") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    val bad = new Field("ts",
      FieldType.nullable(new ArrowType.Date(
        org.apache.arrow.vector.types.DateUnit.DAY)), null)
    val e = intercept[RuntimeException](
      graft.sources.v2.ArrowDataSource.sparkSchema(Seq(bad)))
    assert(e.getMessage.contains("unsupported Arrow type"), e.getMessage)
  }
}
