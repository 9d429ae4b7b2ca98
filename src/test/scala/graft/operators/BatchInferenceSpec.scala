package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the BatchEmbedder seam contract with a pluggable stand-in
  * model over q101's REAL decoded image features: a fixed integer-weight
  * linear projection (emb = W · pooled-intensity-grid) whose output the
  * test replays exactly with plan-side column arithmetic — so a learned
  * model dropping into the same seam inherits a gated, deterministic
  * execution path (batching, per-task lifecycle, executor-local
  * features), not an untested one.
  */
object BatchInferenceSpec {
  /** Stand-in "model": out_k = sum_j W(k)(j) * f(j) with small integer
    * weights — exact in doubles, order-independent, trivially
    * replayable in SQL. Top-level so closures don't drag the suite in.
    */
  class LinearModel extends Multimodal.BatchEmbedder {
    val W: Array[Array[Double]] = Array(
      Array(1.0, 2.0, -1.0, 3.0),
      Array(-2.0, 1.0, 4.0, -1.0),
      Array(0.0, -3.0, 2.0, 2.0))
    def dim: Int = 3
    def embedBatch(features: Seq[Array[Double]]): Seq[Array[Double]] =
      features.map { f => W.map(row => row.lazyZip(f).map(_ * _).sum) }
  }

  class CountingModel(n: org.apache.spark.util.LongAccumulator,
      c: org.apache.spark.util.LongAccumulator) extends LinearModel {
    override def open(): Unit = n.add(1)
    override def close(): Unit = c.add(1)
  }

  class BadSizeModel extends LinearModel {
    override def embedBatch(f: Seq[Array[Double]]): Seq[Array[Double]] =
      super.embedBatch(f).drop(1)
  }
}

class BatchInferenceSpec extends SparkSpec {
  import BatchInferenceSpec._

  private def imageFeatures = Multimodal.decodeImages(
      spark.read.format("binaryFile").load("/root/repo/data/png/*.png")
        .select(regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
          .cast("long").as("media_id"), col("content").as("payload")))
    .select(col("media_id"),
      array(col("p00"), col("p01"), col("p10"), col("p11")).as("features"))

  test("linear model over real decoded features matches the plan-side replay") {
    val feats = imageFeatures.cache()
    val got = Multimodal.embedWithModel(feats, new LinearModel, batchSize = 4)
      .select(col("media_id"), col("emb")(0), col("emb")(1), col("emb")(2))
      .collect().map(_.toString).sorted.toSeq
    val f = Seq("p0", "p1", "p2", "p3").zipWithIndex
      .map { case (n, i) => col("features")(i).as(n) }
    val expect = feats.select(col("media_id") +: f: _*)
      .select(col("media_id"),
        (col("p0") * 1 + col("p1") * 2 - col("p2") + col("p3") * 3),
        (col("p0") * -2 + col("p1") + col("p2") * 4 - col("p3")),
        (col("p1") * -3 + col("p2") * 2 + col("p3") * 2))
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == expect)
    feats.unpersist()
  }

  test("batch boundaries never change results (batchSize 1 == 64)") {
    val feats = imageFeatures.cache()
    val a = Multimodal.embedWithModel(feats, new LinearModel, batchSize = 1)
      .collect().map(_.toString).sorted.toSeq
    val b = Multimodal.embedWithModel(feats, new LinearModel, batchSize = 64)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    feats.unpersist()
  }

  test("lifecycle: open/close once per task, size/dim violations are loud") {
    import spark.implicits._
    val n = spark.sparkContext.longAccumulator("opens")
    val c = spark.sparkContext.longAccumulator("closes")
    val feats = (0L until 100L).map(i => (i, Array(1.0, 2.0, 3.0, 4.0)))
      .toDF("media_id", "features").repartition(4)
    assert(Multimodal.embedWithModel(feats, new CountingModel(n, c),
      batchSize = 7).count() == 100)
    assert(n.value == 4 && c.value == 4,
      s"expected one open/close per task: opens=${n.value} closes=${c.value}")

    val e1 = intercept[org.apache.spark.SparkException](
      Multimodal.embedWithModel(feats, new BadSizeModel).count())
    assert(e1.getMessage.contains("returned") ||
      e1.getCause.getMessage.contains("returned"))
  }
}
