package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The real-model seam (r16 verdict): artifact round-trip, loud
  * truncation failure, exact forward arithmetic, and the full
  * embedWithModel integration — executor-side artifact load, batched
  * GEMM — equal to a driver-side replay.
  */
class QuantMlpSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_qmlp_spec_$name.bin"

  test("artifact save/load round-trips every weight") {
    val net = QuantMlp.pseudo(nIn = 5, nHid = 3, nOut = 2)
    val p = tmp("rt")
    net.save(p)
    val back = QuantMlp.load(p)
    assert(back.w1.map(_.toSeq).toSeq == net.w1.map(_.toSeq).toSeq)
    assert(back.b1.toSeq == net.b1.toSeq)
    assert(back.w2.map(_.toSeq).toSeq == net.w2.map(_.toSeq).toSeq)
    assert(back.b2.toSeq == net.b2.toSeq)
  }

  test("truncated or foreign artifacts fail loudly") {
    val p = tmp("bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "QMLPgarbage".getBytes)
    intercept[IllegalArgumentException](QuantMlp.load(p))
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "PKZZ".getBytes ++ new Array[Byte](32))
    intercept[IllegalArgumentException](QuantMlp.load(p))
  }

  test("forward pass: hand-computed relu GEMM") {
    // 2->2->1: h = relu(W1 x_q + b1), e = W2 h + b2
    val net = QuantMlp(
      w1 = Array(Array(1L, -1L), Array(2L, 0L)),
      b1 = Array(0L, -100L),
      w2 = Array(Array(3L, 1L)),
      b2 = Array(7L))
    // x = (0.5, 0.25) -> xq = (512, 256); h1 = 512-256 = 256,
    // h2 = relu(1024-100) = 924; e = 3*256 + 924 + 7 = 1699
    assert(net.forward(Array(0.5, 0.25)).toSeq == Seq(1699L))
    // negative pre-activation clamps: x = (-0.5, 0.5) -> xq=(-512,512),
    // h1 = relu(-1024)=0, h2 = relu(-1124)=0, e = 7
    assert(net.forward(Array(-0.5, 0.5)).toSeq == Seq(7L))
    // floor on negatives: -0.0005*1024 = -0.512 -> floor = -1
    assert(math.floor(-0.0005 * 1024.0).toLong == -1L)
  }

  test("embedWithModel carries the artifact: executor load == driver replay") {
    val net = QuantMlp.pseudo(nIn = 4, nHid = 6, nOut = 3)
    val p = tmp("seam")
    net.save(p)
    val rows = (0L until 97L).map { i => // 97: not a multiple of batch 64
      (i, Array.tabulate(4)(j => ((i * 7 + j * 13) % 29).toDouble / 8.0 - 1.5))
    }
    val df = rows.toDF("media_id", "features")
    val got = Multimodal.embedWithModel(df, QuantMlpEmbedder(p), batchSize = 16)
      .as[(Long, Array[Double])].collect().toMap
    assert(got.size == 97)
    for ((i, x) <- rows) {
      val want = net.forward(x).map(_.toDouble).toSeq
      assert(got(i).toSeq == want, s"row $i")
    }
  }
}
