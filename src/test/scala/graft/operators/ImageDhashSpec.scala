package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageDhashSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash is invariant to a constant brightness offset") {
    val base = pngBytes(32, 24, (x, y) => (x * 5 + y * 3) % 200)
    val brighter = pngBytes(32, 24, (x, y) => (x * 5 + y * 3) % 200 + 40)
    val got = Multimodal.imageDhash(
        Seq((1L, base), (2L, brighter)).toDF("media_id", "payload"))
      .orderBy("media_id").select("dhash").as[Long].collect()
    assert(got(0) === got(1))
  }

  test("dHash separates a transposed gradient") {
    val a = pngBytes(32, 24, (x, y) => x * 7 % 250)       // left→right ramp
    val b = pngBytes(32, 24, (x, y) => 249 - x * 7 % 250) // reversed ramp
    val got = Multimodal.imageDhash(
        Seq((1L, a), (2L, b)).toDF("media_id", "payload"))
      .orderBy("media_id").select("dhash").as[Long].collect()
    // a strictly increasing row has all 8 comparison bits set per row;
    // the reversed ramp has none
    assert(got(0) != got(1))
    assert(java.lang.Long.bitCount(got(0) ^ got(1)) >= 32)
  }
}
