package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "PNG-ish payload bytes here")).toDF("id", "txt"),
    "id", "txt")

  test("withByteMeta computes length, digest and magic bytes") {
    val rows = Multimodal.withByteMeta(media).orderBy("media_id").collect()
    assert(rows(0).getAs[Long]("n_bytes") == 11L)
    assert(rows(0).getAs[String]("digest") ==
      "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(rows(0).getAs[String]("magic") == "68656C6C") // "hell"
  }

  test("decodeStub yields deterministic plausible dimensions") {
    val d = media.withColumn("dec", Multimodal.decodeStub(col("payload")))
      .select(col("media_id"), col("dec.width"), col("dec.height"), col("dec.channels"))
      .orderBy("media_id").collect()
    assert(d.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 1920))
    assert(d.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 1080))
    assert(d.forall(_.getInt(3) == 3))
    // deterministic across runs
    val again = media.withColumn("dec", Multimodal.decodeStub(col("payload")))
      .select(col("media_id"), col("dec.width")).orderBy("media_id").collect()
    assert(d.map(_.getInt(1)).toSeq == again.map(_.getInt(1)).toSeq)
  }

  test("resizeMeta scales the long side down to maxSide") {
    val df = Seq((1L, 1920, 1080, 3)).toDF("media_id", "width", "height", "channels")
      .withColumn("dec", struct(col("width"), col("height"), col("channels")))
    val r = df.select(Multimodal.resizeMeta(col("dec"), 480).as("r"))
      .select("r.width", "r.height").collect()(0)
    assert(r.getInt(0) == 480 && r.getInt(1) == 270)
  }

  test("batchDecode streams bounded batches through the partition") {
    val many = Multimodal.asMedia(
      (1L to 150L).map(i => (i, s"payload-$i")).toDF("id", "txt"), "id", "txt")
    val out = Multimodal.batchDecode(many, batchSize = 32).collect()
    assert(out.length == 150)
    assert(out.forall { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      w >= 1 && w <= 1920 && h >= 1 && h <= 1080 && r.getAs[Int]("channels") == 3
    })
    // deterministic across runs
    val again = Multimodal.batchDecode(many, batchSize = 7).collect()
    assert(out.sortBy(_.getLong(0)).map(_.getInt(1)).toSeq ==
      again.sortBy(_.getLong(0)).map(_.getInt(1)).toSeq)
  }

  test("decodeImages decodes real PNG bytes (gray, RGB, RGBA)") {
    // fixtures from tools/png_fixture.py: pixel = (x*7+y*13+c*29+id*31)%256
    val pngs = spark.read.format("binaryFile")
      .load("/root/repo/data/png/*.png")
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
          .cast("long").as("media_id"),
        col("content").as("payload"))
    val out = Multimodal.decodeImages(pngs, batchSize = 2)
      .orderBy("media_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSeq == Seq((1L, 17, 11, 3), (2L, 8, 8, 1), (3L, 5, 9, 4), (4L, 23, 6, 3)))
    // exact sample sum for img_2 (8x8 gray): sum (x*7+y*13+2*31) % 256
    val want2 = (for (y <- 0 until 8; x <- 0 until 8)
      yield (x * 7 + y * 13 + 62) % 256).sum.toLong
    assert(out(1).getAs[Long]("pix_sum") == want2)
    assert(out(1).getAs[Double]("mean_intensity") == want2.toDouble / 64)
  }

  test("decodeImages rejects undecodable payloads loudly") {
    val junk = Multimodal.asMedia(
      Seq((9L, "not an image")).toDF("id", "txt"), "id", "txt")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(junk).collect()
    }
    assert(ex.getMessage.contains("undecodable") ||
      Option(ex.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("embedStub emits integer-valued bounded components, deterministic") {
    val e = media.select(Multimodal.embedStub(col("payload"), 8).as("emb"))
      .selectExpr("explode(emb) AS c").collect().map(_.getDouble(0))
    assert(e.length == 16)
    assert(e.forall(c => c >= -1000 && c <= 1000 && c == math.rint(c)))
  }

  test("sampleFrames explodes every-nth frame rows") {
    val out = Multimodal.sampleFrames(media.withColumn("n_frames", lit(10)),
      everyNth = 4, totalFrames = col("n_frames"))
    val idx = out.filter(col("media_id") === 1L)
      .select("frame_idx").as[Int].collect().toSeq
    assert(idx == Seq(0, 4, 8))
  }

  test("decodeWav parses the independent stdlib-wave fixtures exactly") {
    val media = spark.read.format("binaryFile")
      .load("/root/repo/data/wav/clip_4.wav")
      .select(lit(4L).as("media_id"), col("content").as("payload"))
    val r = Multimodal.decodeWav(media).collect().head
    assert(r.getAs[Int]("sample_rate") == 22050)
    assert(r.getAs[Int]("channels") == 2)
    assert(r.getAs[Long]("n_frames") == 2048L)
  }

  test("decodeWav and decodeAviFrames reject non-RIFF payloads loudly") {
    val bad = Seq((9L, "not a riff container at all".getBytes))
      .toDF("media_id", "payload")
    val e1 = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWav(bad).collect()
    }
    assert(e1.getMessage.contains("not RIFF") ||
      e1.getCause.getMessage.contains("not RIFF"))
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAviFrames(bad).collect()
    }
    assert(e2.getMessage.contains("not a RIFF/AVI") ||
      e2.getCause.getMessage.contains("not a RIFF/AVI"))
  }

  test("corrupt RIFF chunk size fails loudly instead of looping forever") {
    // a chunk whose u32 size reads as -8 would make off advance by 0 —
    // the walk must reject it with the media_id-tagged message
    def riff(form: String): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(32)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes); out.putInt(24); out.put(form.getBytes)
      out.put("junk".getBytes); out.putInt(-8) // hostile size
      out.put(new Array[Byte](12))
      out.array()
    }
    val badWav = Seq((7L, riff("WAVE"))).toDF("media_id", "payload")
    val e1 = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWav(badWav).collect()
    }
    assert(e1.getMessage.contains("corrupt RIFF chunk size") ||
      e1.getCause.getMessage.contains("corrupt RIFF chunk size"))
    val badAvi = Seq((8L, riff("AVI "))).toDF("media_id", "payload")
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAviFrames(badAvi).collect()
    }
    assert(e2.getMessage.contains("corrupt RIFF chunk size") ||
      e2.getCause.getMessage.contains("corrupt RIFF chunk size"))
  }

  test("decodeAviFrames decodes MJPEG clips exactly (DC-only blocks)") {
    val media = spark.read.format("binaryFile")
      .load("/root/repo/data/avi_mjpg/clip_1.avi")
      .select(lit(1L).as("media_id"), col("content").as("payload"))
    val rows = Multimodal.decodeAviFrames(media, everyNth = 3).collect()
    assert(rows.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 3, 6))
    val f3 = rows.find(_.getAs[Int]("frame_idx") == 3).get
    // block_val(c=1, f=3, by, bx) = (37*3 + 11*by + 23*bx + 97) % 256 on a
    // 4x2 block grid; each uniform 8x8 block contributes 64 * value
    val expected = (for { by <- 0 until 2; bx <- 0 until 4 }
      yield 64L * ((37 * 3 + 11 * by + 23 * bx + 97) % 256)).sum
    assert(f3.getAs[Long]("pix_sum") == expected)
    assert(f3.getAs[Int]("width") == 32 && f3.getAs[Int]("height") == 16)
  }

  test("decodeAviFrames samples frames with bottom-up row flip applied") {
    val media = spark.read.format("binaryFile")
      .load("/root/repo/data/avi/clip_3.avi")
      .select(lit(3L).as("media_id"), col("content").as("payload"))
    val rows = Multimodal.decodeAviFrames(media, everyNth = 3).collect()
    assert(rows.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 3))
    val f0 = rows.find(_.getAs[Int]("frame_idx") == 0).get
    // formula sum for clip 3 frame 0: sum over x,y,ch of
    // (x*3 + y*7 + 3*13 + ch*5) % 256 on a 32x8 grid
    val expected = (for {
      y <- 0 until 8; x <- 0 until 32; ch <- 0 until 3
    } yield (x * 3 + y * 7 + 3 * 13 + ch * 5) % 256).sum.toLong
    assert(f0.getAs[Long]("pix_sum") == expected)
  }
}
