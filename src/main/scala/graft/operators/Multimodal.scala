package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media travel as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * / frame-sample are per-row transforms over the binary payload.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake dimensions from
  * the payload digest. Everything around it — schema, batching,
  * partitioning, the explode shape of frame sampling — is real Spark and
  * is what matters at 100 TB: payloads stay distributed, metadata is
  * columnar, and per-row decode parallelizes embarrassingly. On a real
  * cluster the stub body is replaced by a vectorized decode over the same
  * (payload: binary) → (struct) signature.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap a text table into the opaque-binary media shape (the test-data
    * stand-in for real image bytes).
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("image/stub").as("media_type"))

  /** Cheap real metadata: byte length, digest, leading "magic" bytes. */
  def withByteMeta(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("digest", md5(col("payload")))
      .withColumn("magic", hex(substring(col("payload"), 1, 4)))

  /** STUB decode: deterministic fake (width, height, channels) derived
    * from the payload digest — replace with a real codec on a cluster.
    * The signature (binary → struct) is the real contract.
    */
  def decodeStub(payload: Column): Column = {
    val h = abs(xxhash64(payload))
    struct(
      (h % 1920 + 1).cast("int").as("width"),
      ((h / 1920) % 1080 + 1).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** "Resize": metadata-level scale transform over the decoded struct —
    * the Spark-side shape of an image op (columnar in, columnar out).
    */
  def resizeMeta(decoded: Column, maxSide: Int): Column = {
    val w = decoded.getField("width")
    val h = decoded.getField("height")
    val scale = lit(maxSide.toDouble) / greatest(w, h).cast("double")
    struct(
      least(w, round(w.cast("double") * scale).cast("int")).as("width"),
      least(h, round(h.cast("double") * scale).cast("int")).as("height"),
      decoded.getField("channels").as("channels"))
  }

  /** Frame sampling: one output row per sampled frame index — the video
    * explode shape (small sequence explode, payload column pruned before
    * the shuffle if any).
    */
  def sampleFrames(media: DataFrame, everyNth: Int, totalFrames: Column): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(totalFrames - 1, lit(0)), lit(everyNth))))
      .withColumn("frame_key",
        concat(col("media_id").cast("string"), lit("#"), col("frame_idx").cast("string")))

  /** STUB feature extraction: a deterministic fake embedding of the
    * payload — integer-valued components in [-1000, 1000] derived from the
    * md5 digest, so dot products and norms are exact in double arithmetic
    * regardless of summation order (and the DuckDB oracle reproduces them
    * bit-for-bit). The signature (binary → array<double>[dim]) is the real
    * contract a model-based embedder would fill.
    */
  def embedStub(payload: Column, dim: Int): Column = {
    val digest = md5(payload)
    transform(sequence(lit(0), lit(dim - 1)),
      j => (Dedup.md5Hash64(concat(digest, j.cast("string"))) % 2001 - 1000)
        .cast("double"))
  }

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, width: Int, height: Int, channels: Int)

  /** Batch-shaped decode: the Scala analog of `mapInPandas` — partitions
    * stream through as bounded batches, so a real implementation can hand
    * each batch to a vectorized/native codec (or a GPU) without
    * materializing the partition. The decode body itself is a
    * deterministic stub (no codecs in this environment).
    */
  def batchDecode(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // real impl: vectorized codec over the whole `batch`
          batch.map { m =>
            val h = math.abs(
              scala.util.hashing.MurmurHash3.bytesHash(m.payload, 42).toLong)
            DecodedRow(m.media_id, (h % 1920 + 1).toInt,
              ((h / 1920) % 1080 + 1).toInt, 3)
          }
        }
      }.toDF()
  }
}
