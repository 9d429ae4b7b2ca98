package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media travel as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * / frame-sample are per-row transforms over the binary payload.
  *
  * IMAGE decode is REAL (`decodeImages`: javax.imageio PNG/JPEG behind
  * the batched seam, emitting dimensions + an exact pooled-intensity
  * embedding). AUDIO decode is REAL (`decodeWav`: pure-JVM RIFF/WAVE
  * 16-bit PCM parser, same seam, pooled |sample| profile). VIDEO decode
  * is REAL for RIFF/AVI containers with uncompressed DIB frames AND
  * MJPEG (`decodeAviFrames`: container walk + bottom-up BGR row decode
  * or per-frame javax.imageio JPEG decode + frame sampling); other
  * compressed codecs have no pure-JVM decoder — they would slot in at
  * the same seam, and `decodeStub` remains as the
  * documented placeholder. Everything around all three — schema, batching,
  * partitioning, the explode shape of frame sampling — is real Spark and
  * is what matters at 100 TB: payloads stay distributed, metadata is
  * columnar, and per-row decode parallelizes embarrassingly.
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
    * contract a model-based embedder would fill; the EXECUTION contract a
    * real model plugs into is [[BatchEmbedder]] + [[embedWithModel]]
    * (batched, per-task lifecycle, executor-local features), gated by
    * BatchInferenceSpec over q101's real decoded features.
    */
  def embedStub(payload: Column, dim: Int): Column = {
    val digest = md5(payload)
    transform(sequence(lit(0), lit(dim - 1)),
      j => (Dedup.md5Hash64(concat(digest, j.cast("string"))) % 2001 - 1000)
        .cast("double"))
  }

  /** Batch-inference seam CONTRACT — the shape a learned embedding model
    * plugs into (what `embedStub` stands in for). Mirrors the
    * mapInPandas/Pandas-UDF batch contract in typed-JVM form:
    *
    *  - the model sees a BATCH of feature rows (amortizing weight-matrix
    *    / session setup over `batchSize` rows, exactly like an Arrow
    *    record batch), never one row at a time;
    *  - `open()` runs once per TASK before the first batch (model/session
    *    load — the per-partition init mapInPandas gets for free from the
    *    worker process), `close()` after the last;
    *  - output batch must be same-size, same-order as the input batch —
    *    row i's embedding is output(i), dimension `dim`;
    *  - implementations must be deterministic per input row: Spark may
    *    re-run a task after shuffle-fetch failure, and a nondeterministic
    *    embedder silently corrupts downstream bucketing/dedup.
    *
    * Executed via mapPartitions so payload/feature columns never leave
    * the executors; BatchInferenceSpec gates a stand-in linear model over
    * q101's real decoded image features against an exact plan-side
    * replay.
    */
  trait BatchEmbedder extends Serializable {
    def dim: Int
    def open(): Unit = ()
    def embedBatch(features: Seq[Array[Double]]): Seq[Array[Double]]
    def close(): Unit = ()
  }

  final case class FeatureRow(media_id: Long, features: Array[Double])
  final case class EmbeddedRow(media_id: Long, emb: Array[Double])

  /** Run a [[BatchEmbedder]] over (media_id, features) rows. One model
    * instance per task, batches of `batchSize`, streaming (no partition
    * materialization). The 100 TB shape: inference parallelism ==
    * partition count, feature arrays stay executor-local, output is the
    * narrow (id, emb) table that downstream ANN/dedup joins on.
    */
  def embedWithModel(features: DataFrame, model: BatchEmbedder,
      batchSize: Int = 64): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.select("media_id", "features").as[FeatureRow]
      .mapPartitions { it =>
        model.open()
        // close exactly once, on whichever comes first: iterator
        // exhaustion (the fast path) or task completion. The listener
        // covers downstream limit/take and embedBatch exceptions — for a
        // real model holding native sessions, an unconsumed iterator must
        // not leak the per-task instance (r7 advice).
        val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeOnce(): Unit =
          if (closed.compareAndSet(false, true)) model.close()
        org.apache.spark.TaskContext.get() match {
          case null => // driver-side/local testing seam: exhaust path only
          case tc => tc.addTaskCompletionListener[Unit](_ => closeOnce())
        }
        val out = it.grouped(batchSize).flatMap { batch =>
          val embs = model.embedBatch(batch.map(_.features))
          require(embs.length == batch.length,
            s"embedder returned ${embs.length} rows for ${batch.length} inputs")
          batch.lazyZip(embs).map { (row, e) =>
            require(e.length == model.dim,
              s"media_id=${row.media_id}: embedding dim ${e.length} != ${model.dim}")
            EmbeddedRow(row.media_id, e)
          }
        }
        // exhaust-then-close without materializing the whole partition
        new Iterator[EmbeddedRow] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): EmbeddedRow = out.next()
        }
      }
      .toDF()
  }

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, width: Int, height: Int, channels: Int)

  final case class ImageDecoded(
      media_id: Long, width: Int, height: Int, channels: Int,
      pix_sum: Long, mean_intensity: Double,
      p00: Double, p01: Double, p10: Double, p11: Double)

  /** REAL image decode (javax.imageio — PNG/JPEG/GIF/BMP, pure JVM, no
    * native deps) through the same batched-partition seam as
    * `batchDecode`: payloads never leave the executors, each task decodes
    * its rows independently, and the output is narrow columnar metadata —
    * the 100 TB-safe shape. Emits dimensions, the exact integer sum over
    * all samples, mean intensity, and a 2x2 pooled-intensity grid (the
    * minimal "pixel embedding"; pixel x belongs to pool column x*2/w).
    * Integer sample sums plus a single double division keep every output
    * bit-reproducible by an independent implementation of the formula.
    */
  def decodeImages(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val grid = 2
    media.select("media_id", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { m =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.payload))
            require(img != null, s"media_id=${m.media_id}: undecodable image")
            val raster = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            val c = raster.getNumBands
            var total = 0L
            val cellSum = new Array[Long](grid * grid)
            val cellN = new Array[Long](grid * grid)
            var y = 0
            while (y < h) {
              val cy = y * grid / h
              var x = 0
              while (x < w) {
                val cell = cy * grid + x * grid / w
                var b = 0
                while (b < c) {
                  val v = raster.getSample(x, y, b)
                  total += v
                  cellSum(cell) += v
                  b += 1
                }
                cellN(cell) += c
                x += 1
              }
              y += 1
            }
            def pool(i: Int): Double = cellSum(i).toDouble / cellN(i)
            ImageDecoded(m.media_id, w, h, c, total,
              total.toDouble / (w.toLong * h * c),
              pool(0), pool(1), pool(2), pool(3))
          }
        }
      }.toDF()
  }

  final case class ImageDhash(media_id: Long, width: Int, height: Int,
      dhash: Long)

  /** Perceptual difference-hash (dHash, the classic 64-bit image
    * near-dup fingerprint) through the same batched decode seam:
    * grayscale = sum over ALL raster bands (the fixture formula's
    * sample sum), pooled to a 9-col × 8-row grid (cell col = x·9/w,
    * row = y·8/h, value = FLOOR(sum/count), empty cells — possible
    * when w < 9 on tiny fixtures — are 0), bit r·8+c set iff
    * cell[r][c] < cell[r][c+1] (strict). All-integer, so an
    * independent implementation of the formula reproduces the hash
    * bit-for-bit (tools/dhash_fixture.py). Gradient offset cancels in
    * the comparisons, so brightness-shifted copies hash identically —
    * the property that makes dHash a near-dup key. Pair search reuses
    * the q38 hamming machinery (q161).
    */
  def imageDhash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val cols = 9; val rows = 8
    media.select("media_id", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { m =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.payload))
            require(img != null, s"media_id=${m.media_id}: undecodable image")
            val raster = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            val c = raster.getNumBands
            val cellSum = new Array[Long](cols * rows)
            val cellN = new Array[Long](cols * rows)
            var y = 0
            while (y < h) {
              val cy = y * rows / h
              var x = 0
              while (x < w) {
                val cell = cy * cols + x * cols / w
                var b = 0
                while (b < c) {
                  cellSum(cell) += raster.getSample(x, y, b)
                  b += 1
                }
                cellN(cell) += c
                x += 1
              }
              y += 1
            }
            def cellV(i: Int): Long =
              if (cellN(i) == 0) 0L else cellSum(i) / cellN(i)
            var hash = 0L
            var r = 0
            while (r < rows) {
              var c0 = 0
              while (c0 < cols - 1) {
                if (cellV(r * cols + c0) < cellV(r * cols + c0 + 1))
                  hash |= 1L << (r * (cols - 1) + c0)
                c0 += 1
              }
              r += 1
            }
            ImageDhash(m.media_id, w, h, hash)
          }
        }
      }.toDF()
  }

  /** Banded dHash near-dup pairing — the SCALE shape for image dedup
    * (r15 verdict: the registered query must be this, not all-pairs).
    * The 64-bit dhash is sliced into 4 disjoint 16-bit bands; candidate
    * pairs come from an equi-self-join on (band index, band value) over
    * COMPACT (id, band) keys only, distinct-ed BEFORE the hashes join
    * back (the LSH join-back lesson); survivors are hamming-verified.
    *
    * Pigeonhole completeness: `maxHamming <= 3` differing bits cannot
    * touch all 4 disjoint bands, so every true pair shares at least one
    * exact band — the banded output is provably IDENTICAL to the
    * all-pairs threshold scan. Candidate cardinality at n images is
    * ~4·n²/2¹⁷ incidental pairs (uniform bands) + the true near-dups:
    * linear-ish up to millions of images, vs the always-quadratic
    * crossJoin. MediaDedupMacroBench measures this at ≥100k real PNGs.
    *
    * Input: (media_id, dhash) — e.g. [[imageDhash]] output, which the
    * caller should cache (it is consumed three times: bands + two hash
    * join-backs).
    */
  def dhashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding is only recall-complete for hamming <= 3, got $maxHamming")
    val h = hashes.select("media_id", "dhash")
    dhashBandCandidates(h)
      .join(h.select(col("media_id").as("id_a"), col("dhash").as("dhash_a")),
        "id_a")
      .join(h.select(col("media_id").as("id_b"), col("dhash").as("dhash_b")),
        "id_b")
      .withColumn("hamming", bit_count(expr("dhash_a ^ dhash_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "dhash_a", "dhash_b", "hamming")
  }

  /** The candidate stage of [[dhashNearDupPairs]]: distinct (id_a, id_b)
    * pairs sharing at least one exact 16-bit band — exposed so
    * MediaDedupMacroBench can gate candidate CARDINALITY (the lever that
    * keeps the pairing linear-ish) separately from verified recall.
    */
  def dhashBandCandidates(hashes: DataFrame): DataFrame = {
    val bands = hashes.select(col("media_id"),
      posexplode(array((0 until 4).map(j =>
        expr(s"shiftright(dhash, ${16 * j}) & 65535")): _*))
        .as(Seq("bj", "bv")))
    bands.as("a").join(bands.as("b"),
        col("a.bj") === col("b.bj") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
  }

  final case class WavDecoded(
      media_id: Long, sample_rate: Int, channels: Int, n_frames: Long,
      abs_sum: Long, peak: Int, b0: Double, b1: Double, b2: Double, b3: Double)

  /** REAL audio decode: a pure-JVM RIFF/WAVE PCM parser (format: the
    * public WAVE/RIFF spec; 16-bit integer PCM, any channel count)
    * through the same batched-partition seam as `decodeImages`. Emits
    * rate/channels/frames, the exact integer sum of absolute sample
    * values, the peak, and a 4-bin pooled |sample| profile (frame k of n
    * belongs to bin k*4/n; each bin mean is one exact integer sum over
    * one division) — every output bit-reproducible by an independent
    * implementation of the formula, same as the image path.
    */
  def decodeWav(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val bins = 4
    media.select("media_id", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { m =>
            val bb = java.nio.ByteBuffer.wrap(m.payload)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            require(bb.getInt(0) == 0x46464952, // "RIFF"
              s"media_id=${m.media_id}: not RIFF")
            require(bb.getInt(8) == 0x45564157, // "WAVE"
              s"media_id=${m.media_id}: not WAVE")
            var off = 12
            var channels = 0
            var rate = 0
            var blockAlign = 0
            var dataOff = -1
            var dataLen = 0
            while (off + 8 <= m.payload.length && dataOff < 0) {
              val id = bb.getInt(off)
              val size = bb.getInt(off + 4)
              // a hostile/corrupt size (negative, or past the payload end)
              // must fail loudly, not wedge the walk in a non-advancing
              // loop; compare in Long — off + 8 + size can wrap Int
              require(size >= 0 &&
                  off.toLong + 8 + size <= m.payload.length,
                s"media_id=${m.media_id}: corrupt RIFF chunk size $size at offset $off")
              if (id == 0x20746D66) { // "fmt "
                require((bb.getShort(off + 8) & 0xFFFF) == 1,
                  s"media_id=${m.media_id}: not integer PCM")
                channels = bb.getShort(off + 10) & 0xFFFF
                rate = bb.getInt(off + 12)
                blockAlign = bb.getShort(off + 20) & 0xFFFF
                require((bb.getShort(off + 22) & 0xFFFF) == 16,
                  s"media_id=${m.media_id}: only 16-bit PCM supported")
              } else if (id == 0x61746164) { // "data"
                dataOff = off + 8
                dataLen = size
              }
              off += 8 + size + (size & 1) // RIFF chunks pad to even
            }
            require(dataOff > 0 && channels > 0,
              s"media_id=${m.media_id}: missing fmt/data chunk")
            val nFrames = dataLen / blockAlign
            var absSum = 0L
            var peak = 0
            val binSum = new Array[Long](bins)
            val binN = new Array[Long](bins)
            var k = 0
            while (k < nFrames) {
              val bin = (k.toLong * bins / nFrames).toInt
              var c = 0
              while (c < channels) {
                val v = math.abs(bb.getShort(dataOff + k * blockAlign + c * 2).toInt)
                absSum += v
                if (v > peak) peak = v
                binSum(bin) += v
                c += 1
              }
              binN(bin) += channels
              k += 1
            }
            def b(i: Int): Double = binSum(i).toDouble / binN(i)
            WavDecoded(m.media_id, rate, channels, nFrames.toLong,
              absSum, peak, b(0), b(1), b(2), b(3))
          }
        }
      }.toDF()
  }

  final case class WavFp(media_id: Long, win: Int, fp: Long, approx: Long)

  /** Perceptual AUDIO fingerprint — the audio leg of the near-dup family
    * (q161's dHash is the image leg): per non-overlapping 256-sample
    * window of channel 0, an integer Haar wavelet cascade
    * (a_i = (x_2i + x_2i+1) / 2 with Java truncating division,
    * d_i = x_2i − x_2i+1, both exact) packs the SIGNS of the final
    * approximation plus the 31 coarsest detail coefficients
    * (1+2+4+8+16, coarsest level first) into a 32-bit fingerprint —
    * sign-of-coarse-structure survives amplitude scaling and fine
    * noise, the standard wavelet-signature recipe. Integer arithmetic
    * only, so the independent formula-side implementation
    * (tools/audio_fp_expected.py) reproduces every bit; near-dup audio
    * then reduces to exact/Hamming matching on compact longs — the
    * same hash-shuffle shapes as text dedup. Windows shorter than
    * `window` are dropped (deterministic on both sides).
    */
  def wavFingerprint(media: DataFrame, window: Int = 256,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { m =>
            val bb = java.nio.ByteBuffer.wrap(m.payload)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            require(bb.getInt(0) == 0x46464952 && bb.getInt(8) == 0x45564157,
              s"media_id=${m.media_id}: not a RIFF/WAVE file")
            var off = 12
            var blockAlign = 0
            var dataOff = -1
            var dataLen = 0
            while (off + 8 <= m.payload.length && dataOff < 0) {
              val id = bb.getInt(off)
              val size = bb.getInt(off + 4)
              require(size >= 0 && off.toLong + 8 + size <= m.payload.length,
                s"media_id=${m.media_id}: corrupt RIFF chunk size $size at offset $off")
              if (id == 0x20746D66) { // "fmt "
                require((bb.getShort(off + 8) & 0xFFFF) == 1,
                  s"media_id=${m.media_id}: not integer PCM")
                blockAlign = bb.getShort(off + 20) & 0xFFFF
                require((bb.getShort(off + 22) & 0xFFFF) == 16,
                  s"media_id=${m.media_id}: only 16-bit PCM supported")
              } else if (id == 0x61746164) { // "data"
                dataOff = off + 8
                dataLen = size
              }
              off += 8 + size + (size & 1)
            }
            require(dataOff > 0 && blockAlign > 0,
              s"media_id=${m.media_id}: missing fmt/data chunk")
            val nFrames = dataLen / blockAlign
            (0 until nFrames / window).map { wdx =>
              var xs = Array.tabulate(window)(i =>
                bb.getShort(dataOff + (wdx * window + i) * blockAlign).toInt)
              val levels = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
              while (xs.length > 1) {
                val n2 = xs.length / 2
                val a = new Array[Int](n2)
                val dd = new Array[Int](n2)
                var i = 0
                while (i < n2) {
                  a(i) = (xs(2 * i) + xs(2 * i + 1)) / 2 // trunc toward zero
                  dd(i) = xs(2 * i) - xs(2 * i + 1)
                  i += 1
                }
                levels += dd
                xs = a
              }
              var fp = 0L
              var bit = 0
              def put(v: Int): Unit = {
                if (bit < 32) { if (v >= 0) fp |= 1L << bit; bit += 1 }
              }
              put(xs(0))
              var li = levels.length - 1
              while (li >= 0 && bit < 32) {
                levels(li).foreach(put)
                li -= 1
              }
              WavFp(m.media_id, wdx, fp, xs(0).toLong)
            }
          }
        }
      }.toDF()
  }

  final case class AviFrame(
      media_id: Long, frame_idx: Int, width: Int, height: Int, n_frames: Int,
      pix_sum: Long, p00: Double, p01: Double, p10: Double, p11: Double)

  /** REAL video decode: pure-JVM RIFF/AVI container parse, frame-sampled
    * every `everyNth` frame, for two codecs:
    *  - UNCOMPRESSED 24-bit DIB (biCompression=0): bottom-up BGR rows
    *    padded to 4 bytes, decoded by direct byte walk ("00db" chunks);
    *  - MJPEG (biCompression='MJPG'): each "00dc" chunk is a standalone
    *    baseline JPEG, decoded via javax.imageio — the most common legacy
    *    AVI payload, still zero native deps.
    * One output row per sampled frame — the explode shape of
    * `sampleFrames` with a real decoder behind it. Outputs use top-down
    * image coordinates and the same exact integer-sum + 2x2 pooled-mean
    * contract as `decodeImages` (MJPEG pools run over the decoded
    * raster's bands — 1 for grayscale).
    */
  /** RIFF/AVI container walk shared by the decode legs: returns
    * (width, height, isMjpeg, frame chunk (offset, size) list). Fails
    * loudly on corrupt/hostile chunk sizes — never a non-advancing
    * loop.
    */
  private def aviWalk(mediaId: Long, payload: Array[Byte])
      : (Int, Int, Boolean, IndexedSeq[(Int, Int)]) = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == 0x46464952 && bb.getInt(8) == 0x20495641,
      s"media_id=$mediaId: not a RIFF/AVI file")
    var w = 0
    var h = 0
    var mjpeg = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = bb.getInt(off)
        val size = bb.getInt(off + 4)
        // compare in Long — off + 8 + size can wrap Int
        require(size >= 0 && off.toLong + 8 + size <= to,
          s"media_id=$mediaId: corrupt RIFF chunk size $size at offset $off")
        if (id == 0x5453494C) walk(off + 12, off + 8 + size) // LIST
        else if (id == 0x66727473) { // "strf" = BITMAPINFOHEADER
          w = bb.getInt(off + 12)
          h = bb.getInt(off + 16)
          bb.getInt(off + 24) match {
            case 0 => // uncompressed DIB
              require((bb.getShort(off + 22) & 0xFFFF) == 24,
                s"media_id=$mediaId: only 24-bit DIB supported")
            case 0x47504A4D => mjpeg = true // 'MJPG'
            case c => sys.error(
              s"media_id=$mediaId: unsupported AVI compression 0x${c.toHexString}")
          }
        } else if (id == 0x62643030 || id == 0x63643030) // 00db | 00dc
          frames += ((off + 8, size))
        off += 8 + size + (size & 1)
      }
    }
    walk(12, payload.length)
    require(w > 0 && h > 0 && frames.nonEmpty,
      s"media_id=$mediaId: missing strf/frames")
    (w, h, mjpeg, frames.toIndexedSeq)
  }

  final case class FrameDhash(media_id: Long, frame_idx: Int, dhash: Long)

  /** Per-FRAME perceptual dHash over the real decoded AVI frames — the
    * video leg of the image dHash family: grayscale = channel sum,
    * pooled to the same 9×8 grid as [[imageDhash]] (identical bit
    * formula, so an independent implementation of the pixel formula
    * reproduces every hash bit-for-bit). Sampled every `everyNth`
    * frame; emits compact (media_id, frame_idx, dhash) rows — payloads
    * never reach a shuffle.
    */
  def aviFrameDhash(media: DataFrame, everyNth: Int = 3,
      batchSize: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val cols = 9; val rows = 8
    media.select("media_id", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { m =>
            val (w, h, mjpeg, frames) = aviWalk(m.media_id, m.payload)
            val rowLen = (w * 3 + 3) / 4 * 4
            (0 until frames.length by everyNth).map { f =>
              val (base, fsize) = frames(f)
              val cellSum = new Array[Long](cols * rows)
              val cellN = new Array[Long](cols * rows)
              if (mjpeg) {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(m.payload, base, fsize))
                require(img != null,
                  s"media_id=${m.media_id}: undecodable MJPEG frame $f")
                val raster = img.getRaster
                val c = raster.getNumBands
                var y = 0
                while (y < h) {
                  val cy = y * rows / h
                  var x = 0
                  while (x < w) {
                    val cell = cy * cols + x * cols / w
                    var b = 0
                    while (b < c) {
                      cellSum(cell) += raster.getSample(x, y, b)
                      b += 1
                    }
                    cellN(cell) += c
                    x += 1
                  }
                  y += 1
                }
              } else {
                var y = 0
                while (y < h) {
                  val rowOff = base + (h - 1 - y) * rowLen // bottom-up rows
                  val cy = y * rows / h
                  var x = 0
                  while (x < w) {
                    val cell = cy * cols + x * cols / w
                    var ch = 0
                    while (ch < 3) {
                      cellSum(cell) += m.payload(rowOff + x * 3 + ch) & 0xFF
                      ch += 1
                    }
                    cellN(cell) += 3
                    x += 1
                  }
                  y += 1
                }
              }
              def cellV(i: Int): Long =
                if (cellN(i) == 0) 0L else cellSum(i) / cellN(i)
              var hash = 0L
              var r = 0
              while (r < rows) {
                var c0 = 0
                while (c0 < cols - 1) {
                  if (cellV(r * cols + c0) < cellV(r * cols + c0 + 1))
                    hash |= 1L << (r * (cols - 1) + c0)
                  c0 += 1
                }
                r += 1
              }
              FrameDhash(m.media_id, f, hash)
            }
          }
        }
      }.toDF()
  }

  /** Video near-dup pairing over per-frame dHash sets — the standard
    * frame-fingerprint inverted index: candidates are video pairs
    * sharing at least one EXACT frame hash (join on the compact dhash
    * key — a shared perceptual frame hash is the strong signal for
    * duplicated footage), verified by set-Jaccard over each video's
    * DISTINCT frame-hash set at >= 1/2, expressed in exact integers
    * (2·shared >= union). Output: (id_a, id_b, n_shared, n_a, n_b).
    *
    * `dfCap` is the stop-fingerprint guard (the q201 winnowing lesson
    * applied to video): a frame hash appearing in more than `dfCap`
    * DISTINCT videos — black/intro/outro frames, test cards — is
    * non-discriminative AND its bucket alone would produce O(df²)
    * candidate pairs (a universal frame at n videos = C(n, 2) pairs =
    * the quadratic scale-killer). Capped hashes are dropped from BOTH
    * the candidate buckets and the per-video set sizes, so the Jaccard
    * stays a consistent measure over discriminative hashes.
    *
    * Scale shape: the inverted index is |distinct frame hashes| rows;
    * pairs are generated per-hash-bucket with bucket size ≤ dfCap,
    * never video × video (VideoDedupMacroBench's --universal arm pins
    * the adversarial case).
    */
  def videoNearDupPairs(frameHashes: DataFrame, dfCap: Int = 50): DataFrame = {
    require(dfCap >= 2, s"dfCap must be >= 2 (got $dfCap)")
    val hs0 = frameHashes
      .select(col("media_id"), col("dhash")).distinct()
    // stop-fingerprint cap: compact (dhash, df) aggregate, semi-joined
    val rare = hs0.groupBy("dhash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("dhash")
    val hs = hs0.join(rare, Seq("dhash"), "left_semi")
      // semi-joins rotate the key column first — pin output order
      .select(col("media_id"), col("dhash"))
    val sizes = hs.groupBy("media_id").agg(count(lit(1)).as("n"))
    val cand = hs.as("a").join(hs.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    cand
      .join(sizes.select(col("media_id").as("id_a"), col("n").as("n_a")),
        "id_a")
      .join(sizes.select(col("media_id").as("id_b"), col("n").as("n_b")),
        "id_b")
      .filter(col("n_shared") * 2 >= col("n_a") + col("n_b") - col("n_shared"))
      .select("id_a", "id_b", "n_shared", "n_a", "n_b")
  }

  def decodeAviFrames(media: DataFrame, everyNth: Int = 3,
      batchSize: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val grid = 2
    media.select("media_id", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { m =>
            val (w, h, mjpeg, frames) = aviWalk(m.media_id, m.payload)
            val rowLen = (w * 3 + 3) / 4 * 4
            (0 until frames.length by everyNth).map { f =>
              val (base, fsize) = frames(f)
              var total = 0L
              val cellSum = new Array[Long](grid * grid)
              val cellN = new Array[Long](grid * grid)
              if (mjpeg) {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(m.payload, base, fsize))
                require(img != null,
                  s"media_id=${m.media_id}: undecodable MJPEG frame $f")
                require(img.getWidth == w && img.getHeight == h,
                  s"media_id=${m.media_id}: frame $f is ${img.getWidth}x${img.getHeight}, strf says ${w}x$h")
                val raster = img.getRaster
                val c = raster.getNumBands
                var y = 0
                while (y < h) {
                  val cy = y * grid / h
                  var x = 0
                  while (x < w) {
                    val cell = cy * grid + x * grid / w
                    var b = 0
                    while (b < c) {
                      val v = raster.getSample(x, y, b)
                      total += v
                      cellSum(cell) += v
                      b += 1
                    }
                    cellN(cell) += c
                    x += 1
                  }
                  y += 1
                }
              } else {
                var y = 0
                while (y < h) {
                  val rowOff = base + (h - 1 - y) * rowLen // bottom-up rows
                  val cy = y * grid / h
                  var x = 0
                  while (x < w) {
                    val cell = cy * grid + x * grid / w
                    var ch = 0
                    while (ch < 3) {
                      val v = m.payload(rowOff + x * 3 + ch) & 0xFF
                      total += v
                      cellSum(cell) += v
                      ch += 1
                    }
                    cellN(cell) += 3
                    x += 1
                  }
                  y += 1
                }
              }
              def pool(i: Int): Double = cellSum(i).toDouble / cellN(i)
              AviFrame(m.media_id, f, w, h, frames.length, total,
                pool(0), pool(1), pool(2), pool(3))
            }
          }
        }
      }.toDF()
  }

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
