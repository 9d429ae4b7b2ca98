package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Image near-dup dedup macro at media scale — the r15 verdict's q161
  * evidence bar: the REGISTERED banded-dHash pipeline
  * ([[Multimodal.imageDhash]] → [[Multimodal.dhashNearDupPairs]]) over
  * ≥100k REAL PNGs (encoded with javax.imageio in the executors, decoded
  * back through the same batched seam the query uses — payloads never
  * touch the driver).
  *
  * Corpus: n pseudo-random 24×16 RGB images (per-pixel integer hash mix,
  * so dhashes are near-uniform 64-bit values); every 100th image is an
  * exact byte copy of its predecessor — n/100 planted duplicate pairs at
  * hamming 0.
  *
  * Gates:
  *  - recall/precision EXACT: the verified pair set must equal the
  *    planted set exactly (incidental hamming≤3 collisions among random
  *    64-bit hashes have probability ≈ 2.4e-15 per pair — a hit means
  *    the generator's hash mixing degenerated, which should fail loudly);
  *  - candidate boundedness: distinct banded candidates must stay within
  *    8× the uniform-band expectation 4·C(n,2)/2¹⁶ plus the planted
  *    pairs. Measured reality is ~4× uniform: dHash bits are NOT iid —
  *    adjacent comparisons share their middle pooled cell (strong
  *    negative correlation), which concentrates band-value mass and
  *    roughly quadruples collisions vs a uniform 16-bit hash. Even so
  *    the reduction vs the all-pairs crossJoin this replaced is ≥3
  *    orders of magnitude at n=100k (C(n,2) ≈ 5e9), and candidates per
  *    image stay O(n/2¹⁶) — the production lever past ~1M images is the
  *    SemDedup-style bucket cap / wider bands, not a different shape.
  *
  * Usage: MediaDedupMacroBench [nImages]  (default 100000)
  */
object MediaDedupMacroBench {
  private val W = 24
  private val H = 16

  /** Per-pixel integer mix — deterministic, id-keyed, near-uniform. */
  private def pix(srcId: Long, x: Int, y: Int, c: Int): Int = {
    var z = srcId * 0x9E3779B97F4A7C15L + x * 0xC2B2AE3D27D4EB4FL +
      y * 0x165667B19E3779F9L + c * 0x27D4EB2F165667C5L
    z ^= z >>> 29; z *= 0xBF58476D1CE4E5B9L; z ^= z >>> 32
    (z & 0xFF).toInt
  }

  private def pngBytes(srcId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        img.setRGB(x, y, (pix(srcId, x, y, 0) << 16) |
          (pix(srcId, x, y, 1) << 8) | pix(srcId, x, y, 2))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // every 100th image is a byte-exact copy of its predecessor; the
    // source id is a pure function of the id, so generation needs no
    // shuffle and no driver round trip
    val media = spark.range(n.toLong).as[Long]
      .mapPartitions(_.map { id =>
        val src = if (id % 100 == 99) id - 1 else id
        (id, pngBytes(src))
      })
      .toDF("media_id", "payload")
      .cache()
    media.count() // materialize generation outside the timed region

    val t0 = System.nanoTime()
    val h = Multimodal.imageDhash(media).select("media_id", "dhash").cache()
    val nCand = Multimodal.dhashBandCandidates(h).count()
    val pairs = Multimodal.dhashNearDupPairs(h, maxHamming = 3)
      .select("id_a", "id_b", "hamming").collect()
    val sec = (System.nanoTime() - t0) / 1e9

    val planted = (99L until n.toLong by 100L).map(id => (id - 1, id)).toSet
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    require(pairs.forall(_.getLong(2) == 0L),
      s"planted copies are byte-exact; nonzero hamming in ${pairs.take(5).mkString}")
    require(found == planted,
      s"verified pairs != planted: missing=${(planted -- found).take(5)} " +
        s"extra=${(found -- planted).take(5)}")
    // uniform-band candidate expectation + planted; 8x headroom covers
    // the measured ~4x correlated-bit concentration (see scaladoc)
    val expCand = 4.0 * n.toDouble * (n - 1) / 2 / 65536 + planted.size
    require(nCand <= 8 * expCand + 100,
      s"candidate blow-up: $nCand vs uniform expectation ${expCand.toLong}")
    val allPairs = n.toDouble * (n - 1) / 2
    require(nCand <= allPairs / 500,
      s"banding no longer beats all-pairs materially: $nCand of ${allPairs.toLong}")
    h.unpersist(); media.unpersist()

    println(f"""{"metric":"media_dedup_macro","value":$sec%.2f,"unit":"sec","n_images":$n,"planted_pairs":${planted.size},"found_pairs":${found.size},"candidates":$nCand,"cand_expectation":${expCand.toLong}}""")
    spark.stop()
  }
}
