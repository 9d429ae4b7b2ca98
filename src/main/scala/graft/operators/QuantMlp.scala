package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.operators.Multimodal.BatchEmbedder

/** A REAL (if tiny) quantized 2-layer MLP behind the batch-inference
  * seam — the r16 verdict item: `embedWithModel` had only ever carried
  * a stand-in linear model, so the contract (artifact load in open(),
  * batched matmul, per-task lifecycle) was never proven against an
  * actual model artifact. This is the pure-JVM stand-in for an ONNX
  * runtime this zero-egress container cannot ship: a serialized weight
  * ARTIFACT on disk, loaded per task, evaluated with batched integer
  * GEMM loops.
  *
  * Arithmetic is EXACT end to end (the q166 recipe): inputs quantize by
  * floor(x·1024) — a power-of-2 scale, so the float→double widening and
  * the product are IEEE-exact and DuckDB replays them bit-for-bit —
  * then h = relu(W1·xq + b1), e = W2·h + b2 in Long. Magnitude bound:
  * |xq| ≤ 2^13 (inputs < 8), |W| ≤ 8, dims 64→16→8 ⇒ |h| ≤ 2^22,
  * |e| ≤ 2^29 — integer-exact at any summation order, so the oracle's
  * generated SQL (same weight arrays → literal lists, the
  * never-hand-copy rule) matches by hash.
  *
  * The artifact format is little-endian binary: magic "QMLP", the three
  * dims, then W1 (hid×in), b1, W2 (out×hid), b2 as int64 — a real
  * parse-and-validate load path, not a Scala object graph.
  */
final case class QuantMlp(
    w1: Array[Array[Long]], b1: Array[Long],
    w2: Array[Array[Long]], b2: Array[Long]) {
  val nIn: Int = w1.head.length
  val nHid: Int = w1.length
  val nOut: Int = w2.length
  require(b1.length == nHid && w2.forall(_.length == nHid) &&
    b2.length == nOut && w1.forall(_.length == nIn), "inconsistent shapes")

  /** One input vector → exact-integer output (as Longs). */
  def forward(x: Array[Double]): Array[Long] = {
    require(x.length == nIn, s"input dim ${x.length} != $nIn")
    val xq = new Array[Long](nIn)
    var i = 0
    while (i < nIn) { xq(i) = math.floor(x(i) * 1024.0).toLong; i += 1 }
    val h = new Array[Long](nHid)
    var k = 0
    while (k < nHid) {
      var acc = b1(k)
      val row = w1(k)
      var j = 0
      while (j < nIn) { acc += row(j) * xq(j); j += 1 }
      h(k) = if (acc > 0) acc else 0L
      k += 1
    }
    val e = new Array[Long](nOut)
    var o = 0
    while (o < nOut) {
      var acc = b2(o)
      val row = w2(o)
      var j = 0
      while (j < nHid) { acc += row(j) * h(j); j += 1 }
      e(o) = acc
      o += 1
    }
    e
  }

  def save(path: String): Unit = {
    val n = 4 + 12 + 8 * (nHid * nIn + nHid + nOut * nHid + nOut)
    val bb = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("QMLP".getBytes("US-ASCII"))
    bb.putInt(nIn); bb.putInt(nHid); bb.putInt(nOut)
    w1.foreach(_.foreach(bb.putLong)); b1.foreach(bb.putLong)
    w2.foreach(_.foreach(bb.putLong)); b2.foreach(bb.putLong)
    Files.write(Paths.get(path), bb.array())
  }
}

object QuantMlp {

  def load(path: String): QuantMlp = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 16, s"$path: truncated artifact header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, "US-ASCII") == "QMLP",
      s"$path is not a QuantMlp artifact")
    val (nIn, nHid, nOut) = (bb.getInt, bb.getInt, bb.getInt)
    require(nIn > 0 && nHid > 0 && nOut > 0 && bytes.length ==
      16 + 8 * (nHid.toLong * nIn + nHid + nOut.toLong * nHid + nOut),
      s"$path: truncated artifact")
    def mat(r: Int, c: Int) = Array.fill(r)(Array.fill(c)(bb.getLong))
    def vec(nv: Int) = Array.fill(nv)(bb.getLong)
    QuantMlp(mat(nHid, nIn), vec(nHid), mat(nOut, nHid), vec(nOut))
  }

  /** Hash-derived pseudo-weights (the q163 pattern — a trained model
    * would arrive as the same artifact): W entries in [-8, 8], biases
    * in [-16, 16], all from md5Hash64 so the oracle SQL generator uses
    * the SAME arrays.
    */
  def pseudo(nIn: Int = 64, nHid: Int = 16, nOut: Int = 8): QuantMlp = {
    def w(tag: String, a: Int, b: Int): Long =
      Math.floorMod(Dedup.md5Hash64Local(s"${tag}_${a}_$b"), 17L) - 8L
    def bv(tag: String, a: Int): Long =
      Math.floorMod(Dedup.md5Hash64Local(s"${tag}_$a"), 33L) - 16L
    QuantMlp(
      Array.tabulate(nHid, nIn)((k, i) => w("w1", k, i)),
      Array.tabulate(nHid)(k => bv("b1", k)),
      Array.tabulate(nOut, nHid)((o, k) => w("w2", o, k)),
      Array.tabulate(nOut)(o => bv("b2", o)))
  }

  /** DuckDB SQL expression for output `o` given a BIGINT-list column
    * `xq` — generated from the SAME weight arrays the JVM forward pass
    * uses (the never-hand-copy rule). Integer sums are
    * order-independent, so list_aggregate('sum') is exact.
    */
  def oracleExpr(net: QuantMlp, o: Int, xqCol: String): String = {
    def lst(a: Array[Long]) = a.mkString("[", ", ", "]")
    val hTerms = (0 until net.nHid).map { k =>
      s"greatest(0, ${net.b1(k)} + list_aggregate(list_transform(" +
        s"generate_series(1, ${net.nIn}), i -> (${lst(net.w1(k))})[i] * " +
        s"$xqCol[i]), 'sum'))"
    }
    val terms = (0 until net.nHid)
      .map(k => s"${net.w2(o)(k)} * (${hTerms(k)})")
    s"CAST(${net.b2(o)} + ${terms.mkString(" + ")} AS BIGINT)"
  }
}

/** The [[BatchEmbedder]] carrying a [[QuantMlp]] ARTIFACT through the
  * seam: construction holds only the path (serialized to executors);
  * `open()` parses the artifact per task — the real model lifecycle —
  * and `close()` drops it. Outputs are the exact-integer Longs widened
  * to Double (all < 2^30, exactly representable).
  */
final case class QuantMlpEmbedder(artifactPath: String) extends BatchEmbedder {
  @transient private var net: QuantMlp = _
  // dim must be known driver-side before open(): read it from the
  // artifact header once at construction
  val dim: Int = QuantMlp.load(artifactPath).nOut
  override def open(): Unit = { net = QuantMlp.load(artifactPath) }
  override def close(): Unit = { net = null }
  override def embedBatch(features: Seq[Array[Double]]): Seq[Array[Double]] = {
    require(net != null, "open() was not called before embedBatch")
    features.map(x => net.forward(x).map(_.toDouble))
  }
}
