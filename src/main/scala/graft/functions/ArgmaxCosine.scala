package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as ONE expression over a broadcast
  * centroid index: for each row vector, return the centroid id with the
  * highest cosine (ties → smallest id) plus that cosine, without ever
  * materializing the n×k crossJoin rows or the per-vector row_number
  * window shuffle the compositional plan needs. At 202k×1024 the old
  * plan pushed 207M rows through an Exchange per Lloyd round; this is a
  * per-row primitive loop and the assignment stage becomes narrow
  * (zero shuffles) — the shape that survives a 1000-executor scale-up,
  * since the only cluster-wide traffic left is the centroid broadcast
  * (O(k·dim), plus O(k²) for the prune matrix when k ≤ matrixMaxK).
  *
  * Numeric contract — BIT-equal to the compositional plan it replaces
  * (`CosineSim(vec, centroid)` + row_number over (cos desc, cl asc)):
  * each candidate cosine runs the exact CosineSim fold (three
  * independent left folds in element order; |v|² hoisted — the identical
  * addition sequence, so the identical value), and the argmax comparator
  * is (s > best) || (s == best && cl < bestCl) over centroids iterated
  * in ascending-cl order.
  *
  * Elkan-style exact pruning (Elkan, ICML 2003, "Using the Triangle
  * Inequality to Accelerate k-Means"), mapped to cosine by running the
  * triangle inequality on the L2-normalized images (d² = 2 − 2·cos):
  * given the row's previous cluster p (Lloyd warm start), compute
  * d_p = √(2−2·cos(v,c_p)) once, then
  *  - if d_p < s(p) − ε where s(p) = ½·min_{j≠p} D(p,j): EVERY other
  *    centroid is strictly farther — answer is p, k−1 cosines skipped;
  *  - else skip any j with D(p,j) > 2·d_p + ε (triangle inequality ⇒
  *    d(v,c_j) ≥ D(p,j) − d_p > d_p ⇒ strictly worse than p).
  * Both bounds prove STRICT inferiority before skipping, and ε = 1e-9
  * absorbs the ~1-ulp float error in D/d_p themselves, so a pruned
  * centroid can never be the one the brute comparator would have
  * picked — assignments stay bit-equal (SemDedupMacroBench re-derives
  * the brute assignment and diffs; ArgmaxCosineSpec property-tests it).
  * Rows with null/unknown prevCl simply scan all k.
  */
case class ArgmaxCosine(vec: Expression, prevCl: Expression,
    bc: Broadcast[ArgmaxCosine.CentroidIndex])
    extends Expression with ImplicitCastInputTypes with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, prevCl)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("cl", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false)))
  override def nullable: Boolean = vec.nullable

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val p = prevCl.eval(input)
    ArgmaxCosine.argmax(v.asInstanceOf[ArrayData],
      if (p == null) -1L else p.asInstanceOf[Long], bc.value)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgmaxCosine =
    copy(vec = newChildren(0), prevCl = newChildren(1))
}

object ArgmaxCosine {

  /** Never build the O(k²) pairwise prune matrix past this k — beyond
    * it only the O(k) s-bound prunes (and the broadcast stays small).
    */
  val matrixMaxK = 2048

  private val eps = 1e-9

  /** Broadcast payload: centroids flattened row-major in ASCENDING cl
    * order (the iteration order IS the tiebreak), their |c|² folds, the
    * Elkan s-bound per centroid, and (small k only) the full pairwise
    * normalized-space distance matrix.
    */
  case class CentroidIndex(clIds: Array[Long], flat: Array[Double], dim: Int) {
    require(clIds.length * dim == flat.length,
      s"flat centroid matrix ${flat.length} != ${clIds.length} x $dim")
    require(clIds.length > 0, "empty centroid index")
    val k: Int = clIds.length

    /** |c_j|² with the same left fold CosineSim runs. */
    val normSq: Array[Double] = {
      val out = new Array[Double](k)
      var j = 0
      while (j < k) {
        var s = 0.0
        var i = 0
        while (i < dim) { val x = flat(j * dim + i); s += x * x; i += 1 }
        out(j) = s
        j += 1
      }
      out
    }

    /** D(a,b) = √(2 − 2·cos(c_a,c_b)): Euclidean distance of the
      * normalized centroids; None above matrixMaxK.
      */
    val pairDist: Option[Array[Double]] =
      if (k > matrixMaxK) None
      else {
        val d = new Array[Double](k * k)
        var a = 0
        while (a < k) {
          var b = a + 1
          while (b < k) {
            var dot = 0.0
            var i = 0
            while (i < dim) { dot += flat(a * dim + i) * flat(b * dim + i); i += 1 }
            val c = dot / (math.sqrt(normSq(a)) * math.sqrt(normSq(b)))
            val dist = math.sqrt(math.max(0.0, 2.0 - 2.0 * c))
            d(a * k + b) = dist
            d(b * k + a) = dist
            b += 1
          }
          a += 1
        }
        Some(d)
      }

    /** Elkan s(j) = ½ · min distance to any OTHER centroid. */
    val sBound: Array[Double] = pairDist match {
      case Some(d) =>
        val out = new Array[Double](k)
        var a = 0
        while (a < k) {
          var m = Double.MaxValue
          var b = 0
          while (b < k) { if (b != a && d(a * k + b) < m) m = d(a * k + b); b += 1 }
          out(a) = 0.5 * m
          a += 1
        }
        out
      case None => Array.fill(k)(0.0) // no-op bound: never prunes
    }

    @transient lazy val pos: java.util.HashMap[Long, Integer] = {
      val m = new java.util.HashMap[Long, Integer](k * 2)
      var j = 0
      while (j < k) { m.put(clIds(j), j); j += 1 }
      m
    }
  }

  /** Build an index from (cl, centroid) pairs; sorts by cl ascending. */
  def buildIndex(cents: Seq[(Long, Array[Double])]): CentroidIndex = {
    val sorted = cents.sortBy(_._1).toArray
    val dim = sorted.head._2.length
    val flat = new Array[Double](sorted.length * dim)
    var j = 0
    while (j < sorted.length) {
      require(sorted(j)._2.length == dim, "ragged centroid dims")
      System.arraycopy(sorted(j)._2, 0, flat, j * dim, dim)
      j += 1
    }
    CentroidIndex(sorted.map(_._1), flat, dim)
  }

  private def cosineAt(v: ArrayData, na: Double, idx: CentroidIndex, j: Int): Double = {
    val dim = idx.dim
    var dot = 0.0
    var i = 0
    while (i < dim) { dot += v.getDouble(i) * idx.flat(j * dim + i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(idx.normSq(j)))
  }

  /** The kernel; prevCl < 0 or unknown → full unpruned scan. */
  def argmax(v: ArrayData, prevCl: Long, idx: CentroidIndex): InternalRow = {
    require(v.numElements() == idx.dim,
      s"vector dim ${v.numElements()} != centroid dim ${idx.dim}")
    var na = 0.0
    var i = 0
    while (i < idx.dim) { val x = v.getDouble(i); na += x * x; i += 1 }

    val pBox = if (prevCl < 0) null else idx.pos.get(prevCl)
    var bestJ = -1
    var bestS = Double.NegativeInfinity
    var dp = 0.0
    val p = if (pBox == null) -1 else pBox.intValue()
    if (p >= 0) {
      bestJ = p
      bestS = cosineAt(v, na, idx, p)
      dp = math.sqrt(math.max(0.0, 2.0 - 2.0 * math.min(bestS, 1.0)))
    }
    val skipAll = p >= 0 && dp < idx.sBound(p) - eps
    if (!skipAll) {
      val pd = idx.pairDist.orNull
      var j = 0
      while (j < idx.k) {
        if (j != p && (p < 0 || pd == null || !(pd(p * idx.k + j) > 2.0 * dp + eps))) {
          val s = cosineAt(v, na, idx, j)
          if (s > bestS || (s == bestS && idx.clIds(j) < idx.clIds(bestJ))) {
            bestJ = j
            bestS = s
          }
        }
        j += 1
      }
    }
    InternalRow(idx.clIds(bestJ), bestS)
  }

  /** Column entry point: broadcasts the index once and returns a
    * struct(cl, cos_sim) column. Pass `prevCl = lit(-1L)` when there is
    * no warm start.
    */
  def apply(spark: SparkSession, v: Column, prevCl: Column,
      idx: CentroidIndex): Column = {
    val bc = spark.sparkContext.broadcast(idx)
    GraftColumnBridge.toColumn(ArgmaxCosine(
      GraftColumnBridge.toExpression(v.cast("array<double>")),
      GraftColumnBridge.toExpression(prevCl.cast("long")), bc))
  }
}
