package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.functions.{CosineSim, WkbRingCoords}

/** Generator-based properties for the round-7 kernels, each checked
  * against an independent in-test reference implementation: connected
  * components vs union-find, the WKB decode vs an in-test encoder,
  * CosineSim vs naive arithmetic, PrefixSum vs a sequential scan.
  * Fewer iterations than the pure-kernel ScalaCheck suite — each case
  * spins Spark jobs — but randomized structure is exactly what the
  * example-based specs can't cover (random graph shapes, ragged rings).
  */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(iters: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(iters), p)
    assert(res.passed, res.status.toString)
  }

  test("ConnectedComponents equals union-find on random graphs") {
    val edgesGen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es
    check(12)(Prop.forAll(edgesGen) { es =>
      val real = es.filter { case (a, b) => a != b }
      real.isEmpty || {
        // reference: classic union-find with min-label components
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        real.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(k => k -> find(k)).toMap
        val got = ConnectedComponents.run(real.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want
      }
    })
  }

  test("WkbRingCoords inverts an in-test WKB encoder on ragged rings") {
    val ringGen = for {
      n <- Gen.chooseNum(3, 12)
      pts <- Gen.listOfN(n, for {
        x <- Gen.chooseNum(-180.0, 180.0); y <- Gen.chooseNum(-90.0, 90.0)
      } yield (x, y))
      little <- Gen.oneOf(true, false)
    } yield (pts :+ pts.head, little)
    check(20)(Prop.forAll(ringGen) { case (ring, little) =>
      val buf = java.nio.ByteBuffer.allocate(9 + 4 + ring.size * 16)
        .order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN
          else java.nio.ByteOrder.BIG_ENDIAN)
      buf.put(if (little) 1.toByte else 0.toByte)
      buf.putInt(3).putInt(1).putInt(ring.size)
      ring.foreach { case (x, y) => buf.putDouble(x); buf.putDouble(y) }
      val xs = WkbRingCoords.decode(buf.array(), 0)
      val ys = WkbRingCoords.decode(buf.array(), 1)
      xs.toDoubleArray().toSeq == ring.map(_._1) &&
        ys.toDoubleArray().toSeq == ring.map(_._2)
    })
  }

  test("CosineSim.cosine equals naive arithmetic on random vectors") {
    val vecGen = for {
      n <- Gen.chooseNum(1, 64)
      a <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
      b <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
    } yield (a, b)
    check(50)(Prop.forAll(vecGen) { case (a, b) =>
      import org.apache.spark.sql.catalyst.util.ArrayData
      val got = CosineSim.cosine(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      val want = dot / (math.sqrt(na) * math.sqrt(nb))
      got.doubleValue() == want || (got.doubleValue().isNaN && want.isNaN)
    })
  }

  test("PrefixSum equals a sequential scan on random tables") {
    val rowsGen = for {
      n <- Gen.chooseNum(1, 500)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
    } yield vs
    check(8)(Prop.forAll(rowsGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("k", "v")
      val got = PrefixSum.runningSum(df,
          Seq(org.apache.spark.sql.functions.col("k")),
          org.apache.spark.sql.functions.col("v"), "cum", 5)
        .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1).map(_._2)
      val want = vs.scanLeft(0L)(_ + _).tail
      got.toSeq == want
    })
  }
}
