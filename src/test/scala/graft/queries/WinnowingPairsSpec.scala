package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** q201 semantics: winnowing pairing must detect a planted partial copy
  * (a long shared substring inside otherwise-different documents) that
  * q57's whole-document rolling fingerprint provably misses — the MOSS
  * robustness delta the round-13 verdict asked to demonstrate.
  */
class WinnowingPairsSpec extends SparkSpec {

  private val shared =
    "the migrating cranes crossed the frozen delta at dawn carrying rings"

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      schema)
  }

  test("planted partial copy is paired; unrelated docs are not") {
    val d = docs(
      1L -> s"report alpha: $shared and then the weather turned",
      // prefix AND suffix edited — only the middle chunk is shared
      2L -> s"completely different preamble text here $shared unrelated tail words",
      3L -> "this third document shares no long substring with the others at all")
    val pairs = DedupQueries.winnowingPairs(d)
      .select("ai", "bi").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)), pairs.mkString(","))
  }

  test("q57 whole-doc rolling fingerprint misses the same partial copy") {
    val d = docs(
      1L -> s"report alpha: $shared and then the weather turned",
      2L -> s"completely different preamble text here $shared unrelated tail words")
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val hashes = transform(toks,
      t => graft.operators.Dedup.md5Hash64(t) % 1000000007L)
    val fps = d.select(col("doc_id"),
      aggregate(hashes, lit(0L),
        (acc, h) => (acc * 1000003L + h) % 2147483647L).as("fingerprint"))
      .collect().map(_.getLong(1))
    assert(fps(0) != fps(1),
      "q57 fingerprints collide — fixture no longer demonstrates the delta")
  }

  test("containment is n_shared over the smaller fingerprint set") {
    val d = docs(
      1L -> s"report alpha: $shared and then the weather turned",
      2L -> s"completely different preamble text here $shared unrelated tail words")
    val r = DedupQueries.winnowingPairs(d).collect()
    assert(r.length == 1)
    val row = r(0)
    val (nShared, nA, nB) =
      (row.getLong(2), row.getLong(3), row.getLong(4))
    assert(nShared >= 3 && nShared <= math.min(nA, nB))
    assert(row.getDouble(5) == nShared.toDouble / math.min(nA, nB))
  }
}
