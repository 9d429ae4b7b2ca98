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
        (acc, h) => (acc * 1000003L + h) %
          graft.functions.WindowFingerprints.DefaultMod).as("fingerprint"))
      .collect().map(_.getLong(1))
    assert(fps(0) != fps(1),
      "q57 fingerprints collide — fixture no longer demonstrates the delta")
  }

  test("containment is n_shared over the smaller fingerprint set; copy is long-verified") {
    val d = docs(
      1L -> s"report alpha: $shared and then the weather turned",
      2L -> s"completely different preamble text here $shared unrelated tail words")
    val r = DedupQueries.winnowingPairs(d).collect()
    assert(r.length == 1)
    val row = r(0)
    val (nShared, nLong, nA, nB) =
      (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(nShared >= 3 && nShared <= math.min(nA, nB))
    // the 69-char planted copy must carry 69-24+1 = 46 shared 24-grams
    // at minimum (boundary spaces can add a couple more)
    assert(nLong >= 46, s"n_long=$nLong")
    assert(row.getDouble(6) == nShared.toDouble / math.min(nA, nB))
  }

  test("scattered short overlaps pass the fp prefilter but fail the 24-char verify") {
    // three DISJOINT 16-char shared snippets: each shared region (with
    // its boundary spaces, 18 chars) is >= 11, so the winnowing
    // guarantee forces >= 3 shared fingerprints — a candidate pair —
    // but the longest common substring is 18 < 24 chars, so exact
    // verification must reject it (this is precisely the incidental
    // class that drowned precision at 1M docs in the r14 macro)
    val s1 = "cranberry fields"
    val s2 = "winter snowstorm"
    val s3 = "yellow submarine"
    val d = docs(
      1L -> s"aaa1 $s1 bbb2 $s2 ccc3 $s3 ddd4",
      2L -> s"xxx5 $s1 yyy6 $s2 zzz7 $s3 www8")
    // prefilter sanity: the pair really is a candidate (>= 3 shared fps)
    val fps = DedupQueries.winnowFps(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sharedFps = fps.filter(_._1 == 1L).map(_._2).toSet
      .intersect(fps.filter(_._1 == 2L).map(_._2).toSet)
    assert(sharedFps.size >= 3, s"fixture lost its candidate status: $sharedFps")
    val pairs = DedupQueries.winnowingPairs(d).collect()
    assert(pairs.isEmpty,
      "short scattered overlaps must not be reported as a copy pair: " +
        pairs.mkString(","))
  }
}
