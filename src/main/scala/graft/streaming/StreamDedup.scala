package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

import graft.operators.Dedup

/** STREAMING fuzzy (MinHash-LSH) dedup against a persisted corpus index —
  * the continuous-ingest twin of q116's batch incremental dedup, and the
  * streaming-dedup shape production corpus services run: the persisted
  * band index IS the operator's INITIAL STATE
  * (`flatMapGroupsWithState(..., initialState)`), each arriving document
  * meets only the state bucket of its own LSH band hashes, and exact
  * set-Jaccard verification runs inside the state function against just
  * that bucket's members. State per band_hash grows by the delta docs
  * seen under that band — the same index rows a batch re-run would
  * persist, so state size ≡ index size, never corpus×delta.
  *
  * Verdict semantics equal the batch rule (reference
  * data_pipelines-style daily ingest, cf. q116): an arriving doc is
  * dropped iff it verifies at `threshold` Jaccard against ANY corpus
  * member or ANY EARLIER-ARRIVING delta doc (arrival is replayed in
  * doc_id order, so "earlier" ≡ smaller id — dropped docs still join the
  * index, mirroring the pairwise rule). Verification compares
  * cross-engine md5-derived 64-bit shingle-hash SETS (Dedup.md5Hash64),
  * so the DuckDB oracle replays the identical arithmetic — a hash
  * collision would be replicated bit-for-bit on both sides rather than
  * diverging.
  */
object StreamDedup {

  /** One (band bucket, document) occurrence flowing through the stream. */
  case class BandRow(bandHash: Long, docId: Long, shh: Array[Long])

  /** One indexed document under one band bucket. `corpus` members match
    * every arrival; delta members only match LATER (larger-id) arrivals.
    */
  case class Member(docId: Long, corpus: Boolean, shh: Array[Long])

  case class Verdict(docId: Long, matched: Boolean)

  /** Project (id, text) to one row per (band_hash, doc) with the
    * md5-hashed shingle verification set attached. The typed
    * `map(identity)` barrier is the STREAMING stand-in for the batch
    * `cache()`-before-explode rule: without a deserialize boundary,
    * projection collapse re-inlines the full k-hash MinHash signature
    * into every one of the `bands` generated elements (bands× the hash
    * work); past the barrier the signature is a plain attribute the
    * banding slices cheaply.
    */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16): Dataset[BandRow] = {
    val s = docs.sparkSession
    import s.implicits._
    val rows = k / bands
    docs
      .select(col(idCol).cast("long").as("docId"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("shx", transform(col("sh"), t => xxhash64(t)))
      .select(col("docId"),
        array_distinct(transform(col("sh"), t => Dedup.md5Hash64(t)))
          .as("shh"),
        Dedup.minhashSignatureFromHashes(col("shx"), k).as("sig"))
      .as[(Long, Array[Long], Array[Long])]
      .map(identity)          // ser/deser barrier: sig materialized once
      .toDF("docId", "shh", "sig")
      .select(col("docId"), col("shh"),
        explode(Dedup.bandedSignature(col("sig"), k, bands)).as("b"))
      .select(col("b.band_hash").as("bandHash"), col("docId"), col("shh"))
      .as[BandRow]
  }

  /** Build the initial per-band state from a STATIC corpus: one state row
    * per band_hash holding that bucket's members (compact ids + hash
    * sets only — the same rows q116 persists as the bucketed index).
    */
  def corpusIndexState(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16)
      : KeyValueGroupedDataset[Long, Seq[Member]] = {
    val s = corpus.sparkSession
    import s.implicits._
    bandRows(corpus, idCol, textCol, n, k, bands)
      .groupBy("bandHash")
      .agg(collect_list(struct(col("docId"), lit(true).as("corpus"),
        col("shh"))).as("members"))
      .as[(Long, Seq[Member])]
      .groupByKey(_._1)
      .mapValues(_._2)
  }

  /** The stateful core: per band bucket, verify each arriving doc (in
    * ascending-id order within the micro-batch) against corpus members
    * and smaller-id delta members, emit a per-(band, doc) verdict, and
    * append the arrival to the bucket. A doc is a duplicate iff ANY of
    * its bands emits `matched=true` (LSH OR-semantics) — aggregate the
    * verdicts downstream.
    */
  def dedupStream(stream: Dataset[BandRow],
      initial: KeyValueGroupedDataset[Long, Seq[Member]],
      threshold: Double = 0.8): Dataset[Verdict] = {
    val s = stream.sparkSession
    import s.implicits._
    stream
      .groupByKey(_.bandHash)
      .flatMapGroupsWithState[Seq[Member], Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout(), initial) {
        (_: Long, rows: Iterator[BandRow], state: GroupState[Seq[Member]]) =>
          var members = state.getOption.getOrElse(Seq.empty[Member])
          val out = scala.collection.mutable.ArrayBuffer.empty[Verdict]
          rows.toSeq.sortBy(_.docId).foreach { r =>
            val a = r.shh.toSet
            val hit = members.exists { m =>
              (m.corpus || m.docId < r.docId) && {
                val inter = m.shh.count(a.contains)
                val union = a.size + m.shh.length - inter
                union > 0 && inter.toDouble / union >= threshold
              }
            }
            out += Verdict(r.docId, hit)
            members = members :+ Member(r.docId, corpus = false, r.shh)
          }
          state.update(members)
          out.iterator
      }
  }
}
