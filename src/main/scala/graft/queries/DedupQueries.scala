package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Multimodal}

/** Fuzzy-dedup + multimodal surface over the testdata tables. MinHash and
  * SimHash depend on xxhash64 (not available in DuckDB) → rows-only
  * checks; the blob-metadata query is fully oracle-checked.
  */
object DedupQueries {

  /** MinHash+LSH dedup over documents: surviving doc count per lang after
    * dropping verified near-duplicates (jaccard >= 0.8 on 3-gram shingles).
    */
  val q37MinhashDedup = Q(
    "q37_minhash_dedup",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.8)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_survivors"))
    },
    None,
    headline = true)

  /** SimHash near-dup pairs over documents (hamming <= 3 of 64-bit sigs). */
  val q38SimhashPairs = Q(
    "q38_simhash_pairs",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.simhashCandidates(docs, "doc_id", "text", maxDist = 3)
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(min("dist"), lit(0)).as("min_dist"))
    },
    None)

  /** Multimodal plumbing: opaque binary payloads + typed metadata
    * (byte length, digest, magic bytes) — oracle-checked; the decode stub
    * is exercised in MultimodalSpec.
    */
  val q55BlobMeta = Q(
    "q55_blob_meta",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val media = Multimodal.asMedia(docs, "doc_id", "text")
      // DuckDB 1.0 cannot slice blobs, so the oracle-facing magic is the
      // first-4-CHARS form (equivalent for byte-per-char corpora)
      Multimodal.withByteMeta(media)
        .drop("magic")
        .join(docs.select(col("doc_id").as("media_id"),
          hex(substring(col("text"), 1, 4).cast("binary")).as("magic")),
          Seq("media_id"))
        .select("media_id", "n_bytes", "digest", "magic")
    },
    Some("""
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS digest,
             upper(hex(encode(substr(text, 1, 4)))) AS magic
      FROM documents"""))

  val qs: Seq[Q] = Seq(q37MinhashDedup, q38SimhashPairs, q55BlobMeta)
}
