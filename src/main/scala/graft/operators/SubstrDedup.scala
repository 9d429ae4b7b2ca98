package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ARBITRARY-BOUNDARY exact-substring dedup (Lee et al. 2022's
  * ExactSubstr posture, unaligned): q202 only detects/cuts duplicated
  * spans that start on 16-token window boundaries; the production form
  * must catch a ≥L-CHAR repeat wherever it sits (mid-token, mid-line,
  * any offset). Formulation: every char position i of every doc defines
  * an L-char window; a window is DUPLICATED iff its literal L-gram
  * occurs ≥ 2 times corpus-wide (within-doc repeats count); the
  * duplicated-region mask of a doc is the union of its duplicated
  * windows, and a window is CUT unless it is the global FIRST
  * occurrence of its gram (owner = min(doc_id·2^20 + pos) — one scalar
  * BIGINT, the q202 ownership rule). Equivalence to the substring
  * statement: a repeated substring of length ≥ L contains a duplicated
  * L-window at EVERY offset inside it, so the mask covers exactly the
  * chars lying in some corpus-repeated run of length ≥ L.
  *
  * Scale shape (the q201 candidate→exact-verify posture):
  *  - stage 1 groups COMPACT 64-bit md5 keys, not 24-char strings — at
  *    100 TB the first shuffle carries 8-byte keys for every char
  *    position, nothing else;
  *  - stage 2 re-groups only the CANDIDATE windows (hash count ≥ 2) by
  *    their LITERAL gram, so a 60-bit hash collision costs one wasted
  *    candidate instead of a wrong cut — counts, owners and the cut
  *    decision are all on literal strings, collision-proof;
  *  - the per-doc rewrite joins the (sparse) cut list back to the doc
  *    table — docs with no duplicated window never enter the join.
  *
  * The windows frame is consumed twice (stage-1 build + stage-2 probe):
  * callers running the full DAG once (Verify) pay a double scan, which
  * at the gate SFs is cheaper than caching 24-char gram rows; the macro
  * localCheckpoints it.
  *
  * Cross-engine: positions are 1-based char offsets (`substring` /
  * `substr` agree), ownership arithmetic is exact BIGINT, the mask and
  * digest are order-insensitive set operations plus one md5 — DuckDB
  * replays every stage literally (the oracle skips the hash prefilter:
  * string-equality grouping is its exact semantics, and the prefilter
  * provably drops nothing).
  */
object SubstrDedup {

  /** Per-doc cut statistics + surviving-text digest. Output columns:
    * doc_id (the idCol, as-is), n_windows, n_cut_windows, n_chars_cut
    * (all BIGINT), kept_md5 (md5 of the doc's chars outside the cut
    * mask, in order). Docs shorter than L emit zeros and the digest of
    * their whole text.
    */
  def cutStats(docs: DataFrame, idCol: String, textCol: String,
      L: Int = 24): DataFrame = {
    require(L >= 2, s"window length $L")
    val id = col(idCol)
    val t = col(textCol)
    // ownership key doc_id·2^20 + pos is injective only while docs are
    // < 2^20 chars and ids < 2^43 — fail LOUDLY past either bound (the
    // q202 lesson), through an output column so the guard is
    // load-bearing
    val nWinGuarded = when(length(t) < lit(1048576) && id < lit(1L << 43),
      greatest(length(t) - lit(L - 1), lit(0)).cast("long"))
      .otherwise(raise_error(concat(lit("substr-dedup: doc "),
        id.cast("string"),
        lit(" breaks the doc_id*2^20+pos ownership key bounds"))))

    val base = docs.select(id.as("doc_id"), t.as("text"),
      nWinGuarded.as("n_windows"))

    // per-position windows: explode the PRIMITIVE position sequence
    // (TOTAL — slice of a greatest-bounded sequence, the round-5
    // lesson; explode_OUTER + isNotNull per the
    // InferFiltersFromGenerate fix) and compute the substring
    // POST-explode in the same codegen stage. Building an
    // array-of-struct(pos, 24-char string) per row and exploding THAT
    // measured 2.9 s vs 0.2 s warm for 1.37M windows at sf0.1 — the
    // struct-array construction boxes every window; the primitive
    // int-sequence explode plus a fused substr projection never
    // materializes it.
    val wins = base
      .select(col("doc_id"), col("text"), explode_outer(expr(
        s"slice(sequence(1, greatest(length(text) - ${L - 1}, 1))," +
          s" 1, greatest(length(text) - ${L - 1}, 0))")).as("pos"))
      .filter(col("pos").isNotNull)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("text").substr(col("pos"), lit(L)).as("g"))

    cutsToStats(base, cuts(wins), L)
  }

  /** Stage 1+2: (doc_id, pos, g) windows → (doc_id, pos) cut list.
    *
    * Skew guard (r17 advice): a boilerplate gram occurring k times
    * corpus-wide routes all k rows through ONE window-partition task —
    * and WindowExec skew has no AQE mitigation. Hash classes whose
    * stage-1 count exceeds `hotCap` therefore take a groupBy+join-back
    * path instead: map-side partial aggregation collapses the hot gram
    * per mapper, and the join back is a plain equi-join AQE can
    * skew-split (the r7 AQE rule). Everything else keeps the window
    * form, which measured faster than groupBy+join-back at realistic
    * skew (one candidate shuffle vs two plus a join). The split is by
    * hash class, so every occurrence of a literal gram takes the same
    * path and counts/owners are computed over ALL its occurrences —
    * the union is exactly the single-path cut list (spec-pinned with a
    * tiny hotCap).
    */
  def cuts(wins: DataFrame, hotCap: Long = 65536L): DataFrame = {
    // xxhash64, not md5Hash64: the prefilter hash has NO oracle image
    // (stage 2 re-derives everything from literal grams), so the cheap
    // hash wins — md5Hash64 measured ~2× the whole stage-1 cost at
    // 41M windows (full md5 + hex substring + conv per window)
    val keyed = wins.select(col("doc_id"), col("pos"), col("g"),
      xxhash64(col("g")).as("hk"))
    // stage 1: compact-key counts — the only corpus-sized shuffle
    val counts = keyed.groupBy("hk").agg(count(lit(1)).as("hc"))
      .filter(col("hc") >= 2)
    val key = col("doc_id") * lit(1048576L) + col("pos")
    // stage 2a (typical grams): literal-gram verify — count + owner as
    // WINDOW aggregates over one partitionBy(g) exchange (unordered
    // frames, no sort semantics): one shuffle of the candidate rows
    // rather than two plus a join
    val coldWins = keyed
      .join(counts.filter(col("hc") <= hotCap).select("hk"), "hk")
      .select(col("doc_id"), col("pos"), col("g"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val coldCuts = coldWins
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("owner", min(key).over(w))
      .filter(col("cnt") >= 2 && key =!= col("owner"))
      .select(col("doc_id"), col("pos"))
    // stage 2b (hot grams): skew-immune groupBy (partial agg) + plain
    // equi-join back (AQE splits the probe-side hot key)
    val hotWins = keyed
      .join(counts.filter(col("hc") > hotCap).select("hk"), "hk")
      .select(col("doc_id"), col("pos"), col("g"))
    val hotAgg = hotWins.groupBy("g")
      .agg(count(lit(1)).as("cnt"), min(key).as("owner"))
      .filter(col("cnt") >= 2)
    val hotCuts = hotWins.join(hotAgg, "g")
      .filter(key =!= col("owner"))
      .select(col("doc_id"), col("pos"))
    coldCuts.unionByName(hotCuts)
  }

  /** Cut list → per-doc mask/digest stats (pure per-row array math
    * after one sparse groupBy + left join).
    */
  private def cutsToStats(base: DataFrame, cutList: DataFrame,
      L: Int): DataFrame = {
    val arm = lit(L - 1) // window [pos, pos + L - 1]
    val perDoc = cutList.groupBy("doc_id")
      .agg(collect_list(col("pos")).as("ps"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("n_windows"),
        coalesce(col("ps"), array().cast("array<long>")).as("ps"))
      .select(col("doc_id"), col("text"), col("n_windows"), col("ps"),
        array_distinct(flatten(transform(col("ps"),
          p => sequence(p, p + arm)))).as("cov"))
      .select(col("doc_id"),
        col("n_windows"),
        size(col("ps")).cast("long").as("n_cut_windows"),
        size(col("cov")).cast("long").as("n_chars_cut"),
        md5(array_join(transform(
          filter(
            // TOTAL char-position sequence (slice of a greatest-bounded
            // sequence — sequence(1, 0) would be DESCENDING)
            slice(sequence(lit(1L), greatest(length(col("text")), lit(1))
              .cast("long")), lit(1), length(col("text"))),
            i => !array_contains(col("cov"), i)),
          i => col("text").substr(i.cast("int"), lit(1))),
          "")).as("kept_md5"))
  }
}
