package graft

/** Pins q225's planted closed form: under NFC every decomposed copy is
  * an exact duplicate of its composed twin, so the exact-dedup stage
  * keeps exactly HALF the raw variant's survivors — skipping NFC
  * provably changes the curation funnel (the load-bearing guarantee
  * the r19 verdict asked for; q218 only witnessed the expression).
  */
class NfcCurationSpec extends SparkSpec {

  test("NFC halves the exact-dedup survivor count on the paired corpus") {
    val rows = graft.queries.PipelineQueries.q225CurationNfc
      .run(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (nfcArr, nfcQ, nfcE, nfcN) = rows("nfc")
    val (rawArr, rawQ, rawE, rawN) = rows("raw")
    // same corpus arrives at both variants; quality is NFC-invariant
    // here (substitution never changes token boundaries or counts)
    assert(nfcArr == rawArr && nfcQ == rawQ)
    assert(nfcArr > 0, "vacuous-funnel guard (the r19 rule)")
    // the closed form: every pair collapses to one doc under NFC
    assert(2 * nfcE == rawE, s"2*$nfcE != $rawE")
    // monotone funnel on both sides
    assert(nfcQ >= nfcE && nfcE >= nfcN && rawQ >= rawE && rawE >= rawN)
  }
}
