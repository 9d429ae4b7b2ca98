package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r18 hot-gram skew split in SubstrDedup.cuts: hash classes
  * above `hotCap` take the groupBy+join-back path instead of the
  * window-aggregate path — the UNION must equal the single-path cut
  * list exactly, for any cap (a boilerplate 24-gram occurring k times
  * corpus-wide otherwise funnels k rows through one window task; the
  * r17 advice item).
  */
class SubstrDedupSpec extends SparkSpec {

  private def cutSet(hotCap: Long, docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    import spark.implicits._
    val d = docs.toDF("doc_id", "text")
    val L = 24
    val wins = d
      .select(col("doc_id"), col("text"), explode_outer(expr(
        s"slice(sequence(1, greatest(length(text) - ${L - 1}, 1))," +
          s" 1, greatest(length(text) - ${L - 1}, 0))")).as("pos"))
      .filter(col("pos").isNotNull)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("text").substr(col("pos"), lit(L)).as("g"))
    SubstrDedup.cuts(wins, hotCap).as[(Long, Long)].collect().toSet
  }

  // a corpus with one BOILERPLATE run shared by every doc (the hot
  // class) plus per-doc unique tails and one planted cross-doc copy
  private val boiler = "#BOILERPLATE-HEADER-24CH#" // 25 chars: 2 windows/doc
  private def corpus: Seq[(Long, String)] = {
    val copy = "the exact duplicated run 123456" // >= 24 chars, docs 3 & 7
    (0L until 12L).map { i =>
      val tail = s"unique tail $i " + ("x" + i.toString) * 8
      val mid = if (i == 3 || i == 7) copy else s"mid content $i"
      (i, boiler + " " + mid + " " + tail)
    }
  }

  test("hot-path split is exactly the single-path cut list, any cap") {
    val all = cutSet(hotCap = Long.MaxValue, corpus) // pure window path
    val mixed = cutSet(hotCap = 4, corpus)           // boilerplate -> hot path
    val allHot = cutSet(hotCap = 1, corpus)          // everything hot
    assert(all.nonEmpty, "fixture must produce cuts")
    assert(mixed == all, "hot/cold union diverged from the window path")
    assert(allHot == all, "all-hot path diverged from the window path")
  }

  test("boilerplate windows are cut everywhere but the owner") {
    val all = cutSet(hotCap = 4, corpus)
    // shared-prefix accounting: every doc starts with boiler+" " (26
    // chars) -> windows at pos 1..3 are corpus-wide duplicates, owner
    // doc 0; docs 3 and 7 share boiler+" "+copy+" unique tail " (70
    // chars, the digit bounds the run) -> doc 7 is cut at pos 1..47,
    // doc 3 (the owner past pos 3) only at 1..3; doc 0 owns every class
    // it belongs to and is cut nowhere
    def cutsOf(d: Long) = all.collect { case (`d`, p) => p }
    assert(cutsOf(0L).isEmpty)
    (1L until 12L).foreach { d =>
      assert(Set(1L, 2L, 3L).subsetOf(cutsOf(d).toSet), s"doc $d pos 1..3")
    }
    assert(cutsOf(3L).toSet == Set(1L, 2L, 3L))
    assert(cutsOf(7L).toSet == (1L to 47L).toSet)
  }
}
