package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-scoped cache/temp-view registry. A handful of queries (q162's
  * eval-gram table, its bloom temp view) must cache a frame that is
  * consumed lazily by the RETURNED plan — so they cannot unpersist before
  * the caller executes. Left alone, repeated invocations in one JVM
  * (Verify full runs, spec suites, long-lived sessions) accumulate cached
  * tables and temp views (the r16 advice item). Registering here makes the
  * lifecycle explicit:
  *
  *  - `put(key, df, views)` releases any PREVIOUS entry under the same key
  *    (so re-invoking the same query against the same dir is idempotent,
  *    never stacking a second cached copy), then records the new one;
  *  - `releaseAll()` is called by Verify after each query's dump completes
  *    (queries run sequentially, and a dump is a full materialization, so
  *    nothing downstream still needs the cache) and by specs in teardown.
  *
  * Bench deliberately does NOT release between passes: its 3-pass protocol
  * times cache-warm behavior on purpose, and the process exits afterwards.
  */
object ScopedCache {

  private case class Entry(df: DataFrame, views: Seq[String])

  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[String, Entry]

  /** Register `df` (already `.cache()`d by the caller) and any temp views
    * created alongside it, releasing whatever was previously registered
    * under `key`. Returns `df` for chaining.
    */
  def put(key: String, df: DataFrame, views: Seq[String] = Nil): DataFrame =
    synchronized {
      // the previous entry's cache always releases, but a view the NEW
      // entry re-declares must NOT be dropped: queries name views
      // deterministically (keyed by the sf dir), so a re-invocation has
      // just createOrReplace'd the SAME name — dropping it here would
      // break the new frame's analysis (caught by PlanHashSpec's
      // build-twice stability test)
      entries.remove(key).foreach { prev =>
        // cache entries are keyed by PLAN EQUALITY in Spark's cache
        // manager: when the re-invocation built the same plan (same
        // query, same dir), unpersisting the previous frame would evict
        // the entry the NEW frame just cached/reuses — keep it warm
        // instead (caught by PlanHashSpec's build-twice test: build 2's
        // hash rendered the raw subtree after its own cache vanished)
        val samePlan =
          try prev.df.queryExecution.analyzed
            .sameResult(df.queryExecution.analyzed)
          catch { case scala.util.control.NonFatal(_) => false }
        if (!samePlan) {
          try prev.df.unpersist(false)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        val keep = views.toSet
        val session = SparkSession.getActiveSession
        prev.views.filterNot(keep).foreach { v =>
          try session.foreach(_.catalog.dropTempView(v))
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
      entries(key) = Entry(df, views)
      df
    }

  /** Unpersist + drop views for one key (no-op when absent). */
  def release(key: String): Unit = synchronized {
    entries.remove(key).foreach(free)
  }

  /** Release every registered entry (Verify per-query teardown). */
  def releaseAll(): Unit = synchronized {
    entries.values.foreach(free)
    entries.clear()
  }

  private def free(e: Entry): Unit = {
    // blocking=false: teardown must never stall a verify run on executor
    // block removal
    try e.df.unpersist(false)
    catch { case scala.util.control.NonFatal(_) => () }
    val session = SparkSession.getActiveSession
    e.views.foreach { v =>
      try session.foreach(_.catalog.dropTempView(v))
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
