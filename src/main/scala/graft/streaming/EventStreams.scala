package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the same event analytics as
  * graft.queries.EventOps, expressed over an unbounded source. Not present
  * in the reference (its jobs are batch cron, jobs.py:24-29) — this is the
  * engine extension for continuous ingestion (SURVEY §1.3, §7.6).
  *
  * The batch expressions carry over unchanged; what streaming adds is
  * watermark-bounded state: windowed aggregation state is dropped once
  * the watermark passes, and sessionization keeps one small state object
  * per active user key. Both scale horizontally with
  * `spark.sql.shuffle.partitions` state stores.
  */
object EventStreams {

  /** 100 TB state-store posture: the default HDFS-backed provider keeps
    * every key's state on the executor HEAP (bounded only by the
    * watermark), which is the scale-killer once keyed session state
    * outgrows memory. RocksDB spills state to local disk with the same
    * exactly-once semantics; it is a per-query config read at stream
    * start, so callers opt in via `s.conf.set(ProviderClassConf,
    * RocksDbProvider)` before `writeStream.start()`. Gate parity under
    * RocksDB (q83/q87–q90/q99 ≡ batch) is pinned by
    * RocksDbStateStoreSpec.
    */
  val ProviderClassConf = "spark.sql.streaming.stateStore.providerClass"
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Full-microsecond epoch of a Timestamp. `getTime` alone is MILLIS —
    * using it truncates the sub-milli digits the batch plans keep
    * (unix_micros), which both misorders same-milli events and shifts
    * emitted epochs; q90's oracle caught exactly that.
    */
  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  case class SessionState(sessionCount: Long, lastEventUs: Long)

  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Tumbling hourly counts per event type with a 1-hour watermark
    * (streaming image of q50_event_hourly).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** SLIDING-window counts per event type (streaming image of
    * q134_sliding_window): overlapping 1-hour windows every 15 minutes,
    * so each event lands in window/slide = 4 epoch-aligned windows.
    * Append mode + the 1-hour watermark bound state at
    * (windows-per-slide × open-slides × types) — constant in stream
    * length; final windows flush on the far-future sentinel batch.
    */
  def slidingCounts(
      events: DataFrame,
      winDur: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), winDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessionization (streaming image of q51_sessionize) via
    * per-user state: a new session opens after a >30 min gap. Emits the
    * running per-user session/event counts on every update.
    *
    * State is BOUNDED: a user idle past `idleExpireMinutes` of event time
    * has their state dropped (EventTimeTimeout) — if they return later,
    * their running counts restart from zero. The earlier unbounded
    * variant (one state entry per user, forever) was a state leak at
    * 100 TB-scale traffic and is gone; callers that need closed-session
    * rows instead of running counts use `sessionizeExpiring`.
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Long = 30,
      watermarkDelay: String = "10 seconds",
      idleExpireMinutes: Long = 24 * 60): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
            sorted.foreach { e =>
              val us = micros(e.ts)
              val newSession = st.lastEventUs == Long.MinValue || us - st.lastEventUs > gapUs
              st = SessionState(st.sessionCount + (if (newSession) 1L else 0L), us)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastEventUs / 1000L + idleExpireMinutes * 60L * 1000L)
            Iterator.single(UserSessions(userId, st.sessionCount, sorted.size.toLong))
          }
      }
  }

  case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long)
  case class SessionClosed(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Sessionization with BOUNDED state: closed sessions are emitted and
    * their state removed when the event-time watermark passes the session
    * gap (GroupStateTimeout.EventTimeTimeout). This is the form that
    * survives unbounded streams — the simple `sessionize` keeps one state
    * entry per user forever, which at 100 TB-scale traffic is a state
    * leak.
    */
  def sessionizeExpiring(
      events: Dataset[Event],
      gapMinutes: Long = 30,
      watermarkDelay: String = "10 seconds"): Dataset[SessionClosed] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionClosed](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionClosed(userId, s.startUs, s.lastUs, s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionClosed]
            var open = state.getOption
            sorted.foreach { e =>
              val us = micros(e.ts)
              open match {
                case Some(s) if us - s.lastUs <= gapMs * 1000L =>
                  open = Some(OpenSession(s.startUs, us, s.nEvents + 1))
                case Some(s) =>
                  closed += SessionClosed(userId, s.startUs, s.lastUs, s.nEvents)
                  open = Some(OpenSession(us, us, 1L))
                case None =>
                  open = Some(OpenSession(us, us, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Streaming exact dedup with BOUNDED state (streaming image of q34):
    * duplicate keys arriving within the watermark horizon are dropped, and
    * per-key state expires once the watermark passes it — state size is
    * bounded by the horizon's key cardinality, not the stream's lifetime.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join: each purchase paired with the same
    * user's clicks from the preceding `maxLagMinutes`. The watermark on
    * BOTH sides plus the event-time range condition lets Spark drop
    * buffered rows once they can no longer match — bounded join state on
    * an unbounded stream.
    */
  def clickAttribution(events: DataFrame, maxLagMinutes: Int = 60): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", s"$maxLagMinutes minutes")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", s"$maxLagMinutes minutes")
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $maxLagMinutes MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("event_id"), col("user_id"), col("purchase_ts"),
        col("value"), col("click_ts"))
  }

  /** LEFT-OUTER stream-stream interval join: q88's attribution, plus a
    * null-extended row for every purchase with NO click in the window —
    * the distinct stateful behavior the outer join adds is that an
    * unmatched left row can only emit once the click-side WATERMARK has
    * passed its join window (until then a match could still arrive).
    * The far-future sentinel batch in the FileReplay gate is what
    * flushes the final unmatched rows, so the closed result equals the
    * batch LEFT JOIN exactly (q139). Null click_ts surfaces as -1
    * downstream — both engines, keeping the column BIGINT-non-null (a
    * nullable int column round-trips through pandas as float and breaks
    * the dtype-exact compare).
    *
    * CRITICAL: the 'flush' sentinels must pass BOTH side filters. The
    * inner join (q88) emits on match and never needs the final flush, so
    * filtering them out is harmless there — but the outer join's
    * null-emission is driven by the watermark, and the event-time stats
    * are collected at the EventTimeWatermarkExec from the rows that
    * actually reach it. Catalyst pushes a deterministic event_type
    * filter BELOW the watermark operator, so writing withWatermark
    * before the filter does not help: either way the sentinels are
    * dropped before the stats collector, the watermark never passes the
    * last real rows, and the tail of unmatched purchases never emits no
    * matter how many sentinel batches run. Letting event_type='flush'
    * through makes the sentinels genuine data in both streams; each
    * sentinel pair self-joins at lag 0 under its unique negative
    * user_id; the CALLER must drop event_id < 0 rows AFTER the stream
    * closes (in the batch result) — a filter inside this plan would be
    * pushed below the purchase-side EventTimeWatermark and kill the
    * sentinels there again (global watermark = min over BOTH watermark
    * operators).
    */
  def clickAttributionOuter(
      events: DataFrame, maxLagMinutes: Int = 60): DataFrame = {
    val clicks = events
      .filter(col("event_type").isin("click", "flush"))
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", s"$maxLagMinutes minutes")
    val purchases = events
      .filter(col("event_type").isin("purchase", "flush"))
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", s"$maxLagMinutes minutes")
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $maxLagMinutes MINUTES") &&
        col("click_ts") <= col("purchase_ts"),
      "leftOuter")
      .select(col("event_id"), col("user_id"), col("purchase_ts"),
        col("value"), col("click_ts"))
  }

  /** Streaming as-of enrichment (image of q54_asof_join): for each
    * purchase, the most recent prior click per user, via mapGroupsWithState
    * keeping only the last click timestamp per user.
    */
  case class LastClick(us: Long)
  case class PurchaseWithClick(event_id: Long, user_id: Long,
      purchase_us: Long, last_click_us: Option[Long])

  def asofPurchases(events: Dataset[Event]): Dataset[PurchaseWithClick] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastClick, PurchaseWithClick](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[LastClick]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[PurchaseWithClick]
          var last = state.getOption
          sorted.foreach { e =>
            val us = micros(e.ts)
            if (e.event_type == "click") last = Some(LastClick(us))
            else out += PurchaseWithClick(e.event_id, userId, us, last.map(_.us))
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  case class TypeCounts(user_id: Long, n_events: Long, n_distinct_types: Long)

  /** Per-user running totals via the arbitrary-state operator
    * `transformWithState` (the Spark-4 replacement for the
    * *GroupsWithState family): composite state = a MapState
    * (event_type → count, point-updatable without rewriting the whole
    * value — the reason the API exists) plus a ValueState total. Emits
    * the updated snapshot each micro-batch; counts only grow, so the
    * per-user row with the largest n_events IS the final answer, and a
    * batch `max/max_by` closes the stream to the plain GROUP BY oracle.
    * Requires the RocksDB state store provider (the only provider that
    * implements the new composite state layout).
    */
  class TypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, TypeCounts] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode, ValueState}
    @transient private var counts: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("total",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TypeCounts] = {
      var t = if (total.exists()) total.get() else 0L
      rows.foreach { e =>
        t += 1
        val c = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, c + 1)
      }
      total.update(t)
      Iterator.single(TypeCounts(key, t, counts.keys().size.toLong))
    }
  }

  /** Stream shape for q172: group by user, run the composite-state
    * processor, one snapshot row per (user, micro-batch).
    */
  def typeCountsWithState(events: Dataset[Event]): Dataset[TypeCounts] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }
}
