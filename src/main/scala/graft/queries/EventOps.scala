package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Sql, Tables}

/** Event-stream analytics over the `events` table — the batch image of the
  * Structured Streaming surface (windowed aggregation, sessionization,
  * as-of alignment, JSON extraction). The same expressions run unchanged
  * under `readStream` with a watermark; see graft.streaming.
  *
  * Scale notes: sessionization and as-of are single-shuffle window plans
  * partitioned by user_id — no self-join, no driver loop. The quadratic
  * "join all earlier rows" formulation is only used by the DuckDB oracle.
  */
object EventOps {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Tumbling-window aggregation (hourly) per event type. */
  val q50EventHourly = Q(
    "q50_event_hourly",
    (s, dir) => {
      t(s, dir)("events")
        .withColumn("hour", date_format(col("ts"), "yyyy-MM-dd HH"))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n"),
          Sql.exactSum(col("value")).as("sum_value"))
    },
    Some("""
      SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2"""),
    headline = true)

  /** Gap-based sessionization: a new session starts after a >30 min gap.
    * lag + cumulative flag over a user-partitioned window.
    */
  val q51Sessionize = Q(
    "q51_sessionize",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir)("events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
    },
    Some("""
      WITH l AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS gap_us
        FROM events)
      SELECT user_id,
             CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM l GROUP BY 1"""))

  /** NATIVE session windows (Spark's `session_window` function — the
    * built-in gap-session operator, complementing q51's lag/cumsum form
    * and q83's stateful streaming form): start = first event, end =
    * last event + gap, merge while the next event lands strictly inside
    * the open window (gap >= 30 min ⇒ new session — note q51's flag is
    * strictly >, a deliberate semantic difference both oracles encode).
    * Emitted as unix micros; the oracle rebuilds the same islands with
    * lag + running sum.
    */
  val q106SessionWindow = Q(
    "q106_session_window",
    (s, dir) => {
      t(s, dir)("events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          Sql.exactSum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"), col("sum_value"))
    },
    Some("""
      WITH o AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         >= 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      g AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM o)
      SELECT user_id,
             min(epoch_us(ts)) AS start_us,
             max(epoch_us(ts)) + 30 * 60 * 1000000 AS end_us,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
      FROM g GROUP BY user_id, sid"""))

  /** JSON extraction from the string `props` column (S8 surface). */
  val q52JsonExtract = Q(
    "q52_json_extract",
    (s, dir) => {
      t(s, dir)("events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("k_bucket", col("k") % 10)
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
    },
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
             count(*) AS n,
             min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY 1"""))

  /** Conditional-aggregation pivot: per-user event-type counts (the
    * crosstab/year-mask-stack shape, SURVEY A9/R6).
    */
  val q53EventPivot = Q(
    "q53_event_pivot",
    (s, dir) => {
      def cnt(tpe: String) =
        sum(when(col("event_type") === tpe, 1L).otherwise(0L)).as(s"n_$tpe")
      t(s, dir)("events")
        .groupBy("user_id")
        .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"))
    },
    Some("""
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
      FROM events GROUP BY 1"""))

  /** As-of join (the J8 nearest-alignment family, in time): for each
    * purchase, the most recent click at-or-before it by the same user.
    * Spark-first: union + running max over one window — ONE shuffle on
    * user_id, linear work; never a range self-join.
    */
  val q54AsofJoin = Q(
    "q54_asof_join",
    (s, dir) => {
      val e = t(s, dir)("events").filter(col("event_type").isin("click", "purchase"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_click_us",
          max(when(col("event_type") === "click", unix_micros(col("ts")))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"), col("last_click_us"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      FROM events
      WHERE event_type IN ('click', 'purchase')
      QUALIFY event_type = 'purchase'"""))

  /** The generic as-of operator (operators.AsOfJoin.backward) through
    * the gate: purchases enriched with the latest at-or-before click per
    * user. Differs from q54's inline form only in tie policy (a click at
    * exactly the purchase timestamp is visible, by (ts, side) ordering),
    * which the oracle mirrors with an explicit side sort key.
    */
  val q71AsofOperator = Q(
    "q71_asof_operator",
    (s, dir) => {
      val e = t(s, dir)("events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("click_us"))
      graft.operators.AsOfJoin
        .backward(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_us"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("asof_click_us"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id
                     ORDER BY ts ASC,
                              (CASE WHEN event_type = 'click' THEN 0 ELSE 1 END) ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS asof_click_us
      FROM events
      WHERE event_type IN ('click', 'purchase')
      QUALIFY event_type = 'purchase'"""))

  /** The STREAMING sessionizer through the correctness gate: the whole
    * events table replays as a file-source micro-batch stream (one
    * time-range file per trigger, oldest first, so the event-time
    * watermark only ever advances), `sessionizeExpiring` emits closed
    * sessions as state expires (EventTimeTimeout), two far-future
    * sentinel events flush the final open sessions, and the closed
    * sessions re-aggregate to exactly q51's per-user (n_sessions,
    * n_events) shape. The oracle is q51's batch SQL verbatim — a hash
    * match proves the bounded-state streaming path computes the same
    * sessionization as the batch window plan, end-to-end through a real
    * micro-batch executor (the round-4 verdict's "oracle-check
    * streaming" gap).
    */
  val q83StreamSessionize = Q(
    "q83_stream_sessionize",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")), s"graft_stream_src_$h")
      FileReplay.stageEventReplay(sel, srcDir)
      FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_sessions_$h") { stream =>
          import s.implicits._
          EventStreams.sessionizeExpiring(stream.as[EventStreams.Event]).toDF()
        }
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    },
    Some("""
      WITH l AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS gap_us
        FROM events)
      SELECT user_id,
             CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM l GROUP BY 1"""))

  /** The STREAMING watermarked window aggregation through the gate: the
    * events table replays as a micro-batch stream (FileReplay), hourly
    * windows close and emit in Append mode as the watermark passes them,
    * and the closed windows must hash-match q50's batch SQL. `value`
    * casts to decimal BEFORE the streaming sum so the accumulation is
    * order-exact (the CLAUDE.md exactSum rule, applied inside the
    * stateful operator).
    */
  val q87StreamHourly = Q(
    "q87_stream_hourly",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_hr")
      FileReplay.stageEventReplay(sel, srcDir)
      FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_hourly_$h") { stream =>
          EventStreams.hourlyCounts(
            stream.withColumn("value", col("value").cast("decimal(27,4)")))
        }
        .filter(col("event_type") =!= "flush")
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value"))
    },
    Some("""
      SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** The STREAM-STREAM interval join through the gate: purchases and
    * clicks are two filtered branches of the same replayed micro-batch
    * stream, joined on user within a 60-minute event-time lag window
    * (watermarks on both sides bound the join state). Inner-join matches
    * emit as soon as both sides arrive, so the closed result set must
    * equal the batch interval join exactly — which the DuckDB oracle
    * computes directly. Timestamps surface as epoch micros (the
    * tz-mismatch rule).
    */
  val q88StreamAttribution = Q(
    "q88_stream_attribution",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_attr")
      FileReplay.stageEventReplay(sel, srcDir)
      FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_attr_$h") { stream =>
          EventStreams.clickAttribution(stream, maxLagMinutes = 60)
        }
        .select(col("event_id"), col("user_id"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          col("value"), unix_micros(col("click_ts")).as("click_us"))
    },
    Some("""
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us, p.value,
             epoch_us(c.ts) AS click_us
      FROM events p JOIN events c
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.ts >= p.ts - INTERVAL 60 MINUTE AND c.ts <= p.ts"""))

  /** STREAMING exact dedup through the gate: dropDuplicatesWithinWatermark
    * on (user_id, event_type, ts). Duplicate keys can only ever share a
    * timestamp, so every duplicate pair is inside the watermark horizon by
    * construction and the streaming result must equal batch DISTINCT —
    * which the oracle computes. Output re-aggregates to per-user distinct
    * (type, ts) counts so the result is small and order-free.
    */
  val q89StreamDedup = Q(
    "q89_stream_dedup",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_dd")
      FileReplay.stageEventReplay(sel, srcDir)
      FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_dedup_$h") { stream =>
          EventStreams.dedupWithinWatermark(
            stream, Seq("user_id", "event_type", "ts"))
        }
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_distinct_type_ts"))
    },
    Some("""
      SELECT user_id, count(*) AS n_distinct_type_ts
      FROM (SELECT DISTINCT user_id, event_type, ts FROM events)
      GROUP BY 1"""))

  /** STREAMING as-of enrichment through the gate: asofPurchases keeps one
    * last-click timestamp per user (mapGroupsWithState) across the
    * time-ordered micro-batches; because the replay never reorders event
    * time across batches, the running state reproduces exactly q54's
    * batch window (same (ts, event_id) tie policy). Same oracle as q54.
    */
  val q90StreamAsof = Q(
    "q90_stream_asof",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_asof")
      FileReplay.stageEventReplay(sel, srcDir)
      FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_asof_$h") { stream =>
          import s.implicits._
          EventStreams.asofPurchases(stream.as[EventStreams.Event]).toDF()
        }
        .filter(col("user_id") >= 0)
        .select(col("event_id"), col("user_id"),
          col("purchase_us"), col("last_click_us"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      FROM events
      WHERE event_type IN ('click', 'purchase')
      QUALIFY event_type = 'purchase'"""))

  /** The UPDATE-mode running-counts sessionizer through the gate
    * (EventStreams.sessionize — the FMGWS Update-output path q83's
    * Append-mode variant does not cover): every micro-batch emits the
    * user's running (n_sessions, batch_events); with the idle-expiry
    * horizon set beyond the replayed range, no state restarts, so
    * max(n_sessions) is the final session count and sum(n_events)
    * re-totals every event — together exactly q51's batch answer.
    */
  val q99StreamRunning = Q(
    "q99_stream_running",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_run")
      FileReplay.stageEventReplay(sel, srcDir)
      FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_running_$h",
          org.apache.spark.sql.streaming.OutputMode.Update()) { stream =>
          import s.implicits._
          // idle expiry far past the replayed range (incl. sentinels):
          // running counts must never restart mid-replay
          EventStreams.sessionize(stream.as[EventStreams.Event],
            idleExpireMinutes = 400L * 24 * 60).toDF()
        }
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(max("n_sessions").as("n_sessions"),
          sum("n_events").as("n_events"))
    },
    Some("""
      WITH l AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS gap_us
        FROM events)
      SELECT user_id,
             CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM l GROUP BY 1"""))

  /** Ordered conversion FUNNEL (view → click → purchase, strictly
    * increasing event times per user) — the one classic event-analytics
    * shape the surface lacked. Each stage is a small keyed aggregate
    * joined forward (first view, first click AFTER it, first purchase
    * after that); no window over the full event stream, no self-join of
    * events against events — per-stage filters cut the input before any
    * shuffle, so stage cost tracks stage cardinality, not corpus size.
    */
  val q119Funnel = Q(
    "q119_funnel",
    (s, dir) => {
      val e = t(s, dir)("events")
      def firstAfter(stage: String, prev: DataFrame, prevTs: String,
          outTs: String): DataFrame =
        e.filter(col("event_type") === stage)
          .select(col("user_id"), col("ts"))
          .join(prev.select(col("user_id"), col(prevTs)), "user_id")
          .filter(col("ts") > col(prevTs))
          .groupBy("user_id").agg(min("ts").as(outTs))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = firstAfter("click", v, "t_view", "t_click")
      val p = firstAfter("purchase", c, "t_click", "t_purchase")
      // global agg, NOT groupBy(lit): an empty stage must still emit a
      // count-0 row to match the oracle's unconditional SELECT count(*)
      // (groupBy over zero rows emits zero rows — latent gate divergence
      // on any fixture where a funnel stage has no users)
      def stageCount(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
      stageCount("1_view", v)
        .unionByName(stageCount("2_click", c))
        .unionByName(stageCount("3_purchase", p))
    },
    Some("""
      WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1),
      c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
      SELECT '1_view' AS stage, count(*) AS n_users FROM v
      UNION ALL SELECT '2_click', count(*) FROM c
      UNION ALL SELECT '3_purchase', count(*) FROM p"""))

  /** GLOBAL cumulative metric in event-time order — the "running total
    * of the whole stream" analytics shape. Spark's `Window.orderBy`
    * without a partition key funnels every row through ONE task; this
    * runs on operators/PrefixSum (range-partition + per-partition
    * partials + offsets), P-way parallel with the identical result —
    * the oracle IS the single-reducer window, so the hash match proves
    * the equivalence on real data. Order key (ts, event_id) is unique,
    * making the running sum well-defined. Values are cast to cents
    * (exact: synthetic event values are 2-decimal) so the running sum
    * is integer arithmetic in both engines.
    */
  val q125RunningTotal = Q(
    "q125_running_total",
    (s, dir) => {
      val e = t(s, dir)("events").select(
        col("event_id").cast("long").as("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.operators.PrefixSum.runningSum(
          e, Seq(col("ts"), col("event_id")), col("cents"), "running_cents")
        .select(col("event_id"), col("cents"), col("running_cents"))
    },
    Some("""
      SELECT event_id, cents,
             CAST(sum(cents) OVER (ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS running_cents
      FROM (SELECT event_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events)"""))

  /** SLIDING-window aggregation: overlapping 1-hour windows every
    * 15 minutes (peak-traffic shape). Spark assigns each event to
    * window/slide = 4 epoch-aligned windows; the oracle reproduces the
    * assignment with a floor-divide on epoch micros and a k ∈ 0..3
    * fan-out. Surfaced as epoch micros (the tz-mismatch rule).
    *
    * Scale: the explode is a constant ×4 before the partial agg, so the
    * shuffle carries (#windows × #types) aggregated rows, not ×4 events.
    */
  val q134SlidingWindow = Q(
    "q134_sliding_window",
    (s, dir) => {
      t(s, dir)("events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Sql.exactSum(col("value")).as("sum_value"))
        .select(unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("event_type"), col("n"), col("sum_value"))
    },
    Some("""
      WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
      w AS (
        SELECT (us // 900000000) * 900000000 - k * 900000000 AS start_us,
               event_type, value
        FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k))
      SELECT CAST(start_us AS BIGINT) AS start_us,
             CAST(start_us + 3600000000 AS BIGINT) AS end_us,
             event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
      FROM w GROUP BY 1, 2, 3"""))

  /** The sliding-window aggregation THROUGH the streaming gate
    * (EventStreams.slidingCounts + FileReplay): append-mode overlapping
    * windows under a watermark must close to exactly the batch q134
    * result — same oracle SQL.
    */
  val q135StreamSliding = Q(
    "q135_stream_sliding",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_slide")
      FileReplay.stageEventReplay(sel, srcDir)
      FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_sliding_$h") { stream =>
          EventStreams.slidingCounts(
            stream.withColumn("value", col("value").cast("decimal(27,4)")))
        }
        .filter(col("event_type") =!= "flush")
        .select(unix_micros(col("win_start")).as("start_us"),
          unix_micros(col("win_end")).as("end_us"),
          col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value"))
    },
    Some("""
      WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
      w AS (
        SELECT (us // 900000000) * 900000000 - k * 900000000 AS start_us,
               event_type, value
        FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k))
      SELECT CAST(start_us AS BIGINT) AS start_us,
             CAST(start_us + 3600000000 AS BIGINT) AS end_us,
             event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
      FROM w GROUP BY 1, 2, 3"""))

  /** LEFT-OUTER stream-stream interval join through the gate: q88's
    * attribution plus a null-extended row for every purchase with no
    * click in its 60-minute window. The outer-specific state machine —
    * unmatched rows may only emit once the click watermark passes their
    * window, and the sentinel batch flushes the last of them — must
    * close to exactly the batch LEFT JOIN. Null click time surfaces as
    * -1 in both engines (a nullable int column would round-trip through
    * pandas as float and break the dtype-exact compare).
    */
  val q139StreamOuterJoin = Q(
    "q139_stream_outer_join",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_oattr")
      // two sentinel batches: the first advances the watermark, the
      // second's state cleanup emits the null-extended tail (outer-join
      // null rows come from a LATER batch than the watermark advance,
      // unlike aggregation flush)
      FileReplay.stageEventReplay(sel, srcDir)
      FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_oattr_$h") { stream =>
          EventStreams.clickAttributionOuter(stream, maxLagMinutes = 60)
        }
        // sentinel rows filter HERE, in the closed batch result — see
        // clickAttributionOuter's scaladoc for why not inside the stream
        .filter(col("event_id") >= 0)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          col("value"),
          coalesce(unix_micros(col("click_ts")), lit(-1L)).as("click_us"))
    },
    Some("""
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us, p.value,
             coalesce(epoch_us(c.ts), -1) AS click_us
      FROM events p LEFT JOIN events c
        ON p.user_id = c.user_id
       AND c.event_type = 'click'
       AND c.ts >= p.ts - INTERVAL 60 MINUTE AND c.ts <= p.ts
      WHERE p.event_type = 'purchase'"""))

  /** STREAMING heavy hitters — the trending-keys job event platforms
    * run continuously, as the lambda shape: phase 1 streams the replay
    * through a Complete-mode global aggregate of the Misra–Gries
    * Aggregator (bounded ≤128-entry state, partials merged map-side per
    * micro-batch — the one new thing vs q136 is the sketch surviving
    * ACROSS micro-batch state updates), phase 2 exact-counts only rows
    * joining the broadcast candidate set. The superset property is
    * merge-tree-independent (FrequentItemsSpec), so the final output is
    * deterministic and equals the oracle's plain GROUP BY ... HAVING.
    * The stream key is derived with realistic skew (a third of events
    * fold onto 8 hot keys); sentinels are filtered before the sketch.
    */
  val q148StreamHeavyHitters = Q(
    "q148_stream_heavy_hitters",
    (s, dir) => {
      import graft.streaming.FileReplay
      def keyOf(c: org.apache.spark.sql.Column) =
        when(c % 3 === 0, concat(lit("h"), pmod(c, lit(8))))
          .otherwise(concat(lit("u"), c))
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_hh")
      FileReplay.stageEventReplay(sel, srcDir)
      val cand = FileReplay.runToTable(s, srcDir, sel.schema,
          s"graft_stream_hh_$h",
          org.apache.spark.sql.streaming.OutputMode.Complete()) { stream =>
          stream.filter(col("event_type") =!= "flush")
            .select(keyOf(col("user_id")).as("k"))
            .agg(graft.functions.FrequentItems(128)(col("k")).as("cand"))
        }
        .select(explode(col("cand")).as("k"))
      val keyed = sel.select(keyOf(col("user_id")).as("k"))
      val n = keyed.agg(count(lit(1)).as("n"))
      keyed.join(broadcast(cand), "k")
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .filter(col("cnt") * 100 > col("n"))
        .select(col("k"), col("cnt"))
    },
    Some("""
      WITH keyed AS (
        SELECT CASE WHEN user_id % 3 = 0 THEN 'h' || CAST(user_id % 8 AS VARCHAR)
                    ELSE 'u' || CAST(user_id AS VARCHAR) END AS k
        FROM events)
      SELECT k, CAST(count(*) AS BIGINT) AS cnt
      FROM keyed GROUP BY 1
      HAVING count(*) * 100 > (SELECT count(*) FROM keyed)"""))

  /** Robust per-key outlier detection: median + MAD (median absolute
    * deviation), the standard spike detector for metric streams — robust
    * where mean/stddev z-scores are dragged by the outliers themselves.
    * Both medians are LOWER-median ORDER STATISTICS (rank (n+1) div 2 in
    * a per-key sort), never interpolated: the selected value is a datum,
    * so med/MAD are bit-identical cross-engine and the 3×MAD flag
    * comparison (one IEEE multiply both sides) cannot straddle an ulp.
    * Scale shape: two per-key sorts (the irreducible cost of an exact
    * median; q118's approx quantiles are the skew-robust 100 TB path)
    * plus BROADCAST med/mad joins — the per-key tables are one row per
    * key, so the events scan never reshuffles for the flagging pass.
    */
  val q167MadOutliers = Q(
    "q167_mad_outliers",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir)("events")
        .select(col("event_type"), col("event_id"), col("value"))
      val cnt = e.groupBy("event_type").agg(count(lit(1)).as("n"))
      // NULLS LAST to match DuckDB's ORDER BY default (Spark defaults to
      // NULLS FIRST — a NULL value would shift the rank-(n+1)/2 row)
      val byV = Window.partitionBy("event_type")
        .orderBy(col("value").asc_nulls_last, col("event_id"))
      val med = e.withColumn("rn", row_number().over(byV))
        .join(broadcast(cnt), "event_type")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("value").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("dv", abs(col("value") - col("med")))
      val byD = Window.partitionBy("event_type")
        .orderBy(col("dv").asc_nulls_last, col("event_id"))
      val mad = dev.withColumn("rn", row_number().over(byD))
        .join(broadcast(cnt), "event_type")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("dv").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(max("med").as("med"), max("mad").as("mad"),
          count(when(col("dv") > lit(3.0) * col("mad"), 1)).as("n_outliers"),
          max("dv").as("max_dev"))
    },
    Some("""
      WITH e AS (SELECT event_type, event_id, value FROM events),
      cnt AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1),
      r1 AS (
        SELECT e.*, row_number() OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS rn
        FROM e),
      med AS (
        SELECT r1.event_type, r1.value AS med
        FROM r1 JOIN cnt USING (event_type) WHERE rn = (n + 1) // 2),
      dev AS (
        SELECT e.event_type, e.event_id, m.med,
               abs(e.value - m.med) AS dv
        FROM e JOIN med m USING (event_type)),
      r2 AS (
        SELECT dev.*, row_number() OVER (PARTITION BY event_type
                                         ORDER BY dv, event_id) AS rn
        FROM dev),
      mad AS (
        SELECT r2.event_type, r2.dv AS mad
        FROM r2 JOIN cnt USING (event_type) WHERE rn = (n + 1) // 2)
      SELECT d.event_type, max(d.med) AS med, max(m2.mad) AS mad,
             CAST(count(CASE WHEN d.dv > 3 * m2.mad THEN 1 END) AS BIGINT)
               AS n_outliers,
             max(d.dv) AS max_dev
      FROM dev d JOIN mad m2 USING (event_type)
      GROUP BY d.event_type"""))

  /** The Spark-4 arbitrary-state operator `transformWithState` through
    * the replay gate — composite per-user state (MapState event_type →
    * count + ValueState total, EventStreams.TypeCountProcessor) under
    * the RocksDB provider (the only one implementing the composite
    * state layout; conf is set for the stream and restored after).
    * Counts only grow and each emission strictly increases n_events, so
    * the batch max/max_by over the per-micro-batch snapshots equals the
    * plain GROUP BY oracle — the same closure argument as q148's
    * Complete-mode sketch. Completes the streaming state-class
    * coverage: *GroupsWithState (q83/q90), dropDuplicates (q89),
    * session/sliding windows (q106/q135), stream-stream joins
    * (q88/q139), and now the StatefulProcessor API.
    */
  val q172StreamTransformState = Q(
    "q172_stream_transform_state",
    (s, dir) => {
      import graft.streaming.{EventStreams, FileReplay}
      val sel = t(s, dir)("events").select(
        col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      val h = Integer.toHexString(dir.hashCode)
      val srcDir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir")),
        s"graft_stream_src_${h}_tws")
      FileReplay.stageEventReplay(sel, srcDir)
      val prev = s.conf.getOption(EventStreams.ProviderClassConf)
      s.conf.set(EventStreams.ProviderClassConf, EventStreams.RocksDbProvider)
      try {
        FileReplay.runToTable(s, srcDir, sel.schema, s"graft_stream_tws_$h") {
          stream =>
            import s.implicits._
            EventStreams.typeCountsWithState(
              stream.as[EventStreams.Event]).toDF()
        }
          .filter(col("user_id") >= 0)
          .groupBy("user_id")
          .agg(max("n_events").as("n_events"),
            max_by(col("n_distinct_types"), col("n_events"))
              .as("n_distinct_types"))
      } finally {
        prev match {
          case Some(v) => s.conf.set(EventStreams.ProviderClassConf, v)
          case None => s.conf.unset(EventStreams.ProviderClassConf)
        }
      }
    },
    Some("""
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct_types
      FROM events GROUP BY 1"""))

  /** Retention cohort analysis — the standard product-analytics matrix:
    * users grouped by the WEEK of their first event, counted as active
    * at each whole-week offset since. Dates stay DATE (never tz-adjusted
    * timestamps, per the repo invariant); the offset is an exact integer
    * day difference div 7. Scale shape: one per-user min-ts aggregate,
    * a broadcast-joinable (user → cohort) table only if users are few —
    * here it re-joins on user_id (one hash shuffle), then one
    * distinct+count per (cohort, offset); no windows, no self-joins.
    */
  val q177RetentionCohorts = Q(
    "q177_retention_cohorts",
    (s, dir) => {
      val e = t(s, dir)("events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val firstd = e.groupBy("user_id")
        .agg(min("d").as("first_d"))
        .select(col("user_id"),
          to_date(date_trunc("week", col("first_d"))).as("cohort_week"))
      e.join(firstd, "user_id")
        .select(col("user_id"), col("cohort_week"),
          expr("datediff(d, cohort_week) div 7").cast("int")
            .as("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      firstd AS (
        SELECT user_id,
               CAST(date_trunc('week', min(d)) AS DATE) AS cohort_week
        FROM e GROUP BY 1),
      act AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week, e.d) // 7 AS INTEGER)
                 AS week_offset
        FROM e JOIN firstd f USING (user_id))
      SELECT cohort_week, week_offset, count(*) AS n_users
      FROM act GROUP BY 1, 2"""))

  /** FORWARD as-of: each click's NEXT purchase at-or-after it by the
    * same user (the mirror of q54's backward at-or-before), plus a
    * 30-minute-tolerance conversion flag — the attribution primitive
    * where the enrichment looks ahead instead of back. Same
    * Spark-first shape: ONE user-partitioned window on the reversed
    * (ts, event_id) order with a running min — linear work, one
    * shuffle, never a range self-join.
    */
  val q178AsofForward = Q(
    "q178_asof_forward",
    (s, dir) => {
      val e = t(s, dir)("events")
        .filter(col("event_type").isin("click", "purchase"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("next_purchase_us",
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).over(w))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("click_us"), col("next_purchase_us"),
          when(col("next_purchase_us").isNotNull &&
            col("next_purchase_us") - unix_micros(col("ts"))
              <= 30L * 60 * 1000000, 1).otherwise(0).as("converted_30m"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS click_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS next_purchase_us,
             CASE WHEN min(CASE WHEN event_type = 'purchase'
                                THEN epoch_us(ts) END)
                    OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - epoch_us(ts) <= 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS converted_30m
      FROM events
      WHERE event_type IN ('click', 'purchase')
      QUALIFY event_type = 'click'"""))

  /** Mann–Kendall trend detection per event type — the robust
    * (rank-based, outlier-immune) monotone-trend test over the daily
    * count series: S = Σ_{i<j} sign(n_j − n_i), an EXACT integer.
    * Scale shape: the pair enumeration runs over the tiny
    * (type × day) AGGREGATE — aggregate-then-pair, never event×event —
    * so the quadratic is bounded by the series length (30 days) at any
    * corpus size.
    */
  val q179MannKendall = Q(
    "q179_mann_kendall",
    (s, dir) => {
      val daily = t(s, dir)("events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val d1 = daily.select(col("event_type"), col("d").as("d1"),
        col("n").as("n1"))
      val d2 = daily.select(col("event_type"), col("d").as("d2"),
        col("n").as("n2"))
      d1.join(d2, Seq("event_type")).filter(col("d1") < col("d2"))
        .select(col("event_type"),
          signum(col("n2") - col("n1")).cast("long").as("sg"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"), sum("sg").as("s_stat"))
        .select(col("event_type"), col("n_pairs"), col("s_stat"),
          when(col("s_stat") > 0, "increasing")
            .when(col("s_stat") < 0, "decreasing")
            .otherwise("flat").as("trend"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY 1, 2),
      pairs AS (
        SELECT a.event_type,
               CAST(sign(b.n - a.n) AS BIGINT) AS sg
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d)
      SELECT event_type, count(*) AS n_pairs,
             CAST(sum(sg) AS BIGINT) AS s_stat,
             CASE WHEN CAST(sum(sg) AS BIGINT) > 0 THEN 'increasing'
                  WHEN CAST(sum(sg) AS BIGINT) < 0 THEN 'decreasing'
                  ELSE 'flat' END AS trend
      FROM pairs GROUP BY 1"""))

  /** A/B experiment readout with Welch's t² — users hash-assigned to
    * variants (the q85 split applied to experimentation), per-variant
    * mean and variance from ORDER-INDEPENDENT decimal sums (Σv, Σv² via
    * exactSum), then the t² statistic as a short chain of identical
    * IEEE ops on those exact sums — deterministic cross-engine without
    * any rounding mask. The corpus reduces to one conditional-aggregate
    * row; every variance formula input is a decimal sum, so executor
    * count and summation order cannot move the statistic.
    */
  val q180AbTtest = Q(
    "q180_ab_ttest",
    (s, dir) => {
      val e = t(s, dir)("events").withColumn("variant",
        pmod(graft.operators.Dedup.md5Hash64(
          concat(lit("v_"), col("user_id").cast("string"))), lit(2L)))
      def side(v: Int, c: Column) = when(col("variant") === v, c)
      val agg = e.agg(
        count(side(0, lit(1))).as("n_a"),
        count(side(1, lit(1))).as("n_b"),
        Sql.exactSum(side(0, col("value"))).as("s_a"),
        Sql.exactSum(side(1, col("value"))).as("s_b"),
        Sql.exactSum(side(0, col("value") * col("value"))).as("q_a"),
        Sql.exactSum(side(1, col("value") * col("value"))).as("q_b"))
      agg.select(col("n_a"), col("n_b"),
        (col("s_a") / col("n_a")).as("mean_a"),
        (col("s_b") / col("n_b")).as("mean_b"),
        (((col("s_a") / col("n_a")) - (col("s_b") / col("n_b"))) *
          ((col("s_a") / col("n_a")) - (col("s_b") / col("n_b"))) /
          ((col("q_a") - col("s_a") * col("s_a") / col("n_a")) /
            (col("n_a") - 1) / col("n_a") +
            (col("q_b") - col("s_b") * col("s_b") / col("n_b")) /
              (col("n_b") - 1) / col("n_b"))).as("t2"))
    },
    Some("""
      WITH v AS (
        SELECT value,
               CAST('0x' || substr(md5('v_' || user_id), 18, 15) AS BIGINT)
                 % 2 AS variant
        FROM events),
      agg AS (
        SELECT
          count(CASE WHEN variant = 0 THEN 1 END) AS n_a,
          count(CASE WHEN variant = 1 THEN 1 END) AS n_b,
          CAST(sum(CASE WHEN variant = 0
                        THEN CAST(value AS DECIMAL(27,4)) END) AS DOUBLE) AS s_a,
          CAST(sum(CASE WHEN variant = 1
                        THEN CAST(value AS DECIMAL(27,4)) END) AS DOUBLE) AS s_b,
          CAST(sum(CASE WHEN variant = 0
                        THEN CAST(value * value AS DECIMAL(27,4)) END)
               AS DOUBLE) AS q_a,
          CAST(sum(CASE WHEN variant = 1
                        THEN CAST(value * value AS DECIMAL(27,4)) END)
               AS DOUBLE) AS q_b
        FROM v)
      SELECT n_a, n_b,
             s_a / n_a AS mean_a,
             s_b / n_b AS mean_b,
             ((s_a / n_a) - (s_b / n_b)) * ((s_a / n_a) - (s_b / n_b)) /
               ((q_a - s_a * s_a / n_a) / (n_a - 1) / n_a +
                (q_b - s_b * s_b / n_b) / (n_b - 1) / n_b) AS t2
      FROM agg"""))

  val qs: Seq[Q] = Seq(q50EventHourly, q51Sessionize, q52JsonExtract,
    q53EventPivot, q54AsofJoin, q71AsofOperator, q83StreamSessionize,
    q87StreamHourly, q88StreamAttribution, q89StreamDedup, q90StreamAsof,
    q99StreamRunning, q106SessionWindow, q119Funnel, q125RunningTotal,
    q134SlidingWindow, q135StreamSliding, q139StreamOuterJoin,
    q148StreamHeavyHitters, q167MadOutliers, q172StreamTransformState,
    q177RetentionCohorts, q178AsofForward, q179MannKendall, q180AbTtest)
}
