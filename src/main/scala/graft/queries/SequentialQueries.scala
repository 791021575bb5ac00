package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.aggregate.FileAggregates
import graft.config.SuiteLoader
import graft.ext.{Bpe, Dedup, Events, LanguageModel, Multimodal, Packing, Retrieval, Sampling, Similarity, Stats, TextAnalysis}
import graft.ingest.{Metadata, Readers}
import graft.pipeline.{OdeSchema, Routing, ValidationPipeline}
import graft.plans.AsOf
import graft.rules.RuleCompiler
import graft.sequential.SequentialChecks
/** Sequential checks at scale over `events`. Split out of the monolithic registry
  * (r9 verdict item 5); every member keeps resolving
  * unqualified through the `Queries.type` self-type. */
private[graft] trait SequentialQueries { this: Queries.type =>
  // =====================================================================
  // Sequential checks at scale over `events` (independent SQL oracle)
  // =====================================================================

  /** W1-W6 over a synthesized per-file serial stream with gaps. */
  /** §2.8 widening: event-time tumbling windows per type — the batch run
   *  of the SAME code the watermarked stream executes (equality asserted
   *  in EventAnalyticsSpec); window bounds rendered as strings for a
   *  stable cross-engine hash. */
  private[graft] def windowedAgg(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.windowedCounts(
      events(s, dir), windowMinutes = 60)
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("window_end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  private[graft] val windowedAggOracle =
    """SELECT
      |  strftime(time_bucket(INTERVAL 60 MINUTES, CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  strftime(time_bucket(INTERVAL 60 MINUTES, CAST(ts AS TIMESTAMP)) + INTERVAL 60 MINUTES, '%Y-%m-%d %H:%M:%S') AS window_end,
      |  event_type, count(*) AS n_events, sum(value) AS total_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** §2.8 widening: exact streaming dedup — batch face of
   *  `dropDuplicatesWithinWatermark` on (user, type, day); streaming
   *  equality asserted in EventAnalyticsSpec. */
  private[graft] def streamingDedup(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.dedupDailyCounts(
      events(s, dir))

  private[graft] val streamingDedupOracle =
    """SELECT event_type, count(*) AS n_user_days
      |FROM (SELECT DISTINCT user_id, event_type,
      |        date_trunc('day', CAST(ts AS TIMESTAMP)) FROM events)
      |GROUP BY event_type""".stripMargin

  /** §2.8 widening: stream-stream interval join (purchase→view
   *  attribution, 6 h lookback) — batch run of the watermarked join;
   *  streaming equality asserted in EventAnalyticsSpec. */
  private[graft] def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    graft.streaming.EventAnalytics.attributedPurchases(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "view"),
      hours = 6)
  }

  private[graft] val streamIntervalJoinOracle =
    """SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id
      | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 6 HOURS""".stripMargin

  /** §2.8 widening: stream-static enrichment — the event stream joined
   *  broadcast to the customer dim (batch face; stream equality in
   *  EventAnalyticsSpec). */
  private[graft] def streamStaticJoinQ(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.enrichedEvents(
      events(s, dir),
      s.read.parquet(t(dir, "customer")).select(col("c_custkey"), col("c_acctbal")),
      "c_custkey")

  private[graft] val streamStaticJoinOracle =
    """SELECT e.event_id, e.user_id, e.event_type, e.value,
      |  c.c_acctbal, c.c_custkey IS NOT NULL AS matched
      |FROM events e
      |LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin

  /** §2.8 widening: the BUILT-IN `session_window` aggregate — the
   *  declarative tier of sessionization (q_sessions covers the custom
   *  flatMapGroupsWithState tier; both must agree with the same
   *  gaps-and-islands SQL). Window bounds: [first event, last event +
   *  gap), so session_end - gap = last event time. */
  private[graft] def sessionWindowAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("event_time",
        graft.streaming.EventAnalytics.eventTime(col("ts")))
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_window.end") - expr("INTERVAL 30 MINUTES"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"))

  private[graft] val sessionWindowAggOracle =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS et FROM events),
      |x AS (
      |  SELECT user_id, et,
      |    CASE WHEN prev IS NULL OR epoch(et) - epoch(prev) >= 1800 THEN 1 ELSE 0 END AS ns
      |  FROM (SELECT user_id, et,
      |          lag(et) OVER (PARTITION BY user_id ORDER BY et) AS prev FROM e)),
      |y AS (
      |  SELECT user_id, et,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY et ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id,
      |  strftime(min(et), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(max(et), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      |  count(*) AS n_events
      |FROM y GROUP BY user_id, sid""".stripMargin

  /** DYNAMIC-gap session windows — the session_window tier q_session
   *  _window's fixed 30 minutes can't express: each event extends its
   *  session by a gap chosen from ITS OWN type (views cool off in 10
   *  minutes, purchases hold the session 45). Spark merges the
   *  per-event [t, t+gap] intervals CLOSED at the right end — an event
   *  starting exactly at the running max end still merges
   *  (EventAnalyticsSpec pins the boundary) — so the oracle's islands
   *  rule is STRICTLY-after (`epoch_us(et) > max_end`); tied events
   *  share a start and any positive gap covers them. Micros-exact
   *  arithmetic end to end. */
  private[graft] def sessionWindowDynamicQ(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("event_time",
        graft.streaming.EventAnalytics.eventTime(col("ts")))
      // string gaps: a bare INTERVAL literal parses as DayTimeInterval
      // under classic (non-ANSI) mode, which session_window rejects —
      // the string form converts to CalendarInterval internally
      .groupBy(col("user_id"), session_window(col("event_time"), expr(
        """CASE WHEN event_type = 'view' THEN '10 minutes'
          |  WHEN event_type = 'purchase' THEN '45 minutes'
          |  ELSE '30 minutes' END""".stripMargin)))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_window.end"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"))

  private[graft] val sessionWindowDynamicOracle =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS et,
      |    CASE WHEN event_type = 'view' THEN 600000000
      |      WHEN event_type = 'purchase' THEN 2700000000
      |      ELSE 1800000000 END AS gap_us
      |  FROM events),
      |w AS (
      |  SELECT user_id, et, gap_us,
      |    max(epoch_us(et) + gap_us) OVER (PARTITION BY user_id
      |      ORDER BY et, gap_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_end
      |  FROM e),
      |x AS (
      |  SELECT *, CASE WHEN max_end IS NULL OR epoch_us(et) > max_end
      |    THEN 1 ELSE 0 END AS ns
      |  FROM w),
      |y AS (
      |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY et, gap_us
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id,
      |  strftime(min(et), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(make_timestamp(max(epoch_us(et) + gap_us)),
      |    '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      |  count(*) AS n_events
      |FROM y GROUP BY user_id, sid""".stripMargin

  /** §2.8 widening: gaps-and-islands sessionization (30-min gap) — the
   *  batch oracle of the flatMapGroupsWithState streaming path. */
  private[graft] def sessions(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.sessionsBatch(
      events(s, dir), gapMinutes = 30)
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"))

  private[graft] val sessionsOracle =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS et FROM events),
      |x AS (
      |  SELECT user_id, et,
      |    CASE WHEN prev IS NULL OR epoch(et) - epoch(prev) >= 1800 THEN 1 ELSE 0 END AS ns
      |  FROM (SELECT user_id, et,
      |          lag(et) OVER (PARTITION BY user_id ORDER BY et) AS prev FROM e)),
      |y AS (
      |  SELECT user_id, et,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY et ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id,
      |  strftime(min(et), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |  strftime(max(et), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      |  count(*) AS n_events
      |FROM y GROUP BY user_id, sid""".stripMargin

  /** First-touch signup→click→purchase funnel, 24 h conversion window
   *  (ts is epoch NANOS via the legacy long read — the gap literal is in
   *  nanos too). One user-keyed shuffle; oracle is the classic per-step
   *  min-ts join chain, which first-touch greedy provably equals. */
  private[graft] def funnelQ(s: SparkSession, dir: String): DataFrame =
    Events.funnelReachCounts(events(s, dir),
      "user_id", "event_type", "ts", Seq("signup", "click", "purchase"),
      maxGap = 86400L * 1000000000L)

  private[graft] val funnelOracle =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND ts > t1
      |    AND epoch_ns(ts) - epoch_ns(t1) <= 86400000000000 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND ts > t2
      |    AND epoch_ns(ts) - epoch_ns(t2) <= 86400000000000 GROUP BY 1)
      |SELECT (SELECT count(*) FROM s1) AS n_step1_signup,
      |       (SELECT count(*) FROM s2) AS n_step2_click,
      |       (SELECT count(*) FROM s3) AS n_step3_purchase""".stripMargin

  /** Conversion-latency distribution: signup→click first-touch
   *  latencies (24 h window, the funnel's step-1→2 edge) summarized
   *  with EXACT percentiles — `percentile` (R-7) matches DuckDB's
   *  `quantile_cont` bit-for-bit, the q_length_filter precedent. */
  private[graft] def conversionLatencyQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val gapNs = 86400L * 1000000000L
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") && col("ts") - col("t1") <= lit(gapNs))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    s2.select(((col("t2") - col("t1")).cast("double") / lit(1.0e9)).as("sec"))
      .agg(count(lit(1)).as("n_conversions"),
        round(expr("percentile(sec, 0.5)"), 6).as("p50_sec"),
        round(expr("percentile(sec, 0.9)"), 6).as("p90_sec"),
        round(avg(col("sec")), 6).as("mean_sec"))
  }

  private[graft] val conversionLatencyOracle =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND e.ts > s1.t1
      |    AND epoch_ns(e.ts) - epoch_ns(s1.t1) <= 86400000000000 GROUP BY 1),
      |l AS (
      |  SELECT (epoch_ns(t2) - epoch_ns(t1)) / CAST(1000000000.0 AS DOUBLE) AS sec
      |  FROM s2)
      |SELECT count(*) AS n_conversions,
      |  round(quantile_cont(sec, 0.5), 6) AS p50_sec,
      |  round(quantile_cont(sec, 0.9), 6) AS p90_sec,
      |  round(avg(sec), 6) AS mean_sec
      |FROM l""".stripMargin

  /** Weekly cohort-retention triangle over the events table (ts is epoch
   *  nanos; bucket = 7-day span). One distinct (user, bucket) collapse —
   *  map-side combined — then all work runs on the activity table. */
  private[graft] def cohortRetention(s: SparkSession, dir: String): DataFrame =
    Events.cohortRetention(events(s, dir),
      "user_id", "ts", bucketSize = 7L * 86400L * 1000000000L, maxOffset = 8)

  private[graft] val cohortRetentionOracle =
    """WITH act AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS b
      |  FROM events),
      |c AS (
      |  SELECT user_id, b,
      |    min(b) OVER (PARTITION BY user_id) AS cohort_bucket
      |  FROM act)
      |SELECT cohort_bucket, b - cohort_bucket AS bucket_offset,
      |  count(*) AS n_users
      |FROM c WHERE b - cohort_bucket <= 8 GROUP BY 1, 2""".stripMargin

  private[graft] def eventsSequential(s: SparkSession, dir: String): DataFrame = {
    val serial = floor(col("event_id") / 5).cast("long")
    // `ts` arrives as long nanos (nanosAsLong); integer-exact to micros
    val tsCol = timestamp_micros(expr("ts div 1000"))
    val std = events(s, dir)
      .filter(pmod(col("event_id"), lit(97)) =!= 0)
      .select(
        concat(lit("f"), pmod(col("event_id"), lit(5))).as(SequentialChecks.FileCol),
        serial.as(SequentialChecks.SerialNumber),
        floor(serial / 10).cast("long").as(SequentialChecks.BundleId),
        pmod(serial, lit(10)).as(SequentialChecks.RecordId),
        lit(10L).as(SequentialChecks.BundleSize),
        date_trunc("second", tsCol).as(SequentialChecks.GeneratedAt),
        date_trunc("second", tsCol).as(SequentialChecks.ReceivedAt),
        lit("log").as(SequentialChecks.LogFileName))
    SequentialChecks(std)
      .select(col("file"), col("field_path"), col("valid"), col("details"),
        col("serial_number"))
  }

  private[graft] val eventsSequentialOracle =
    """WITH base AS (
      |  SELECT concat('f', event_id % 5) AS file,
      |         event_id // 5 AS serial_number,
      |         (event_id // 5) // 10 AS bundle_id,
      |         (event_id // 5) % 10 AS record_id,
      |         date_trunc('second', ts) AS gen
      |  FROM events WHERE event_id % 97 <> 0
      |), paired AS (
      |  SELECT *,
      |         lag(record_id) OVER w AS prev_rid,
      |         lag(serial_number) OVER w AS prev_serial,
      |         lag(gen) OVER w AS prev_gen
      |  FROM base
      |  WINDOW w AS (PARTITION BY file, bundle_id ORDER BY serial_number)
      |), pair_fails AS (
      |  SELECT file, serial_number,
      |    'Detected incorrectly incremented recordId. Expected recordId ''' || (prev_rid+1) || ''' but got ''' || record_id || '''' AS details
      |  FROM paired WHERE prev_serial IS NOT NULL AND record_id <> prev_rid + 1
      |  UNION ALL
      |  SELECT file, serial_number,
      |    'Detected incorrectly incremented serialNumber. Expected serialNumber ''' || (prev_serial+1) || ''' but got ''' || serial_number || ''''
      |  FROM paired WHERE prev_serial IS NOT NULL AND serial_number <> prev_serial + 1
      |  UNION ALL
      |  SELECT file, serial_number,
      |    'Detected non-chronological recordGeneratedAt. Previous timestamp was ''' || strftime(prev_gen, '%Y-%m-%d %H:%M:%S') || '+00:00'' but current timestamp is ''' || strftime(gen, '%Y-%m-%d %H:%M:%S') || '+00:00'''
      |  FROM paired WHERE prev_serial IS NOT NULL AND gen < prev_gen
      |  UNION ALL
      |  SELECT file, serial_number,
      |    'Detected non-chronological odeReceivedAt. Previous timestamp was ''' || strftime(prev_gen, '%Y-%m-%d %H:%M:%S') || '+00:00'' but current timestamp is ''' || strftime(gen, '%Y-%m-%d %H:%M:%S') || '+00:00'''
      |  FROM paired WHERE prev_serial IS NOT NULL AND gen < prev_gen
      |), bundles AS (
      |  SELECT file, bundle_id, min(record_id) AS first_rid, max(record_id) AS last_rid,
      |         count(*) AS cnt, max(serial_number) AS last_serial
      |  FROM base GROUP BY 1, 2
      |), bundle_fails AS (
      |  SELECT file,
      |    CASE WHEN first_rid = 0 THEN 'bundleSize doesn''t match number of records. Number of records: ''' || cnt || ''' != bundlSize: ''10'''
      |         ELSE 'bundleSize doesn''t match last recordId. Last recordId: ''' || last_rid || ''' != (bundleSize-1: ''9'')' END AS details,
      |    last_serial AS serial_number
      |  FROM bundles
      |  WHERE (first_rid = 0 AND last_rid = 9 AND cnt <> 10)
      |     OR (first_rid <> 0 AND last_rid <> 9)
      |), all_fails AS (
      |  SELECT file, CAST(NULL AS VARCHAR) AS field_path, FALSE AS valid, details, serial_number FROM pair_fails
      |  UNION ALL
      |  SELECT file, CAST(NULL AS VARCHAR), FALSE, details, serial_number FROM bundle_fails
      |)
      |SELECT file, field_path, valid, details, serial_number FROM all_fails
      |UNION ALL
      |SELECT DISTINCT file, 'SequentialCheck', TRUE, '', CAST(NULL AS BIGINT)
      |FROM base WHERE file NOT IN (SELECT DISTINCT file FROM all_fails)""".stripMargin
}
