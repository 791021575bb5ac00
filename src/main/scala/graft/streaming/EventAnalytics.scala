package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-time analytics over the `events` stream table (SURVEY §2.8
 * widening): watermarked tumbling-window aggregation and stateful
 * sessionization. Every operator is written once against DataFrame /
 * Dataset and runs identically in batch and Structured Streaming — the
 * batch run is the DuckDB-oracled correctness gate (q_windowed_agg,
 * q_sessions), the streaming run is asserted equal in
 * EventAnalyticsSpec.
 *
 * Every operator first routes `ts` through
 * [[graft.ingest.Readers.tsToNanos]] (long epoch nanos whatever the
 * physical parquet layout — TIMESTAMP(NANOS)-as-long or
 * TIMESTAMP(MICROS)); [[eventTime]] then converts once at microsecond
 * precision, matching DuckDB's epoch_us view of the same column.
 */
object EventAnalytics {

  /** Long nanos → TimestampType (µs precision, UTC). Integer `div`
   *  (IntegralDivide), not `/`: epoch nanos (~1.7e18) exceed double's
   *  53-bit mantissa, so the true-division path rounds the last
   *  microsecond digit (caught by the q_sessions DuckDB oracle). */
  def eventTime(tsNanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge
    timestamp_micros(GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftBridge.expression(tsNanos),
        GraftBridge.expression(lit(1000L)))))
  }

  /**
   * Tumbling event-time windows per event type: count + value sum.
   * On a streaming input the caller supplies `watermark` (late data
   * beyond it is dropped and window state is reclaimed — without a
   * watermark a streaming windowed agg holds every window forever,
   * which is the classic unbounded-state bug at 100 TB/day rates);
   * batch ignores it.
   */
  def windowedCounts(events: DataFrame, windowMinutes: Int,
                     watermark: Option[String] = None): DataFrame = {
    val withTime = graft.ingest.Readers.tsToNanos(events)
      .withColumn("event_time", eventTime(col("ts")))
    val marked = watermark.fold(withTime)(withTime.withWatermark("event_time", _))
    marked
      .groupBy(window(col("event_time"), s"$windowMinutes minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /**
   * Exact dedup to one event per (user, type, day) — the streaming face of
   * exact deduplication (SURVEY §7.1 step 9 / training-data ingestion).
   * Batch: plain `dropDuplicates` (hash-shuffle on the triple). Streaming:
   * `dropDuplicatesWithinWatermark` — duplicate arrivals land within the
   * same event-time day, so any watermark ≥ 1 day keeps exactly-once
   * output while the runtime DROPS per-key state once the watermark passes
   * the day boundary. State is bounded by keys-per-watermark-window, not
   * by stream length — the difference between this and a naive streaming
   * `dropDuplicates` (state grows forever) at 100 TB/day.
   *
   * Which row survives a duplicate group is arrival-order-dependent in
   * streaming, so downstream oracle-checked consumers aggregate on the
   * KEY columns only (q_streaming_dedup counts surviving keys).
   */
  def dedupDaily(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val withTime = graft.ingest.Readers.tsToNanos(events)
      .withColumn("event_time", eventTime(col("ts")))
      .withColumn("day", to_date(col("event_time")))
    watermark match {
      case Some(w) => withTime.withWatermark("event_time", w)
        .dropDuplicatesWithinWatermark("user_id", "event_type", "day")
      case None => withTime.dropDuplicates("user_id", "event_type", "day")
    }
  }

  /** Surviving-key counts per event type over the deduped stream/batch —
   *  the oracle-facing aggregate (key columns only; see [[dedupDaily]]). */
  def dedupDailyCounts(events: DataFrame, watermark: Option[String] = None): DataFrame =
    dedupDaily(events, watermark)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_user_days"))

  /**
   * Purchase→view attribution: every (purchase, prior view ≤ `hours` old,
   * same user) pair — a stream-stream INNER interval join. Streaming:
   * both sides watermarked and the join condition carries the time bound,
   * so each side's buffered state is evicted once the other side's
   * watermark passes the interval — state ∝ events-per-interval, not
   * stream length (the canonical bounded-state stream-stream join shape).
   * Batch: the identical expression runs as a plain range join (the
   * DuckDB-oracle path, q_stream_interval_join).
   */
  /**
   * Stream-static enrichment: the event stream joined to a static
   * dimension table — the most common production streaming join
   * (enrich clicks with the user/account dim). The static side is
   * re-read per micro-batch by Spark; broadcast keeps the stream side
   * shuffle-free, and no watermark is needed (static state never
   * grows). Works identically in batch — the DuckDB-oracled face
   * (q_stream_static_join); stream equality asserted in
   * EventAnalyticsSpec.
   */
  def enrichedEvents(events: DataFrame, dim: DataFrame, dimKey: String,
                     streamKey: String = "user_id",
                     payloadCols: Seq[String] = Nil): DataFrame = {
    val e = graft.ingest.Readers.tsToNanos(events)
    // payload defaults to every dim column except the join key — the
    // dim's width IS the broadcast width and the output schema, so
    // project the dim BEFORE passing it in (or pass payloadCols
    // explicitly; a streaming query's restart schema must not change)
    val payload =
      if (payloadCols.nonEmpty) payloadCols
      else dim.columns.toSeq.filterNot(_ == dimKey)
    e.join(broadcast(dim), e(streamKey) === dim(dimKey), "left")
      .select(e("event_id") +: e(streamKey) +: e("event_type") +: e("value") +:
        (payload.map(dim(_)) :+ dim(dimKey).isNotNull.as("matched")): _*)
  }

  def attributedPurchases(purchases: DataFrame, views: DataFrame,
                          hours: Int, watermark: Option[String] = None): DataFrame = {
    val p0 = graft.ingest.Readers.tsToNanos(purchases)
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), eventTime(col("ts")).as("p_time"))
    val v0 = graft.ingest.Readers.tsToNanos(views)
      .select(col("user_id").as("v_user"),
        col("event_id").as("view_id"), eventTime(col("ts")).as("v_time"))
    val (p, v) = watermark match {
      case Some(w) => (p0.withWatermark("p_time", w), v0.withWatermark("v_time", w))
      case None => (p0, v0)
    }
    p.join(v,
        col("p_user") === col("v_user") &&
          col("v_time") <= col("p_time") &&
          col("v_time") >= col("p_time") - expr(s"INTERVAL $hours HOURS"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"))
  }

  /** One closed user session: consecutive events with gaps < the session
   *  gap, [start, end] inclusive of the bounding events. */
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Open-session state, one fixed-size record per active user. Public:
   *  the state encoder's generated code needs constructor access. */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long)

  /**
   * Batch sessionization — gaps-and-islands: a new session starts where
   * the gap from the previous event of the same user is ≥ `gapMinutes`.
   * One exchange on user_id; the running-sum island id rides the same
   * partitioning. This is the oracle formulation (q_sessions).
   */
  def sessionsBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_time"))
    graft.ingest.Readers.tsToNanos(events)
      .withColumn("event_time", eventTime(col("ts")))
      .withColumn("prev", lag(col("event_time"), 1).over(w))
      // double cast keeps the fractional seconds (exact for µs epochs
      // within double's 53 bits) — a long cast would truncate and
      // misclassify a 29:59.5 gap against the 30-minute boundary
      .withColumn("new_session",
        when(col("prev").isNull ||
          col("event_time").cast("double") - col("prev").cast("double") >= gapMinutes * 60.0, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("event_time")).as("session_start"),
        max(col("event_time")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
  }

  /**
   * Streaming sessionization with CUSTOM state — `flatMapGroupsWithState`
   * + event-time timeout (the brief's custom-state tier; built-in
   * `session_window` covers the aggregate case, this one emits on
   * session CLOSE with arbitrary per-group state). A session closes and
   * emits when the watermark passes its last event + gap; state is one
   * fixed-size record per open session, reclaimed on timeout — bounded
   * by concurrently-active users, not event volume.
   *
   * Input must carry (user_id: Long, event_time: Timestamp). Late events
   * beyond the watermark are dropped by the runtime before the function
   * sees them.
   */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       watermark: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    graft.ingest.Readers.tsToNanos(events)
      .withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermark)
      .select(col("user_id").as[Long], col("event_time").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          def ts2us(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000 % 1000)
          def us2ts(us: Long): java.sql.Timestamp = {
            val t = new java.sql.Timestamp(us / 1000)
            t.setNanos(((us % 1000000) * 1000).toInt)
            t
          }
          if (state.hasTimedOut) {
            // watermark passed last + gap: the session is closed for good
            val s = state.get
            state.remove()
            Iterator(Session(userId, us2ts(s.startUs), us2ts(s.lastUs), s.n))
          } else {
            val sorted = rows.map(r => ts2us(r._2)).toArray.sorted
            var closed = List.empty[Session]
            var cur = state.getOption.orNull
            for (us <- sorted) {
              if (cur == null) cur = SessionState(us, us, 1L)
              else if (us - cur.lastUs >= gapUs) {
                closed ::= Session(userId, us2ts(cur.startUs), us2ts(cur.lastUs), cur.n)
                cur = SessionState(us, us, 1L)
              } else cur = cur.copy(
                // a late-but-within-watermark event can EXTEND the open
                // session backward across micro-batches; keeping only
                // lastUs would emit a session_start later than the batch
                // oracle's
                startUs = math.min(cur.startUs, us),
                lastUs = math.max(cur.lastUs, us), n = cur.n + 1)
            }
            state.update(cur)
            // close when the watermark passes last + gap
            state.setTimeoutTimestamp(cur.lastUs / 1000 + gapMinutes * 60L * 1000)
            closed.reverseIterator
          }
      }
  }

  final case class RateAlert(event_type: String, hour: Long, n: Long,
                             level_before: Double, ratio: Double)
  final case class RateState(openHour: Long, openCount: Long,
                             level: Double, hasLevel: Boolean)

  /**
   * STATEFUL streaming EWMA rate alerts: per event type, an hour bucket
   * closes when the first event of a LATER hour arrives; each closed
   * bucket is compared against the EWMA level of all prior closed
   * buckets (α = 0.3 — the q_ewma_level recursion, identical op order
   * l·7e-1 + n·3e-1) and then folded into it. State is ONE
   * (openHour, openCount, level) triple per type — bounded by the type
   * universe, the smallest possible rate-monitoring state. The first
   * closed bucket seeds the level and emits nothing; the final bucket
   * never closes (streams don't end) — so the batch face, which is this
   * SAME code run on a static frame, emits exactly hours 2..m−1 of each
   * series, which is what the q_streaming_rate_alerts recursive-CTE
   * oracle replays. Cross-batch correctness relies on per-type
   * nondecreasing hour arrival (chronological sources; a fix for an
   * already-closed hour is dropped) — the same low-latency contract as
   * [[geofenceTransitionsStream]]; event-time-perfect closing would be
   * the watermark-buffered formulation.
   */
  def rateAlerts(events: DataFrame): Dataset[RateAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = graft.ingest.Readers.tsToNanos(events)
      .select(col("event_type"), expr("ts div 3600000000000").as("hour"))
    // The BATCH face pre-aggregates to (type, hour, count) so a group
    // iterator holds hours, not rows — a type-keyed group over raw
    // events would materialize a type's whole history in one task at
    // corpus scale. The streaming face feeds per-event (hour, 1) pairs
    // (an unwatermarked aggregate can't precede fMGWS in append mode);
    // its per-micro-batch iterator is batch-bounded. Both drive the
    // SAME fold, which accumulates counts into the open bucket either
    // way — emissions are identical by construction.
    val pairs: Dataset[(String, Long, Long)] =
      if (events.isStreaming)
        base.select(col("event_type").as[String], col("hour").as[Long],
          lit(1L).as[Long])
      else
        base.groupBy(col("event_type"), col("hour"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("event_type").as[String], col("hour").as[Long],
            col("cnt").as[Long])
    pairs
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[RateState]) =>
          val buckets = rows.map(r => (r._2, r._3)).toArray
          java.util.Arrays.sort(buckets,
            Ordering.by[(Long, Long), (Long, Long)](identity))
          var st = state.getOption.orNull
          val out = List.newBuilder[RateAlert]
          for ((h, cnt) <- buckets) {
            if (st == null) st = RateState(h, cnt, 0.0, hasLevel = false)
            else if (h == st.openHour)
              st = st.copy(openCount = st.openCount + cnt)
            else if (h > st.openHour) {
              val n = st.openCount.toDouble
              if (!st.hasLevel) st = RateState(h, cnt, n, hasLevel = true)
              else {
                out += RateAlert(key, st.openHour, st.openCount, st.level,
                  n / st.level)
                st = RateState(h, cnt, st.level * 7e-1 + n * 3e-1,
                  hasLevel = true)
              }
            }
            // h < openHour: late arrival to a closed bucket — dropped
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** ONE day-close state machine for the experiment-monitor family
    * ([[zMonitor]], [[srmMonitor]]): sort the micro-batch by (day,
    * arm), a later day closes the open one (emit + fold into the
    * cumulative), same-day rows accumulate, late arrivals to a closed
    * day are dropped, the final open day never closes. The monitors
    * exist to agree bit-for-bit with their oracles — two inline copies
    * of this skeleton could drift on exactly these semantics (r9
    * review), so they are defined once and parameterized by
    * (empty, add, close). Keyed by the experiment: one constant key
    * here, experiment-id in a multi-experiment deployment. */
  private def dayCloseFold[I, S, O](
      pairs: Dataset[I],
      day: I => Long,
      sortKey: I => (Long, String),
      empty: Long => S,
      openDay: S => Long,
      withOpenDay: (S, Long) => S,
      add: (S, I) => S,
      close: S => (Iterable[O], S))(
      implicit es: org.apache.spark.sql.Encoder[S],
      eo: org.apache.spark.sql.Encoder[O]): Dataset[O] = {
    import pairs.sparkSession.implicits._
    pairs
      .groupByKey(_ => "exp")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[I], state: GroupState[S]) =>
          val sorted = rows.toIndexedSeq.sortBy(sortKey)
          var st: Option[S] = state.getOption
          val out = List.newBuilder[O]
          for (i <- sorted) {
            val d = day(i)
            st match {
              case None => st = Some(empty(d))
              case Some(s0) if d > openDay(s0) =>
                val (emitted, closed) = close(s0)
                out ++= emitted
                st = Some(withOpenDay(closed, d))
              case _ => ()
            }
            st match {
              case Some(s0) if openDay(s0) == d => st = Some(add(s0, i))
              case _ => () // late arrival to a closed day — dropped
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  final case class ZReadout(day: Long, n_a: Long, n_b: Long, z: Double,
                            crossed: Boolean)
  final case class ZMonitorState(openDay: Long,
                                 oaN: Long, oaS: Long, oaSS: Long,
                                 obN: Long, obS: Long, obSS: Long,
                                 caN: Long, caS: Long, caSS: Long,
                                 cbN: Long, cbS: Long, cbSS: Long)

  /**
   * STATEFUL streaming sequential z monitor — the live face of the
   * q_sequential_ztest daily-peeking readout: a day closes when the
   * first event of a LATER day arrives, and each closed day emits the
   * cumulative Welch z (and the |z| > 2.5 boundary flag) an
   * experimenter's dashboard would show for it. State is ONE flat tuple
   * of exact integer moments — open-day and closed-cumulative
   * (n, Σcents, Σcents²) per arm — so within-day accumulation is
   * LONG addition (commutative: per-event streaming arrival order and
   * the batch face's pre-aggregation reach identical state bit-for-bit)
   * and the only floating-point runs once per emission, in the same op
   * sequence the DuckDB oracle replays (cents→double is one correctly
   * rounded division, not a decimal cast, on both faces). Exactness
   * bound: Σcents² per arm must stay under 2^63 (~9e10 events at
   * O(100)-unit values) — one experiment's metric stream, not a corpus.
   *
   * Emission rule (mirrored in the oracle): a closed day emits only if
   * BOTH arms observed it (a one-arm day has no comparable readout —
   * its moments still fold into the cumulative) and both cumulative
   * counts exceed 1 (Welch variance needs n ≥ 2). The final open day
   * never closes — streams don't end — so the batch face (this SAME
   * fold on the static frame) emits exactly the days before the last.
   * Keyed by the experiment (one constant key here: a monitor watches
   * one experiment; a multi-experiment deployment keys by experiment id
   * and parallelizes across them). Late arrivals to a closed day are
   * dropped — the chronological-source contract of [[rateAlerts]].
   */
  def zMonitor(events: DataFrame): Dataset[ZReadout] = {
    val spark = events.sparkSession
    import spark.implicits._
    // NULL metrics are dropped on BOTH faces: the batch pre-aggregation
    // would otherwise count a row whose moments are absent while the
    // streaming encoder rejects the null outright — divergent by
    // construction (r9 review). A null-valued event carries no metric.
    val base = graft.ingest.Readers.tsToNanos(events)
      .filter(col("value").isNotNull)
      .select(expr("ts div 86400000000000").as("day"),
        expr("CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END").as("variant"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    // batch face pre-aggregates to per-(day, arm) moments (group
    // iterator holds days, not rows); the streaming face feeds
    // per-event singletons — integer addition makes both reach the
    // same state regardless of order
    val pairs: Dataset[(Long, String, Long, Long, Long)] =
      if (events.isStreaming)
        base.select(col("day").as[Long], col("variant").as[String],
          lit(1L).as[Long], col("cents").as[Long],
          (col("cents") * col("cents")).as[Long])
      else
        base.groupBy(col("day"), col("variant"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
            sum(col("cents") * col("cents")).as("ss"))
          .select(col("day").as[Long], col("variant").as[String],
            col("n").as[Long], col("s").as[Long], col("ss").as[Long])
    dayCloseFold[(Long, String, Long, Long, Long), ZMonitorState, ZReadout](
      pairs,
      day = _._1,
      sortKey = r => (r._1, r._2),
      empty = d => ZMonitorState(d, 0L, 0L, 0L, 0L, 0L, 0L,
        0L, 0L, 0L, 0L, 0L, 0L),
      openDay = _.openDay,
      withOpenDay = (s, d) => s.copy(openDay = d),
      add = (st, r) => {
        val (_, variant, n, s, ss) = r
        if (variant == "A")
          st.copy(oaN = st.oaN + n, oaS = st.oaS + s, oaSS = st.oaSS + ss)
        else
          st.copy(obN = st.obN + n, obS = st.obS + s, obSS = st.obSS + ss)
      },
      close = s => {
        val caN = s.caN + s.oaN; val caS = s.caS + s.oaS
        val caSS = s.caSS + s.oaSS
        val cbN = s.cbN + s.obN; val cbS = s.cbS + s.obS
        val cbSS = s.cbSS + s.obSS
        val emitted =
          if (s.oaN > 0 && s.obN > 0 && caN > 1 && cbN > 1) {
            // the oracle's op sequence, verbatim
            val csA = caS.toDouble / 1e2; val cssA = caSS.toDouble / 1e4
            val csB = cbS.toDouble / 1e2; val cssB = cbSS.toDouble / 1e4
            val z = (csA / caN - csB / cbN) /
              math.sqrt(((cssA - csA * csA / caN) / (caN - 1)) / caN +
                ((cssB - csB * csB / cbN) / (cbN - 1)) / cbN)
            Some(ZReadout(s.openDay, caN, cbN, z, math.abs(z) > 25e-1))
          } else None
        (emitted, ZMonitorState(s.openDay, 0L, 0L, 0L, 0L, 0L, 0L,
          caN, caS, caSS, cbN, cbS, cbSS))
      })
  }

  final case class SrmAlert(day: Long, n_a: Long, n_b: Long,
                            chi2: Double, mismatch: Boolean)
  final case class SrmState(openDay: Long, oaN: Long, obN: Long,
                            caN: Long, cbN: Long)

  /**
   * STATEFUL streaming sample-ratio-mismatch guardrail — the third
   * member of the live experiment-monitor family ([[rateAlerts]],
   * [[zMonitor]]): on each day close, the cumulative A/B assignment
   * counts are tested against the designed 50/50 split with the
   * two-cell chi-square χ² = (n_a − n_b)²/(n_a + n_b); χ² > 3.84 (the
   * 5% point of χ²₁) flags a randomization bug before anyone reads the
   * metric readout. State is FOUR longs (open-day + cumulative counts
   * per arm) — pure integer addition, so streaming arrival order and
   * the batch face's pre-aggregation agree bit-for-bit, and the single
   * double division per emission replays identically in the oracle.
   * Day-close / final-open-day / late-arrival semantics are
   * [[zMonitor]]'s (chronological-source contract).
   */
  def srmMonitor(events: DataFrame): Dataset[SrmAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = graft.ingest.Readers.tsToNanos(events)
      .select(expr("ts div 86400000000000").as("day"),
        expr("CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END").as("variant"))
    val pairs: Dataset[(Long, String, Long)] =
      if (events.isStreaming)
        base.select(col("day").as[Long], col("variant").as[String],
          lit(1L).as[Long])
      else
        base.groupBy(col("day"), col("variant"))
          .agg(count(lit(1)).as("n"))
          .select(col("day").as[Long], col("variant").as[String],
            col("n").as[Long])
    dayCloseFold[(Long, String, Long), SrmState, SrmAlert](
      pairs,
      day = _._1,
      sortKey = r => (r._1, r._2),
      empty = d => SrmState(d, 0L, 0L, 0L, 0L),
      openDay = _.openDay,
      withOpenDay = (s, d) => s.copy(openDay = d),
      add = (st, r) =>
        if (r._2 == "A") st.copy(oaN = st.oaN + r._3)
        else st.copy(obN = st.obN + r._3),
      close = s => {
        val caN = s.caN + s.oaN
        val cbN = s.cbN + s.obN
        val emitted =
          if (caN + cbN > 0) {
            val d = (caN - cbN).toDouble
            val chi2 = d * d / (caN + cbN)
            Some(SrmAlert(s.openDay, caN, cbN, chi2, chi2 > 384e-2))
          } else None
        (emitted, SrmState(s.openDay, 0L, 0L, caN, cbN))
      })
  }

  /** Bucket count for [[mwMonitor]]'s histogram state: metric values
    * clamp into [0, MwBuckets) integer-unit bins. Fixed at declaration
    * — a resize changes the state-store schema (cf. [[ZoneState]]). */
  val MwBuckets = 512

  final case class MwReadout(day: Long, n_a: Long, n_b: Long, u2: Long,
                             z: Double, crossed: Boolean)
  final case class MwState(openDay: Long,
                           oa: Array[Long], ob: Array[Long],
                           ca: Array[Long], cb: Array[Long])

  /**
   * STATEFUL streaming Mann-Whitney (rank-sum) day-close monitor — the
   * nonparametric sibling of [[zMonitor]] for metrics where the Welch z
   * is the wrong tool (heavy tails, bounded scores): on each day close
   * it emits the cumulative Mann-Whitney z between the arms. The
   * classic statistic needs a rank over ALL observations so far —
   * unbounded state — so the monitor keeps the standard streaming
   * reduction instead: a FIXED [[MwBuckets]]-bin integer histogram per
   * arm (integer-unit value bins, clamped), from which the tie-credited
   * statistic is EXACT over the binned data:
   *
   *   2U = Σ_i a_i · (2·Σ_{j<i} b_j + b_i)   (exact integers)
   *
   * with the tie-corrected normal approximation
   *   z = (2U − n_a·n_b) / (2·σ),
   *   σ² = n_a·n_b/12 · [(n+1) − Σ(t³−t)/(n(n−1))],  t = a_i + b_i.
   *
   * State is pure integer counts (histogram addition is commutative →
   * per-event streaming arrival and the batch face's per-(day, arm,
   * bucket) pre-aggregation reach identical state bit-for-bit); the
   * single double op sequence per emission is replayed verbatim in the
   * DuckDB oracle. The Σ(t³−t) tie term accumulates in BigInt at close
   * (t > ~2.1M per bucket overflows Long t³), so the monitor has no
   * silent wrap — the only bound left is u2/counts at ~9e18 events,
   * zMonitor's documented class. Day-close / final-open-day / late-arrival semantics
   * are [[zMonitor]]'s. Emission: both arms observed the day and the
   * tie-corrected σ² is positive (degenerate all-one-bucket days
   * cannot be tested).
   */
  def mwMonitor(events: DataFrame): Dataset[MwReadout] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = graft.ingest.Readers.tsToNanos(events)
      .filter(col("value").isNotNull)
      .select(expr("ts div 86400000000000").as("day"),
        expr("CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END").as("variant"),
        expr(s"CAST(least(greatest(floor(value), 0), ${MwBuckets - 1}) AS INT)")
          .as("bucket"))
    val pairs: Dataset[(Long, String, Int, Long)] =
      if (events.isStreaming)
        base.select(col("day").as[Long], col("variant").as[String],
          col("bucket").as[Int], lit(1L).as[Long])
      else
        base.groupBy(col("day"), col("variant"), col("bucket"))
          .agg(count(lit(1)).as("n"))
          .select(col("day").as[Long], col("variant").as[String],
            col("bucket").as[Int], col("n").as[Long])
    dayCloseFold[(Long, String, Int, Long), MwState, MwReadout](
      pairs,
      day = _._1,
      sortKey = r => (r._1, r._2),
      empty = d => MwState(d, new Array[Long](MwBuckets),
        new Array[Long](MwBuckets), new Array[Long](MwBuckets),
        new Array[Long](MwBuckets)),
      openDay = _.openDay,
      withOpenDay = (s, d) => s.copy(openDay = d),
      add = (st, r) => {
        val (_, variant, b, n) = r
        // in-place histogram update: the fold owns this array (it was
        // either freshly decoded from the state store or built by
        // empty/close within this group invocation)
        if (variant == "A") st.oa(b) += n else st.ob(b) += n
        st
      },
      close = s => {
        val ca = new Array[Long](MwBuckets)
        val cb = new Array[Long](MwBuckets)
        var openA = 0L; var openB = 0L
        var i = 0
        while (i < MwBuckets) {
          ca(i) = s.ca(i) + s.oa(i); cb(i) = s.cb(i) + s.ob(i)
          openA += s.oa(i); openB += s.ob(i)
          i += 1
        }
        var nA = 0L; var nB = 0L; var u2 = 0L
        // tie term t³−t overflows Long once a bucket holds > ~2.1M
        // observations (realistic for clamped metrics that concentrate in
        // few of the 512 buckets); accumulate exactly in BigInt — 512 ops
        // per day-close — and convert to double ONCE, the same
        // exact-integer-then-double sequence the oracle's HUGEINT sum runs
        var tSum = BigInt(0)
        var bLess = 0L
        i = 0
        while (i < MwBuckets) {
          u2 += ca(i) * (2L * bLess + cb(i))
          bLess += cb(i)
          nA += ca(i); nB += cb(i)
          val t = ca(i) + cb(i)
          tSum += BigInt(t) * t * t - t
          i += 1
        }
        val emitted =
          if (openA > 0 && openB > 0 && nA > 0 && nB > 0) {
            // the oracle's op sequence, verbatim
            val n = (nA + nB).toDouble
            val sig2 = nA.toDouble * nB.toDouble / 12e0 *
              ((n + 1e0) - tSum.toDouble / (n * (n - 1e0)))
            if (sig2 > 0e0) {
              val z = (u2.toDouble - nA.toDouble * nB.toDouble) /
                (2e0 * math.sqrt(sig2))
              Some(MwReadout(s.openDay, nA, nB, u2, z, math.abs(z) > 25e-1))
            } else None
          } else None
        (emitted, MwState(s.openDay, new Array[Long](MwBuckets),
          new Array[Long](MwBuckets), ca, cb))
      })
  }

  final case class CupedReadout(day: Long, n_a: Long, n_b: Long,
                                theta: Double, diff_raw: Double,
                                diff_adj: Double)
  final case class CupedState(openDay: Long,
                              oaN: Long, oaX: Long, oaY: Long, oaXY: Long, oaXX: Long,
                              obN: Long, obX: Long, obY: Long, obXY: Long, obXX: Long,
                              caN: Long, caX: Long, caY: Long, caXY: Long, caXX: Long,
                              cbN: Long, cbX: Long, cbY: Long, cbXY: Long, cbXX: Long)

  /**
   * STATEFUL streaming CUPED day-close monitor — variance-reduced
   * experiment readout ([[zMonitor]]'s family): each closed day emits
   * the cumulative covariate-adjusted treatment effect
   *
   *   Δ_adj = (Ȳ_A − θ·X̄_A) − (Ȳ_B − θ·X̄_B),
   *   θ = cov(X, Y) / var(X)   (pooled over both arms, the standard
   *                             CUPED estimator)
   *
   * with X the pre-exposure covariate (the event's `props.k` attribute
   * here) and Y the metric in cents. State is exact integer moments —
   * (n, ΣX, ΣY, ΣXY, ΣXX) per arm, open-day + closed-cumulative — so
   * within-day accumulation is LONG addition (order-free; streaming
   * singletons ≡ batch pre-aggregation bit-for-bit) and the only
   * floating-point is one shared op sequence per emission, replayed
   * verbatim in the DuckDB oracle. Exactness bound: ΣXY needs
   * x·y_cents·n < 2^63 (x ≤ 100, metric O(100) units → ~2e13 events).
   * Day-close / final-open-day / late-arrival semantics are
   * [[zMonitor]]'s. Emission: both arms observed the day, both
   * cumulative n > 0, and pooled var(X) > 0.
   */
  def cupedMonitor(events: DataFrame): Dataset[CupedReadout] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = graft.ingest.Readers.tsToNanos(events)
      .select(expr("ts div 86400000000000").as("day"),
        expr("CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END").as("variant"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("x"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("y"))
      // filter on the CAST RESULTS, not the raw fields: a non-numeric k
      // (or value) casts to null, and gating on the raw string would let
      // it through — the batch face would then count the row in n while
      // skipping it in the sums, and the streaming face would crash on a
      // null in a non-nullable encoder field (the zMonitor divergence
      // class). Both faces must drop the row identically, here.
      .filter(col("x").isNotNull && col("y").isNotNull)
    val pairs: Dataset[(Long, String, Long, Long, Long, Long, Long)] =
      if (events.isStreaming)
        base.select(col("day"), col("variant"),
          lit(1L).as("n"), col("x"), col("y"),
          (col("x") * col("y")).as("xy"), (col("x") * col("x")).as("xx"))
          .as[(Long, String, Long, Long, Long, Long, Long)]
      else
        base.groupBy(col("day"), col("variant"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("day"), col("variant"), col("n"), col("sx"),
            col("sy"), col("sxy"), col("sxx"))
          .as[(Long, String, Long, Long, Long, Long, Long)]
    dayCloseFold[(Long, String, Long, Long, Long, Long, Long),
        CupedState, CupedReadout](
      pairs,
      day = _._1,
      sortKey = r => (r._1, r._2),
      empty = d => CupedState(d, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
        0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L),
      openDay = _.openDay,
      withOpenDay = (s, d) => s.copy(openDay = d),
      add = (st, r) => {
        val (_, variant, n, x, y, xy, xx) = r
        if (variant == "A")
          st.copy(oaN = st.oaN + n, oaX = st.oaX + x, oaY = st.oaY + y,
            oaXY = st.oaXY + xy, oaXX = st.oaXX + xx)
        else
          st.copy(obN = st.obN + n, obX = st.obX + x, obY = st.obY + y,
            obXY = st.obXY + xy, obXX = st.obXX + xx)
      },
      close = s => {
        val caN = s.caN + s.oaN; val caX = s.caX + s.oaX
        val caY = s.caY + s.oaY; val caXY = s.caXY + s.oaXY
        val caXX = s.caXX + s.oaXX
        val cbN = s.cbN + s.obN; val cbX = s.cbX + s.obX
        val cbY = s.cbY + s.obY; val cbXY = s.cbXY + s.obXY
        val cbXX = s.cbXX + s.obXX
        val emitted =
          if (s.oaN > 0 && s.obN > 0 && caN > 0 && cbN > 0) {
            // the oracle's op sequence, verbatim: cents→units is ONE
            // correctly rounded division per moment (never a decimal
            // cast), pooled θ from double moments
            val n = (caN + cbN).toDouble
            val sx = (caX + cbX).toDouble
            val sy = (caY + cbY).toDouble / 1e2
            val sxy = (caXY + cbXY).toDouble / 1e2
            val sxx = (caXX + cbXX).toDouble
            val varX = sxx - sx * sx / n
            if (varX > 0e0) {
              val theta = (sxy - sx * sy / n) / varX
              val mxp = sx / n
              val ya = (caY.toDouble / 1e2) / caN
              val yb = (cbY.toDouble / 1e2) / cbN
              val xa = caX.toDouble / caN
              val xb = cbX.toDouble / cbN
              val diffRaw = ya - yb
              val diffAdj = (ya - theta * (xa - mxp)) -
                (yb - theta * (xb - mxp))
              Some(CupedReadout(s.openDay, caN, cbN, theta, diffRaw, diffAdj))
            } else None
          } else None
        (emitted, CupedState(s.openDay, 0L, 0L, 0L, 0L, 0L,
          0L, 0L, 0L, 0L, 0L,
          caN, caX, caY, caXY, caXX, cbN, cbX, cbY, cbXY, cbXX))
      })
  }

  final case class ZoneTransition(user_id: Long, ts: Long, event_id: Long,
                                  from_zone: String, to_zone: String)
  /** NOTE: adding lastId (r8) changed the state-store schema — a
    * pre-r8 streaming checkpoint of this operator cannot restore and
    * must be rebuilt (no long-lived checkpoints exist in this repo's
    * tests; a production deployment would pay one reprocess). */
  final case class ZoneState(lastTsNs: Long, lastId: Long, lastZone: String)

  /**
   * STATEFUL streaming geofence transitions: per-vehicle last-zone
   * state carried across micro-batches by `flatMapGroupsWithState`, so
   * an entry in batch N is detected against the position from batch
   * N-1 — the alerting face of [[graft.ext.Geo.geofenceTransitions]],
   * whose batch form is the DuckDB-oracled gate (q_geofence_transitions;
   * stream ≡ batch asserted in EventAnalyticsSpec). State is ONE
   * (ts, zone) pair per vehicle — bounded by the fleet size, the
   * smallest possible streaming state. Within a batch each vehicle's
   * fixes sort in memory (per-vehicle-per-batch fan-in is small by
   * construction); cross-batch order relies on source order, the
   * standard contract for low-latency alerting (an event-time-perfect
   * variant is the watermark-buffered formulation, cf.
   * [[sessionizeStream]]).
   */
  def geofenceTransitionsStream(points: DataFrame,
      zones: Seq[(String, Seq[(Double, Double)])],
      keyCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", latCol: String = "lat",
      lonCol: String = "lon"): Dataset[ZoneTransition] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .withColumn("zone", graft.ext.Geo.zoneOf(col(latCol), col(lonCol), zones))
      .select(col(keyCol).cast("long").as[Long], col(tsCol).as[Long],
        col(idCol).as[Long], col("zone").as[String])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[ZoneState]) =>
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          var last = state.getOption.orNull
          val out = List.newBuilder[ZoneTransition]
          for ((_, ts, id, zone) <- sorted) {
            // a fix at or before the carried (ts, id) watermark (late or
            // re-delivered cross-batch arrival) is dropped: comparing it
            // against the newer stored zone would emit an inverted or
            // duplicate transition. The strict (ts, id) tiebreaker is
            // the batch operator's ordering, so a tied-timestamp fix
            // resolves identically in both forms.
            if (last == null || ts > last.lastTsNs ||
                (ts == last.lastTsNs && id > last.lastId)) {
              if (last != null && last.lastZone != zone)
                out += ZoneTransition(key, ts, id, last.lastZone, zone)
              last = ZoneState(ts, id, zone)
            }
          }
          if (last != null) state.update(last)
          out.result().iterator
      }
  }
}
