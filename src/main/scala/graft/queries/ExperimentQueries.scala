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
/** Experimentation readouts, ops audits, monitors (r8-r9 analytics). Split out of the monolithic registry
  * (r9 verdict item 5); every member keeps resolving
  * unqualified through the `Queries.type` self-type. */
private[graft] trait ExperimentQueries { this: Queries.type =>
  // -----------------------------------------------------------------
  // Experimentation readout + data-ops audit family. Shared posture:
  // assignment is a USER property (parity bucket, as q_ab_test/CUPED),
  // per-user value totals accumulate as DECIMAL(18,2) (exact, order-
  // independent), and every test statistic is built from exact integer
  // /decimal aggregates with the double ops confined to one final,
  // shape-identical expression on both engines.
  // -----------------------------------------------------------------

  /** Sample-ratio mismatch: the audit an experimentation platform runs
   *  BEFORE reading any metric — do assignment counts match the
   *  designed 50/50 split? Chi-square contribution per variant over
   *  DISTINCT users (event volume must not bias an assignment test).
   *  Integer counts; `expected` is n/2, a half-integer, exact in
   *  binary, so the 1-dp round never sits on a boundary. */
  private[graft] def srmCheckQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events(s, dir).select(col("user_id")).distinct()
      .withColumn("variant",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy(col("variant")).agg(count(lit(1)).as("n_users"))
      .withColumn("_n", sum(col("n_users")).over(Window.partitionBy()))
      .select(col("variant"), col("n_users"),
        round(col("_n") * lit(5e-1), 1).as("expected"),
        round(pow(col("n_users") - col("_n") * lit(5e-1), 2) /
          (col("_n") * lit(5e-1)), 6).as("chi2_term"))
  }

  private[graft] val srmCheckOracle =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    count(*) AS n_users
      |  FROM u GROUP BY 1)
      |SELECT variant, n_users,
      |  round(sum(n_users) OVER () * 5e-1, 1) AS expected,
      |  round(pow(n_users - sum(n_users) OVER () * 5e-1, 2) /
      |    (sum(n_users) OVER () * 5e-1), 6) AS chi2_term
      |FROM v""".stripMargin

  /** Mann–Whitney U (rank-sum, tie-corrected) between the two
   *  assignment buckets on per-user total value — the nonparametric
   *  readout heavy-tailed metrics fall back to. Everything before the
   *  final z is EXACT: midranks enter doubled (2·midrank = 2·cum−n+1,
   *  an integer) so the tie-averaged rank-sum accumulates as
   *  DECIMAL(38,0) — never a reorderable double sum, never a LONG
   *  overflow at population scale (cum ~ 1e10 users squares past 2^63)
   *  — and the tie term Σ(t³−t) is cubed in decimal for the same
   *  reason. The cumulative walk runs over DISTINCT metric values
   *  (the percentile family's documented bound), not rows. */
  private[graft] def mannWhitneyQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("metric"))
      .withColumn("is_a", when(col("user_id") % 2 === 0, 1L).otherwise(0L))
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("is_a")).as("n_a"))
    val wv = Window.orderBy(col("metric"))
    val agg = byVal
      .withColumn("cum", sum(col("n")).over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(
        sum(col("n_a")).as("na"),
        sum(col("n") - col("n_a")).as("nb"),
        // cast BEFORE the multiply: n_a·(2·cum−n+1) ~ 2e19 at a 1e10-user
        // tied block — a LONG product would wrap before any cast saved it
        sum(col("n_a").cast("decimal(38,0)") *
          (lit(2L) * col("cum") - col("n") + 1)).as("r2a"),
        sum((col("n").cast("decimal(38,0)") * col("n") * col("n") - col("n"))
          .cast("decimal(38,0)")).as("ties3"))
    val naD = col("na").cast("decimal(38,0)")
    val u2 = col("r2a") - naD * (col("na") + lit(1L))
    val n = col("na") + col("nb")
    agg.select(
      col("na").as("n_a"), col("nb").as("n_b"),
      round(u2.cast("double") * lit(5e-1), 1).as("u_stat"),
      round((u2 - naD * col("nb")).cast("double") * lit(5e-1) /
        sqrt(col("na").cast("double") * col("nb") / lit(12e0) *
          ((n + 1) - col("ties3").cast("double") /
            (n.cast("double") * (n - 1)))), 6).as("z"))
  }

  private[graft] val mannWhitneyOracle =
    """WITH pu AS (
      |  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS metric,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
      |  FROM events GROUP BY 1),
      |bv AS (
      |  SELECT metric, count(*) AS n, sum(is_a) AS n_a FROM pu GROUP BY 1),
      |r AS (
      |  SELECT *, sum(n) OVER (ORDER BY metric
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM bv),
      |a AS (
      |  SELECT sum(n_a) AS na, sum(n - n_a) AS nb,
      |    sum(CAST(n_a AS HUGEINT) * (2 * cum - n + 1)) AS r2a,
      |    sum(CAST(n AS HUGEINT) * n * n - n) AS ties3
      |  FROM r)
      |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  round(CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) * 5e-1, 1)
      |    AS u_stat,
      |  round(CAST(r2a - CAST(na AS HUGEINT) * (na + 1)
      |      - CAST(na AS HUGEINT) * nb AS DOUBLE) * 5e-1 /
      |    sqrt(CAST(na AS DOUBLE) * nb / 12e0 *
      |      ((na + nb + 1) - CAST(ties3 AS DOUBLE) /
      |        (CAST(na + nb AS DOUBLE) * (na + nb - 1)))), 6) AS z
      |FROM a""".stripMargin

  /** Winsorized mean per event type, capped at the empirical 5th/95th
   *  percentile VALUES (type-1 quantiles — actual data points picked by
   *  integer rank comparison 20·cum ≥ n / 20·cum ≥ 19·n, never an
   *  interpolated double). Clamped values therefore stay DECIMAL(18,2)
   *  and the mean's numerator sums exactly; the distinct-value
   *  cumulative frame is per-type (the percentile family's bound). */
  private[graft] def winsorizedMeanQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, dir)
      .select(col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val wv = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val bounds = e.groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ntot",
        sum(col("n")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") * 20 >= col("ntot"), col("v"))).as("lo"),
        min(when(col("cum") * 20 >= col("ntot") * 19, col("v"))).as("hi"))
    e.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_type"),
        greatest(least(col("v"), col("hi")), col("lo")).as("w"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // caps cast to DOUBLE for the output: engines render decimal
        // scale differently ('2.50' vs '2.5'); the double is exact
        min(col("w")).cast("double").as("p05_cap"),
        max(col("w")).cast("double").as("p95_cap"),
        round(sum(col("w")).cast("double") / count(lit(1)), 6)
          .as("winsorized_mean"))
  }

  private[graft] val winsorizedMeanOracle =
    """WITH e AS (
      |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events),
      |c AS (
      |  SELECT event_type, v, count(*) AS n FROM e GROUP BY 1, 2),
      |r AS (
      |  SELECT *, sum(n) OVER (PARTITION BY event_type ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(n) OVER (PARTITION BY event_type) AS ntot
      |  FROM c),
      |b AS (
      |  SELECT event_type,
      |    min(CASE WHEN cum * 20 >= ntot THEN v END) AS lo,
      |    min(CASE WHEN cum * 20 >= ntot * 19 THEN v END) AS hi
      |  FROM r GROUP BY 1),
      |w AS (
      |  SELECT e.event_type, greatest(least(v, hi), lo) AS w
      |  FROM e JOIN b ON e.event_type = b.event_type)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(min(w) AS DOUBLE) AS p05_cap,
      |  CAST(max(w) AS DOUBLE) AS p95_cap,
      |  round(CAST(sum(w) AS DOUBLE) / count(*), 6) AS winsorized_mean
      |FROM w GROUP BY 1""".stripMargin

  /** Delta-method confidence interval for a RATIO metric (revenue per
   *  event): the standard error a naive per-user t-test gets wrong,
   *  because both numerator and denominator vary per user. Var(R) ≈
   *  (vx − 2R·cxy + R²·vy) / (n·ȳ²) over per-user (Σvalue, #events)
   *  pairs; per-user numerators are exact decimal sums, the moment
   *  aggregates are the same var_samp/covar_samp surface as q_ab_test. */
  private[graft] def deltaRatioCiQ(s: SparkSession, dir: String): DataFrame = {
    val pu = events(s, dir).groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"),
        count(lit(1)).cast("double").as("y"))
      .withColumn("variant",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
    pu.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        avg(col("x")).as("mx"), avg(col("y")).as("my"),
        var_samp(col("x")).as("vx"), var_samp(col("y")).as("vy"),
        covar_samp(col("x"), col("y")).as("cxy"))
      .withColumn("ratio", col("mx") / col("my"))
      .withColumn("se",
        sqrt((col("vx") - lit(2) * col("ratio") * col("cxy") +
          col("ratio") * col("ratio") * col("vy")) /
          (col("n_users") * col("my") * col("my"))))
      .select(col("variant"), col("n_users"),
        round(col("ratio"), 6).as("ratio"),
        round(col("ratio") - lit(196e-2) * col("se"), 6).as("ci_lo"),
        round(col("ratio") + lit(196e-2) * col("se"), 6).as("ci_hi"))
  }

  private[graft] val deltaRatioCiOracle =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x,
      |    CAST(count(*) AS DOUBLE) AS y,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT variant, count(*) AS n_users, avg(x) AS mx, avg(y) AS my,
      |    var_samp(x) AS vx, var_samp(y) AS vy, covar_samp(x, y) AS cxy
      |  FROM pu GROUP BY 1),
      |d AS (
      |  SELECT *, mx / my AS ratio FROM m),
      |e AS (
      |  SELECT *, sqrt((vx - 2 * ratio * cxy + ratio * ratio * vy) /
      |    (n_users * my * my)) AS se
      |  FROM d)
      |SELECT variant, n_users, round(ratio, 6) AS ratio,
      |  round(ratio - 196e-2 * se, 6) AS ci_lo,
      |  round(ratio + 196e-2 * se, 6) AS ci_hi
      |FROM e""".stripMargin

  /** Deterministic Poisson bootstrap of the per-user revenue mean:
   *  32 replicates whose per-(user, replicate) weight is Poisson(1)
   *  drawn by inverse-CDF over an md5-derived uniform — the portable
   *  md5 family, so engine and oracle draw IDENTICAL weights, and the
   *  thresholds are pre-floored u32 INTEGER constants (no float CDF at
   *  eval time). Weighted sums stay decimal·integer = exact. The spine
   *  is a map-side explode (32×, no shuffle) into a 32-group partial
   *  aggregate — the canonical cluster bootstrap at corpus scale. */
  private[graft] def bootstrapMeanQ(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("x"))
      .select(col("user_id"), col("x"),
        explode(expr("sequence(1, 32)")).as("r"))
      .withColumn("u", expr(
        "graft_md5_prefix_long(concat_ws('|', user_id, r), 8)"))
      .withColumn("w",
        when(col("u") < 1580030168L, 0L)
          .when(col("u") < 3160060337L, 1L)
          .when(col("u") < 3950075421L, 2L)
          .when(col("u") < 4213413783L, 3L)
          .when(col("u") < 4279248373L, 4L)
          .when(col("u") < 4292415291L, 5L)
          .otherwise(6L))
      .groupBy(col("r"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("x") * col("w")).as("wx"))
      .select(col("r"), col("n_eff"),
        round(col("wx").cast("double") / col("n_eff"), 6).as("boot_mean"))
  }

  private[graft] val bootstrapMeanOracle =
    """WITH pu AS (
      |  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS x
      |  FROM events GROUP BY 1),
      |reps AS (
      |  SELECT user_id, x, r,
      |    ('0x' || substr(md5(concat_ws('|', user_id, r)), 1, 8))::BIGINT
      |      AS u
      |  FROM pu, generate_series(1, 32) AS t(r)),
      |w AS (
      |  SELECT r, x,
      |    CASE WHEN u < 1580030168 THEN 0
      |         WHEN u < 3160060337 THEN 1
      |         WHEN u < 3950075421 THEN 2
      |         WHEN u < 4213413783 THEN 3
      |         WHEN u < 4279248373 THEN 4
      |         WHEN u < 4292415291 THEN 5
      |         ELSE 6 END AS w
      |  FROM reps)
      |SELECT CAST(r AS INTEGER) AS r, CAST(sum(w) AS BIGINT) AS n_eff,
      |  round(CAST(sum(x * w) AS DOUBLE) / sum(w), 6) AS boot_mean
      |FROM w GROUP BY 1""".stripMargin

  // ONE definition of the Holt recurrence (α=0.3, β=0.1; l/b seeded
  // from x₁,x₂) in each engine's syntax — q_holt_linear and
  // q_forecast_backtest must score the SAME model, so the seed and
  // update expressions live here, not copied into either query.
  private[graft] val holtSeedL =
    "element_at(vals, 2) * 3e-1 + (element_at(vals, 1) + " +
      "(element_at(vals, 2) - element_at(vals, 1))) * 7e-1"
  private[graft] val holtSeedB =
    s"($holtSeedL - element_at(vals, 1)) * 1e-1 + " +
      "(element_at(vals, 2) - element_at(vals, 1)) * 9e-1"
  private[graft] val holtUpdateL = "x * 3e-1 + (acc.l + acc.b) * 7e-1"
  private[graft] val holtUpdateB =
    s"($holtUpdateL - acc.l) * 1e-1 + acc.b * 9e-1"
  private[graft] val holtSeedLSql =
    "vals[2] * 3e-1 + (vals[1] + (vals[2] - vals[1])) * 7e-1"
  private[graft] val holtSeedBSql =
    s"($holtSeedLSql - vals[1]) * 1e-1 + (vals[2] - vals[1]) * 9e-1"
  private[graft] def holtUpdateLSql(x: String) = s"$x * 3e-1 + (l + b) * 7e-1"
  private[graft] def holtUpdateBSql(x: String) =
    s"(${holtUpdateLSql(x)} - l) * 1e-1 + b * 9e-1"

  /** Holt linear (double-exponential) smoothing of the hourly event
   *  rate per type: level + trend, α=0.3 / β=0.1, seeded l₁=x₁,
   *  b₁=x₂−x₁ and folded left over the sorted hour series — the same
   *  bitwise-reproducible left-fold contract as q_ewma_level (fixed
   *  IEEE op order; the oracle replays the IDENTICAL op sequence via a
   *  recursive CTE). Series length is hours-bounded per type. */
  private[graft] def holtLinearQ(s: SparkSession, dir: String): DataFrame = {
    hourSeries(s, dir)
      .withColumn("vals",
        expr("transform(series, s -> CAST(s.n AS DOUBLE))"))
      .withColumn("h", expr(
        s"""aggregate(slice(vals, 3, greatest(size(vals) - 2, 0)),
          |  named_struct('l', $holtSeedL, 'b', $holtSeedB),
          |  (acc, x) -> named_struct(
          |    'l', $holtUpdateL, 'b', $holtUpdateB))""".stripMargin))
      .select(col("event_type"), col("n_hours"),
        round(col("h.l"), 6).as("holt_level"),
        round(col("h.b"), 6).as("holt_trend"),
        round(col("h.l") + col("h.b"), 6).as("forecast_next"))
  }

  private[graft] val holtLinearOracle =
    s"""WITH RECURSIVE h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, count(*) AS n_hours,
      |    list_transform(list(n ORDER BY hour),
      |      x -> CAST(x AS DOUBLE)) AS vals
      |  FROM h GROUP BY 1),
      |rec AS (
      |  SELECT event_type, n_hours, vals, 2 AS i,
      |    $holtSeedLSql AS l,
      |    $holtSeedBSql AS b
      |  FROM s WHERE n_hours >= 2
      |  UNION ALL
      |  SELECT event_type, n_hours, vals, i + 1,
      |    ${holtUpdateLSql("vals[i + 1]")},
      |    ${holtUpdateBSql("vals[i + 1]")}
      |  FROM rec WHERE i < n_hours)
      |SELECT event_type, n_hours,
      |  round(l, 6) AS holt_level, round(b, 6) AS holt_trend,
      |  round(l + b, 6) AS forecast_next
      |FROM rec WHERE i = n_hours""".stripMargin

  /** Degree distribution of the part co-order graph (the
   *  q_pagerank_parts edge set): per-degree node counts + share — the
   *  first structural read on any entity graph, and the skew evidence
   *  behind hot-key handling choices. Edges stay an equi-self-join on
   *  order key with the same 1-in-7 density bound. */
  /** ONE definition of the co-order part graph (1-in-7 part filter,
    * equi-self-join on order key, a<b undirected edges) shared by the
    * pagerank/degree/jaccard family — the graph definition must not
    * drift between its consumers. */
  private[graft] def coOrderEdges(s: SparkSession, dir: String): DataFrame = {
    val lp = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("pk") % 7 === 0)
      .distinct()
    lp.as("x").join(lp.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
      .distinct()
  }

  /** The SQL face of [[coOrderEdges]], interpolated into each
    * consumer's oracle. */
  private[graft] val coOrderEdgesCteSql =
    """WITH lp AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem WHERE pk % 7 = 0),
      |und AS (
      |  SELECT DISTINCT x.pk AS a, y.pk AS b
      |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.pk < y.pk)""".stripMargin

  private[graft] def degreeDistQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = coOrderEdges(s, dir)
    und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
      .withColumn("share",
        round(col("n_nodes").cast("double") /
          sum(col("n_nodes")).over(Window.partitionBy()), 6))
  }

  private[graft] val degreeDistOracle =
    s"""$coOrderEdgesCteSql,
      |nodes AS (
      |  SELECT a AS node FROM und UNION ALL SELECT b FROM und),
      |deg AS (
      |  SELECT node, count(*) AS deg FROM nodes GROUP BY 1),
      |d AS (
      |  SELECT deg, count(*) AS n_nodes FROM deg GROUP BY 1)
      |SELECT deg, n_nodes,
      |  round(CAST(n_nodes AS DOUBLE) / sum(n_nodes) OVER (), 6) AS share
      |FROM d""".stripMargin

  /** Freshness audit per event type: how far behind the newest data in
   *  the table is each source's latest event, and how long a span it
   *  covers — the staleness dashboard every ingest pipeline runs.
   *  Pure integer nanosecond arithmetic (`div`, the epoch-ns idiom). */
  private[graft] def freshnessAuditQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"), min(col("ts")).as("first_ts"))
      .withColumn("gmax", max(col("last_ts")).over(Window.partitionBy()))
      .select(col("event_type"), col("n_events"),
        expr("(gmax - last_ts) div 1000000000").as("lag_s"),
        expr("(last_ts - first_ts) div 3600000000000").as("span_hours"))
  }

  private[graft] val freshnessAuditOracle =
    """WITH a AS (
      |  SELECT event_type, count(*) AS n_events,
      |    max(epoch_ns(ts)) AS last_ts, min(epoch_ns(ts)) AS first_ts
      |  FROM events GROUP BY 1)
      |SELECT event_type, n_events,
      |  (max(last_ts) OVER () - last_ts) // 1000000000 AS lag_s,
      |  (last_ts - first_ts) // 3600000000000 AS span_hours
      |FROM a""".stripMargin

  /** The hourly count series per event type, sorted-collected — the
    * shared front end of the trend/smoothing family (Holt, Theil–Sen,
    * Mann–Kendall). Series length is hours-bounded per type, so the
    * collected array is time-bounded, not data-bounded. */
  /** Per-(type, hour) event counts — the single definition every
    * trend/smoothing consumer builds on. */
  private[graft] def hourlyCounts(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    events(s, dir)
      .withColumn("hour", expr(s"ts div $hourNs"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
  }

  private[graft] def seriesFromHourly(hourly: DataFrame): DataFrame =
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        expr("sort_array(collect_list(struct(hour, n)))").as("series"))
      .filter(col("n_hours") >= 2)

  private[graft] def hourSeries(s: SparkSession, dir: String): DataFrame =
    seriesFromHourly(hourlyCounts(s, dir))

  /** Classical additive seasonal decomposition of the hourly series per
   *  event type (the moving-average STL ancestor): trend = centered
   *  25-HOUR MA, seasonal = hour-of-day mean of the detrended series
   *  over interior hours, remainder = the rest. The series is DENSIFIED
   *  first — a zero-filled hour spine per type (span-bounded sequence)
   *  — so an absent hour is a 0 observation, not a silently skipped
   *  row that would stretch the ROWS frame past 25 wall-clock hours
   *  (r9 review). ALL intermediate arithmetic is integer-exact at ×25
   *  scale (d25 = 25·n − Σ₂₅n — window sums of BIGINTs), so partial-agg
   *  order can't move a ulp; each output runs a fixed two-op double
   *  sequence both engines share. Windows are per-type ROWS frames
   *  (25-bounded state) and the seasonal join broadcasts a
   *  24·types-row frame. */
  /** The dense interior STL frame (zero-filled spine, 25-hour centered
    * window, ×25-scaled integer detrend) — ONE definition shared by the
    * decomposition and the seasonality-strength readout. */
  private[graft] def stlInterior(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = hourlyCounts(s, dir)
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hour"))
    val dense = spine.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w25 = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-12, 12)
    dense
      .withColumn("trend25", sum(col("n")).over(w25))
      .withColumn("cnt25", count(lit(1)).over(w25))
      .filter(col("cnt25") === 25)
      .withColumn("d25", lit(25) * col("n") - col("trend25"))
  }

  private[graft] def stlDecomposeQ(s: SparkSession, dir: String): DataFrame = {
    val interior = stlInterior(s, dir)
      .localCheckpoint(true) // feeds the seasonal aggregate AND the join
    val seasonal = interior
      .groupBy(col("event_type").as("et2"), (col("hour") % 24).as("hod"))
      .agg((sum(col("d25")).cast("double") / count(lit(1)))
        .as("seasonal25"))
    interior.join(broadcast(seasonal),
        col("event_type") === col("et2") && col("hour") % 24 === col("hod"))
      .select(col("event_type"), col("hour"), col("n"),
        round(col("trend25").cast("double") / lit(25e0), 6).as("trend"),
        round(col("seasonal25") / lit(25e0), 6).as("seasonal"),
        round((col("d25").cast("double") - col("seasonal25")) / lit(25e0), 6)
          .as("remainder"))
  }

  /** The dense-interior CTE chain shared by the two STL oracles —
    * mirrors [[stlInterior]] exactly; ends at the `i` frame. */
  private[graft] val stlInteriorCteSql =
    """h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |sp AS (
      |  SELECT event_type,
      |    unnest(generate_series(min(hour), max(hour))) AS hour
      |  FROM h GROUP BY event_type),
      |d AS (
      |  SELECT sp.event_type, sp.hour,
      |    CAST(coalesce(h.n, 0) AS BIGINT) AS n
      |  FROM sp LEFT JOIN h
      |    ON sp.event_type = h.event_type AND sp.hour = h.hour),
      |w AS (
      |  SELECT event_type, hour, n,
      |    CAST(sum(n) OVER w25 AS BIGINT) AS trend25,
      |    count(*) OVER w25 AS cnt25
      |  FROM d WINDOW w25 AS (PARTITION BY event_type ORDER BY hour
      |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      |i AS (SELECT *, 25 * n - trend25 AS d25 FROM w WHERE cnt25 = 25)""".stripMargin

  private[graft] val stlDecomposeOracle =
    s"""WITH $stlInteriorCteSql,
      |sea AS (
      |  SELECT event_type AS et2, hour % 24 AS hod,
      |    CAST(CAST(sum(d25) AS BIGINT) AS DOUBLE) / count(*) AS seasonal25
      |  FROM i GROUP BY 1, 2)
      |SELECT i.event_type, i.hour, i.n,
      |  round(CAST(trend25 AS DOUBLE) / 25e0, 6) AS trend,
      |  round(seasonal25 / 25e0, 6) AS seasonal,
      |  round((CAST(d25 AS DOUBLE) - seasonal25) / 25e0, 6) AS remainder
      |FROM i JOIN sea ON i.event_type = sea.et2 AND i.hour % 24 = sea.hod""".stripMargin

  /** Seasonality strength (Hyndman's variance-decomposition readout,
   *  max(0, 1 − Var(remainder)/Var(detrended)) per series) over the
   *  shared [[stlInterior]] frame — the one-number answer to "does this
   *  series deserve a seasonal model?". EXACT-moment algebra: Σd25 and
   *  Σd25² are integer sums; Σ(d−s̄_h)² = Σd² − Σ_h s_h²/n_h, whose
   *  ≤24-cell rational terms fold LEFT in hod order (the established
   *  deterministic-fold idiom), so no order-sensitive double
   *  accumulation exists anywhere. Variances report at natural scale
   *  (÷25²); the strength ratio is scale-invariant. */
  private[graft] def seasonalityStrengthQ(s: SparkSession, dir: String): DataFrame = {
    val interior = stlInterior(s, dir)
      .localCheckpoint(true) // feeds the global AND the cell aggregates
    val glob = interior.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_interior"), sum(col("d25")).as("sd"),
        sum(col("d25") * col("d25")).as("sdd"))
    val cells = interior
      .groupBy(col("event_type"), (col("hour") % 24).as("hod"))
      .agg(sum(col("d25")).as("sh"), count(lit(1)).as("nh"))
      .groupBy(col("event_type"))
      .agg(expr(
        """aggregate(sort_array(collect_list(struct(hod, sh, nh))), 0e0,
          |  (acc, x) -> acc + CAST(x.sh AS DOUBLE) * x.sh / x.nh)"""
          .stripMargin).as("ssq"))
    glob.join(cells, Seq("event_type"))
      .withColumn("var_d25",
        (col("sdd").cast("double") -
          col("sd").cast("double") * col("sd") / col("n_interior")) /
          col("n_interior"))
      .withColumn("var_r25",
        (col("sdd").cast("double") - col("ssq")) / col("n_interior"))
      .select(col("event_type"), col("n_interior"),
        round(col("var_d25") / lit(625e0), 6).as("var_detrended"),
        round(col("var_r25") / lit(625e0), 6).as("var_remainder"),
        round(when(col("var_d25") === 0e0, 0e0)
          .otherwise(greatest(lit(0e0),
            lit(1e0) - col("var_r25") / col("var_d25"))), 6)
          .as("seasonal_strength"))
  }

  private[graft] val seasonalityStrengthOracle =
    s"""WITH RECURSIVE $stlInteriorCteSql,
      |g AS (
      |  SELECT event_type, count(*) AS n_interior,
      |    CAST(sum(d25) AS BIGINT) AS sd,
      |    CAST(sum(d25 * d25) AS BIGINT) AS sdd
      |  FROM i GROUP BY 1),
      |cells AS (
      |  SELECT event_type, hour % 24 AS hod,
      |    CAST(sum(d25) AS BIGINT) AS sh, count(*) AS nh
      |  FROM i GROUP BY 1, 2),
      |ord AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |      ORDER BY hod) AS k,
      |    count(*) OVER (PARTITION BY event_type) AS kmax
      |  FROM cells),
      |f AS (
      |  SELECT event_type, k, kmax,
      |    0e0 + CAST(sh AS DOUBLE) * sh / nh AS ssq
      |  FROM ord WHERE k = 1
      |  UNION ALL
      |  SELECT o.event_type, o.k, o.kmax,
      |    f.ssq + CAST(o.sh AS DOUBLE) * o.sh / o.nh
      |  FROM ord o JOIN f ON o.event_type = f.event_type AND o.k = f.k + 1),
      |v AS (
      |  SELECT g.event_type, g.n_interior,
      |    (CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd / n_interior)
      |      / n_interior AS var_d25,
      |    (CAST(sdd AS DOUBLE) - f.ssq) / n_interior AS var_r25
      |  FROM g JOIN f
      |    ON g.event_type = f.event_type AND f.k = f.kmax)
      |SELECT event_type, n_interior,
      |  round(var_d25 / 625e0, 6) AS var_detrended,
      |  round(var_r25 / 625e0, 6) AS var_remainder,
      |  round(CASE WHEN var_d25 = 0e0 THEN 0e0
      |    ELSE greatest(0e0, 1e0 - var_r25 / var_d25) END, 6)
      |    AS seasonal_strength
      |FROM v""".stripMargin

  /** Theil–Sen robust trend, DYADIC-LAG form: the median slope over
   *  pairs (i, i+2^k) of the hourly series — every time scale
   *  represented, n·log₂n pairs instead of the classic n²/2 (whose
   *  array-side fold was 140× super-linear at the 10× bench SF: a
   *  quadratic pair set in ONE task per group). The estimator keeps
   *  the robust-median character (a single outlier hour contributes
   *  ≤2·log₂n of the ~n·log₂n slopes); the pair set is deterministic
   *  and stated identically in the oracle. Slopes are
   *  integer-difference ratios (exact doubles both engines); the
   *  median is two order statistics picked by a distributed rank
   *  window — never a per-group array — interpolated lo + (hi−lo)/2
   *  in EXACTLY DuckDB's quantile_cont op order (odd m: lo == hi, the
   *  +0 is exact). */
  private[graft] def theilSenQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = s
    import sess.implicits._
    val hourly = hourlyCounts(s, dir).localCheckpoint(true)
    val idx = hourly.withColumn("idx", row_number().over(
      Window.partitionBy(col("event_type")).orderBy(col("hour"))))
    val lags = (0 to 29).map(k => 1L << k).toDF("lag")
    val slopes = idx.crossJoin(broadcast(lags))
      .withColumn("idx_b", col("idx") + col("lag"))
      .join(idx.select(col("event_type").as("et_b"), col("idx").as("b_idx"),
          col("hour").as("h_b"), col("n").as("n_b")),
        col("event_type") === col("et_b") && col("idx_b") === col("b_idx"))
      .select(col("event_type"),
        ((col("n_b") - col("n")).cast("double") /
          (col("h_b") - col("hour"))).as("slope"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("slope"))
    val wAll = Window.partitionBy(col("event_type"))
    val med = slopes
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(m + 1) div 2") ||
        col("rn") === expr("m div 2 + 1"))
      .groupBy(col("event_type"))
      .agg(max(col("m")).as("n_pairs"),
        min(col("slope")).as("lo"), max(col("slope")).as("hi"))
    hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n_hours"))
      .filter(col("n_hours") >= 2)
      .join(med, Seq("event_type"))
      .select(col("event_type"), col("n_hours"), col("n_pairs"),
        round(col("lo") + (col("hi") - col("lo")) * lit(5e-1), 6)
          .as("theil_slope"))
  }

  private[graft] val theilSenOracle =
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |i AS (
      |  SELECT event_type, hour, n,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hour) AS idx
      |  FROM h),
      |s AS (
      |  SELECT event_type, count(*) AS n_hours FROM h GROUP BY 1),
      |lags AS (
      |  SELECT (CAST(1 AS BIGINT) << g) AS lag
      |  FROM generate_series(0, 29) t(g)),
      |p AS (
      |  SELECT a.event_type,
      |    CAST(b.n - a.n AS DOUBLE) / (b.hour - a.hour) AS slope
      |  FROM i a JOIN lags ON TRUE JOIN i b
      |    ON b.event_type = a.event_type AND b.idx = a.idx + lags.lag)
      |SELECT s.event_type, s.n_hours, count(*) AS n_pairs,
      |  round(median(slope), 6) AS theil_slope
      |FROM p JOIN s ON p.event_type = s.event_type
      |WHERE s.n_hours >= 2
      |GROUP BY 1, 2""".stripMargin

  /** Mann–Kendall trend test (tie-corrected, continuity-corrected):
   *  S = Σ sign over ordered pairs — EXACT integer arithmetic end to
   *  end (the tie term Σt(t−1)(2t+5) comes from a value-grouped
   *  aggregate, not a pair walk) — with the one double op being the
   *  final z division. S comes from [[graft.ext.Stats.signedPairSum]]:
   *  the chunked inversion-count decomposition, never an O(n²) array
   *  fold in one task (the r9 form was 100× super-linear at the 10×
   *  bench SF; the pairwise oracle and ExperimentSpec's direct pair
   *  walk pin the two formulations equal). The nonparametric partner
   *  to q_theil_sen over the same hours-bounded series. */
  private[graft] def mannKendallQ(s: SparkSession, dir: String): DataFrame = {
    // one checkpointed hourly aggregate feeds the tie term, the hour
    // count, AND the pair-sign sum — without it Spark would
    // scan+aggregate events three times
    val hourly = hourlyCounts(s, dir).localCheckpoint(true)
    val ties = hourly.groupBy(col("event_type"), col("n"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
        .as("tie3"))
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"))
      .filter(col("n_hours") >= 2)
      .join(graft.ext.Stats.signedPairSum(hourly, "event_type", "hour", "n"),
        Seq("event_type"))
      .join(broadcast(ties), Seq("event_type"))
      .withColumn("var18",
        (col("n_hours") * (col("n_hours") - 1) *
          (lit(2L) * col("n_hours") + 5) - col("tie3")).cast("double") /
          lit(18e0))
      .select(col("event_type"), col("n_hours"), col("s_stat"),
        round(
          when(col("s_stat") > 0,
            (col("s_stat") - 1).cast("double") / sqrt(col("var18")))
            .when(col("s_stat") < 0,
              (col("s_stat") + 1).cast("double") / sqrt(col("var18")))
            .otherwise(lit(0e0)), 6).as("z"))
  }

  private[graft] val mannKendallOracle =
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, count(*) AS n_hours FROM h GROUP BY 1),
      |pairs AS (
      |  SELECT a.event_type,
      |    CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END
      |      AS sgn
      |  FROM h a JOIN h b
      |    ON a.event_type = b.event_type AND b.hour > a.hour),
      |st AS (
      |  SELECT event_type, sum(sgn) AS s_stat FROM pairs GROUP BY 1),
      |tie AS (
      |  SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) AS tie3
      |  FROM (SELECT event_type, n, count(*) AS t FROM h GROUP BY 1, 2)
      |  GROUP BY 1),
      |v AS (
      |  SELECT s.event_type, s.n_hours, st.s_stat,
      |    CAST(s.n_hours * (s.n_hours - 1) * (2 * s.n_hours + 5) - tie.tie3
      |      AS DOUBLE) / 18e0 AS var18
      |  FROM s JOIN st ON s.event_type = st.event_type
      |  JOIN tie ON s.event_type = tie.event_type
      |  WHERE s.n_hours >= 2)
      |SELECT event_type, n_hours, CAST(s_stat AS BIGINT) AS s_stat,
      |  round(CASE WHEN s_stat > 0
      |      THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var18)
      |    WHEN s_stat < 0
      |      THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var18)
      |    ELSE 0e0 END, 6) AS z
      |FROM v""".stripMargin

  /** Neighbor-Jaccard node similarity over the co-order part graph
   *  (the q_pagerank_parts edge set): top-20 part pairs by
   *  |N∩|/|N∪| — the link-prediction baseline. Common-neighbor counts
   *  come from a WEDGE equi-join through the shared neighbor (bounded
   *  by the order-size-bounded degree, never pairwise over nodes);
   *  the limit is deterministic under the (jaccard DESC, a, b) total
   *  order and plans as TakeOrderedAndProject. */
  private[graft] def nodeJaccardQ(s: SparkSession, dir: String): DataFrame = {
    val und = coOrderEdges(s, dir)
      .localCheckpoint(true) // feeds directed edges twice + wedge join
    // loud scale guard (r13 verdict item 5): the wedge join's candidate
    // volume is Σ deg² — quadratic per hub. sf10's 2.45M edges complete
    // inside the linear ladder budget; the sf100 probe family's measured
    // past-bound failure mode is a filled disk, so past 10M edges this
    // instrument fails loudly (count is free — und is materialized).
    val nEdges = und.count()
    require(nEdges <= 10000000L,
      s"node-Jaccard wedge join over $nEdges edges exceeds the documented " +
        "bound (10M): candidate volume is sum(deg^2) — sample the edge " +
        "list or use degree-capped blocking at this scale")
    val dir2 = und.unionByName(und.select(col("b").as("a"), col("a").as("b")))
    val deg = dir2.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    val common = dir2.as("e1").join(dir2.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .groupBy(col("e1.b").as("pa"), col("e2.b").as("pb"))
      .agg(count(lit(1)).as("common_cnt"))
    common
      .join(deg.select(col("node"), col("deg").as("deg_a")),
        col("pa") === col("node")).drop("node")
      .join(deg.select(col("node"), col("deg").as("deg_b")),
        col("pb") === col("node")).drop("node")
      .withColumn("jaccard",
        round(col("common_cnt").cast("double") /
          (col("deg_a") + col("deg_b") - col("common_cnt")), 6))
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("common_cnt"), col("deg_a"), col("deg_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  private[graft] val nodeJaccardOracle =
    s"""$coOrderEdgesCteSql,
      |dir2 AS (
      |  SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
      |deg AS (
      |  SELECT a AS node, count(*) AS deg FROM dir2 GROUP BY 1),
      |common AS (
      |  SELECT e1.b AS pa, e2.b AS pb, count(*) AS common_cnt
      |  FROM dir2 e1 JOIN dir2 e2 ON e1.a = e2.a AND e1.b < e2.b
      |  GROUP BY 1, 2)
      |SELECT pa AS part_a, pb AS part_b, common_cnt,
      |  da.deg AS deg_a, db.deg AS deg_b,
      |  round(CAST(common_cnt AS DOUBLE) /
      |    (da.deg + db.deg - common_cnt), 6) AS jaccard
      |FROM common
      |JOIN deg da ON pa = da.node
      |JOIN deg db ON pb = db.node
      |ORDER BY jaccard DESC, part_a, part_b
      |LIMIT 20""".stripMargin

  /** Cohen's d / Hedges' g effect size between the assignment buckets
   *  on per-user total value: the magnitude readout a bare t-stat
   *  (q_ab_test) doesn't give. Pooled-variance denominator; the same
   *  exact-decimal per-user sums and moment surface as the rest of the
   *  experimentation family. */
  /** Per-variant per-user value moments (n, mean, var_samp) crossJoined
    * to ONE (A, B) row — the shared front end of the effect-size and
    * sizing readouts (two copies of this pipeline would silently
    * drift, and each would scan events again). */
  private[graft] def variantMoments(s: SparkSession, dir: String): DataFrame = {
    val g = events(s, dir).groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"))
      .withColumn("grp",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), avg(col("x")).as("m"),
        var_samp(col("x")).as("v"))
      .localCheckpoint(true) // feeds both branches: scan+agg runs once
    val a = g.filter(col("grp") === "A")
      .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"))
    val b = g.filter(col("grp") === "B")
      .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"))
    a.crossJoin(b)
  }

  /** The SQL face of [[variantMoments]]. */
  private[graft] val variantMomentsCteSql =
    """WITH g AS (
      |  SELECT grp, count(*) AS n, avg(x) AS m, var_samp(x) AS v
      |  FROM (
      |    SELECT user_id,
      |      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x,
      |      CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp
      |    FROM events GROUP BY 1)
      |  GROUP BY 1),
      |a AS (SELECT n AS n_a, m AS m_a, v AS v_a FROM g WHERE grp = 'A'),
      |b AS (SELECT n AS n_b, m AS m_b, v AS v_b FROM g WHERE grp = 'B')""".stripMargin

  private[graft] def cohenDQ(s: SparkSession, dir: String): DataFrame = {
    variantMoments(s, dir)
      .withColumn("sp", sqrt(
        ((col("n_a") - 1) * col("v_a") + (col("n_b") - 1) * col("v_b")) /
          (col("n_a") + col("n_b") - 2)))
      .withColumn("d", (col("m_a") - col("m_b")) / col("sp"))
      .select(col("n_a"), col("n_b"),
        round(col("d"), 6).as("cohen_d"),
        round(col("d") * (lit(1) - lit(3e0) /
          (lit(4L) * (col("n_a") + col("n_b")) - 9)), 6).as("hedges_g"))
  }

  private[graft] val cohenDOracle =
    s"""$variantMomentsCteSql,
      |d AS (
      |  SELECT n_a, n_b, m_a, m_b,
      |    sqrt(((n_a - 1) * v_a + (n_b - 1) * v_b) / (n_a + n_b - 2)) AS sp
      |  FROM a CROSS JOIN b)
      |SELECT n_a, n_b,
      |  round((m_a - m_b) / sp, 6) AS cohen_d,
      |  round((m_a - m_b) / sp *
      |    (1 - 3e0 / (4 * (n_a + n_b) - 9)), 6) AS hedges_g
      |FROM d""".stripMargin

  /** Minimum detectable effect at α=0.05 / power 0.8 given the
   *  OBSERVED arm sizes and variances — the pre-readout sizing check:
   *  (z_{0.975} + z_{0.8})·se in absolute terms and relative to the
   *  weighted pooled mean. Normal-approximation constants as exact
   *  e-notation literals on both engines. */
  private[graft] def powerMdeQ(s: SparkSession, dir: String): DataFrame = {
    variantMoments(s, dir)
      .withColumn("se", sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")))
      .withColumn("mde_abs", (lit(196e-2) + lit(8416212336e-10)) * col("se"))
      .withColumn("pooled_mean",
        (col("m_a") * col("n_a") + col("m_b") * col("n_b")) /
          (col("n_a") + col("n_b")))
      .select(col("n_a"), col("n_b"),
        round(col("se"), 6).as("se"),
        round(col("mde_abs"), 6).as("mde_abs"),
        round(col("mde_abs") / col("pooled_mean"), 6).as("mde_rel"))
  }

  private[graft] val powerMdeOracle =
    s"""$variantMomentsCteSql,
      |d AS (
      |  SELECT n_a, n_b, m_a, m_b,
      |    sqrt(v_a / n_a + v_b / n_b) AS se
      |  FROM a CROSS JOIN b),
      |e AS (
      |  SELECT *, (196e-2 + 8416212336e-10) * se AS mde_abs,
      |    (m_a * n_a + m_b * n_b) / (n_a + n_b) AS pooled_mean
      |  FROM d)
      |SELECT n_a, n_b, round(se, 6) AS se,
      |  round(mde_abs, 6) AS mde_abs,
      |  round(mde_abs / pooled_mean, 6) AS mde_rel
      |FROM e""".stripMargin

  /** Session-duration deciles through the SCALABLE exact-quantile path
   *  (histogram-guided selection, `ext/Stats` — state bounded by
   *  bins/localLimit, never by distinct durations): the latency-style
   *  readout of the 30-minute sessionization. Durations are integer
   *  seconds; the R-7 interpolation matches quantile_cont exactly. */
  private[graft] def sessionDecilesQ(s: SparkSession, dir: String): DataFrame = {
    val durs = sessionizedEvents(s, dir)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(expr("(max(ts) - min(ts)) div 1000000000").as("dur_s"))
    val fracs = (1 to 9).map(_ / 10.0)
    val qs = graft.ext.Stats.exactQuantilesScalable(durs, "dur_s", fracs)
    import s.implicits._
    fracs.indices.map(i => ((i + 1) * 10L, qs(i)))
      .toDF("decile", "dur_s")
      .select(col("decile"), round(col("dur_s"), 4).as("dur_s"))
  }

  private[graft] val sessionDecilesOracle =
    s"""$sessionizedCteSql,
      |d AS (
      |  SELECT user_id, session_seq,
      |    (max(tns) - min(tns)) // 1000000000 AS dur_s
      |  FROM g GROUP BY 1, 2),
      |q AS (
      |  SELECT quantile_cont(dur_s,
      |    [1e-1, 2e-1, 3e-1, 4e-1, 5e-1, 6e-1, 7e-1, 8e-1, 9e-1]) AS qs
      |  FROM d)
      |SELECT CAST(10 * i AS BIGINT) AS decile,
      |  round(qs[i], 4) AS dur_s
      |FROM q, generate_series(1, 9) AS t(i)""".stripMargin

  /** Gini coefficient of customer revenue concentration — EXACT:
   *  revenue in integer cents, the sorted index from the range-exchange
   *  global rank (`ext/Ranking.withGlobalRank` — no single-partition
   *  window; ties ordered by customer, which leaves Σi·x invariant
   *  within a tied block), and both Σi·x and Σx accumulated as
   *  DECIMAL(38,0) (i·x ~ 1e19 at population scale overflows LONG).
   *  One double division at the end: G = (2Σi·x − (n+1)Σx)/(nΣx). */
  private[graft] def giniRevenueQ(s: SparkSession, dir: String): DataFrame = {
    val rev = s.read.parquet(t(dir, "orders"))
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("cents"))
    val ranked = graft.ext.Ranking.withGlobalRank(rev, "i",
      col("cents"), col("o_custkey"))
    ranked.agg(
        count(lit(1)).as("n_customers"),
        sum(col("cents").cast("decimal(38,0)")).as("sx"),
        sum((col("i").cast("decimal(38,0)") * col("cents")))
          .as("s1"))
      .select(col("n_customers"),
        round((lit(2).cast("decimal(38,0)") * col("s1") -
            (col("n_customers") + 1).cast("decimal(38,0)") * col("sx"))
            .cast("double") /
          (col("n_customers").cast("decimal(38,0)") * col("sx"))
            .cast("double"), 6).as("gini"))
  }

  private[graft] val giniRevenueOracle =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS cents
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT cents,
      |    row_number() OVER (ORDER BY cents, o_custkey) AS i
      |  FROM rev),
      |a AS (
      |  SELECT count(*) AS n_customers,
      |    sum(CAST(cents AS HUGEINT)) AS sx,
      |    sum(CAST(i AS HUGEINT) * cents) AS s1
      |  FROM r)
      |SELECT n_customers,
      |  round(CAST(2 * s1 - (n_customers + 1) * sx AS DOUBLE) /
      |    CAST(CAST(n_customers AS HUGEINT) * sx AS DOUBLE), 6) AS gini
      |FROM a""".stripMargin

  /** Sequential pattern support ("A followed by B", any gap): the
   *  share of users with SOME occurrence of A before SOME occurrence
   *  of B — the funnel-mining primitive q_event_transitions (adjacent
   *  only) can't answer. Per-user (type, min ts, max ts) spans make
   *  the existence test `min_ts(A) < max_ts(B)` exact, and the
   *  per-user self-join is type-bounded (≤T² rows/user), one
   *  user-keyed shuffle. */
  private[graft] def seqPatternSupportQ(s: SparkSession, dir: String): DataFrame = {
    val spans = events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    val nUsers = spans.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("_n"))
    spans.as("a").join(spans.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") =!= col("b.event_type") &&
          col("a.mn") < col("b.mx"))
      .groupBy(col("a.event_type").as("antecedent"),
        col("b.event_type").as("consequent"))
      .agg(count(lit(1)).as("n_users_support"))
      .crossJoin(broadcast(nUsers))
      .select(col("antecedent"), col("consequent"), col("n_users_support"),
        round(col("n_users_support").cast("double") / col("_n"), 6)
          .as("support"))
  }

  private[graft] val seqPatternSupportOracle =
    """WITH spans AS (
      |  SELECT user_id, event_type,
      |    min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT count(DISTINCT user_id) AS _n FROM spans),
      |p AS (
      |  SELECT a.event_type AS antecedent, b.event_type AS consequent,
      |    count(*) AS n_users_support
      |  FROM spans a JOIN spans b
      |    ON a.user_id = b.user_id AND a.event_type <> b.event_type
      |      AND a.mn < b.mx
      |  GROUP BY 1, 2)
      |SELECT antecedent, consequent, n_users_support,
      |  round(CAST(n_users_support AS DOUBLE) / _n, 6) AS support
      |FROM p, n""".stripMargin

  /** Kaplan–Meier survival curve for view→purchase conversion, hour
   *  buckets: S(h) = Π_{h'≤h} (1 − d/at-risk), users without a
   *  purchase right-censored at the observation end. The product folds
   *  LEFT over the hours-bounded ascending bucket array (the
   *  q_ewma_level bitwise-reproducible contract; the oracle replays
   *  the identical op sequence in a recursive CTE). at-risk counts are
   *  exact integers; purchase-before-view users are excluded as
   *  ambiguous exposure on both sides. */
  private[graft] def survivalCurveQ(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    val e = events(s, dir)
    val perUser = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("fv"),
        min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
    val base = perUser
      .filter(col("fv").isNotNull)
      .filter(col("fp").isNull || col("fp") >= col("fv"))
      .crossJoin(broadcast(e.agg(max(col("ts")).as("gm"))))
      .withColumn("h",
        when(col("fp").isNotNull, expr(s"(fp - fv) div $hourNs"))
          .otherwise(expr(s"(gm - fv) div $hourNs")))
      .withColumn("d", when(col("fp").isNotNull, 1L).otherwise(0L))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("h"))
    val idx = base.groupBy(col("h"))
      .agg(sum(col("d")).as("d"), count(lit(1)).as("tot"))
      // hour-bucket frame: bounded by the observation window, so the
      // unpartitioned window ranges over hours, never users
      .withColumn("cumprev", coalesce(sum(col("tot")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("tot")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("n_at_risk", col("n") - col("cumprev"))
      .withColumn("factor",
        lit(1e0) - col("d").cast("double") / col("n_at_risk"))
    idx.agg(expr(
        "sort_array(collect_list(struct(h, n_at_risk, d, tot, factor)))")
        .as("arr"))
      // an all-censored/no-view input leaves arr empty, and Spark's
      // sequence(1, 0) is DESCENDING [1, 0] — drop the row, matching
      // the oracle's zero-row result (the sequence-trap memo)
      .filter(size(col("arr")) > 0)
      .select(explode(expr(
        """transform(sequence(1, size(arr)), k -> named_struct(
          |  'h', arr[k - 1].h,
          |  'n_at_risk', arr[k - 1].n_at_risk,
          |  'd_converted', arr[k - 1].d,
          |  'censored', arr[k - 1].tot - arr[k - 1].d,
          |  'survival', aggregate(slice(transform(arr, e -> e.factor),
          |    1, k), 1e0, (acc, f) -> acc * f)))""".stripMargin))
        .as("r"))
      .select(col("r.h").as("h"), col("r.n_at_risk"),
        col("r.d_converted"), col("r.censored"),
        round(col("r.survival"), 6).as("survival"))
  }

  private[graft] val survivalCurveOracle =
    """WITH RECURSIVE pu AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS fv,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
      |      AS fp
      |  FROM events GROUP BY 1),
      |g AS (SELECT max(epoch_ns(ts)) AS gm FROM events),
      |base AS (
      |  SELECT CASE WHEN fp IS NOT NULL
      |      THEN (fp - fv) // 3600000000000
      |      ELSE (gm - fv) // 3600000000000 END AS h,
      |    CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS d
      |  FROM pu, g
      |  WHERE fv IS NOT NULL AND (fp IS NULL OR fp >= fv)),
      |bk AS (
      |  SELECT h, sum(d) AS d, count(*) AS tot FROM base GROUP BY 1),
      |idx AS (
      |  SELECT h, d, tot,
      |    row_number() OVER (ORDER BY h) AS k,
      |    sum(tot) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING) AS cumprev,
      |    (SELECT sum(tot) FROM bk) AS n
      |  FROM bk),
      |km AS (
      |  SELECT k, h, d, tot, n - COALESCE(cumprev, 0) AS n_at_risk,
      |    1e0 * (1e0 - CAST(d AS DOUBLE) / (n - COALESCE(cumprev, 0)))
      |      AS s
      |  FROM idx WHERE k = 1
      |  UNION ALL
      |  SELECT i.k, i.h, i.d, i.tot, i.n - COALESCE(i.cumprev, 0),
      |    km.s * (1e0 - CAST(i.d AS DOUBLE) /
      |      (i.n - COALESCE(i.cumprev, 0)))
      |  FROM idx i JOIN km ON i.k = km.k + 1)
      |SELECT h, CAST(n_at_risk AS BIGINT) AS n_at_risk,
      |  CAST(d AS BIGINT) AS d_converted,
      |  CAST(tot - d AS BIGINT) AS censored,
      |  round(s, 6) AS survival
      |FROM km""".stripMargin

  /** Join-key skew audit — the profiling pass that decides salting /
   *  AQE-skew settings BEFORE a 100 TB join is launched: per candidate
   *  key column, distinct-key count, the heaviest key's share, and the
   *  max/avg multiplicity ratio. One aggregate per key column (the
   *  per-key counts), then a tiny roll-up; integer counts with two
   *  final double divisions. */
  private[graft] def keySkewAuditQ(s: SparkSession, dir: String): DataFrame = {
    def audit(table: String, df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_rows"))
        .select(lit(s"$table.$key").as("key_col"),
          col("n_keys"), col("n_rows"), col("max_rows"),
          round(col("max_rows").cast("double") / col("n_rows"), 6)
            .as("max_share"),
          round(col("max_rows").cast("double") /
            (col("n_rows").cast("double") / col("n_keys")), 6)
            .as("skew_ratio"))
    audit("orders", s.read.parquet(t(dir, "orders")), "o_custkey")
      .unionByName(
        audit("lineitem", s.read.parquet(t(dir, "lineitem")), "l_partkey"))
      .unionByName(
        audit("lineitem", s.read.parquet(t(dir, "lineitem")), "l_suppkey"))
      .unionByName(audit("events", events(s, dir), "user_id"))
  }

  private[graft] val keySkewAuditOracle =
    """WITH a AS (
      |  SELECT 'orders.o_custkey' AS key_col, count(*) AS c
      |  FROM orders GROUP BY o_custkey),
      |b AS (
      |  SELECT 'lineitem.l_partkey' AS key_col, count(*) AS c
      |  FROM lineitem GROUP BY l_partkey),
      |c AS (
      |  SELECT 'lineitem.l_suppkey' AS key_col, count(*) AS c
      |  FROM lineitem GROUP BY l_suppkey),
      |d AS (
      |  SELECT 'events.user_id' AS key_col, count(*) AS c
      |  FROM events GROUP BY user_id),
      |u AS (
      |  SELECT * FROM a UNION ALL SELECT * FROM b
      |  UNION ALL SELECT * FROM c UNION ALL SELECT * FROM d)
      |SELECT key_col, count(*) AS n_keys,
      |  CAST(sum(c) AS BIGINT) AS n_rows,
      |  max(c) AS max_rows,
      |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS max_share,
      |  round(CAST(max(c) AS DOUBLE) /
      |    (CAST(sum(c) AS DOUBLE) / count(*)), 6) AS skew_ratio
      |FROM u GROUP BY 1""".stripMargin

  /** Shuffle-partition balance audit: route events by the PORTABLE
   *  md5 hash of the key into 32 buckets (the md5 family — an engine-
   *  neutral stand-in for the partitioner, since Spark's Murmur3 has
   *  no DuckDB mirror) and report the imbalance a 32-way exchange on
   *  user_id would see: per-bucket rows, max/avg ratio and the χ²
   *  statistic vs uniform. */
  private[graft] def partitionBalanceQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events(s, dir)
      .withColumn("bucket", expr(
        "graft_md5_prefix_long(concat('pb:', user_id), 8) % 32"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
      .withColumn("_tot", sum(col("n_rows")).over(Window.partitionBy()))
      .select(col("bucket"), col("n_rows"),
        round(col("n_rows").cast("double") /
          (col("_tot").cast("double") / 32), 6).as("load_factor"),
        round(pow(col("n_rows") - col("_tot").cast("double") / 32, 2) /
          (col("_tot").cast("double") / 32), 6).as("chi2_term"))
  }

  private[graft] val partitionBalanceOracle =
    """WITH b AS (
      |  SELECT CAST(('0x' || substr(md5('pb:' || user_id), 1, 8))::BIGINT
      |      % 32 AS BIGINT) AS bucket,
      |    count(*) AS n_rows
      |  FROM events GROUP BY 1)
      |SELECT bucket, n_rows,
      |  round(CAST(n_rows AS DOUBLE) /
      |    (CAST(sum(n_rows) OVER () AS DOUBLE) / 32), 6) AS load_factor,
      |  round(pow(n_rows - CAST(sum(n_rows) OVER () AS DOUBLE) / 32, 2) /
      |    (CAST(sum(n_rows) OVER () AS DOUBLE) / 32), 6) AS chi2_term
      |FROM b""".stripMargin

  /** Near-duplicate cluster-size histogram: the curation report read
   *  off q_dedup_components' connected components (how much of the
   *  corpus sits in 2-doc pairs vs giant clusters — the number that
   *  picks the dedup policy). Reuses the components computation and
   *  wraps its recursive-CTE oracle as a subquery. */
  private[graft] def dedupClusterSizesQ(s: SparkSession, dir: String): DataFrame =
    all("q_dedup_components")(s, dir)
      .groupBy(col("canonical_id")).agg(count(lit(1)).as("n_docs"))
      .groupBy(col("n_docs")).agg(count(lit(1)).as("n_clusters"))

  private[graft] lazy val dedupClusterSizesOracle =
    s"""SELECT n_docs, count(*) AS n_clusters FROM (
      |  SELECT canonical_id, count(*) AS n_docs FROM (
      |${dedupComponentsOracle}
      |  ) comp GROUP BY 1) sized
      |GROUP BY 1""".stripMargin

  /** §2.8 widening: stateful streaming EWMA rate alerts — batch face of
   *  [[graft.streaming.EventAnalytics.rateAlerts]] (the SAME
   *  flatMapGroupsWithState code runs on the static frame); streaming
   *  equality incl. cross-micro-batch state carry is asserted in
   *  EventAnalyticsSpec. Emits hours 2..m−1 per series (first seeds the
   *  level, last never closes). */
  private[graft] def streamingRateAlertsQ(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.rateAlerts(events(s, dir))
      .toDF()
      .select(col("event_type"), col("hour"), col("n"),
        round(col("level_before"), 6).as("level_before"),
        round(col("ratio"), 6).as("ratio"))

  private[graft] val streamingRateAlertsOracle =
    """WITH RECURSIVE h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, hour, n,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hour) AS k,
      |    count(*) OVER (PARTITION BY event_type) AS m
      |  FROM h),
      |rec AS (
      |  SELECT event_type, k, CAST(n AS DOUBLE) AS level
      |  FROM s WHERE k = 1
      |  UNION ALL
      |  SELECT s.event_type, s.k,
      |    rec.level * 7e-1 + CAST(s.n AS DOUBLE) * 3e-1
      |  FROM s JOIN rec
      |    ON s.event_type = rec.event_type AND s.k = rec.k + 1)
      |SELECT s.event_type, s.hour, s.n,
      |  round(rec.level, 6) AS level_before,
      |  round(CAST(s.n AS DOUBLE) / rec.level, 6) AS ratio
      |FROM s JOIN rec
      |  ON s.event_type = rec.event_type AND s.k = rec.k + 1
      |WHERE s.k < s.m""".stripMargin

  /** The LIVE face of the daily-peeking monitor
   *  ([[graft.streaming.EventAnalytics.zMonitor]]): the same cumulative
   *  Welch z as q_sequential_ztest, but produced by the stateful
   *  streaming fold (flatMapGroupsWithState; day closes on later-day
   *  arrival, exact integer cents moments in state) run here on the
   *  static frame — stream ≡ batch ≡ this oracle, which replays the
   *  closed-days-only emission (day < max day, both arms on the day,
   *  both cumulative n > 1) in window SQL over the same integer cents. */
  private[graft] def streamingZMonitorQ(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.zMonitor(events(s, dir))
      .toDF()
      .select(col("day"), col("n_a"), col("n_b"),
        round(col("z"), 6).as("z"), col("crossed"))

  private[graft] val streamingZMonitorOracle =
    """WITH e AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL),
      |mx AS (SELECT max(day) AS last_day FROM e),
      |daily AS (
      |  SELECT variant, day, count(*) AS n, sum(cents) AS s,
      |    sum(cents * cents) AS ss
      |  FROM e GROUP BY 1, 2),
      |cum AS (
      |  SELECT variant, day,
      |    CAST(sum(n) OVER w AS BIGINT) AS cn,
      |    CAST(sum(s) OVER w AS BIGINT) AS cs,
      |    CAST(sum(ss) OVER w AS BIGINT) AS css
      |  FROM daily
      |  WINDOW w AS (PARTITION BY variant ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |j AS (
      |  SELECT a.day, a.cn AS n_a, b.cn AS n_b,
      |    CAST(a.cs AS DOUBLE) / 1e2 AS cs_a,
      |    CAST(a.css AS DOUBLE) / 1e4 AS css_a,
      |    CAST(b.cs AS DOUBLE) / 1e2 AS cs_b,
      |    CAST(b.css AS DOUBLE) / 1e4 AS css_b
      |  FROM cum a JOIN cum b ON a.day = b.day
      |    AND a.variant = 'A' AND b.variant = 'B'),
      |z AS (
      |  SELECT day, n_a, n_b,
      |    (cs_a / n_a - cs_b / n_b) /
      |      sqrt(((css_a - cs_a * cs_a / n_a) / (n_a - 1)) / n_a +
      |           ((css_b - cs_b * cs_b / n_b) / (n_b - 1)) / n_b) AS z
      |  FROM j)
      |SELECT day, n_a, n_b, round(z, 6) AS z, abs(z) > 25e-1 AS crossed
      |FROM z, mx WHERE day < mx.last_day AND n_a > 1 AND n_b > 1""".stripMargin

  /** The LIVE face of the sample-ratio-mismatch guardrail
   *  ([[graft.streaming.EventAnalytics.srmMonitor]]): cumulative A/B
   *  assignment counts chi-squared against the designed 50/50 on each
   *  day close — run here on the static frame (stream ≡ batch ≡ this
   *  closed-days-only window-SQL replay). */
  private[graft] def streamingSrmQ(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.srmMonitor(events(s, dir))
      .toDF()
      .select(col("day"), col("n_a"), col("n_b"),
        round(col("chi2"), 6).as("chi2"), col("mismatch"))

  private[graft] val streamingSrmOracle =
    """WITH e AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
      |  FROM events),
      |mx AS (SELECT max(day) AS last_day FROM e),
      |d AS (
      |  SELECT day, CAST(sum(is_a) AS BIGINT) AS na,
      |    CAST(sum(1 - is_a) AS BIGINT) AS nb
      |  FROM e GROUP BY 1),
      |c AS (
      |  SELECT day,
      |    CAST(sum(na) OVER w AS BIGINT) AS n_a,
      |    CAST(sum(nb) OVER w AS BIGINT) AS n_b
      |  FROM d WINDOW w AS (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |x AS (
      |  SELECT day, n_a, n_b,
      |    CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b) AS chi2
      |  FROM c)
      |SELECT day, n_a, n_b, round(chi2, 6) AS chi2,
      |  chi2 > 384e-2 AS mismatch
      |FROM x, mx WHERE day < mx.last_day""".stripMargin

  /** The LIVE face of the Mann-Whitney rank-sum monitor
   *  ([[graft.streaming.EventAnalytics.mwMonitor]]): the cumulative
   *  tie-credited 2U and its tie-corrected normal z over the fixed
   *  512-bin integer histogram, produced by the stateful streaming fold
   *  run here on the static frame — stream ≡ batch ≡ this oracle, which
   *  rebuilds the per-day cumulative histograms in window SQL over the
   *  same exact integers. */
  private[graft] def streamingMwMonitorQ(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.mwMonitor(events(s, dir))
      .toDF()
      .select(col("day"), col("n_a"), col("n_b"), col("u2"),
        round(col("z"), 6).as("z"), col("crossed"))

  private[graft] val streamingMwMonitorOracle =
    """WITH e AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS day,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    CAST(least(greatest(floor(value), 0), 511) AS INT) AS bucket
      |  FROM events WHERE value IS NOT NULL),
      |mx AS (SELECT max(day) AS last_day FROM e),
      |openarm AS (
      |  SELECT day,
      |    count(*) FILTER (WHERE variant = 'A') AS open_a,
      |    count(*) FILTER (WHERE variant = 'B') AS open_b
      |  FROM e GROUP BY 1),
      |daily AS (
      |  SELECT day, variant, bucket, count(*) AS n FROM e GROUP BY 1, 2, 3),
      |grid AS (
      |  SELECT d.day, b.bucket
      |  FROM (SELECT DISTINCT day FROM e) d, (SELECT DISTINCT bucket FROM e) b),
      |cum AS (
      |  SELECT g.day, g.bucket,
      |    COALESCE(CAST(sum(CASE WHEN dl.variant = 'A' THEN dl.n END)
      |      AS BIGINT), 0) AS a,
      |    COALESCE(CAST(sum(CASE WHEN dl.variant = 'B' THEN dl.n END)
      |      AS BIGINT), 0) AS b
      |  FROM grid g LEFT JOIN daily dl
      |    ON dl.bucket = g.bucket AND dl.day <= g.day
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT day, bucket, a, b,
      |    CAST(COALESCE(sum(b) OVER (PARTITION BY day ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS bless
      |  FROM cum),
      |agg AS (
      |  SELECT day,
      |    CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
      |    CAST(sum(a * (2 * bless + b)) AS BIGINT) AS u2,
      |    CAST(sum((a + b) * (a + b) * (a + b) - (a + b)) AS BIGINT) AS tsum
      |  FROM w GROUP BY 1),
      |z AS (
      |  SELECT day, n_a, n_b, u2,
      |    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12e0 *
      |      ((CAST(n_a + n_b AS DOUBLE) + 1e0) - CAST(tsum AS DOUBLE) /
      |       (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1e0)))
      |      AS sig2,
      |    (CAST(u2 AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) /
      |      (2e0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12e0 *
      |       ((CAST(n_a + n_b AS DOUBLE) + 1e0) - CAST(tsum AS DOUBLE) /
      |        (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1e0)))))
      |      AS z
      |  FROM agg)
      |SELECT z.day, n_a, n_b, u2, round(z, 6) AS z, abs(z) > 25e-1 AS crossed
      |FROM z
      |JOIN openarm oa ON z.day = oa.day, mx
      |WHERE z.day < mx.last_day AND oa.open_a > 0 AND oa.open_b > 0
      |  AND n_a > 0 AND n_b > 0 AND sig2 > 0e0""".stripMargin

  /** The LIVE face of the CUPED variance-reduction monitor
   *  ([[graft.streaming.EventAnalytics.cupedMonitor]]): cumulative
   *  pooled θ = cov(X,Y)/var(X) over exact integer moments and the
   *  covariate-adjusted treatment effect on each day close — run here
   *  on the static frame (stream ≡ batch ≡ this closed-days-only
   *  window-SQL replay over the same integers). */
  private[graft] def streamingCupedQ(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventAnalytics.cupedMonitor(events(s, dir))
      .toDF()
      .select(col("day"), col("n_a"), col("n_b"),
        round(col("theta"), 6).as("theta"),
        round(col("diff_raw"), 6).as("diff_raw"),
        round(col("diff_adj"), 6).as("diff_adj"))

  private[graft] val streamingCupedOracle =
    """WITH e AS (
      |  -- filter on the CAST RESULTS (TRY_CAST = Spark's classic
      |  -- cast-to-null): a non-numeric k or value drops here exactly as
      |  -- the monitor's both faces drop it
      |  SELECT * FROM (
      |    SELECT epoch_ns(ts) // 86400000000000 AS day,
      |      CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |      TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS x,
      |      -- TRY_CAST on the INNER decimal cast too: a |value| past
      |      -- DECIMAL(18,2) nulls out in Spark's classic cast but would
      |      -- ERROR a plain DuckDB CAST (the loud-vs-silent class)
      |      TRY_CAST(TRY_CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |    FROM events)
      |  WHERE x IS NOT NULL AND y IS NOT NULL),
      |mx AS (SELECT max(day) AS last_day FROM e),
      |daily AS (
      |  SELECT day, variant, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx
      |  FROM e GROUP BY 1, 2),
      |cum AS (
      |  SELECT variant, day,
      |    CAST(sum(n) OVER w AS BIGINT) AS cn,
      |    CAST(sum(sx) OVER w AS BIGINT) AS cx,
      |    CAST(sum(sy) OVER w AS BIGINT) AS cy,
      |    CAST(sum(sxy) OVER w AS BIGINT) AS cxy,
      |    CAST(sum(sxx) OVER w AS BIGINT) AS cxx
      |  FROM daily
      |  WINDOW w AS (PARTITION BY variant ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |j AS (
      |  SELECT a.day, a.cn AS n_a, b.cn AS n_b,
      |    CAST(a.cn + b.cn AS DOUBLE) AS n,
      |    CAST(a.cx + b.cx AS DOUBLE) AS sx,
      |    CAST(a.cy + b.cy AS DOUBLE) / 1e2 AS sy,
      |    CAST(a.cxy + b.cxy AS DOUBLE) / 1e2 AS sxy,
      |    CAST(a.cxx + b.cxx AS DOUBLE) AS sxx,
      |    CAST(a.cy AS DOUBLE) / 1e2 / a.cn AS ya,
      |    CAST(b.cy AS DOUBLE) / 1e2 / b.cn AS yb,
      |    CAST(a.cx AS DOUBLE) / a.cn AS xa,
      |    CAST(b.cx AS DOUBLE) / b.cn AS xb
      |  FROM cum a JOIN cum b ON a.day = b.day
      |    AND a.variant = 'A' AND b.variant = 'B'),
      |r AS (
      |  SELECT day, n_a, n_b,
      |    sxx - sx * sx / n AS var_x,
      |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
      |    sx / n AS mxp, ya, yb, xa, xb
      |  FROM j)
      |SELECT r.day, n_a, n_b, round(theta, 6) AS theta,
      |  round(ya - yb, 6) AS diff_raw,
      |  round((ya - theta * (xa - mxp)) - (yb - theta * (xb - mxp)), 6)
      |    AS diff_adj
      |FROM r, mx WHERE r.day < mx.last_day AND var_x > 0e0""".stripMargin

  /** Sequential (daily-peeking) z monitor: the cumulative Welch z an
   *  experimenter watching a live dashboard sees each day, with the
   *  crossing flag against a fixed monitoring boundary — the readout
   *  that shows WHY unadjusted daily peeking inflates false positives.
   *  Cumulative moments are exact: Σv as DECIMAL(18,2) and Σv² as
   *  DECIMAL(38,4) per (variant, day) running windows (day-bounded
   *  partitions), one double expression per emitted row. A day is
   *  emitted only when BOTH arms have observations by then and on it
   *  (inner day join — a one-arm day has no comparable readout);
   *  mirrored in the oracle, and the spec's final-day ≡ q_ab_test
   *  identity presupposes both arms appear on the last day. */
  private[graft] def sequentialZtestQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000000000L
    val daily = events(s, dir)
      .withColumn("day", expr(s"ts div $dayNs"))
      .withColumn("variant",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy(col("variant"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv"),
        sum((col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("decimal(38,4)"))
          .as("svv"))
    val wCum = Window.partitionBy(col("variant")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("cn", sum(col("n")).over(wCum))
      .withColumn("cs", sum(col("sv")).over(wCum))
      .withColumn("css", sum(col("svv")).over(wCum))
      .select(col("variant"), col("day"), col("cn"),
        col("cs").cast("double").as("cs"),
        col("css").cast("double").as("css"))
      .localCheckpoint(true) // feeds both arm branches: one scan+window
    val a = cum.filter(col("variant") === "A")
      .select(col("day"), col("cn").as("n_a"), col("cs").as("s_a"),
        col("css").as("ss_a"))
    val b = cum.filter(col("variant") === "B")
      .select(col("day").as("day_b"), col("cn").as("n_b"),
        col("cs").as("s_b"), col("css").as("ss_b"))
    a.join(b, col("day") === col("day_b")).drop("day_b")
      .withColumn("m_a", col("s_a") / col("n_a"))
      .withColumn("m_b", col("s_b") / col("n_b"))
      .withColumn("v_a",
        (col("ss_a") - col("s_a") * col("s_a") / col("n_a")) /
          (col("n_a") - 1))
      .withColumn("v_b",
        (col("ss_b") - col("s_b") * col("s_b") / col("n_b")) /
          (col("n_b") - 1))
      .withColumn("z", (col("m_a") - col("m_b")) /
        sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")))
      .select(col("day"), col("n_a"), col("n_b"),
        round(col("z"), 6).as("z"),
        (abs(col("z")) > lit(25e-1)).as("crossed"))
  }

  private[graft] val sequentialZtestOracle =
    """WITH daily AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    epoch_ns(ts) // 86400000000000 AS day,
      |    count(*) AS n,
      |    sum(CAST(value AS DECIMAL(18,2))) AS sv,
      |    sum(CAST(CAST(value AS DECIMAL(18,2)) *
      |      CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS svv
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT variant, day,
      |    CAST(sum(n) OVER w AS BIGINT) AS cn,
      |    CAST(sum(sv) OVER w AS DOUBLE) AS cs,
      |    CAST(sum(svv) OVER w AS DOUBLE) AS css
      |  FROM daily
      |  WINDOW w AS (PARTITION BY variant ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |a AS (SELECT day, cn AS n_a, cs AS s_a, css AS ss_a
      |      FROM cum WHERE variant = 'A'),
      |b AS (SELECT day, cn AS n_b, cs AS s_b, css AS ss_b
      |      FROM cum WHERE variant = 'B'),
      |j AS (
      |  SELECT a.day, n_a, n_b, s_a, s_b, ss_a, ss_b,
      |    s_a / n_a AS m_a, s_b / n_b AS m_b,
      |    (ss_a - s_a * s_a / n_a) / (n_a - 1) AS v_a,
      |    (ss_b - s_b * s_b / n_b) / (n_b - 1) AS v_b
      |  FROM a JOIN b ON a.day = b.day),
      |z AS (
      |  SELECT day, n_a, n_b,
      |    (m_a - m_b) / sqrt(v_a / n_a + v_b / n_b) AS z
      |  FROM j)
      |SELECT day, n_a, n_b, round(z, 6) AS z,
      |  abs(z) > 25e-1 AS crossed
      |FROM z""".stripMargin

  /** Quantile treatment effect: per-decile difference between the two
   *  arms' per-user metric distributions — where in the distribution
   *  the treatment moves mass, which a mean test can't show. Deciles
   *  are type-1 empirical values picked by integer rank comparison
   *  (10·cum ≥ j·n — actual data points, no interpolation), one
   *  distinct-value walk per arm. */
  private[graft] def quantileTreatmentQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("metric"))
      .withColumn("variant",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy(col("variant"), col("metric"))
      .agg(count(lit(1)).as("n"))
    val wv = Window.partitionBy(col("variant")).orderBy(col("metric"))
    val walked = byVal
      .withColumn("cum", sum(col("n")).over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ntot",
        sum(col("n")).over(Window.partitionBy(col("variant"))))
    val qCols = (1 to 9).map(j =>
      min(when(col("cum") * 10 >= col("ntot") * j, col("metric")))
        .cast("double").as(s"q$j"))
    val qs = walked.groupBy(col("variant"))
      .agg(qCols.head, qCols.tail: _*)
      .localCheckpoint(true) // 2-row frame feeding both crossJoin sides
    val a = qs.filter(col("variant") === "A")
      .select((1 to 9).map(j => col(s"q$j").as(s"a$j")): _*)
    val b = qs.filter(col("variant") === "B")
      .select((1 to 9).map(j => col(s"q$j").as(s"b$j")): _*)
    val stackArgs = (1 to 9)
      .map(j => s"${j * 10}L, a$j, b$j").mkString(", ")
    a.crossJoin(b)
      .selectExpr(s"stack(9, $stackArgs) AS (decile, x_a, x_b)")
      .withColumn("qte", round(col("x_a") - col("x_b"), 2))
  }

  private[graft] val quantileTreatmentOracle = {
    val qsel = (1 to 9).map(j =>
      s"min(CASE WHEN cum * 10 >= ntot * $j THEN metric END) AS q$j")
      .mkString(",\n      |    ")
    val rows = (1 to 9).map(j =>
      s"SELECT CAST(${j * 10} AS BIGINT) AS decile, " +
        s"CAST(a.q$j AS DOUBLE) AS x_a, " +
        s"CAST(b.q$j AS DOUBLE) AS x_b FROM a, b")
      .mkString("\n      |  UNION ALL ")
    s"""WITH pu AS (
      |  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS metric,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
      |  FROM events GROUP BY 1),
      |bv AS (
      |  SELECT variant, metric, count(*) AS n FROM pu GROUP BY 1, 2),
      |r AS (
      |  SELECT *, sum(n) OVER (PARTITION BY variant ORDER BY metric
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(n) OVER (PARTITION BY variant) AS ntot
      |  FROM bv),
      |q AS (
      |  SELECT variant,
      |    $qsel
      |  FROM r GROUP BY 1),
      |a AS (SELECT * FROM q WHERE variant = 'A'),
      |b AS (SELECT * FROM q WHERE variant = 'B'),
      |s AS (
      |  $rows)
      |SELECT decile, x_a, x_b, round(x_a - x_b, 2) AS qte
      |FROM s""".stripMargin
  }

  /** Covariate balance (A/A check): standardized mean difference of
   *  PRE-period covariates between the arms — the randomization-health
   *  screen run before any outcome is read. Pre-period is the CUPED
   *  midpoint convention (integer floor-div hour); covariates are the
   *  pre-period event count and exact-decimal value sum per user;
   *  SMD = (mA−mB)/√((vA+vB)/2). */
  private[graft] def covariateBalanceQ(s: SparkSession, dir: String): DataFrame = {
    val perUser = eventsWithMid(s, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("hour") < col("mid"), 1L).otherwise(0L))
          .as("pre_events"),
        sum(when(col("hour") < col("mid"),
            col("value").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
          .as("pre_value"))
      .withColumn("variant",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .localCheckpoint(true) // both covariate roll-ups read this once
    def smd(covName: String, c: Column): DataFrame =
      perUser.groupBy(col("variant"))
        .agg(avg(c).as("m"), var_samp(c).as("v"))
        .groupBy()
        .agg(
          max(when(col("variant") === "A", col("m"))).as("m_a"),
          max(when(col("variant") === "B", col("m"))).as("m_b"),
          max(when(col("variant") === "A", col("v"))).as("v_a"),
          max(when(col("variant") === "B", col("v"))).as("v_b"))
        .select(lit(covName).as("covariate"),
          round(col("m_a"), 6).as("mean_a"),
          round(col("m_b"), 6).as("mean_b"),
          round((col("m_a") - col("m_b")) /
            sqrt((col("v_a") + col("v_b")) * lit(5e-1)), 6).as("smd"))
    smd("pre_events", col("pre_events").cast("double"))
      .unionByName(smd("pre_value", col("pre_value")))
  }

  private[graft] val covariateBalanceOracle =
    """WITH ev AS (
      |  SELECT user_id, value, epoch_ns(ts) // 3600000000000 AS hour
      |  FROM events),
      |mid AS (SELECT (min(hour) + max(hour)) // 2 AS mid FROM ev),
      |pu AS (
      |  SELECT user_id,
      |    sum(CASE WHEN hour < mid THEN 1 ELSE 0 END) AS pre_events,
      |    CAST(sum(CASE WHEN hour < mid
      |        THEN CAST(value AS DECIMAL(18,2))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS pre_value,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
      |  FROM ev, mid GROUP BY user_id, variant),
      |m AS (
      |  SELECT 'pre_events' AS covariate, variant,
      |    avg(CAST(pre_events AS DOUBLE)) AS m,
      |    var_samp(CAST(pre_events AS DOUBLE)) AS v
      |  FROM pu GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'pre_value', variant, avg(pre_value), var_samp(pre_value)
      |  FROM pu GROUP BY 1, variant),
      |w AS (
      |  SELECT covariate,
      |    max(CASE WHEN variant = 'A' THEN m END) AS m_a,
      |    max(CASE WHEN variant = 'B' THEN m END) AS m_b,
      |    max(CASE WHEN variant = 'A' THEN v END) AS v_a,
      |    max(CASE WHEN variant = 'B' THEN v END) AS v_b
      |  FROM m GROUP BY 1)
      |SELECT covariate, round(m_a, 6) AS mean_a, round(m_b, 6) AS mean_b,
      |  round((m_a - m_b) / sqrt((v_a + v_b) * 5e-1), 6) AS smd
      |FROM w""".stripMargin

  /** Robust per-series anomaly days: modified z-score
   *  0.6745·(x−median)/MAD over the daily counts of each event type
   *  (Iglewicz–Hoaglin 3.5 cut) — the outlier screen a mean/stddev rule
   *  gets wrong whenever the anomaly itself inflates the stddev. Daily
   *  counts are integers, so the count median lands on .0/.5 and the
   *  MAD (a median of .5-step deviations) on .0/.25/.5/.75 — all exact
   *  in binary, so every comparison is deterministic; day-bounded
   *  aggregates, two broadcast-joined stat rows per type. */
  private[graft] def madAnomalyDaysQ(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val daily = events(s, dir)
      .withColumn("day", expr(s"ts div $dayNs"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds med, MAD, and the final projection
    val med = daily.groupBy(col("event_type"))
      .agg(expr("percentile(n, 0.5)").as("med"))
    val withDev = daily.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("n") - col("med")))
    val mad = withDev.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    withDev.join(broadcast(mad), Seq("event_type"))
      .withColumn("robust_z",
        when(col("mad") > 0,
          round(lit(6745e-4) * (col("n") - col("med")) / col("mad"), 6)))
      .select(col("event_type"), col("day"), col("n"),
        col("robust_z"),
        coalesce(abs(col("robust_z")) > lit(35e-1), lit(false))
          .as("is_anomaly"))
  }

  private[graft] val madAnomalyDaysOracle =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, quantile_cont(n, 0.5) AS med
      |  FROM daily GROUP BY 1),
      |dev AS (
      |  SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS dev
      |  FROM daily d JOIN med m ON d.event_type = m.event_type),
      |mad AS (
      |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, d.day, d.n,
      |  CASE WHEN m.mad > 0
      |    THEN round(6745e-4 * (d.n - d.med) / m.mad, 6) END AS robust_z,
      |  COALESCE(abs(CASE WHEN m.mad > 0
      |    THEN round(6745e-4 * (d.n - d.med) / m.mad, 6) END) > 35e-1,
      |    false) AS is_anomaly
      |FROM dev d JOIN mad m ON d.event_type = m.event_type""".stripMargin

  /** Rolling-origin backtest of the Holt forecast vs the naive
   *  last-value forecast: ONE left fold per series carries
   *  (level, trend, prev, Σ|holt err|, Σ|naive err|) and evaluates the
   *  one-step-ahead forecast at every hour from the third on — the
   *  skill score that says whether the smoother earns its keep. Same
   *  bitwise-reproducible fold contract as q_holt_linear (the oracle
   *  replays the identical op sequence in a recursive CTE). */
  private[graft] def forecastBacktestQ(s: SparkSession, dir: String): DataFrame =
    hourSeries(s, dir)
      .filter(col("n_hours") >= 3)
      .withColumn("vals",
        expr("transform(series, s -> CAST(s.n AS DOUBLE))"))
      .withColumn("st", expr(
        s"""aggregate(slice(vals, 3, greatest(size(vals) - 2, 0)),
          |  named_struct('l', $holtSeedL, 'b', $holtSeedB,
          |    'px', element_at(vals, 2), 'seh', 0e0, 'sen', 0e0),
          |  (acc, x) -> named_struct(
          |    'l', $holtUpdateL, 'b', $holtUpdateB,
          |    'px', x,
          |    'seh', acc.seh + abs(acc.l + acc.b - x),
          |    'sen', acc.sen + abs(acc.px - x)))""".stripMargin))
      .select(col("event_type"), (col("n_hours") - 2).as("n_evals"),
        round(col("st.seh") / (col("n_hours") - 2), 6).as("mae_holt"),
        round(col("st.sen") / (col("n_hours") - 2), 6).as("mae_naive"),
        when(col("st.sen") > 0,
          round(lit(1) - col("st.seh") / col("st.sen"), 6)).as("skill"))

  private[graft] val forecastBacktestOracle =
    s"""WITH RECURSIVE h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, count(*) AS n_hours,
      |    list_transform(list(n ORDER BY hour),
      |      x -> CAST(x AS DOUBLE)) AS vals
      |  FROM h GROUP BY 1),
      |rec AS (
      |  SELECT event_type, n_hours, vals, 2 AS i,
      |    $holtSeedLSql AS l,
      |    $holtSeedBSql AS b,
      |    vals[2] AS px, 0e0 AS seh, 0e0 AS sen
      |  FROM s WHERE n_hours >= 3
      |  UNION ALL
      |  SELECT event_type, n_hours, vals, i + 1,
      |    ${holtUpdateLSql("vals[i + 1]")},
      |    ${holtUpdateBSql("vals[i + 1]")},
      |    vals[i + 1],
      |    seh + abs(l + b - vals[i + 1]),
      |    sen + abs(px - vals[i + 1])
      |  FROM rec WHERE i < n_hours)
      |SELECT event_type, n_hours - 2 AS n_evals,
      |  round(seh / (n_hours - 2), 6) AS mae_holt,
      |  round(sen / (n_hours - 2), 6) AS mae_naive,
      |  CASE WHEN sen > 0 THEN round(1 - seh / sen, 6) END AS skill
      |FROM rec WHERE i = n_hours""".stripMargin

  /** Two rounds of clamped label propagation on the co-order part
   *  graph: ~1-in-3 parts carry a deterministic seed class (pk%5 for
   *  pk%3=0); unlabeled nodes take the MODE of their labeled
   *  neighbors' labels each round (ties → smallest label, via the
   *  min(struct(-count, label)) lexicographic idiom), seeds stay
   *  clamped. Output is the class census after round 2 plus the
   *  still-unlabeled count (label NULL). Each round is one
   *  neighbor-join + one grouped vote — degree-bounded like the rest
   *  of the graph family. */
  private[graft] def labelPropagationQ(s: SparkSession, dir: String): DataFrame = {
    val und = coOrderEdges(s, dir).localCheckpoint(true)
    val dir2 = und.unionByName(und.select(col("b").as("a"), col("a").as("b")))
    val nodes = dir2.select(col("a").as("node")).distinct()
    val seeds = nodes
      .withColumn("label",
        when(col("node") % 3 === 0, (col("node") % 5).cast("long")))
    def round2(labels: DataFrame): DataFrame = {
      val votes = dir2
        .join(labels.withColumnRenamed("node", "a"), Seq("a"))
        .filter(col("label").isNotNull)
        .groupBy(col("b").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
          .as("top"))
        .select(col("node"), col("top.l").as("voted"))
      // no checkpoint: each round's output feeds exactly one consumer
      // (the next round's join or the terminal census), and the lineage
      // is two rounds deep by construction
      seeds.join(votes, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("label"), col("voted")).as("label"))
    }
    val l2 = round2(round2(seeds))
    l2.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
  }

  private[graft] val labelPropagationOracle =
    s"""$coOrderEdgesCteSql,
      |dir2 AS (
      |  SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
      |nodes AS (SELECT DISTINCT a AS node FROM dir2),
      |seeds AS (
      |  SELECT node, CASE WHEN node % 3 = 0 THEN node % 5 END AS label
      |  FROM nodes),
      |v1 AS (
      |  SELECT b AS node,
      |    (min(struct_pack(nc := -cnt, l := label))).l AS voted
      |  FROM (
      |    SELECT d.b, s.label, count(*) AS cnt
      |    FROM dir2 d JOIN seeds s ON d.a = s.node
      |    WHERE s.label IS NOT NULL
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |l1 AS (
      |  SELECT s.node, COALESCE(s.label, v.voted) AS label
      |  FROM seeds s LEFT JOIN v1 v ON s.node = v.node),
      |v2 AS (
      |  SELECT b AS node,
      |    (min(struct_pack(nc := -cnt, l := label))).l AS voted
      |  FROM (
      |    SELECT d.b, l.label, count(*) AS cnt
      |    FROM dir2 d JOIN l1 l ON d.a = l.node
      |    WHERE l.label IS NOT NULL
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |l2 AS (
      |  SELECT s.node, COALESCE(s.label, v.voted) AS label
      |  FROM seeds s LEFT JOIN v2 v ON s.node = v.node)
      |SELECT label, count(*) AS n_nodes
      |FROM l2 GROUP BY 1""".stripMargin

  /** Daily active users split new vs returning (first-seen day join) —
   *  the growth-accounting decomposition every product dashboard leads
   *  with. Distinct (user, day) presence, per-user first day joined
   *  back; all integer counts, one ratio. */
  private[graft] def newVsReturningQ(s: SparkSession, dir: String): DataFrame = {
    val presence = dailyPresence(s, dir)
      .localCheckpoint(true) // feeds the first-day aggregate AND the join
    val first = presence.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    presence.join(first, Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        round(col("n_new").cast("double") / col("n_active"), 6)
          .as("pct_new"))
  }

  private[graft] val newVsReturningOracle =
    """WITH p AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |f AS (
      |  SELECT user_id, min(day) AS first_day FROM p GROUP BY 1)
      |SELECT day, count(*) AS n_active,
      |  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new,
      |  CAST(count(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_returning,
      |  round(CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS pct_new
      |FROM p JOIN f USING (user_id)
      |GROUP BY 1""".stripMargin

  /** Discrete-time churn hazard by lifetime week: of the users who
   *  survived to week t since their first activity, what share churned
   *  there (MORE than one full week of silence at observation end =
   *  churned at their last-seen week — strict `>`, a user silent for
   *  exactly one week is still censored; otherwise censored —
   *  q_survival_curve's sibling, but the hazard needs no product, so
   *  the oracle is plain window SQL). Weeks-bounded walk, exact ints. */
  private[graft] def churnHazardQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekNs = 7L * 86400L * 1000000000L
    // gm == max(last_ts), so it derives from the per-user aggregate —
    // a second events scan just for the global max would double the work
    val spans = events(s, dir).groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .localCheckpoint(true) // feeds the gm aggregate AND the bucketing
    val pu = spans
      .crossJoin(broadcast(spans.agg(max(col("last_ts")).as("gm"))))
      .select(expr(s"(last_ts - first_ts) div $weekNs").as("w"),
        (expr(s"gm - last_ts") > weekNs).cast("long").as("churned"))
    val byW = pu.groupBy(col("w"))
      .agg(sum(col("churned")).as("d"), count(lit(1)).as("tot"))
    val ww = Window.orderBy(col("w"))
    byW
      .withColumn("cumprev", coalesce(sum(col("tot")).over(
        ww.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("tot")).over(
        ww.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("w").as("week"), (col("n") - col("cumprev")).as("at_risk"),
        col("d").as("n_churned"), (col("tot") - col("d")).as("n_censored"),
        round(col("d").cast("double") / (col("n") - col("cumprev")), 6)
          .as("hazard"))
  }

  private[graft] val churnHazardOracle =
    """WITH pu AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS first_ts,
      |    max(epoch_ns(ts)) AS last_ts
      |  FROM events GROUP BY 1),
      |g AS (SELECT max(epoch_ns(ts)) AS gm FROM events),
      |w AS (
      |  SELECT (last_ts - first_ts) // 604800000000000 AS w,
      |    CASE WHEN gm - last_ts > 604800000000000 THEN 1 ELSE 0 END
      |      AS churned
      |  FROM pu, g),
      |b AS (
      |  SELECT w, sum(churned) AS d, count(*) AS tot FROM w GROUP BY 1),
      |c AS (
      |  SELECT w, d, tot,
      |    COALESCE(sum(tot) OVER (ORDER BY w ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS cumprev,
      |    sum(tot) OVER () AS n
      |  FROM b)
      |SELECT w AS week, CAST(n - cumprev AS BIGINT) AS at_risk,
      |  CAST(d AS BIGINT) AS n_churned,
      |  CAST(tot - d AS BIGINT) AS n_censored,
      |  round(CAST(d AS DOUBLE) / (n - cumprev), 6) AS hazard
      |FROM c""".stripMargin

  /** DAU/WAU stickiness per day: daily actives over trailing-7-day
   *  actives — the engagement-depth ratio. The windowed distinct is an
   *  EXPLODE of each presence row to the 7 spine days it covers plus a
   *  hash equi-join (O(7·presence) with hash operators) — an
   *  inequality range join would plan as a nested loop evaluating the
   *  BETWEEN once per (spine day × presence row), and a sliding
   *  distinct window doesn't distribute at all. */
  private[graft] def stickinessQ(s: SparkSession, dir: String): DataFrame = {
    val presence = dailyPresence(s, dir)
      .localCheckpoint(true) // feeds DAU and the exploded coverage
    val dau = presence.groupBy(col("day").as("d"))
      .agg(count(lit(1)).as("dau"))
    val wau = presence
      .select(col("user_id"),
        explode(expr("sequence(day, day + 6)")).as("d"))
      // covered days past the observation end aren't spine days —
      // keep only days that actually occur (the oracle's spine)
      .join(dau.select(col("d")), Seq("d"), "left_semi")
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("d"))
      .select(col("d").as("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  private[graft] val stickinessOracle =
    """WITH p AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events),
      |spine AS (SELECT DISTINCT day AS d FROM p),
      |dau AS (SELECT day AS d, count(*) AS dau FROM p GROUP BY 1),
      |wau AS (
      |  SELECT s.d, count(DISTINCT p.user_id) AS wau
      |  FROM spine s JOIN p ON p.day BETWEEN s.d - 6 AND s.d
      |  GROUP BY 1)
      |SELECT dau.d AS day, dau.dau, wau.wau,
      |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
      |FROM dau JOIN wau ON dau.d = wau.d""".stripMargin

  private[graft] def cohortLtvQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekNs = 7L * 86400L * 1000000000L
    val ev = events(s, dir)
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(expr(s"min(ts) div $weekNs").as("cohort_week"))
      .localCheckpoint(true) // feeds cohort sizes AND the revenue join
    val sizes = firstSeen.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
    val weekly = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"ts div $weekNs").as("week"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .join(firstSeen, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_idx"))
      .agg(sum(col("cents")).as("rev_cents"))
    val wCum = Window.partitionBy(col("cohort_week")).orderBy(col("week_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("cum_cents", sum(col("rev_cents")).over(wCum))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_idx"), col("n_users"),
        round(col("cum_cents").cast("double") / 1e2, 2).as("cum_revenue"),
        round(col("cum_cents").cast("double") / 1e2 / col("n_users"), 6)
          .as("ltv_per_user"))
  }

  private[graft] val cohortLtvOracle =
    """WITH fs AS (
      |  SELECT user_id, min(epoch_ns(ts)) // 604800000000000 AS cohort_week
      |  FROM events GROUP BY 1),
      |sz AS (SELECT cohort_week, count(*) AS n_users FROM fs GROUP BY 1),
      |wk AS (
      |  SELECT fs.cohort_week,
      |    epoch_ns(e.ts) // 604800000000000 - fs.cohort_week AS week_idx,
      |    CAST(sum(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS rev_cents
      |  FROM events e JOIN fs ON e.user_id = fs.user_id
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2),
      |cm AS (
      |  SELECT cohort_week, week_idx,
      |    CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
      |      ORDER BY week_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_cents
      |  FROM wk)
      |SELECT cm.cohort_week, cm.week_idx, sz.n_users,
      |  round(CAST(cum_cents AS DOUBLE) / 1e2, 2) AS cum_revenue,
      |  round(CAST(cum_cents AS DOUBLE) / 1e2 / sz.n_users, 6)
      |    AS ltv_per_user
      |FROM cm JOIN sz ON cm.cohort_week = sz.cohort_week""".stripMargin

  /** Order/line amount reconciliation — the warehouse consistency audit
   *  (does the order header total match its lines?): per order status,
   *  how many orders diverge from Σ extprice·(1−disc)·(1+tax) by more
   *  than a cent, and by how much. Differences accumulate as exact
   *  DECIMAL cents (the header and line totals are both 2-dp data);
   *  per-row products are single double expressions cast once. */
  private[graft] def amountReconciliationQ(s: SparkSession, dir: String): DataFrame = {
    // line cents FLOOR the (not 2-dp-intended) product — a cast to
    // DECIMAL would round HALF_UP in Spark and half-to-even in DuckDB
    // and drift at .005 boundaries; floor is the one integerization
    // both engines share. Header cents via the exact decimal idiom
    // (o_totalprice IS 2-dp data).
    val lineTotals = s.read.parquet(t(dir, "lineitem"))
      .groupBy(col("l_orderkey"))
      .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount) *" +
        " (1 + l_tax) * 100) AS BIGINT)")).as("line_cents"))
    s.read.parquet(t(dir, "orders"))
      .join(lineTotals, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderstatus"),
        (expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)") -
          coalesce(col("line_cents"), lit(0L))).as("diff_cents"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(abs(col("diff_cents")) > 1, 1L).otherwise(0L))
          .as("n_mismatched"),
        round(max(abs(col("diff_cents"))).cast("double") / 1e2, 2)
          .as("max_abs_diff"),
        round(sum(col("diff_cents")).cast("double") / 1e2, 2)
          .as("total_diff"))
  }

  private[graft] val amountReconciliationOracle =
    """WITH lt AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) *
      |      (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS line_cents
      |  FROM lineitem GROUP BY 1),
      |d AS (
      |  SELECT o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      - coalesce(lt.line_cents, 0) AS diff_cents
      |  FROM orders LEFT JOIN lt ON o_orderkey = lt.l_orderkey)
      |SELECT o_orderstatus, count(*) AS n_orders,
      |  CAST(sum(CASE WHEN abs(diff_cents) > 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_mismatched,
      |  round(CAST(max(abs(diff_cents)) AS DOUBLE) / 1e2, 2)
      |    AS max_abs_diff,
      |  round(CAST(sum(diff_cents) AS DOUBLE) / 1e2, 2) AS total_diff
      |FROM d GROUP BY 1""".stripMargin

  /** Peak session concurrency per day — the capacity-planning sweep
   *  line, DISTRIBUTED: session [start, end] endpoints become ±1
   *  deltas; within each day a day-partition window runs the sweep
   *  (day-bounded rows), and the carry-in from all earlier days is a
   *  days-bounded prefix over the per-day net sums — no global-order
   *  window ever materializes. Tie rule: starts sort before ends at the
   *  same instant (inclusive overlap), mirrored in the oracle. */
  private[graft] def peakConcurrencyQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000000000L
    val sessions = sessionizedEvents(s, dir)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val endpoints = sessions.select(col("t0").as("t"), lit(1).as("delta"))
      .unionByName(sessions.select(col("t1").as("t"), lit(-1).as("delta")))
      .withColumn("day", expr(s"t div $dayNs"))
      .localCheckpoint(true) // feeds the day spine AND the sweep
    val wDay = Window.partitionBy(col("day"))
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = endpoints
      .withColumn("run", sum(col("delta")).over(wDay))
      .groupBy(col("day"))
      .agg(max(col("run")).as("max_run"),
        sum(col("delta")).as("net"))
    // DENSE day spine: a day with zero endpoints but spanned by
    // sessions carries constant concurrency = carry and must appear
    // (r9 review); span is calendar-bounded
    val spine = endpoints.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
    val wCarry = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    spine.join(daily, Seq("day"), "left")
      .withColumn("carry",
        coalesce(sum(coalesce(col("net"), lit(0L))).over(wCarry), lit(0L)))
      // the peak INCLUDES the instant before the first endpoint
      // (concurrency = carry), so a day whose running sum never goes
      // positive peaks at carry, not carry + max_run (r9 review)
      .select(col("day"),
        (col("carry") +
          greatest(coalesce(col("max_run"), lit(0L)), lit(0L)))
          .as("peak_concurrency"))
  }

  // lazy: interpolates sessionizedCteSql, which is DECLARED later in
  // this object — a strict val here would capture null at init order
  private[graft] lazy val peakConcurrencyOracle =
    s"""$sessionizedCteSql,
      |ses AS (
      |  SELECT user_id, session_seq, min(tns) AS t0, max(tns) AS t1
      |  FROM g GROUP BY 1, 2),
      |ep AS (
      |  SELECT t0 AS t, 1 AS delta FROM ses
      |  UNION ALL SELECT t1, -1 FROM ses),
      |d AS (SELECT t, delta, t // 86400000000000 AS day FROM ep),
      |r AS (
      |  SELECT day, delta,
      |    CAST(sum(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS run
      |  FROM d),
      |dd AS (
      |  SELECT day, max(run) AS max_run,
      |    CAST(sum(delta) AS BIGINT) AS net
      |  FROM r GROUP BY 1),
      |sp AS (
      |  SELECT unnest(generate_series(min(day), max(day))) AS day FROM d),
      |j AS (
      |  SELECT sp.day, dd.max_run, coalesce(dd.net, 0) AS net
      |  FROM sp LEFT JOIN dd ON sp.day = dd.day),
      |c AS (
      |  SELECT day, max_run,
      |    CAST(coalesce(sum(net) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS carry
      |  FROM j)
      |SELECT day,
      |  carry + greatest(coalesce(max_run, 0), 0) AS peak_concurrency
      |FROM c""".stripMargin

  /** Dedup threshold sensitivity curve — the tuning readout run BEFORE
   *  committing a near-dup threshold at corpus scale: for each candidate
   *  Jaccard cut, the surviving pair count, the number of docs touched
   *  by any pair, and the corpus fraction at stake. Built from the SAME
   *  exact pair list q_jaccard_pairs gates (one division of exact
   *  integers per pair, so the >= comparisons agree bit-for-bit across
   *  engines); thresholds explode from a 3-literal array. */

  /** Quality-scorer calibration readout ([[graft.ext.Stats.calibrationBins]]):
   *  10 reliability bins + corpus ECE for a deterministic pseudo-scorer
   *  over the documents table (score = a Knuth-hash pseudo-probability
   *  of the doc id; label drawn by an independent hash below the score,
   *  so the scorer is calibrated by construction and the bins read
   *  rate ≈ confidence). The curation use: this is the check run on a
   *  learned quality/toxicity scorer before its threshold becomes a
   *  keep/drop gate. One bin-keyed aggregate + a 1-row ECE broadcast. */
  private[graft] def scoreCalibrationQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Stats.calibrationBins(
      // doc_id masked to 5 digits BEFORE the multiply: the raw product
      // wraps Long past doc_id ~3.5e9 — silently negative in Spark,
      // a loud overflow error in DuckDB (the r11 review's catch)
      docs(s, dir).select(
        ((((col("doc_id") % 100000) * 2654435761L) % 1000)
          .cast("double") / 1000.0).as("score"),
        (((col("doc_id") % 100000) * 7919) % 1000 <
          ((col("doc_id") % 100000) * 2654435761L) % 1000).as("label")),
      "score", "label", bins = 10)

  private[graft] val scoreCalibrationOracle =
    """WITH s AS (
      |  SELECT CAST(((doc_id % 100000) * 2654435761) % 1000 AS DOUBLE)
      |      / 1000e0 AS score,
      |    CASE WHEN ((doc_id % 100000) * 7919) % 1000
      |           < ((doc_id % 100000) * 2654435761) % 1000
      |      THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |b AS (
      |  SELECT greatest(least(CAST(floor(score * 10) AS BIGINT), 9), 0) AS bin,
      |    count(*) AS n,
      |    CAST(sum(CAST(score AS DECIMAL(28,10))) AS DOUBLE) AS ssum,
      |    CAST(sum(y) AS BIGINT) AS ysum
      |  FROM s GROUP BY 1),
      |g AS (
      |  SELECT bin, n, round(ssum / n, 6) AS avg_score,
      |    round(CAST(ysum AS DOUBLE) / n, 6) AS pos_rate,
      |    round(abs(round(ssum / n, 6) - round(CAST(ysum AS DOUBLE) / n, 6)),
      |      6) AS gap
      |  FROM b),
      |e AS (
      |  SELECT CAST(sum(CAST(floor(gap * 1e6 + 5e-1) AS BIGINT) * n)
      |      AS DOUBLE) / 1e6 / CAST(sum(n) AS DOUBLE) AS ece
      |  FROM g)
      |SELECT bin, n, avg_score, pos_rate, gap, round(ece, 6) AS ece
      |FROM g, e""".stripMargin
}
