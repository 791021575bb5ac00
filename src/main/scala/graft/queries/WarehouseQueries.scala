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
/** Warehouse / sketch / graph / linkage / time-series. Split out of the monolithic registry
  * (r9 verdict item 5); every member keeps resolving
  * unqualified through the `Queries.type` self-type. */
private[graft] trait WarehouseQueries { this: Queries.type =>
  // =====================================================================
  // Warehouse / sketch / graph / linkage / time-series additions
  // =====================================================================

  /** SCD-type-2 dimension history from the order change stream. */
  private[graft] def scd2HistoryQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Upsert.scd2History(s.read.parquet(t(dir, "orders")),
      "o_custkey", "o_orderpriority", Seq("o_orderdate", "o_orderkey"))

  private[graft] val scd2HistoryOracle =
    """WITH o AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |m AS (SELECT *, CASE WHEN prev IS NULL OR prev <> o_orderpriority
      |        THEN 1 ELSE 0 END AS chg FROM o),
      |g AS (SELECT *, sum(chg) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM m),
      |isl AS (
      |  SELECT o_custkey, o_orderpriority, grp, min(o_orderdate) AS valid_from,
      |    count(*) AS n_rows
      |  FROM g GROUP BY 1, 2, 3),
      |fin AS (
      |  SELECT o_custkey, o_orderpriority, valid_from,
      |    lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY grp) AS valid_to,
      |    n_rows
      |  FROM isl)
      |SELECT o_custkey, o_orderpriority, valid_from, valid_to,
      |  valid_to IS NULL AS is_current, n_rows
      |FROM fin""".stripMargin

  /** Count-min-sketch heavy hitters over the document token stream,
   *  exact counts joined beside the estimates (est >= exact always —
   *  the one-sided bias is part of the contract and visible in the
   *  `overcount` column). */
  private[graft] def cmsTopkQ(s: SparkSession, dir: String): DataFrame = {
    // widened: tokenization + 4-row md5 sketch hashing fuse into a
    // one-task scan on both the sketch and exact branches
    val toks = widenForCompute(docs(s, dir))
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    graft.ext.Sketches.heavyHitters(toks, "tok", depth = 4, width = 512, k = 20)
      .withColumnRenamed("key", "word")
  }

  private[graft] val cmsTopkOracle =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS key
      |  FROM documents),
      |tk AS (SELECT key FROM tok WHERE len(key) > 0),
      |sk AS (
      |  SELECT seed,
      |    ('0x' || substr(md5(CAST(seed AS VARCHAR) || ':' || key), 1, 8))::BIGINT
      |      % 512 AS bucket,
      |    count(*) AS c
      |  FROM tk, generate_series(0, 3) g(seed)
      |  GROUP BY 1, 2),
      |ex AS (SELECT key, count(*) AS exact FROM tk GROUP BY 1),
      |pr AS (
      |  SELECT ex.key, ex.exact, g.seed,
      |    ('0x' || substr(md5(CAST(g.seed AS VARCHAR) || ':' || ex.key), 1, 8))::BIGINT
      |      % 512 AS bucket
      |  FROM ex, generate_series(0, 3) g(seed)),
      |est AS (
      |  SELECT pr.key, pr.exact, min(sk.c) AS est
      |  FROM pr JOIN sk ON pr.seed = sk.seed AND pr.bucket = sk.bucket
      |  GROUP BY 1, 2)
      |SELECT key AS word, est, exact, est - exact AS overcount
      |FROM est ORDER BY est DESC, key LIMIT 20""".stripMargin

  /** Triangle census of the part co-purchase graph (parts in the same
   *  order, 1-in-7 part universe so graph density is scale-invariant). */
  private[graft] def triangleCountQ(s: SparkSession, dir: String): DataFrame = {
    val lp = s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_partkey") % 7 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = lp.as("x").join(lp.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
    graft.ext.Graph.triangleStats(edges)
  }

  private[graft] val triangleCountOracle =
    """WITH lp AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem WHERE l_partkey % 7 = 0),
      |e AS (
      |  SELECT DISTINCT x.pk AS a, y.pk AS b
      |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.pk < y.pk),
      |ends AS (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e),
      |nn AS (SELECT count(DISTINCT v) AS n_nodes FROM ends),
      |ne AS (SELECT count(*) AS n_edges FROM e),
      |wd AS (SELECT sum(deg * (deg - 1) / 2) AS wedges FROM (
      |  SELECT v, count(*) AS deg FROM ends GROUP BY 1)),
      |tr AS (SELECT count(*) AS n_triangles
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT n_nodes, n_edges, n_triangles,
      |  round(CASE WHEN wedges > 0 THEN 3e0 * n_triangles / wedges
      |    ELSE 0e0 END, 6) AS global_clustering
      |FROM nn, ne, wd, tr""".stripMargin

  /** k-hop BFS distances over the co-purchase graph from a 1-in-11
   *  seed subset of the part universe; the 3 frontier rounds unroll
   *  into chained oracle CTEs. */
  private[graft] def khopQ(s: SparkSession, dir: String): DataFrame = {
    val lp = s.read.parquet(t(dir, "lineitem"))
      .filter(col("l_partkey") % 7 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = lp.as("x").join(lp.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
    val seeds = lp.filter(col("pk") % 77 === 0)
      .select(col("pk").as("node")).distinct()
    graft.ext.Graph.khopDistances(edges, seeds, maxHops = 3)
  }

  private[graft] val khopOracle =
    """WITH lp AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem WHERE l_partkey % 7 = 0),
      |e AS (
      |  SELECT DISTINCT x.pk AS a, y.pk AS b
      |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.pk < y.pk),
      |sym AS (
      |  SELECT a AS src, b AS dst FROM e
      |  UNION
      |  SELECT b AS src, a AS dst FROM e),
      |d0 AS (SELECT DISTINCT pk AS node, 0 AS dist FROM lp WHERE pk % 77 = 0),
      |f1 AS (
      |  SELECT DISTINCT s.dst AS node FROM d0 JOIN sym s ON d0.node = s.src),
      |n1 AS (SELECT node, 1 AS dist FROM f1
      |  WHERE node NOT IN (SELECT node FROM d0)),
      |r1 AS (SELECT * FROM d0 UNION ALL SELECT * FROM n1),
      |f2 AS (
      |  SELECT DISTINCT s.dst AS node FROM n1 JOIN sym s ON n1.node = s.src),
      |n2 AS (SELECT node, 2 AS dist FROM f2
      |  WHERE node NOT IN (SELECT node FROM r1)),
      |r2 AS (SELECT * FROM r1 UNION ALL SELECT * FROM n2),
      |f3 AS (
      |  SELECT DISTINCT s.dst AS node FROM n2 JOIN sym s ON n2.node = s.src),
      |n3 AS (SELECT node, 3 AS dist FROM f3
      |  WHERE node NOT IN (SELECT node FROM r2))
      |SELECT * FROM r2 UNION ALL SELECT * FROM n3""".stripMargin

  /** JSON column processing: the `props` JSON string parsed per event
   *  (schema'd from_json — codegen'd Jackson, no UDF), extracted and
   *  aggregated — the semi-structured face every event pipeline needs. */
  private[graft] def jsonPropsQ(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k",
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"),
        countDistinct(col("k") % 10).as("k_mod_classes"))

  private[graft] val jsonPropsOracle =
    """SELECT event_type,
      |  count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
      |  count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT) % 10)
      |    AS k_mod_classes
      |FROM events GROUP BY 1""".stripMargin

  /** The full ranking-window surface in one query: rank, dense_rank,
   *  percent_rank, cume_dist, ntile and nth_value per user over the
   *  deterministic (value desc, event_id) order. */
  private[graft] def windowAnalyticsQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    events(s, dir)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("prnk", round(percent_rank().over(w), 6))
      .withColumn("cdist", round(cume_dist().over(w), 6))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("second_best", nth_value(col("value"), 2).over(wFull))
      .filter(col("rnk") <= 5)
      .select(col("user_id"), col("event_id"), col("rnk"), col("drnk"),
        col("prnk"), col("cdist"), col("quartile"), col("second_best"))
  }

  private[graft] val windowAnalyticsOracle =
    """SELECT user_id, event_id, CAST(rnk AS INT) AS rnk,
      |  CAST(drnk AS INT) AS drnk, prnk, cdist,
      |  CAST(quartile AS INT) AS quartile, second_best
      |FROM (
      |  SELECT user_id, event_id, value,
      |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |    round(percent_rank() OVER w, 6) AS prnk,
      |    round(cume_dist() OVER w, 6) AS cdist,
      |    ntile(4) OVER w AS quartile,
      |    nth_value(value, 2) OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |      AS second_best
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id))
      |WHERE rnk <= 5""".stripMargin

  /** Equi-width histogram of order totals: bounds from one aggregate
   *  (broadcast back), bins from a second map-side-combined pass —
   *  exact bin edges shared with the oracle via identical arithmetic. */
  private[graft] def histogramQ(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(t(dir, "orders")).select(col("o_totalprice"))
    val bounds = o.agg(min(col("o_totalprice")).as("lo"),
      max(col("o_totalprice")).as("hi"))
    o.crossJoin(broadcast(bounds))
      // degenerate hi==lo guard: the width division would yield null and
      // least(null, 19) silently bins everything to 19 (null-swallowing
      // least) while DuckDB errors — pin bin 0 on a constant column in
      // both engines instead
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("o_totalprice") - col("lo")) /
            ((col("hi") - col("lo")) / 20)).cast("long"), lit(19L))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("bin_min"),
        round(max(col("o_totalprice")), 2).as("bin_max"))
  }

  private[graft] val histogramOracle =
    """WITH b AS (
      |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
      |binned AS (
      |  SELECT CASE WHEN hi = lo THEN 0
      |    ELSE least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20))
      |      AS BIGINT), 19) END AS bin, o_totalprice
      |  FROM orders CROSS JOIN b)
      |SELECT bin, count(*) AS n,
      |  round(min(o_totalprice), 2) AS bin_min,
      |  round(max(o_totalprice), 2) AS bin_max
      |FROM binned GROUP BY 1""".stripMargin

  /** Per-type OLS of event value on elapsed hours — the regr_* aggregate
   *  family (slope, intercept, R², count), fully map-side combined. */
  private[graft] def linregQ(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    events(s, dir)
      .withColumn("x", expr(s"ts div $hourNs").cast("double"))
      .groupBy(col("event_type"))
      .agg(
        round(regr_slope(col("value"), col("x")), 6).as("slope"),
        round(regr_intercept(col("value"), col("x")), 6).as("intercept"),
        round(regr_r2(col("value"), col("x")), 6).as("r2"),
        regr_count(col("value"), col("x")).as("n"))
  }

  private[graft] val linregOracle =
    """SELECT event_type,
      |  round(regr_slope(value, x), 6) AS slope,
      |  round(regr_intercept(value, x), 6) AS intercept,
      |  round(regr_r2(value, x), 6) AS r2,
      |  CAST(regr_count(value, x) AS BIGINT) AS n
      |FROM (
      |  SELECT event_type, value,
      |    CAST(epoch_ns(ts) // 3600000000000 AS DOUBLE) AS x
      |  FROM events)
      |GROUP BY 1""".stripMargin

  /** Fuzzy record linkage: perturbed part names matched back to the
   *  dimension under levenshtein <= 2 with first-token blocking. */
  private[graft] def fuzzyJoinQ(s: SparkSession, dir: String): DataFrame = {
    val parts = s.read.parquet(t(dir, "part"))
    val probes = parts.filter(col("p_partkey") % 97 === 0).select(
      col("p_partkey").as("probe_key"),
      when(col("p_partkey") % 2 === 0,
        concat(expr("substring(p_name, 1, length(p_name) - 1)"), lit("z")))
        .otherwise(expr("substring(p_name, 1, length(p_name) - 1)"))
        .as("probe_name"))
    graft.ext.Linkage.fuzzyBestMatch(probes,
      parts.select(col("p_partkey").as("ref_key"), col("p_name").as("ref_name")),
      "probe_key", "probe_name", "ref_key", "ref_name", maxDist = 2)
  }

  private[graft] val fuzzyJoinOracle =
    """WITH probes AS (
      |  SELECT p_partkey AS probe_key,
      |    CASE WHEN p_partkey % 2 = 0
      |      THEN substring(p_name, 1, length(p_name) - 1) || 'z'
      |      ELSE substring(p_name, 1, length(p_name) - 1) END AS probe_name
      |  FROM part WHERE p_partkey % 97 = 0),
      |refs AS (SELECT p_partkey AS ref_key, p_name AS ref_name FROM part),
      |cand AS (
      |  SELECT probe_key, probe_name, ref_key, ref_name,
      |    levenshtein(probe_name, ref_name) AS lev_dist
      |  FROM probes JOIN refs
      |    ON split_part(probe_name, ' ', 1) = split_part(ref_name, ' ', 1)
      |  WHERE levenshtein(probe_name, ref_name) <= 2),
      |best AS (
      |  SELECT *, count(*) OVER (PARTITION BY probe_key) AS n_candidates,
      |    row_number() OVER (PARTITION BY probe_key
      |      ORDER BY lev_dist, ref_key) AS rn
      |  FROM cand)
      |SELECT probe_key, probe_name, ref_key AS matched_key,
      |  ref_name AS matched_name, CAST(lev_dist AS INTEGER) AS lev_dist,
      |  n_candidates
      |FROM best WHERE rn = 1""".stripMargin

  /** Autocorrelation of the dense hourly count series per event type
   *  at lags {1,2,3,6,12,24} — the seasonality probe. */
  private[graft] def autocorrQ(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    val hourly = events(s, dir)
      .withColumn("hour", expr(s"ts div $hourNs"))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val bounds = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("hour"))
      .crossJoin(hourly.select(col("event_type")).distinct())
    val dense = spine.join(hourly, Seq("hour", "event_type"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    graft.ext.Stats.autocorrelation(dense, "event_type", "hour", "n",
      Seq(1, 2, 3, 6, 12, 24))
  }

  private[graft] val autocorrOracle =
    """WITH h AS (
      |  SELECT epoch_ns(ts) // 3600000000000 AS hour, event_type,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
      |spine AS (SELECT unnest(generate_series(lo, hi)) AS hour FROM b),
      |grid AS (
      |  SELECT s.hour, t.event_type
      |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM h) t),
      |d AS (
      |  SELECT g.hour, g.event_type, coalesce(h.n, 0) AS n
      |  FROM grid g LEFT JOIN h ON g.hour = h.hour AND g.event_type = h.event_type),
      |lg AS (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag_h),
      |j AS (
      |  SELECT a.event_type, lg.lag_h, a.n AS x, p.n AS y
      |  FROM d a CROSS JOIN lg
      |  JOIN d p ON p.event_type = a.event_type AND p.hour = a.hour - lg.lag_h)
      |SELECT event_type, lag_h, round(corr(x, y), 6) AS acf,
      |  count(*) AS n_pairs
      |FROM j GROUP BY 1, 2""".stripMargin

  /** Trip segmentation + per-trip roll-up: fixes split into trips at
   *  >48 h gaps (sessionization islands over the trajectory), with
   *  intra-trip path length and origin/destination cells. */
  private[graft] def tripSegmentsQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.tripSummaries(geoPoints(s, dir), "user_id", "ts",
      "event_id", "lat", "lon", gapNs = 172800000000000L, cellDeg = 0.05)

  private[graft] val tripSegBaseSql =
    s"""seg AS (
       |  SELECT user_id, event_id, tns, lat, lon,
       |    lag(tns) OVER w AS prev_ts
       |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
       |mk AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |    OR tns - prev_ts > 172800000000000 THEN 1 ELSE 0 END AS nt
       |  FROM seg),
       |gr AS (
       |  SELECT *, CAST(sum(nt) OVER (PARTITION BY user_id
       |    ORDER BY tns, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS trip_seq
       |  FROM mk),
       |lg AS (
       |  SELECT *, lag(lat) OVER w2 AS plat, lag(lon) OVER w2 AS plon,
       |    row_number() OVER w2 AS rn_a,
       |    row_number() OVER (PARTITION BY user_id, trip_seq
       |      ORDER BY tns DESC, event_id DESC) AS rn_d
       |  FROM gr
       |  WINDOW w2 AS (PARTITION BY user_id, trip_seq ORDER BY tns, event_id)),
       |dd AS (
       |  SELECT *, ${havSql("plat", "plon", "lat", "lon")} AS leg_m
       |  FROM lg),
       |trips AS (
       |  SELECT user_id, trip_seq, count(*) AS n_fixes,
       |    CAST(coalesce(sum(CAST(floor(leg_m * 1e3) AS BIGINT)), 0)
       |      AS BIGINT) AS trip_mm,
       |    CAST((max(tns) - min(tns)) / 1000000000 AS DOUBLE) AS duration_s,
       |    max(CASE WHEN rn_a = 1 THEN CAST(floor(lat / 5e-2) AS BIGINT) END)
       |      AS o_cell_lat,
       |    max(CASE WHEN rn_a = 1 THEN CAST(floor(lon / 5e-2) AS BIGINT) END)
       |      AS o_cell_lon,
       |    max(CASE WHEN rn_d = 1 THEN CAST(floor(lat / 5e-2) AS BIGINT) END)
       |      AS d_cell_lat,
       |    max(CASE WHEN rn_d = 1 THEN CAST(floor(lon / 5e-2) AS BIGINT) END)
       |      AS d_cell_lon
       |  FROM dd GROUP BY 1, 2)""".stripMargin

  private[graft] val tripSegmentsOracle =
    s"""WITH $geoPtsSql,
       |$tripSegBaseSql
       |SELECT *, trip_mm / 1000.0 AS trip_m FROM trips""".stripMargin

  /** Origin–destination matrix: the trips rolled up to cell-pair flows. */
  private[graft] def odMatrixQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.odMatrix(geoPoints(s, dir), "user_id", "ts",
      "event_id", "lat", "lon", gapNs = 172800000000000L, cellDeg = 0.05)

  private[graft] val odMatrixOracle =
    s"""WITH $geoPtsSql,
       |$tripSegBaseSql
       |SELECT o_cell_lat, o_cell_lon, d_cell_lat, d_cell_lon,
       |  count(*) AS n_trips,
       |  CAST(sum(trip_mm) AS DOUBLE) / count(*) / 1000.0 AS avg_trip_m
       |FROM trips GROUP BY 1, 2, 3, 4""".stripMargin

  /** Spatio-temporal co-location: user pairs with fixes within 1 km and
   *  2 h, found through a (cell, time-bucket) halo join — the oracle is
   *  the brute-force time-windowed cross join, proving the composite
   *  halo loses nothing. */
  private[graft] def colocationQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.colocationPairs(geoPoints(s, dir), "user_id",
      "event_id", "ts", "lat", "lon",
      distM = 1000.0, dtNs = 7200000000000L, cellDeg = 0.02)

  /** Time-sliced co-location — the unbounded-history production driver
   *  (one job per bucket range, overlap-exact across boundaries; see
   *  [[graft.ext.Geo.colocationPairsSliced]]). Same oracle as
   *  q_colocation: the slicing must be invisible in the answers. */
  private[graft] def colocationSlicedQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.colocationPairsSliced(geoPoints(s, dir), "user_id",
      "event_id", "ts", "lat", "lon",
      distM = 1000.0, dtNs = 7200000000000L, cellDeg = 0.02,
      sliceBuckets = 32768L)

  private[graft] val colocationOracle =
    s"""WITH $geoPtsSql,
       |cand AS (
       |  SELECT a.user_id AS key_a, b.user_id AS key_b,
       |    ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} AS dist_m
       |  FROM pts a JOIN pts b
       |    ON a.user_id < b.user_id
       |    AND abs(a.tns - b.tns) <= 7200000000000)
       |SELECT key_a, key_b, count(*) AS n_encounters,
       |  round(min(dist_m), 2) AS closest_m
       |FROM cand WHERE dist_m <= 1000e0 GROUP BY 1, 2""".stripMargin

  /** First-order Markov transition matrix of the per-user event-type
   *  journey. */
  private[graft] def eventTransitionsQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Events.typeTransitions(events(s, dir), "user_id", "ts",
      "event_id", "event_type")

  private[graft] val eventTransitionsOracle =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts), event_id) AS prev_type
      |  FROM events),
      |p AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6) AS p
      |FROM p""".stripMargin

  /** Inter-event gap (survival-time) statistics: per event type, the
   *  distribution of time since the user's PREVIOUS event — mean,
   *  exact median and p90 (Spark `percentile` ≡ DuckDB `quantile_cont`,
   *  R-7 interpolation). The churn-analysis primitive. */
  private[graft] def intereventGapsQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .withColumn("gap_s", (col("ts") - col("_prev")) / lit(1000000000L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_s")), 6).as("mean_s"),
        round(percentile(col("gap_s"), lit(0.5)), 6).as("median_s"),
        round(percentile(col("gap_s"), lit(0.9)), 6).as("p90_s"))
  }

  private[graft] val intereventGapsOracle =
    """WITH g AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts), event_id)) / 1000000000 AS gap_s
      |  FROM events)
      |SELECT event_type, count(*) AS n_gaps,
      |  round(avg(gap_s), 6) AS mean_s,
      |  round(quantile_cont(gap_s, 0.5), 6) AS median_s,
      |  round(quantile_cont(gap_s, 0.9), 6) AS p90_s
      |FROM g WHERE gap_s IS NOT NULL GROUP BY 1""".stripMargin

  /** Stationary distribution of the event-type Markov chain: three
   *  synchronous power-iteration steps from uniform over the observed
   *  transition matrix — where the user journey settles. The oracle
   *  unrolls the iterations as chained CTEs (the Lloyd/k-hop pattern). */
  private[graft] def markovStationaryQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val p = events(s, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("p"))
      .localCheckpoint(true)
    // state space = prev ∪ next; sink-only states (seen only as
    // next_type) become ABSORBING via a p=1 self-loop — without it the
    // mass flowing into a sink is dropped at the next iteration's join
    // and pi stops summing to 1
    val states = p.select(col("prev_type").as("state"))
      .union(p.select(col("next_type").as("state"))).distinct()
    val sinks = states.join(p.select(col("prev_type")).distinct(),
      col("state") === col("prev_type"), "left_anti")
    val pAug = p.unionByName(sinks.select(col("state").as("prev_type"),
      col("state").as("next_type"), lit(1.0).as("p")))
    val n0 = states.count().toDouble
    var pi = states.withColumn("pi", lit(1.0) / n0)
    for (_ <- 1 to 3) {
      pi = pAug.join(pi, col("prev_type") === col("state"))
        .groupBy(col("next_type").as("state2"))
        .agg(sum(col("p") * col("pi")).as("pi"))
        .withColumnRenamed("state2", "state")
    }
    pi.select(col("state"), round(col("pi"), 8).as("pi"))
  }

  private[graft] val markovStationaryOracle =
    """WITH s0 AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts), event_id) AS prev_type
      |  FROM events),
      |cnt AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM s0 WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |p AS (
      |  SELECT prev_type, next_type,
      |    CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
      |  FROM cnt),
      |states AS (
      |  SELECT DISTINCT state FROM (
      |    SELECT prev_type AS state FROM p
      |    UNION SELECT next_type FROM p)),
      |sinks AS (
      |  SELECT state FROM states
      |  WHERE state NOT IN (SELECT prev_type FROM p)),
      |pa AS (
      |  SELECT * FROM p
      |  UNION ALL SELECT state AS prev_type, state AS next_type, 1e0 AS p
      |  FROM sinks),
      |it0 AS (
      |  SELECT state, 1e0 / (SELECT count(*) FROM states) AS pi FROM states),
      |it1 AS (
      |  SELECT next_type AS state, sum(pa.p * it0.pi) AS pi
      |  FROM pa JOIN it0 ON pa.prev_type = it0.state GROUP BY 1),
      |it2 AS (
      |  SELECT next_type AS state, sum(pa.p * it1.pi) AS pi
      |  FROM pa JOIN it1 ON pa.prev_type = it1.state GROUP BY 1),
      |it3 AS (
      |  SELECT next_type AS state, sum(pa.p * it2.pi) AS pi
      |  FROM pa JOIN it2 ON pa.prev_type = it2.state GROUP BY 1)
      |SELECT state, round(pi, 8) AS pi FROM it3""".stripMargin

  /** Revenue-concentration deciles (the Pareto readout): customers
   *  ranked by revenue through the range-exchange machinery (no global
   *  window — the q_rfm discipline), bucketed to NTILE(10) deciles,
   *  each decile's share of total revenue. */
  private[graft] def paretoQ(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.Ranking
    val rev = s.read.parquet(t(dir, "orders"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    val ranked = Ranking.withGlobalRank(rev, "_r",
      col("revenue").desc, col("o_custkey"))
    ranked
      .crossJoin(broadcast(rev.agg(count(lit(1)).as("_n"),
        sum(col("revenue")).as("_tot"))))
      .withColumn("decile", Ranking.ntileFromRank("_r", "_n", 10))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("revenue")), 2).as("revenue"),
        round(sum(col("revenue") / col("_tot")), 6).as("share"))
  }

  private[graft] val paretoOracle =
    """WITH rev AS (
      |  SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT sum(revenue) AS _tot FROM rev),
      |d AS (
      |  SELECT revenue,
      |    ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
      |  FROM rev)
      |SELECT decile, count(*) AS n_customers,
      |  round(sum(revenue), 2) AS revenue,
      |  round(sum(revenue / _tot), 6) AS share
      |FROM d CROSS JOIN tot GROUP BY 1""".stripMargin

  /** A/B comparison: Welch's t-statistic between two deterministic
   *  user buckets (user_id parity) on event value — unequal-variance
   *  means test with the Welch–Satterthwaite df, all portable
   *  aggregates (var_samp is sample variance in both engines). */
  private[graft] def abTestQ(s: SparkSession, dir: String): DataFrame = {
    val g = events(s, dir)
      .withColumn("grp", when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("m"),
        var_samp(col("value")).as("v"))
      .localCheckpoint(true) // feeds both branches: scan+agg runs once
    val a = g.filter(col("grp") === "A")
      .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"))
    val b = g.filter(col("grp") === "B")
      .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"))
    a.crossJoin(b).select(
      col("n_a"), col("n_b"),
      round(col("m_a"), 6).as("mean_a"), round(col("m_b"), 6).as("mean_b"),
      round((col("m_a") - col("m_b")) /
        sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")), 6).as("t_stat"),
      round(pow(col("v_a") / col("n_a") + col("v_b") / col("n_b"), 2) /
        (pow(col("v_a") / col("n_a"), 2) / (col("n_a") - 1) +
          pow(col("v_b") / col("n_b"), 2) / (col("n_b") - 1)), 4).as("df"))
  }

  private[graft] val abTestOracle =
    """WITH g AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
      |    count(*) AS n, avg(value) AS m, var_samp(value) AS v
      |  FROM events GROUP BY 1),
      |a AS (SELECT n AS n_a, m AS m_a, v AS v_a FROM g WHERE grp = 'A'),
      |b AS (SELECT n AS n_b, m AS m_b, v AS v_b FROM g WHERE grp = 'B')
      |SELECT n_a, n_b, round(m_a, 6) AS mean_a, round(m_b, 6) AS mean_b,
      |  round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) AS t_stat,
      |  round(pow(v_a / n_a + v_b / n_b, 2) /
      |    (pow(v_a / n_a, 2) / (n_a - 1) + pow(v_b / n_b, 2) / (n_b - 1)), 4)
      |    AS df
      |FROM a CROSS JOIN b""".stripMargin

  /** Benford's-law first-digit audit of order totals: observed digit
   *  shares vs log10(1 + 1/d) with per-digit chi² contributions — the
   *  classic fabricated-numbers screen. */
  private[graft] def benfordQ(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(t(dir, "orders"))
      .filter(col("o_totalprice") > 0)
      .withColumn("d",
        floor(col("o_totalprice") /
          pow(lit(10.0), floor(log10(col("o_totalprice"))))).cast("int"))
    val tot = o.agg(count(lit(1)).as("_n"))
    o.groupBy(col("d")).agg(count(lit(1)).as("n_obs"))
      .crossJoin(broadcast(tot))
      .withColumn("expected", log10(lit(1.0) + lit(1.0) / col("d")))
      .select(col("d"), col("n_obs"),
        round(col("n_obs") / col("_n"), 6).as("share"),
        round(col("expected"), 6).as("benford_share"),
        round(pow(col("n_obs") - col("expected") * col("_n"), 2) /
          (col("expected") * col("_n")), 6).as("chi2_term"))
  }

  private[graft] val benfordOracle =
    """WITH o AS (
      |  SELECT CAST(floor(o_totalprice /
      |    pow(10e0, floor(log10(o_totalprice)))) AS INT) AS d
      |  FROM orders WHERE o_totalprice > 0),
      |tot AS (SELECT count(*) AS _n FROM o),
      |c AS (SELECT d, count(*) AS n_obs FROM o GROUP BY 1)
      |SELECT d, n_obs,
      |  round(n_obs / _n, 6) AS share,
      |  round(log10(1e0 + 1e0 / d), 6) AS benford_share,
      |  round(pow(n_obs - log10(1e0 + 1e0 / d) * _n, 2) /
      |    (log10(1e0 + 1e0 / d) * _n), 6) AS chi2_term
      |FROM c CROSS JOIN tot""".stripMargin

  /** RFM segmentation: recency/frequency/monetary quintiles per
   *  customer. NTILE semantics WITHOUT the single-partition window:
   *  three range-exchange global ranks ([[graft.ext.Ranking]]) and the
   *  arithmetic ntile-from-rank — the oracle runs real NTILE(5) to pin
   *  the equivalence. */
  private[graft] def rfmQ(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.Ranking
    val base = s.read.parquet(t(dir, "orders"))
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("monetary"))
    val ranked = Seq[(String, Seq[Column])](
      ("_rr", Seq(col("last_order").desc, col("o_custkey"))),
      ("_rf", Seq(col("n_orders").desc, col("o_custkey"))),
      ("_rm", Seq(col("monetary").desc, col("o_custkey"))))
      .foldLeft(base) { case (df, (name, ord)) =>
        Ranking.withGlobalRank(df, name, ord: _*)
      }
    ranked
      .crossJoin(broadcast(base.agg(count(lit(1)).as("_n"))))
      .withColumn("r_score", Ranking.ntileFromRank("_rr", "_n", 5))
      .withColumn("f_score", Ranking.ntileFromRank("_rf", "_n", 5))
      .withColumn("m_score", Ranking.ntileFromRank("_rm", "_n", 5))
      .select(col("o_custkey"), col("last_order"), col("n_orders"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("segment_code"))
  }

  private[graft] val rfmOracle =
    """WITH b AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS n_orders,
      |    round(sum(o_totalprice), 2) AS monetary
      |  FROM orders GROUP BY 1),
      |sc AS (
      |  SELECT *,
      |    ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
      |    ntile(5) OVER (ORDER BY n_orders DESC, o_custkey) AS f_score,
      |    ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      |  FROM b)
      |SELECT o_custkey, last_order, n_orders, monetary,
      |  r_score, f_score, m_score,
      |  r_score * 100 + f_score * 10 + m_score AS segment_code
      |FROM sc""".stripMargin

  /** Snapshot diff (CDC extract): two table versions compared by key —
   *  added / deleted / changed / unchanged via ONE full-outer join on
   *  the key, the standard data-diff shape (both sides shuffle once by
   *  key; at 100 TB you partition-prune both snapshots to the changed
   *  partitions first). Versions are deterministic derivations of
   *  `orders`: v2 drops `% 7 = 0` keys and reprices `% 11 = 0` keys
   *  (an EXACT +1000.0 — a scaled reprice would need a round() whose
   *  decimal-boundary semantics differ between engines). */
  private[graft] def snapshotDiffQ(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"), col("o_totalprice"))
    val v1 = o.filter(col("o_orderkey") % 5 =!= 0)
    val v2 = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    val j = v1.select(col("o_orderkey").as("k"), col("o_totalprice").as("p1"))
      .join(v2.select(col("o_orderkey").as("k2"), col("o_totalprice").as("p2")),
        col("k") === col("k2"), "full_outer")
    j.select(
        coalesce(col("k"), col("k2")).as("o_orderkey"),
        when(col("k").isNull, "added")
          .when(col("k2").isNull, "deleted")
          .when(col("p1") =!= col("p2"), "changed")
          .otherwise("unchanged").as("status"),
        col("p1").as("old_price"), col("p2").as("new_price"))
      .filter(col("status") =!= "unchanged")
  }

  private[graft] val snapshotDiffOracle =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v1 AS (SELECT * FROM o WHERE o_orderkey % 5 <> 0),
      |v2 AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1000e0
      |      ELSE o_totalprice END AS o_totalprice
      |  FROM o WHERE o_orderkey % 7 <> 0),
      |j AS (
      |  SELECT v1.o_orderkey AS k, v2.o_orderkey AS k2,
      |    v1.o_totalprice AS p1, v2.o_totalprice AS p2
      |  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey),
      |d AS (
      |  SELECT coalesce(k, k2) AS o_orderkey,
      |    CASE WHEN k IS NULL THEN 'added'
      |         WHEN k2 IS NULL THEN 'deleted'
      |         WHEN p1 <> p2 THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    p1 AS old_price, p2 AS new_price
      |  FROM j)
      |SELECT * FROM d WHERE status <> 'unchanged'""".stripMargin

  /** Incremental aggregate maintenance: the re-aggregation discipline —
   *  hourly (hour, event_type) partials from the OLD half and the DELTA
   *  half merged by summing counts and sums (never averaging averages),
   *  then finalized. The oracle recomputes from scratch: merge ≡
   *  recompute is exactly the materialized-view-refresh contract that
   *  makes 100 TB dashboards incremental instead of full-scan. */
  private[graft] def incrementalAggQ(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    def partials(df: DataFrame) = df
      .withColumn("hour", expr(s"ts div $hourNs"))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("vsum"))
    val all = events(s, dir)
    val old = partials(all.filter(col("event_id") % 4 =!= 0))
    val delta = partials(all.filter(col("event_id") % 4 === 0))
    old.unionByName(delta)
      .groupBy(col("hour"), col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        round(sum(col("vsum")), 6).as("value_sum"))
      .withColumn("value_avg",
        round(col("value_sum") / col("n_events"), 6))
  }

  private[graft] val incrementalAggOracle =
    """SELECT epoch_ns(ts) // 3600000000000 AS hour, event_type,
      |  count(*) AS n_events,
      |  round(sum(value), 6) AS value_sum,
      |  round(round(sum(value), 6) / count(*), 6) AS value_avg
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Incremental JOIN-view maintenance: the algebraic identity
   *  (A ∪ dA) ⋈ (B ∪ dB) = A⋈B ∪ dA⋈B ∪ A⋈dB ∪ dA⋈dB — the refresh a
   *  materialized join view runs instead of re-scanning both tables.
   *  The three delta terms each carry ONE small side (broadcast), so
   *  the big old-fact table is re-joined only against the tiny dB; the
   *  oracle recomputes the full join from scratch, pinning
   *  delta-merge ≡ recompute. Deterministic split: orders arriving in
   *  the last "batch" (`% 10 = 0`) and newly-seen customers
   *  (`% 17 = 0`). */
  private[graft] def incrementalJoinQ(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val c = s.read.parquet(t(dir, "customer"))
      .select(col("c_custkey"), col("c_mktsegment"))
    val (oldO, dO) = (o.filter(col("o_orderkey") % 10 =!= 0),
      o.filter(col("o_orderkey") % 10 === 0))
    val (oldC, dC) = (c.filter(col("c_custkey") % 17 =!= 0),
      c.filter(col("c_custkey") % 17 === 0))
    def j(a: DataFrame, b: DataFrame) =
      a.join(b, col("o_custkey") === col("c_custkey"))
    j(oldO, oldC)
      .unionByName(j(dO, oldC))
      .unionByName(j(oldO, dC))
      .unionByName(j(dO, dC))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        // Exact DECIMAL accumulation: per-segment double sums reach
        // ~7.5e8 where one ULP ~ 1.2e-7 — round(sum(double), 6) flips
        // the 6th decimal with partial-agg order (the r7 hash flake).
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
  }

  private[graft] val incrementalJoinOracle =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** The interval join's SCALE path: events matched to maintenance
   *  windows through the bucket equi-join ([[graft.ext.Intervals]]) —
   *  the shuffled complement of q_range_join's broadcast baseline.
   *  Oracle is the raw containment join. */
  private[graft] def intervalBucketJoinQ(s: SparkSession, dir: String): DataFrame = {
    val windows = maintenanceWindows(s)
    graft.ext.Intervals.bucketedIntervalJoin(
        events(s, dir).select(col("event_id"), col("ts"), col("value")),
        "ts", windows, "w_lo", "w_hi", bucketWidth = 50000000000000L)
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("value_sum"))
  }

  /** The synthetic maintenance-window table — ONE definition shared by
   *  the oracled query and the 16× scale stress (three copies would
   *  silently drift). */
  private[graft] def maintenanceWindows(s: SparkSession): DataFrame = {
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z, ns
    s.range(40).select(col("id").as("window_id"),
      (lit(base) + col("id") * lit(87000000000000L)).as("w_lo"),
      (lit(base) + col("id") * lit(87000000000000L) +
        lit(43000000000000L)).as("w_hi"))
  }

  private[graft] val intervalBucketJoinOracle =
    """WITH w AS (
      |  SELECT g.id AS window_id,
      |    1704067200000000000 + g.id * 87000000000000 AS w_lo,
      |    1704067200000000000 + g.id * 87000000000000 + 43000000000000 AS w_hi
      |  FROM (SELECT unnest(generate_series(0, 39)) AS id) g)
      |SELECT window_id, count(*) AS n_events,
      |  round(sum(value), 6) AS value_sum
      |FROM events e JOIN w
      |  ON epoch_ns(e.ts) >= w_lo AND epoch_ns(e.ts) < w_hi
      |GROUP BY 1""".stripMargin

  /** Unpivot / melt: lineitem's measure columns to (measure, value)
   *  rows — the wide→long reshape (Spark `unpivot`, DuckDB `UNPIVOT`),
   *  then a per-measure aggregate proving the long form. */
  private[graft] def unpivotQ(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("quantity"),
        col("l_extendedprice").cast("double").as("extendedprice"),
        col("l_discount").cast("double").as("discount"),
        col("l_tax").cast("double").as("tax"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("quantity"), col("extendedprice"), col("discount"),
          col("tax")),
        "measure", "value")
      // Spark's unpivot RETAINS null measure values where DuckDB's
      // UNPIVOT excludes them by default — align explicitly so a future
      // nullable fixture can't silently diverge the gate
      .filter(col("value").isNotNull)
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"),
        round(avg(col("value")), 6).as("mean"))

  private[graft] val unpivotOracle =
    """SELECT measure, count(*) AS n, round(sum(value), 4) AS total,
      |  round(avg(value), 6) AS mean
      |FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(l_quantity AS DOUBLE) AS quantity,
      |    CAST(l_extendedprice AS DOUBLE) AS extendedprice,
      |    CAST(l_discount AS DOUBLE) AS discount,
      |    CAST(l_tax AS DOUBLE) AS tax
      |  FROM lineitem)
      |UNPIVOT (value FOR measure IN (quantity, extendedprice, discount, tax))
      |GROUP BY 1""".stripMargin

  /** Ordered string aggregation: each customer's order keys as one
   *  chronologically-ordered CSV — collect_list is unordered by
   *  contract, so the deterministic form sorts struct-packed pairs
   *  INSIDE the row before joining (no window, no second shuffle). */
  private[graft] def stringAggQ(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "orders"))
      .filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",",
        transform(
          sort_array(collect_list(struct(col("o_orderdate"), col("o_orderkey")))),
          x => x.getField("o_orderkey"))).as("order_history"),
        count(lit(1)).as("n_orders"))

  private[graft] val stringAggOracle =
    """SELECT o_custkey,
      |  string_agg(o_orderkey, ',' ORDER BY o_orderdate, o_orderkey)
      |    AS order_history,
      |  count(*) AS n_orders
      |FROM orders WHERE o_custkey < 100 GROUP BY 1""".stripMargin

  /** OHLC bars: hourly open/high/low/close + volume per event type —
   *  first/last by (ts, event_id) via min/max over a struct-packed
   *  comparator inside ONE aggregate pass (no per-bar window, no
   *  second shuffle). */
  private[graft] def ohlcBarsQ(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    // (ts, event_id, value) packed so struct MIN/MAX picks the
    // earliest/latest fix and carries its value out
    val packed = struct(col("ts"), col("event_id"), col("value"))
    events(s, dir)
      .withColumn("hour", expr(s"ts div $hourNs"))
      .groupBy(col("hour"), col("event_type"))
      .agg(
        min(packed).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(packed).getField("value").as("close"),
        count(lit(1)).as("volume"))
  }

  private[graft] val ohlcBarsOracle =
    """SELECT epoch_ns(ts) // 3600000000000 AS hour, event_type,
      |  (min(struct_pack(t := epoch_ns(ts), i := event_id, v := value))).v AS open,
      |  max(value) AS high, min(value) AS low,
      |  (max(struct_pack(t := epoch_ns(ts), i := event_id, v := value))).v AS close,
      |  count(*) AS volume
      |FROM events GROUP BY 1, 2""".stripMargin
}
