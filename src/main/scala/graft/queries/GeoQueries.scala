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
/** Spatial / trajectory family (ext.Geo). Split out of the monolithic registry
  * (r9 verdict item 5); every member keeps resolving
  * unqualified through the `Queries.type` self-type. */
private[graft] trait GeoQueries { this: Queries.type =>
  // =====================================================================
  // Spatial / trajectory family (ext.Geo) — the geo face of the
  // connected-vehicle domain (BSM position reports). Coordinates are a
  // deterministic synthetic overlay on `events` (per-user base + per-event
  // jitter), expressed with e-notation double literals so Spark and DuckDB
  // compute bit-identical IEEE doubles from the same integer inputs.
  // =====================================================================

  private[graft] val geoLatExpr =
    "39e0 + (user_id % 50) * 1e-2 + ((event_id * 7919) % 1000) * 1e-5"
  private[graft] val geoLonExpr =
    "-105e0 + (user_id % 70) * 1e-2 + ((event_id * 104729) % 1000) * 1e-5"

  private[graft] def geoPoints(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id"), col("user_id"), col("value"), col("ts"),
      expr(geoLatExpr).as("lat"), expr(geoLonExpr).as("lon"))

  private[graft] val geoPtsSql =
    s"""pts AS (
       |  SELECT event_id, user_id, value, epoch_ns(ts) AS tns,
       |    $geoLatExpr AS lat,
       |    $geoLonExpr AS lon
       |  FROM events)""".stripMargin

  /** The haversine SQL fragment — operand order matches
   *  [[graft.ext.Geo.haversineMeters]] exactly (lat1/lon1 → lat2/lon2). */
  private[graft] def havSql(lat1: String, lon1: String, lat2: String, lon2: String) = {
    val root =
      s"""sqrt(pow(sin(radians($lat2 - $lat1) / 2), 2e0)
         |    + cos(radians($lat1)) * cos(radians($lat2))
         |    * pow(sin(radians($lon2 - $lon1) / 2), 2e0))""".stripMargin
    // the same null-preserving conditional clamp as Geo.haversineMeters
    s"2e0 * 6371000e0 * asin(CASE WHEN $root > 1e0 THEN 1e0 ELSE $root END)"
  }

  /** Grid-density aggregation (spatial GROUP BY) at 0.05°. */
  private[graft] def geoCellcountQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.cellCounts(geoPoints(s, dir), "lat", "lon", "value", 0.05)

  private[graft] val geoCellcountOracle =
    s"""WITH $geoPtsSql
       |SELECT CAST(floor(lat / 5e-2) AS BIGINT) AS cell_lat,
       |  CAST(floor(lon / 5e-2) AS BIGINT) AS cell_lon,
       |  count(*) AS n_points, round(sum(value), 6) AS value_sum,
       |  round(avg(lat), 6) AS centroid_lat, round(avg(lon), 6) AS centroid_lon
       |FROM pts GROUP BY 1, 2""".stripMargin

  /** Hot-cell valve readout (r14 ADVICE — the colocation valve must not
   *  be silent): every (0.02° cell, 2h bucket) group whose fix count
   *  exceeds the cap, i.e. exactly the groups the valve would exclude
   *  from pair generation. Cap=2 so gate SF populates rows; production
   *  runs this beside q_colocation (or strictHotCells=true) as the
   *  completeness signal. One map-side-combined groupBy — O(cells). */
  private[graft] def geoHotCellsQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.hotCells(geoPoints(s, dir), "ts", "lat", "lon",
      dtNs = 7200000000000L, cellDeg = 0.02, maxCellFixes = 2L)

  private[graft] val geoHotCellsOracle =
    s"""WITH $geoPtsSql
       |SELECT CAST(floor(lat / 2e-2) AS BIGINT) AS cell_lat,
       |  CAST(floor(lon / 2e-2) AS BIGINT) AS cell_lon,
       |  tns // 7200000000000 AS bucket, count(*) AS n_fixes
       |FROM pts GROUP BY 1, 2, 3 HAVING count(*) > 2""".stripMargin

  /** Radius search via 3×3 cell-halo blocking, checked against the
   *  brute-force cross join — the oracle proves the halo loses nothing
   *  at the cell boundaries (radius 900 m < the 4.3 km lon cell edge
   *  at 39.5°N, so the 1-cell halo is sufficient). */
  private[graft] def geoRadiusJoinQ(s: SparkSession, dir: String): DataFrame = {
    val probes = s.range(20).select(col("id").as("probe_id"),
      expr("39e0 + (id % 10) * 5e-2 + 13e-3").as("probe_lat"),
      expr("-105e0 + id * 35e-3 + 7e-3").as("probe_lon"))
    graft.ext.Geo.radiusJoin(geoPoints(s, dir), probes,
        "lat", "lon", radiusM = 900.0, cellDeg = 0.05)
      .select(col("probe_id"), col("event_id"),
        round(col("dist_m"), 2).as("dist_m"))
  }

  private[graft] val geoRadiusJoinOracle =
    s"""WITH $geoPtsSql,
       |probes AS (
       |  SELECT g.pid AS probe_id,
       |    39e0 + (g.pid % 10) * 5e-2 + 13e-3 AS probe_lat,
       |    -105e0 + g.pid * 35e-3 + 7e-3 AS probe_lon
       |  FROM (SELECT unnest(generate_series(0, 19)) AS pid) g),
       |d AS (
       |  SELECT p.probe_id, x.event_id,
       |    ${havSql("x.lat", "x.lon", "p.probe_lat", "p.probe_lon")} AS dist_m
       |  FROM pts x CROSS JOIN probes p)
       |SELECT probe_id, event_id, round(dist_m, 2) AS dist_m
       |FROM d WHERE dist_m <= 900e0""".stripMargin

  /** Per-vehicle trajectory statistics: ordered haversine legs →
   *  path length, sharpest leg, duration, mean speed. */
  private[graft] def tripStatsQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.tripStats(geoPoints(s, dir),
      "user_id", "ts", "event_id", "lat", "lon")

  private[graft] val tripStatsOracle =
    s"""WITH $geoPtsSql,
       |legs AS (
       |  SELECT user_id, tns, event_id, lat, lon,
       |    lag(lat) OVER w AS prev_lat, lag(lon) OVER w AS prev_lon
       |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
       |d AS (
       |  SELECT user_id, tns,
       |    ${havSql("prev_lat", "prev_lon", "lat", "lon")} AS leg_m
       |  FROM legs),
       |agg AS (
       |  SELECT user_id, count(*) AS n_fixes,
       |    sum(CAST(floor(leg_m * 1e3) AS BIGINT)) / 1000.0 AS total_m,
       |    round(max(leg_m), 2) AS max_leg_m,
       |    (max(tns) - min(tns)) / 1000000000 AS duration_s
       |  FROM d GROUP BY 1)
       |SELECT user_id, n_fixes, total_m, max_leg_m,
       |  CAST(duration_s AS DOUBLE) AS duration_s,
       |  round(CASE WHEN duration_s > 0 THEN total_m / duration_s
       |    ELSE 0e0 END, 6) AS avg_speed_mps
       |FROM agg""".stripMargin

  /** Geofence zones: CCW (lat, lon) vertex rings inside the synthetic
   *  point cloud. ONE definition feeds both the Column algebra and the
   *  generated oracle predicate — textual consistency by construction. */
  private[graft] val geofenceZones: Seq[(String, Seq[(Double, Double)])] = Seq(
    "downtown" -> Seq((39.10, -104.95), (39.10, -104.85),
      (39.20, -104.85), (39.20, -104.95)),
    "airport" -> Seq((39.30, -104.70), (39.30, -104.55), (39.42, -104.625)),
    "corridor" -> Seq((39.05, -104.50), (39.05, -104.40),
      (39.45, -104.40), (39.45, -104.50)))

  private[graft] def geofenceQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.geofenceCounts(geoPoints(s, dir), "lat", "lon", "value",
      geofenceZones)

  /** The SAME half-plane tests as [[graft.ext.Geo.inConvexPolygon]],
   *  spelled as SQL (Java Double.toString round-trips, so the parsed
   *  literal is the identical IEEE value). */
  private[graft] def zonePredSql(vs: Seq[(Double, Double)]): String = {
    // Double.toString uses E-notation below 1e-3 — "(5.0E-4e0)" is a
    // DuckDB parse error; plain-string those (round-trips identically)
    def f(d: Double) = {
      val s0 = d.toString
      val s = if (s0.contains("E") || s0.contains("e"))
        new java.math.BigDecimal(d).toPlainString else s0
      s"(${s}e0)"
    }
    vs.indices.map { i =>
      val (y1, x1) = vs(i)
      val (y2, x2) = vs((i + 1) % vs.size)
      s"(${f(x2 - x1)} * (lat - ${f(y1)}) - ${f(y2 - y1)} * (lon - ${f(x1)}) >= 0e0)"
    }.mkString(" AND ")
  }

  private[graft] val geofenceOracle = {
    val arms = geofenceZones.map { case (name, vs) =>
      s"""SELECT '$name' AS zone, count(*) AS n_points,
         |  round(avg(value), 6) AS avg_value
         |FROM pts WHERE ${zonePredSql(vs)} HAVING count(*) > 0""".stripMargin
    }
    s"WITH $geoPtsSql\n" + arms.mkString("\nUNION ALL\n")
  }

  /** Bounded-radius kNN: 5 nearest fixes to each probe within 2.5 km
   *  (halo-safe at 0.05°); oracle is brute force + QUALIFY. */
  private[graft] def geoKnnQ(s: SparkSession, dir: String): DataFrame = {
    val probes = s.range(20).select(col("id").as("probe_id"),
      expr("39e0 + (id % 10) * 5e-2 + 13e-3").as("probe_lat"),
      expr("-105e0 + id * 35e-3 + 7e-3").as("probe_lon"))
    graft.ext.Geo.geoKnn(geoPoints(s, dir), probes, "lat", "lon",
      "event_id", k = 5, maxRadiusM = 2500.0, cellDeg = 0.05)
  }

  private[graft] val geoKnnOracle =
    s"""WITH $geoPtsSql,
       |probes AS (
       |  SELECT g.pid AS probe_id,
       |    39e0 + (g.pid % 10) * 5e-2 + 13e-3 AS probe_lat,
       |    -105e0 + g.pid * 35e-3 + 7e-3 AS probe_lon
       |  FROM (SELECT unnest(generate_series(0, 19)) AS pid) g),
       |d AS (
       |  SELECT p.probe_id, x.event_id,
       |    ${havSql("x.lat", "x.lon", "p.probe_lat", "p.probe_lon")} AS dist_m
       |  FROM pts x CROSS JOIN probes p),
       |r AS (
       |  SELECT probe_id, event_id, dist_m,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY dist_m, event_id) AS rank
       |  FROM d WHERE dist_m <= 2500e0)
       |SELECT probe_id, CAST(rank AS INTEGER) AS rank, event_id,
       |  round(dist_m, 2) AS dist_m
       |FROM r WHERE rank <= 5""".stripMargin

  /** Trajectory similarity: visited-cell Jaccard between users via the
   *  shared-cell inverted index. */
  private[graft] def trajSimilarityQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.trajectoryJaccard(geoPoints(s, dir), "user_id",
      "lat", "lon", cellDeg = 0.02, threshold = 0.3)

  private[graft] val trajSimilarityOracle =
    s"""WITH $geoPtsSql,
       |c AS (
       |  SELECT DISTINCT user_id, CAST(floor(lat / 2e-2) AS BIGINT) AS cl,
       |    CAST(floor(lon / 2e-2) AS BIGINT) AS cn
       |  FROM pts),
       |sz AS (SELECT user_id, count(*) AS n FROM c GROUP BY 1),
       |pairs AS (
       |  SELECT a.user_id AS key_a, b.user_id AS key_b, count(*) AS n_common
       |  FROM c a JOIN c b ON a.cl = b.cl AND a.cn = b.cn
       |    AND a.user_id < b.user_id
       |  GROUP BY 1, 2)
       |SELECT key_a, key_b, n_common,
       |  CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
       |FROM pairs
       |JOIN sz sa ON key_a = sa.user_id
       |JOIN sz sb ON key_b = sb.user_id
       |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.3""".stripMargin

  /** The zone CASE both engines share, generated from the same vertex
   *  list as [[graft.ext.Geo.zoneOf]]'s fold (first match wins). */
  private[graft] val zoneCaseSql: String =
    "CASE " + geofenceZones.map { case (n, vs) =>
      s"WHEN ${zonePredSql(vs)} THEN '$n'"
    }.mkString("\n  ") + " END"

  /** Geofence entry/exit transitions per vehicle (null = outside). */
  private[graft] def geofenceTransitionsQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.geofenceTransitions(geoPoints(s, dir), "user_id", "ts",
      "event_id", "lat", "lon", geofenceZones)

  private[graft] val geofenceTransitionsOracle =
    s"""WITH $geoPtsSql,
       |z AS (
       |  SELECT user_id, event_id, tns,
       |  $zoneCaseSql AS zone
       |  FROM pts),
       |l AS (
       |  SELECT user_id, event_id, tns, zone,
       |    lag(zone) OVER w AS prev_zone, lag(tns) OVER w AS prev_ts
       |  FROM z WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id))
       |SELECT user_id, tns AS ts, event_id,
       |  prev_zone AS from_zone, zone AS to_zone
       |FROM l
       |WHERE prev_ts IS NOT NULL AND zone IS DISTINCT FROM prev_zone""".stripMargin

  /** Per-zone dwell: inter-fix time attributed to the earlier fix's zone. */
  private[graft] def zoneDwellQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.Geo.zoneDwell(geoPoints(s, dir), "user_id", "ts",
      "event_id", "lat", "lon", geofenceZones)

  private[graft] val zoneDwellOracle =
    s"""WITH $geoPtsSql,
       |z AS (
       |  SELECT user_id, event_id, tns,
       |  $zoneCaseSql AS zone
       |  FROM pts),
       |l AS (
       |  SELECT *, lead(tns) OVER (PARTITION BY user_id
       |    ORDER BY tns, event_id) AS next_ts
       |  FROM z)
       |SELECT zone, count(DISTINCT user_id) AS n_vehicles,
       |  count(*) AS n_intervals,
       |  round(sum(next_ts - tns) / 1000000000, 3) AS dwell_s
       |FROM l WHERE zone IS NOT NULL AND next_ts IS NOT NULL
       |GROUP BY 1""".stripMargin

  /** Travel-heading census: the bearing of every consecutive-fix leg,
   *  bucketed to 8 compass sectors — fleet-level directional flow. */
  private[graft] def headingSectorsQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val legs = geoPoints(s, dir)
      .withColumn("plat", lag(col("lat"), 1).over(w))
      .withColumn("plon", lag(col("lon"), 1).over(w))
      .filter(col("plat").isNotNull &&
        !(col("plat") === col("lat") && col("plon") === col("lon")))
      .withColumn("bearing",
        graft.ext.Geo.bearingDegrees(col("plat"), col("plon"),
          col("lat"), col("lon")))
      .withColumn("leg_m",
        graft.ext.Geo.haversineMeters(col("plat"), col("plon"),
          col("lat"), col("lon")))
    legs
      .withColumn("sector",
        floor(((col("bearing") + 22.5) % 360.0) / 45.0).cast("int"))
      .groupBy(col("sector"))
      .agg(count(lit(1)).as("n_legs"),
        round(avg(col("leg_m")), 2).as("avg_leg_m"))
  }

  private[graft] val headingSectorsOracle =
    s"""WITH $geoPtsSql,
       |l AS (
       |  SELECT user_id, lat, lon,
       |    lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
       |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
       |b AS (
       |  SELECT
       |    (degrees(atan2(
       |      sin(radians(lon - plon)) * cos(radians(lat)),
       |      cos(radians(plat)) * sin(radians(lat))
       |        - sin(radians(plat)) * cos(radians(lat))
       |          * cos(radians(lon - plon)))) + 360e0) % 360e0 AS bearing,
       |    ${havSql("plat", "plon", "lat", "lon")} AS leg_m
       |  FROM l
       |  WHERE plat IS NOT NULL AND NOT (plat = lat AND plon = lon))
       |SELECT CAST(floor(((bearing + 22.5) % 360e0) / 45e0) AS INT) AS sector,
       |  count(*) AS n_legs, round(avg(leg_m), 2) AS avg_leg_m
       |FROM b GROUP BY 1""".stripMargin
}
