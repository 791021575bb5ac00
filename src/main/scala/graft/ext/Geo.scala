package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatial analytics over point streams — the geo face of the
 * connected-vehicle domain the reference ingests (BSM records carry
 * `metadata.receivedMessageDetails.locationData.latitude/longitude`,
 * cf. reference `odevalidator/config_2.ini` position rules): grid-cell
 * density aggregation, radius search with cell blocking, and per-key
 * trajectory statistics.
 *
 * Scale shape: everything is keyed by an integer grid cell or by the
 * trajectory key — one shuffle each, no all-pairs stage anywhere. The
 * radius join blocks candidates through a 3×3 cell neighborhood around
 * each probe (correct whenever the radius fits inside one cell edge at
 * the working latitude), so the big point table is joined on cell keys
 * and only candidates pay the haversine; with a small probe set the
 * exploded neighborhood broadcasts and the point table never shuffles
 * at all.
 */
object Geo {

  /** Earth mean radius (IUGG), meters. */
  val EarthRadiusM = 6371000.0

  /**
   * Great-circle distance in meters between two (degree) coordinate
   * pairs — the haversine formula, written once so the Scala API and
   * every oracle share the exact operation order (IEEE doubles make
   * the result reproducible across engines at matching rounding).
   */
  def haversineMeters(lat1: Column, lon1: Column,
                      lat2: Column, lon2: Column): Column =
    lit(2.0 * EarthRadiusM) * asin(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), lit(2.0)) +
        cos(radians(lat1)) * cos(radians(lat2)) *
          pow(sin(radians(lon2 - lon1) / 2), lit(2.0))))

  /** Integer grid-cell index of a coordinate at `cellDeg` resolution. */
  def cellOf(coord: Column, cellDeg: Double): Column =
    floor(coord / lit(cellDeg)).cast("long")

  /**
   * Grid-density aggregation: points binned to (cellLat, cellLon) at
   * `cellDeg` resolution with per-cell count, value sum and centroid.
   * One map-side-combined aggregate on the cell key — the spatial
   * GROUP BY that heat-maps 100 TB of position reports.
   */
  def cellCounts(points: DataFrame, latCol: String, lonCol: String,
                 valueCol: String, cellDeg: Double): DataFrame =
    points
      .withColumn("cell_lat", cellOf(col(latCol), cellDeg))
      .withColumn("cell_lon", cellOf(col(lonCol), cellDeg))
      .groupBy(col("cell_lat"), col("cell_lon"))
      .agg(
        count(lit(1)).as("n_points"),
        round(sum(col(valueCol)), 6).as("value_sum"),
        round(avg(col(latCol)), 6).as("centroid_lat"),
        round(avg(col(lonCol)), 6).as("centroid_lon"))

  /**
   * Radius search: every point within `radiusM` meters of any probe.
   * Candidate generation is a cell-key equi-join: each probe expands to
   * its 3×3 neighbor cells, points carry their own cell — so only the
   * probe side (small by contract) is exploded and broadcast, and the
   * haversine runs on candidates only, never all pairs.
   *
   * Correctness bound: the 1-cell halo covers the radius iff
   * `radiusM <= cellDeg * 111_045 * cos(maxLat)` (the shortest cell
   * edge in meters at the working latitude); callers pick `cellDeg`
   * accordingly, exactly like choosing an LSH band width.
   *
   * `probes` schema: (probe_id, probe_lat, probe_lon).
   */
  def radiusJoin(points: DataFrame, probes: DataFrame,
                 latCol: String, lonCol: String,
                 radiusM: Double, cellDeg: Double): DataFrame = {
    val halo = probes
      .withColumn("dlat", explode(sequence(lit(-1), lit(1))))
      .withColumn("dlon", explode(sequence(lit(-1), lit(1))))
      .select(col("probe_id"), col("probe_lat"), col("probe_lon"),
        (cellOf(col("probe_lat"), cellDeg) + col("dlat")).as("cell_lat"),
        (cellOf(col("probe_lon"), cellDeg) + col("dlon")).as("cell_lon"))
    val cells = points
      .withColumn("cell_lat", cellOf(col(latCol), cellDeg))
      .withColumn("cell_lon", cellOf(col(lonCol), cellDeg))
    cells
      .join(broadcast(halo), Seq("cell_lat", "cell_lon"))
      .withColumn("dist_m",
        haversineMeters(col(latCol), col(lonCol),
          col("probe_lat"), col("probe_lon")))
      .filter(col("dist_m") <= lit(radiusM))
      .drop("cell_lat", "cell_lon", "dlat", "dlon")
  }

  /**
   * Per-key trajectory statistics: order each key's fixes by
   * (tsCol, idCol), measure consecutive-fix haversine legs, and reduce
   * to path length, sharpest leg, duration and mean speed. One
   * key-partitioned window plus one aggregate on the same key — a
   * single shuffle, AQE-splittable when one vehicle dominates.
   *
   * `tsCol` is epoch nanos (the engine's long-nanos contract,
   * cf. [[graft.ingest.Readers.tsToNanos]]).
   */
  def tripStats(points: DataFrame, keyCol: String, tsCol: String,
                idCol: String, latCol: String, lonCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val legs = points
      .withColumn("prev_lat", lag(col(latCol), 1).over(w))
      .withColumn("prev_lon", lag(col(lonCol), 1).over(w))
      .withColumn("leg_m",
        haversineMeters(col("prev_lat"), col("prev_lon"),
          col(latCol), col(lonCol)))
    legs
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_fixes"),
        round(sum(col("leg_m")), 2).as("total_m"),
        round(max(col("leg_m")), 2).as("max_leg_m"),
        ((max(col(tsCol)) - min(col(tsCol))) / lit(1000000000L))
          .cast("double").as("duration_s"))
      .withColumn("avg_speed_mps",
        round(when(col("duration_s") > 0,
          col("total_m") / col("duration_s")).otherwise(lit(0.0)), 6))
  }
}
