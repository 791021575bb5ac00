package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout optimization — Z-order (Morton) clustering, the
 * multi-dimensional generalization of sort-by-key that makes min/max
 * file statistics prune on EVERY clustered column, not just the first
 * sort key. At 100 TB the difference between a linear sort on one
 * column and a Z-order on two is whether the second column's filters
 * read 100% or ~√ of the files.
 *
 * The Z-value is plain bit interleaving, built from `shiftright`/`&`/
 * `shiftleft`/`|` Column algebra — `bits` unrolled rounds of four
 * codegen'd integer ops each, no UDF — so it rides whole-stage codegen
 * and is expressible verbatim in any engine (the DuckDB oracle unrolls
 * the same arithmetic).
 */
object Layout {

  /**
   * Morton interleave of the low `bits` bits of two non-negative longs:
   * x occupies even result bits, y odd. Columns must be < 2^bits
   * (callers clamp or bucket first); bits ≤ 31 keeps the result in a
   * positive long.
   */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val xi = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yi = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xi.bitwiseOR(yi)
    }.reduce(_ bitwiseOR _)
  }

  /**
   * Clustered rewrite: range-partition by Z-value into `partitions`
   * output slices and sort within each — the layout a compaction job
   * writes so downstream parquet files carry tight per-file min/max on
   * BOTH dimensions. One range exchange (sampled bounds), no global
   * single-partition sort.
   */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 bits: Int, partitions: Int): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /**
   * The layout-quality readout: bucket rows by their Z-value's top
   * `prefixBits` bits (each prefix is one quadrant of the Z-curve — a
   * contiguous axis-aligned tile, by construction) and report each
   * bucket's row count and per-dimension min/max. Tight per-bucket
   * ranges ≙ tight per-file statistics after [[clusterByZ]]; the same
   * frame computed over a linear sort shows the second dimension's
   * ranges spanning the whole domain.
   *
   * Each dimension is first quantized onto its own `bits`-bit grid
   * (`v * 2^bits div (max+1)`, max from a 1-row broadcast) — the
   * normalization every real layout engine applies, since raw-bit
   * interleave of unequal domains (say a 2M-key dim against a 100-key
   * dim) parks the narrow dimension's top bits at zero and degenerates
   * the curve into a linear sort on the wide one. All-integer
   * arithmetic (`div`), identical in any engine; one corpus aggregate
   * for the maxes, one map-side-combinable group for the stats; no
   * sort, no window. (Grid product `v * 2^bits` bounds the domain:
   * fine for keys < 2^(63-bits).)
   */
  def zQuadrantStats(df: DataFrame, xCol: String, yCol: String,
                     bits: Int, prefixBits: Int): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"prefixBits must be in [1, ${2 * bits}]")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val grid = 1L << bits
    val bounds = df.agg(max(x).as("__mx"), max(y).as("__my"))
    val xg = expr(s"(__x * $grid) div (__mx + 1)")
    val yg = expr(s"(__y * $grid) div (__my + 1)")
    df.select(x.as("__x"), y.as("__y"))
      .crossJoin(broadcast(bounds))
      .select(shiftright(zValue(xg, yg, bits), 2 * bits - prefixBits).as("bucket"),
        col("__x"), col("__y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }
}
