package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Distributed global ranking. An unpartitioned `row_number()`/`ntile()`
 * window drags EVERY row to one partition — the canonical 100 TB OOM.
 * The scalable shape (shared with the curriculum-order query) is
 * orderBy (a RANGE exchange: sampled bounds, each executor sorts only
 * its range) + `zipWithIndex` over the sorted partitions (one pass to
 * learn per-partition counts, then offset-local indices). No stage
 * ever holds more than its range.
 */
object Ranking {

  /** `df` plus a 1-based global rank column under `sortCols` order
    * (must be a deterministic total order — include a tiebreaker). */
  def withGlobalRank(df: DataFrame, rankCol: String,
                     sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 1L) +: r.toSeq)
    }
    df.sparkSession.createDataFrame(ranked,
      StructType(StructField(rankCol, LongType, nullable = false) +:
        sorted.schema.fields))
  }

  /**
   * SQL-standard NTILE(k) bucket from a global rank and row count,
   * computed arithmetically: base = n div k buckets of equal size, the
   * first n mod k buckets one larger. Equal to `ntile(k) OVER (ORDER BY
   * <the rank's order>)` but without the single-partition window —
   * pair with [[withGlobalRank]].
   */
  def ntileFromRank(rankCol: String, nCol: String, k: Int): Column = {
    val (i, n) = (rankCol, nCol)
    expr(
      s"""CASE WHEN $i <= (($n div $k) + 1) * ($n % $k)
         |  THEN ($i + ($n div $k)) div (($n div $k) + 1)
         |  ELSE ($n % $k) +
         |    ($i - (($n div $k) + 1) * ($n % $k) + ($n div $k) - 1)
         |      div ($n div $k)
         |END""".stripMargin)
  }
}
