package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Frequency sketching: a relational count-min sketch (Cormode &
 * Muthukrishnan 2005) for heavy-hitter estimation over unbounded key
 * domains.
 *
 * The sketch itself is the ONLY unbounded-input structure the op
 * materializes: `depth × width` counters built by one map-side-combined
 * aggregate over (seed, bucket) — at 100 TB the token stream reduces to
 * a few-KB table no matter the vocabulary, which is the entire point
 * (an exact per-token count table is vocab-bounded and vocab is
 * corpus-bounded; the sketch is not). Estimation joins candidate keys
 * against the broadcast sketch and takes the row-wise minimum across
 * seeds; estimates are biased up only (est >= exact always), with the
 * classic (eps, delta) = (e/width, e^-depth) guarantee.
 *
 * Hashing is md5-based and engine-portable, the same determinism
 * contract as the repo's sampling and LSH md5 twins — no RNG state, so
 * a DuckDB oracle replays the identical sketch bit-for-bit.
 */
object Sketches {

  /** Bucket of `key` under hash row `seed`, md5-derived, in [0, width). */
  def cmBucket(key: Column, seed: Int, width: Int): Column =
    graft.functions.GraftFunctions.graftMd5PrefixLong(
      concat(lit(s"$seed:"), key), 8) % width

  /**
   * The (seed, bucket, c) counter table for `keys` — depth × width
   * rows, one shuffle, map-side combined.
   */
  def countMinSketch(keys: DataFrame, keyCol: String,
                     depth: Int, width: Int): DataFrame =
    keys
      .select((0 until depth).map(s =>
        cmBucket(col(keyCol), s, width).as(s"b$s")): _*)
      .select(explode(array((0 until depth).map(s =>
        struct(lit(s).as("seed"), col(s"b$s").as("bucket"))): _*)).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /**
   * Heavy hitters: estimate every candidate key's frequency from the
   * broadcast sketch (min across the key's `depth` buckets), keep the
   * top-k by (estimate desc, key) — a deterministic total order — and
   * report the exact count beside it so the overcount is visible.
   *
   * The exact-count join here is the honesty check for the oracle; the
   * 100 TB deployment keeps only the sketch probe and feeds candidates
   * from a coarse pre-aggregate (or the keys of interest directly).
   */
  def heavyHitters(keys: DataFrame, keyCol: String,
                   depth: Int, width: Int, k: Int): DataFrame = {
    val sketch = countMinSketch(keys, keyCol, depth, width)
    val exact = keys.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("exact"))
    val probes = exact.select(col("key"), col("exact"),
      explode(array((0 until depth).map(s =>
        struct(lit(s).as("seed"),
          cmBucket(col("key"), s, width).as("bucket"))): _*)).as("sb"))
      .select(col("key"), col("exact"),
        col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
    probes
      .join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy(col("key"), col("exact"))
      .agg(min(col("c")).as("est"))
      .select(col("key"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy(col("est").desc, col("key"))
      .limit(k)
  }
}
