package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Record linkage: fuzzy string matching of a probe set against a
 * reference table under edit distance, with blocking — the
 * entity-resolution primitive (match noisy part/vendor/vehicle names to
 * the canonical dimension).
 *
 * Scale shape: candidate generation is an equi-join on a blocking key
 * (here the first token of the name — the same bounded-bucket discipline
 * as every LSH family in [[Dedup]]: never all-pairs), so the reference
 * table shuffles once by block; Levenshtein runs on candidates only and
 * is codegen'd (built-in `levenshtein`, no UDF). Best-match selection is
 * a per-probe window over the candidates — probe-bounded state. A hot
 * block (every name starting with "premium …") is an AQE skew split, or
 * a two-token blocking key — the standard mitigations.
 */
object Linkage {

  /**
   * For each probe (probeKey, probeName), the best reference match
   * within `maxDist` edits among candidates sharing the blocking key
   * (first whitespace token), choosing by (distance, refKey) — a
   * deterministic total order. Probes whose block has no candidate
   * within range are dropped (an anti-join face would report them).
   *
   * `refs` schema: (refKey, refName).
   */
  def fuzzyBestMatch(probes: DataFrame, refs: DataFrame,
                     probeKey: String, probeName: String,
                     refKey: String, refName: String,
                     maxDist: Int): DataFrame = {
    val p = probes.withColumn("_blk", substring_index(col(probeName), " ", 1))
    val r = refs.withColumn("_blk", substring_index(col(refName), " ", 1))
    val cand = p.join(r, "_blk")
      .withColumn("lev_dist", levenshtein(col(probeName), col(refName)))
      .filter(col("lev_dist") <= maxDist)
    val w = Window.partitionBy(col(probeKey))
    val best = Window.partitionBy(col(probeKey))
      .orderBy(col("lev_dist"), col(refKey))
    cand
      .withColumn("n_candidates", count(lit(1)).over(w))
      .withColumn("_rn", row_number().over(best))
      .filter(col("_rn") === 1)
      .select(col(probeKey), col(probeName),
        col(refKey).as("matched_key"), col(refName).as("matched_name"),
        col("lev_dist"), col("n_candidates"))
  }
}
