package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic weighted sampling for training-data selection. Both
 * operators avoid RNG state entirely: the per-row uniform is derived from
 * md5 of a salted id, so every engine/run/retry selects the identical
 * rows (the reproducibility contract a 100 TB curation pipeline needs —
 * a task retry with a seeded RNG would resample), and the DuckDB oracle
 * is value-level exact.
 */
object Sampling {

  /** Deterministic uniform in (0, 1]: (h + 1) / 2^32 where h is the first
   *  32 bits of md5(salt || id). Integer-to-double conversions are exact,
   *  so the value is bit-identical across engines. */
  private def u01(salt: String, id: Column): Column =
    (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0

  /**
   * Priority sampling (Duffield–Lund–Thorup): each row gets priority
   * w / u with u ~ Uniform(0,1]; the top-k by priority is a weighted
   * sample without replacement whose subset-sum estimators are unbiased.
   *
   * Scale shape: one narrow projection + a TakeOrderedAndProject — no
   * shuffle beyond the top-k's partial orderings. Priorities are rounded
   * to 6 dp BEFORE the cut with id tie-break (the engine-wide near-tie
   * discipline), so the selected set is stable across engines.
   */
  def prioritySample(df: DataFrame, idCol: String, weight: Column, k: Int,
                     salt: String = "ps:"): DataFrame =
    df.select(col(idCol), weight.cast("double").as("weight"))
      .withColumn("priority", round(col("weight") / u01(salt, col(idCol)), 6))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)

  /**
   * Mixture sampling — hit target per-group token shares with one
   * deterministic Bernoulli pass: group g keeps each row with rate
   * min(1, share_g · budget / size_g) where budget = budgetFrac · total
   * corpus size, so the expected kept size per group is proportional to
   * the requested mixture (capped at "keep everything" for groups smaller
   * than their allocation — the standard up-to-availability semantics of
   * training-data mixing).
   *
   * Scale shape: per-group totals are a map-side-combined aggregate with
   * one row per group, cross-joined back BROADCAST; the keep decision is
   * a narrow filter. Nothing shuffles by row.
   *
   * Returns one row per group: (group, keep_rate, n_kept, size_kept).
   */
  def mixtureSample(df: DataFrame, groupCol: String, sizeCol: String,
                    idCol: String, shares: Map[String, Double],
                    budgetFrac: Double, salt: String = "mix:"): DataFrame = {
    val totals = df.groupBy(col(groupCol)).agg(sum(col(sizeCol)).as("group_size"))
    val grand = df.agg(sum(col(sizeCol)).as("total_size"))
    val share = shares.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (g, v)) =>
        when(col(groupCol) === g, lit(v)).otherwise(acc)
      }
    val rates = totals.crossJoin(broadcast(grand))
      .select(col(groupCol),
        least(lit(1.0),
          (share * (lit(budgetFrac) * col("total_size"))) / col("group_size"))
          .as("rate"))
    df.select(col(groupCol), col(sizeCol), col(idCol))
      .join(broadcast(rates), Seq(groupCol))
      .filter(u01(salt, col(idCol)) < col("rate"))
      .groupBy(col(groupCol), round(col("rate"), 6).as("keep_rate"))
      .agg(count(lit(1)).as("n_kept"), sum(col(sizeCol)).as("size_kept"))
  }
}
