package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    (graft.functions.GraftFunctions.graftMd5PrefixLong(
      concat(lit(salt), id.cast("string")), 8)
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
   * Per-group quality cap — the web-curation "at most `cap` documents
   * per domain/source" quota (the anti-concentration rule every large
   * crawl-derived corpus applies so one prolific domain cannot dominate
   * the training mix). Within each group the `cap` highest-`quality`
   * rows win; ties break by `idCol` ascending. Quality is expected
   * 6-dp-rounded by the caller (the engine-wide near-tie discipline),
   * so the kept set is stable across engines.
   *
   * Scale shape: one rank window per group — each group's slice sorts,
   * bounded by the LARGEST group (domains are ≪ corpus; a pathological
   * mega-domain is exactly the row-explosion this cap exists to remove,
   * and AQE skew handling splits its sort). No global sort, no driver
   * state.
   *
   * Returns the kept rows: (group, id, quality_score, quality_rank).
   */
  def qualityCap(df: DataFrame, groupCol: String, idCol: String,
                 quality: Column, cap: Int): DataFrame = {
    val scored = df.select(col(groupCol), col(idCol), quality.as("quality_score"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("quality_score").desc, col(idCol))
    scored.withColumn("quality_rank", row_number().over(w))
      .filter(col("quality_rank") <= cap)
  }

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

  /**
   * Exact-k-per-group uniform sample without replacement — the
   * deterministic counterpart of per-stratum reservoir sampling: within
   * each group the k rows with the lowest (md5(salt ∥ id), id) win. A
   * fixed hash order IS a uniform draw (any exchangeable total order on
   * a uniform hash family selects each k-subset equiprobably), with the
   * reproducibility the md5-threshold Bernoulli variant
   * (q_stratified_sample) already has — but an exact count, not an
   * expected one.
   *
   * Scale: one rank window per group — group slices sort, bounded by the
   * LARGEST group (same contract as the percent_rank calibration
   * window); for corpus-sized groups prefer the Bernoulli variant or
   * priority sampling's global TakeOrdered.
   */
  def groupSample(df: DataFrame, groupCol: String, idCol: String, k: Int,
                  salt: String = "gs:"): DataFrame = {
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(key, col(idCol))
    df.select(col(groupCol), col(idCol), key.as("sample_key"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Quality-ordered budget fill — per-group "take the best documents
   * until the token budget is spent" selection, at QUALITY-BUCKET
   * granularity: a (group, quality) bucket is kept iff the total size of
   * all strictly-better buckets in its group is under the group's budget
   * (budgetFrac × the group's total size). Overshoot is bounded by one
   * bucket; quality is expected 6-dp-rounded (the engine-wide near-tie
   * discipline), so buckets are exact equality classes in both engines.
   *
   * Deliberately NOT a per-row rank: `row_number` over
   * `partitionBy(group).orderBy(quality)` sorts each group's entire
   * corpus slice — for a language that is most of a 100 TB corpus, a
   * single-reducer sort. Here the heavy data only does two map-side-
   * combinable aggregates and a broadcast semi-join; the only window
   * runs over the tiny (group × distinct-quality) bucket frame.
   *
   * Returns one row per group:
   * (group, q_threshold = min kept quality, n_kept, size_kept).
   */
  def budgetFill(df: DataFrame, groupCol: String, sizeCol: String,
                 quality: Column, budgetFrac: Double): DataFrame = {
    val scored = df.select(col(groupCol).as("__g"),
      col(sizeCol).cast("long").as("__sz"), quality.as("__q"))
    val buckets = scored.groupBy(col("__g"), col("__q"))
      .agg(sum(col("__sz")).as("__bucket_sz"))
    // group totals from the tiny bucket frame, NOT a second corpus
    // aggregate (which would re-evaluate the quality expression over
    // every row); long sums are associative so the value is identical
    val totals = buckets.groupBy(col("__g")).agg(sum(col("__bucket_sz")).as("__total_sz"))
    val wPrev = Window.partitionBy(col("__g")).orderBy(col("__q").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keep = buckets
      .withColumn("__cum_before", coalesce(sum(col("__bucket_sz")).over(wPrev), lit(0L)))
      .join(totals, "__g")
      .filter(col("__cum_before").cast("double") <
        lit(budgetFrac) * col("__total_sz").cast("double"))
      .select(col("__g"), col("__q"))
    scored.join(broadcast(keep), Seq("__g", "__q"))
      .groupBy(col("__g").as(groupCol))
      .agg(min(col("__q")).as("q_threshold"), count(lit(1)).as("n_kept"),
        sum(col("__sz")).as("size_kept"))
  }

  /**
   * Temperature-scaled source mixing weights (the T5 / Pile / XLM-R
   * recipe): sampling probability p_g ∝ n_g^α with α ∈ (0, 1] —
   * α = 1 is proportional (big sources dominate), α → 0 is uniform
   * (small sources oversampled). Reports, per group: its token count,
   * natural share, temperature-scaled share, and the effective
   * up/down-sampling factor (scaled share / natural share) — the
   * number a training loader multiplies each source's epoch rate by.
   *
   * One map-side-combined group aggregate; the normalizer is a 1-row
   * broadcast. Shares round to 6 dp.
   */
  def temperatureMixWeights(df: DataFrame, groupCol: String,
                            sizeCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    val sizes = df.groupBy(col(groupCol).as("group"))
      .agg(sum(col(sizeCol).cast("long")).as("n_tokens"))
    val totals = sizes.agg(sum(col("n_tokens")).as("total"),
      sum(pow(col("n_tokens").cast("double"), lit(alpha))).as("z"))
    sizes.crossJoin(broadcast(totals))
      .select(col("group"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total").cast("double"), 6)
          .as("natural_share"),
        round(pow(col("n_tokens").cast("double"), lit(alpha)) / col("z"), 6)
          .as("scaled_share"),
        round((pow(col("n_tokens").cast("double"), lit(alpha)) / col("z")) /
          (col("n_tokens").cast("double") / col("total").cast("double")), 6)
          .as("sampling_factor"))
  }

  /**
   * Deterministic train/val/test split assignment: the md5-uniform of
   * the salted id lands in cumulative fraction bands (first-wins when
   * chain, the last split takes the remainder). Hash-based, so the
   * assignment is stable under re-runs, retries, corpus growth and
   * reshuffling — the property that makes the split safe to recompute
   * anywhere (a seeded RNG split is none of those). Pure narrow
   * Column; cross-engine exact (the same md5 u01 as the samplers).
   */
  def splitLabel(id: Column, fracs: Seq[(String, Double)],
                 salt: String = "split:"): Column = {
    require(fracs.size >= 2, "need at least two splits")
    val u = u01(salt, id)
    val uppers = fracs.map(_._2).scanLeft(0.0)(_ + _).tail
    fracs.dropRight(1).zip(uppers.dropRight(1)).reverse
      .foldLeft(lit(fracs.last._1)) { case (acc, ((name, _), upper)) =>
        when(u < lit(upper), lit(name)).otherwise(acc)
      }
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every document
   * by how much more likely its hashed-unigram bag is under the TARGET
   * domain's token distribution than under the raw corpus':
   *
   *   weight(d) = Σ_tokens [ ln p_t(bucket) − ln p_r(bucket) ]
   *
   * with add-α smoothed bucket probabilities, bucket = first 32 md5
   * bits of the word mod `buckets` (the engine's cross-engine hash
   * convention, value-level oracle-able). `isTarget` marks the
   * in-domain rows (both distributions come from the one corpus pass).
   *
   * Scale shape: the corpus tokenizes ONCE into a (doc, bucket) partial
   * aggregate (map-side combined); both count tables and the log-ratio
   * table derive from that aggregate and are bucket-bounded (≤
   * `buckets` rows) so the scoring join is a broadcast — no
   * Zipfian-keyed shuffle anywhere (the hashing trick flattens the
   * token head into buckets by construction). Selection downstream is a
   * TakeOrdered on (weight desc, id), never a global sort. Weights are
   * rounded to 6 dp (engine-wide near-tie discipline).
   */
  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
                  isTarget: Column, buckets: Int = 256,
                  alpha: Double = 0.5): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), isTarget.as("is_target"),
      explode(graft.functions.GraftFunctions.graftWordNgrams(col(textCol), 1)).as("w"))
    val bucket = pmod(
      graft.functions.GraftFunctions.graftMd5PrefixLong(col("w"), 8), lit(buckets.toLong))
    // perDoc fans out to four consumers (raw, tgt, totals, scoring);
    // localCheckpoint pins it so the corpus tokenize runs ONCE (the
    // corpus-curation precedent), at (docs × ≤buckets) rows
    val perDoc = toks.groupBy(col("doc_id"), col("is_target"), bucket.as("bucket"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val raw = perDoc.groupBy(col("bucket")).agg(sum(col("tf")).as("cr"))
    val tgt = perDoc.filter(col("is_target"))
      .groupBy(col("bucket")).agg(sum(col("tf")).as("ct"))
    val totals = raw.join(tgt, Seq("bucket"), "left")
      .agg(sum(col("cr")).as("nr"), sum(coalesce(col("ct"), lit(0L))).as("nt"))
    val denom = lit(alpha) * lit(buckets.toDouble)
    val ratio = raw.join(tgt, Seq("bucket"), "left").crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + lit(alpha)) /
             (col("nt").cast("double") + denom)) -
         log((col("cr").cast("double") + lit(alpha)) /
             (col("nr").cast("double") + denom))).as("lr"))
    perDoc.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("tf").cast("double") * col("lr")), 6).as("weight"))
  }
}
