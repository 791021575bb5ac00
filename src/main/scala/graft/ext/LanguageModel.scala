package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * In-domain n-gram language-model quality scoring (the CCNet-style
 * curation signal: score candidate documents by how well a language
 * model trained on in-domain text predicts them; low average log-prob =
 * out-of-domain / garbled / boilerplate). Pure DataFrame algebra — an
 * add-α-smoothed bigram model is counts + one join, no external LM
 * runtime — so the whole path is value-checkable by the DuckDB oracle
 * (q_lm_score) and stays on the codegen path.
 *
 * Model: P(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·V) with V = |vocab|;
 * a document's score is the mean ln P over its bigrams (with
 * multiplicity). Documents with no bigrams (<2 words) drop out — they
 * carry no signal under a bigram model.
 *
 * Scale shape (100 TB): the count tables are VOCABULARY-bounded, not
 * corpus-bounded — c(w₁w₂)/c(w₁·) grow with distinct n-grams, which
 * saturates long before the corpus does (and a production run prunes to
 * top-K counts, turning the scoring join into a broadcast). The scoring
 * join shuffles by bigram with map-side combined counts on the model
 * side; training and scoring corpora are independent inputs, so the
 * model trains once and scores any number of candidate batches.
 */
object LanguageModel {

  private def words(textCol: Column): Column =
    when(length(trim(textCol)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(textCol)), "\\s+"))

  /** Raw bigram strings "w1 w2" per doc, WITH multiplicity (unlike the
   *  dedup shingles, which are distinct sets — an LM needs counts). */
  private def bigrams(textCol: Column): Column = {
    val w = words(textCol)
    // size<2 would make sequence(0, size-2) descend — empty array instead
    when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2), i =>
        concat(element_at(w, i + 1), lit(" "), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Score `df`'s documents under a bigram model trained on `train`
   * (pass the same frame for in-domain self-scoring). Returns
   * (id, n_bigrams, avg_logp) — avg_logp rounded to 6 decimals so the
   * cross-engine float-sum order and libm-log ulp differences cannot
   * surface in the oracle hash (same precedent as the quality score).
   */
  def score(df: DataFrame, textCol: String, idCol: String,
            train: DataFrame, trainTextCol: String,
            alpha: Double = 1.0): DataFrame = {
    val trainBi = train.select(explode(bigrams(col(trainTextCol))).as("bigram"))
    val c12 = trainBi.groupBy("bigram").agg(count(lit(1)).as("c12"))
    val c1 = trainBi.select(split(col("bigram"), " ").getItem(0).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = train.select(explode(words(col(trainTextCol))).as("w"))
      .select(countDistinct(col("w")).as("V"))

    // LEFT joins: bigrams unseen in training must SMOOTH (that is what α
    // is for — P = α/(c1+αV), or 1/V for a wholly unseen history), not
    // silently drop from the average
    df.select(col(idCol).as("id"), explode(bigrams(col(textCol))).as("bigram"))
      .join(c12, Seq("bigram"), "left")
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("id"),
        log((coalesce(col("c12"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("V"))).as("logp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("logp")), 6).as("avg_logp"))
  }
}
