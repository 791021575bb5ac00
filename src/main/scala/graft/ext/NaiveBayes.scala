package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multinomial Naive Bayes over hashed unigram features — the trainable
 * tier of document classification (the heuristic tier is
 * [[TextAnalysis.languageId]] / [[TextAnalysis.qualityScore]]; fastText-
 * style linear classifiers are this plus a learned rather than
 * closed-form weight table). Train and score are one operator because
 * the count tables ARE the model: no gradient loop, a single corpus
 * pass, exactly the shape that scales.
 *
 * Model: add-α smoothed class-conditional bucket probabilities plus
 * log-priors, bucket = first 32 md5 bits of the word mod `buckets`
 * (the engine's cross-engine hash convention — value-level DuckDB
 * oracle).
 *
 * Scale shape: ONE tokenize into a (doc, bucket) partial aggregate;
 * the model table is (labels × buckets)-bounded and BROADCAST for
 * scoring, so the Zipfian token head never keys a shuffle (the same
 * hashing-trick argument as [[Sampling.dsirWeights]]); the per-doc
 * argmax rides a single doc-keyed window. Scores are rounded to 6 dp
 * before the argmax with label tie-break (engine-wide near-tie
 * discipline).
 */
object NaiveBayes {

  /**
   * Train on `df`'s (label, text) and score every row of the same
   * corpus: per doc the argmax-label and its rounded log-score, plus
   * the actual label and a correctness flag (in-corpus calibration —
   * the train/score-separable variant is a trivial recombination, cf.
   * the q_lm_transfer precedent). Docs with no tokens are absent.
   */
  def trainAndScore(df: DataFrame, textCol: String, labelCol: String,
                    idCol: String, buckets: Int = 128,
                    alpha: Double = 0.5): DataFrame =
    trainAndScoreSplit(df, textCol, labelCol, idCol, lit(true),
      buckets, alpha).drop("is_train")

  /**
   * Held-out evaluation variant: the model (priors + class-conditional
   * counts) is built from `isTrain` rows ONLY; every row — train and
   * held-out — is scored against it. Filtering at the count-table
   * level keeps the single-tokenize shape; with a hash-based
   * [[Sampling.splitLabel]] as the filter this is the leakage-free
   * accuracy readout (generalization, not memorization).
   */
  def trainAndScoreSplit(df: DataFrame, textCol: String, labelCol: String,
                         idCol: String, isTrain: Column,
                         buckets: Int = 128, alpha: Double = 0.5): DataFrame = {
    // first-32-md5-bits bucket via the fused native expression (r16):
    // one digest per token, no 32-char hex round-trip, no conv parse —
    // value-identical to conv(substring(md5(w), 1, 8), 16, 10)
    val bucket = pmod(
      graft.functions.GraftFunctions.graftMd5PrefixLong(col("w"), 8), lit(buckets.toLong))
    val toks = df.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        isTrain.as("is_train"),
        explode(graft.functions.GraftFunctions.graftWordNgrams(col(textCol), 1)).as("w"))
      .select(col("doc_id"), col("label"), col("is_train"), bucket.as("bucket"))
    // one corpus tokenize feeding model AND scoring (the DSIR pattern)
    val perDoc = toks.groupBy(col("doc_id"), col("label"), col("is_train"),
        col("bucket"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)

    val train = perDoc.filter(col("is_train"))
    val spark = df.sparkSession
    // bounded-state truncation (the trainCentroids localize posture):
    // the model-side tables are at most labels·buckets rows, so one
    // distributed aggregate each is collected and every derived table is
    // a LocalRelation — no tiny exchanges, no checkpoint re-reads
    def localize(d2: DataFrame): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(d2.collect(): _*), d2.schema)
    // ONE training-corpus scan yields per-label doc counts; nDocs is
    // their sum (was: a separate count() scan PLUS a priors scan)
    val labCounts = localize(df.filter(isTrain)
      .groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("cnt")))
    val nDocs = labCounts.agg(sum(col("cnt"))).head().getLong(0).toDouble
    val priors = labCounts
      .select(col("label"), log(col("cnt").cast("double") / lit(nDocs)).as("log_prior"))
    val cyb = localize(
      train.groupBy(col("label"), col("bucket")).agg(sum(col("tf")).as("c")))
    // ny and the model support are exactly derivable from cyb (integer
    // sums commute): ny = Σ_bucket c per label; buckets = distinct in cyb
    // (was: two more aggregates re-reading the perDoc checkpoint)
    val ny = cyb.groupBy(col("label")).agg(sum(col("c")).as("n"))
    // model support = buckets seen in TRAINING; a held-out token whose
    // bucket never occurred in training simply contributes nothing (the
    // standard hashing-NB treatment of unseen features)
    val allBuckets = cyb.select(col("bucket")).distinct()
    val model = priors.select(col("label")).crossJoin(allBuckets)
      .join(cyb, Seq("label", "bucket"), "left")
      .join(ny, Seq("label"))
      .select(col("label"), col("bucket"),
        log((coalesce(col("c"), lit(0L)).cast("double") + lit(alpha)) /
            (col("n").cast("double") + lit(alpha) * lit(buckets.toDouble)))
          .as("log_pb"))

    val scored = perDoc.select(col("doc_id"), col("label").as("actual"),
        col("is_train"), col("bucket"), col("tf"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"), col("actual"), col("is_train"), col("label"))
      .agg(sum(col("tf").cast("double") * col("log_pb")).as("ll"))
      .join(broadcast(priors), Seq("label"))
      .select(col("doc_id"), col("actual"), col("is_train"), col("label"),
        round(col("log_prior") + col("ll"), 6).as("score"))
    // argmax as a hash AGGREGATE (the pqTopK max_by precedent): min_by
    // over (-score, label) = highest score, lowest label on ties — the
    // exact row_number()-over-(score desc, label) ordering — with no
    // sort exchange and map-side partial aggregation
    scored.groupBy(col("doc_id"), col("actual"), col("is_train"))
      .agg(min_by(struct(col("label"), col("score")),
        struct((-col("score")).as("ns"), col("label"))).as("m"))
      .select(col("doc_id"), col("m.label").as("predicted"),
        col("m.score").as("score"), col("actual"),
        (col("m.label") === col("actual")).as("correct"), col("is_train"))
  }
}
