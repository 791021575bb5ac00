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
 * saturates long before the corpus does. The scoring joins BROADCAST the
 * count tables: the corpus's exploded bigrams never shuffle at all
 * (a bigram-keyed exchange would put every "of the" occurrence on one
 * reducer — Zipfian keys make that THE scale bottleneck, measured 12 s
 * of an 88-query bench at sf0.1 before this change). Because the model
 * MUST broadcast, it must also be BOUNDED: `score` counts the trained
 * bigram table (a cheap scan of the eagerly-checkpointed aggregate) and,
 * if it exceeds `maxBroadcastModelRows` (default 2M rows ≈ low hundreds
 * of MB — inside a sane executor/driver broadcast budget), auto-prunes
 * to the top `maxBroadcastModelRows` counts before broadcasting. Callers
 * can prune harder with `topK` (TakeOrderedAndProject — distributed
 * partial top-K, no global sort); a pruned-away bigram is simply an
 * unseen one, which is exactly what add-α smoothing is for. At test
 * scale the model sits far under the cap, so the default path is
 * byte-identical to the unpruned model; at 100 TB, where the distinct
 * bigram table is billions of rows, the cap is what keeps the driver
 * alive. Training and scoring corpora are independent inputs, so the
 * model trains once and scores any number of candidate batches.
 */
object LanguageModel {

  /** Broadcast budget for the trained model tables, in rows. A bigram
   *  row is ~tens of bytes (two short words + a long), so 2M rows keeps
   *  the broadcast low-hundreds-of-MB — bounded regardless of corpus
   *  size. Above this, `score` auto-prunes (top-K by count) rather than
   *  attempt an unbounded broadcast build on the driver. */
  val defaultMaxBroadcastModelRows: Int = 2000000

  private def words(textCol: Column): Column =
    when(length(trim(textCol)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(textCol)), "\\s+"))

  /** Raw bigram strings "w1 w2" per doc, WITH multiplicity (unlike the
   *  dedup shingles, which are distinct sets — an LM needs counts).
   *  Takes an already-materialized words ARRAY column, never the raw
   *  text: referencing the split expression inside a lambda would
   *  re-tokenize the document for every element access (measured 6 s of
   *  a 12 s query at sf0.1 doing exactly that), where zip_with over a
   *  bound column is one pass. */
  private def bigramsOf(w: Column): Column =
    when(size(w) >= 2,
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))

  /**
   * Score `df`'s documents under a bigram model trained on `train`
   * (pass the same frame for in-domain self-scoring). Returns
   * (id, n_bigrams, avg_logp) — avg_logp rounded to 6 decimals so the
   * cross-engine float-sum order and libm-log ulp differences cannot
   * surface in the oracle hash (same precedent as the quality score).
   */
  def score(df: DataFrame, textCol: String, idCol: String,
            train: DataFrame, trainTextCol: String,
            alpha: Double = 1.0, topK: Int = 0,
            maxBroadcastModelRows: Int = defaultMaxBroadcastModelRows): DataFrame = {
    val trainBi = train.select(words(col(trainTextCol)).as("ws"))
      .select(explode(bigramsOf(col("ws"))).as("bigram"))
    // Eagerly checkpoint the vocab-bounded count table: the corpus is
    // exploded exactly once, and the broadcast-budget count below plus
    // the two downstream consumers (c12 join, c1 derivation) all read
    // the materialized blocks instead of re-aggregating. NB this makes
    // score() eager — constructing the frame runs the training jobs,
    // and the checkpoint blocks stay pinned until the frame is GC'd:
    // the deliberate price of a size-checked broadcast (train once,
    // score many batches; a per-batch retrain loop should hold ONE
    // scored frame at a time).
    val c12All = trainBi.groupBy("bigram").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    // Safe-by-default broadcast: if the caller didn't prune (or asked
    // for a prune wider than the budget), cap at the budget — the model
    // side of the scoring join is NEVER unbounded, whatever the caller
    // passes.
    val effectiveK =
      if (topK > 0) math.min(topK, maxBroadcastModelRows)
      else if (c12All.count() > maxBroadcastModelRows) maxBroadcastModelRows
      else 0
    // c(w1·) = Σ c(w1w2): derived from the vocab-bounded c12 table, not a
    // second corpus-wide explode
    val c1All = c12All
      .select(split(col("bigram"), " ").getItem(0).as("w1"), col("c12"))
      .groupBy("w1").agg(sum(col("c12")).as("c1"))
    // topK pruning: orderBy(...).limit(K) plans as TakeOrderedAndProject
    // (per-partition top-K then a K-row merge — never a global sort);
    // deterministic tie-break on the key so both engines keep the same K
    val c12 = if (effectiveK > 0)
      c12All.orderBy(col("c12").desc, col("bigram")).limit(effectiveK)
    else c12All
    val c1 = if (effectiveK > 0)
      c1All.orderBy(col("c1").desc, col("w1")).limit(effectiveK)
    else c1All
    val v = train.select(explode(words(col(trainTextCol))).as("w"))
      .select(countDistinct(col("w")).as("V"))

    // LEFT joins, model side BROADCAST: bigrams unseen in training (or
    // pruned from the top-K model) must SMOOTH (that is what α is for —
    // P = α/(c1+αV), or 1/V for a wholly unseen history), not silently
    // drop from the average; and the Zipfian exploded-bigram stream must
    // never be the shuffle key
    df.select(col(idCol).as("id"), words(col(textCol)).as("ws"))
      .select(col("id"), explode(bigramsOf(col("ws"))).as("bigram"))
      .join(broadcast(c12), Seq("bigram"), "left")
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("id"),
        log((coalesce(col("c12"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("V"))).as("logp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("logp")), 6).as("avg_logp"))
  }

  /**
   * Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
   * smoothing every serious n-gram LM uses where [[score]]'s add-α is
   * the didactic baseline): absolute discounting of seen bigrams plus a
   * CONTINUATION back-off — a word's back-off mass is how many distinct
   * histories it follows, not how often it occurs, which is what stops
   * "francisco" (frequent, but only ever after "san") soaking up
   * back-off probability.
   *
   *   P(w₂|w₁) = max(c₁₂−d, 0)/c₁ + (d·N₁₊(w₁·)/c₁)·P_cont(w₂)
   *   P_cont(w₂) = (N₁₊(·w₂) + 1) / (D + V + 1)
   *
   * with N₁₊ the distinct-continuation/history counts, D the distinct
   * bigram types, and P_cont add-1 smoothed over V+1 outcomes (vocab +
   * unseen) so unseen words keep nonzero mass; a wholly unseen history
   * backs off to P_cont alone. Same scale discipline as [[score]]: one
   * corpus explode into a checkpointed vocab-bounded count table, every
   * derived table (histories, continuations, totals) rolls up from it,
   * the model side of the scoring join is broadcast under the same
   * auto-prune budget, and avg_logp rounds to 6 dp. Returns
   * (id, n_bigrams, avg_logp).
   */
  def kneserNeyScore(df: DataFrame, textCol: String, idCol: String,
                     train: DataFrame, trainTextCol: String,
                     discount: Double = 0.75, topK: Int = 0,
                     maxBroadcastModelRows: Int = defaultMaxBroadcastModelRows): DataFrame = {
    val trainBi = train.select(words(col(trainTextCol)).as("ws"))
      .select(explode(bigramsOf(col("ws"))).as("bigram"))
    val c12All = trainBi.groupBy("bigram").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val effectiveK =
      if (topK > 0) math.min(topK, maxBroadcastModelRows)
      else if (c12All.count() > maxBroadcastModelRows) maxBroadcastModelRows
      else 0
    val c12 = if (effectiveK > 0)
      c12All.orderBy(col("c12").desc, col("bigram")).limit(effectiveK)
    else c12All
    // every model table derives from the (possibly pruned) bigram table,
    // so the model stays self-consistent under pruning
    val split12 = c12.select(col("bigram"), col("c12"),
      split(col("bigram"), " ").getItem(0).as("w1"),
      split(col("bigram"), " ").getItem(1).as("w2"))
    val hist = split12.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
    val cont = split12.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val totals = cont.agg(sum(col("n1b")).as("D"))
    val v = train.select(explode(words(col(trainTextCol))).as("w"))
      .select(countDistinct(col("w")).as("V"))

    val pcont = (coalesce(col("n1b"), lit(0L)) + lit(1L)) /
      (col("D") + col("V") + lit(1L))
    val d = lit(discount)
    df.select(col(idCol).as("id"), words(col(textCol)).as("ws"))
      .select(col("id"), explode(bigramsOf(col("ws"))).as("bigram"))
      .join(broadcast(c12), Seq("bigram"), "left")
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(broadcast(hist), Seq("w1"), "left")
      .join(broadcast(cont), Seq("w2"), "left")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(v))
      .select(col("id"),
        log(when(col("c1").isNotNull,
          greatest(coalesce(col("c12"), lit(0L)) - d, lit(0.0)) / col("c1") +
            (d * col("n1f") / col("c1")) * pcont)
          .otherwise(pcont)).as("logp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("logp")), 6).as("avg_logp"))
  }

  /**
   * PMI collocation mining (Church & Hanks 1990, "Word Association Norms,
   * Mutual Information, and Lexicography"): score word pairs by
   * pointwise mutual information
   *
   *   pmi(w₁,w₂) = ln( (c₁₂/N_b) / ((c(w₁)/N_w) · (c(w₂)/N_w)) )
   *
   * with c₁₂ the bigram count, N_b total bigrams, c(w) unigram counts,
   * N_w total words. High-PMI pairs are collocations ("new york");
   * frequent-but-independent pairs score near 0 — the standard phrase
   * and multi-word-expression detector over a pretraining corpus.
   *
   * Scale shape: the corpus tokenizes once into two map-side-combined
   * count aggregates; everything after operates on VOCABULARY-bounded
   * tables — the unigram table joins back BROADCAST, the totals are
   * 1-row broadcasts derived from the count tables (never a second
   * corpus pass), and the top-k plans as TakeOrderedAndProject. PMI is
   * rounded to 6 dp BEFORE the cut with a bigram tie-break (the engine's
   * near-tie discipline), and the ln argument is parenthesized
   * identically in the DuckDB oracle so the double arithmetic is
   * bit-reproducible.
   *
   * Returns the `k` highest-PMI bigrams with count ≥ `minCount`:
   * (bigram, c12, pmi).
   */
  /**
   * A-priori 2-itemset mining over document word SETS — market-basket
   * co-occurrence (which words appear in the same documents, regardless
   * of position — the document-level complement of the adjacency-based
   * [[pmiCollocations]]). Classic two-phase a-priori: frequent single
   * words first (support ≥ `minSupport` docs), then pairs of FREQUENT
   * words counted within documents — the candidate pruning that keeps
   * the pair space polynomial in the frequent-vocab, not the corpus.
   * Emits support, directional confidences, and lift, top-`k` by
   * (lift desc, pair) — lift > 1 ⇒ genuinely associated topics.
   *
   * Shape: distinct (doc, word) collapse (map-side combined), a
   * broadcast frequent-word filter, and a doc-keyed self-join whose
   * per-doc fan-out is bounded by the doc's FREQUENT-word count.
   */
  def frequentItemPairs(df: DataFrame, textCol: String, idCol: String,
                        minSupport: Long = 5L, k: Int = 50): DataFrame = {
    val docWords = df.select(col(idCol).as("doc_id"),
        explode(graft.functions.GraftFunctions.graftWordNgrams(col(textCol), 1)).as("w"))
      .distinct()
      .localCheckpoint(true) // feeds supports AND the pair join
    val nDocs = docWords.select(col("doc_id")).distinct().count().toDouble
    val freq = docWords.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSupport)
    val fw = docWords.join(broadcast(freq), Seq("w"))
    val pairs = fw.select(col("doc_id"), col("w").as("w1"), col("c").as("c1"))
      .join(fw.select(col("doc_id"), col("w").as("w2"), col("c").as("c2")),
        Seq("doc_id"))
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2"), col("c1"), col("c2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minSupport)
    pairs.select(col("w1"), col("w2"), col("c12").as("support"),
        round(col("c12").cast("double") / col("c1").cast("double"), 6)
          .as("conf_w1_w2"),
        round(col("c12").cast("double") / col("c2").cast("double"), 6)
          .as("conf_w2_w1"),
        round(lit(nDocs) * col("c12").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double")), 6).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2")).limit(k)
  }

  /**
   * Corpus bigram conditional entropy H(w₂|w₁) = −Σ p(w₁,w₂) ln p(w₂|w₁)
   * (plus the unigram entropy H(w) for reference) — the corpus
   * predictability scalar: templated/boilerplate corpora approach 0
   * (every word determines the next), natural prose sits well above.
   * Maximum-likelihood estimates over observed bigrams, no smoothing
   * (entropy of the EMPIRICAL distribution — exactly replayable).
   *
   * Shape: the bigram and unigram count aggregates (map-side combined)
   * and two scalar reductions. p(w₂|w₁) = c(w₁,w₂)/c(w₁) joins the
   * bigram table to the unigram table on w₁ — BOTH sides are
   * vocab-bounded aggregates, so the join carries no forced broadcast
   * hint: AQE converts it to a runtime broadcast while the unigram
   * table is small and falls back to a shuffle join (with skew-split)
   * when it isn't. Shuffle skew is bounded too: the hottest w₁ fans
   * out to at most its distinct-successor count, vocab-bounded — the
   * corpus never enters this join.
   */
  def bigramConditionalEntropy(df: DataFrame, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val bi = df.select(explode(bigramsOf(ws)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
    val uni = df.select(explode(
        graft.functions.GraftFunctions.graftWordNgrams(col(textCol), 1)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val nb = bi.agg(sum(col("c12")).as("nb"))
    val nw = uni.agg(sum(col("c1")).as("nw"))
    val w1 = substring_index(col("bigram"), " ", 1)
    val cond = bi
      .join(uni.select(col("w").as("__w1"), col("c1")), w1 === col("__w1"))
      .crossJoin(broadcast(nb))
      .agg((-sum((col("c12").cast("double") / col("nb").cast("double")) *
        log(col("c12").cast("double") / col("c1").cast("double")))).as("h_cond"))
    val hUni = uni.crossJoin(broadcast(nw))
      .agg((-sum((col("c1").cast("double") / col("nw").cast("double")) *
        log(col("c1").cast("double") / col("nw").cast("double")))).as("h_uni"))
    cond.crossJoin(hUni)
      .select(round(col("h_cond"), 6).as("h_bigram_cond"),
        round(col("h_uni"), 6).as("h_unigram"),
        round(col("h_uni") - col("h_cond"), 6).as("mutual_information"))
  }

  /**
   * Pairwise Jensen–Shannon divergence between per-group token
   * distributions (hashed to `buckets`, add-α smoothed over the
   * corpus-wide bucket support) — the corpus-composition analytic that
   * answers "which sources say the same things" (near-zero JS ⇒
   * redundant sources, candidates for deduplication across sources)
   * and "did this source drift between snapshots". Symmetric, bounded
   * by ln 2, defined even for disjoint vocabularies — the reasons JS
   * beats raw KL here.
   *
   * Shape: one tokenize into a (group, bucket) partial aggregate; the
   * distribution table is (groups × buckets)-bounded, so the pair
   * join is a broadcast self-join over at most g·B rows — corpus size
   * never enters the pair computation. Emits (src_a, src_b,
   * js_divergence) for src_a < src_b, rounded 6 dp.
   */
  def jsDivergenceMatrix(df: DataFrame, textCol: String, groupCol: String,
                         buckets: Int = 256, alpha: Double = 0.5): DataFrame = {
    val bucket = pmod(
      graft.functions.GraftFunctions.graftMd5PrefixLong(col("w"), 8), lit(buckets.toLong))
    val counts = df.select(col(groupCol).as("grp"),
        explode(graft.functions.GraftFunctions.graftWordNgrams(col(textCol), 1)).as("w"))
      .select(col("grp"), bucket.as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val support = counts.select(col("bucket")).distinct()
    val totals = counts.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val denomAdd = lit(alpha) * lit(buckets.toDouble)
    val dist = totals.select(col("grp"), col("n")).crossJoin(support)
      .join(counts, Seq("grp", "bucket"), "left")
      .select(col("grp"), col("bucket"),
        ((coalesce(col("c"), lit(0L)).cast("double") + lit(alpha)) /
          (col("n").cast("double") + denomAdd)).as("p"))
    val a = dist.select(col("grp").as("src_a"), col("bucket"), col("p").as("pa"))
    val b = dist.select(col("grp").as("src_b"), col("bucket"), col("p").as("pb"))
    a.join(b, Seq("bucket")).filter(col("src_a") < col("src_b"))
      .withColumn("m", (col("pa") + col("pb")) / lit(2.0))
      .groupBy(col("src_a"), col("src_b"))
      .agg(round(
        lit(0.5) * sum(col("pa") * log(col("pa") / col("m"))) +
        lit(0.5) * sum(col("pb") * log(col("pb") / col("m"))), 6)
        .as("js_divergence"))
  }

  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 5L, k: Int = 50): DataFrame = {
    val ws = df.select(words(col(textCol)).as("ws"))
    val c12 = ws.select(explode(bigramsOf(col("ws"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c12"))
    val c1 = ws.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // totals from the count tables (vocab-bounded), not the corpus
    val nb = c12.agg(sum(col("c12")).cast("double").as("Nb"))
    val nw = c1.agg(sum(col("c")).cast("double").as("Nw"))
    c12.filter(col("c12") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(broadcast(c1.select(col("w").as("w1"), col("c").as("cw1"))), Seq("w1"))
      .join(broadcast(c1.select(col("w").as("w2"), col("c").as("cw2"))), Seq("w2"))
      .crossJoin(broadcast(nb))
      .crossJoin(broadcast(nw))
      .select(col("bigram"), col("c12"),
        round(log((col("c12").cast("double") / col("Nb")) /
          ((col("cw1").cast("double") / col("Nw")) *
            (col("cw2").cast("double") / col("Nw")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
  }
}
