package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding vocabulary learning — the subword
 * tokenizer-training pass of an LLM data pipeline (Sennrich et al. 2016,
 * "Neural Machine Translation of Rare Words with Subword Units").
 *
 * The classic BPE trick makes this corpus-scale-friendly: the corpus is
 * read EXACTLY ONCE to build the distinct-word frequency table, and every
 * merge round thereafter runs over that vocab-bounded frame (millions of
 * rows at 100 TB, never the corpus). Each round is one map-side-combinable
 * pair-count aggregate, a single-row argmax collect (the same
 * bounded-collect discipline as Lloyd k-means training in
 * [[Similarity]]), and a narrow literal `replace` projection.
 *
 * Words are held in a SPACED representation — " a  b  c " for "abc":
 * every symbol flanked by one space per side, adjacent symbols sharing
 * none. Applying merge (x, y) is then the literal, non-overlapping,
 * left-to-right string replace of " x  y " → " xy ", which reproduces
 * BPE's greedy left-to-right merge order exactly (e.g. a a a → [aa, a]),
 * and single-space flanks keep the pattern anchored to whole symbols.
 * `replace` has identical semantics in Spark and DuckDB, so the unrolled
 * SQL oracle is value-exact round for round.
 */
object Bpe {

  /** " a  b  c " for "abc" — injective, so grouping by rep ≡ by word. */
  private[graft] def spacedRep(word: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** Distinct-word frequency table with spaced reps: (word, rep, freq).
   *  The one corpus-touching pass. `word` rides along (word ↔ rep is a
   *  bijection) so [[encode]] can join documents back to their final
   *  segmentation without re-deriving reps. */
  def wordFrame(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), spacedRep(col("word")).as("rep"), col("freq"))

  /** Freq-weighted adjacent-symbol pair counts over the current reps. */
  private def pairCounts(reps: DataFrame): DataFrame =
    reps.select(col("freq"), split(trim(col("rep")), "  ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i - 1] AS lhs, toks[i] AS rhs))")).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("pair_freq"))

  /** Learned merges plus the final symbolized word frame. Ties in a
   *  round's argmax break on (lhs, rhs) ascending — fully deterministic,
   *  and the identical ORDER BY in the oracle's unrolled rounds. Stops
   *  early if no pair remains (fully merged vocabulary). */
  def trainState(docs: DataFrame, textCol: String,
                 rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    var reps = wordFrame(docs, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      // single-row argmax: bounded collect, one row per round
      val best = pairCounts(reps)
        .orderBy(col("pair_freq").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, rr, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, rr, f))
        // literal-pattern merge; localCheckpoint truncates the per-round
        // lineage (vocab-bounded frame, same discipline as Lloyd rounds)
        reps = reps.select(col("word"),
          call_function("replace", col("rep"),
            lit(s" $l  $rr "), lit(s" $l$rr ")).as("rep"),
          col("freq")).localCheckpoint(true)
        r += 1
      }
    }
    (merges.toSeq, reps)
  }

  /** The merge table: (merge_rank, lhs, rhs, pair_freq), rank 1-based in
   *  merge order — the artifact a tokenizer loads. */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainState(docs, textCol, rounds)._1.toDF("merge_rank", "lhs", "rhs", "pair_freq")
  }

  /**
   * Per-document tokenization readout under the learned merges:
   * (id, n_words, n_tokens, fertility) — fertility = tokens/word, the
   * number every tokenizer ablation reports (Rust et al. 2021). The
   * corpus re-tokenizes by JOINING its exploded words to the final
   * (word → rep) frame — symbol counting, no per-document replay — so
   * the heavy side is one corpus-keyed equi-join against the
   * vocab-bounded word frame (AQE picks broadcast while the vocab fits,
   * shuffle-hash beyond that; we don't force broadcast precisely
   * because a 100 TB corpus's vocab may not fit a driver).
   */
  def encode(docs: DataFrame, textCol: String, idCol: String,
             rounds: Int): DataFrame = {
    val (_, reps) = trainState(docs, textCol, rounds)
    val tokCounts = reps.select(col("word"),
      size(split(trim(col("rep")), "  ")).as("__ntok"))
    docs.select(col(idCol), explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(tokCounts, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__ntok")).as("n_tokens"))
      .select(col(idCol), col("n_words"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_words"), 6).as("fertility"))
  }

  /** Corpus token counts under the learned segmentation: the top-k
   *  (token, cnt, rank) — the fertility/compression readout (how much of
   *  the corpus the learned subwords cover). Counts are freq-weighted
   *  over the word frame, never a second corpus scan. */
  def vocab(docs: DataFrame, textCol: String, rounds: Int, k: Int): DataFrame = {
    val (_, reps) = trainState(docs, textCol, rounds)
    val counts = reps
      .select(explode(split(trim(col("rep")), "  ")).as("token"), col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))
    // distributed top-k first (TakeOrderedAndProject); the unpartitioned
    // rank window then runs over ≤ k rows, never the vocab frame
    counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
  }
}
