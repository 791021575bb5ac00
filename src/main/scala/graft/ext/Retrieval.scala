package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval over a document corpus: BM25 scoring and top-k.
 *
 * Scale shape: the only aggregation is ONE single-row corpus-statistics
 * pass (N, avgdl, and one document-frequency counter per query term —
 * all map-side-combined), which is then cross-joined back BROADCAST. Per-
 * document term frequencies are pure Column algebra over the tokenized
 * text (no explode, no (doc, term) shuffle, no inverted index build), so
 * the scoring pass is narrow and the final top-k is a
 * TakeOrderedAndProject — at 100 TB the corpus is scanned exactly twice
 * (stats + score) and nothing ever shuffles by term.
 *
 * Determinism contract (oracle-mode): every arithmetic step is ordered
 * identically to the published DuckDB SQL (same association, same
 * constant folding), `ln` on both engines is the IEEE double libm, and
 * the score is rounded to 6 dp BEFORE the top-k cut with doc-id
 * tie-break — the same near-tie discipline as the LM scorer
 * ([[LanguageModel]]) and the PQ overfetch cut ([[Similarity]]).
 */
object Retrieval {

  /** Whitespace tokens of `text` (lowercased, trimmed); [] for blank text. */
  private def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(text)), "\\s+"))

  /**
   * Okapi BM25 top-k for a fixed bag of query terms.
   *
   * score(d) = Σ_t  ln((N − df_t + 0.5)/(df_t + 0.5) + 1) ·
   *            tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
   *
   * (the Lucene/ATIRE "+1" idf variant, so idf is always positive and
   * scores are monotone in tf). Returns (doc_id, bm25) for the `k`
   * highest-scoring documents with bm25 > 0, score rounded to 6 dp,
   * ties broken by doc id.
   */
  def bm25TopK(documents: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val withWords = documents
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("words"))
      .withColumn("dl", size(col("words")).cast("double"))

    // One-row corpus statistics: document count, average doc length, and
    // per-term document frequency. dl is integer-valued, so the avg's
    // double summation is exact (< 2^53) in any partition order.
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      queryTerms.zipWithIndex.map { case (term, i) =>
        sum(when(array_contains(col("words"), term), 1L).otherwise(0L))
          .cast("double").as(s"df_$i")
      }
    val stats = withWords.agg(statAggs.head, statAggs.tail: _*)

    val scored = withWords.crossJoin(broadcast(stats))
    val contribs = queryTerms.zipWithIndex.map { case (term, i) =>
      val tf = size(filter(col("words"), w => w === term)).cast("double")
      val df = col(s"df_$i")
      val idf = log((col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / col("avgdl")))
    }
    scored
      .select(col("doc_id"), round(contribs.reduce(_ + _), 6).as("bm25"))
      .filter(col("bm25") > 0.0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
