package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Edge-list graph analytics. Companion of the connected-components
 * contraction in [[Dedup.duplicateComponents]]: where that operator
 * answers "which docs form one duplicate cluster", these answer
 * "which nodes matter" — fixed-iteration weighted PageRank and its
 * text-pipeline instantiation, TextRank keyword extraction (Mihalcea &
 * Tarau 2004: PageRank over the word co-occurrence graph).
 *
 * Scale shape: every iteration is one join of the (checkpointed,
 * degree-normalized) edge list against the current rank table plus one
 * dst-keyed aggregate — the standard distributed PageRank, shuffling
 * edges only; the rank table is node-bounded (vocab-bounded for
 * TextRank, so it broadcasts). Iteration count is FIXED (k small),
 * giving a deterministic unrolled lineage the DuckDB oracle replays as
 * chained CTEs — the same pattern as the Lloyd-iteration oracle of
 * q_ivf_trained; for large k, per-round `localCheckpoint` as in the
 * connected-components loop.
 */
object Graph {

  /**
   * Weighted PageRank over a directed edge list (src, dst, weight),
   * fixed `iters` iterations from uniform rank 1.0:
   *
   *   S(v) = (1 − d) + d · Σ_{u→v} (w_uv / wdeg(u)) · S(u)
   *
   * TextRank's formulation — no 1/N normalization, so scores center on
   * 1.0 and isolated-free symmetric graphs conserve total rank. Every
   * node must appear as a src (symmetric graphs do by construction);
   * dangling-node mass is dropped, as in the original paper.
   */
  def weightedPageRank(edges: DataFrame, damping: Double = 0.85,
                       iters: Int = 3): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(sum(col("weight")).as("wdeg"))
    // normalized edges feed every iteration: checkpoint once so the
    // co-occurrence count + degree join never re-executes per round
    val norm = edges.join(deg, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("wdeg").cast("double")).as("nw"))
      .localCheckpoint(true)
    var ranks = deg.select(col("src").as("node"), lit(1.0).as("score"))
    for (_ <- 1 to iters) {
      ranks = norm.join(ranks, norm("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(col("nw") * col("score")).as("contrib"))
        .select(col("dst").as("node"),
          (lit(1.0 - damping) + lit(damping) * col("contrib")).as("score"))
    }
    ranks
  }

  /**
   * TextRank keywords: adjacent-word co-occurrence edges (symmetric,
   * self-loops dropped), weighted PageRank, top-k words by
   * (score desc, word). The co-occurrence aggregate is map-side
   * combined and vocab²-bounded; the top-k cut is a TakeOrdered.
   */
  def textRank(df: DataFrame, textCol: String, damping: Double = 0.85,
               iters: Int = 3, k: Int = 20): DataFrame = {
    val grams = df.select(
      explode(graft.functions.GraftFunctions.graftWordNgrams(col(textCol), 2)).as("gram"))
    val pairs = grams.select(
      substring_index(col("gram"), " ", 1).as("a"),
      substring_index(col("gram"), " ", -1).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight"))
    weightedPageRank(edges, damping, iters)
      .select(col("node").as("word"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("word")).limit(k)
  }
}
