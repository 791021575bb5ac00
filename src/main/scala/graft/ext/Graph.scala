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

  /**
   * Triangle census over an undirected edge list: distinct canonical
   * edges (a < b), wedge enumeration pivoting on the middle node, and
   * a closing-edge semi-probe — the standard two-join distributed
   * triangle count (each triangle a < b < c found exactly once), plus
   * the global clustering coefficient 3·triangles / wedges.
   *
   * Scale shape: both joins are node-keyed equi-joins on the deduped
   * edge list — no all-pairs stage; wedge fan-out is Σ deg², the
   * algorithm's inherent cost, and a hot hub is an AQE skew-split
   * (or a degree-cap pre-filter, the standard mitigation). The wedge
   * stream is never materialized — it flows straight into the
   * closing-edge join.
   *
   * `edges` schema: (a, b), any orientation/duplication — canonicalized
   * and deduped here.
   */
  def triangleStats(edges: DataFrame): DataFrame = {
    // canonical deduped edge set feeds four branches: checkpoint once
    val canon = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val ends = canon.select(col("a").as("v"))
      .unionAll(canon.select(col("b").as("v")))
    val nodeCnt = ends.distinct().agg(count(lit(1)).as("n_nodes"))
    val edgeCnt = canon.agg(count(lit(1)).as("n_edges"))
    // undirected degree -> wedge count per node: deg·(deg−1)/2
    val wedgeCnt = ends
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .agg(sum(col("deg") * (col("deg") - 1) / 2).as("wedges"))
    // wedge a<b<c pivoting on b, closed by the (a,c) edge; the wedge
    // stream flows straight into the closing join, never materialized
    val e1 = canon.select(col("a").as("x"), col("b").as("y"))
    val e2 = canon.select(col("a").as("y2"), col("b").as("z"))
    val triCnt = e1
      .join(e2, col("y") === col("y2"))
      .select(col("x"), col("z"))
      .join(canon, col("x") === canon("a") && col("z") === canon("b"))
      .agg(count(lit(1)).as("n_triangles"))
    nodeCnt.crossJoin(edgeCnt).crossJoin(triCnt).crossJoin(wedgeCnt)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        round(when(col("wedges") > 0,
          lit(3.0) * col("n_triangles") / col("wedges"))
          .otherwise(lit(0.0)), 6).as("global_clustering"))
  }

  /**
   * k-hop BFS distance from a seed set over an undirected edge list:
   * min hops (0 for seeds) to every node within `maxHops`, the bounded
   * frontier expansion behind fraud-ring discovery and GNN
   * neighborhood sampling. Each round is one join of the CURRENT
   * frontier (nodes first reached last round — not the whole reached
   * set) against the symmetrized edge list plus one min-aggregate;
   * fixed `maxHops` unrolls into the oracle as chained CTEs, and every
   * round localCheckpoints so the lineage stays flat.
   *
   * `edges` schema: (a, b), symmetrized here; `seeds`: (node).
   */
  def khopDistances(edges: DataFrame, seeds: DataFrame,
                    maxHops: Int): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var reached = seeds.select(col("node"), lit(0).as("dist"))
      .distinct().localCheckpoint(true)
    var frontier = reached
    for (h <- 1 to maxHops) {
      val next = frontier.join(sym, col("node") === col("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(reached.select(col("node").as("_seen")),
          col("node") === col("_seen"), "left_anti")
        .select(col("node"), lit(h).as("dist"))
        .localCheckpoint(true)
      // reached = a UNION of already-checkpointed layers — flat lineage
      // (≤ maxHops checkpointed legs) with no materialization job of its
      // own; re-checkpointing the union each round (the r14 form) paid
      // one extra eager job per hop for zero lineage benefit (r16)
      reached = reached.unionAll(next)
      frontier = next
    }
    reached
  }
}
