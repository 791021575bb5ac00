package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Graph

/** Weighted PageRank / TextRank semantics on hand-built graphs. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one iteration on a 2-node symmetric graph is exact") {
    // a <-> b, equal weights: nw = 1 both ways, so after any number of
    // iterations S = (1-d) + d * 1.0 = 1.0 exactly
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "weight")
    val r = Graph.weightedPageRank(edges, damping = 0.85, iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("a") === 1.0 && r("b") === 1.0)
  }

  test("hub outranks leaves and total rank is conserved on symmetric graphs") {
    // star: hub h connected to 4 leaves; symmetric edges
    val base = (1 to 4).map(i => ("h", s"l$i", 1L))
    val edges = (base ++ base.map { case (s, d, w) => (d, s, w) })
      .toDF("src", "dst", "weight")
    val r = Graph.weightedPageRank(edges, damping = 0.85, iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert((1 to 4).forall(i => r("h") > r(s"l$i")))
    // out-normalized symmetric graphs conserve total rank: sum == n
    assert(math.abs(r.values.sum - 5.0) < 1e-9)
  }

  test("textRank: the word adjacent to everything wins, deterministically") {
    val docs = Seq(
      "spark and flink and trino and duckdb",
      "spark joins and spark windows",
      "duckdb reads and writes").toDF("text")
    val top = Graph.textRank(docs, "text", iters = 3, k = 3).collect()
    assert(top.head.getString(0) == "and") // highest-degree co-occurrence node
    val again = Graph.textRank(docs, "text", iters = 3, k = 3).collect()
    assert(top.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("khopDistances: min hops on a path graph, frontier never revisits") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a shortcut 1-4: node 4 is 1 hop, not 3
    val edges = Seq((1, 2), (2, 3), (3, 4), (4, 5), (1, 4)).toDF("a", "b")
    val seeds = Seq(1).toDF("node")
    val d = Graph.khopDistances(edges, seeds, maxHops = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(d == Map(1 -> 0, 2 -> 1, 4 -> 1, 3 -> 2, 5 -> 2))
  }

  test("triangleStats: two disjoint triangles sharing no wedge") {
    import spark.implicits._
    val edges = Seq((1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12))
      .toDF("a", "b")
    val r = Graph.triangleStats(edges).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((6L, 6L, 2L, 1.0)))
  }
}
