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
}
