package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Layout

/** Z-order layout ([[graft.ext.Layout]]): the Morton interleave against
  * a bit-twiddled reference, the quadrant-locality guarantee, and the
  * clustered rewrite's partition monotonicity. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)

  test("zValue matches the reference interleave over the full 4-bit grid") {
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(x, y, 4), s"($x,$y)")
    }
    // all 256 z-values are distinct (interleave is a bijection)
    assert(got.values.toSet.size == 256)
  }

  test("quadrant stats: every prefix bucket is an axis-aligned tile") {
    // bits=4, prefixBits=4 fixes the top 2 bits of BOTH dims: each
    // bucket's x and y ranges must fit in a 4-wide window
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toDF("x", "y")
    val stats = Layout.zQuadrantStats(grid, "x", "y", bits = 4, prefixBits = 4).collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 3, s"x span in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 3, s"y span in bucket ${r.getLong(0)}")
      assert(r.getLong(1) == 16L) // 4x4 tile
    }
  }

  test("clusterByZ: partitions carry disjoint, ordered z ranges") {
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val clustered = Layout.clusterByZ(grid, "x", "y", bits = 5, partitions = 4)
    assert(clustered.rdd.getNumPartitions == 4)
    // per-partition [min, max] z windows must not overlap
    val ranges = clustered
      .select(spark_partition_id().as("p"), Layout.zValue(col("x"), col("y"), 5).as("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, hiPrev), (_, loNext, _)) => assert(hiPrev < loNext)
      case _ =>
    }
  }

  test("correlationMatrix pins perfect and inverse correlation") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i, 100.0 - i)).toDF("a", "b", "c")
    val got = graft.ext.Stats.correlationMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == -1.0)
    assert(got(("b", "c")) == -1.0)
  }
}
