package graft

import org.apache.spark.sql.SparkSession

/**
 * Shared measurement harness for [[Bench]] and [[ScaleBench]]. The two
 * MUST stay timing-identical — ScaleBench's per-query budgets are
 * derived from Bench's committed baseline seconds, so a cleanup or
 * accounting tweak applied to one and not the other silently skews
 * every budget. Both boards therefore run through this one `run`.
 */
private[graft] object BenchHarness {

  /**
   * Runs one registry query to completion and isolates its timing
   * footprint from the rest of the board.
   *
   * Full-evaluation sink: count() would let the optimizer prune
   * deterministic projections (a projection-only query would time just
   * its scan); the noop sink materializes every output column without
   * writing bytes.
   *
   * Isolation (in `finally`): queries are standalone — composites
   * localCheckpoint intermediate frames (curation gate, CC rounds), and
   * hundreds of queries' leftover cached blocks in one JVM turn into GC
   * pressure that inflates every LATER query's wall time (measured
   * 5-10x on the tail of a full-board run). Broadcast-exchange blocks
   * and shuffle state are reaped by the ContextCleaner only when the
   * JVM GCs their weak references — with a large heap that can be
   * never, so a long board accumulates every past query's broadcast
   * hash relations in storage memory and the tail runs 5-15x slow
   * (measured: a 2.4 s query timing 36.9 s late in the board). The
   * explicit GC per query keeps the cleaner current; it runs inside the
   * finishing query's timer, so its cost is charged to the query that
   * created the garbage — the honest accounting.
   */
  def run(spark: SparkSession, sfDir: String, tag: String)(
      name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
    try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
    catch { case e: Throwable =>
      System.err.println(s"[$tag] $name FAILED")
      e.printStackTrace()
      false
    }
    finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

  /** The one-line Bench-format JSON the driver parses: per-query
    * seconds, per-query ok, total, all_ok, plus any extra fields. */
  def jsonLine(metric: String, results: Seq[(String, Double, Boolean)],
               sfDir: String, extraFields: String = ""): String = {
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => s"\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val allOk = results.forall(_._3)
    s"""{"metric":"$metric","value":$total,"unit":"sec",$extraFields"queries":$qs,"ok":$oks,"all_ok":$allOk,"sf":"$sfDir"}"""
  }
}
