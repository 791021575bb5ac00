package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM — same configs
  * as the driver-contract mains (UTC, classic casts, nanos-as-long). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep in lockstep with GraftSession: the inferred size(e)>0
      // filter above explodes duplicates the defining array expression
      // (see GraftSession for the measurement)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
