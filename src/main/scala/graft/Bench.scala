package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    // full-evaluation noop sink + per-query cache/broadcast/GC isolation
    // live in the shared harness (ScaleBench budgets compare against
    // these timings, so the two boards must measure identically)
    def run(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      BenchHarness.run(spark, sfDir, "bench")(name, fn)
    // JVM/codegen/scan warmup so the first timed query doesn't absorb
    // one-time session costs
    run("warmup", SparkEntry.queries("q1_agg"))
    // optional arg: comma-separated query filter (local iteration only —
    // the driver runs the full registry)
    val only = args.lift(0).map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = run(name, fn)
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    println(BenchHarness.jsonLine("total", results, sfDir))
    spark.stop()
  }
}
