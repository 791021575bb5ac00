package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    // Full-evaluation sink: count() lets the optimizer prune deterministic
    // projections (a projection-only query would time just its scan); the
    // noop sink materializes every output column without writing bytes.
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED")
        e.printStackTrace()
        false
      }
      finally {
        // Queries are standalone: composites localCheckpoint intermediate
        // frames (curation gate, CC rounds), and 108 queries' leftover
        // cached blocks in one JVM turn into GC pressure that inflates
        // every LATER query's wall time (measured 5-10x on the tail of a
        // full-board run). Dropping them between queries isolates each
        // timing.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        // Broadcast-exchange blocks and shuffle state are reaped by the
        // ContextCleaner only when the JVM GCs their weak references —
        // with a large heap that can be never, so a 120-query board
        // accumulates every past query's broadcast hash relations in
        // storage memory and the tail runs 5-15x slow (measured: a 2.4 s
        // query timing 36.9 s late in the board). An explicit GC per
        // query keeps the cleaner current; the GC runs inside the
        // finishing query's timer, so its cost is charged to the query
        // that created the garbage — the honest accounting.
        System.gc()
      }
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
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => s"\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val allOk = results.forall(_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"all_ok":$allOk,"sf":"$sfDir"}""")
    spark.stop()
  }
}
