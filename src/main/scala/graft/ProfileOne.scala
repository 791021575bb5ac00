package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Measurement-first profiling aid (optimization guide §1): for each named
  * registry query, splits wall time into DataFrame CONSTRUCTION (eager
  * driver work — collects, localCheckpoints, training loops, scale-guard
  * probes) vs the noop-sink ACTION, and counts the Spark jobs / stages /
  * tasks each phase launches. A query whose seconds sit in construction
  * is driver/lineage-bound (fix: fewer actions, bounded collects); one
  * whose seconds sit in the action is plan-bound (fix: the plan).
  * Run: `sbt "runMain graft.ProfileOne <sfDir> <query> [query...]"`. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    // usage guard (r15 ADVICE): no args / unknown names should print the
    // contract, not throw ArrayIndexOutOfBounds / NoSuchElement
    if (args.length < 2) {
      System.err.println("usage: graft.ProfileOne <sfDir> <query> [query...]")
      System.err.println("known queries: " + Queries.all.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val unknown = args.drop(1).filterNot(Queries.all.contains)
    if (unknown.nonEmpty) {
      System.err.println("unknown queries: " + unknown.mkString(", "))
      System.err.println("known queries: " + Queries.all.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val dir = args(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    })
    def snap(): (Int, Int, Int) = (jobs.get(), stages.get(), tasks.get())
    args.drop(1).foreach { q =>
      val (j0, s0, t0) = snap()
      val c0 = System.nanoTime()
      val df = Queries.all(q)(spark, dir)
      val c1 = System.nanoTime()
      // drain the listener bus BEFORE the construct snapshot too (r15
      // ADVICE): stage completions from eager construction jobs landing
      // late were misattributed to the action phase
      Thread.sleep(200)
      val (j1, s1, t1) = snap()
      df.write.format("noop").mode("overwrite").save()
      val c2 = System.nanoTime()
      // let the listener bus drain so stage/task counts are attributed
      Thread.sleep(200)
      val (j2, s2, t2) = snap()
      println(f"[profile] $q construct=${(c1 - c0) / 1e9}%.2fs (jobs=${j1 - j0} stages=${s1 - s0} tasks=${t1 - t0}) " +
        f"action=${(c2 - c1) / 1e9}%.2fs (jobs=${j2 - j1} stages=${s2 - s1} tasks=${t2 - t1})")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
