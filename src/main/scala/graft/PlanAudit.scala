package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries — the
  * scale-readiness audit (pushdown visible? broadcasts chosen? how many
  * exchanges?). Run: `sbt "runMain graft.PlanAudit [sfDir] [query...]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q1_agg", "q_join_revenue", "q_ode_field_validations",
      "q_ode_sequential", "q_events_sequential", "q_file_totals_parquet",
      "q_dedup_exact", "q_minhash_pairs", "q_ann_lsh", "q_topk_orders")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val exec = sys.env.get("PLAN_EXEC").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = Queries.all(n)(spark, sfDir)
      if (exec) { df.collect(); () } // finalize THIS df's AQE plan
      df.explain("formatted")
    }
    spark.stop()
  }
}
