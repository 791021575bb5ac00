package graft

import graft.config.SuiteLoader
import graft.pipeline.{OdeSchema, ValidationPipeline}

/** Single-node throughput of the SHIPPED 43-section config_2.ini suite
  * over a generated 100k-record NDJSON corpus (tools-side `rec2`
  * builder) — the measurement behind the FencedProject fix: the fenced
  * row-mode-codegen projection vs the same plan re-run with the fence
  * disabled (`-Dgraft.fence.threshold=1000` → whole-stage overflow →
  * interpreted fallback). `SPARK_GRAFT_CPUS` as in BenchValidation. */
object BenchConfig2 {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/repo/target/c2bench/data.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    val suite = SuiteLoader.fromFile(
      "/root/reference/odevalidator/config_2.ini")

    def once(): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val res = ValidationPipeline.runJson(spark, path, suite,
        schema = OdeSchema.config2Record)
      val totals = res.fileTotals.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      (totals.map(_.getAs[Long]("num_messages_total")).sum,
        totals.map(_.getAs[Long]("num_validations")).sum, dt)
    }
    once() // warm codegen/JIT
    val (nRec, nVal, dt) = once()
    val fenced = ValidationPipeline.WideSuiteRuleThreshold < 43
    println(s"""{"engine":"graft(config2, local[$cpus], fenced=$fenced)","records":$nRec,"validations":$nVal,"seconds":${math.round(dt * 1000) / 1000.0},"records_per_sec":${math.round(nRec / dt)}}""")
    spark.stop()
  }
}
