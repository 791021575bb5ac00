package graft

import org.apache.spark.sql.SparkSession

import graft.config.SuiteLoader
import graft.pipeline.ValidationPipeline

/** Head-to-head throughput vs the reference validator on the identical
  * NDJSON input (written by tools/bench_reference.py): full per-record
  * field validation + sequential checks + per-file totals, timed end to
  * end. `SPARK_GRAFT_CPUS=1` gives the single-thread number BASELINE.md
  * compares at; default 32 shows the same job scaling out. */
object BenchValidation {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/repo/target/refbench/data.json")
    // optional 2nd arg: sequential chunkSerials — the two-phase giant-file
    // plan (BASELINE.md r13 row: one 10⁶-record object)
    val chunkSerials = args.lift(1).map(_.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    val suite = SuiteLoader.fromFile("/root/repo/fixtures/odejson/suite.ini")

    // warm the JVM/codegen once so the measured pass times the ENGINE,
    // not JIT compilation (the reference number likewise excludes python
    // startup — both sides measure steady-state validation)
    ValidationPipeline.runJson(spark, path, suite,
      chunkSerials = chunkSerials).fileTotals.collect()

    val t0 = System.nanoTime()
    val res = ValidationPipeline.runJson(spark, path, suite,
      chunkSerials = chunkSerials)
    val totals = res.fileTotals.collect()
    val dt = (System.nanoTime() - t0) / 1e9
    val nRec = totals.map(_.getAs[Long]("num_messages_total")).sum
    val nVal = totals.map(_.getAs[Long]("num_validations")).sum
    val tag = chunkSerials.map(c => s", chunked c=$c").getOrElse("")
    println(s"""{"engine":"graft(spark, local[$cpus]$tag)","records":$nRec,"validations":$nVal,"seconds":${math.round(dt * 1000) / 1000.0},"records_per_sec":${math.round(nRec / dt)}}""")
    spark.stop()
  }
}
