package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ingest.Readers
import graft.model.ValidationSuite
import graft.pipeline.{OdeSchema, ValidationPipeline}

/**
 * Structured Streaming variant of the validation pipeline (SURVEY §2.8).
 *
 * The reference is event-driven: one Lambda invocation per S3 object
 * (lambda_function.py:8-15), at-least-once, no cross-file state. The
 * Spark-native equivalent is a file-source stream: `readStream` discovers
 * new files, `foreachBatch` runs the SAME batch pipeline over each
 * micro-batch (all transforms are per-file, so a file never spans
 * batches), and the checkpoint gives exactly-once file discovery — a
 * strict upgrade over Lambda retries double-indexing Elasticsearch.
 *
 * `Trigger.AvailableNow` processes the current backlog then stops —
 * byte-identical outputs to the batch path over the same files (asserted
 * in StreamingPipelineSpec).
 */
object StreamingPipeline {

  /** Start the stream over `globPath`; outputs append under `outDir`. */
  def start(spark: SparkSession, globPath: String, suite: ValidationSuite,
            outDir: String, checkpointDir: String,
            schema: StructType = OdeSchema.record,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val lines = spark.readStream.text(globPath)
      .select(
        col("value"),
        col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("file_size"),
        col("_metadata.file_modification_time").as("file_modification_time"))
      .filter(length(trim(col("value"))) > 0)

    val parsed = Readers.parseNdjsonLines(lines, schema)

    parsed.writeStream
      .queryName("graft-validation-stream")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val result = ValidationPipeline.run(
          ValidationPipeline.validateRecords(batch, suite), suite)
        result.fileTotals.write.mode("append").parquet(s"$outDir/file_totals")
        result.errorHistogram.write.mode("append").parquet(s"$outDir/error_histogram")
        if (result.hasSequential)
          result.sequential.write.mode("append").parquet(s"$outDir/sequential")
        ()
      }
      .start()
  }

  /** Run to completion over the current backlog (AvailableNow) — the
   *  batch-catchup mode used by tests and the harness. */
  def runAvailableNow(spark: SparkSession, globPath: String, suite: ValidationSuite,
                      outDir: String, checkpointDir: String,
                      schema: StructType = OdeSchema.record): Unit = {
    val q = start(spark, globPath, suite, outDir, checkpointDir, schema)
    q.awaitTermination()
  }
}
