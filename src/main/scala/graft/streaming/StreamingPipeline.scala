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
            trigger: Trigger = Trigger.AvailableNow(),
            extraSinks: Seq[graft.pipeline.ValidationPipeline.Result => Unit] = Nil): StreamingQuery = {
    val lines = spark.readStream.text(globPath)
      .select(
        col("value"),
        col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("file_size"),
        col("_metadata.file_modification_time").as("file_modification_time"))
      .filter(length(trim(col("value"))) > 0)

    val parsed = Readers.parseNdjsonLines(lines, schema)
      // K2 operational counters (SURVEY §2.8): observe() attaches
      // aggregates to the streaming plan itself — per-micro-batch record /
      // corrupt / byte counts surface on every QueryProgressEvent with no
      // second pass over the data. This is the CloudWatch-metrics seam of
      // the reference (bucket_event_lambda_handler.py:105-198): a
      // StreamingQueryListener ([[MetricsListener]]) forwards them to any
      // metrics sink.
      .observe("graft_ingest",
        count(lit(1)).as("n_records"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(octet_length(col("value")).cast("long")).as("n_bytes"))

    parsed.writeStream
      .queryName("graft-validation-stream")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one materialization feeds every sink — and it is the VALIDATED
        // frame that is cached (r16; was the raw batch): the compiled
        // rule projection is the heaviest per-row work in the pipeline,
        // and persisting upstream of it re-ran validation (plus its
        // codegen) once per sink — 3× for totals/histogram/sequential.
        // Caching validated also fires the observe() aggregates exactly
        // once, as before.
        val validated = ValidationPipeline.validateRecords(batch, suite)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val result = ValidationPipeline.run(validated, suite)
          // the per-file sequential verdicts are consumed up to three
          // times (own sink + folded into totals AND histogram) — cache
          // the per-file-bounded frame so the window chain runs once
          if (result.hasSequential) result.sequential.persist()
          // with external sinks attached, fileTotals is consumed twice
          // (parquet + the hook) — share one evaluation
          if (extraSinks.nonEmpty) result.fileTotals.persist()
          try {
            // the totals write runs FIRST and alone: it folds the
            // sequential verdicts in, so it materializes both caches in
            // one job (concurrent first-consumers of an unmaterialized
            // persist would each compute it)
            result.fileTotals.write.mode("append").parquet(s"$outDir/file_totals")
            // the remaining sinks are independent reads of warm caches —
            // overlap them (guide §2.6) so the batch pays max(), not sum()
            // K1/K2 seam (r13 verdict item 8): external per-batch sinks —
            // ES metadata docs, CloudWatch datums — attach HERE, inside the
            // persist scope, exactly where the reference's Lambda posts
            // them per object (bucket_event_lambda_handler.py:91-198)
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration.Duration
            implicit val ec: scala.concurrent.ExecutionContext =
              scala.concurrent.ExecutionContext.global
            val sinks = Seq(
              Future(result.errorHistogram.write.mode("append")
                .parquet(s"$outDir/error_histogram"))) ++
              (if (result.hasSequential)
                Seq(Future(result.sequential.write.mode("append")
                  .parquet(s"$outDir/sequential")))
              else Nil) ++
              extraSinks.map(sink => Future(sink(result)))
            Await.result(Future.sequence(sinks), Duration.Inf)
            ()
          } finally {
            if (result.hasSequential) result.sequential.unpersist()
            if (extraSinks.nonEmpty) result.fileTotals.unpersist()
          }
        } finally { validated.unpersist(); () }
      }
      .start()
  }

  /** Run to completion over the current backlog (AvailableNow) — the
   *  batch-catchup mode used by tests and the harness. */
  def runAvailableNow(spark: SparkSession, globPath: String, suite: ValidationSuite,
                      outDir: String, checkpointDir: String,
                      schema: StructType = OdeSchema.record,
                      extraSinks: Seq[graft.pipeline.ValidationPipeline.Result => Unit] = Nil): Unit = {
    val q = start(spark, globPath, suite, outDir, checkpointDir, schema,
      extraSinks = extraSinks)
    q.awaitTermination()
  }

  /** One observed-metrics datum per micro-batch. */
  final case class BatchMetrics(batchId: Long, nRecords: Long, nCorrupt: Long,
                                nBytes: Long)

  /**
   * StreamingQueryListener that collects the `graft_ingest` observe()
   * counters per progress event — the operational-metrics sink seam (K2):
   * swap [[drain]]'s consumer for a CloudWatch/StatsD emitter in
   * production. Thread-safe; listener callbacks run on the streaming
   * listener bus, never on the query thread.
   */
  final class MetricsListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetrics]()

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics
      if (om.containsKey("graft_ingest")) {
        val r = om.get("graft_ingest")
        // sum() observes NULL on a zero-row micro-batch — a bare getLong
        // would NPE on the listener bus and drop exactly the anomalous
        // batch's datum
        def long(name: String): Long = {
          val i = r.fieldIndex(name)
          if (r.isNullAt(i)) 0L else r.getLong(i)
        }
        buf.add(BatchMetrics(e.progress.batchId,
          long("n_records"), long("n_corrupt"), long("n_bytes")))
        ()
      }
    }

    /** Snapshot and clear the collected per-batch metrics. */
    def drain(): Seq[BatchMetrics] = {
      val out = Seq.newBuilder[BatchMetrics]
      var m = buf.poll()
      while (m != null) { out += m; m = buf.poll() }
      out.result()
    }
  }
}
