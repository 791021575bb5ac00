package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * CloudWatch-shaped metrics emitter (SURVEY §2.9 K2; reference
 * `bucket_event_lambda_handler.py:105-198` — one boto3 `put_metric_data`
 * call per file event). The wire shape mirrors the call's payload —
 * `{"Namespace": …, "MetricData":[{MetricName, Dimensions:[{Name,
 * Value}…], Value, Unit}…]}` — POSTed to a configurable HTTP endpoint
 * (in production, an AWS-signing proxy / agent; in tests, an in-process
 * stub).
 *
 * Input is the long-format datum DataFrame of
 * [[graft.aggregate.FileAggregates.metricDatums]] — the engine
 * PRE-AGGREGATES per (namespace, metric, dims) where the reference emits
 * one datum per file: at 100 TB, one HTTP call per input object is the
 * anti-pattern (the Lambda fleet's put-rate throttles); a map-side
 * combined groupBy collapses millions of files into a bounded datum set
 * before anything leaves the cluster. Datums batch `chunkSize` per
 * request within each namespace (PutMetricData's classic batch limit
 * is 20). Bodies are deterministic for a given input, so task retries
 * re-send identical aggregates (overwrite-safe for any idempotent
 * receiver keyed on (namespace, metric, dims)).
 */
object CloudWatchSink {

  /** POST the datum rows of `df` (schema of `metricDatums`: namespace,
    * metric_name, dim1_name, dim1_value, dim2_name, dim2_value, value,
    * file_count) to `endpoint` as PutMetricData-shaped JSON. */
  def putMetricData(df: DataFrame, endpoint: String, chunkSize: Int = 20,
                    sign: Http.HeaderProvider = Http.noHeaders): Unit = {
    require(chunkSize >= 1 && chunkSize <= 20,
      s"chunkSize must be in [1, 20] (PutMetricData batch limit), got $chunkSize")
    // datum JSON built on the codegen path; only (namespace, datum)
    // strings reach the per-partition HTTP loop
    val rows = df.select(
      col("namespace").cast("string").as("__ns"),
      to_json(struct(
        col("metric_name").as("MetricName"),
        array(
          struct(col("dim1_name").as("Name"), col("dim1_value").cast("string").as("Value")),
          struct(col("dim2_name").as("Name"), col("dim2_value").cast("string").as("Value"))
        ).as("Dimensions"),
        col("value").as("Value"),
        lit("Count").as("Unit"))).as("__datum"))
    val url = endpoint.stripSuffix("/")
    rows.foreachPartition { it: Iterator[Row] =>
      it.toSeq.groupBy(_.getString(0)).foreach { case (ns, datums) =>
        datums.grouped(chunkSize).foreach { chunk =>
          val body = s"""{"Namespace":${jsonStr(ns)},"MetricData":[""" +
            chunk.map(_.getString(1)).mkString(",") + "]}"
          Http.post(url, body, sign = sign)
        }
      }
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
