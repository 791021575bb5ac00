package graft.sources

import java.util.{Map => JMap, UUID}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * DataSource V2 WRITE path — the sink-side twin of [[LineFileSource]]
 * (SURVEY §2.9 K1: the reference indexes one JSON document per file
 * into Elasticsearch; this sink renders one JSON document per ROW to a
 * directory, with the commit protocol the Lambda's fire-and-forget
 * `index()` lacks). `df.write.format("graft.sources.JsonDocSink")
 * .option("path", dir).save()`.
 *
 * Exactly-once via two-phase commit:
 *  1. every task writes `_staged-<taskId>-<uuid>.jsonl` and reports the
 *     name in its commit message — speculative/retried attempts stage
 *     under different uuids and only the COMMITTED attempt's file is
 *     kept;
 *  2. the driver's `BatchWrite.commit` renames staged → final
 *     `part-<i>-<jobId>.jsonl` (job-unique names — never colliding with
 *     a previous job's output), deletes stale parts from earlier jobs
 *     AFTER the new ones are in place (overwrite mode), and drops a
 *     `_SUCCESS` marker last; `abort` deletes every staged file, so a
 *     failed job leaves NO partial output (asserted by JsonDocSinkSpec
 *     with a mid-write poison row), and a crash inside commit leaves
 *     the previous output intact (no _SUCCESS yet ⇒ nothing committed).
 *
 * Supported field types: the metadata-document surface (string, long,
 * int, double, boolean, timestamp-as-micros); null → JSON null.
 */
class JsonDocSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only: schema comes from the DataFrame
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new JsonDocTable(schema, properties.get("path"))
}

private class JsonDocTable(schema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-jsondoc($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite == rewrite dir: record the request; the driver-side
      // commit clears prior part files BEFORE renaming staged ones, so
      // a rewrite that produces fewer partitions cannot leave stale
      // part-*.jsonl mixed into the new output (and rename never lands
      // on an existing destination — HDFS rename-onto-existing fails).
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new JsonDocBatchWrite(info.schema(), path, truncateFirst)
      }
    }
}

private case class StagedFile(name: String) extends WriterCommitMessage

/** Serializable carrier for the driver's resolved Hadoop conf
 *  (spark.hadoop.* settings — object-store credentials, endpoints) so
 *  executor-side writers build their FileSystem from the SAME config
 *  the driver-side commit uses, not a bare `new Configuration()`. */
private class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private class JsonDocBatchWrite(schema: StructType, path: String,
                                truncateFirst: Boolean)
    extends BatchWrite {
  // resolved on the DRIVER (where the active session lives), shipped to
  // executors inside the writer factory
  private val conf =
    new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf())

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonDocWriterFactory(schema, path, conf)

  private def fs = new Path(path).getFileSystem(conf.value)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    // New parts carry a job-unique suffix, so they NEVER collide with a
    // previous job's output; the order is rename-new-first, delete-stale
    // second. A crash mid-commit therefore leaves either the old parts
    // intact (no renames yet) or old+new side by side with NO _SUCCESS —
    // never an empty directory. (Deleting the old output before the
    // first rename would open a total-data-loss window: a failed rename
    // aborts the job after the old parts are already gone.)
    val jobId = UUID.randomUUID().toString
    messages.zipWithIndex.foreach { case (StagedFile(name), i) =>
      val ok = fs.rename(new Path(dir, name),
        new Path(dir, f"part-$i%05d-$jobId.jsonl"))
      require(ok, s"commit rename failed for $name")
    }
    if (truncateFirst) {
      fs.delete(new Path(dir, "_SUCCESS"), false)
      Option(fs.globStatus(new Path(dir, "part-*.jsonl")))
        .foreach(_.filterNot(_.getPath.getName.contains(jobId))
          .foreach(st => fs.delete(st.getPath, false)))
    }
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // drop EVERY staged file (messages only cover committed tasks)
    val dir = new Path(path)
    Option(fs.globStatus(new Path(dir, "_staged-*")))
      .foreach(_.foreach(st => fs.delete(st.getPath, false)))
  }
}

private class JsonDocWriterFactory(schema: StructType, path: String,
                                   conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonDocWriter(schema, path, partitionId, taskId, conf)
}

private class JsonDocWriter(schema: StructType, path: String,
                            partitionId: Int, taskId: Long,
                            conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {
  private val name = s"_staged-$partitionId-$taskId-${UUID.randomUUID()}.jsonl"
  private val file = new Path(new Path(path), name)
  private lazy val fs = file.getFileSystem(conf.value)
  private lazy val out = {
    fs.mkdirs(new Path(path))
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(file, true), java.nio.charset.StandardCharsets.UTF_8))
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  override def write(row: InternalRow): Unit = {
    val doc = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => "\"" + jsonEscape(row.getUTF8String(i).toString) + "\""
          case LongType | TimestampType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          // non-finite doubles have no JSON literal — bare NaN/Infinity
          // tokens would make the line unparseable downstream; null is
          // the lossless-enough JSON stand-in
          case DoubleType =>
            val d = row.getDouble(i)
            if (java.lang.Double.isFinite(d)) d.toString else "null"
          case BooleanType => row.getBoolean(i).toString
          case other => throw new IllegalArgumentException(
            s"jsondoc sink: unsupported type $other for field ${f.name}")
        }
      "\"" + jsonEscape(f.name) + "\":" + v
    }.mkString("{", ",", "}")
    out.write(doc)
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = { out.close(); StagedFile(name) }
  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    fs.delete(file, false)
    ()
  }
  override def close(): Unit = ()
}
