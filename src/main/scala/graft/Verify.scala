package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Re-pin the route fixtures' fixed mtimes (P5: LastModified is part of
    * q_file_metadata's golden, and a git checkout resets mtimes to "now").
    * Scheme matches tools/gen_fixtures.py: sorted non-config data files
    * get 1705320000 (2024-01-15T12:00:00Z) + i*3600. */
  private[graft] def pinRouteMtimes(): Unit = {
    val root = Paths.get("/root/repo/fixtures/route")
    if (Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val keys = Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString != "config.ini")
        .map(p => root.relativize(p).toString).toSeq.sorted
      keys.zipWithIndex.foreach { case (key, i) =>
        Files.setLastModifiedTime(root.resolve(key),
          java.nio.file.attribute.FileTime.fromMillis((1705320000L + i * 3600L) * 1000L))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always runs the full registry)
    val only = args.lift(2).map(_.split(",").toSet)
    pinRouteMtimes()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a reused outDir must not serve a STALE (previously passing)
        // result for a query that now throws — the gate reads whatever
        // directory exists
        val dir = new java.io.File(s"$outDir/$name")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        if (dir.exists()) rm(dir)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
