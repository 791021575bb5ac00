package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventAnalytics

/** §2.8 widening: the watermarked streaming runs must agree with the
  * batch (DuckDB-oracled) formulations of the same operators. */
class EventAnalyticsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eventsFile = "/root/testdata/sf0.001/events.parquet"

  /** Every temp dir this suite creates, deleted in afterAll — streaming
    * tests otherwise leak chunk/staging/checkpoint parquet on every run
    * (the r8-ADVICE leak class, r9 review). */
  private val tempDirs =
    scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
  private def tempDir(prefix: String): java.nio.file.Path = {
    val d = Files.createTempDirectory(prefix)
    tempDirs.synchronized { tempDirs += d }
    d
  }
  override def afterAll(): Unit =
    tempDirs.foreach(graft.util.Fs.deleteRecursively)

  /** RAW file schema for stream sources — the operators normalize `ts`
    * themselves (Readers.tsToNanos); handing them the normalized LONG
    * schema would make the parquet reader deliver raw micros as nanos. */
  private lazy val rawSchema = spark.read.parquet(eventsFile).schema

  /** File stream sources need a DIRECTORY: expose the single parquet file
    * through a temp dir symlink (testdata stays untouched). */
  private lazy val eventsPath: String = {
    val dir = tempDir("graft-events-stream")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(eventsFile))
    dir.toString
  }

  /** Three CHRONOLOGICAL chunks of the events fixture, one file each
    * with forced mtimes so maxFilesPerTrigger=1 processes them in order
    * — the shared harness for every cross-micro-batch state-carry test
    * (a time bucket split across a chunk boundary must accumulate in
    * the carried state). Built once, reused by all consumers. */
  private lazy val chunkedEventsDir: String = {
    val dir = tempDir("graft-events-chunks")
    val sorted = spark.read.parquet(eventsFile).orderBy("ts")
    val rows = sorted.collect()
    val cut1 = rows.length / 3
    val cut2 = 2 * rows.length / 3
    Seq((0, cut1), (cut1, cut2), (cut2, rows.length)).zipWithIndex.foreach {
      case ((from, until), i) =>
        val tmp = tempDir(s"graft-events-chunk$i")
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows.slice(from, until).toSeq, 1),
            sorted.schema)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = Files.list(tmp).iterator().asScala
          .filter(_.toString.endsWith(".parquet")).toSeq.head
        val dst = dir.resolve(f"chunk$i%02d.parquet")
        Files.move(part, dst)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    dir.toString
  }

  /** Runs a stateful operator over [[chunkedEventsDir]] one file per
    * micro-batch and returns the appended rows. */
  private def runChunkedStream(queryName: String)(
      op: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[_]): Array[org.apache.spark.sql.Row] = {
    val ckpt = tempDir(s"graft-$queryName-ckpt").toString
    val stream = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1).parquet(chunkedEventsDir)
    val q = op(stream)
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(queryName).collect()
  }

  test("streaming windowed counts equal batch over the same files") {
    val batchDf = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
    val expected = EventAnalytics.windowedCounts(batchDf, 60)
      .collect().map(_.toString).sorted.toSeq

    val stream = spark.readStream.schema(rawSchema).parquet(eventsPath)
    val q = EventAnalytics.windowedCounts(stream, 60, watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete) // all windows, late-state bound by the watermark
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("win_counts").collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark dedup equals batch distinct on the key") {
    val batchDf = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
    val expected = EventAnalytics.dedupDaily(batchDf)
      .select("user_id", "event_type", "day")
      .collect().map(_.toString).sorted.toSeq

    val ckpt = tempDir("graft-dedup").toString
    val stream = spark.readStream.schema(rawSchema).parquet(eventsPath)
    // watermark (2 days) covers any same-day duplicate spread, so the
    // bounded-state dedup emits exactly the batch-distinct key set
    val q = EventAnalytics.dedupDaily(stream, watermark = Some("2 days"))
      .select("user_id", "event_type", "day")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("dedup_out").collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("stream-static enrichment equals the batch join") {
    val batchDf = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select($"c_custkey", $"c_acctbal")
    val expected = EventAnalytics.enrichedEvents(batchDf, dim, "c_custkey")
      .collect().map(_.toString).sorted.toSeq

    val ckpt = tempDir("graft-ssdim").toString
    val stream = spark.readStream.schema(rawSchema).parquet(eventsPath)
    val q = EventAnalytics.enrichedEvents(stream, dim, "c_custkey")
      .writeStream.format("memory").queryName("ssdim_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("ssdim_out").collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("stream-stream interval join equals the batch range join") {
    val batchDf = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
    def purchases(df: org.apache.spark.sql.DataFrame) = df.filter($"event_type" === "purchase")
    def views(df: org.apache.spark.sql.DataFrame) = df.filter($"event_type" === "view")
    val expected = EventAnalytics.attributedPurchases(
        purchases(batchDf), views(batchDf), hours = 6)
      .collect().map(_.toString).sorted.toSeq

    val ckpt = tempDir("graft-ssjoin").toString
    val s1 = spark.readStream.schema(rawSchema).parquet(eventsPath)
    val s2 = spark.readStream.schema(rawSchema).parquet(eventsPath)
    val q = EventAnalytics.attributedPurchases(
        purchases(s1), views(s2), hours = 6, watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("ssjoin_out").collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streaming session_window emits exactly the watermark-closed batch sessions") {
    val batchDf = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
    def agg(df: org.apache.spark.sql.DataFrame) = graft.ingest.Readers.tsToNanos(df)
      .withColumn("event_time", EventAnalytics.eventTime(col("ts")))
      .withWatermark("event_time", "10 minutes")
      .groupBy($"user_id", session_window($"event_time", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"session_window.start".as("s"),
        $"session_window.end".as("e"), $"n_events")
    val batchAll = agg(batchDf)
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    // append mode emits a session once the watermark (max event - delay)
    // passes its end (= last event + gap)
    val maxMs = batchDf.agg(max(EventAnalytics.eventTime(col("ts"))))
      .head().getTimestamp(0).getTime
    val expectedClosed = batchAll.filter(_._3.getTime < maxMs - 10L * 60 * 1000)

    val ckpt = tempDir("graft-sesswin").toString
    val stream = spark.readStream.schema(rawSchema).parquet(eventsPath)
    val q = agg(stream)
      .writeStream.format("memory").queryName("sesswin_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sesswin_out")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    assert(expectedClosed.nonEmpty)
    assert(got == expectedClosed)
  }

  test("dynamic-gap session_window boundary: t2 == t1 + gap MERGES (oracle's > rule)") {
    // The fixture can't hit the measure-zero start == running-max-end
    // boundary, so pin Spark's session_window merge semantics on it
    // directly (r9 ADVICE). Measured here: Spark MERGES an event that
    // starts exactly where the session ends — so the oracle's islands
    // rule must be `epoch_us(et) > max_end` (strictly after), never >=.
    val gapExpr = expr(
      """CASE WHEN event_type = 'view' THEN '10 minutes'
        |  ELSE '30 minutes' END""".stripMargin)
    def sess(rows: Seq[(Long, String, String)]) = rows
      .toDF("user_id", "t", "event_type")
      .withColumn("event_time", to_timestamp($"t"))
      .groupBy($"user_id", session_window($"event_time", gapExpr))
      .agg(count(lit(1)).as("n_events"))
      .select($"session_window.start".as("s"), $"session_window.end".as("e"),
        $"n_events")
      .orderBy($"s")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
    // t2 == t1 + gap: ONE merged session, end extended to t2 + gap(t2)
    val touching = sess(Seq(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 00:10:00", "view")))
    assert(touching.map(_._3) == Seq(2L),
      s"sessions touching at the boundary merge in Spark: $touching")
    assert(touching.head._2.toString == "2024-01-01 00:20:00.0")
    // one microsecond past the boundary: TWO sessions — the
    // complementary pin that the merge window is closed, not padded
    val past = sess(Seq(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 00:10:00.000001", "view")))
    assert(past.map(_._3) == Seq(1L, 1L),
      s"an event strictly past the session end opens a new session: $past")
  }

  test("flatMapGroupsWithState sessionization: closed sessions equal batch minus open tails") {
    val batchDf = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
    val batchSessions = EventAnalytics.sessionsBatch(batchDf, gapMinutes = 30)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    // A non-tail session closes inline (a later same-user event arrives in
    // the batch). A user's LAST session only closes via event-time
    // timeout: AvailableNow runs a final batch after the watermark
    // advances to max(event_time) - delay, firing timeouts for tails with
    // last + gap < that watermark; younger tails stay open.
    val maxMs = batchDf.agg(max(EventAnalytics.eventTime(col("ts"))))
      .head().getTimestamp(0).getTime
    val delayMs = 10L * 60 * 1000
    val gapMs = 30L * 60 * 1000
    val tails = batchSessions.groupBy(_._1).values.map(_.maxBy(_._2.getTime)).toSet
    val openTails = tails.filter(s => s._3.getTime + gapMs >= maxMs - delayMs)
    val expectedClosed = batchSessions -- openTails

    val ckpt = tempDir("graft-sessions").toString
    val stream = spark.readStream.schema(rawSchema).parquet(eventsPath)
    val q = EventAnalytics.sessionizeStream(stream, gapMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sessions_out")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    assert(expectedClosed.nonEmpty, "vacuous: no session ever closes in the fixture")
    assert(got == expectedClosed)
  }

  test("stateful rate alerts: cross-batch EWMA state equals the batch face") {
    def canon(a: EventAnalytics.RateAlert) =
      (a.event_type, a.hour, a.n,
        math.round(a.level_before * 1e6), math.round(a.ratio * 1e6))
    val batch = EventAnalytics.rateAlerts(spark.read.parquet(eventsFile))
      .collect().map(canon).toSet
    assert(batch.nonEmpty)

    // hour buckets split across a chunk boundary must accumulate in the
    // carried RateState, and the EWMA level must survive the batches
    val got = runChunkedStream("rate_alerts")(EventAnalytics.rateAlerts)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6), math.round(r.getDouble(4) * 1e6)))
      .toSet
    assert(got == batch,
      s"stream-batch divergence: only-stream=${got -- batch} only-batch=${batch -- got}")

    // independent recomputation: fold the sorted hourly counts directly
    val series = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
      .withColumn("hour", expr("ts div 3600000000000"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getLong(2))).toList).toMap
    val expected = series.toSeq.flatMap { case (tpe, buckets) =>
      var level = 0.0
      var seeded = false
      buckets.dropRight(1).zipWithIndex.flatMap { case ((h, n), i) =>
        if (!seeded) { level = n.toDouble; seeded = true; None }
        else {
          val r = (tpe, h, n, math.round(level * 1e6),
            math.round(n.toDouble / level * 1e6))
          level = level * 7e-1 + n.toDouble * 3e-1
          Some(r)
        }
      }
    }.toSet
    assert(batch == expected)
  }

  test("stateful z monitor: cross-batch cumulative moments equal the " +
    "batch face and a direct fold") {
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6), r.getBoolean(4))
    val batch = EventAnalytics.zMonitor(spark.read.parquet(eventsFile))
      .toDF().collect().map(canon).toSet
    assert(batch.nonEmpty, "vacuous: no day ever closes in the fixture")

    // a day split across a chunk boundary must accumulate in the
    // carried open-day moments, and the closed cumulative must survive
    // the batches
    val got = runChunkedStream("z_monitor")(EventAnalytics.zMonitor)
      .map(canon).toSet
    assert(got == batch,
      s"stream-batch divergence: only-stream=${got -- batch} only-batch=${batch -- got}")

    // independent recomputation: fold the day-sorted exact cents
    // moments directly, replaying the emission rule by hand
    val cents = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
      .select(expr("ts div 86400000000000").as("day"),
        expr("CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END").as("variant"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy(col("day"), col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(r => (r._1, r._2))
    val lastDay = cents.map(_._1).max
    var (caN, caS, caSS, cbN, cbS, cbSS) = (0L, 0L, 0L, 0L, 0L, 0L)
    val expected = cents.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (day, arms) =>
        val a = arms.find(_._2 == "A")
        val b = arms.find(_._2 == "B")
        a.foreach(x => { caN += x._3; caS += x._4; caSS += x._5 })
        b.foreach(x => { cbN += x._3; cbS += x._4; cbSS += x._5 })
        if (day < lastDay && a.nonEmpty && b.nonEmpty && caN > 1 && cbN > 1) {
          val csA = caS.toDouble / 1e2; val cssA = caSS.toDouble / 1e4
          val csB = cbS.toDouble / 1e2; val cssB = cbSS.toDouble / 1e4
          val z = (csA / caN - csB / cbN) /
            math.sqrt(((cssA - csA * csA / caN) / (caN - 1)) / caN +
              ((cssB - csB * csB / cbN) / (cbN - 1)) / cbN)
          Some((day, caN, cbN, math.round(z * 1e6), math.abs(z) > 25e-1))
        } else None
    }.toSet
    assert(batch == expected)
  }

  test("stateful SRM guardrail: cross-batch assignment counts equal the " +
    "batch face and a direct fold") {
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6), r.getBoolean(4))
    val batch = EventAnalytics.srmMonitor(spark.read.parquet(eventsFile))
      .toDF().collect().map(canon).toSet
    assert(batch.nonEmpty, "vacuous: no day ever closes in the fixture")
    val got = runChunkedStream("srm_monitor")(EventAnalytics.srmMonitor)
      .map(canon).toSet
    assert(got == batch,
      s"stream-batch divergence: only-stream=${got -- batch} only-batch=${batch -- got}")

    // direct fold over day-sorted assignment counts
    val daily = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
      .select(expr("ts div 86400000000000").as("day"),
        expr("CASE WHEN user_id % 2 = 0 THEN 1L ELSE 0L END").as("a"))
      .groupBy(col("day"))
      .agg(sum(col("a")).as("na"), sum(lit(1L) - col("a")).as("nb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val lastDay = daily.map(_._1).max
    var (ca, cb) = (0L, 0L)
    val expected = daily.flatMap { case (day, na, nb) =>
      ca += na; cb += nb
      if (day < lastDay) {
        val d = (ca - cb).toDouble
        val chi2 = d * d / (ca + cb)
        Some((day, ca, cb, math.round(chi2 * 1e6), chi2 > 384e-2))
      } else None
    }.toSet
    assert(batch == expected)
  }

  test("z monitor state RESTORES from its checkpoint across query restarts") {
    // the stronger recovery claim than one AvailableNow pass: run chunk
    // 0 in process-1, tear the query down, then start a FRESH query on
    // the same checkpoint with chunks 1-2 added — the open-day moments
    // and the closed cumulative must come back from the state store,
    // and the combined emissions must equal the batch face
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6), r.getBoolean(4))
    val batch = EventAnalytics.zMonitor(spark.read.parquet(eventsFile))
      .toDF().collect().map(canon).toSet

    val src = tempDir("graft-zrestart-src")
    val ckpt = tempDir("graft-zrestart-ckpt").toString
    // the memory sink cannot recover from a checkpoint — the FILE sink
    // is the real-deployment shape and supports restart
    val out = tempDir("graft-zrestart-out").toString
    val chunks = Files.list(java.nio.file.Paths.get(chunkedEventsDir))
      .iterator().asScala.toSeq.sortBy(_.getFileName.toString)
    def runPass(): Unit = {
      val q = EventAnalytics.zMonitor(
          spark.readStream.schema(rawSchema)
            .option("maxFilesPerTrigger", 1).parquet(src.toString))
        .toDF()
        .writeStream.format("parquet").option("path", out)
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Files.copy(chunks(0), src.resolve(chunks(0).getFileName))
    runPass()
    val afterFirst = spark.read.parquet(out).count()
    chunks.drop(1).foreach(c => Files.copy(c, src.resolve(c.getFileName)))
    runPass()
    val got = spark.read.parquet(out).collect().map(canon).toSet
    assert(got.size > afterFirst, "vacuous: restart pass emitted nothing")
    assert(got == batch,
      s"restart divergence: only-stream=${got -- batch} only-batch=${batch -- got}")
  }

  test("stateful Mann-Whitney monitor: cross-batch histograms equal the " +
    "batch face and a direct fold") {
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        math.round(r.getDouble(4) * 1e6), r.getBoolean(5))
    val batch = EventAnalytics.mwMonitor(spark.read.parquet(eventsFile))
      .toDF().collect().map(canon).toSet
    assert(batch.nonEmpty, "vacuous: no day ever closes in the fixture")

    // a day split across a chunk boundary must accumulate in the
    // carried open-day histograms
    val got = runChunkedStream("mw_monitor")(EventAnalytics.mwMonitor)
      .map(canon).toSet
    assert(got == batch,
      s"stream-batch divergence: only-stream=${got -- batch} only-batch=${batch -- got}")

    // independent recomputation: fold day-sorted per-bucket counts into
    // cumulative histograms and replay the tie-corrected statistic
    val B = EventAnalytics.MwBuckets
    val daily = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
      .filter(col("value").isNotNull)
      .select(expr("ts div 86400000000000").as("day"),
        expr("CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END").as("variant"),
        expr(s"CAST(least(greatest(floor(value), 0), ${B - 1}) AS INT)")
          .as("bucket"))
      .groupBy(col("day"), col("variant"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val lastDay = daily.map(_._1).max
    val ca = new Array[Long](B); val cb = new Array[Long](B)
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (day, rows) =>
        var openA = 0L; var openB = 0L
        rows.foreach { case (_, v, b, n) =>
          if (v == "A") { ca(b) += n; openA += n }
          else { cb(b) += n; openB += n }
        }
        var nA = 0L; var nB = 0L; var u2 = 0L; var tSum = 0L; var bLess = 0L
        for (i <- 0 until B) {
          u2 += ca(i) * (2L * bLess + cb(i)); bLess += cb(i)
          nA += ca(i); nB += cb(i)
          val t = ca(i) + cb(i); tSum += t * t * t - t
        }
        if (day < lastDay && openA > 0 && openB > 0 && nA > 0 && nB > 0) {
          val n = (nA + nB).toDouble
          val sig2 = nA.toDouble * nB.toDouble / 12e0 *
            ((n + 1e0) - tSum.toDouble / (n * (n - 1e0)))
          if (sig2 > 0e0) {
            val z = (u2.toDouble - nA.toDouble * nB.toDouble) /
              (2e0 * math.sqrt(sig2))
            Some((day, nA, nB, u2, math.round(z * 1e6), math.abs(z) > 25e-1))
          } else None
        } else None
    }.toSet
    assert(batch == expected)
  }

  test("stateful CUPED monitor: cross-batch moments equal the batch face " +
    "and a direct fold") {
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6), math.round(r.getDouble(4) * 1e6),
        math.round(r.getDouble(5) * 1e6))
    val batch = EventAnalytics.cupedMonitor(spark.read.parquet(eventsFile))
      .toDF().collect().map(canon).toSet
    assert(batch.nonEmpty, "vacuous: no day ever closes in the fixture")
    val got = runChunkedStream("cuped_monitor")(EventAnalytics.cupedMonitor)
      .map(canon).toSet
    assert(got == batch,
      s"stream-batch divergence: only-stream=${got -- batch} only-batch=${batch -- got}")

    // direct fold over day-sorted exact integer moments
    val daily = graft.ingest.Readers.tsToNanos(spark.read.parquet(eventsFile))
      .filter(col("value").isNotNull &&
        get_json_object(col("props"), "$.k").isNotNull)
      .select(expr("ts div 86400000000000").as("day"),
        expr("CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END").as("variant"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("x"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("y"))
      .groupBy(col("day"), col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val lastDay = daily.map(_._1).max
    var (caN, caX, caY, caXY, caXX) = (0L, 0L, 0L, 0L, 0L)
    var (cbN, cbX, cbY, cbXY, cbXX) = (0L, 0L, 0L, 0L, 0L)
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (day, arms) =>
        val a = arms.find(_._2 == "A"); val b = arms.find(_._2 == "B")
        a.foreach(r => { caN += r._3; caX += r._4; caY += r._5
          caXY += r._6; caXX += r._7 })
        b.foreach(r => { cbN += r._3; cbX += r._4; cbY += r._5
          cbXY += r._6; cbXX += r._7 })
        if (day < lastDay && a.nonEmpty && b.nonEmpty && caN > 0 && cbN > 0) {
          val n = (caN + cbN).toDouble
          val sx = (caX + cbX).toDouble
          val sy = (caY + cbY).toDouble / 1e2
          val sxy = (caXY + cbXY).toDouble / 1e2
          val sxx = (caXX + cbXX).toDouble
          val varX = sxx - sx * sx / n
          if (varX > 0e0) {
            val theta = (sxy - sx * sy / n) / varX
            val mxp = sx / n
            val ya = (caY.toDouble / 1e2) / caN
            val yb = (cbY.toDouble / 1e2) / cbN
            val xa = caX.toDouble / caN
            val xb = cbX.toDouble / cbN
            Some((day, caN, cbN, math.round(theta * 1e6),
              math.round((ya - yb) * 1e6),
              math.round(((ya - theta * (xa - mxp)) -
                (yb - theta * (xb - mxp))) * 1e6)))
          } else None
        } else None
    }.toSet
    assert(batch == expected)
  }

  test("MW and CUPED monitor state RESTORES from checkpoints across " +
    "query restarts") {
    // same recovery shape as the z-monitor restart test: chunk 0 in
    // query-1, tear down, fresh query on the SAME checkpoint with the
    // remaining chunks — carried histograms / moments must come back
    // from the state store and the combined emissions equal the batch
    // face. Both new dayCloseFold instances prove recovery.
    val chunks = Files.list(java.nio.file.Paths.get(chunkedEventsDir))
      .iterator().asScala.toSeq.sortBy(_.getFileName.toString)
    def restartCase(tag: String,
        op: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.Dataset[_]): Unit = {
      val batch = op(spark.read.parquet(eventsFile))
        .toDF().collect().map(_.toString).toSet
      val src = tempDir(s"graft-$tag-restart-src")
      val ckpt = tempDir(s"graft-$tag-restart-ckpt").toString
      val out = tempDir(s"graft-$tag-restart-out").toString
      def runPass(): Unit = {
        val q = op(spark.readStream.schema(rawSchema)
            .option("maxFilesPerTrigger", 1).parquet(src.toString))
          .toDF()
          .writeStream.format("parquet").option("path", out)
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      Files.copy(chunks(0), src.resolve(chunks(0).getFileName))
      runPass()
      val afterFirst = spark.read.parquet(out).count()
      chunks.drop(1).foreach(c => Files.copy(c, src.resolve(c.getFileName)))
      runPass()
      val got = spark.read.parquet(out).collect().map(_.toString).toSet
      assert(got.size > afterFirst, s"vacuous: $tag restart pass emitted nothing")
      assert(got == batch,
        s"$tag restart divergence: only-stream=${got -- batch} only-batch=${batch -- got}")
    }
    restartCase("mw", EventAnalytics.mwMonitor)
    restartCase("cuped", EventAnalytics.cupedMonitor)
  }

  test("foreachBatch streaming upsert maintains the latest-per-key snapshot") {
    // the standard warehouse-merge deployment shape: each micro-batch
    // reduces to its per-key latest and merges into the running
    // snapshot via Upsert.latestSnapshot (versioned parquet dirs — a
    // batch must not overwrite the snapshot it is reading). Converges
    // to the batch latest-per-key regardless of chunking. (user_id,
    // event_type, ts) is tie-free in the fixture, so version = ts is a
    // total order per key.
    import org.apache.spark.sql.DataFrame
    val keys = Seq("user_id", "event_type")
    def latestPerKey(df: DataFrame): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("event_type"),
          col("m.ts").as("ts"), col("m.event_id").as("event_id"),
          col("m.value").as("value"))
    val expected = latestPerKey(graft.ingest.Readers.tsToNanos(
        spark.read.parquet(eventsFile)))
      .collect().map(_.toString).sorted.toSeq

    val snapRoot = tempDir("graft-fb-snap")
    @volatile var current: Option[String] = None
    val ckpt = tempDir("graft-fb-ckpt").toString
    val stream = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1).parquet(chunkedEventsDir)
    val q = graft.ingest.Readers.tsToNanos(stream)
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val reduced = latestPerKey(batch)
        val merged = current match {
          case None => reduced
          case Some(p) => graft.ext.Upsert.latestSnapshot(
            batch.sparkSession.read.parquet(p), reduced, keys, "ts")
        }
        val out = s"$snapRoot/v$id"
        merged.write.mode("overwrite").parquet(out)
        current = Some(out)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(current.nonEmpty, "foreachBatch never ran")
    val got = spark.read.parquet(current.get)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("stateful streaming geofence transitions equal the batch operator") {
    // a thin lon strip whose edges cut through the per-event jitter
    // range, so vehicles cross in and out between consecutive fixes
    val zones = Seq(
      "strip" -> Seq((39.0, -104.925), (39.0, -104.895),
        (39.5, -104.895), (39.5, -104.925)))
    def pts(df: org.apache.spark.sql.DataFrame) =
      graft.ingest.Readers.tsToNanos(df).select(col("event_id"),
        col("user_id"), col("ts"),
        expr("39e0 + (user_id % 50) * 1e-2 + ((event_id * 7919) % 1000) * 1e-5").as("lat"),
        expr("-105e0 + (user_id % 70) * 1e-2 + ((event_id * 104729) % 1000) * 1e-5").as("lon"))

    val expected = graft.ext.Geo.geofenceTransitions(
        pts(spark.read.parquet(eventsFile)), "user_id", "ts", "event_id",
        "lat", "lon", zones)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet

    val ckpt = tempDir("graft-geofence-stream").toString
    val stream = spark.readStream.schema(rawSchema).parquet(eventsPath)
    val q = EventAnalytics.geofenceTransitionsStream(pts(stream), zones)
      .writeStream.format("memory").queryName("zone_transitions")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("zone_transitions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet
    assert(expected.nonEmpty && got == expected)
  }

  test("streaming geofence counts equal batch over the same files") {
    // the geofence aggregate (explode zones -> filter -> groupBy) is a
    // plain streaming-compatible aggregation: the alerting face of
    // ext.Geo runs unchanged on a stream in Complete mode
    val zones = Seq(
      "west" -> Seq((39.0, -105.0), (39.0, -104.8), (39.5, -104.8), (39.5, -105.0)),
      "east" -> Seq((39.0, -104.8), (39.0, -104.3), (39.5, -104.3), (39.5, -104.8)))
    def geo(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Geo.geofenceCounts(
        graft.ingest.Readers.tsToNanos(df).select(col("value"),
          expr("39e0 + (user_id % 50) * 1e-2 + ((event_id * 7919) % 1000) * 1e-5").as("lat"),
          expr("-105e0 + (user_id % 70) * 1e-2 + ((event_id * 104729) % 1000) * 1e-5").as("lon")),
        "lat", "lon", "value", zones)

    val expected = geo(spark.read.parquet(eventsFile))
      .collect().map(_.toString).sorted.toSeq

    val stream = spark.readStream.schema(rawSchema).parquet(eventsPath)
    val q = geo(stream)
      .writeStream.format("memory").queryName("geofence_out")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("geofence_out").collect().map(_.toString).sorted.toSeq
    assert(expected.nonEmpty && got == expected)
  }

  test("mwMonitor tie term is exact past the Long t³ wrap (~2.1M per bucket)") {
    // 2.4M observations in one bucket: t³ ≈ 1.4e19 > Long.MaxValue — the
    // pre-fix Long accumulation wrapped NEGATIVE silently; the BigInt
    // accumulation must match an exact replay and differ from the wrap
    val nBig = 2400000L
    val nSmall = 100000L
    val day0 = lit("2024-01-01 00:00:00").cast("timestamp")
    val day1 = lit("2024-01-02 00:00:00").cast("timestamp")
    // arm-skewed mass (A owns bucket 5, B bucket 9): a symmetric split
    // gives U = n_a·n_b exactly and z = 0 regardless of ties
    val big = spark.range(nBig).select(day0.as("ts"),
      (col("id") * 2).as("user_id"), // even ⇒ arm A
      lit(5.0).as("value"), lit("{}").as("props"))
    val small = spark.range(nSmall).select(day0.as("ts"),
      (col("id") * 2 + 1).as("user_id"), // odd ⇒ arm B
      lit(9.0).as("value"), lit("{}").as("props"))
    val closer = spark.range(2).select(day1.as("ts"), col("id").as("user_id"),
      lit(5.0).as("value"), lit("{}").as("props"))
    val got = EventAnalytics.mwMonitor(big.union(small).union(closer))
      .collect()
    assert(got.length == 1)
    val r = got.head

    // exact replay (BigInt), then the wrapped value it must NOT equal
    // day-0 close: the day-1 closer rows are NOT in this readout
    val ca = Array.fill(2)(0L); val cb = Array.fill(2)(0L) // buckets 5, 9
    ca(0) = nBig  // all of bucket 5 sits in arm A...
    cb(1) = nSmall // ...all of bucket 9 in arm B
    var nA = 0L; var nB = 0L; var u2 = 0L; var bLess = 0L
    var tExact = BigInt(0); var tWrapped = 0L
    for (i <- 0 until 2) {
      u2 += ca(i) * (2L * bLess + cb(i)); bLess += cb(i)
      nA += ca(i); nB += cb(i)
      val t = ca(i) + cb(i)
      tExact += BigInt(t) * t * t - t
      tWrapped += t * t * t - t
    }
    assert(tExact != BigInt(tWrapped), "fixture too small to trigger the wrap")
    def z(tSum: Double): Double = {
      val n = (nA + nB).toDouble
      val sig2 = nA.toDouble * nB.toDouble / 12e0 *
        ((n + 1e0) - tSum / (n * (n - 1e0)))
      (u2.toDouble - nA.toDouble * nB.toDouble) / (2e0 * math.sqrt(sig2))
    }
    assert(r.n_a == nA && r.n_b == nB && r.u2 == u2)
    assert(r.z == z(tExact.toDouble), s"got z=${r.z} want ${z(tExact.toDouble)}")
    assert(r.z != z(tWrapped.toDouble), "wrapped and exact z coincide — vacuous")
  }

  test("cupedMonitor drops non-numeric covariate rows identically on both faces") {
    // a props.k that is present but non-numeric casts to NULL: before the
    // fix the batch face counted the row in n while skipping it in the
    // sums, and the streaming face crashed on a null in a non-nullable
    // encoder field. Both faces must drop it.
    val rows = Seq(
      // day 0: one clean row per arm + one poisoned row per arm
      ("2024-01-01 01:00:00", 0L, 10.0, """{"k":2}"""),
      ("2024-01-01 02:00:00", 2L, 20.0, """{"k":"abc"}"""),
      ("2024-01-01 03:00:00", 1L, 30.0, """{"k":4}"""),
      ("2024-01-01 04:00:00", 3L, 40.0, """{"k":[1,2]}"""),
      // day 1 (closes day 0): x values differ so pooled var(X) > 0
      ("2024-01-02 01:00:00", 0L, 11.0, """{"k":3}"""),
      ("2024-01-02 02:00:00", 1L, 12.0, """{"k":7}"""))
    val df = rows.toDF("tss", "user_id", "value", "props")
      .select(col("tss").cast("timestamp").as("ts"), col("user_id"),
        col("value"), col("props"))
    val batch = EventAnalytics.cupedMonitor(df).collect()
    assert(batch.length == 1)
    // n_a = n_b = 1: the poisoned rows are OUT of the counts, not just the sums
    assert(batch.head.n_a == 1L && batch.head.n_b == 1L,
      s"non-numeric k row leaked into n: ${batch.head}")

    val dir = tempDir("graft-cuped-poison")
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(df.schema).parquet(dir.toString)
    val q = EventAnalytics.cupedMonitor(stream)
      .toDF().writeStream.format("memory").queryName("cuped_poison")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tempDir("graft-cuped-poison-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("cuped_poison").collect()
    assert(got.map(_.toString).sorted.toSeq ==
      batch.map(r => org.apache.spark.sql.Row(r.day, r.n_a, r.n_b, r.theta,
        r.diff_raw, r.diff_adj).toString).sorted.toSeq)
  }
}
