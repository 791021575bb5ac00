package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.aggregate.FileAggregates
import graft.config.SuiteLoader
import graft.ext.{Bpe, Dedup, Events, LanguageModel, Multimodal, Packing, Retrieval, Sampling, Similarity, Stats, TextAnalysis}
import graft.ingest.{Metadata, Readers}
import graft.pipeline.{OdeSchema, Routing, ValidationPipeline}
import graft.plans.AsOf
import graft.rules.RuleCompiler
import graft.sequential.SequentialChecks
/** Round-8 batch: changepoint/seasonality/attribution/audit/graph. Split out of the monolithic registry
  * (r9 verdict item 5); every member keeps resolving
  * unqualified through the `Queries.type` self-type. */
private[graft] trait Analytics8Queries { this: Queries.type =>
  // =====================================================================
  // Ext: round-8 batch — changepoint / seasonality / attribution /
  // integrity audit / graph centrality / readability
  // =====================================================================

  /** CUSUM mean-shift changepoint per event series: s_i = Σ(n_j − μ)
   *  over the hourly counts, the classic drift detector; the changepoint
   *  estimate is the hour of maximal |s|. μ rides the SAME (type)
   *  window partitioning as the cumulative sum — one exchange; both
   *  engines accumulate in hour order (window frames evaluate in
   *  partition sort order), so s is bitwise reproducible. Tie-broken
   *  through lexicographic struct max (the min-struct precedent). */
  private[graft] def cusumChangepointQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourNs = 3600L * 1000000000L
    val hourly = events(s, dir)
      .withColumn("hour", expr(s"ts div $hourNs"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy(col("event_type"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRn = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    hourly
      .withColumn("mu", avg(col("n")).over(wAll))
      .withColumn("s",
        sum(col("n")).over(wCum) - row_number().over(wRn) * col("mu"))
      .groupBy(col("event_type"))
      .agg(max(struct(abs(col("s")).as("a"), col("hour").as("h"))).as("m"),
        round(avg(col("n")), 6).as("mean_hourly"))
      .select(col("event_type"), col("m.h").as("cp_hour"),
        round(col("m.a"), 4).as("max_dev"), col("mean_hourly"))
  }

  private[graft] val cusumChangepointOracle =
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, hour, n,
      |    avg(n) OVER (PARTITION BY event_type) AS mu,
      |    sum(n) OVER (PARTITION BY event_type ORDER BY hour
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      - row_number() OVER (PARTITION BY event_type ORDER BY hour)
      |        * avg(n) OVER (PARTITION BY event_type) AS s
      |  FROM h)
      |SELECT event_type,
      |  (max(struct_pack(a := abs(s), h := hour))).h AS cp_hour,
      |  round((max(struct_pack(a := abs(s), h := hour))).a, 4) AS max_dev,
      |  round(avg(n), 6) AS mean_hourly
      |FROM c GROUP BY 1""".stripMargin

  /** Seasonal load profile: (day-of-week × hour-of-day) occupancy per
   *  event type with the within-type share — the seasonality matrix a
   *  capacity planner or anomaly baseline reads. Pure integer epoch
   *  arithmetic (div/mod on nanos; 1970-01-01 anchors dow at Thursday=4)
   *  and one exact long division for the share. */
  private[graft] def seasonalProfileQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = events(s, dir)
      .withColumn("dow", expr("(ts div 86400000000000 + 4) % 7"))
      .withColumn("hod", expr("(ts div 3600000000000) % 24"))
      .groupBy(col("event_type"), col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"))
    counted
      .withColumn("share",
        round(col("n_events").cast("double") /
          sum(col("n_events")).over(
            Window.partitionBy(col("event_type"))), 6))
  }

  private[graft] val seasonalProfileOracle =
    """WITH c AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
      |    (epoch_ns(ts) // 3600000000000) % 24 AS hod,
      |    count(*) AS n_events
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT event_type, dow, hod, n_events,
      |  round(CAST(n_events AS DOUBLE) /
      |    sum(n_events) OVER (PARTITION BY event_type), 6) AS share
      |FROM c""".stripMargin

  /** First-touch / last-touch purchase attribution: each purchase is
   *  credited to the user's first and most recent PRECEDING
   *  non-purchase event ('direct' when none), then rolled up to
   *  (model, touch) conversion counts and value. The standard marketing
   *  attribution pair as two IGNORE-NULLS window reads over ONE
   *  user-keyed exchange — no self-join against the touch history. */
  private[graft] def touchAttributionQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val credited = events(s, dir)
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
    // both models EXPLODE out of one windowed pass — a two-branch union
    // of the same frame plans the window (scan + user exchange + sort)
    // twice, measured in the r8 plan audit
    credited.select(explode(array(
        struct(lit("first").as("model"),
          coalesce(col("first_touch"), lit("direct")).as("touch")),
        struct(lit("last").as("model"),
          coalesce(col("last_touch"), lit("direct")).as("touch"))))
        .as("m"), col("value"))
      .select(col("m.model").as("model"), col("m.touch").as("touch"),
        col("value"))
      .groupBy(col("model"), col("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        // exact DECIMAL accumulation — value is 2-dp data, and at large
        // SF a round(sum(double), 6) digit flips with partial-agg order
        // (the r7 q_incremental_join mechanism)
        sum(col("value").cast(DecimalType(18, 2)))
          .cast("double").as("value_sum"))
  }

  private[graft] val touchAttributionOracle =
    """WITH t AS (
      |  SELECT event_type, value,
      |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |      IGNORE NULLS) OVER w AS first_touch,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |      IGNORE NULLS) OVER w AS last_touch
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |p AS (SELECT * FROM t WHERE event_type = 'purchase'),
      |u AS (
      |  SELECT 'first' AS model, coalesce(first_touch, 'direct') AS touch,
      |    value FROM p
      |  UNION ALL
      |  SELECT 'last' AS model, coalesce(last_touch, 'direct') AS touch,
      |    value FROM p)
      |SELECT model, touch, count(*) AS n_purchases,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM u GROUP BY 1, 2""".stripMargin

  /** Referential-integrity audit over a simulated PARTIAL dimension
   *  load (every k-th parent key "not yet arrived" — the late-arriving
   *  dimension scenario): per relation, child count, orphan count, and
   *  orphan fraction via left-anti probes. Each probe is one equi-join
   *  the planner broadcasts when the parent key set is small; at scale
   *  the anti join shuffles by the key — never a scan-per-key loop. */
  private[graft] def fkOrphansQ(s: SparkSession, dir: String): DataFrame = {
    def audit(rel: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
      val orphans = child.join(parent,
        child(childKey) === parent(parentKey), "left_anti")
      child.agg(count(lit(1)).as("n_children"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(rel).as("relation"), col("n_children"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_children"), 6)
            .as("orphan_frac"))
    }
    val orders = s.read.parquet(t(dir, "orders"))
    val li = s.read.parquet(t(dir, "lineitem"))
    audit("orders->customer", orders.select(col("o_custkey")), "o_custkey",
        s.read.parquet(t(dir, "customer"))
          .filter(col("c_custkey") % 97 =!= 0).select(col("c_custkey")),
        "c_custkey")
      .unionByName(audit("lineitem->orders",
        li.select(col("l_orderkey")), "l_orderkey",
        orders.filter(col("o_orderkey") % 89 =!= 0).select(col("o_orderkey")),
        "o_orderkey"))
      .unionByName(audit("lineitem->part",
        li.select(col("l_partkey")), "l_partkey",
        s.read.parquet(t(dir, "part"))
          .filter(col("p_partkey") % 83 =!= 0).select(col("p_partkey")),
        "p_partkey"))
  }

  private[graft] val fkOrphansOracle =
    """SELECT 'orders->customer' AS relation,
      |  (SELECT count(*) FROM orders) AS n_children,
      |  (SELECT count(*) FROM orders WHERE o_custkey NOT IN
      |    (SELECT c_custkey FROM customer WHERE c_custkey % 97 <> 0))
      |    AS n_orphans,
      |  round(CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN
      |    (SELECT c_custkey FROM customer WHERE c_custkey % 97 <> 0))
      |    AS DOUBLE) / (SELECT count(*) FROM orders), 6) AS orphan_frac
      |UNION ALL
      |SELECT 'lineitem->orders',
      |  (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
      |    (SELECT o_orderkey FROM orders WHERE o_orderkey % 89 <> 0)),
      |  round(CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
      |    (SELECT o_orderkey FROM orders WHERE o_orderkey % 89 <> 0))
      |    AS DOUBLE) / (SELECT count(*) FROM lineitem), 6)
      |UNION ALL
      |SELECT 'lineitem->part',
      |  (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
      |    (SELECT p_partkey FROM part WHERE p_partkey % 83 <> 0)),
      |  round(CAST((SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
      |    (SELECT p_partkey FROM part WHERE p_partkey % 83 <> 0))
      |    AS DOUBLE) / (SELECT count(*) FROM lineitem), 6)""".stripMargin

  /** PageRank (d = 0.85, 3 synchronous iterations) over the co-purchase
   *  part graph — same bounded edge construction as the triangle census
   *  (parts sharing an order, pk % 7 filter). Every node in the edge
   *  list has degree ≥ 1 by construction, so there is no dangling mass
   *  to redistribute; contributions aggregate per node (one key shuffle
   *  per iteration). Rounded to 8 dp: per-node fan-in keeps
   *  accumulation noise ~1e-14, six orders under the rounding margin. */
  private[graft] def pagerankPartsQ(s: SparkSession, dir: String): DataFrame = {
    val lp = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("pk") % 7 === 0)
      .distinct()
    val undirected = lp.as("x").join(lp.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
      .distinct()
    val edges = undirected
      .unionByName(undirected.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("a").as("node"), col("deg"))
    val n = nodes.count().toDouble
    var pr = nodes.withColumn("pr", lit(1.0) / n)
    for (_ <- 1 to 3) {
      pr = edges.join(pr, edges("a") === pr("node"))
        .groupBy(col("b"))
        .agg(sum(col("pr") / col("deg")).as("inflow"))
        .join(nodes, col("b") === col("node"))
        .select(col("node"), col("deg"),
          // literals mirror the oracle's 15e-2/85e-2 EXACTLY — Scala's
          // (1 - 0.85) is 0.15000000000000002, one ulp off DuckDB's
          // 15e-2, and the mismatch would propagate through three
          // iterations (the decimal-literal trap, double-op edition)
          (lit(15e-2) / lit(n) + lit(85e-2) * col("inflow")).as("pr"))
    }
    pr.select(col("node").as("part_id"), round(col("pr"), 8).as("pagerank"))
  }

  private[graft] val pagerankPartsOracle =
    """WITH lp AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem WHERE l_partkey % 7 = 0),
      |und AS (
      |  SELECT DISTINCT x.pk AS a, y.pk AS b
      |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.pk < y.pk),
      |e AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
      |deg AS (SELECT a AS node, count(*) AS deg FROM e GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM deg),
      |it0 AS (SELECT node, deg, 1e0 / n.n AS pr FROM deg, n),
      |it1 AS (
      |  SELECT d.node, d.deg, 15e-2 / n.n + 85e-2 * sum(p.pr / p.deg) AS pr
      |  FROM e JOIN it0 p ON e.a = p.node JOIN deg d ON e.b = d.node, n
      |  GROUP BY 1, 2, n.n),
      |it2 AS (
      |  SELECT d.node, d.deg, 15e-2 / n.n + 85e-2 * sum(p.pr / p.deg) AS pr
      |  FROM e JOIN it1 p ON e.a = p.node JOIN deg d ON e.b = d.node, n
      |  GROUP BY 1, 2, n.n),
      |it3 AS (
      |  SELECT d.node, d.deg, 15e-2 / n.n + 85e-2 * sum(p.pr / p.deg) AS pr
      |  FROM e JOIN it2 p ON e.a = p.node JOIN deg d ON e.b = d.node, n
      |  GROUP BY 1, 2, n.n)
      |SELECT node AS part_id, round(pr, 8) AS pagerank FROM it3""".stripMargin

  /** Flesch reading-ease per document with vowel-group syllable
   *  estimation (the standard no-dictionary heuristic: one syllable per
   *  maximal [aeiouy]+ run — runs never span the single-space word
   *  separators, so one whole-text regexp count equals the per-word
   *  sum). The corpus is sentence-less, so the sentence term fixes at
   *  n_words/1 — documented degenerate. Doubles enter only through two
   *  int ratios and e-notation literals (the decimal-literal trap). */
  private[graft] def readabilityQ(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      size(split(col("text"), " ")).as("n_words"),
      size(expr("regexp_extract_all(text, '[aeiouy]+', 0)")).as("n_syllables"))
      .withColumn("flesch",
        round(lit(206835e-3) - lit(1015e-3) * col("n_words") -
          lit(846e-1) * (col("n_syllables") / col("n_words")), 4))

  private[graft] val readabilityOracle =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
      |  CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS INTEGER)
      |    AS n_syllables,
      |  round(206835e-3 - 1015e-3 * len(string_split(text, ' '))
      |    - 846e-1 * (CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS DOUBLE)
      |      / len(string_split(text, ' '))), 4) AS flesch
      |FROM documents""".stripMargin

  /** Cross-source n-gram novelty: the fraction of a source's distinct
   *  word trigrams appearing in NO other source — the overlap readout
   *  that decides whether a new crawl slice adds anything. Distinct
   *  (source, gram) pairs → per-gram source counts → per-source novel
   *  share; two gram-keyed exchanges, never a source×source matrix. */
  private[graft] def ngramNoveltyQ(s: SparkSession, dir: String): DataFrame = {
    val pairs = docs(s, dir)
      .withColumn("w", split(col("text"), " "))
      // explicit >=3-word guard: Spark's sequence(1, 0) runs DESCENDING
      // ([1, 0]) where DuckDB's generate_series(1, 0) is empty — a
      // short doc must not reach the sequence at all
      .filter(size(col("w")) >= 3)
      .select(col("source"), explode(expr(
        """transform(sequence(1, size(w) - 2),
          |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
          |    element_at(w, i + 2)))""".stripMargin)).as("g"))
      .distinct()
    val spread = pairs.groupBy(col("g")).agg(count(lit(1)).as("n_sources"))
    pairs.join(spread, "g")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novel_frac",
        round(col("n_novel").cast("double") / col("n_ngrams"), 6))
  }

  private[graft] val ngramNoveltyOracle =
    """WITH w AS (
      |  SELECT source, string_split(text, ' ') AS ws FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |p AS (
      |  SELECT DISTINCT source,
      |    ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
      |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS u(i)),
      |sp AS (SELECT g, count(*) AS n_sources FROM p GROUP BY 1)
      |SELECT source, count(*) AS n_ngrams,
      |  CAST(sum(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  round(CAST(sum(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS novel_frac
      |FROM p JOIN sp USING (g) GROUP BY 1""".stripMargin

  /** At-least-once delivery audit: a CDC feed re-delivers a slice
   *  (every 101st order's lines), and the audit reports business-key
   *  (l_orderkey, l_linenumber) integrity — row/key counts, duplicated
   *  keys, worst multiplicity. One keyed aggregate, one scalar roll-up. */
  private[graft] def dupKeyAuditQ(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"))
    val delivered = li.unionByName(li.filter(col("l_orderkey") % 101 === 0))
    delivered
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("m"))
      .agg(sum(col("m")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("m") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        max(col("m")).as("max_multiplicity"))
  }

  private[graft] val dupKeyAuditOracle =
    """WITH d AS (
      |  SELECT l_orderkey, l_linenumber FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber FROM lineitem
      |  WHERE l_orderkey % 101 = 0),
      |k AS (
      |  SELECT l_orderkey, l_linenumber, count(*) AS m
      |  FROM d GROUP BY 1, 2)
      |SELECT CAST(sum(m) AS BIGINT) AS n_rows, count(*) AS n_keys,
      |  CAST(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
      |  max(m) AS max_multiplicity
      |FROM k""".stripMargin

  /** Right-to-erasure audit: deletion requests (every 131st user)
   *  propagate through the event store — per event type, purged and
   *  retained rows plus the purged value. The request set derives from
   *  the data (deterministic), the purge is one broadcastable semi/anti
   *  pair on the user key. */
  private[graft] def gdprErasureQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val del = ev.select(col("user_id")).distinct()
      .filter(col("user_id") % 131 === 0)
    val flagged = ev.join(broadcast(del.withColumn("__del", lit(1))),
      Seq("user_id"), "left")
    flagged.groupBy(col("event_type"))
      .agg(
        sum(when(col("__del").isNotNull, 1L).otherwise(0L)).as("n_purged"),
        sum(when(col("__del").isNull, 1L).otherwise(0L)).as("n_kept"),
        // exact DECIMAL accumulation (see q_touch_attribution)
        sum(when(col("__del").isNotNull, col("value")).otherwise(lit(0.0))
          .cast(DecimalType(18, 2))).cast("double").as("purged_value"))
  }

  private[graft] val gdprErasureOracle =
    """WITH del AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id % 131 = 0)
      |SELECT event_type,
      |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM del)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
      |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM del)
      |    THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CAST(CASE WHEN user_id IN (SELECT user_id FROM del)
      |    THEN value ELSE 0e0 END AS DECIMAL(18,2))) AS DOUBLE)
      |    AS purged_value
      |FROM events GROUP BY 1""".stripMargin

  /** Per-label embedding centroid drift between the two vec_id parity
   *  halves — the "did the embedding distribution move between
   *  batches?" readout. Per-dim means aggregate on (label, half, pos);
   *  the cosine reduces the two centroids dim-wise — everything is
   *  dims-bounded after one posexplode pass, no vector ever collects. */
  private[graft] def centroidDriftQ(s: SparkSession, dir: String): DataFrame = {
    val byDim = embs(s, dir)
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("half"), col("pos"))
      .agg(avg(col("v")).as("c"))
    val a = byDim.filter(col("half") === 0)
      .select(col("label"), col("pos"), col("c").as("ca"))
    val b = byDim.filter(col("half") === 1)
      .select(col("label").as("lb"), col("pos").as("pb"), col("c").as("cb"))
    a.join(b, col("label") === col("lb") && col("pos") === col("pb"))
      .groupBy(col("label"))
      .agg(round(sum(col("ca") * col("cb")) /
          (sqrt(sum(col("ca") * col("ca"))) * sqrt(sum(col("cb") * col("cb")))), 6)
        .as("centroid_cosine"))
  }

  private[graft] val centroidDriftOracle =
    """WITH d AS (
      |  SELECT label, vec_id % 2 AS half, u.pos AS pos,
      |    embedding[u.pos] AS v
      |  FROM embeddings, unnest(generate_series(1, 64)) AS u(pos)),
      |c AS (
      |  SELECT label, half, pos, avg(v) AS c
      |  FROM d GROUP BY 1, 2, 3)
      |SELECT a.label,
      |  round(sum(a.c * b.c) /
      |    (sqrt(sum(a.c * a.c)) * sqrt(sum(b.c * b.c))), 6)
      |    AS centroid_cosine
      |FROM c a JOIN c b ON a.label = b.label AND a.pos = b.pos
      |  AND a.half = 0 AND b.half = 1
      |GROUP BY 1""".stripMargin

  /** Per-group tail bands (p10/p50/p90 of event value per type) through
   *  the SCALABLE exact-quantile machinery — the group-wise face of
   *  [[Stats.groupedExactQuantiles]]: ALL groups advance through the
   *  histogram-refinement rounds together in one job graph (r8 VERDICT
   *  item 5 — the per-group sequential form serialized the driver as
   *  group cardinality grew), each histogram-guided instead of
   *  distinct-value-buffered. Band populations ride one grouped pass,
   *  so the comparison-robust part of the contract (counts) is checked
   *  alongside the interpolated boundaries. */
  private[graft] def quantileBandsQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_type"), col("value"))
    val bandDf = graft.ext.Stats.groupedExactQuantiles(
        ev, "event_type", "value", Seq(0.1, 0.5, 0.9))
      .toDF("event_type", "p10", "p50", "p90")
    ev.join(broadcast(bandDf), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(first(col("p10")), 6).as("p10"),
        round(first(col("p50")), 6).as("p50"),
        round(first(col("p90")), 6).as("p90"),
        sum(when(col("value") < col("p10"), 1L).otherwise(0L)).as("n_below_p10"),
        sum(when(col("value") > col("p90"), 1L).otherwise(0L)).as("n_above_p90"))
  }

  private[graft] val quantileBandsOracle =
    """WITH b AS (
      |  SELECT event_type,
      |    quantile_cont(value, 1e-1) AS p10,
      |    quantile_cont(value, 5e-1) AS p50,
      |    quantile_cont(value, 9e-1) AS p90
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, count(*) AS n_events,
      |  round(any_value(b.p10), 6) AS p10,
      |  round(any_value(b.p50), 6) AS p50,
      |  round(any_value(b.p90), 6) AS p90,
      |  CAST(sum(CASE WHEN e.value < b.p10 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_below_p10,
      |  CAST(sum(CASE WHEN e.value > b.p90 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_above_p90
      |FROM events e JOIN b USING (event_type)
      |GROUP BY 1""".stripMargin

  /** Session entry paths: 30-minute-gap sessionization, each session
   *  reduced to its first three event types joined with '>' — the
   *  landing-path report. The ordered per-session list materializes
   *  through sort_array(collect_list(struct)), the registry's
   *  order-independence idiom, so the path is identical under any
   *  partial-aggregation order. */
  /** ONE definition of the 30-minute sessionized frame and the
    * first-3-types path extraction, shared by q_session_paths and
    * q_path_conversion (two copies would silently drift — r8 review). */
  private[graft] def sessionizedEvents(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapNs = 1800L * 1000000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col("ts") - col("_prev") > gapNs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
  }

  private[graft] val sessionPathExpr =
    array_join(slice(transform(
      sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type").as("t")))),
      x => x.getField("t")), 1, 3), ">")

  private[graft] def sessionPathsQ(s: SparkSession, dir: String): DataFrame =
    sessionizedEvents(s, dir)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(sessionPathExpr.as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))

  /** The SQL face of [[sessionizedEvents]]+[[sessionPathExpr]]: ONE
    * definition of the sessionization CTEs (30-min gap, (tns, event_id)
    * tie-break, first-3-types path), interpolated into both the
    * session-paths and path-conversion oracles so the two cannot drift
    * from each other any more than the Scala side can. */
  private[graft] val sessionizedCteSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns,
      |    lag(epoch_ns(ts)) OVER w AS prev
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      |m AS (
      |  SELECT *, CASE WHEN prev IS NULL OR tns - prev > 1800000000000
      |    THEN 1 ELSE 0 END AS nw
      |  FROM e),
      |g AS (
      |  SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY tns, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM m)""".stripMargin

  private[graft] val sessionPathSliceSql =
    """array_to_string(list_slice(
      |      list(event_type ORDER BY tns, event_id), 1, 3), '>')""".stripMargin

  private[graft] val sessionPathsOracle =
    s"""$sessionizedCteSql,
      |p AS (
      |  SELECT user_id, session_seq,
      |    $sessionPathSliceSql AS path
      |  FROM g GROUP BY 1, 2)
      |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1""".stripMargin

  /** Inverted index over the corpus vocabulary: per term, document
   *  frequency and the first ten postings (sorted doc ids) — the
   *  retrieval-side artifact a BM25 service would precompute. Postings
   *  stay bounded (slice 10) so the row width never grows with the
   *  corpus; sort_array makes the set's order canonical. The postings
   *  readout is a ','-joined STRING, not a LIST: a LIST column crashes
   *  the driver's pandas sort_values comparator (unhashable ndarray),
   *  and the joined form of a sorted integer list is equally canonical. */
  private[graft] def invertedIndexQ(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .groupBy(col("term"))
      // pairs are already distinct — count(*) IS the document frequency
      // (countDistinct would re-dedup what collect_set dedups again)
      .agg(count(lit(1)).as("df"),
        array_join(slice(sort_array(collect_set(col("doc_id"))), 1, 10), ",")
          .as("postings"))

  private[graft] val invertedIndexOracle =
    """WITH p AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |f AS (SELECT doc_id, term FROM p WHERE len(term) > 0)
      |SELECT term, count(DISTINCT doc_id) AS df,
      |  array_to_string(
      |    list_slice(list_sort(list(DISTINCT doc_id)), 1, 10), ',')
      |    AS postings
      |FROM f GROUP BY 1""".stripMargin

  /** CUPED-adjusted A/B readout: variance reduction with the pre-period
   *  metric as covariate (theta = cov(x,y)/var(x)), the standard
   *  experimentation-platform estimator. Pre/post split at the integer
   *  midpoint hour, variant by user parity; theta and the covariate
   *  mean broadcast from one 1-row aggregate. */
  /** Events with the CUPED pre-period midpoint attached (integer
    * floor-div hour; `hour < mid` IS the pre-period) — ONE definition
    * shared by the CUPED adjustment and the covariate-balance screen,
    * which must agree on what "pre-period" means or the balance check
    * silently screens a different window than CUPED adjusts on.
    * Integer floor division for the midpoint — a /2-then-cast would
    * TRUNCATE in Spark but ROUND in DuckDB on odd hour sums. */
  private[graft] def eventsWithMid(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    val ev = events(s, dir).withColumn("hour", expr(s"ts div $hourNs"))
    ev.crossJoin(broadcast(
      ev.agg(expr("(min(hour) + max(hour)) div 2").as("mid"))))
  }

  private[graft] def cupedAbtestQ(s: SparkSession, dir: String): DataFrame = {
    val perUser = eventsWithMid(s, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("hour") < col("mid"), col("value"))
          .otherwise(lit(0.0))).as("x"),
        sum(when(col("hour") >= col("mid"), col("value"))
          .otherwise(lit(0.0))).as("y"))
      .withColumn("variant", (col("user_id") % 2).cast("int"))
      // two consumers (theta/mean stats + the adjusted roll-up): the
      // user-keyed aggregate is the expensive pass and must run once
      .localCheckpoint(true)
    val stats = perUser.agg(
      (covar_samp(col("x"), col("y")) / var_samp(col("x"))).as("theta"),
      avg(col("x")).as("mean_x"))
    perUser.crossJoin(broadcast(stats))
      .withColumn("y_adj",
        col("y") - col("theta") * (col("x") - col("mean_x")))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        round(avg(col("y")), 6).as("mean_y"),
        round(avg(col("y_adj")), 6).as("mean_y_cuped"),
        round(first(col("theta")), 6).as("theta"))
  }

  private[graft] val cupedAbtestOracle =
    """WITH h AS (
      |  SELECT user_id, value, epoch_ns(ts) // 3600000000000 AS hour
      |  FROM events),
      |m AS (SELECT (min(hour) + max(hour)) // 2 AS mid FROM h),
      |u AS (
      |  SELECT user_id,
      |    sum(CASE WHEN hour < m.mid THEN value ELSE 0e0 END) AS x,
      |    sum(CASE WHEN hour >= m.mid THEN value ELSE 0e0 END) AS y,
      |    CAST(user_id % 2 AS INT) AS variant
      |  FROM h, m GROUP BY 1, m.mid),
      |s AS (
      |  SELECT covar_samp(x, y) / var_samp(x) AS theta, avg(x) AS mean_x
      |  FROM u)
      |SELECT variant, count(*) AS n_users,
      |  round(avg(y), 6) AS mean_y,
      |  round(avg(y - s.theta * (x - s.mean_x)), 6) AS mean_y_cuped,
      |  round(any_value(s.theta), 6) AS theta
      |FROM u, s GROUP BY 1""".stripMargin

  /** Exponential time-decay engagement score per user (half-life 7
   *  days, anchored at the corpus max timestamp so the result is a
   *  function of the data alone): the recency-weighted activity
   *  readout feature stores export. One 1-value broadcast + one
   *  user-keyed aggregate; identical IEEE expression both engines
   *  (integer nanos → one division → pow). */
  private[graft] def timeDecayScoreQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val mx = ev.agg(max(col("ts")).as("mx"))
    ev.crossJoin(broadcast(mx))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        // each decayed term rounds to DECIMAL(18,12) per-row (a
        // deterministic per-row op both engines perform on the same
        // double), then sums EXACTLY — round(sum(double), 6) over
        // irrational addends is the r7 layout-dependent flake class
        round(sum((col("value") *
            pow(lit(2.0), -((col("mx") - col("ts")) / lit(6048e11))))
          .cast(DecimalType(18, 12))).cast("double"), 6)
          .as("decay_score"))
  }

  private[graft] val timeDecayScoreOracle =
    """WITH m AS (SELECT max(epoch_ns(ts)) AS mx FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  round(CAST(sum(CAST(value * pow(2e0, -((m.mx - epoch_ns(ts)) / 6048e11))
      |    AS DECIMAL(18,12))) AS DOUBLE), 6) AS decay_score
      |FROM events, m GROUP BY 1""".stripMargin

  /** Pairwise source vocabulary overlap (Jaccard over distinct word
   *  sets) through the shared-word inverted index — per word the
   *  source fan-out is bounded by the source count, so the pair list
   *  never materializes a source×source×vocab product. */
  private[graft] def sourceOverlapQ(s: SparkSession, dir: String): DataFrame = {
    val pairs = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      // three consumers (two self-join sides + the sizes aggregate):
      // without materialization the sizes branch re-runs the full
      // scan+explode+distinct
      .localCheckpoint(true)
    val sizes = pairs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val common = pairs.as("a").join(pairs.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("na"))),
        "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("nb"))),
        "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")), 6).as("jaccard"))
  }

  private[graft] val sourceOverlapOracle =
    """WITH p AS (
      |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |f AS (SELECT source, w FROM p WHERE len(w) > 0),
      |sz AS (SELECT source, count(*) AS n FROM f GROUP BY 1),
      |c AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    count(*) AS n_common
      |  FROM f a JOIN f b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b, n_common,
      |  round(CAST(n_common AS DOUBLE) /
      |    (sa.n + sb.n - n_common), 6) AS jaccard
      |FROM c JOIN sz sa ON sa.source = c.source_a
      |  JOIN sz sb ON sb.source = c.source_b""".stripMargin

  /** KMV (k-minimum-values) sketch set operations across sources — the
   *  mergeable distinct-count sketch that answers |A∪B|, Jaccard, and
   *  |A∩B| for EVERY source pair from one tiny per-source summary,
   *  where the exact answer (q_source_overlap) must self-join the full
   *  vocabulary: at 100 TB the sketches are k=256 longs per source and
   *  the pair merge touches only sources² · k rows. Estimators are the
   *  standard KMV forms (û = (k−1)·2^60/h_(k) over the 60-bit md5
   *  hash space; Ĵ = |both ∩ k-min(A∪B)|/k), fully value-replayable:
   *  ranks are integer, and the two final double ops run in the same
   *  order in both engines. Sketches smaller than k ARE the exact set
   *  (the CASE arm). */
  /** KMV sketch size — the ONE definition both the Spark face and the
    * oracle derive every constant from (k−1 numerator, rank cut,
    * below-k exact arm); a hand-copied 255 would silently break the
    * union estimate if k were retuned (r9 review). */
  private[graft] val kmvK = 256

  private[graft] def kmvSetOpsQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = kmvK
    val hs = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("source"),
        expr("graft_md5_prefix_long(w, 15)")
          .as("h"))
      .distinct()
    val wr = Window.partitionBy(col("source")).orderBy(col("h"))
    val sketch = hs
      .withColumn("r", row_number().over(wr)).filter(col("r") <= k)
      .select(col("source"), col("h"))
      .localCheckpoint(true) // feeds the source list + both pair sides
    val srcs = sketch.select(col("source")).distinct()
    val pairs = srcs.as("x").join(srcs.as("y"),
        col("x.source") < col("y.source"))
      .select(col("x.source").as("sa"), col("y.source").as("sb"))
    val fromA = pairs.join(sketch, col("source") === col("sa"))
      .select(col("sa"), col("sb"), col("h"),
        lit(1).as("ia"), lit(0).as("ib"))
    val fromB = pairs.join(sketch, col("source") === col("sb"))
      .select(col("sa"), col("sb"), col("h"),
        lit(0).as("ia"), lit(1).as("ib"))
    val wm = Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))
    val topk = fromA.unionByName(fromB)
      .groupBy(col("sa"), col("sb"), col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .withColumn("r", row_number().over(wm)).filter(col("r") <= k)
    topk.groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
      .agg(count(lit(1)).as("sketch_n"), max(col("h")).as("uk"),
        sum(when(col("ia") === 1 && col("ib") === 1, 1L).otherwise(0L))
          .as("matches"))
      .withColumn("est_union_raw",
        when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .otherwise(expr(s"${k - 1}e0 * 1152921504606846976e0 / uk")))
      .withColumn("jac_raw", col("matches").cast("double") / col("sketch_n"))
      .select(col("source_a"), col("source_b"), col("sketch_n"),
        round(col("est_union_raw"), 1).as("est_union"),
        round(col("jac_raw"), 6).as("est_jaccard"),
        round(col("jac_raw") * col("est_union_raw"), 1)
          .as("est_intersection"))
  }

  private[graft] val kmvSetOpsOracle =
    s"""WITH p AS (
      |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |hs AS (
      |  SELECT DISTINCT source,
      |    ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
      |  FROM p WHERE len(w) > 0),
      |sk AS (
      |  SELECT source, h FROM (
      |    SELECT source, h,
      |      row_number() OVER (PARTITION BY source ORDER BY h) AS r
      |    FROM hs) WHERE r <= $kmvK),
      |srcs AS (SELECT DISTINCT source FROM sk),
      |pr AS (
      |  SELECT a.source AS sa, b.source AS sb
      |  FROM srcs a JOIN srcs b ON a.source < b.source),
      |m AS (
      |  SELECT sa, sb, h, max(ia) AS ia, max(ib) AS ib FROM (
      |    SELECT pr.sa, pr.sb, sk.h, 1 AS ia, 0 AS ib
      |    FROM pr JOIN sk ON sk.source = pr.sa
      |    UNION ALL
      |    SELECT pr.sa, pr.sb, sk.h, 0, 1
      |    FROM pr JOIN sk ON sk.source = pr.sb)
      |  GROUP BY 1, 2, 3),
      |tk AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS r
      |    FROM m) WHERE r <= $kmvK),
      |agg AS (
      |  SELECT sa AS source_a, sb AS source_b, count(*) AS sketch_n,
      |    max(h) AS uk,
      |    CAST(count(*) FILTER (WHERE ia = 1 AND ib = 1) AS BIGINT)
      |      AS matches
      |  FROM tk GROUP BY 1, 2),
      |est AS (
      |  SELECT source_a, source_b, sketch_n,
      |    CASE WHEN sketch_n < $kmvK THEN CAST(sketch_n AS DOUBLE)
      |      ELSE ${kmvK - 1}e0 * 1152921504606846976e0 / uk END
      |      AS est_union_raw,
      |    CAST(matches AS DOUBLE) / sketch_n AS jac_raw
      |  FROM agg)
      |SELECT source_a, source_b, sketch_n,
      |  round(est_union_raw, 1) AS est_union,
      |  round(jac_raw, 6) AS est_jaccard,
      |  round(jac_raw * est_union_raw, 1) AS est_intersection
      |FROM est""".stripMargin

  /** Delta-encoding bit-width audit over the per-user event-time
   *  layout: successive timestamp gaps reduced to their binary bit
   *  length (length of the base-2 string — no log2, whose
   *  exact-power-of-two boundary rounds differently per libm), then
   *  the bit-width histogram a columnar encoder would size from. */
  private[graft] def deltaBitsQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(length(bin(col("gap"))).as("bits"))
      .agg(count(lit(1)).as("n_gaps"))
      .withColumn("share",
        round(col("n_gaps").cast("double") /
          sum(col("n_gaps")).over(Window.partitionBy()), 6))
  }

  private[graft] val deltaBitsOracle =
    """WITH g AS (
      |  SELECT epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
      |    PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS gap
      |  FROM events),
      |b AS (
      |  SELECT CAST(length(bin(gap)) AS INTEGER) AS bits, count(*) AS n_gaps
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
      |SELECT bits, n_gaps,
      |  round(CAST(n_gaps AS DOUBLE) / sum(n_gaps) OVER (), 6) AS share
      |FROM b""".stripMargin

  /** EWMA level per event series (α = 0.3 over the hour-ordered
   *  counts): the exponential smoothing baseline an alerting rule
   *  compares the live rate against. The recursion folds LEFT over the
   *  sorted-collected series — Spark `aggregate` seeded with the first
   *  element matches DuckDB `list_reduce`'s no-zero semantics exactly,
   *  and a left fold of identical IEEE ops is bitwise reproducible
   *  (unlike a sum, there is no reorderable accumulation). Series
   *  length is hours-bounded per type; α literals in e-notation (a
   *  bare 0.3 parses DECIMAL in DuckDB). */
  private[graft] def ewmaLevelQ(s: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000000000L
    events(s, dir)
      .withColumn("hour", expr(s"ts div $hourNs"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        expr("""sort_array(collect_list(struct(hour, n)))""").as("series"))
      .withColumn("vals",
        expr("transform(series, s -> CAST(s.n AS DOUBLE))"))
      .select(col("event_type"), col("n_hours"),
        round(expr(
          """aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)),
            |  element_at(vals, 1),
            |  (acc, x) -> acc * 7e-1 + x * 3e-1)""".stripMargin), 6)
          .as("ewma_level"),
        round(element_at(col("vals"), -1), 6).as("last_value"))
  }

  private[graft] val ewmaLevelOracle =
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, count(*) AS n_hours,
      |    list_transform(list(n ORDER BY hour),
      |      x -> CAST(x AS DOUBLE)) AS vals
      |  FROM h GROUP BY 1)
      |SELECT event_type, n_hours,
      |  round(list_reduce(vals, (acc, x) -> acc * 7e-1 + x * 3e-1), 6)
      |    AS ewma_level,
      |  round(vals[-1], 6) AS last_value
      |FROM s""".stripMargin

  /** Conversion rate per session ENTRY path: the q_session_paths
   *  sessionization reused, each session flagged by whether it ever
   *  converts (any purchase), rolled up per first-3-types path. Same
   *  single user-keyed exchange; the flag is a max() over the session
   *  group, not a second pass. */
  private[graft] def pathConversionQ(s: SparkSession, dir: String): DataFrame = {
    sessionizedEvents(s, dir)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        sessionPathExpr.as("path"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"))
      .withColumn("conversion_rate",
        round(col("n_converted").cast("double") / col("n_sessions"), 6))
  }

  private[graft] val pathConversionOracle =
    s"""$sessionizedCteSql,
      |p AS (
      |  SELECT user_id, session_seq,
      |    $sessionPathSliceSql AS path,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS converted
      |  FROM g GROUP BY 1, 2)
      |SELECT path, count(*) AS n_sessions,
      |  CAST(sum(converted) AS BIGINT) AS n_converted,
      |  round(CAST(sum(converted) AS DOUBLE) / count(*), 6)
      |    AS conversion_rate
      |FROM p GROUP BY 1""".stripMargin

  /** Vocabulary coverage curve: the token-mass share covered by the
   *  top-k most frequent words, at the budget points a tokenizer
   *  designer reads (k = 5/10/20/30 on this 31-word synthetic vocab) — the cumulative face of the
   *  Zipf fit. Vocab-bounded windows after one word-keyed aggregate;
   *  rank ties broken by word for a total order. */
  private[graft] def vocabCoverageQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val wRank = Window.orderBy(col("n").desc, col("w"))
    // The grand total comes from the SAME single-partition window pass
    // (unbounded-following frame) — a second aggregate + crossJoin would
    // plan the word-count subtree twice for a value already in hand.
    val ranked = counts
      .withColumn("rank", row_number().over(wRank))
      .withColumn("cum", sum(col("n")).over(
        wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(
        wRank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    ranked.filter(col("rank").isin(5, 10, 20, 30))
      .select(col("rank").as("k"),
        round(col("cum").cast("double") / col("total"), 6).as("coverage"))
  }

  private[graft] val vocabCoverageOracle =
    """WITH c AS (
      |  SELECT w, count(*) AS n FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0 GROUP BY 1),
      |r AS (
      |  SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rank,
      |    sum(n) OVER (ORDER BY n DESC, w
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM c),
      |t AS (SELECT sum(n) AS total FROM c)
      |SELECT CAST(rank AS INTEGER) AS k,
      |  round(CAST(cum AS DOUBLE) / t.total, 6) AS coverage
      |FROM r, t WHERE rank IN (5, 10, 20, 30)""".stripMargin

  /** 7-day rolling retention: of the users active on day d, the share
   *  also active on day d+7 — the product-health curve. Day-user
   *  presence distinct once, self-joined on the (user, day+7) key;
   *  both sides of the join are the same deduped frame. */
  /** Distinct (user, day) presence — the ONE definition of "active on
    * day d" shared by the retention / growth-accounting / stickiness
    * family (three inline copies would drift; call sites add
    * localCheckpoint where the frame feeds multiple consumers). */
  private[graft] def dailyPresence(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    events(s, dir)
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"))
      .distinct()
  }

  private[graft] def rollingRetentionQ(s: SparkSession, dir: String): DataFrame = {
    val present = dailyPresence(s, dir)
    val later = present.select(col("user_id").as("u2"),
      (col("day") - 7).as("d2"))
    present.join(later,
        col("user_id") === col("u2") && col("day") === col("d2"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("u2").isNotNull, 1L).otherwise(0L)).as("n_retained"))
      .withColumn("retention_7d",
        round(col("n_retained").cast("double") / col("n_active"), 6))
  }

  private[graft] val rollingRetentionOracle =
    """WITH p AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events)
      |SELECT a.day, count(*) AS n_active,
      |  CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_retained,
      |  round(CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*), 6) AS retention_7d
      |FROM p a LEFT JOIN p b
      |  ON a.user_id = b.user_id AND b.day = a.day + 7
      |GROUP BY 1""".stripMargin

  /** Order-independent table fingerprints — the cross-system
   *  reconciliation check two replicas of a table run to prove they
   *  hold the same rows without moving data: per-row md5 digests
   *  (portable md5 family, memory idiom) reduced by SUM, which any
   *  partitioning reorders freely. Integer/string key columns only —
   *  float rendering is engine-specific. */
  private[graft] def tableChecksumQ(s: SparkSession, dir: String): DataFrame = {
    def fp(table: String, df: DataFrame, cols: Seq[String]): DataFrame = {
      val rowHash = expr(
        s"graft_md5_prefix_long(concat_ws('|', ${cols.mkString(", ")}), 8)")
      // Sum as DECIMAL(38,0), not LONG: per-row hashes average ~2^31, so a
      // LONG sum wraps at ~4e9 rows (lineitem SF~700) while DuckDB's
      // sum(BIGINT) widens to HUGEINT — exactly the reconciliation scale
      // this query exists for. The READOUT is a string: DECIMAL(38,0) vs
      // HUGEINT is a physical-type divergence the driver's dtype-sensitive
      // hash rejects, while the decimal-string of an integer is identical
      // in every engine.
      df.agg(count(lit(1)).as("n_rows"),
          sum(rowHash.cast("decimal(38,0)")).cast("string").as("checksum"))
        .select(lit(table).as("tbl"), col("n_rows"), col("checksum"))
    }
    // widened: the per-row md5+conv+decimal chain fuses into one-task
    // scans of single-row-group files (measured 2.1 s over 3 tasks at
    // sf0.1); the checksum is an order-free SUM so the round-robin
    // exchange cannot change it, and the guard no-ops at scale
    fp("lineitem", widenForCompute(s.read.parquet(t(dir, "lineitem"))),
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
      .unionByName(fp("orders", widenForCompute(s.read.parquet(t(dir, "orders"))),
        Seq("o_orderkey", "o_custkey", "o_orderstatus")))
      .unionByName(fp("customer", widenForCompute(s.read.parquet(t(dir, "customer"))),
        Seq("c_custkey", "c_name", "c_mktsegment")))
  }

  private[graft] val tableChecksumOracle =
    """SELECT 'lineitem' AS tbl, count(*) AS n_rows,
      |  CAST(sum(('0x' || substr(md5(concat_ws('|', l_orderkey,
      |    l_linenumber, l_partkey, l_suppkey)), 1, 8))::BIGINT)
      |    AS VARCHAR) AS checksum
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders', count(*),
      |  CAST(sum(('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
      |    o_orderstatus)), 1, 8))::BIGINT) AS VARCHAR)
      |FROM orders
      |UNION ALL
      |SELECT 'customer', count(*),
      |  CAST(sum(('0x' || substr(md5(concat_ws('|', c_custkey, c_name,
      |    c_mktsegment)), 1, 8))::BIGINT) AS VARCHAR)
      |FROM customer""".stripMargin

  /** Exact weighted median (quantity-weighted extended price per
   *  return flag): the first value whose cumulative weight reaches half
   *  the total — one ordered window per group over exact integer
   *  weights; the readout is the plain hash-aggregable min of the
   *  at-or-above slice (identical to the oracle's struct-min .p). */
  private[graft] def weightedMedianQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // floor(), not cast-to-long: Spark's double→long cast truncates while
    // DuckDB's rounds half-to-even — floor is the one integerization both
    // engines define identically for any (not just integral) quantity.
    //
    // Scale shape: the textbook per-group cumulative window sorts each
    // group in ONE task (11.8× wall at the 10× probe). Instead the
    // prefix sum decomposes over integer-dollar price buckets — bucket
    // order IS price order, so cum = (weight of all earlier buckets,
    // a window over the BOUNDED bucket spine) + (intra-bucket running
    // sum, windows over ~rows/buckets each, massively parallel). Row
    // cum values are EXACTLY the single-window ones; everything
    // downstream is unchanged, as is the oracle.
    val li = s.read.parquet(t(dir, "lineitem"))
      .select(col("l_returnflag"), col("l_extendedprice"),
        floor(col("l_quantity")).as("wgt"))
      .withColumn("bkt", floor(col("l_extendedprice")).cast("long"))
    // the bucket spine feeds BOTH the prefix window and the totals —
    // checkpoint the (flag, bkt)-bounded aggregate once so lineitem is
    // scanned once for it, not once per consumer (r16: 3 scans → 2)
    val perBkt = li.groupBy(col("l_returnflag"), col("bkt"))
      .agg(sum(col("wgt")).as("bw"))
      .localCheckpoint(true)
    val wBkt = Window.partitionBy(col("l_returnflag")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = perBkt
      .withColumn("cum_before", coalesce(sum(col("bw")).over(wBkt), lit(0L)))
      .select(col("l_returnflag"), col("bkt"), col("cum_before"))
    val wIn = Window.partitionBy(col("l_returnflag"), col("bkt"))
      .orderBy(col("l_extendedprice"), col("wgt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // group totals as a 3-row broadcast, NOT an unordered per-group
    // window (that too would gather each group into one task)
    val totals = perBkt.groupBy(col("l_returnflag"))
      .agg(sum(col("bw")).as("total"))
    li.join(before, Seq("l_returnflag", "bkt"))
      .withColumn("cum", col("cum_before") + sum(col("wgt")).over(wIn))
      .join(broadcast(totals), Seq("l_returnflag"))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("l_returnflag"))
      // min(price), not min(struct(price, wgt)).price: lexicographic
      // struct-min minimizes the FIRST field, and only that field is
      // read, so the values are identical — but struct-min is not
      // hash-aggregable (it forced a SortAggregate + full sort of the
      // ~half-corpus at-or-above slice) while plain min map-side
      // combines in a HashAggregate. The oracle's struct_pack readout
      // is unchanged (its .p is the same min).
      .agg(min(col("l_extendedprice")).as("weighted_median"),
        count(lit(1)).as("n_at_or_above"))
      .select(col("l_returnflag"), col("weighted_median"),
        col("n_at_or_above"))
  }

  private[graft] val weightedMedianOracle =
    """WITH c AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(floor(l_quantity) AS BIGINT) AS wgt,
      |    sum(CAST(floor(l_quantity) AS BIGINT)) OVER (
      |      PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, CAST(floor(l_quantity) AS BIGINT)
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(CAST(floor(l_quantity) AS BIGINT)) OVER (
      |      PARTITION BY l_returnflag) AS total
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  (min(struct_pack(p := l_extendedprice, w := wgt))).p
      |    AS weighted_median,
      |  count(*) AS n_at_or_above
      |FROM c WHERE cum * 2 >= total
      |GROUP BY 1""".stripMargin
}
