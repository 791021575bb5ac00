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
/** Ext: exact/near dedup, components, language ID. Split out of the monolithic registry
  * (r9 verdict item 5); every member keeps resolving
  * unqualified through the `Queries.type` self-type. */
private[graft] trait DedupQueries { this: Queries.type =>
  // =====================================================================
  // Ext: dedup / similarity / text analysis / multimodal
  // =====================================================================

  // NOT widened globally: an A/B over the full board showed the extra
  // exchange taxes ~90 light document queries (+0.5-1 s each, +65 s
  // total) for ~10 s of wins on the handful of heavy per-row chains —
  // widenForCompute is applied AT those heavy call sites instead
  // (timestampRule, minhash md5 twin, embedding LSH).
  private[graft] def docs(s: SparkSession, dir: String) = s.read.parquet(t(dir, "documents"))
  private[graft] def embs(s: SparkSession, dir: String) = s.read.parquet(t(dir, "embeddings"))

  private[graft] def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDuplicateGroups(docs(s, dir), "text", "doc_id")

  private[graft] val dedupExactOracle =
    "SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_copies FROM documents GROUP BY 1"

  private[graft] def dedupDrop(s: SparkSession, dir: String): DataFrame =
    Dedup.dropExactDuplicates(docs(s, dir), "text", "doc_id").select(col("doc_id"))

  private[graft] val dedupDropOracle =
    """SELECT doc_id FROM documents
      |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1""".stripMargin

  /** Quality-aware survivorship ([[Dedup.keepBestDuplicates]]): the
   *  best-scored member of each exact-text cluster survives (ties by
   *  min id), scored by the same deterministic hash pseudo-quality the
   *  calibration readout uses — the keep rule real pipelines run when
   *  duplicate copies differ in extraction quality. */
  private[graft] def dedupKeepBest(s: SparkSession, dir: String): DataFrame =
    Dedup.keepBestDuplicates(
      // doc_id masked before the multiply — the raw product wraps Long
      // past doc_id ~3.5e9 (silent in Spark, an error in DuckDB)
      docs(s, dir).withColumn("score",
        (((col("doc_id") % 100000) * 2654435761L) % 1000)
          .cast("double") / 1000.0),
      "text", "doc_id", "score")

  private[graft] val dedupKeepBestOracle =
    """WITH s AS (
      |  SELECT doc_id, md5(text) AS dg,
      |    CAST(((doc_id % 100000) * 2654435761) % 1000 AS DOUBLE)
      |      / 1000e0 AS score
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, dg,
      |    row_number() OVER (PARTITION BY dg ORDER BY score DESC, doc_id)
      |      AS rn
      |  FROM s),
      |c AS (SELECT dg, doc_id AS canonical_id FROM r WHERE rn = 1)
      |SELECT s.doc_id, c.canonical_id,
      |  s.doc_id = c.canonical_id AS is_kept
      |FROM s JOIN c ON s.dg IS NOT DISTINCT FROM c.dg""".stripMargin

  /** Per-source dedup retention — the audit a curation pipeline runs
   *  AFTER dedup: what fraction of each source survived, and how many
   *  of its documents were canonical copies vs shadowed duplicates.
   *  A source whose retention craters signals a template flood or a
   *  mirror; one at 1.0 signals the dedup never saw it. Composes the
   *  survivorship verdicts with the source dimension — one broadcast
   *  join of the verdict frame, one source-keyed aggregate. */
  private[graft] def dedupRetentionQ(s: SparkSession, dir: String): DataFrame = {
    val verdicts = Dedup.keepBestDuplicates(
      docs(s, dir).withColumn("score",
        (((col("doc_id") % 100000) * 2654435761L) % 1000)
          .cast("double") / 1000.0),
      "text", "doc_id", "score")
    docs(s, dir).select(col("doc_id"), col("source"))
      .join(verdicts, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_docs"), 6)
          .as("retention"))
  }

  private[graft] val dedupRetentionOracle =
    """WITH s AS (
      |  SELECT doc_id, source, md5(text) AS dg,
      |    CAST(((doc_id % 100000) * 2654435761) % 1000 AS DOUBLE)
      |      / 1000e0 AS score
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY dg ORDER BY score DESC, doc_id)
      |      AS rn
      |  FROM s)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS retention
      |FROM r GROUP BY 1""".stripMargin

  private[graft] def shingleStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      size(Dedup.wordShingles(col("text"), 3)).as("n_word_3grams"),
      size(Dedup.charShingles(col("text"), 5)).as("n_char_5grams"))

  private[graft] val shingleStatsOracle =
    """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words, lower(text) AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(list_distinct(list_transform(generate_series(1, greatest(len(words) - 2, 0)),
      |        i -> array_to_string(words[i:i+2], ' ')))) AS INT) AS n_word_3grams,
      |  CAST(len(list_distinct(list_transform(generate_series(1, greatest(length(t) - 4, 0)),
      |        i -> substr(t, i, 5)))) AS INT) AS n_char_5grams
      |FROM w""".stripMargin

  // maxDocFreq high enough to be a semantic no-op at test scales (so the
  // oracle needs no df filter) while keeping the guard's shuffle-by-shingle,
  // which doubles as the join's pre-partitioning — measured FASTER than
  // skipping the pass (8.7s vs 17.5s at sf0.1).
  private[graft] def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
      n = 3, threshold = 0.05, maxDocFreq = 1000000L)

  private[graft] val jaccardPairsOracle =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2, 0)),
      |    i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS shingles
      |  FROM documents
      |), sized AS (SELECT doc_id, shingles, len(shingles) AS set_size FROM sh),
      |ex AS (SELECT doc_id, set_size, unnest(shingles) AS shingle FROM sized),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.set_size AS sa, b.set_size AS sb, count(*) AS common
      |  FROM ex a JOIN ex b USING (shingle)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT id_a, id_b, CAST(common AS DOUBLE) / (sa + sb - common) AS jaccard
      |FROM pairs WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.05""".stripMargin

  /** Cohort LTV curve: cumulative purchase revenue per first-seen-week
   *  cohort across lifetime weeks, per capita — the product-economics
   *  readout next to q_cohort_retention's activity curve. Exact integer
   *  cents throughout (per-(cohort, week) sums, then a cohort-partition
   *  cumsum over the weeks-bounded frame); one double division per
   *  emitted row. */
  private[graft] def dedupThresholdCurveQ(s: SparkSession, dir: String): DataFrame = {
    // the SAME pair list q_jaccard_pairs gates — by construction, not by
    // re-stated parameters (r9 review)
    val pairs = jaccardPairs(s, dir)
      .localCheckpoint(true) // feeds the pair counts AND the doc explode
    val cuts = Seq(5e-2, 1e-1, 5e-1) // ONE list for the spine + explode
    val thresholds = s.createDataFrame(cuts.map(Tuple1(_))).toDF("t")
    val tj = pairs
      .select(explode(array(cuts.map(lit): _*)).as("t"),
        col("id_a"), col("id_b"), col("jaccard"))
      .filter(col("jaccard") >= col("t"))
    val nPairs = tj.groupBy(col("t")).agg(count(lit(1)).as("n_pairs"))
    val nDocs = tj
      .select(col("t"), explode(array(col("id_a"), col("id_b"))).as("d"))
      .distinct()
      .groupBy(col("t")).agg(count(lit(1)).as("n_docs"))
    val total = docs(s, dir).agg(count(lit(1)).as("n_total"))
    // LEFT joins from the threshold list: a cut that kills every pair is
    // the readout's most important row and must appear as zeros, not
    // vanish (r9 review)
    thresholds
      .join(nPairs, Seq("t"), "left")
      .join(nDocs, Seq("t"), "left")
      .crossJoin(broadcast(total))
      .select(col("t").as("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        round(coalesce(col("n_docs"), lit(0L)).cast("double") /
          col("n_total"), 6).as("dup_frac"))
  }

  private[graft] val dedupThresholdCurveOracle =
    s"""WITH p AS ($jaccardPairsOracle),
      |th AS (SELECT unnest([5e-2, 1e-1, 5e-1]) AS t),
      |tj AS (
      |  SELECT th.t, p.id_a, p.id_b
      |  FROM p JOIN th ON p.jaccard >= th.t),
      |np AS (SELECT t, count(*) AS n_pairs FROM tj GROUP BY 1),
      |nd AS (
      |  SELECT t, count(*) AS n_docs FROM (
      |    SELECT DISTINCT t, d FROM (
      |      SELECT t, id_a AS d FROM tj
      |      UNION ALL SELECT t, id_b FROM tj))
      |  GROUP BY 1),
      |tot AS (SELECT count(*) AS n_total FROM documents)
      |SELECT th.t AS threshold,
      |  CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
      |  CAST(coalesce(nd.n_docs, 0) AS BIGINT) AS n_docs,
      |  round(CAST(coalesce(nd.n_docs, 0) AS DOUBLE) / tot.n_total, 6)
      |    AS dup_frac
      |FROM th
      |LEFT JOIN np ON np.t = th.t
      |LEFT JOIN nd ON nd.t = th.t
      |CROSS JOIN tot""".stripMargin

  /** Quality-filter overlap matrix — the curation diagnostic that
   *  decides whether a filter earns its cost: four cheap tripwires
   *  (length band, top-word dominance, type-token ratio, short mean
   *  word length) evaluated per doc in ONE pass as INTEGER cross-
   *  multiplications (maxfreq·5 > total is 0.2 dominance with no float
   *  compare), then the pairwise trip-set Jaccard. A filter pair at
   *  jaccard ≈ 1 is redundant; near 0, independent. Self-joins run on
   *  the (doc, filter) trip list — docs×4 rows, filter-bounded. */
  private[graft] def filterOverlapQ(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir)
      .select(col("doc_id"), col("n_chars"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val perDoc = words
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("total"), max(col("c")).as("maxfreq"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * length(col("w"))).as("letters"))
    // LEFT join: a zero-word doc (the junk a length filter exists to
    // catch) must still reach f_len; its word-derived filters read as
    // not-applicable = untripped (r9 review)
    val flags = docs(s, dir).select(col("doc_id"), col("n_chars"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_chars") < 50 || col("n_chars") > 5000)
          .cast("int").as("f_len"),
        coalesce((col("maxfreq") * 5 > col("total")).cast("int"), lit(0))
          .as("f_dominance"),
        coalesce((col("n_distinct") * 2 < col("total")).cast("int"), lit(0))
          .as("f_ttr"),
        coalesce((col("letters") < col("total") * 5).cast("int"), lit(0))
          .as("f_shortwords"))
    val tripped = flags.select(col("doc_id"), explode(expr(
        """filter(array(
          |  named_struct('f', 'f_len', 'on', f_len),
          |  named_struct('f', 'f_dominance', 'on', f_dominance),
          |  named_struct('f', 'f_ttr', 'on', f_ttr),
          |  named_struct('f', 'f_shortwords', 'on', f_shortwords)),
          |  x -> x.on = 1)""".stripMargin)).as("x"))
      .select(col("doc_id"), col("x.f").as("f"))
      .localCheckpoint(true) // both self-join sides + the totals
    val totals = tripped.groupBy(col("f")).agg(count(lit(1)).as("n"))
    // the FULL 4+6-row matrix: a filter that trips nothing and a pair
    // that never co-trips must still appear (jaccard 0), or the reader
    // can't tell "independent" from "not computed" (r9 review)
    val names = Seq("f_len", "f_dominance", "f_ttr", "f_shortwords")
    val grid = names.flatMap(a => names.filter(a <= _).map(b => (a, b)))
    val gridDf = s.createDataFrame(grid).toDF("filter_a", "filter_b")
    val pairs = tripped.as("a").join(tripped.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.f") <= col("b.f"))
      .groupBy(col("a.f").as("filter_a"), col("b.f").as("filter_b"))
      .agg(count(lit(1)).as("n_both"))
    gridDf
      .join(pairs, Seq("filter_a", "filter_b"), "left")
      .join(broadcast(totals.select(col("f").as("filter_a"),
        col("n").as("na"))), Seq("filter_a"), "left")
      .join(broadcast(totals.select(col("f").as("filter_b"),
        col("n").as("nb"))), Seq("filter_b"), "left")
      .select(col("filter_a"), col("filter_b"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("n_both"), lit(0L)).as("n_both"))
      .withColumn("overlap_jaccard",
        when(col("na") + col("nb") - col("n_both") === 0, 0e0)
          .otherwise(round(col("n_both").cast("double") /
            (col("na") + col("nb") - col("n_both")), 6)))
  }

  private[graft] val filterOverlapOracle =
    """WITH w AS (
      |  SELECT doc_id, w, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE len(w) > 0 GROUP BY 1, 2),
      |pd AS (
      |  SELECT doc_id, sum(c) AS total, max(c) AS maxfreq,
      |    count(*) AS n_distinct, sum(c * len(w)) AS letters
      |  FROM w GROUP BY 1),
      |fl AS (
      |  SELECT d.doc_id,
      |    CASE WHEN d.n_chars < 50 OR d.n_chars > 5000 THEN 1 ELSE 0 END
      |      AS f_len,
      |    coalesce(CASE WHEN pd.maxfreq * 5 > pd.total
      |      THEN 1 ELSE 0 END, 0) AS f_dominance,
      |    coalesce(CASE WHEN pd.n_distinct * 2 < pd.total
      |      THEN 1 ELSE 0 END, 0) AS f_ttr,
      |    coalesce(CASE WHEN pd.letters < pd.total * 5
      |      THEN 1 ELSE 0 END, 0) AS f_shortwords
      |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id),
      |tr AS (
      |  SELECT doc_id, 'f_len' AS f FROM fl WHERE f_len = 1
      |  UNION ALL SELECT doc_id, 'f_dominance' FROM fl WHERE f_dominance = 1
      |  UNION ALL SELECT doc_id, 'f_ttr' FROM fl WHERE f_ttr = 1
      |  UNION ALL
      |  SELECT doc_id, 'f_shortwords' FROM fl WHERE f_shortwords = 1),
      |tot AS (SELECT f, count(*) AS n FROM tr GROUP BY 1),
      |names AS (SELECT unnest(['f_len', 'f_dominance', 'f_ttr',
      |  'f_shortwords']) AS f),
      |grid AS (
      |  SELECT a.f AS filter_a, b.f AS filter_b
      |  FROM names a JOIN names b ON a.f <= b.f),
      |pairs AS (
      |  SELECT a.f AS filter_a, b.f AS filter_b, count(*) AS n_both
      |  FROM tr a JOIN tr b ON a.doc_id = b.doc_id AND a.f <= b.f
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT g.filter_a, g.filter_b,
      |    CAST(coalesce(ta.n, 0) AS BIGINT) AS na,
      |    CAST(coalesce(tb.n, 0) AS BIGINT) AS nb,
      |    CAST(coalesce(p.n_both, 0) AS BIGINT) AS n_both
      |  FROM grid g
      |  LEFT JOIN pairs p
      |    ON p.filter_a = g.filter_a AND p.filter_b = g.filter_b
      |  LEFT JOIN tot ta ON ta.f = g.filter_a
      |  LEFT JOIN tot tb ON tb.f = g.filter_b)
      |SELECT filter_a, filter_b, na, nb, n_both,
      |  CASE WHEN na + nb - n_both = 0 THEN 0e0
      |    ELSE round(CAST(n_both AS DOUBLE) / (na + nb - n_both), 6) END
      |    AS overlap_jaccard
      |FROM m""".stripMargin

  /** Pairs → dedup groups: connected components (min-label propagation)
   *  over the exact Jaccard pairs, then survivor verdicts for the paired
   *  docs. Oracle: DuckDB recursive CTE over the same pair list. */
  private[graft] def dedupComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs(s, dir), "text", "doc_id",
      n = 3, threshold = 0.05, maxDocFreq = 1000000L)
    Dedup.duplicateComponents(pairs)
      .select(col("id").as("doc_id"), col("component").as("canonical_id"))
  }

  private[graft] val dedupComponentsOracle =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2, 0)),
      |    i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS shingles
      |  FROM documents
      |), sized AS (SELECT doc_id, shingles, len(shingles) AS set_size FROM sh),
      |ex AS (SELECT doc_id, set_size, unnest(shingles) AS shingle FROM sized),
      |p0 AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.set_size AS sa, b.set_size AS sb, count(*) AS common
      |  FROM ex a JOIN ex b USING (shingle)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4),
      |pairs AS (
      |  SELECT id_a, id_b FROM p0
      |  WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.05),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  -- every label reachable from every vertex; min per vertex = component
      |  WITH RECURSIVE r(id, label) AS (
      |    SELECT src, src FROM edges
      |    UNION
      |    SELECT e.src, r.label FROM edges e JOIN r ON e.dst = r.id)
      |  SELECT id, label FROM r)
      |SELECT id AS doc_id, min(label) AS canonical_id
      |FROM reach GROUP BY id""".stripMargin

  /** Asymmetric containment pairs — catches subset-duplicates (short doc
   *  quoted whole inside a long one) that symmetric Jaccard misses. */
  private[graft] def containmentPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainmentPairs(docs(s, dir), "text", "doc_id",
      n = 3, minContainment = 0.8, maxDocFreq = 1000000L)

  private[graft] val containmentPairsOracle =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2, 0)),
      |    i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS shingles
      |  FROM documents
      |), sized AS (SELECT doc_id, shingles, len(shingles) AS set_size FROM sh),
      |ex AS (SELECT doc_id, set_size, unnest(shingles) AS shingle FROM sized),
      |p0 AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.set_size AS sa, b.set_size AS sb, count(*) AS common
      |  FROM ex a JOIN ex b USING (shingle)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT id_a, id_b,
      |  CAST(common AS DOUBLE) / sa AS containment_a,
      |  CAST(common AS DOUBLE) / sb AS containment_b
      |FROM p0
      |WHERE greatest(CAST(common AS DOUBLE) / sa, CAST(common AS DOUBLE) / sb) >= CAST(0.8 AS DOUBLE)""".stripMargin

  /** Passage-level duplicate stats ([[Dedup.duplicatePassageStats]]):
   *  per-doc share of 4-gram positions whose gram repeats anywhere in
   *  the corpus — the distributed signal of Lee et al.'s exact
   *  substring dedup. */
  private[graft] def passageDedupQ(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatePassageStats(docs(s, dir), "text", "doc_id",
      n = 4, minCount = 2L)

  private[graft] val passageDedupOracle =
    """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, greatest(len(words) - 3, 0)),
      |    i -> array_to_string(words[i:i+3], ' '))) AS gram
      |  FROM w),
      |c AS (SELECT gram, count(*) AS occ FROM g GROUP BY 1)
      |SELECT doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  round(CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS dup_ratio
      |FROM g JOIN c USING (gram)
      |GROUP BY doc_id""".stripMargin

  /** Maximal duplicated spans ([[Dedup.duplicateSpans]]): duplicated
   *  4-gram windows merged into maximal token intervals per doc
   *  (gaps-and-islands on positions) — the deletable unit of exact
   *  substring dedup. */
  private[graft] def dupSpansQ(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpans(docs(s, dir), "text", "doc_id", n = 4, minCount = 2L)

  private[graft] val dupSpansOracle =
    """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, i - 1 AS pos, array_to_string(ws[i:i+3], ' ') AS gram
      |  FROM w, unnest(generate_series(1, greatest(len(ws) - 3, 0))) AS u(i)),
      |c AS (SELECT gram, count(*) AS occ FROM g GROUP BY 1),
      |d AS (SELECT doc_id, pos FROM g JOIN c USING (gram) WHERE occ >= 2),
      |s AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
      |         OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 4
      |         THEN 1 ELSE 0 END AS ns
      |  FROM d),
      |si AS (
      |  SELECT doc_id, pos, sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS UNBOUNDED PRECEDING) AS span_id
      |  FROM s),
      |sp AS (
      |  SELECT doc_id, span_id, max(pos) - min(pos) + 4 AS span_tokens
      |  FROM si GROUP BY 1, 2),
      |t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
      |  FROM documents),
      |a AS (
      |  SELECT doc_id, count(*) AS n_spans,
      |    CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
      |  FROM sp GROUP BY 1)
      |SELECT a.doc_id, a.n_spans, a.dup_tokens, t.n_tokens,
      |  round(a.dup_tokens / CAST(t.n_tokens AS DOUBLE), 6) AS dup_fraction
      |FROM a JOIN t USING (doc_id)""".stripMargin

  /** Duplicate-span REMOVAL ([[Dedup.removeDuplicateSpans]]): the
   *  corpus-rewrite face of substring dedup — tokens under any
   *  corpus-duplicated 4-gram window are deleted and the cleaned
   *  stream's md5 keys the output, so the whole rewrite is
   *  value-checked without comparing text blobs. */
  private[graft] def spanRemovalQ(s: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicateSpans(docs(s, dir), "text", "doc_id",
      n = 4, minCount = 2L)

  private[graft] val spanRemovalOracle =
    """WITH w AS (
      |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |       ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS ws
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, i - 1 AS pos, ws[i] AS tok
      |  FROM w, unnest(generate_series(1, len(ws))) AS u(i)),
      |g AS (
      |  SELECT doc_id, i - 1 AS gpos, array_to_string(ws[i:i+3], ' ') AS gram
      |  FROM w, unnest(generate_series(1, greatest(len(ws) - 3, 0))) AS u(i)),
      |c AS (SELECT gram, count(*) AS occ FROM g GROUP BY 1),
      |cov AS (
      |  SELECT DISTINCT doc_id, p AS pos
      |  FROM (SELECT doc_id, gpos FROM g JOIN c USING (gram) WHERE occ >= 2),
      |       unnest(generate_series(gpos, gpos + 3)) AS gp(p)),
      |kept AS (
      |  SELECT t.doc_id, count(*) AS n_kept,
      |         md5(string_agg(t.tok, ' ' ORDER BY t.pos)) AS cleaned_md5
      |  FROM tok t ANTI JOIN cov ON t.doc_id = cov.doc_id AND t.pos = cov.pos
      |  GROUP BY 1),
      |tot AS (
      |  SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT tot.doc_id, n_tokens,
      |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(cleaned_md5, md5('')) AS cleaned_md5
      |FROM tot LEFT JOIN kept ON tot.doc_id = kept.doc_id""".stripMargin

  /** Verify stage over the exact-Jaccard candidates: the order-sensitive
   *  Levenshtein similarity confirms (or kills) each shingle-level
   *  candidate before any document would be dropped. Candidate pairs
   *  broadcast against the corpus; the O(len²) DP runs on candidates
   *  only. */
  private[graft] def neardupVerified(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id",
      n = 3, threshold = 0.05, maxDocFreq = 1000000L)
    Dedup.verifyPairsByEditDistance(d, "text", "doc_id", pairs, minEditSim = 0.5)
  }

  private[graft] val neardupVerifiedOracle =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')) - 2, 0)),
      |    i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS shingles
      |  FROM documents
      |), sized AS (SELECT doc_id, shingles, len(shingles) AS set_size FROM sh),
      |ex AS (SELECT doc_id, set_size, unnest(shingles) AS shingle FROM sized),
      |p0 AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.set_size AS sa, b.set_size AS sb, count(*) AS common
      |  FROM ex a JOIN ex b USING (shingle)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4),
      |pairs AS (
      |  SELECT id_a, id_b, CAST(common AS DOUBLE) / (sa + sb - common) AS jaccard
      |  FROM p0 WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.05),
      |verified AS (
      |  SELECT id_a, id_b, jaccard,
      |    CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
      |    round(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
      |      / greatest(length(da.text), length(db.text), 1), 6) AS edit_sim
      |  FROM pairs
      |  JOIN documents da ON id_a = da.doc_id
      |  JOIN documents db ON id_b = db.doc_id)
      |SELECT id_a, id_b, jaccard, edit_distance, edit_sim
      |FROM verified WHERE edit_sim >= 0.5""".stripMargin

  /** Incremental dedup: new batch (doc_id ≡ 0 mod 2) vs the historical
   *  corpus (the rest), on the normalization fingerprint. Digest-only
   *  shuffles on both sides. */
  private[graft] def incrementalDedupQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.incrementalDedup(
      d.filter(pmod(col("doc_id"), lit(2)) === 0),
      d.filter(pmod(col("doc_id"), lit(2)) =!= 0),
      "text", "doc_id")
  }

  private[graft] val incrementalDedupOracle =
    """WITH f AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(
      |      list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g')), '\s+'),
      |        x -> length(x) > 0))), ' ')) AS fingerprint
      |  FROM documents),
      |base AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id % 2 <> 0),
      |nb AS (SELECT doc_id, fingerprint FROM f WHERE doc_id % 2 = 0)
      |SELECT doc_id, fingerprint,
      |  CASE WHEN fingerprint IN (SELECT fingerprint FROM base) THEN 'dup_of_base'
      |       WHEN row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) > 1 THEN 'dup_in_batch'
      |       ELSE 'unique' END AS status
      |FROM nb""".stripMargin

  /** Nightly-ingest funnel (r12): the per-batch arrival audit a growing
   *  corpus runs on every ingest — the NEW batch (doc_id ≡ 0 mod 2) vs
   *  the historical base (the rest), counted through four gates:
   *  arrived → after exact dedup vs base + in-batch
   *  ([[Dedup.incrementalDedup]]) → after benchmark decontamination
   *  ([[Dedup.decontaminate]], eval slice doc_id ≡ 0 mod 97 — the same
   *  slice q_decontaminate gates) → after quality/language filtering
   *  (the q_corpus_curation scorer). Output: one row per stage with the
   *  surviving doc count.
   *
   *  O(batch) by construction — the composite never scans the base
   *  except for the digest-only fingerprint projection: shingling runs
   *  on the batch only, eval shingles broadcast, the survivor-id frames
   *  are eagerly localCheckpoint'd (ids only) because THREE stage
   *  counters consume each prefix. At 100 TB this is the cheap nightly
   *  readout that says where an ingest's documents went. */
  private[graft] def ingestFunnelQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val batch = d.filter(pmod(col("doc_id"), lit(2)) === 0)
    val base = d.filter(pmod(col("doc_id"), lit(2)) =!= 0)
    val uniq = Dedup.incrementalDedup(batch, base, "text", "doc_id")
      .filter(col("status") === "unique")
      .select(col("doc_id"))
      .localCheckpoint(true)
    val contaminated = Dedup.decontaminate(batch,
        d.filter(pmod(col("doc_id"), lit(97)) === 0), "text", "doc_id",
        n = 3, minOverlap = 5)
      .filter(col("contaminated"))
      .select(col("id").as("doc_id"))
    val clean = uniq.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val kept = clean.join(batch, Seq("doc_id"))
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.5 &&
        TextAnalysis.languageId(col("text")) =!= "und")
      .select(col("doc_id"))
    def cnt(df: DataFrame, i: Int, name: String) =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i).as("stage_idx"), lit(name).as("stage"), col("n_docs"))
    cnt(batch, 1, "arrived")
      .unionByName(cnt(uniq, 2, "after_exact_dedup"))
      .unionByName(cnt(clean, 3, "after_decontamination"))
      .unionByName(cnt(kept, 4, "after_quality_lang"))
  }

  private[graft] val ingestFunnelOracle = {
    def stopLit(lang: String) =
      "[" + TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString(", ") + "]"
    s"""WITH batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
       |f AS (
       |  SELECT doc_id,
       |    md5(array_to_string(list_sort(list_distinct(
       |      list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g')), '\\s+'),
       |        x -> length(x) > 0))), ' ')) AS fingerprint
       |  FROM documents),
       |basefp AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id % 2 <> 0),
       |uniq AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, fingerprint,
       |      CASE WHEN fingerprint IN (SELECT fingerprint FROM basefp) THEN 'dup_of_base'
       |           WHEN row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) > 1 THEN 'dup_in_batch'
       |           ELSE 'unique' END AS status
       |    FROM f WHERE doc_id % 2 = 0) WHERE status = 'unique'),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2, 0)),
       |    i -> array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[i:i+2], ' '))) AS shingles
       |  FROM documents),
       |ev AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id % 97 = 0),
       |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE doc_id % 2 = 0),
       |contaminated AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, count(*) AS n FROM ex JOIN ev USING (shingle) GROUP BY 1)
       |  WHERE n >= 5),
       |clean AS (
       |  SELECT doc_id FROM uniq
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |w AS (
       |  SELECT doc_id, text,
       |         regexp_split_to_array(trim(text), '\\s+') AS toks,
       |         list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS dw
       |  FROM batch),
       |hits AS (
       |  SELECT doc_id, text,
       |    len(list_intersect(dw, ${stopLit("de")})) AS h_de,
       |    len(list_intersect(dw, ${stopLit("en")})) AS h_en,
       |    len(list_intersect(dw, ${stopLit("es")})) AS h_es,
       |    len(list_intersect(dw, ${stopLit("fr")})) AS h_fr,
       |    len(list_intersect(dw, ${stopLit("zh")})) AS h_zh,
       |    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
       |      / length(text) AS pr,
       |    CAST(len(list_intersect(dw, ${stopLit("en")})) AS DOUBLE) / len(dw) AS sw_en
       |  FROM w),
       |scored AS (
       |  SELECT doc_id,
       |    CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
       |         WHEN h_zh = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'zh'
       |         WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
       |         WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
       |         WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
       |         ELSE 'de' END AS lang_id,
       |    round(
       |      CAST(CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1.0
       |            WHEN length(text) BETWEEN 20 AND 99 THEN 0.5 ELSE 0.1 END AS DOUBLE) * CAST(0.4 AS DOUBLE) +
       |      CAST(CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.3 END AS DOUBLE) * CAST(0.2 AS DOUBLE) +
       |      CAST(CASE WHEN tokens > 0 AND CAST(length(text) AS DOUBLE) / tokens BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.4 END AS DOUBLE) * CAST(0.2 AS DOUBLE) +
       |      CAST(CASE WHEN sw_en >= 0.01 THEN 1.0 ELSE 0.6 END AS DOUBLE) * CAST(0.2 AS DOUBLE),
       |      6) AS quality
       |  FROM hits),
       |kept AS (
       |  SELECT s.doc_id FROM scored s JOIN clean c USING (doc_id)
       |  WHERE quality >= 0.5 AND lang_id <> 'und')
       |SELECT CAST(1 AS INTEGER) AS stage_idx, 'arrived' AS stage, count(*) AS n_docs FROM batch
       |UNION ALL SELECT 2, 'after_exact_dedup', count(*) FROM uniq
       |UNION ALL SELECT 3, 'after_decontamination', count(*) FROM clean
       |UNION ALL SELECT 4, 'after_quality_lang', count(*) FROM kept""".stripMargin
  }

  /** Learned language-ID: multinomial Naive Bayes over hashed unigrams
   *  ([[graft.ext.NaiveBayes.trainAndScore]]), trained on the corpus's
   *  own lang labels and scored in-corpus — model broadcast, one
   *  tokenize, per-doc argmax on one window. */
  private[graft] def nbLangIdQ(s: SparkSession, dir: String): DataFrame =
    graft.ext.NaiveBayes.trainAndScore(docs(s, dir), "text", "lang",
      "doc_id", buckets = 128, alpha = 0.5)

  private[graft] val nbLangIdOracle =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substr(md5(unnest(regexp_split_to_array(trim(lower(text)), '\s+'))), 1, 8) AS BIGINT)
      |      % 128 AS bucket
      |  FROM documents),
      |pdb AS (SELECT doc_id, lang, bucket, count(*) AS tf FROM t GROUP BY 1, 2, 3),
      |prior AS (
      |  SELECT lang, ln(count(*) / CAST((SELECT count(*) FROM documents) AS DOUBLE)) AS lp
      |  FROM documents GROUP BY 1),
      |cyb AS (SELECT lang, bucket, sum(tf) AS c FROM pdb GROUP BY 1, 2),
      |ny AS (SELECT lang, sum(tf) AS n FROM pdb GROUP BY 1),
      |bks AS (SELECT DISTINCT bucket FROM pdb),
      |model AS (
      |  SELECT p.lang, b.bucket,
      |    ln((coalesce(c.c, 0) + CAST(0.5 AS DOUBLE)) / (n.n + CAST(64.0 AS DOUBLE))) AS lpb
      |  FROM (SELECT lang FROM prior) p
      |  CROSS JOIN bks b
      |  JOIN ny n ON n.lang = p.lang
      |  LEFT JOIN cyb c ON c.lang = p.lang AND c.bucket = b.bucket),
      |sc AS (
      |  SELECT p.doc_id, p.lang AS actual, m.lang AS label,
      |    round(pr.lp + sum(p.tf * m.lpb), 6) AS score
      |  FROM pdb p JOIN model m USING (bucket)
      |  JOIN prior pr ON pr.lang = m.lang
      |  GROUP BY 1, 2, 3, pr.lp),
      |r AS (
      |  SELECT doc_id, label, score, actual,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
      |  FROM sc)
      |SELECT doc_id, label AS predicted, score, actual, label = actual AS correct
      |FROM r WHERE rn = 1""".stripMargin

  /** NB held-out accuracy ([[graft.ext.NaiveBayes.trainAndScoreSplit]]):
   *  model trained on the hash-based 80% split only, every doc scored,
   *  accuracy reported per split — generalization vs memorization. */
  private[graft] def nbHoldoutQ(s: SparkSession, dir: String): DataFrame = {
    val isTrain = Sampling.splitLabel(col("doc_id"),
      Seq("train" -> 0.8, "test" -> 0.2)) === "train"
    graft.ext.NaiveBayes.trainAndScoreSplit(docs(s, dir), "text", "lang",
        "doc_id", isTrain, buckets = 128, alpha = 0.5)
      .groupBy(col("is_train"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy",
        round(col("n_correct").cast("double") / col("n_docs").cast("double"), 6))
  }

  private[graft] val nbHoldoutOracle =
    """WITH lab AS (
      |  SELECT doc_id,
      |    (CAST(CAST('0x' || substr(md5('split:' || doc_id), 1, 8) AS BIGINT) AS DOUBLE)
      |      + CAST(1.0 AS DOUBLE)) / CAST(4294967296 AS DOUBLE)
      |      < CAST(0.8 AS DOUBLE) AS is_train
      |  FROM documents),
      |t AS (
      |  SELECT d.doc_id, d.lang, l.is_train,
      |    CAST('0x' || substr(md5(unnest(regexp_split_to_array(trim(lower(d.text)), '\s+'))), 1, 8) AS BIGINT)
      |      % 128 AS bucket
      |  FROM documents d JOIN lab l USING (doc_id)),
      |pdb AS (SELECT doc_id, lang, is_train, bucket, count(*) AS tf
      |        FROM t GROUP BY 1, 2, 3, 4),
      |prior AS (
      |  SELECT lang, ln(count(*) / CAST(
      |    (SELECT count(*) FROM lab WHERE is_train) AS DOUBLE)) AS lp
      |  FROM documents JOIN lab USING (doc_id) WHERE is_train GROUP BY 1),
      |cyb AS (SELECT lang, bucket, sum(tf) AS c FROM pdb WHERE is_train GROUP BY 1, 2),
      |ny AS (SELECT lang, sum(tf) AS n FROM pdb WHERE is_train GROUP BY 1),
      |bks AS (SELECT DISTINCT bucket FROM pdb WHERE is_train),
      |model AS (
      |  SELECT p.lang, b.bucket,
      |    ln((coalesce(c.c, 0) + CAST(0.5 AS DOUBLE)) / (n.n + CAST(64.0 AS DOUBLE))) AS lpb
      |  FROM (SELECT lang FROM prior) p
      |  CROSS JOIN bks b
      |  JOIN ny n ON n.lang = p.lang
      |  LEFT JOIN cyb c ON c.lang = p.lang AND c.bucket = b.bucket),
      |sc AS (
      |  SELECT p.doc_id, p.lang AS actual, p.is_train, m.lang AS label,
      |    round(pr.lp + sum(p.tf * m.lpb), 6) AS score
      |  FROM pdb p JOIN model m USING (bucket)
      |  JOIN prior pr ON pr.lang = m.lang
      |  GROUP BY 1, 2, 3, 4, pr.lp),
      |r AS (
      |  SELECT doc_id, label, actual, is_train,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
      |  FROM sc)
      |SELECT is_train, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN label = actual THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
      |  round(sum(CASE WHEN label = actual THEN 1 ELSE 0 END)
      |    / CAST(count(*) AS DOUBLE), 6) AS accuracy
      |FROM r WHERE rn = 1 GROUP BY 1""".stripMargin

  /** Language-ID as a first-class query (the heuristic is also
   *  value-checked inside the curation composites; this pins it in
   *  isolation, one narrow codegen'd projection). */
  private[graft] def langIdQ(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.languageId(col("text")).as("lang_id"))

  private[graft] val langIdOracle = {
    def stopLit(lang: String) =
      "[" + TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString(", ") + "]"
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS dw
       |  FROM documents
       |), hits AS (
       |  SELECT doc_id,
       |    len(list_intersect(dw, ${stopLit("de")})) AS h_de,
       |    len(list_intersect(dw, ${stopLit("en")})) AS h_en,
       |    len(list_intersect(dw, ${stopLit("es")})) AS h_es,
       |    len(list_intersect(dw, ${stopLit("fr")})) AS h_fr,
       |    len(list_intersect(dw, ${stopLit("zh")})) AS h_zh
       |  FROM w)
       |SELECT doc_id,
       |  CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
       |       WHEN h_zh = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'zh'
       |       WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
       |       WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
       |       WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
       |       ELSE 'de' END AS lang_id
       |FROM hits""".stripMargin
  }

}
