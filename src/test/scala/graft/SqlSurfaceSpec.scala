package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The SQL face of the engine: `GraftExtensions` (injected via
 * `spark.sql.extensions` at session build — TestSpark and GraftSession
 * both carry it) must make the native expressions usable from plain
 * SQL strings with results IDENTICAL to the registered DataFrame-API
 * queries. Each case below is a SQL-string re-spelling of a registered
 * `SparkEntry.queries` entry, compared row-for-row against the real
 * registry query — the same Catalyst expressions must evaluate, so
 * equality is bit-exact, not approximate.
 */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def viewsReady(): Unit = {
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("documents")
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("embeddings")
  }

  private def assertSameAsRegistry(name: String, sql: String): Unit = {
    viewsReady()
    val registry = SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val viaSql = spark.sql(sql).collect().map(_.toString).sorted.toSeq
    assert(viaSql == registry, s"SQL spelling of $name diverged from the registry query")
  }

  test("extension injects the graft_* functions at session build") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    for (f <- Seq("graft_cosine", "graft_dot", "graft_word_shingles",
        "graft_char_entropy", "graft_deflate_ratio", "graft_hyperplane",
        "graft_array_get", "graft_word_ngrams", "graft_char_shingles",
        "graft_gunzip_text"))
      assert(reg.functionExists(FunctionIdentifier(f)), s"$f not registered")
    // and DESCRIBE-style metadata is attached
    val desc = spark.sql("DESCRIBE FUNCTION graft_cosine").collect().mkString
    assert(desc.contains("graft_cosine"))
  }

  test("the aggregate tier works from SQL: graft_minhash_agg equals the DataFrame path") {
    viewsReady()
    import org.apache.spark.sql.functions.{col, explode, xxhash64}
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.graftWordShingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val api = df.groupBy(col("doc_id"))
      .agg(graft.functions.GraftFunctions.graftMinhashAgg(col("h"), 8).as("sig"))
      .collect().map(_.toString).sorted.toSeq
    val sql = spark.sql(
      """SELECT doc_id, graft_minhash_agg(h, 8) AS sig FROM (
        |  SELECT doc_id, xxhash64(shingle) AS h FROM documents
        |  LATERAL VIEW explode(graft_word_shingles(text, 3)) AS shingle)
        |GROUP BY doc_id""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    assert(sql == api)
  }

  test("q_char_entropy as SQL equals the registry query") {
    assertSameAsRegistry("q_char_entropy",
      "SELECT doc_id, round(graft_char_entropy(text), 6) AS entropy FROM documents")
  }

  test("q_compression_ratio as SQL equals the registry query") {
    assertSameAsRegistry("q_compression_ratio",
      "SELECT doc_id, round(graft_deflate_ratio(text), 6) AS deflate_ratio FROM documents")
  }

  test("q_embed_neardup as SQL equals the registry query") {
    assertSameAsRegistry("q_embed_neardup",
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       graft_cosine(a.embedding, b.embedding) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 400 AND b.vec_id < 400
        |  AND graft_cosine(a.embedding, b.embedding) >= 0.3""".stripMargin)
  }

  test("q_ann_brute_force as SQL equals the registry query") {
    assertSameAsRegistry("q_ann_brute_force",
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY graft_cosine(c.embedding, q.embedding) DESC, c.vec_id) AS rank
        |  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 8) q
        |  WHERE q.vec_id <> c.vec_id)
        |WHERE rank <= 5""".stripMargin)
  }

  test("q_jaccard_pairs as SQL equals the registry query") {
    assertSameAsRegistry("q_jaccard_pairs",
      """WITH ex AS (
        |  SELECT doc_id AS id, size(shingles) AS set_size, shingle
        |  FROM (SELECT doc_id, graft_word_shingles(text, 3) AS shingles FROM documents)
        |  LATERAL VIEW explode(shingles) AS shingle),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.set_size AS size_a,
        |         b.set_size AS size_b, count(*) AS common
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b,
        |       CAST(common AS DOUBLE) / CAST(size_a + size_b - common AS DOUBLE) AS jaccard
        |FROM p
        |WHERE CAST(common AS DOUBLE) / CAST(size_a + size_b - common AS DOUBLE) >= 0.05""".stripMargin)
  }

  test("q_token_counts as SQL equals the registry query (built-ins compose with graft_*)") {
    // escape for a Spark SQL string literal: backslashes double (the
    // parser unescapes), single quotes double
    val pat = graft.ext.TextAnalysis.bpeTokenPattern
      .replace("\\", "\\\\").replace("'", "''")
    assertSameAsRegistry("q_token_counts",
      s"""SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN 0
         |       ELSE size(split(trim(text), '\\\\s+')) END AS ws_tokens,
         |  regexp_count(text, '$pat') AS bpe_regex_tokens
         |FROM documents""".stripMargin)
  }

  test("q_geo_cellcount as SQL equals the registry query") {
    spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("events_raw")
    assertSameAsRegistry("q_geo_cellcount",
      """WITH pts AS (
        |  SELECT value,
        |    39e0 + (user_id % 50) * 1e-2 + ((event_id * 7919) % 1000) * 1e-5 AS lat,
        |    -105e0 + (user_id % 70) * 1e-2 + ((event_id * 104729) % 1000) * 1e-5 AS lon
        |  FROM events_raw)
        |SELECT CAST(floor(lat / 5e-2) AS BIGINT) AS cell_lat,
        |  CAST(floor(lon / 5e-2) AS BIGINT) AS cell_lon,
        |  count(*) AS n_points, round(sum(value), 6) AS value_sum,
        |  round(avg(lat), 6) AS centroid_lat, round(avg(lon), 6) AS centroid_lon
        |FROM pts GROUP BY 1, 2""".stripMargin)
  }

  test("q_geo_radius_join via SQL graft_haversine (brute force) equals the halo join") {
    spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("events_raw")
    // the SQL user writes the BRUTE-FORCE form with graft_haversine;
    // result-equality with the registry's cell-halo join is exactly the
    // blocking-completeness identity the DuckDB oracle also pins
    assertSameAsRegistry("q_geo_radius_join",
      """WITH pts AS (
        |  SELECT event_id,
        |    39e0 + (user_id % 50) * 1e-2 + ((event_id * 7919) % 1000) * 1e-5 AS lat,
        |    -105e0 + (user_id % 70) * 1e-2 + ((event_id * 104729) % 1000) * 1e-5 AS lon
        |  FROM events_raw),
        |probes AS (
        |  SELECT id AS probe_id,
        |    39e0 + (id % 10) * 5e-2 + 13e-3 AS probe_lat,
        |    -105e0 + id * 35e-3 + 7e-3 AS probe_lon
        |  FROM range(20)),
        |d AS (
        |  SELECT p.probe_id, x.event_id,
        |    graft_haversine(x.lat, x.lon, p.probe_lat, p.probe_lon) AS dist_m
        |  FROM pts x CROSS JOIN probes p)
        |SELECT probe_id, event_id, round(dist_m, 2) AS dist_m
        |FROM d WHERE dist_m <= 900e0""".stripMargin)
  }

  test("graft_haversine from SQL equals the DataFrame expression tree") {
    import org.apache.spark.sql.functions.col
    val viaSql = spark.sql(
      "SELECT graft_haversine(0e0, 0e0, 0e0, 1e0) AS d").collect()(0).getDouble(0)
    val viaDf = spark.range(1).select(
        graft.ext.Geo.haversineMeters(
          col("id").cast("double") * 0, col("id").cast("double") * 0,
          col("id").cast("double") * 0, col("id").cast("double") * 0 + 1)
          .as("d"))
      .collect()(0).getDouble(0)
    assert(viaSql == viaDf) // identical tree -> identical IEEE result
    assert(math.abs(viaSql - 6371000.0 * math.Pi / 180.0) < 1e-6)
  }
}
