package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-data export shaping: deterministic shard assignment and
 * fixed-token-budget sequence packing — the last mile of an LLM data
 * pipeline (after dedup/quality gates, documents are sharded for
 * parallel writers and packed into training sequences).
 *
 * Scale design: shard assignment is a narrow per-row hash (no shuffle);
 * packing is a running sum over ONE exchange on the shard key — there is
 * deliberately no global ordering (a global cumsum would serialize on a
 * single sort at 100 TB). Shard count scales with the corpus, each
 * shard's window is independent, and the output (shard, seq_id) keying
 * is exactly the layout a downstream partitioned writer wants.
 */
object Packing {

  /**
   * Deterministic shard id in [0, nShards). Two families:
   *  - "xxhash64" (production default): well-mixed 64-bit hash;
   *  - "mult": Knuth multiplicative hashing on the raw id, mapped to a
   *    shard by the HIGH bits: (((id mod 2³¹) · 2654435761) mod 2³²) ·
   *    nShards ≫ 32. Taking the product mod nShards instead would undo
   *    the mixing whenever nShards divides the modulus (2654435761 ≡ 1
   *    mod 16, so for power-of-two shard counts it degenerates to
   *    id mod n — clustered ids all land in one shard). High-bits
   *    mapping is where a multiplicative hash actually mixes. Exact
   *    BIGINT arithmetic both Spark and DuckDB reproduce, so queries
   *    under this family have a value-level oracle (same
   *    parameterization pattern as the md5 twins of the
   *    minhash/simhash/hyperplane families). Intermediates stay in
   *    signed-64 range for nShards up to 2²⁰.
   */
  def shardId(id: Column, nShards: Int, family: String = "xxhash64"): Column =
    family match {
      case "xxhash64" => pmod(xxhash64(id), lit(nShards.toLong))
      case "mult" =>
        shiftright(
          pmod(pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L),
            lit(4294967296L)) * lit(nShards.toLong), 32)
      case other => throw new IllegalArgumentException(s"unknown family '$other'")
    }

  /** df + a `shard` column. */
  def withShard(df: DataFrame, idCol: String, nShards: Int,
                family: String = "xxhash64"): DataFrame =
    df.withColumn("shard", shardId(col(idCol), nShards, family))

  /**
   * Concat-then-chunk sequence packing: within each shard, documents are
   * laid out in deterministic (id) order and the resulting token stream
   * is cut into `budget`-token sequences; a document belongs to the
   * sequence where its first token lands (`seq_id = ⌊startOffset /
   * budget⌋`). This is the standard pretraining packing layout — it
   * wastes no tokens to bin-packing slack (documents straddle sequence
   * boundaries by construction), and unlike first-fit it is a pure
   * window computation: one cumulative sum per shard, no sequential
   * state, no driver loop.
   *
   * Returns the input plus (shard, seq_id, start_offset).
   */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Int, nShards: Int,
                    family: String = "xxhash64"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withShard(df, idCol, nShards, family)
      .withColumn("start_offset",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      // integer division on longs: a double-division floor() loses
      // exactness past 2^53 cumulative tokens and would diverge from the
      // oracle's BIGINT `//`
      .withColumn("seq_id", expr(s"start_offset div $budget"))
  }

  /** Per-(shard, sequence) packing summary: document count and token
   *  total — the manifest a training-data writer emits per packed
   *  sequence. */
  def packingSummary(df: DataFrame, idCol: String, tokenCol: String,
                     budget: Int, nShards: Int,
                     family: String = "xxhash64"): DataFrame =
    packSequences(df, idCol, tokenCol, budget, nShards, family)
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("seq_tokens"))

  /** Per-shard export manifest: row/token totals + id range — the
   *  balance check for the sharded writer (a skewed family would show up
   *  as divergent n_docs here). */
  /**
   * Overlapping-window document chunking — the retrieval/embedding prep
   * step (RAG indexing, long-doc embedding): each document's
   * whitespace tokens are cut into `window`-token chunks every `stride`
   * tokens (stride < window ⇒ overlap). Chunk starts are
   * 0, stride, 2·stride, … while < len, so every token is covered and
   * the last chunk may be short. Original case/punctuation are
   * PRESERVED (chunks are payload, unlike the lowercased feature
   * tokenizations); the chunk content is emitted as md5 to keep the
   * row narrow — a real pipeline would carry the text column itself.
   *
   * Pure higher-order-function projection (`sequence` → `explode` →
   * `slice`): narrow, whole-stage codegen'd, zero shuffles — chunking
   * 100 TB is embarrassingly parallel by construction.
   */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window/stride must be positive")
    df.select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("ws"))
      .withColumn("start_word",
        explode(sequence(lit(0L), (size(col("ws")) - 1).cast("long"), lit(stride.toLong))))
      .select(col("doc_id"),
        expr(s"start_word div $stride").as("chunk_id"),
        col("start_word"),
        least(lit(window.toLong),
          size(col("ws")).cast("long") - col("start_word")).as("n_words"),
        md5(array_join(
          slice(col("ws"), (col("start_word") + 1).cast("int"), lit(window)), " "))
          .as("chunk_md5"))
  }

  def shardManifest(df: DataFrame, idCol: String, tokenCol: String,
                    nShards: Int, family: String = "xxhash64"): DataFrame =
    withShard(df, idCol, nShards, family)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("total_tokens"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
}
