package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Latest-wins merge (CDC compaction / SCD-type-1 snapshot): fold a batch
 * of upserts + deletes into a base table, keeping per key the highest
 * version (updates beating base on ties) and dropping keys whose winning
 * row is a tombstone.
 *
 * Scale shape: ONE hash exchange on the key columns and an in-partition
 * sort — the union never materializes pairs, and map-side the two inputs
 * stream straight into the exchange. This is the standard big-data
 * compaction plan (what table formats run under `MERGE INTO` for the
 * latest-wins case), so it survives 100 TB: cost is a single shuffle of
 * |base| + |updates| rows regardless of overlap.
 */
object Upsert {

  /**
   * @param base      current snapshot
   * @param updates   upsert/delete batch; same schema as `base` plus
   *                  optionally `deleteCol`
   * @param keys      primary-key columns
   * @param versionCol monotonically increasing version/sequence column
   *                  present in both inputs; per key the max wins, with
   *                  `updates` beating `base` on equal versions
   * @param deleteCol optional boolean tombstone column in `updates`; a
   *                  winning tombstone removes the key from the snapshot
   */
  def latestSnapshot(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      versionCol: String,
      deleteCol: Option[String] = None): DataFrame = {
    val del = deleteCol.getOrElse("_deleted")
    // the tombstone column may exist on either side (typically only on
    // `updates`); a side without it never deletes
    def tagged(df: DataFrame, src: Int): DataFrame = {
      val withDel = if (df.columns.contains(del)) df
        else df.withColumn(del, lit(false))
      withDel.withColumn("_src", lit(src))
    }
    val b = tagged(base, 0)
    val u = tagged(updates, 1)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    b.unionByName(u)
      .withColumn("_rn", row_number().over(w))
      // null tombstone = not deleted (CDC feeds often set the flag only
      // on deletes; bare `!col(del)` would silently drop null-flag rows)
      .filter(col("_rn") === 1 && !coalesce(col(del), lit(false)))
      .drop("_rn", "_src", del)
  }

  /**
   * SCD-type-2 history build: collapse a change stream into validity
   * intervals per key — consecutive equal attribute values (in
   * `orderCols` order) form one island; each island becomes a row with
   * `valid_from` (first observation), `valid_to` (next island's start,
   * NULL while current), `is_current`, and the island's observation
   * count. The islands trick is lag-change flag → running-sum group id;
   * the whole op is TWO windows and one aggregate on the SAME key
   * partitioning, so it plans as a single hash exchange on `keyCol` —
   * the dimension-history rewrite warehouses run at every load.
   *
   * `orderCols` must be a deterministic total order within a key
   * (include a unique tiebreaker, e.g. the event/order id).
   */
  def scd2History(df: DataFrame, keyCol: String, attrCol: String,
                  orderCols: Seq[String]): DataFrame = {
    val ord = orderCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val islands = df
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_chg",
        when(col("_prev").isNull || col("_prev") =!= col(attrCol), 1)
          .otherwise(0))
      .withColumn("_grp",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(keyCol), col(attrCol), col("_grp"))
      .agg(min(col(orderCols.head)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("_grp"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wNext))
      .select(col(keyCol), col(attrCol), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("n_rows"))
  }
}
