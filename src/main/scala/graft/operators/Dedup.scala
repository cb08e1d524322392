package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D1 — keep-latest-per-key deduplication (SURVEY.md §2.6).
  *
  * Reference: sort by `at` with nulls last, keep the last row per `id` →
  * max-`at` wins (fetch_clickup_data.py:1774-1777). The pandas tie-break is
  * stable-sort order; we replace it with a deterministic total order: max
  * order column, then max tie-break column (SURVEY.md §7 "hard parts").
  *
  * Scale: one hash shuffle on the key; the window + row_number is executed
  * as a single sort within each partition. For a 100 TB fact keyed by a
  * high-cardinality id this is the minimal-shuffle plan (no join, no
  * distinct). AQE handles skewed keys.
  */
object Dedup {

  def latestByKey(df: DataFrame, key: Seq[String], orderCol: String,
                  tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(orderCol).desc_nulls_last, col(tieBreak).desc_nulls_last)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The reference's exact use: dedup staged time entries on `id` by latest
    * `at` (tie-break on `id` is a no-op since `id` is the key; use start_utc).
    */
  def dedupTimeEntries(df: DataFrame): DataFrame =
    latestByKey(df, Seq("id"), "at", "start_utc")

  /** Window spec reusable inside query-level expressions. */
  def latestWindow(key: Seq[Column], order: Seq[Column]) =
    Window.partitionBy(key: _*).orderBy(order: _*)
}
