package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.{ParityQueries, ScaleQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + COVERAGE.md for the
  * operator → query map. Each registered query is a Spark plan built from
  * the engine's operator library; `oracleSql` is the DuckDB-dialect
  * equivalent the driver hash-compares against on the same parquet tables.
  */
object SparkEntry {

  private val specs = ParityQueries.all ++ ScaleQueries.all

  /** Flagship: the product's core question — "hours per user" — as the
    * fact-pipeline tail: dedup keep-latest per key (D1), then grouped SUM
    * (A2) over the event stream (events.value plays duration_hours).
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = graft.queries.QuerySpec.t(spark, "/root/testdata/sf0.001", "events")
    Dedup.latestByKey(ev, Seq("event_id"), "ts", "user_id")
      .groupBy("user_id")
      .agg(round(sum("value"), 2).as("total_value"), count(lit(1)).as("n_entries"))
      .orderBy("user_id")
  }

  /** One entry per implemented operator from SURVEY.md §2 (plus the x- and
    * st-prefixed extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose output embeds
    * engine-specific hashes (xxhash64) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
