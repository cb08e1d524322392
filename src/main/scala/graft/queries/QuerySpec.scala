package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark plan + (optionally) the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables. Naming convention:
  * `<opId>_<slug>` where opId is the SURVEY.md §2 operator id (s1…, t1…,
  * c1…, d1, e1, j1…, a1…, m1…) or x1… for the LLM-pipeline extensions.
  *
  * Determinism rules (both sides): every query ends in a total ORDER BY;
  * every derived double is `round`-ed; every derived integer is cast to
  * BIGINT; floating thresholds sit in empirically-verified gaps of the data
  * distribution so float32-vs-float64 noise cannot flip a row.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  /** Read one of the driver's test tables. `events.ts` varies by generator
    * vintage — TIMESTAMP(NANOS) (long under nanosAsLong, truncated to µs)
    * or TIMESTAMP(MICROS, NTZ) (reinterpreted as a UTC instant) —
    * normalized to TimestampType at this source boundary so every query
    * sees the same values DuckDB/pandas readers see.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") graft.streaming.Streams.normalizeTs(df)
    else df
  }

  /** Per-sf scratch dir for sink-roundtrip queries (M3–M6). */
  def sinkDir(sfDir: String, name: String): String = {
    val sf = new java.io.File(sfDir).getName
    val d = s"/tmp/graft_sink/$sf/$name"
    new java.io.File(d).getParentFile.mkdirs()
    d
  }
}
