package graft

import org.apache.spark.sql.SparkSession

/** Engine session factory. Pins the semantics every operator relies on:
  *   - session time zone UTC (timestamps are instants; Oslo civil dates are
  *     derived explicitly via `from_utc_timestamp`, SURVEY.md §2.4 C2);
  *   - ANSI off: the reference's coercers are lenient (`safe_int("abc")` →
  *     None, fetch_clickup_data.py:793-801), so casts must yield null, not
  *     throw;
  *   - shuffle partitions sized to the local core count (the 100 TB deploy
  *     would size this to ~2-3× total executor cores and rely on AQE
  *     coalescing, which stays enabled).
  */
object GraftSession {
  def tune(b: SparkSession.Builder, cpus: String): SparkSession.Builder = b
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // Without this, AQE's coalescer keeps ≥ default-parallelism partitions
    // ("parallelism first"), so a 2k-row rank frame still shuffles into 32
    // tasks × 10 iterations in the graph/k-means loops — pure scheduling
    // overhead. False = honor advisoryPartitionSizeInBytes and collapse
    // node-sized exchanges to one task; at 100 TB the advisory size (64 MB)
    // keeps real shuffles wide, so this only trims the tiny-frame tail.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    // events.parquet stores TIMESTAMP(NANOS) which Spark cannot read
    // natively; read as long and convert at the source boundary
    // (QuerySpec.t truncates ns → µs, matching DuckDB/pandas readers).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
    .config("spark.ui.enabled", "false")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
