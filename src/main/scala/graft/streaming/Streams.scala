package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.{Dedup, MergeOps}

/** Structured-Streaming re-expression of the reference's incremental
  * semantics (SURVEY.md §2.10): the 6-hourly scheduler-driven batch refresh
  * (docs/SCHEDULER_SETUP.md:18-22) is a micro-batch stream; M1's 60-day
  * late-data tolerance is a watermark; the MERGE is a `foreachBatch` upsert.
  * Repeated batch runs and the stream produce identical observable tables.
  */
object Streams {

  /** Tumbling-window aggregation over an event stream with a watermark for
    * late data. Output: (window_start, event_type, n, total_value).
    */
  def windowedAgg(events: DataFrame, watermark: String = "1 hour",
                  window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window)
        .as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Read parquet files matching `glob` under `dir` as a bounded stream
    * (Trigger.AvailableNow drains micro-batches then stops) and run the
    * windowed agg into an in-memory sink. Returns the final result table.
    */
  def runWindowedAggAvailableNow(spark: SparkSession, dir: String, glob: String,
                                 schema: StructType, sinkName: String,
                                 checkpoint: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
    // ns-as-long timestamps → µs truncation at the source boundary
    val stream =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else raw
    val q = windowedAgg(stream)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }

  /** Streaming upsert: each micro-batch is deduped (D1) and merged into the
    * fact path with M1's windowed-refresh semantics via foreachBatch — the
    * idiomatic Spark shape of the reference's staging+MERGE loop
    * (fetch_clickup_data.py:1759-1797).
    */
  def streamingMerge(spark: SparkSession, entries: DataFrame, factPath: String,
                     days: Int, todayOslo: LocalDate, checkpoint: String,
                     sinkName: String): Unit = {
    val q = entries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val staging = Dedup.dedupTimeEntries(batch)
        val fact =
          try spark.read.parquet(factPath)
          catch { case _: Throwable => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema) }
        val merged = MergeOps.mergeRefresh(fact, staging, days, todayOslo)
        // write-temp-then-swap for atomicity (no Delta in the jar set)
        val tmp = factPath + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(factPath).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(factPath), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(factPath))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
