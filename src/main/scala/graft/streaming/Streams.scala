package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
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
                                 checkpoint: String): DataFrame =
    withNanosAsLong(spark) {
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
    detachSink(spark, sinkName, checkpoint)
    }

  /** Run `body` with spark.sql.legacy.parquet.nanosAsLong set, restoring
    * the previous value afterwards — a shared session must not have every
    * later parquet read silently reinterpret nanos columns as longs.
    * The conf stays set for the whole (bounded) streaming run because the
    * file source consults it at scan time, not plan time.
    */
  private def withNanosAsLong[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Copy a memory sink's result out, then drop the sink view and its
    * checkpoint directory — repeated bounded runs must not pin result
    * tables in driver memory or litter checkpoint dirs.
    */
  private def detachSink(spark: SparkSession, sinkName: String,
                         checkpoint: String): DataFrame = {
    val out = spark.table(sinkName).localCheckpoint(true)
    spark.catalog.dropTempView(sinkName)
    val p = new org.apache.hadoop.fs.Path(checkpoint)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    out
  }

  /** Streaming twin of D1: drop duplicate keys across micro-batches with
    * bounded state — the watermark on `tsCol` lets Spark expire per-key
    * state once late data can no longer arrive (without it, dedup state
    * grows forever). First occurrence wins (streaming semantics; the batch
    * D1 keep-latest variant needs the upsert in [[streamingMerge]]).
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String], tsCol: String,
                     watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Typed event row for stateful sessionization. */
  case class SessionEvent(event_id: Long, ts: java.sql.Timestamp,
                          user_id: Long, value: Double)

  /** One emitted session. */
  case class UserSession(user_id: Long, session_id: Int,
                         session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp,
                         n: Long, total_value: Double)

  /** Per-user carry-over state between micro-batches: last seen event time
    * and the number of sessions already emitted.
    */
  case class SessionState(lastTs: Long, sessionsEmitted: Int)

  /** Stateful sessionization via `flatMapGroupsWithState`
    * (KeyValueGroupedDataset custom state — the idiomatic Spark slot for
    * per-key streaming logic): events of a user belong to one session while
    * inter-event gaps stay ≤ `gapMinutes`. Sessions are numbered per user
    * in event-time order.
    *
    * Batch-boundary semantics: sessions are FINALIZED at the end of each
    * micro-batch (append sink — emitted rows are immutable). An event in a
    * later micro-batch within the gap of the previous batch's last event
    * therefore starts a new session rather than extending the emitted one.
    * [[runSessionizeAvailableNow]] configures no rate limits, so
    * Trigger.AvailableNow drains the input in a single batch and the
    * output matches global (batch-SQL) sessionization exactly; a
    * continuously-running deployment that needs exact cross-batch sessions
    * should emit on event-time timeout (watermark + state-held open
    * session) and accept unbounded emission latency instead.
    *
    * Scale: state is O(1) per user (last timestamp + a counter); the group
    * shuffle is the only exchange. Events inside one micro-batch are
    * sorted per group — bounded by per-user batch volume, not corpus size.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val typed = events.select(col("event_id"), col("ts"), col("user_id"),
      col("value")).as[SessionEvent]
    val out = typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(SessionState(Long.MinValue, 0))
            val sessions = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var sid = prior.sessionsEmitted
            var cur = scala.collection.mutable.ArrayBuffer.empty[SessionEvent]
            var lastTs = prior.lastTs
            def flush(): Unit = if (cur.nonEmpty) {
              sid += 1
              sessions += UserSession(user, sid, cur.head.ts, cur.last.ts,
                cur.size.toLong,
                BigDecimal(cur.map(_.value).sum)
                  .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
              cur = scala.collection.mutable.ArrayBuffer.empty[SessionEvent]
            }
            evs.foreach { e =>
              if (lastTs != Long.MinValue && e.ts.getTime - lastTs > gapMs) flush()
              cur += e
              lastTs = e.ts.getTime
            }
            flush()
            state.update(SessionState(lastTs, sid))
            sessions.iterator
          }
      }
    out.toDF()
  }

  /** Run sessionization over a bounded file stream into a memory sink. */
  def runSessionizeAvailableNow(spark: SparkSession, dir: String, glob: String,
                                schema: StructType, gapMinutes: Int,
                                sinkName: String, checkpoint: String): DataFrame =
    withNanosAsLong(spark) {
    val raw = spark.readStream.schema(schema).option("pathGlobFilter", glob).parquet(dir)
    val stream =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    val q = sessionize(spark, stream, gapMinutes)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    detachSink(spark, sinkName, checkpoint)
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
        val conf = spark.sparkContext.hadoopConfiguration
        val factP = new org.apache.hadoop.fs.Path(factPath)
        val fs = factP.getFileSystem(conf)
        // only a genuinely-absent fact is treated as empty; any read error
        // on an existing table must abort the batch — an empty `fact` here
        // would make the merge silently truncate all out-of-window history
        val fact =
          if (fs.exists(factP)) spark.read.parquet(factPath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
        val merged = MergeOps.mergeRefresh(fact, staging, days, todayOslo)
        MergeOps.atomicSwapWrite(spark, merged, factPath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
