package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket irregular events onto a fixed grid
  * and fill the gaps — the step that turns raw event streams into
  * model-ready regular series (and the analytics "no data ≠ no row"
  * correction the declared-query layer otherwise mislabels as churn).
  */
object Resample {

  /** Hourly resample with per-key gap fill: aggregate events to
    * (key, hour) buckets, then expand each key's [min hour, max hour]
    * span to a dense grid with zero-filled empty buckets.
    *
    * Plan: one hash aggregation to buckets, a key-level span aggregation
    * (tiny — one row per key), `sequence`+`explode` to generate each
    * key's grid map-side from its span row (no driver collect, no
    * cross-join against a global calendar — a key's grid is only as long
    * as ITS span), and one left join back on (key, hour). All shuffles
    * are on the natural keys; skew in grid length is bounded by
    * span/step, not event count, so a hot key with a billion events
    * costs the same grid as a cold one.
    *
    * `buckets` feeds two consumers (span agg + join); without
    * materialization Spark re-derives each from a separate full scan of
    * `events`. It is checkpointed once — the bucketed frame is the
    * already-reduced (key, hour) side, orders of magnitude smaller than
    * raw events — and the blocks are released by the caller's normal
    * per-query cleanup (Bench releases persistent RDDs between queries).
    */
  def gapFillHourly(events: DataFrame, keyCol: String, tsCol: String,
                    valCol: String): DataFrame = {
    val buckets = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count("*").as("n_events"), sum(col(valCol)).as("sum_value"))
      .localCheckpoint(true)
    val grid = buckets
      .groupBy(col(keyCol))
      .agg(min("hour").as("__min_h"), max("hour").as("__max_h"))
      .select(col(keyCol), explode(
        sequence(col("__min_h"), col("__max_h"), expr("interval 1 hour")))
        .as("hour"))
    grid.join(buckets, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }
}
