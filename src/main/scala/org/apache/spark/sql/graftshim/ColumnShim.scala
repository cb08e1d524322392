package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` classic Column↔Expression converters, for
  * wiring native Catalyst expressions (graft.functions.CosineSimilarity)
  * into the public Column API. Lives under org.apache.spark.sql solely to
  * satisfy the access qualifier; no Spark internals are modified.
  */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Decompose a possibly-`.asc`/`.desc`-wrapped Column into (the bare
    * column, ascending?). Public-API sort Columns wrap an
    * `internal.SortOrder` COLUMN NODE (not a catalyst SortOrder — the
    * conversion is lazy), so this must pattern-match at the node level.
    */
  def sortSpec(c: Column): (Column, Boolean) = c.node match {
    case so: internal.SortOrder =>
      (Column(so.child), so.sortDirection == internal.SortOrder.Ascending)
    case _ => (c, true)
  }
}

/** Bridge to the `private[spark]` RDD determinism tracker: whether a
  * recomputed partition is guaranteed byte-identical (DETERMINATE) — the
  * condition under which a two-pass physical operator may re-read its
  * shuffled child without pinning it first.
  */
object RddShim {
  def isDeterminate(rdd: org.apache.spark.rdd.RDD[_]): Boolean =
    rdd.outputDeterministicLevel ==
      org.apache.spark.rdd.DeterministicLevel.DETERMINATE

  /** Whether every shuffle ancestor's MAP side is DETERMINATE. A
    * post-shuffle RDD is always flagged UNORDERED (reducers fetch map
    * outputs in arbitrary interleave), which over-condemns operators
    * that re-sort by a TOTAL order above the exchange: there the reduce
    * fetch order is irrelevant and replayed partition CONTENTS are
    * value-identical as long as the map side replays identically —
    * which is exactly what this checks (the range partitioner's
    * boundaries are captured in the dependency, not resampled on
    * retry).
    */
  def mapSideDeterminate(rdd: org.apache.spark.rdd.RDD[_]): Boolean = {
    def walk(r: org.apache.spark.rdd.RDD[_]): Boolean =
      r.dependencies.forall {
        case s: org.apache.spark.ShuffleDependency[_, _, _] =>
          isDeterminate(s.rdd)
        case n => walk(n.rdd)
      }
    walk(rdd)
  }
}

/** Bridge to the `private[spark]` serializable Hadoop-configuration
  * wrapper: broadcast the session conf once and hand executors an
  * opaque serializable thunk — what a distributed parquet-footer read
  * needs without re-deriving credentials/filesystem settings from a
  * bare `new Configuration()` on each executor.
  */
object ConfShim {
  def broadcast(sc: org.apache.spark.SparkContext,
                conf: org.apache.hadoop.conf.Configuration)
      : () => org.apache.hadoop.conf.Configuration = {
    val b = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    () => b.value.value
  }
}

/** Bridge to the `private[spark]` listener bus, for specs that assert
  * job-submission invariants: flush pending listener events before
  * reading a listener-maintained counter (the bus is async — a count
  * read without the flush races the delivery thread). */
object ListenerShim {
  def waitUntilEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

/** Bridge to the `private[sql]` Dataset/LogicalPlan constructors, for
  * planting custom logical nodes (graft.plans.RunningSumPlan) into a
  * DataFrame. Same access-qualifier-only rationale as [[ColumnShim]].
  */
object PlanShim {
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def logical(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Re-tag a computed batch frame as a STREAMING frame — what a
    * DSv1 `Source.getBatch` must return (MicroBatchExecution asserts
    * `isStreaming`); the same `internalCreateDataFrame(_, _,
    * isStreaming = true)` move Spark's own FileStreamSource makes,
    * reachable only from this package. The plan executes lazily via
    * its RDD, once per micro-batch. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** The inverse move, for a DSv1 `Sink.addBatch`: the frame Spark
    * hands a sink is bound to the micro-batch's IncrementalExecution
    * and cannot be re-planned by an ordinary batch write (Spark
    * forbids new queries over a streaming logical plan). Rebase the
    * already-planned RDD into a fresh batch frame — rows are copied
    * out of the operator's reused buffers because the downstream
    * table write repartitions (buffering) before it writes. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema,
      isStreaming = false)
  }

  /** Drop the blocks of an eagerly `localCheckpoint`'d frame that
    * will NEVER be read again (a lost-race retry's stale attempt —
    * r16 advice: without this, up to 5 checkpointed copies of a
    * contended SQL MERGE's update set linger until the
    * ContextCleaner notices). Spark exposes no public unpersist for
    * local checkpoints; the checkpointed RDD sits behind the
    * returned frame's `LogicalRDD`. No-op on any other plan shape.
    * UNSAFE on a frame that is still needed — the truncated lineage
    * cannot recompute the dropped blocks. */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
