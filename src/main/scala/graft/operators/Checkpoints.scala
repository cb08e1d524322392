package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager `localCheckpoint` with an explicit release handle.
  *
  * `Dataset.unpersist` cannot free checkpoint blocks — they are RDD-level
  * persists tracked outside the `CacheManager`, so the usual
  * persist/unpersist discipline silently no-ops on them and iterative
  * operators would pin one block set per round until a GC lets the async
  * ContextCleaner catch up. `tracked` captures the RDD ids the checkpoint
  * registers and returns a thunk that unpersists exactly those, so an
  * operator can release each superseded round eagerly and leak at most
  * its (result-sized) final checkpoint — the same contract as the
  * persist-based operators.
  */
private[graft] object Checkpoints {
  def tracked(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint(true)
    val fresh = (sc.getPersistentRDDs.keySet -- before).toSeq
    val release = () => fresh.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    (cp, release)
  }
}
