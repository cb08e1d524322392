package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Analytics

/** Dev-only: permutationTest window-vs-native-kernel crossover (PERF.md
  * r11) — times both rank strategies on the x149 population at sf0.1. */
object ProfilePerm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val ev = graft.queries.QuerySpec.t(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "view") &&
        col("value").isNotNull && col("event_id").isNotNull)
    ev.count()
    for (pass <- 1 to 3; (label, thr) <- Seq("window" -> Long.MaxValue,
        "kernel" -> 0L)) {
      val t0 = System.nanoTime()
      Analytics.permutationTest(ev, "event_type", "event_id", "value",
        "click", "view", "perm:", permutations = 64,
        scaleRankThreshold = thr).count()
      println(f"PROFPERM pass=$pass $label ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
