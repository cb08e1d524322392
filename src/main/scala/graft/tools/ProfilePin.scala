package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only A/B of the RunningSumExec pin policy in ONE session (host
  * noise cancels): auto (re-read determinate shuffle) vs always (pin). */
object ProfilePin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val names = Seq("x112_quantile_normalize", "x139_vocab_coverage",
      "x158_grouped_auc", "x20_token_budget", "x168_native_running_sum")
    for (pass <- 1 to 3; policy <- Seq("auto", "always"); n <- names) {
      spark.conf.set("spark.graft.runningSum.pin", policy)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"PROFPIN pass=$pass $policy%-6s $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
