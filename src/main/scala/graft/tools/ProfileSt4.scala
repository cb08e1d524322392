package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only isolated-pass timer for individual graded queries (default:
  * the two streaming queries whose r5 bench medians regressed without a
  * code change on their path — st3/st4). Runs each query
  * SPARK_GRAFT_PASSES times back-to-back in a warmed session so the
  * numbers isolate the query from whole-suite cache pressure; findings
  * recorded in PERF.md.
  */
object ProfileSt4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "5").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("st4_stream_merge_incremental", "st3_sessionize_eventtime")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/events.parquet").count()
    for (p <- 1 to passes; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"PROF pass=$p $n%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
