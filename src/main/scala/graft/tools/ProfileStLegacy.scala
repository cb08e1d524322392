package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dev-only: ProfileSt with the native running-sum kernel DISABLED — the
  * legacy-vs-native crossover measurement recorded in PERF.md r11. */
object ProfileStLegacy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.nativeRunningSum", "false")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val qs = SparkEntry.queries.filter(kv => args.exists(kv._1.startsWith))
    for (pass <- 1 to 3; (name, fn) <- qs.toSeq.sortBy(_._1)) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"PROF pass=$pass $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
