package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev profiler for the r18 triangle-count work: times the full x76
  * operator (rank-encoded wedge pipeline). Historical A/B notes live in
  * OPTIMIZATION_r18.md — a shuffled-hash hint on the close join moved
  * nothing (the exchange, not the sort, was the wall) and a wedge bloom
  * prefilter was measured NET-NEGATIVE (4 MB literal probes are
  * DRAM-latency-bound per row: ~2-4 s per element_at pass over 41 M rows
  * vs ~3 s of exchange saved), which motivated the narrower-types rank
  * encoding instead.
  */
object ProfileTri {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.join(li.withColumnRenamed("p", "q"), "o")
      .filter(col("p") < col("q"))
      .select(col("p").as("a"), col("q").as("b"))
    def time(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    time("warm") {
      graft.operators.GraphOps.triangleCounts(edges, "a", "b")
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 3) time(s"tri_$i") {
      graft.operators.GraphOps.triangleCounts(edges, "a", "b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
