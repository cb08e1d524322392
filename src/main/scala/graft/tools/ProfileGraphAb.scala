package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Checkpoints, GraphOps}

/** Interleaved same-session A/B: r17 string-keyed pageRank/labelProp
  * (inlined) vs the r18 rank-encoded operators — isolates the code effect
  * from host drift, which round-to-round bench runs cannot. */
object ProfileGraphAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("p")).distinct()
    li.count()
    // x70's edge shape: orders↔suppliers co-occurrence, both directions
    val pairs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").as("a"), col("l_suppkey").as("b")).distinct()
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))

    def withCap[T](df: DataFrame)(body: => T): T = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "8")
      try body finally spark.conf.set(key, prev)
    }
    def oldPageRank(edgesIn: DataFrame, iterations: Int, damping: Double): DataFrame =
      withCap(edgesIn) {
        val (e, releaseE) = Checkpoints.tracked(edgesIn
          .select(col("a").cast("string").as("__s"), col("b").cast("string").as("__t"))
          .distinct())
        val (nodes, releaseNodes) = Checkpoints.tracked(
          e.select(col("__s").as("node")).union(e.select(col("__t").as("node"))).distinct())
        val n = nodes.count()
        val deg = e.groupBy(col("__s").as("node")).agg(count(lit(1)).as("__deg"))
        val base12 = math.round((1.0 - damping) / n * 1e12)
        val d6 = math.round(damping * 1e6)
        var pr = nodes.withColumn("__pr12", lit(math.round(1e12 / n)))
        var releasePrev: () => Unit = () => ()
        for (_ <- 1 to iterations) {
          val sums = e
            .join(pr.select(col("node").as("__s"), col("__pr12")), "__s")
            .join(deg.select(col("node").as("__s"), col("__deg")), "__s")
            .select(col("__t"), expr("__pr12 div __deg").as("__ci"))
            .groupBy(col("__t")).agg(sum(col("__ci")).as("__m12"))
          val (next, releaseNext) = Checkpoints.tracked(nodes
            .join(sums.withColumnRenamed("__t", "node"), Seq("node"), "left")
            .select(col("node"),
              expr(s"(${d6}L * coalesce(__m12, 0L)) div 1000000L + ${base12}L").as("__pr12")))
          releasePrev()
          pr = next
          releasePrev = releaseNext
        }
        val out = pr.select(col("node"),
          (col("__pr12").cast("double") / lit(1e12)).as("pagerank")).localCheckpoint(true)
        releasePrev(); releaseNodes(); releaseE()
        out
      }

    def time(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    time("warm") { oldPageRank(edges, 5, 0.85).write.format("noop").mode("overwrite").save() }
    for (i <- 1 to 3) {
      time(s"old_$i") { oldPageRank(edges, 5, 0.85).write.format("noop").mode("overwrite").save() }
      time(s"new_$i") { GraphOps.pageRank(edges, "a", "b", 5).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
