package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Stage profiler for x95 kCore / x70 pageRank / x79 labelProp (r18). */
object ProfileKcore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    li.count()
    val edges = li.join(li.withColumnRenamed("p", "q"), "o")
      .filter(col("p") < col("q"))
      .select(col("p").as("a"), col("q").as("b"))
    // mirror kCore internals with per-round timing
    import graft.operators.GraphOps
    time("kcore_full") {
      GraphOps.kCore(edges, "a", "b", k = 80, rounds = 6).count()
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    // manual per-round
    val init = edges
      .select(col("a").cast("string").as("__a"), col("b").cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull && col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("__u"), greatest(col("__a"), col("__b")).as("__v"))
      .distinct()
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    var e = time("init_ckpt") {
      init.select(col("__u").as("__s"), col("__v").as("__t"))
        .union(init.select(col("__v").as("__s"), col("__u").as("__t")))
        .localCheckpoint(true)
    }
    for (r <- 1 to 6) {
      val keep = e.groupBy(col("__s")).agg(count(lit(1)).as("__dg"))
        .filter(col("__dg") >= 80).select(col("__s"))
      val next = time(s"round_$r") {
        e.join(keep, Seq("__s"), "left_semi")
          .join(keep.withColumnRenamed("__s", "__t"), Seq("__t"), "left_semi")
          .localCheckpoint(true)
      }
      println(s"   rows=${next.count()}")
      e = next
    }
    spark.conf.set(key, prev)
    spark.stop()
  }
}
