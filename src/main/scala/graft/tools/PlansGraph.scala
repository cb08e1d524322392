package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Plan dumps for the r18 graph-iterative rank encoding (x70/x79/x95).
  * The operators materialize through localCheckpoint, so the registered
  * queries' own explains show only Scan ExistingRDD; this tool rebuilds
  * ONE representative per-iteration frame per operator — the frame whose
  * exchange dominates each round — in both the r17 string-keyed shape and
  * the r18 rank-keyed shape, so the Exchange/HashAggregate input schemas
  * (strings vs BIGINTs) are visible in the committed plans.
  */
object PlansGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val pairs = li.select(col("l_partkey").as("a"), col("l_suppkey").as("b")).distinct()
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))

    // ---- string-keyed (r17) frames ----
    val eStr = edges.select(col("a").cast("string").as("__s"),
      col("b").cast("string").as("__t")).distinct().localCheckpoint(true)
    val nodesStr = eStr.select(col("__s").as("node"))
      .union(eStr.select(col("__t").as("node"))).distinct().localCheckpoint(true)
    // ---- rank-keyed (r18) frames ----
    val dict = graft.operators.ScaleOps.globalRankAndSum(
        nodesStr.withColumn("__unit", lit(1L)), "__unit", Seq(col("node").asc))
      .select(col("node"), col("__rank").as("__id")).localCheckpoint(true)
    val eId = eStr
      .join(dict.select(col("node").as("__s"), col("__id").as("__si")), "__s")
      .join(dict.select(col("node").as("__t"), col("__id").as("__ti")), "__t")
      .select(col("__si").as("__s"), col("__ti").as("__t")).localCheckpoint(true)
    val nodesId = dict.select(col("__id").as("node")).localCheckpoint(true)

    def prIter(e: org.apache.spark.sql.DataFrame, nodes: org.apache.spark.sql.DataFrame) = {
      val deg = e.groupBy(col("__s").as("node")).agg(count(lit(1)).as("__deg"))
      val pr = nodes.withColumn("__pr12", lit(1000000L))
      e.join(pr.select(col("node").as("__s"), col("__pr12")), "__s")
        .join(deg.select(col("node").as("__s"), col("__deg")), "__s")
        .select(col("__t"), expr("__pr12 div __deg").as("__ci"))
        .groupBy(col("__t")).agg(sum(col("__ci")).as("__m12"))
    }
    def lpIter(e: org.apache.spark.sql.DataFrame, nodes: org.apache.spark.sql.DataFrame) = {
      val lbl = nodes.withColumn("__l", col("node"))
      e.join(lbl.select(col("node").as("__s"), col("__l")), "__s")
        .groupBy(col("__t"), col("__l")).agg(count(lit(1)).as("__c"))
    }
    def kcRound(e: org.apache.spark.sql.DataFrame) = {
      val keep = e.groupBy(col("__s")).agg(count(lit(1)).as("__dg"))
        .filter(col("__dg") >= 80).select(col("__s"))
      e.join(keep, Seq("__s"), "left_semi")
        .join(keep.withColumnRenamed("__s", "__t"), Seq("__t"), "left_semi")
    }
    println("\n########## x70 pageRank iteration frame: r17 string keys ##########")
    prIter(eStr, nodesStr).explain("formatted")
    println("\n########## x70 pageRank iteration frame: r18 rank keys ##########")
    prIter(eId, nodesId).explain("formatted")
    println("\n########## x79 labelProp count frame: r17 string keys ##########")
    lpIter(eStr, nodesStr).explain("formatted")
    println("\n########## x79 labelProp count frame: r18 rank keys ##########")
    lpIter(eId, nodesId).explain("formatted")
    println("\n########## x95 kCore round frame: r17 string keys ##########")
    kcRound(eStr).explain("formatted")
    println("\n########## x95 kCore round frame: r18 rank keys ##########")
    kcRound(eId).explain("formatted")
    spark.stop()
  }
}
