package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

object ProfilePushdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("32")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(32)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-02-01")
      .select("l_orderkey", "l_shipdate")
    li.explain("formatted")
    spark.stop()
  }
}
