package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Dump formatted physical plans for headline queries (plan audit: filter
  * pushdown reaching the scan, broadcast joins for dims, partial
  * aggregation, whole-stage codegen spans).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "s1_time_range_scan", "j1_fact_dim_left_join", "a2_sum_grouped",
      "d1_dedup_latest", "m1_merge_refresh", "x6_cosine_topk")
    val spark = GraftSession.local()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
