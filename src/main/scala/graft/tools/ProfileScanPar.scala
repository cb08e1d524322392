package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Analytics

/** Interleaved A/B: heavy map-side work over a single-row-group parquet
  * scan (1 task) vs the same work after a round-robin repartition. */
object ProfileScanPar {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    orders.count(); docs.count()
    def time(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def boot(df: org.apache.spark.sql.DataFrame): Unit =
      Analytics.bootstrapMeanCi(df, "o_orderpriority", "o_orderkey",
        "o_totalprice", salt = "boot:").orderBy("o_orderpriority")
        .write.format("noop").mode("overwrite").save()
    def cdc(df: org.apache.spark.sql.DataFrame): Unit =
      graft.operators.TextOps.cdcDedupSavings(
        graft.operators.TextOps.cdcChunks(df, "doc_id", "text", 8, 6),
        "chunk_text", "chunk_chars")
        .write.format("noop").mode("overwrite").save()
    time("warm_boot") { boot(orders) }
    for (i <- 1 to 2) {
      time(s"boot_1task_$i") { boot(orders) }
      time(s"boot_repart_$i") { boot(orders.repartition(32)) }
      time(s"cdc_1task_$i") { cdc(docs) }
      time(s"cdc_repart_$i") { cdc(docs.repartition(32)) }
    }
    spark.stop()
  }
}
