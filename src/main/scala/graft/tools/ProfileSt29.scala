package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession

/** Dev-only: decompose st29's cost — trivial stream, agg-only stream,
  * batch-equivalent agg — to find where the harness seconds go.
  */
object ProfileSt29 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val schema = spark.read.parquet(s"$sfDir/orders.parquet").schema
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    for (pass <- 1 to 2) {
      time(s"p$pass trivial_stream_count") {
        val q = spark.readStream.schema(schema)
          .option("pathGlobFilter", "orders.parquet")
          .option("maxFilesPerTrigger", 1).parquet(sfDir)
          .groupBy().count()
          .writeStream.format("memory").queryName(s"t_$pass")
          .outputMode("complete")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("ck").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.catalog.dropTempView(s"t_$pass")
      }
      time(s"p$pass explode33_stream_agg") {
        val q = spark.readStream.schema(schema)
          .option("pathGlobFilter", "orders.parquet")
          .option("maxFilesPerTrigger", 1).parquet(sfDir)
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("__c"))
          .withColumn("__r", explode(sequence(lit(-1), lit(31))))
          .groupBy(col("o_orderpriority"), col("__r"))
          .agg(count(lit(1)).as("n"), sum(col("__c")).as("s"))
          .writeStream.format("memory").queryName(s"e_$pass")
          .outputMode("complete")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("ck").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.catalog.dropTempView(s"e_$pass")
      }
      time(s"p$pass explode33_batch_agg") {
        spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("__c"))
          .withColumn("__r", explode(sequence(lit(-1), lit(31))))
          .groupBy(col("o_orderpriority"), col("__r"))
          .agg(count(lit(1)).as("n"), sum(col("__c")).as("s"))
          .count()
      }
      val u = graft.operators.ScaleOps.hashUniform(
        concat(col("o_orderkey").cast("string"), lit("#"),
          col("__r").cast("string")), "boot:")
      val wgt = when(u < 0.36787944117144233, 0L)
        .when(u < 0.7357588823428847, 1L)
        .when(u < 0.9196986029286058, 2L)
        .when(u < 0.9810118431238463, 3L)
        .when(u < 0.9963401531726563, 4L).otherwise(5L)
      time(s"p$pass md5_stream_agg") {
        val q = spark.readStream.schema(schema)
          .option("pathGlobFilter", "orders.parquet")
          .option("maxFilesPerTrigger", 1).parquet(sfDir)
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("__c"))
          .withColumn("__r", explode(sequence(lit(-1), lit(31))))
          .withColumn("__w", when(col("__r") === -1, lit(1L)).otherwise(wgt))
          .groupBy(col("o_orderpriority"), col("__r"))
          .agg(count(lit(1)).as("n"), sum(col("__w") * col("__c")).as("s"))
          .writeStream.format("memory").queryName(s"m_$pass")
          .outputMode("complete")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("ck").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.catalog.dropTempView(s"m_$pass")
      }
      time(s"p$pass md5_stream_agg_repart") {
        val q = spark.readStream.schema(schema)
          .option("pathGlobFilter", "orders.parquet")
          .option("maxFilesPerTrigger", 1).parquet(sfDir)
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("__c"))
          .repartition(32)
          .withColumn("__r", explode(sequence(lit(-1), lit(31))))
          .withColumn("__w", when(col("__r") === -1, lit(1L)).otherwise(wgt))
          .groupBy(col("o_orderpriority"), col("__r"))
          .agg(count(lit(1)).as("n"), sum(col("__w") * col("__c")).as("s"))
          .writeStream.format("memory").queryName(s"mr_$pass")
          .outputMode("complete")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("ck").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.catalog.dropTempView(s"mr_$pass")
      }
      time(s"p$pass md5_batch_agg") {
        spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("__c"))
          .withColumn("__r", explode(sequence(lit(-1), lit(31))))
          .withColumn("__w", when(col("__r") === -1, lit(1L)).otherwise(wgt))
          .groupBy(col("o_orderpriority"), col("__r"))
          .agg(count(lit(1)).as("n"), sum(col("__w") * col("__c")).as("s"))
          .count()
      }
      time(s"p$pass md5_batch_agg_repart") {
        spark.read.parquet(s"$sfDir/orders.parquet")
          .repartition(32)
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("__c"))
          .withColumn("__r", explode(sequence(lit(-1), lit(31))))
          .withColumn("__w", when(col("__r") === -1, lit(1L)).otherwise(wgt))
          .groupBy(col("o_orderpriority"), col("__r"))
          .agg(count(lit(1)).as("n"), sum(col("__w") * col("__c")).as("s"))
          .count()
      }
    }
    spark.stop()
  }
}
