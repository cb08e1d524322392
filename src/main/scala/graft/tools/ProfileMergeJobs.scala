package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Job-level timing of a LogTable merge lifecycle (x200 shape, r18):
  * which Spark jobs a single merge submits and what each costs. */
object ProfileMergeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val name = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs.put(js.jobId, (name, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (desc, t0) = jobs.getOrDefault(je.jobId, ("?", System.nanoTime()))
        done.add((je.jobId, desc, (System.nanoTime() - t0) / 1e9))
      }
    })
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"),
        col("event_id").cast("string").as("id"),
        graft.functions.Coercers.osloDate(col("ts").cast("timestamp")).as("start_date_oslo"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val fact = ev.filter(col("event_id") % 3 === 0).drop("event_id")
    val base = java.nio.file.Files.createTempDirectory("graft_pmj").toString + "/t"
    graft.operators.LogTable.init(fact.repartition(col("start_date_oslo")), base)
    val updates = ev.filter(col("event_id") % 30 === 0).drop("event_id")
        .withColumn("cents", col("cents") * 3 + 7)
      .unionByName(ev.filter(col("event_id") % 3 === 1)
        .select(concat(lit("n"), col("id")).as("id"),
          col("start_date_oslo"), col("cents")))
    Thread.sleep(500)
    done.clear()
    val t0 = System.nanoTime()
    val tBase = t0
    graft.operators.LogTable.merge(spark, base, updates, Seq("id"))
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"PROF merge_total $total%8.2f s, jobs=${done.size()}")
    import scala.jdk.CollectionConverters._
    done.asScala.toSeq.sortBy(_._1).foreach { case (id, desc, dur) =>
      println(f"JOB $id%4d $dur%7.2f s  ${desc.take(110)}")
    }
    val _ = tBase
    spark.stop()
  }
}
