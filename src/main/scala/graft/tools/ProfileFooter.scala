package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the r14 footer-based zone collection: time
  * LogTable.init + append with statsCols under
  * spark.graft.logtable.footerStats = true vs false on an sf0.1-scale
  * batch (events → date-partitioned fact, the x200 fixture shape).
  * Median of N per mode; the delta is the commit-time stats job the
  * footer path eliminates (O(new rows) scan → O(new files) metadata
  * reads).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ProfileFooter"
  */
object ProfileFooter {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id").cast("string").as("id"),
        graft.functions.Coercers.osloDate(col("ts"))
          .as("start_date_oslo"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .localCheckpoint(true) // pin the input so both modes pay the same
    val half = ev.filter(col("cents") % 2 === 0)
    val rest = ev.filter(col("cents") % 2 =!= 0)
    val reps = 3
    def timed(footer: Boolean): (Double, Double) = {
      val (inits, apps) = (Array.ofDim[Double](reps),
        Array.ofDim[Double](reps))
      spark.conf.set("spark.graft.logtable.footerStats", footer.toString)
      for (i <- 0 until reps) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_pf_$footer").toString + "/t"
        val t0 = System.nanoTime()
        graft.operators.LogTable.init(half, dir,
          statsCols = Seq("cents", "start_date_oslo", "id"))
        val t1 = System.nanoTime()
        graft.operators.LogTable.append(spark, dir, rest)
        val t2 = System.nanoTime()
        inits(i) = (t1 - t0) / 1e9
        apps(i) = (t2 - t1) / 1e9
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p.getParent, true)
      }
      spark.conf.unset("spark.graft.logtable.footerStats")
      def med(a: Array[Double]) = a.sorted.apply(reps / 2)
      (med(inits), med(apps))
    }
    // interleave-free: one throwaway warm pass, then both modes
    timed(footer = true)
    val (fi, fa) = timed(footer = true)
    val (si, sa) = timed(footer = false)
    println(f"footer: init=$fi%.2fs append=$fa%.2fs | " +
      f"scan: init=$si%.2fs append=$sa%.2fs | " +
      f"ratio init=${fi / si}%.2fx append=${fa / sa}%.2fx")
    spark.stop()
  }
}
