package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the r15 bloom point-lookup pruning: build an
  * sf0.1-scale LogTable whose high-cardinality `id` is SCATTERED
  * across many files (round-robin layout — every file's zone spans
  * the whole id range, so zone maps cannot prune a point probe), then
  * time
  *
  *  1. the COMMIT overhead blooms add (init with vs without
  *     bloomCols — the extra O(new rows) hashing pass), and
  *  2. the POINT-LOOKUP latency through readIndexed with
  *     `bloomPrune` on vs off (planned-file counts printed — the
  *     pruning is the mechanism, the wall-clock is the effect).
  *
  * Median of N per mode. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProfileBloom"
  */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = java.sql.Date.valueOf("2024-01-01")
    // ~6.4 M rows over 64 scattered files (sf0.1 lineitem-scale)
    val rows = spark.range(0L, 6400000L).select(
      $"id",
      concat(lit("u"), $"id").as("name"),
      ($"id" % 9973).cast("double").as("value"),
      lit(d).as("start_date_oslo"))
      .repartition(64)
      .localCheckpoint(true)
    val reps = 3
    def median(xs: Array[Double]): Double = xs.sorted.apply(xs.length / 2)
    def timedInit(bloom: Boolean): (Double, String) = {
      val ts = Array.ofDim[Double](reps)
      var lastDir = ""
      var keepDir = ""
      for (i <- 0 until reps) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_pb_$bloom").toString + "/t"
        val t0 = System.nanoTime()
        graft.operators.LogTable.init(rows, dir,
          statsCols = Seq("value"),
          bloomCols = if (bloom) Seq("id") else Seq.empty)
        ts(i) = (System.nanoTime() - t0) / 1e9
        if (keepDir.isEmpty) keepDir = dir
        else {
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p.getParent, true)
        }
        lastDir = dir
      }
      (median(ts), keepDir)
    }
    val (tNo, dirNo) = timedInit(bloom = false)
    val (tYes, dirYes) = timedInit(bloom = true)
    println(f"[profile-bloom] init 6.4M rows/64 files: " +
      f"no-bloom=$tNo%.2fs bloom=$tYes%.2fs " +
      f"overhead=${tYes / tNo}%.2fx")
    val ids = Seq(17L, 400003L, 1100009L, 3300031L, 6000011L)
    def timedProbe(dir: String, prune: Boolean): (Double, Long) = {
      spark.conf.set("spark.graft.logtable.bloomPrune", prune.toString)
      val ts = Array.ofDim[Double](reps)
      var planned = 0L
      for (i <- 0 until reps) {
        val df = graft.operators.LogTable.readIndexed(spark, dir)
          .filter(col("id").isin(ids: _*))
        val t0 = System.nanoTime()
        // collect, not count: the metric must come off THIS plan
        val n = df.collect().length
        ts(i) = (System.nanoTime() - t0) / 1e9
        require(n == ids.size, s"probe returned $n rows")
        def scans(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
          p match {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              Seq(f)
            case a: org.apache.spark.sql.execution.adaptive
                .AdaptiveSparkPlanExec => scans(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive
                .QueryStageExec => scans(q.plan)
            case o => o.children.flatMap(scans)
          }
        planned = scans(df.queryExecution.executedPlan)
          .map(_.metrics("numFiles").value).sum
      }
      spark.conf.set("spark.graft.logtable.bloomPrune", "true")
      (median(ts), planned)
    }
    val (tOff, plannedOff) = timedProbe(dirYes, prune = false)
    val (tOn, plannedOn) = timedProbe(dirYes, prune = true)
    val (tPlain, plannedPlain) = timedProbe(dirNo, prune = true)
    println(f"[profile-bloom] 5-id IN probe over 64 files: " +
      f"bloom-on=$tOn%.3fs ($plannedOn files) " +
      f"bloom-off=$tOff%.3fs ($plannedOff files) " +
      f"no-sidecars=$tPlain%.3fs ($plannedPlain files) " +
      f"speedup=${tOff / tOn}%.2fx")
    Seq(dirNo, dirYes).foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p.getParent, true)
    }
    spark.stop()
  }
}
