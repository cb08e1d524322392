package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb JIT +
    // session-init cost (otherwise whichever query runs first reads ~4 s
    // slower than steady state); count() over every benchmark table also
    // pulls the parquet into the page cache, so the first query touching a
    // table isn't charged for cold disk reads the rest never pay
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    // A crashed query must FAIL the bench visibly, not masquerade as a fast
    // row: failures record -1 (never a valid duration) plus the error text,
    // and are excluded from the total.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(200))
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // between queries (outside the timed window): drop the finished
      // query's localCheckpoint/persist blocks. The async ContextCleaner
      // only reclaims them after a GC notices the dropped references, so
      // across 60+ queries orphaned blocks otherwise accumulate and the
      // late heavy queries pay for the whole suite's memory pressure.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      (name, elapsed, err)
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isEmpty) v else -1.0) }.mkString("{", ",", "}")
    val errs = results.collect {
      case (k, _, Some(e)) => "\"" + k + "\":" + JsonUtil.jstr(e)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val nFailed = results.count(_._3.nonEmpty)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFailed,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
