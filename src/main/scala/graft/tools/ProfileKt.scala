package graft.tools

import graft.GraftSession

/** Dev-only: times the r12 Analytics regression cluster (x184/x185/
  * x151/st43 + neighbors, VERDICT r12 What's-wrong #2) against the
  * reworked finalizers — collect-to-local kendall census, exchange-
  * reuse association rules. Medians land in PERF.md r13. */
object ProfileKt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (t <- Seq("events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    val targets = Seq("x184_association_rules", "x185_kendall_tau",
      "x151_fair_topk", "st43_stream_kendall", "x149_permutation_test",
      "x150_lift_curve", "x152_auc_exact", "x153_grouped_spearman")
    val qs = graft.SparkEntry.queries
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (pass <- 1 to 3; name <- targets) {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      samples(name) = dt :: samples(name)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    targets.foreach { n =>
      val med = samples(n).sorted.apply(samples(n).size / 2)
      println(f"PROFKT $n%-28s median ${med}%6.2f s  (${samples(n).reverse.map(x => f"$x%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
