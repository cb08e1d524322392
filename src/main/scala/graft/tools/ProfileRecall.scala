package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{ClusterOps, SimilarityOps}

/** Dev-only: measure mean ANN recall@10 across IVF operating points
  * (centroid init × nlist × nprobe) on the x140 population, to pick a
  * defensible default before changing the graded queries.
  */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val corpus = emb.filter(col("vec_id") >= 16 && col("vec_id") % 10 =!= 0)

    def meanRecall(cents: org.apache.spark.sql.DataFrame, nprobe: Int): Double =
      SimilarityOps.annRecallAudit(queries, "vec_id", "embedding",
          corpus, "vec_id", "embedding", cents, "cid", "cvec",
          k = 10, nprobe = nprobe)
        .agg(avg(col("recall"))).head().getDouble(0)

    // clustered fixture (x170): the mixture-of-Gaussians table, true
    // centers as centroids — the probe-fraction curve PERF.md cites
    if (args.contains("mog")) {
      val mog = SimilarityOps.mixtureEmbeddings(emb, "vec_id", "embedding",
        nClusters = 8, eps = 0.05, salt = "mog:").localCheckpoint(true)
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val mq = mog.filter(col("vec_id") % 10 === 0)
      val mc = mog.filter(col("vec_id") % 10 =!= 0)
      for (np <- Seq(1, 2, 4, 8)) {
        val r = SimilarityOps.annRecallAudit(mq, "vec_id", "embedding",
            mc, "vec_id", "embedding", cents, "cid", "cvec",
            k = 10, nprobe = np)
          .agg(avg(col("recall"))).head().getDouble(0)
        println(f"RECALL-MOG sf=$sfDir nlist=8 nprobe=$np%2d recall=$r%.4f")
      }
      spark.stop()
      return
    }

    for (nlist <- Seq(8, 16)) {
      val firstK = emb.filter(col("vec_id") < nlist)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      for (iters <- Seq(2, 4)) {
        val km = ClusterOps.kmeansFit(emb, "vec_id", "embedding",
          firstK, "cid", "cvec", iters = iters).localCheckpoint(true)
        val kmN = km.count()
        for (np <- Seq(6, 8, 10, 12)) {
          val rK = meanRecall(km, np)
          println(f"RECALL sf=$sfDir nlist=$nlist%2d iters=$iters nprobe=$np%2d kmeans(k=$kmN)=$rK%.4f")
        }
      }
    }
    spark.stop()
  }
}
