package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.SimilarityOps
import graft.functions.{L2DistanceSq => NativeL2}

/** Dev-only: measure PQ recall@10 at the shipped (m=4, dsub=16, k=16)
  * point on the clustered mixture fixture, trained (iters=2) vs
  * untrained (iters=0) — picks the executable floor for ScaleNativeSpec
  * (r12 directive #5).
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mog = SimilarityOps.mixtureEmbeddings(emb, "vec_id", "embedding",
      nClusters = 8, eps = 0.05, salt = "mog:")
      .localCheckpoint(true)
    val corpus = mog.filter(col("vec_id") >= 16)
    val init = mog.filter(col("vec_id") < 16)
    val queryIds = (0L until 16L)
    def meanRecall(iters: Int): Double = {
      val cb = SimilarityOps.pqTrain(corpus, "vec_id", "embedding",
        init, m = 4, dsub = 16, iters = iters)
      val codes = SimilarityOps.pqEncode(corpus, "vec_id", "embedding",
        cb, m = 4, dsub = 16).localCheckpoint(true)
      val recalls = queryIds.map { qid =>
        val q = mog.filter(col("vec_id") === qid).select("embedding")
          .head().getSeq[Float](0)
        val exact = corpus
          .withColumn("__d", NativeL2(col("embedding"),
            lit(q.toArray.map(_.toDouble))))
          .orderBy(col("__d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val approx = SimilarityOps.pqTopK(codes, cb, q, m = 4, dsub = 16,
          k = 10).select("id").collect().map(_.getLong(0)).toSet
        (exact & approx).size.toDouble / 10.0
      }
      recalls.sum / recalls.size.toDouble
    }
    for (iters <- Seq(0, 1, 2))
      println(f"PQ_RECALL clustered iters=$iters mean_recall@10=${meanRecall(iters)}%.4f")
    // isotropic corpus (the x62 fixture): raw embeddings
    val iso = emb.localCheckpoint(true)
    val isoCorpus = iso.filter(col("vec_id") >= 16)
    val isoInit = iso.filter(col("vec_id") < 16)
    def isoRecall(iters: Int): Double = {
      val cb = SimilarityOps.pqTrain(isoCorpus, "vec_id", "embedding",
        isoInit, m = 4, dsub = 16, iters = iters)
      val codes = SimilarityOps.pqEncode(isoCorpus, "vec_id", "embedding",
        cb, m = 4, dsub = 16).localCheckpoint(true)
      val recalls = queryIds.map { qid =>
        val q = iso.filter(col("vec_id") === qid).select("embedding")
          .head().getSeq[Float](0)
        val exact = isoCorpus
          .withColumn("__d", NativeL2(col("embedding"),
            lit(q.toArray.map(_.toDouble))))
          .orderBy(col("__d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val approx = SimilarityOps.pqTopK(codes, cb, q, m = 4, dsub = 16,
          k = 10).select("id").collect().map(_.getLong(0)).toSet
        (exact & approx).size.toDouble / 10.0
      }
      recalls.sum / recalls.size.toDouble
    }
    for (iters <- Seq(0, 1, 2))
      println(f"PQ_RECALL isotropic iters=$iters mean_recall@10=${isoRecall(iters)}%.4f")
    // residual (IVF-PQ) path on the clustered fixture: quantize
    // vector - centroid, reconstruct distance per residual
    val cents = mog.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
      .localCheckpoint(true)
    def residRecall(iters: Int): Double = {
      val resid = SimilarityOps.l2AssignResiduals(corpus, "vec_id",
        "embedding", cents, "cid", "cvec").localCheckpoint(true)
      val rv = resid.select(col("vec_id"),
        transform(col("residual"), x => x.cast("float")).as("residual"))
      val rinit = rv.filter(col("vec_id") < 32)
      val cb = SimilarityOps.pqTrain(rv, "vec_id", "residual", rinit,
        m = 4, dsub = 16, iters = iters)
      val codes = SimilarityOps.pqEncode(rv, "vec_id", "residual", cb,
        m = 4, dsub = 16).localCheckpoint(true)
      val recalls = queryIds.map { qid =>
        val qrow = mog.filter(col("vec_id") === qid).select("embedding")
          .head().getSeq[Float](0)
        // query residual vs ITS nearest centroid (nprobe=1 regime)
        val qd = qrow.map(_.toDouble)
        val cs = cents.collect().map(r =>
          (r.getLong(0), r.getSeq[Double](1)))
        val (bc, bv) = cs.minBy { case (_, cv) =>
          qd.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum }
        val qres = qd.zip(bv).map { case (a, b) => (a - b).toFloat }
        val sameList = resid.filter(col("centroid") === bc)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val exact = corpus
          .withColumn("__d", NativeL2(col("embedding"),
            lit(qrow.toArray.map(_.toDouble))))
          .orderBy(col("__d"), col("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val approx = SimilarityOps.pqTopK(
          codes.join(resid.filter(col("centroid") === bc)
            .select(col("vec_id").as("id")), Seq("id"), "left_semi"),
          cb, qres, m = 4, dsub = 16, k = 10)
          .select("id").collect().map(_.getLong(0)).toSet
        (exact & approx).size.toDouble / 10.0
      }
      recalls.sum / recalls.size.toDouble
    }
    for (iters <- Seq(0, 1, 2))
      println(f"PQ_RECALL residual iters=$iters mean_recall@10=${residRecall(iters)}%.4f")
    spark.stop()
  }
}
