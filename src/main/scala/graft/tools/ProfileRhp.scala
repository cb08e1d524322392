package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.SimilarityOps

/** Dev-only stage profiler for the RHP-banded near-dup query (x5b). */
object ProfileRhp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count() // warm
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val dims = 64; val nbits = 32; val bands = 16; val rows = nbits / bands
    val mask = (1L << rows) - 1
    time("sig") {
      emb.select(SimilarityOps.rhpBucket(col("embedding"), dims, nbits).as("sig"))
        .agg(sum(col("sig"))).count()
    }
    val sig = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      SimilarityOps.rhpBucket(col("embedding"), dims, nbits).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sig_persist") { sig.count() }
    val banded = sig.select(col("id"), col("sig"), explode(
      array((0 until bands).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * rows).bitwiseAND(mask).as("bkey"))): _*))
      .as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val joined = banded.as("l").join(banded.as("r"),
      col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
        col("l.id") < col("r.id"))
    time("join_raw") { joined.count() }
    val xorSig = col("l.sig").bitwiseXOR(col("r.sig"))
    val firstMatch = (0 until bands).map { bp =>
      (col("l.band") <= lit(bp)) ||
        (shiftright(xorSig, bp * rows).bitwiseAND(mask) =!= 0)
    }.reduce(_ && _)
    val cands = joined.filter(firstMatch)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    time("cands_firstmatch") { cands.count() }
    val out = cands
      .join(sig.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("score",
        round(graft.functions.CosineSimilarity(col("v_a"), col("v_b")), 4))
      .filter(col("score") >= 0.44)
    time("verify") { out.count() }
    // collect() on THIS Dataset so the printed plan is the final AQE plan
    // of an executed QueryExecution — count() runs a separate one whose
    // adaptive plan here would still show isFinalPlan=false
    out.collect()
    println("=== verify executed plan (join strategy audit) ===")
    println(out.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .mkString("\n"))
    time("full_query_1") {
      SimilarityOps.rhpNearDupPairs(emb, "vec_id", "embedding", dims, nbits,
        bands, 0.44).count()
    }
    time("full_query_2") {
      SimilarityOps.rhpNearDupPairs(emb, "vec_id", "embedding", dims, nbits,
        bands, 0.44).count()
    }
    sig.unpersist()
    spark.stop()
  }
}
