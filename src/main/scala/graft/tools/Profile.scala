package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.TextOps.shingles

/** Dev-only stage profiler for the hot near-dup queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    docs.count() // warm
    time("tokenize") {
      docs.select(split(trim(col("text")), "\\s+").as("t")).agg(sum(size(col("t")))).count()
    }
    time("shingles3") {
      docs.select(shingles(col("text"), 3).as("s")).agg(sum(size(col("s")))).count()
    }
    time("shingles3_distinct") {
      docs.select(array_distinct(shingles(col("text"), 3)).as("s"))
        .agg(sum(size(col("s")))).count()
    }
    time("shingles3_hash_sort") {
      docs.select(array_sort(transform(array_distinct(shingles(col("text"), 3)),
        s => xxhash64(s))).as("h")).agg(sum(size(col("h")))).count()
    }
    val distinctSh = array_distinct(shingles(col("text"), 3))
    val sh = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
      distinctSh.as("sh"),
      array_sort(transform(distinctSh, s => xxhash64(s))).as("hs"))
      .withColumn("n", size(col("sh")))
      .filter(col("n") > 0)
      .withColumn("prefix",
        slice(col("hs"), lit(1), (col("n") - ceil(lit(0.499) * col("n")) + 1).cast("int")))
    time("sh_table") { sh.count() }
    val inv = sh.select(col("id"), col("blk"), explode(col("prefix")).as("tok"))
    time("inv") { inv.count() }
    val cands = inv.as("l").join(inv.as("r"),
        col("l.blk") === col("r.blk") && col("l.tok") === col("r.tok") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    time("cands") { cands.count() }
    val full = sh.select(col("id"), col("sh"), col("n"))
    val out = cands
      .join(full.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a")), "id_a")
      .join(full.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= 0.5)
    time("verify") { out.count() }
    spark.stop()
  }
}
