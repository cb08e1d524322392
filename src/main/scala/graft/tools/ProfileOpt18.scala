package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev-only stage profiler for the round-18 optimization targets:
  * x76 triangle counts (stage-by-stage), the CDC chunking pair, and the
  * logtable SQL lifecycle. Times each stage with the noop sink so the
  * numbers are computation, not sink cost (guide §1.4).
  */
object ProfileOpt18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val _ = spark // keep implicits import referenced
    def time(name: String)(f: => Long): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.sparkContext.setJobDescription(null)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }
    val which = if (args.nonEmpty) args.toSet else Set("x76")

    if (which("x76")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      li.count() // warm
      val edges = li.join(li.withColumnRenamed("p", "q"), "o")
        .filter(col("p") < col("q"))
        .select(col("p").as("a"), col("q").as("b"))
      time("x76_edges_build") { edges.count() }
      val canon = edges
        .select(col("a").cast("string").as("__a"), col("b").cast("string").as("__b"))
        .filter(col("__a").isNotNull && col("__b").isNotNull && col("__a") =!= col("__b"))
        .select(least(col("__a"), col("__b")).as("__u"), greatest(col("__a"), col("__b")).as("__v"))
        .distinct()
      val e = canon.localCheckpoint(true)
      time("x76_canon_ckpt") { e.count() }
      val deg = e.select(col("__u").as("node")).union(e.select(col("__v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("__d"))
      time("x76_deg") { deg.count() }
      val withDeg = e
        .join(deg.select(col("node").as("__u"), col("__d").as("__du")), "__u")
        .join(deg.select(col("node").as("__v"), col("__d").as("__dv")), "__v")
      val oriented = withDeg.select(
        when(col("__du") < col("__dv") ||
            (col("__du") === col("__dv") && col("__u") < col("__v")),
          struct(col("__u").as("s"), col("__v").as("t"), col("__dv").as("td")))
          .otherwise(struct(col("__v").as("s"), col("__u").as("t"), col("__du").as("td")))
          .as("__e"))
        .select(col("__e.s").as("__s"), col("__e.t").as("__t"), col("__e.td").as("__td"))
      val o = oriented.localCheckpoint(true)
      time("x76_orient_ckpt") { o.count() }
      val wedges = o.select(col("__s"), col("__t").as("__x"), col("__td").as("__dx"))
        .join(o.select(col("__s"), col("__t").as("__y"), col("__td").as("__dy")), "__s")
        .filter(col("__dx") < col("__dy") ||
          (col("__dx") === col("__dy") && col("__x") < col("__y")))
      time("x76_wedges") { wedges.count() }
      val tri = wedges
        .join(o.select(col("__s").as("__x"), col("__t").as("__y")), Seq("__x", "__y"))
        .select(col("__s"), col("__x"), col("__y"))
      time("x76_tri_close") { tri.count() }
      val out = tri.select(explode(array(col("__s"), col("__x"), col("__y"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      time("x76_count_noop") { noop(out) }
      time("x76_full_op") {
        graft.operators.GraphOps.triangleCounts(edges, "a", "b").orderBy("node").count()
      }
    }

    if (which("cdc")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.count()
      time("x146_cdc_chunks") {
        graft.operators.TextOps.cdcChunks(docs, "doc_id", "text", 8, 6)
          .orderBy("doc_id", "chunk_idx").count()
      }
      time("x147_cdc_savings") {
        graft.operators.TextOps.cdcDedupSavings(
          graft.operators.TextOps.cdcChunks(docs, "doc_id", "text", 8, 6),
          "chunk_text", "chunk_chars").count()
      }
    }

    if (which("boot")) {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      orders.count()
      time("x148_bootstrap") {
        graft.operators.Analytics.bootstrapMeanCi(orders, "o_orderpriority",
          "o_orderkey", "o_totalprice", salt = "boot:")
          .orderBy("o_orderpriority").count()
      }
    }
    spark.stop()
  }
}
