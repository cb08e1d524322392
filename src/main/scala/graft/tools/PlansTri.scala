package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Plan dump for the x76 triangle pipeline INTERNALS (r18). The operator
  * materializes through localCheckpoint, so the query-level explain shows
  * only a Scan ExistingRDD; this tool rebuilds the wedge/close pipeline
  * exactly as GraphOps.triangleCounts assembles it — the r17 string-keyed
  * shape and the r18 rank-keyed shape — and explains both, so the
  * committed before/after plans show what actually changed (the Exchange
  * input schemas: 3 strings + 2 degree tiebreak columns vs 3 BIGINTs).
  */
object PlansTri {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.join(li.withColumnRenamed("p", "q"), "o")
      .filter(col("p") < col("q"))
      .select(col("p").as("a"), col("q").as("b"))
    val canon = edges
      .select(col("a").cast("string").as("__a"), col("b").cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull && col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("__u"), greatest(col("__a"), col("__b")).as("__v"))
      .distinct()
    val e = canon.localCheckpoint(true)
    val deg = e.select(col("__u").as("node")).union(e.select(col("__v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("__d"))

    println("\n========== x76 internals: r17 shape (string keys + degree tiebreak) ==========")
    locally {
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
      val wedges = o.select(col("__s"), col("__t").as("__x"), col("__td").as("__dx"))
        .join(o.select(col("__s"), col("__t").as("__y"), col("__td").as("__dy")), "__s")
        .filter(col("__dx") < col("__dy") ||
          (col("__dx") === col("__dy") && col("__x") < col("__y")))
      val tri = wedges
        .join(o.select(col("__s").as("__x"), col("__t").as("__y")), Seq("__x", "__y"))
        .select(col("__s"), col("__x"), col("__y"))
      tri.select(explode(array(col("__s"), col("__x"), col("__y"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
        .explain("formatted")
    }

    println("\n========== x76 internals: r18 shape (dense (degree,id)-rank keys) ==========")
    locally {
      val ranked = graft.operators.ScaleOps.globalRankAndSum(deg, "__d",
          Seq(col("__d").asc, col("node").asc))
        .select(col("node"), col("__rank").as("__r"))
      val dict = ranked.localCheckpoint(true)
      val withR = e
        .join(dict.select(col("node").as("__u"), col("__r").as("__ru")), "__u")
        .join(dict.select(col("node").as("__v"), col("__r").as("__rv")), "__v")
      val oriented = withR.select(
        when(col("__ru") < col("__rv"),
          struct(col("__ru").as("s"), col("__rv").as("t")))
          .otherwise(struct(col("__rv").as("s"), col("__ru").as("t")))
          .as("__e"))
        .select(col("__e.s").as("__s"), col("__e.t").as("__t"))
      val o = oriented.localCheckpoint(true)
      val wedges = o.select(col("__s"), col("__t").as("__x"))
        .join(o.select(col("__s"), col("__t").as("__y")), "__s")
        .filter(col("__x") < col("__y"))
      val tri = wedges
        .join(o.select(col("__s").as("__x"), col("__t").as("__y")), Seq("__x", "__y"))
        .select(col("__s"), col("__x"), col("__y"))
      val counts = tri
        .select(explode(array(col("__s"), col("__x"), col("__y"))).as("__r"))
        .groupBy(col("__r")).agg(count(lit(1)).as("n_tri"))
      counts.join(dict, Seq("__r")).select(col("node"), col("n_tri"))
        .explain("formatted")
    }
    spark.stop()
  }
}
