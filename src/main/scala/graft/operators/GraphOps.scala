package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (DedupOps'
  * hash-to-min / large-small-star family): fixed-iteration PageRank
  * (Brin & Page 1998) as chained DataFrame joins — the canonical
  * "iterate until convergence" shape that also powers label propagation
  * and SimRank-style scoring over entity graphs.
  */
object GraphOps {

  /** Fixed-iteration PageRank with damping `d`:
    * `pr_{k+1}(v) = (1-d)/N + d * Σ_{u→v} pr_k(u)/outdeg(u)`, from the
    * uniform start `pr_0 = 1/N`. Nodes = distinct sources ∪ targets.
    * Dangling nodes (no out-edges) leak their mass — the standard
    * simplification; pass BOTH directions of each edge for undirected
    * graphs and there are no dangling nodes at all.
    *
    * Scale shape: each iteration is one equi-join of the edge frame to
    * the (node-count-sized) rank frame, one grouped fold, and one left
    * join back to nodes — all hash-shuffles on node id that AQE can
    * re-plan (rank/degree frames broadcast when small). The edge frame is
    * materialized ONCE; each iteration's rank frame is checkpointed and
    * the previous one released, so the plan stays shallow at any
    * iteration count. Per-node state is bounded by in-degree.
    *
    * Determinism (cross-engine hash compare): per-node in-sums are
    * ORDERED folds over source id (matching `list_sum(list(… ORDER BY
    * src))`); every other term derives from integer counts via IEEE
    * +,*,/ in a fixed association; each iteration rounds to 12 dp, so
    * the whole chain is bitwise reproducible.
    *
    * Output: (node, pagerank) — one row per node.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1 (got $iterations)")
    val (e, releaseE) = Checkpoints.tracked(edges
      .select(col(srcCol).cast("string").as("__s"),
        col(dstCol).cast("string").as("__t"))
      .distinct())
    val (nodes, releaseNodes) = Checkpoints.tracked(
      e.select(col("__s").as("node"))
        .union(e.select(col("__t").as("node"))).distinct())
    val n = nodes.count()
    val deg = e.groupBy(col("__s").as("node")).agg(count(lit(1)).as("__deg"))
    val base = (1.0 - damping) / n
    var pr = nodes.withColumn("__pr", lit(1.0 / n))
    var releasePrev: () => Unit = () => ()
    for (_ <- 1 to iterations) {
      val sums = e
        .join(pr.select(col("node").as("__s"), col("__pr")), "__s")
        .join(deg.select(col("node").as("__s"), col("__deg")), "__s")
        .select(col("__t"), col("__s"),
          (col("__pr") / col("__deg")).as("__c"))
        .groupBy(col("__t"))
        .agg(aggregate(array_sort(collect_list(struct(col("__s"), col("__c")))),
          lit(0.0), (acc, x) => acc + x("__c")).as("__m"))
      val (next, releaseNext) = Checkpoints.tracked(nodes
        .join(sums.withColumnRenamed("__t", "node"), Seq("node"), "left")
        .select(col("node"), round(
          lit(base) + lit(damping) * coalesce(col("__m"), lit(0.0)),
          12).as("__pr")))
      releasePrev() // next is already materialized (tracked is eager)
      pr = next
      releasePrev = releaseNext
    }
    val out = pr.select(col("node"), col("__pr").as("pagerank"))
      .localCheckpoint(true)
    releasePrev()
    releaseNodes()
    releaseE()
    out
  }
}
