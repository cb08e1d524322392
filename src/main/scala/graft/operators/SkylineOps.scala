package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._

/** Skyline / Pareto-frontier selection (Börzsönyi et al. ICDE'01): the
  * rows not dominated in a multi-objective sense — in a training-data
  * pipeline, "the docs no other doc beats on BOTH quality and brevity",
  * the principled form of multi-criteria data selection.
  */
object SkylineOps {

  /** Rows of `df` not dominated on (`maximizeCols` ↑, `minimizeCols` ↓):
    * b dominates a iff b is ≥ a on every maximized dim, ≤ on every
    * minimized dim, and strictly better somewhere. Ties on ALL dims are
    * mutually non-dominating — exact duplicates all survive. Rows with a
    * NULL in any dim are excluded (dominance is undefined on them).
    *
    * Scale shape — the textbook two-phase distributed skyline:
    * (1) a per-partition local skyline via mapPartitions (justified
    * imperative per-partition logic: an O(n·k) dominance buffer, k =
    * local frontier size, with NO shuffle — each input partition shrinks
    * to its own frontier at scan speed); (2) the global frontier is the
    * skyline of the union of local frontiers (⊇-correct because
    * domination is transitive and partition-local domination implies
    * global), computed as a broadcast self anti-join over the candidate
    * set — |C|² pair checks where |C| is frontier-sized (≈ tens for
    * real-valued data), never corpus-sized. No stage is quadratic in the
    * input; the only full pass is the embarrassingly parallel phase 1.
    *
    * Determinism: dominance is pure comparison on the raw column values —
    * no arithmetic, no floats created — so output rows are input rows.
    */
  def skyline(df: DataFrame, maximizeCols: Seq[String],
              minimizeCols: Seq[String]): DataFrame = {
    require(maximizeCols.nonEmpty || minimizeCols.nonEmpty,
      "skyline needs at least one objective column")
    // one orientation: minimized dims negate, so dominance is >= on all
    val dims = maximizeCols.map(c => col(c).cast("double")) ++
      minimizeCols.map(c => negate(col(c).cast("double")))
    val withDims = df
      .withColumn("__dims", array(dims: _*))
      .filter(!exists(col("__dims"), d => d.isNull))
    val schema = withDims.schema
    val enc = RowEncoder.encoderFor(schema)
    val di = schema.fieldIndex("__dims")
    val nd = dims.length
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var ge = true; var gt = false; var i = 0
      while (ge && i < nd) {
        if (a(i) < b(i)) ge = false
        else if (a(i) > b(i)) gt = true
        i += 1
      }
      ge && gt
    }
    val (cand, releaseCand) = Checkpoints.tracked(
      withDims.mapPartitions { rows =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Row)]
        rows.foreach { r =>
          val d = r.getSeq[Double](di).toArray
          if (!buf.exists(e => dominates(e._1, d))) {
            buf.filterInPlace(e => !dominates(d, e._1))
            buf += ((d, r))
          }
        }
        buf.iterator.map(_._2)
      }(enc))
    val ge = forall(zip_with(col("b.__dims"), col("a.__dims"),
      (x, y) => x >= y), p => p)
    val gt = exists(zip_with(col("b.__dims"), col("a.__dims"),
      (x, y) => x > y), p => p)
    val out = cand.as("a")
      .join(broadcast(cand.as("b")), ge && gt, "left_anti")
      .drop("__dims")
      .localCheckpoint(true)
    releaseCand()
    out
  }
}
