package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the Deequ/dbt-tests component
  * of a warehouse engine: the whole NotNull/InSet/InRange family plus
  * the row count fuse into ONE aggregation pass over the frame (r10
  * ADVICE fix — a 6-constraint suite used to scan 6×); Unique (distinct
  * count) and RefIntegrity (broadcast anti-join) are the only
  * constraints that run their own job, and they reuse the fused pass's
  * row count. Returns a uniform violations report. The gate a load job
  * consults before publishing a table (the reference's ensure-table/
  * staging flow checks shape only; this checks CONTENT).
  *
  * Report schema: (contract, detail, n_rows, n_violations,
  * violation_share, pass) — exact BIGINT counts, one rounded share. At
  * 100 TB every check stays a map-side-combinable aggregation or a
  * broadcast-able anti-join; nothing materializes violating rows (use
  * the predicate from `detail` to fetch examples when a check fails).
  */
object Contracts {

  sealed trait Constraint
  /** ≤ `maxNullShare` of rows may be NULL in `col` (0.0 = completeness). */
  final case class NotNull(col: String, maxNullShare: Double = 0.0)
      extends Constraint
  /** The non-null tuples of `cols` must be unique. */
  final case class Unique(cols: Seq[String]) extends Constraint
  /** Non-null values of `col` must be members of `values`. */
  final case class InSet(col: String, values: Seq[Any]) extends Constraint
  /** Non-null values of `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Constraint
  /** Non-null values of `col` must exist in `dim`'s `dimCol` (referential
    * integrity; `dim` is typically broadcast-sized — a dimension key set).
    */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
      extends Constraint

  def validate(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "validate needs at least one constraint")
    // The NotNull/InSet/InRange family and the row count are all one-row
    // aggregates over the SAME frame — fuse them into a single
    // aggregation pass (the r10 ADVICE fix: x160's 6 constraint scans of
    // orders are now 1). Unique (distinct) and RefIntegrity (anti-join)
    // genuinely need their own jobs; they reuse the fused pass's row
    // count instead of re-counting.
    val fused: Seq[(Constraint, Column, (Column, Column) => Column)] =
      constraints.collect {
        case cst @ NotNull(c, maxShare) =>
          (cst: Constraint,
            sum(when(col(c).isNull, 1L).otherwise(0L)),
            (v: Column, nr: Column) => v.cast("double") <=
              lit(maxShare) *
                when(nr === 0, lit(1L)).otherwise(nr).cast("double"))
        case cst @ InSet(c, values) =>
          (cst: Constraint,
            sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L)
              .otherwise(0L)),
            (v: Column, _: Column) => v === 0L)
        case cst @ InRange(c, lo, hi) =>
          (cst: Constraint,
            sum(when(col(c).isNotNull &&
              (col(c) < lo || col(c) > hi), 1L).otherwise(0L)),
            (v: Column, _: Column) => v === 0L)
      }
    val aggExprs = count(lit(1)).as("__n") +:
      fused.zipWithIndex.map { case ((_, viol, _), i) =>
        coalesce(viol, lit(0L)).as(s"__v$i") }
    // one job over df; the (1 + |fused|)-column single row is pinned so
    // every per-constraint report row reads it without a rescan
    val one = df.agg(aggExprs.head, aggExprs.tail: _*).localCheckpoint(true)
    val nRows = col("__n")
    def reportRow(name: String, detail: String, v: Column,
                  pass: Column): Seq[Column] = Seq(
      lit(name).as("contract"), lit(detail).as("detail"),
      nRows.as("n_rows"), v.as("n_violations"),
      round(v.cast("double") /
        when(nRows === 0, lit(1L)).otherwise(nRows).cast("double"), 6)
        .as("violation_share"),
      pass.as("pass"))
    // constraints.map visits in declaration order and `collect` preserved
    // that order over the fusable subset, so a running index lines up
    var fi = -1
    val parts = constraints.map {
      case cst @ (_: NotNull | _: InSet | _: InRange) =>
        fi += 1
        val (_, _, pass) = fused(fi)
        val detail = cst match {
          case NotNull(c, maxShare) => ("not_null", s"$c nullShare<=$maxShare")
          case InSet(c, values) => ("in_set", s"$c in(${values.mkString(",")})")
          case InRange(c, lo, hi) => ("in_range", s"$c in[$lo,$hi]")
          case _ => throw new IllegalStateException("unreachable")
        }
        val v = col(s"__v$fi")
        one.select(reportRow(detail._1, detail._2, v, pass(v, nRows)): _*)
      case Unique(cols) =>
        // violations = surplus rows beyond one per distinct key, over
        // rows where the whole key is non-null (SQL UNIQUE semantics)
        val agg = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
          .agg(coalesce((count(lit(1)) -
            countDistinct(col(cols.head), cols.tail.map(col): _*))
            .cast("long"), lit(0L)).as("__v"))
        agg.crossJoin(broadcast(one.select(nRows)))
          .select(reportRow("unique", cols.mkString(","), col("__v"),
            col("__v") === 0L): _*)
      case RefIntegrity(c, dim, dimCol) =>
        val orphans = df.filter(col(c).isNotNull).select(col(c))
          .join(broadcast(dim.select(col(dimCol).as(c)).distinct()),
            Seq(c), "left_anti")
          .agg(count(lit(1)).as("__v"))
        orphans.crossJoin(broadcast(one.select(nRows)))
          .select(reportRow("ref_integrity", s"$c->$dimCol", col("__v"),
            col("__v") === 0L): _*)
    }
    parts.reduce(_.unionByName(_))
  }
}
