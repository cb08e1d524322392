package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the Deequ/dbt-tests component
  * of a warehouse engine: a constraint suite runs as census-scale
  * aggregations over ONE pass shapes (each constraint is a one-row
  * aggregate; referential integrity is an anti-join count) and returns a
  * uniform violations report. The gate a load job consults before
  * publishing a table (the reference's ensure-table/ staging flow checks
  * shape only; this checks CONTENT).
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
    val n = df.count()
    def report(name: String, detail: String, violations: Column,
               over: DataFrame, passCond: Column => Column): DataFrame =
      over.agg(coalesce(violations, lit(0L)).as("__v"))
        .select(lit(name).as("contract"), lit(detail).as("detail"),
          lit(n).as("n_rows"), col("__v").as("n_violations"),
          round(col("__v").cast("double") /
            when(lit(n) === 0, lit(1L)).otherwise(lit(n)).cast("double"), 6)
            .as("violation_share"),
          passCond(col("__v")).as("pass"))
    val parts = constraints.map {
      case NotNull(c, maxShare) =>
        report("not_null", s"$c nullShare<=$maxShare",
          sum(when(col(c).isNull, 1L).otherwise(0L)), df,
          v => v.cast("double") <=
            lit(maxShare) * when(lit(n) === 0, lit(1L)).otherwise(lit(n))
              .cast("double"))
      case Unique(cols) =>
        // violations = surplus rows beyond one per distinct key, over
        // rows where the whole key is non-null (SQL UNIQUE semantics)
        val nonNull = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
          .select(cols.map(col): _*)
        report("unique", cols.mkString(","),
          (count(lit(1)) -
            countDistinct(col(cols.head), cols.tail.map(col): _*))
            .cast("long"),
          nonNull, v => v === 0L)
      case InSet(c, values) =>
        report("in_set", s"$c in(${values.mkString(",")})",
          sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L)
            .otherwise(0L)), df, v => v === 0L)
      case InRange(c, lo, hi) =>
        report("in_range", s"$c in[$lo,$hi]",
          sum(when(col(c).isNotNull &&
            (col(c) < lo || col(c) > hi), 1L).otherwise(0L)),
          df, v => v === 0L)
      case RefIntegrity(c, dim, dimCol) =>
        val orphans = df.filter(col(c).isNotNull).select(col(c))
          .join(broadcast(dim.select(col(dimCol).as(c)).distinct()),
            Seq(c), "left_anti")
        report("ref_integrity", s"$c->$dimCol",
          count(lit(1)), orphans, v => v === 0L)
    }
    parts.reduce(_.unionByName(_))
  }
}
