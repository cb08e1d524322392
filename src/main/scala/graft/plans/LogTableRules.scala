package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement,
  LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.sources.LogTableFileIndex

/** Analysis rules wiring the `logtable` DataSource
  * ([[graft.sources.LogTableSource]]) into full SQL semantics —
  * installed by [[graft.GraftExtensions]]. */
object LogTableRules {
  private[plans] def indexOf(lr: LogicalRelation)
      : Option[LogTableFileIndex] = lr.relation match {
    case h: HadoopFsRelation => h.location match {
      case i: LogTableFileIndex => Some(i)
      case _ => None
    }
    case _ => None
  }
}

/** Discharges a `dvPending` LogTable scan: the DataSource provider can
  * only hand the analyzer a `BaseRelation`, so a snapshot carrying
  * deletion vectors marks its [[LogTableFileIndex]] and THIS rule
  * rewrites the relation into (the same file scan) ⟕̸ (its dead
  * positions) — the exact [[graft.operators.LogTable.applyDv]]
  * anti-join readIndexed builds eagerly. The rewritten relation keeps
  * the ORIGINAL output attribute ids (the projection selects them by
  * name off the same relation node), so references above are
  * untouched; the discharged index cannot match again — one-shot,
  * fixed-point safe. */
object LogTableDvRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case lr: LogicalRelation
        if LogTableRules.indexOf(lr).exists(_.dvPending) =>
      val idx = LogTableRules.indexOf(lr).get
      val spark = SparkSession.active
      val hfs = lr.relation.asInstanceOf[HadoopFsRelation]
      val clean = lr.copy(
        relation = hfs.copy(location = idx.dvApplied)(spark))
      val df = org.apache.spark.sql.graftshim.PlanShim.ofRows(spark,
        clean)
      val filtered = graft.operators.LogTable.applyDv(spark,
        idx.tableRoot, idx.dvIds, df, levels = idx.levels)
        .select(lr.output.map(a => col(a.name)): _*)
      org.apache.spark.sql.graftshim.PlanShim.logical(filtered)
  }
}

/** Routes `INSERT INTO` / `INSERT OVERWRITE` on a named logtable
  * through the MANIFEST commit paths. Without this, Spark's own
  * `DataSourceAnalysis` (a post-hoc rule — this one runs in the main
  * resolution batch, so it wins) would plan
  * `InsertIntoHadoopFsRelationCommand` and write parquet files
  * straight into the directory, invisible to every manifest-planned
  * reader. Column matching is positional with lenient casts (the SQL
  * `INSERT` contract; `byName` inserts align by name first). */
object LogTableInsertRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case InsertIntoStatement(lr: LogicalRelation, partSpec, userCols,
        query, overwrite, ifPartitionNotExists, byName)
        if LogTableRules.indexOf(lr).isDefined && query.resolved =>
      val idx = LogTableRules.indexOf(lr).get
      require(partSpec.isEmpty,
        "logtable: static PARTITION specs are not supported — " +
          "partition values ride the rows themselves")
      require(!ifPartitionNotExists,
        "logtable: IF NOT EXISTS partition inserts are not supported")
      require(userCols.isEmpty,
        "logtable: INSERT with an explicit column list is not " +
          "supported — supply every table column")
      LogTableWriteCommand(idx.tableRoot, query, overwrite,
        lr.schema,
        idx.partitionSchema.fieldNames.toSeq, byName)
  }
}

/** The runnable half of [[LogTableInsertRule]]: aligns the query's
  * output to the table schema (positionally, or by name for
  * `byName` inserts), lenient-casts, and commits through
  * [[graft.operators.LogTable.append]] /
  * [[graft.operators.LogTable.overwrite]]. */
final case class LogTableWriteCommand(tableRoot: String,
    query: LogicalPlan, overwrite: Boolean, tableSchema: StructType,
    partCols: Seq[String], byName: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = org.apache.spark.sql.graftshim.PlanShim.ofRows(spark,
      query)
    require(df0.schema.length == tableSchema.length,
      s"logtable INSERT: the query produces ${df0.schema.length} " +
        s"columns, the table has ${tableSchema.length}")
    val named = if (byName) df0 else df0.toDF(tableSchema.fieldNames: _*)
    val aligned = named.select(
      tableSchema.map(f => col(f.name).cast(f.dataType)): _*)
    val dateCol = partCols.mkString(",")
    if (overwrite)
      graft.operators.LogTable.overwrite(spark, tableRoot, aligned,
        dateCol)
    else
      graft.operators.LogTable.append(spark, tableRoot, aligned,
        dateCol)
    Seq.empty
  }
}
