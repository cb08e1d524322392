package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteFromTable, InsertAction, InsertIntoStatement, InsertStarAction,
  LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction,
  UpdateStarAction, UpdateTable}
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

  /** A DML target resolves as the relation, possibly under an alias. */
  private[plans] def unwrapTarget(p: LogicalPlan)
      : Option[(LogicalRelation, LogTableFileIndex)] = p match {
    case lr: LogicalRelation => indexOf(lr).map(lr -> _)
    case sa: SubqueryAlias => unwrapTarget(sa.child)
    case _ => None
  }

  /** Detach a resolved predicate/value from its plan as SQL TEXT:
    * re-parsed with `expr()` against the fresh scan the DML op builds
    * internally, attribute references re-resolve by NAME (exprIds
    * never survive across plans), and the command plan carries no
    * expression nodes for CheckAnalysis to flag as dangling.
    * Subqueries are rejected loudly — a DML condition is evaluated
    * file-by-file by the zone pruner and row-by-row by the scan
    * filter, neither of which can host a correlated plan. */
  private[plans] def detach(e: Expression, what: String): String = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"logtable: subqueries are not supported in a $what")
    // resolved attributes render FULLY QUALIFIED (catalog.db.table.col)
    // which the internal scan cannot resolve — strip to the bare name
    e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }.sql
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
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // INVARIANT (r15 verdict): this rule is injected session-wide and
    // runs on every analyzer invocation of EVERY query — a plan with
    // no dv-pending logtable scan must pay exactly one allocation-free
    // traversal and bail before the shield set is even built.
    val pending = plan.exists {
      case lr: LogicalRelation =>
        LogTableRules.indexOf(lr).exists(_.dvPending)
      case _ => false
    }
    if (!pending) return plan
    // DML TARGETS are left alone: DeleteFromTable/UpdateTable/
    // MergeIntoTable hold their target as a CHILD, but the rewritten
    // commands (LogTableDmlRule) only need the relation to find the
    // table root — wrapping the target in the anti-join would hide it
    // from that rule. (InsertIntoStatement's table is a field, not a
    // child, so it was never at risk.) Identity-based, since the same
    // relation object may legitimately appear in the SOURCE side too.
    val shield = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def mark(p: LogicalPlan): Unit = p.foreach {
      case lr: LogicalRelation => shield.add(lr)
      case _ => ()
    }
    plan.foreach {
      case d: DeleteFromTable => mark(d.table)
      case u: UpdateTable => mark(u.table)
      case m: MergeIntoTable => mark(m.targetTable)
      case _ => ()
    }
    plan transformUp {
    case lr: LogicalRelation
        if LogTableRules.indexOf(lr).exists(_.dvPending) &&
          !shield.contains(lr) =>
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
}

/** SQL row-level DML on a named logtable — `DELETE FROM t WHERE …`,
  * `UPDATE t SET … WHERE …` and the keyed-upsert
  * `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *` — rewritten at analysis into the
  * manifest DML ops (deletion-vector delete, atomic DV+reinsert
  * update, file-granular COW merge). Spark itself has no v1 path for
  * these nodes (they exist for DSv2 connectors), so without this rule
  * they fail as unsupported; with it the analyst's mutation statements
  * run with exactly the Column-API semantics, zone-pruned probes
  * included. MERGE supports the reference's shape — equality key
  * conjunctions with SET * / INSERT * — and rejects anything fancier
  * loudly rather than approximating it. */
object LogTableDmlRule extends Rule[LogicalPlan] {
  import LogTableRules.{detach, unwrapTarget}

  /** ON-clause → key columns: a conjunction of same-name equality
    * comparisons between the two sides. */
  private def keyColsOf(cond: Expression, targetOut: Set[Long],
                        what: String): Seq[String] = cond match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      keyColsOf(a, targetOut, what) ++ keyColsOf(b, targetOut, what)
    case EqualTo(a: AttributeReference, b: AttributeReference) =>
      val (t, s) =
        if (targetOut.contains(a.exprId.id)) (a, b) else (b, a)
      require(targetOut.contains(t.exprId.id) &&
        !targetOut.contains(s.exprId.id),
        s"logtable MERGE: ON must compare a target column with a " +
          s"source column, got $cond")
      require(t.name == s.name,
        s"logtable MERGE: ON keys must share the column name " +
          s"(keyed upsert) — got ${t.name} = ${s.name}")
      Seq(t.name)
    case other => throw new IllegalArgumentException(
      s"logtable MERGE: unsupported ON clause '$other' — use a " +
        "conjunction of same-name equality comparisons")
  }

  /** SET * / INSERT * — either the star action itself or the
    * analyzer's expansion into one same-name assignment per column. */
  private def isStarShaped(actions: Seq[Any]): Boolean = actions match {
    case Seq(UpdateStarAction(None)) | Seq(InsertStarAction(None)) =>
      true
    case Seq(UpdateAction(None, assigns, _)) => sameNameAssigns(assigns)
    case Seq(InsertAction(None, assigns)) => sameNameAssigns(assigns)
    case _ => false
  }

  /** The bare source column under the wrappers star expansion adds
    * (AssertNotNull on non-nullable targets, widening casts). */
  private def bare(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case n: org.apache.spark.sql.catalyst.expressions.objects
        .AssertNotNull => bare(n.child)
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      bare(c.child)
    case _ => None
  }

  private def sameNameAssigns(assigns: Seq[Assignment]): Boolean =
    assigns.forall {
      case Assignment(k: AttributeReference, v) =>
        bare(v).exists(_.name == k.name)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // session-wide rule: non-DML plans (the overwhelming majority)
    // bail with one allocation-free type scan (r15 verdict)
    val hasDml = plan.exists {
      case _: DeleteFromTable | _: UpdateTable | _: MergeIntoTable => true
      case _ => false
    }
    if (!hasDml) return plan
    plan transformDown {
    case DeleteFromTable(t, cond)
        if unwrapTarget(t).isDefined && cond.resolved =>
      val (_, idx) = unwrapTarget(t).get
      LogTableDeleteCommand(idx.tableRoot,
        detach(cond, "DELETE condition"))

    case UpdateTable(t, assignments, condOpt)
        if unwrapTarget(t).isDefined &&
          assignments.forall(_.resolved) &&
          condOpt.forall(_.resolved) =>
      val (_, idx) = unwrapTarget(t).get
      val sets = assignments.map {
        case Assignment(k: AttributeReference, v) =>
          k.name -> detach(v, "UPDATE assignment")
        case other => throw new IllegalArgumentException(
          s"logtable UPDATE: unsupported assignment target '$other' — " +
            "assign to plain columns")
      }
      val cond = condOpt.map(detach(_, "UPDATE condition"))
        .getOrElse("true")
      LogTableUpdateCommand(idx.tableRoot, sets, cond,
        idx.partitionSchema.fieldNames.toSeq)

    case MergeIntoTable(t, source, mergeCond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution)
        if unwrapTarget(t).isDefined && source.resolved &&
          mergeCond.resolved =>
      val (lr, idx) = unwrapTarget(t).get
      require(notMatchedBySource.isEmpty,
        "logtable MERGE: WHEN NOT MATCHED BY SOURCE is not supported")
      require(!withSchemaEvolution,
        "logtable MERGE: WITH SCHEMA EVOLUTION is not supported")
      require(isStarShaped(matched),
        "logtable MERGE: exactly WHEN MATCHED THEN UPDATE SET * is " +
          s"supported, got $matched")
      require(isStarShaped(notMatched),
        "logtable MERGE: exactly WHEN NOT MATCHED THEN INSERT * is " +
          s"supported, got $notMatched")
      val targetIds = lr.output.map(_.exprId.id).toSet
      val keys = keyColsOf(mergeCond, targetIds, "MERGE").distinct
      require(keys.nonEmpty, "logtable MERGE: no key columns in ON")
      LogTableMergeCommand(idx.tableRoot, source, keys,
        idx.partitionSchema.fieldNames.toSeq)
    }
  }
}

/** DELETE FROM — deletion-vector delete through
  * [[graft.operators.LogTable.delete]] (zone-pruned probe included). */
final case class LogTableDeleteCommand(tableRoot: String,
    condSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.operators.LogTable.delete(spark, tableRoot,
      org.apache.spark.sql.functions.expr(condSql))
    Seq.empty
  }
}

/** UPDATE — atomic DV + transformed re-insert through
  * [[graft.operators.LogTable.update]]. */
final case class LogTableUpdateCommand(tableRoot: String,
    sets: Seq[(String, String)], condSql: String,
    partCols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.operators.LogTable.update(spark, tableRoot,
      org.apache.spark.sql.functions.expr(condSql),
      sets.map { case (k, v) =>
        k -> org.apache.spark.sql.functions.expr(v)
      }.toMap,
      dateCol = partCols.mkString(","))
    Seq.empty
  }
}

/** MERGE INTO (keyed upsert, SET * / INSERT *) — file-granular
  * copy-on-write through [[graft.operators.LogTable.merge]]. */
final case class LogTableMergeCommand(tableRoot: String,
    source: LogicalPlan, keyCols: Seq[String],
    partCols: Seq[String]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graftshim.PlanShim.ofRows(spark,
      source)
    graft.operators.LogTable.merge(spark, tableRoot, src, keyCols,
      dateCol = partCols.mkString(","))
    Seq.empty
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
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // session-wide rule: non-INSERT plans bail with one
    // allocation-free type scan (r15 verdict)
    if (!plan.exists(_.isInstanceOf[InsertIntoStatement])) return plan
    plan transformDown {
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
