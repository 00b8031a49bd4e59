package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference,
  AttributeSet, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable,
  UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.graft.Bridge

import graft.lake.Lake

/** SQL `UPDATE` for graft-lake tables.
  *
  * Spark's own row-level machinery (`RewriteUpdateTable`) only fires
  * for `SupportsRowLevelOperations` tables, whose group-based
  * `ReplaceData` write contract would re-implement the format's
  * commit protocol (stats derivation, range clustering, delta log,
  * optimistic retry) inside a per-task `BatchWrite` for zero plan
  * benefit — the same trade the INSERT path documents on
  * [[LakeWriteBuilder]]. So the engine takes the route Delta Lake
  * itself shipped for years: intercept the ANALYZED `UpdateTable`
  * command with a planner strategy and execute it through the
  * format's own copy-on-write update ([[Lake.updateWhere]] — manifest
  * prune → touched-file scan → rewrite of touched files only), under
  * the optimistic-concurrency retry loop.
  *
  * Registered two ways: `GraftExtensions` injects it at session build,
  * and [[LakeCatalog.initialize]] self-registers on live sessions via
  * `GraftSqlShim.addStrategy` (idempotent), so plain driver sessions
  * get SQL UPDATE the moment the catalog loads. */
object LakeDmlStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // the planner sees the OPTIMIZED command: the catalog alias is
    // gone and V2ScanRelationPushDown has rewritten the relation to a
    // DataSourceV2ScanRelation — match both shapes (and the raw
    // analyzed one) the way Spark's own row-level rewrites strip them
    case u: UpdateTable =>
      val target =
        org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(u.table) match {
          case rel: DataSourceV2Relation => Some(rel.table)
          case scan: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            Some(scan.relation.table)
          case _ => None
        }
      target match {
        case Some(t: LakeTable) =>
          require(!t.isPinned,
            s"cannot UPDATE ${t.name}: versionAsOf pins a historical snapshot")
          LakeUpdateExec(t.tableDir, u.assignments, u.condition) :: Nil
        case _ => Nil
      }
    case m: MergeIntoTable =>
      val target =
        org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(m.targetTable) match {
          case rel: DataSourceV2Relation => Some((rel.table, rel.output))
          case scan: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            Some((scan.relation.table, scan.output))
          case _ => None
        }
      target match {
        case Some((t: LakeTable, tgtOut)) =>
          require(!t.isPinned,
            s"cannot MERGE INTO ${t.name}: versionAsOf pins a historical snapshot")
          require(!m.withSchemaEvolution,
            "graft-lake MERGE INTO does not support WITH SCHEMA EVOLUTION " +
              "(run ALTER TABLE ADD COLUMNS first)")
          LakeMergeExec(t.tableDir, tgtOut, m.sourceTable, m.mergeCondition,
            m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Driver-side command node for the intercepted UPDATE: resolves the
  * analyzer-aligned assignments back into public `Column`s against a
  * fresh snapshot read (attribute refs → names; the update re-reads
  * the CURRENT version inside the retry loop, so a concurrent commit
  * between analysis and execution is merged, not clobbered). Output
  * is empty, like every DML command. */
case class LakeUpdateExec(dir: String, assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private def toCol(e: Expression): Column = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      "graft-lake UPDATE does not support subqueries in SET/WHERE " +
        "(materialize the subquery into a literal or join first)")
    Bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  @transient private lazy val done: Unit = {
    val spark = SparkSession.active
    val cond = condition.map(toCol).getOrElse(lit(true))
    val sets = assignments.flatMap { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => throw new UnsupportedOperationException(
          s"UPDATE SET target must be a top-level column, got $other")
      }
      // analyzer alignment pads unassigned columns with identity
      // assignments — dropping them keeps the rewrite projection
      // (and the key-column refusal) scoped to real assignments
      a.value match {
        case v: AttributeReference if v.name == name => None
        case v => Some(name -> toCol(v))
      }
    }
    Lake.withRetry()(Lake.updateWhere(spark, dir, cond, sets))
    ()
  }

  override def executeCollect(): Array[InternalRow] = { done; Array.empty }

  protected override def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD[InternalRow]
  }
}

/** Driver-side command node for SQL `MERGE INTO` on a graft-lake
  * table: the analyzer-resolved clauses re-derive relationally —
  * target FULL/LEFT/RIGHT-joined with the source on the merge
  * condition (join type minimized to the clause shapes present),
  * SQL's first-applicable-clause precedence compiled into mutually
  * exclusive branch predicates, a cardinality guard rejecting a
  * target row matched by >1 source row (the Delta error), and every
  * branch aligned to the declared schema — then landed as ONE atomic
  * [[Lake.merge]] commit (upserts + deletes together) under the
  * retry loop. Unmatched-by-any-clause rows stay untouched by key
  * omission, so the commit rewrites only the files the claimed keys
  * intersect.
  *
  * Key columns may not be REASSIGNED by an update clause (the format
  * updates by key; a key move is a delete + insert) — a key
  * assignment is accepted only when it is a bare column reference
  * (the `UPDATE SET *` / ON-equality shape, where it provably equals
  * the target key). */
case class LakeMergeExec(dir: String, tgtOut: Seq[Attribute],
    source: LogicalPlan, mergeCond: Expression,
    matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction]) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  @transient private lazy val done: Unit = {
    val spark = SparkSession.active
    Lake.withRetry()(runOnce(spark))
    ()
  }

  private def toColJ(tgtIds: AttributeSet, srcIds: AttributeSet)(
      e: Expression): Column = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      "graft-lake MERGE INTO does not support subqueries in " +
        "conditions/assignments (materialize them into the source query)")
    Bridge.column(e.transform {
      case a: AttributeReference if tgtIds.contains(a) =>
        UnresolvedAttribute(Seq("__t", a.name))
      case a: AttributeReference if srcIds.contains(a) =>
        UnresolvedAttribute(Seq("__s", a.name))
    })
  }

  private def runOnce(spark: SparkSession): Long = {
    import org.apache.spark.sql.functions.coalesce
    val tc = toColJ(AttributeSet(tgtOut), AttributeSet(source.output)) _
    val kc = Lake.manifest(dir, Lake.latestVersion(dir))
      .key.split(',').map(_.trim).toSeq
    val schema = Lake.snapshotSchema(spark, dir)
    val tgt = Lake.read(spark, dir).withColumn("__te", lit(1)).as("__t")
    val src = org.apache.spark.sql.GraftSqlShim.ofRows(spark, source)
      .withColumn("__se", lit(1)).as("__s")
    val joinType =
      if (notMatchedActions.nonEmpty && notMatchedBySourceActions.nonEmpty)
        "full_outer"
      else if (notMatchedActions.nonEmpty) "right_outer"
      else if (notMatchedBySourceActions.nonEmpty) "left_outer"
      else "inner"
    val joined = tgt.join(src, tc(mergeCond), joinType)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val isMatched = col("__t.__te").isNotNull && col("__s.__se").isNotNull
      val srcOnly = col("__t.__te").isNull
      val tgtOnly = col("__s.__se").isNull
      // the SQL cardinality contract: >1 source match per target row
      // is non-deterministic and must error (keys are unique, so
      // grouping by key is grouping by target row)
      val dup = joined.filter(isMatched)
        .groupBy(kc.map(c => col(s"__t.$c")): _*)
        .count().filter(col("count") > 1).limit(1).count()
      require(dup == 0L,
        "MERGE INTO cardinality violation: a target row matched more than " +
          "one source row (make the source distinct on the merge keys)")
      def actionCond(a: MergeAction): Option[Expression] = a match {
        case UpdateAction(c, _, _) => c
        case DeleteAction(c) => c
        case InsertAction(c, _) => c
        case UpdateStarAction(c) => c
        case InsertStarAction(c) => c
        case other => throw new UnsupportedOperationException(
          s"unsupported MERGE action: $other")
      }
      // first-applicable-clause precedence: clause i fires iff its
      // condition holds and no earlier clause's did
      def withEff(actions: Seq[MergeAction]): Seq[(MergeAction, Column)] = {
        var claimed: Column = lit(false)
        actions.map { a =>
          val c0 = actionCond(a).map(e => coalesce(tc(e), lit(false)))
            .getOrElse(lit(true))
          val eff = c0 && !claimed
          claimed = claimed || c0
          (a, eff)
        }
      }
      def assignMap(assigns: Seq[Assignment]): Map[String, (Column, Boolean)] =
        assigns.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case o => throw new UnsupportedOperationException(
              s"MERGE assignment target must be a top-level column, got $o")
          }
          val bareRef = a.value.isInstanceOf[AttributeReference]
          name -> (tc(a.value), bareRef)
        }.toMap
      def aligned(df: DataFrame, value: String => Option[Column],
          fallback: String => Column): DataFrame =
        df.select(schema.fields.toSeq.map { f =>
          value(f.name).getOrElse(fallback(f.name))
            .cast(f.dataType).as(f.name)
        }: _*)
      def updateBranch(cond: Column, assigns: Seq[Assignment],
          fallbackSide: String): DataFrame = {
        val am = assignMap(assigns)
        kc.foreach { k =>
          am.get(k).foreach { case (_, bareRef) =>
            require(bareRef,
              s"MERGE must not reassign key column '$k' " +
                "(a key move is a delete + insert)")
          }
        }
        aligned(joined.filter(cond),
          name => if (kc.contains(name)) None else am.get(name).map(_._1),
          name => col(s"$fallbackSide.$name"))
      }
      val matchedEff = withEff(matchedActions)
      val nbsEff = withEff(notMatchedBySourceActions)
      val updateFrames =
        matchedEff.collect {
          case (UpdateAction(_, assigns, _), eff) =>
            updateBranch(isMatched && eff, assigns, "__t")
          case (UpdateStarAction(_), eff) =>
            aligned(joined.filter(isMatched && eff),
              name => if (kc.contains(name)) None else Some(col(s"__s.$name")),
              name => col(s"__t.$name"))
        } ++
        withEff(notMatchedActions).collect {
          case (InsertAction(_, assigns), eff) =>
            aligned(joined.filter(srcOnly && eff),
              name => assignMap(assigns).get(name).map(_._1), _ => lit(null))
          case (InsertStarAction(_), eff) =>
            aligned(joined.filter(srcOnly && eff),
              name => Some(col(s"__s.$name")), _ => lit(null))
        } ++
        nbsEff.collect {
          case (UpdateAction(_, assigns, _), eff) =>
            updateBranch(tgtOnly && eff, assigns, "__t")
        }
      val deleteFrames =
        matchedEff.collect { case (DeleteAction(_), eff) =>
          joined.filter(isMatched && eff).select(kc.map(c => col(s"__t.$c")): _*)
        } ++
        nbsEff.collect { case (DeleteAction(_), eff) =>
          joined.filter(tgtOnly && eff).select(kc.map(c => col(s"__t.$c")): _*)
        }
      val noneUpd = aligned(joined.filter(lit(false)), _ => None,
        name => col(s"__t.$name"))
      val noneDel = joined.filter(lit(false))
        .select(kc.map(c => col(s"__t.$c")): _*)
      val updates = updateFrames.reduceOption(_.unionByName(_)).getOrElse(noneUpd)
      val deleteKeys = deleteFrames.reduceOption(_.union(_)).getOrElse(noneDel)
      Lake.merge(spark, dir, updates, deleteKeys)
    } finally { joined.unpersist(false); () }
  }

  override def executeCollect(): Array[InternalRow] = { done; Array.empty }

  protected override def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.emptyRDD[InternalRow]
  }
}
