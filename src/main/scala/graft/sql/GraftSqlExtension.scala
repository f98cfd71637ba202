package graft.sql

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.StructType

import graft.spark.GraftRelation
import graft.write.GraftWriteClient

/** SQL DML for graft tables: MERGE INTO / UPDATE / DELETE (CREATE TABLE,
  * CTAS, INSERT INTO/OVERWRITE already work through the V1 datasource
  * path + InsertableRelation).
  *
  * Register with:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
  * }}}
  *
  * Spark's own analyzer rejects row-level DML on V1 relations inside the
  * resolution batch (ResolveSessionCatalog throws "does not support
  * UPDATE/DELETE" before injected resolution rules run), so — like the
  * reference (ref: HoodieSparkSessionExtension.scala:27-48 injecting a
  * parser) — the statements are intercepted at the parser seam and
  * rewritten to RunnableCommands that resolve their sub-plans through
  * the normal analyzer at execution time. The MERGE execution is the
  * SURVEY §2.7 Spark-native shape: one outer join + per-column CASE
  * chains + a single mixed upsert/delete commit — no serialized
  * expression payloads (ref: MergeIntoHoodieTableCommand.scala:56-456,
  * ExpressionPayload.scala:53-155, both absorbed by Catalyst here).
  */
class GraftSparkSessionExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}

/** Delegating parser that rewrites row-level DML statements into graft
  * commands; everything else passes through untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      case d: DeleteFromTable => GraftDeleteCommand(d)
      case u: UpdateTable     => GraftUpdateCommand(u)
      case m: MergeIntoTable  => GraftMergeCommand(m)
      case a: AddColumns      => GraftAddColumnsCommand(a)
      case r: RenameColumn    => GraftRenameColumnCommand(r)
      case c: AlterColumns    => GraftAlterColumnsCommand(c)
      case t: TruncateTable   => GraftTruncateCommand(t)
      case p: DropPartitions  => GraftDropPartitionsCommand(p)
      case other              => other
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private[sql] object GraftSqlUtils {

  /** The graft relation inside an (analyzed) plan fragment, if any. */
  def graftRelationIn(plan: LogicalPlan): Option[GraftRelation] =
    plan.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
        lr.relation.asInstanceOf[GraftRelation]
    }

  /** DML reads the target and writes the result back: through a
    * read-optimized or incremental entry it would read STALE/partial
    * rows and commit them as current (resurrecting pre-compaction
    * values). Only snapshot relations are writable.
    */
  def requireSnapshot(rel: GraftRelation): Unit = {
    val qt = rel.parameters.getOrElse("query.type", "snapshot")
    require(qt == "snapshot",
      s"MERGE/UPDATE/DELETE requires a snapshot relation; this table entry " +
        s"reads as '$qt' — run DML against the snapshot table instead")
  }

  /** Resolve a (parsed, unresolved) target plan through the analyzer and
    * dig out the graft relation it scans — None for a non-graft target
    * (the DML commands then re-run the ORIGINAL statement through stock
    * Spark, so the extension never breaks row-level DML on other
    * formats sharing the session).
    */
  def tryResolveTarget(
      spark: SparkSession, plan: LogicalPlan): Option[(GraftRelation, DataFrame)] = {
    val df = Shims.ofRows(spark, plan)
    graftRelationIn(df.queryExecution.analyzed).map { rel =>
      requireSnapshot(rel)
      (rel, df)
    }
  }

  /** Guard against assignments that silently DUPLICATE rows: a rewritten
    * record key (or, under a non-global index, a rewritten partition
    * value) routes the updated row as an INSERT of a new key while the
    * old row stays in its file group — the reference's
    * UpdateHoodieTableCommand forbids the same assignments.
    */
  def requireAssignable(
      rel: GraftRelation, assigned: Set[String], statement: String): Unit = {
    val cfg = rel.table.config
    val badKeys = assigned.intersect(cfg.recordKeyFields.map(_.toLowerCase).toSet)
    require(badKeys.isEmpty,
      s"$statement cannot assign record-key column(s) ${badKeys.mkString(", ")}: " +
        "a rewritten key inserts a NEW record and leaves the old one in " +
        "place — DELETE and re-insert instead")
    if (!rel.writeConfig.globalIndex) {
      val badParts = assigned.intersect(
        cfg.partitionSourceFields.map(_.toLowerCase).toSet)
      require(badParts.isEmpty,
        s"$statement cannot assign partition column(s) ${badParts.mkString(", ")} " +
          "under a non-global index: the moved row would duplicate across " +
          "partitions — enable index.global to support partition moves")
    }
  }

  /** The graft relation behind a catalog table name, or None when the
    * name resolves to something else (the DDL commands pass those
    * through to stock Spark).
    */
  def graftRelationOf(
      spark: SparkSession, nameParts: Seq[String]): Option[GraftRelation] =
    try {
      val df = Shims.ofRows(spark,
        org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(nameParts))
      df.queryExecution.analyzed.collectFirst {
        case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
          lr.relation.asInstanceOf[GraftRelation]
      }
    } catch { case _: Exception => None }

  def tableNameOf(plan: LogicalPlan): Seq[String] = plan match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
      u.multipartIdentifier
    case other => sys.error(s"unsupported DDL target: $other")
  }

  /** Best-effort: keep the session catalog's stored schema in sync with
    * the table's (logical) schema after a DDL change — path-only tables
    * have no catalog entry, so failures are swallowed.
    */
  def refreshCatalogSchema(
      spark: SparkSession, nameParts: Seq[String], table: graft.GraftTable): Unit = {
    try {
      val ident = TableIdentifier(nameParts.last,
        if (nameParts.size > 1) Some(nameParts(nameParts.size - 2)) else None)
      table.storedDataSchema.foreach(s =>
        spark.sessionState.catalog.alterTableDataSchema(
          ident, table.logicalizeSchema(s)))
    } catch { case _: Exception => () }
    try spark.catalog.refreshTable(nameParts.mkString("."))
    catch { case _: Exception => () }
  }

  /** Last name part of an assignment key (`t.price` -> `price`). */
  def keyName(e: Expression): String = e match {
    case u: UnresolvedAttribute => u.nameParts.last
    case a: Attribute           => a.name
    case other                  => sys.error(s"unsupported assignment key: $other")
  }
}

/** DELETE FROM t WHERE cond  →  keyed delete of the matching rows.
  * (ref: DeleteHoodieTableCommand.scala)
  */
case class GraftDeleteCommand(delete: DeleteFromTable) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlUtils.tryResolveTarget(spark, delete.table) match {
      case None => Shims.ofRows(spark, delete).collect().toSeq // not ours
      case Some((rel, df)) =>
        val filtered = delete.condition match {
          case Literal.TrueLiteral => df
          case cond                => df.filter(Shims.column(cond))
        }
        new GraftWriteClient(rel.table, rel.writeConfig).delete(filtered)
        Seq.empty
    }
  }
}

/** UPDATE t SET a = expr WHERE cond  →  read-matching rows, apply
  * assignments, upsert. (ref: UpdateHoodieTableCommand.scala)
  */
case class GraftUpdateCommand(update: UpdateTable) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlUtils.tryResolveTarget(spark, update.table) match {
      case None => Shims.ofRows(spark, update).collect().toSeq // not ours
      case Some((rel, df)) =>
        val filtered = update.condition.map(c => df.filter(Shims.column(c))).getOrElse(df)
        val assigns: Map[String, Column] = update.assignments.map(a =>
          GraftSqlUtils.keyName(a.key).toLowerCase -> Shims.column(a.value)).toMap
        GraftSqlUtils.requireAssignable(rel, assigns.keySet, "UPDATE")
        // assignments cast to the target column's type, as SQL UPDATE
        // semantics require (a bare 7.5 parses as DECIMAL(2,1))
        val updated = filtered.select(filtered.columns.toSeq.map(c =>
          assigns.get(c.toLowerCase)
            .map(_.cast(filtered.schema(c).dataType))
            .getOrElse(col(c)).as(c)): _*)
        new GraftWriteClient(rel.table, rel.writeConfig).upsert(updated)
        Seq.empty
    }
  }
}

/** ALTER TABLE t ADD COLUMNS (...) on a graft table → zero-file schema
  * evolution commit; old rows read the new columns as typed nulls.
  * Non-graft targets pass through to stock Spark untouched.
  * (ref: AlterHoodieTableAddColumnsCommand.scala)
  */
case class GraftAddColumnsCommand(a: AddColumns) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val nameParts = GraftSqlUtils.tableNameOf(a.table)
    GraftSqlUtils.graftRelationOf(spark, nameParts) match {
      case None => Shims.ofRows(spark, a).collect().toSeq // not ours
      case Some(rel) =>
        val fields = a.columnsToAdd.map { q =>
          require(q.name.size == 1,
            s"only top-level columns can be added: ${q.name.mkString(".")}")
          org.apache.spark.sql.types.StructField(q.name.head, q.dataType, q.nullable)
        }
        new GraftWriteClient(rel.table, rel.writeConfig).evolveSchema(fields)
        GraftSqlUtils.refreshCatalogSchema(spark, nameParts, rel.table)
        Seq.empty
    }
  }
}

/** ALTER TABLE t RENAME COLUMN a TO b on a graft table → config-level
  * rename (files keep their physical column name; see
  * GraftWriteClient.renameColumn). Non-graft targets pass through.
  * (ref: AlterHoodieTableChangeColumnCommand.scala)
  */
case class GraftRenameColumnCommand(r: RenameColumn) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val nameParts = GraftSqlUtils.tableNameOf(r.table)
    GraftSqlUtils.graftRelationOf(spark, nameParts) match {
      case None => Shims.ofRows(spark, r).collect().toSeq // not ours
      case Some(rel) =>
        require(r.column.name.size == 1,
          s"only top-level columns can be renamed: ${r.column.name.mkString(".")}")
        new GraftWriteClient(rel.table, rel.writeConfig).renameColumn(r.column.name.head, r.newName)
        GraftSqlUtils.refreshCatalogSchema(spark, nameParts, rel.table)
        Seq.empty
    }
  }
}

/** ALTER TABLE t ALTER COLUMN c TYPE <widerType> on a graft table → a
  * zero-file commit carrying the widened schema (see
  * GraftWriteClient.changeColumnType). Only TYPE changes are
  * intercepted; comment/position/default changes on graft tables are
  * rejected rather than silently dropped. Non-graft targets pass
  * through.
  */
case class GraftAlterColumnsCommand(a: AlterColumns) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val nameParts = GraftSqlUtils.tableNameOf(a.table)
    GraftSqlUtils.graftRelationOf(spark, nameParts) match {
      case None => Shims.ofRows(spark, a).collect().toSeq // not ours
      case Some(rel) =>
        val w = new GraftWriteClient(rel.table, rel.writeConfig)
        a.specs.foreach { spec =>
          require(spec.column.name.size == 1,
            s"only top-level columns can be altered: ${spec.column.name.mkString(".")}")
          require(spec.newDataType.isDefined &&
            spec.newPosition.isEmpty && spec.newDefaultExpression.isEmpty,
            "graft supports ALTER COLUMN ... TYPE only " +
              "(position/default changes are not supported)")
          w.changeColumnType(spec.column.name.head, spec.newDataType.get)
        }
        GraftSqlUtils.refreshCatalogSchema(spark, nameParts, rel.table)
        Seq.empty
    }
  }
}

/** TRUNCATE TABLE t on a graft table → a replace-commit hiding every
  * live file group; history stays intact for time travel until cleaned.
  * (ref: TruncateHoodieTableCommand.scala)
  */
case class GraftTruncateCommand(t: TruncateTable) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val nameParts = GraftSqlUtils.tableNameOf(t.table)
    GraftSqlUtils.graftRelationOf(spark, nameParts) match {
      case None => Shims.ofRows(spark, t).collect().toSeq // not ours
      case Some(rel) =>
        val parts = rel.table.view.partitions
        if (parts.nonEmpty)
          new GraftWriteClient(rel.table, rel.writeConfig).deletePartitions(parts)
        try spark.catalog.refreshTable(nameParts.mkString("."))
        catch { case _: Exception => () }
        Seq.empty
    }
  }
}

/** ALTER TABLE t DROP PARTITION (p='v'[, ...]) on a graft table → a
  * replace-commit hiding the partition's file groups, the SQL surface
  * over deletePartitions. Every partition field must be pinned (graft
  * partition paths are the rendered field values joined by '/'); the
  * user supplies values as stored — for timestamp-keygen partitions
  * that is the formatted bucket. Non-graft targets pass through.
  * (ref: AlterHoodieTableDropPartitionCommand.scala)
  */
case class GraftDropPartitionsCommand(d: DropPartitions) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val nameParts = GraftSqlUtils.tableNameOf(d.child)
    GraftSqlUtils.graftRelationOf(spark, nameParts) match {
      case None => Shims.ofRows(spark, d).collect().toSeq // not ours
      case Some(rel) =>
        val srcFields = rel.table.config.partitionSourceFields
        require(srcFields.nonEmpty, "table is not partitioned")
        val paths = d.parts.map {
          case org.apache.spark.sql.catalyst.analysis.UnresolvedPartitionSpec(spec, _) =>
            val norm = spec.map { case (k, v) => k.toLowerCase -> v }
            require(norm.keySet == srcFields.map(_.toLowerCase).toSet,
              s"DROP PARTITION must pin every partition field " +
                s"(${srcFields.mkString(", ")}), got (${spec.keys.mkString(", ")})")
            srcFields.map(f => Option(norm(f.toLowerCase))
              .filter(_.nonEmpty).getOrElse("default")).mkString("/")
          case other => sys.error(s"unsupported partition spec: $other")
        }
        val existing = rel.table.view.partitions.toSet
        val missing = paths.filterNot(existing)
        require(d.ifExists || missing.isEmpty,
          s"partition(s) not found: ${missing.mkString(", ")}")
        val present = paths.filter(existing)
        if (present.nonEmpty)
          new GraftWriteClient(rel.table, rel.writeConfig).deletePartitions(present)
        try spark.catalog.refreshTable(nameParts.mkString("."))
        catch { case _: Exception => () }
        Seq.empty
    }
  }
}

/** MERGE INTO target USING source ON cond WHEN ... — executed as ONE
  * declarative plan: (target ⟗ source) with presence markers, an op
  * column + per-target-column CASE chains encoding the action
  * conditions/assignments, filtered to affected rows, written as a
  * single mixed upsert/delete commit.
  */
case class GraftMergeCommand(merge: MergeIntoTable) extends LeafRunnableCommand {

  private val TMark = "_g_t_present"
  private val SMark = "_g_s_present"
  private val OpCol = "_g_op"
  private val DelCol = "_g_is_delete"

  override def run(spark: SparkSession): Seq[Row] = {
    // presence markers survive outer-join null-extension, so matched /
    // not-matched classification is null-safe even for all-null rows
    def marked(plan: LogicalPlan, m: String): LogicalPlan =
      Project(Seq(UnresolvedStar(None), Alias(Literal(true), m)()), plan)

    val joinType =
      if (merge.notMatchedBySourceActions.nonEmpty) FullOuter
      else if (merge.notMatchedActions.nonEmpty) RightOuter
      else Inner
    val joined = Join(
      marked(merge.targetTable, TMark),
      marked(merge.sourceTable, SMark),
      joinType, Some(merge.mergeCondition), JoinHint.NONE)
    val jdf = Shims.ofRows(spark, joined)

    val joinNode = jdf.queryExecution.analyzed.collectFirst { case j: Join => j }
      .getOrElse(sys.error("internal: merge join not found"))
    // the TARGET side only — the source may legitimately scan another
    // graft table; a non-graft target re-runs the original statement
    // through stock Spark
    val rel = GraftSqlUtils.graftRelationIn(joinNode.left).getOrElse {
      return Shims.ofRows(spark, merge).collect().toSeq // not ours
    }
    GraftSqlUtils.requireSnapshot(rel)
    // explicit SET assignments that REWRITE key/partition columns would
    // duplicate the row (see requireAssignable). A same-name assignment
    // (`SET id = s.id`, the hand-expanded star shape) is only an identity
    // when the ON condition actually EQUATES the pair — under
    // `ON t.id = s.other_col`, `SET id = s.id` rewrites the key like any
    // cross-name assignment and must be rejected, so the exemption checks
    // the analyzed join condition's top-level conjuncts for a
    // target.id = source.id equality (an equality under an OR guarantees
    // nothing and does not count).
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def unwrapCast(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => unwrapCast(c.child)
      case other => other
    }
    val tOut = joinNode.left.outputSet
    val sOut = joinNode.right.outputSet
    def sideName(e: Expression): Option[(Boolean, String)] = unwrapCast(e) match {
      case a: Attribute if tOut.contains(a) => Some((true, a.name.toLowerCase))
      case a: Attribute if sOut.contains(a) => Some((false, a.name.toLowerCase))
      case _                                => None
    }
    val onEquated: Set[(String, String)] =
      joinNode.condition.toSeq.flatMap(conjuncts).collect {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r) =>
          (sideName(l), sideName(r))
        case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(l, r) =>
          (sideName(l), sideName(r))
      }.collect {
        case (Some((true, tn)), Some((false, sn))) => (tn, sn)
        case (Some((false, sn)), Some((true, tn))) => (tn, sn)
      }.toSet
    // a same-name value can only be the TARGET's own attribute (a true
    // identity regardless of ON) when the source has no column of that
    // name — e.g. `SET id = id` in NOT MATCHED BY SOURCE clauses
    val sourceColNames = joinNode.right.output.map(_.name.toLowerCase).toSet
    val rewritten =
      (merge.matchedActions ++ merge.notMatchedBySourceActions).flatMap {
        case UpdateAction(_, as, _) =>
          as.flatMap { a =>
            val k = GraftSqlUtils.keyName(a.key).toLowerCase
            val sameName = a.value match {
              case u: UnresolvedAttribute => u.nameParts.last.toLowerCase == k
              case at: Attribute          => at.name.toLowerCase == k
              case _                      => false
            }
            // only assignments requireAssignable guards (record key /
            // partition under a non-global index) ever reach a require —
            // passing a non-guarded name through `rewritten` is harmless
            if (sameName && (!sourceColNames.contains(k) || onEquated((k, k))))
              None
            else Some(k)
          }
        case _: UpdateStarAction =>
          // star-update assigns the record key from its same-named source
          // column — the identity argument needs the same ON check. Only
          // the KEY is guarded here: star-merges onto partitioned tables
          // conventionally carry the partition column through unchanged
          // (the hand-expanded same-name shape), and flagging it would
          // reject every established `SET *` on a non-global index.
          rel.table.config.recordKeyFields
            .map(_.toLowerCase).filterNot(k => onEquated((k, k)))
        case _ => Seq.empty
      }.toSet
    GraftSqlUtils.requireAssignable(rel, rewritten, "MERGE ... UPDATE SET")

    val tAttrs = joinNode.left.output.filterNot(_.name == TMark)
    val sAttrs = joinNode.right.output.filterNot(_.name == SMark)
    val tMarkAttr = joinNode.left.output.find(_.name == TMark).get
    val sMarkAttr = joinNode.right.output.find(_.name == SMark).get
    val sByName = sAttrs.map(a => a.name.toLowerCase -> a).toMap

    val tPresent = Shims.column(tMarkAttr).isNotNull
    val sPresent = Shims.column(sMarkAttr).isNotNull
    val matchedC = tPresent && sPresent
    val notMatchedC = sPresent && !tPresent
    val nmbsC = tPresent && !sPresent

    def guard(group: Column, c: Option[Expression]): Column =
      c.map(e => group && Shims.column(e)).getOrElse(group)
    def starFromSource(t: Attribute): Column =
      sByName.get(t.name.toLowerCase)
        .map(s => Shims.column(s).cast(t.dataType))
        .getOrElse(sys.error(s"MERGE ... *: source has no column '${t.name}'"))
    def fromAssignments(as: Seq[Assignment], t: Attribute, dflt: Column): Column = {
      val m = as.map(a => GraftSqlUtils.keyName(a.key).toLowerCase -> a.value).toMap
      m.get(t.name.toLowerCase)
        .map(e => Shims.column(e).cast(t.dataType)).getOrElse(dflt)
    }

    // (row guard, op, value of target column t under this action)
    // op: "u" upsert the computed row | "d" delete the target key
    val actions: Seq[(Column, String, Attribute => Column)] =
      merge.matchedActions.map {
        case UpdateAction(c, as, _) =>
          (guard(matchedC, c), "u",
            (t: Attribute) => fromAssignments(as, t, Shims.column(t)))
        case _: UpdateStarAction =>
          (matchedC, "u", starFromSource _)
        case DeleteAction(c) =>
          (guard(matchedC, c), "d", (t: Attribute) => Shims.column(t))
        case other => sys.error(s"unsupported WHEN MATCHED action: $other")
      } ++ merge.notMatchedActions.map {
        case InsertAction(c, as) =>
          (guard(notMatchedC, c), "u",
            (t: Attribute) => fromAssignments(as, t, lit(null).cast(t.dataType)))
        case _: InsertStarAction =>
          (notMatchedC, "u", starFromSource _)
        case other => sys.error(s"unsupported WHEN NOT MATCHED action: $other")
      } ++ merge.notMatchedBySourceActions.map {
        case UpdateAction(c, as, _) =>
          (guard(nmbsC, c), "u",
            (t: Attribute) => fromAssignments(as, t, Shims.column(t)))
        case DeleteAction(c) =>
          (guard(nmbsC, c), "d", (t: Attribute) => Shims.column(t))
        case other => sys.error(s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
      }

    // first matching action wins (SQL MERGE order semantics)
    val opCol = actions.foldRight(lit(null).cast("string")) {
      case ((g, op, _), els) => when(g, lit(op)).otherwise(els)
    }
    val valueCols = tAttrs.map { t =>
      actions.foldRight(Shims.column(t)) {
        case ((g, _, v), els) => when(g, v(t)).otherwise(els)
      }.as(t.name)
    }

    val result = jdf
      .select(valueCols :+ opCol.as(OpCol): _*)
      .filter(col(OpCol).isNotNull)
      .withColumn(DelCol, col(OpCol) === "d")
      .drop(OpCol)

    new GraftWriteClient(rel.table, rel.writeConfig).mergeWrite(result, DelCol)
    Seq.empty
  }
}
