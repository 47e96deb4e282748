package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment,
  InsertAction,
  LogicalPlan,
  MergeIntoTable,
  UpdateAction
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** `MERGE INTO t USING s ON ... WHEN MATCHED THEN UPDATE SET * WHEN NOT
  * MATCHED THEN INSERT *` on a timebox table — the SQL face of the
  * store's upsert (the write half of the lifecycle stopped at
  * INSERT/DELETE for SQL-only users; backfill went library-only
  * through [[TimeboxStore.upsertBlocks]] / ts_store_merge).
  *
  * Spark's own MERGE door (SupportsRowLevelOperations) hands the merged
  * rows to a row-level DataWriter — which would mean re-implementing
  * the block encode imperatively inside a writer factory, against the
  * engine's no-hand-rolled-writers rule (encode is one Catalyst
  * pipeline with a clustering shuffle). Instead a post-hoc resolution
  * rule (injected by [[graft.expressions.GraftExtensions]]) intercepts
  * the RESOLVED MergeIntoTable over a timebox relation and replaces it
  * with a command that runs the existing declarative upsert:
  *
  *   - supported shape: ON t.series_id = s.series_id AND t.seq = s.seq
  *     (the store's point identity), one unconditional
  *     `WHEN MATCHED THEN UPDATE SET *`, one unconditional
  *     `WHEN NOT MATCHED THEN INSERT *` — exactly upsert semantics
  *     (source wins on conflict, new identities append). Anything else
  *     declines loudly at analysis, never silently mis-merges.
  *   - raw root: untouched blocks pass through encoded (the
  *     [[TimeboxStore.upsertBlocks]] anti-join), the store swaps via
  *     the crash-recoverable staged-swap protocol DML shares
  *     ([[TimeboxFormat.rewriteRawStore]]).
  *   - catalog root: the merge lands as a VERSION COMMIT — candidate
  *     files are those holding a touched (series, day) block, only
  *     they decode/merge/re-encode into the new snapshot, the manifest
  *     removes the originals; cost O(delta), old versions untouched.
  *
  * Reference surface: timebox.py:57-88 (decode→merge→rewrite update
  * path) lifted to the one SQL door every warehouse user owns.
  */
private[graft] case class TimeboxMergeRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def sameNameEq(cond: Expression, target: LogicalPlan, source: LogicalPlan): Option[Set[String]] = {
    val tOut = target.outputSet
    val sOut = source.outputSet
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case other                                               => Seq(other)
    }
    val pairs = split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) && a.name == b.name =>
        Some(a.name)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sOut.contains(a) && tOut.contains(b) && a.name == b.name =>
        Some(a.name)
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten.toSet) else None
  }

  /** Every assignment copies the same-named source column into the
    * target column (the SET * / INSERT * expansion), covering the whole
    * target row.
    */
  private def identityAssignments(
      as: Seq[Assignment],
      targetCols: Seq[Attribute],
      source: LogicalPlan
  ): Boolean = {
    val sOut = source.outputSet
    as.length == targetCols.length && as.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        sOut.contains(v) && k.name == v.name
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved =>
      EliminateSubqueryAliases(m.targetTable) match {
        case r: DataSourceV2Relation if r.table.isInstanceOf[TimeboxTable] =>
          val tbl = r.table.asInstanceOf[TimeboxTable]
          val (path, dataPaths, asOf) = tbl.dmlInfo
          def unsupported(why: String): Nothing =
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "_LEGACY_ERROR_TEMP_0035",
              messageParameters = Map(
                "message" -> (s"timebox MERGE supports only the upsert shape (ON t.series_id = s.series_id " +
                  s"AND t.seq = s.seq, one WHEN MATCHED THEN UPDATE SET *, one WHEN NOT MATCHED THEN INSERT *): $why")
              )
            )
          if (asOf.nonEmpty) unsupported("cannot MERGE into a time-travel (asOf) read")
          val keys = sameNameEq(m.mergeCondition, r, m.sourceTable)
            .getOrElse(unsupported(s"condition must be same-name column equalities, got ${m.mergeCondition.sql}"))
          if (keys != Set("series_id", "seq"))
            unsupported(s"condition must match on exactly (series_id, seq), got ${keys.mkString(", ")}")
          m.matchedActions match {
            case Seq(UpdateAction(None, as, _)) if identityAssignments(as, r.output, m.sourceTable) => ()
            case _ => unsupported("matched clause must be a single unconditional UPDATE SET *")
          }
          m.notMatchedActions match {
            case Seq(InsertAction(None, as)) if identityAssignments(as, r.output, m.sourceTable) => ()
            case _ => unsupported("not-matched clause must be a single unconditional INSERT *")
          }
          if (m.notMatchedBySourceActions.nonEmpty)
            unsupported("WHEN NOT MATCHED BY SOURCE is not supported")
          TimeboxMergeCommand(path, dataPaths, m.sourceTable)
        case _ => m
      }
  }
}

/** The executed half: source rows are the upsert's new points; the
  * store rewrites through the same machinery the library doors use.
  */
private[graft] case class TimeboxMergeCommand(
    path: String,
    dataPaths: Seq[String],
    source: LogicalPlan
) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val src0 = org.apache.spark.sql.graftshim.GraftShims.frameOf(session, source)
    val srcTags = TimeboxFormat.validatePointSchema(src0.schema)
    val head = session.read.parquet(dataPaths: _*)
    val storeTags = TimeboxFormat.tagsOf(head.schema)
    require(
      srcTags.toSet == storeTags.toSet,
      s"timebox MERGE: source tag columns (${srcTags.sorted.mkString(", ")}) must match the " +
        s"store's (${storeTags.sorted.mkString(", ")})"
    )
    val src = src0.select((Seq("series_id", "ts_us", "seq") ++ storeTags).map(col): _*)
    if (dataPaths == Seq(path)) {
      TimeboxFormat.rewriteRawStore(session, path)(store =>
        TimeboxStore.upsertBlocks(store, src, storeTags)
      )
    } else {
      // version commit: only files holding a touched (series, day)
      // block rewrite; the rest of the store is never read past its
      // block metadata and stays referenced by the old manifests
      val blockUs = TimeboxStore.storedBlockUs(head)
      val keys = src
        .select(col("series_id"), expr(s"ts_us DIV ${blockUs}L").as("day_id"))
        .distinct()
      val candFiles = head
        .withColumn("__f", input_file_name())
        .join(keys, Seq("series_id", "day_id"), "left_semi")
        .select(col("__f"))
        .distinct()
        .collect()
        .map(r => new java.net.URI(r.getString(0)).getPath)
        .toSeq
        .sorted
      val merged =
        if (candFiles.isEmpty)
          TimeboxStore.encode(src, "series_id", "ts_us", "seq", storeTags, blockUs)
        else
          TimeboxStore.upsertBlocks(session.read.parquet(candFiles: _*), src, storeTags)
      SnapshotCatalog.commit(
        session,
        TimeboxFormat.osPath(path),
        p => merged.write.parquet(p),
        removed = candFiles
      ): Unit
    }
    Seq.empty
  }
}
