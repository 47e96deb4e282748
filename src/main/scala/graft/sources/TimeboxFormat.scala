package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("timebox")` — the DataSource V2 facade over the
  * [[TimeboxStore]] block layout, the engine-shaped public read API
  * matching the reference's read surface (timebox.py:102-123 read with
  * the roadmap's range + tag-subset reads). The table presents the
  * DECODED point schema (series_id, ts_us, seq, one LONG column per
  * stored tag); a plain `.filter(...)` is all a user writes, and the
  * ScanBuilder routes the predicates into the store's existing skip
  * machinery:
  *
  *   - `ts_us` bounds     → day-partition pruning on block `day_id`
  *                          (+ `start_us` cut), [[TimeboxStore.rangeRead]]'s rule;
  *   - `series_id` =/IN   → block-level series pruning;
  *   - tag range bounds   → ZONE-MAP skip on the per-block
  *                          `min_/max_` envelopes;
  *   - tag equality       → zone map + per-block DICTIONARY membership
  *                          (exact for low-cardinality tags) + the
  *                          256-bit/2-hash BLOOM bit tests —
  *                          [[TimeboxStore.rangeReadValueEquals]]'s composition;
  *   - column pruning     → only the requested tags' offset arrays are
  *                          decoded.
  *
  * Block-level skipping is INEXACT by design (like parquet row-group
  * stats), so every pushed filter is also returned as a post-scan
  * filter and Spark re-applies it to the decoded rows — pruning is
  * pure I/O savings, never a correctness surface. The Scan implements
  * [[org.apache.spark.sql.connector.read.V1Scan]] (the bridge Spark's
  * own JDBC V2 source uses), so the inner pipeline stays the existing
  * Catalyst [[TimeboxStore.decode]] — codegen'd expressions, not a
  * hand-rolled row reader — and `explain` shows the scan with its
  * PushedFilters like any file source.
  */
class TimeboxDataSource
    extends TableProvider
    with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {
  override def shortName(): String = "timebox"

  // ---- streaming WRITE to a raw block store --------------------------
  // `df.writeStream.format("timebox").start(path)` — see
  // [[TimeboxStreamSink]]. Append-only (blocks are immutable, exactly
  // the file-sink contract); versioned roots write through
  // SnapshotCatalog.commit, same rule as the batch write door.
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode
  ): org.apache.spark.sql.execution.streaming.Sink = {
    val path = pathFromParams(parameters)
    require(
      partitionColumns.isEmpty,
      "timebox sink: partitionBy is not supported — blocks cluster by (series, day) internally"
    )
    require(
      outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"timebox sink: only Append output mode lands immutable blocks (got $outputMode)"
    )
    // commit markers are NAMESPACED per query: two streams into one
    // store (or a restart under a FRESH checkpoint, whose batchIds
    // restart at 0) must never see each other's markers and silently
    // drop batches. The checkpoint location IS the query identity —
    // replays of the same query resume the same namespace; without a
    // user checkpoint there is nothing durable to resume, so a random
    // namespace keeps the landing correct (at-least-once, like every
    // temp-checkpoint stream).
    val ns = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("checkpointLocation") => v }
      .map(TimeboxStreamSink.namespaceOf)
      .getOrElse(java.util.UUID.randomUUID().toString.replace("-", "").take(8))
    // a snapshot-catalog root streams through VERSION COMMITS (one per
    // micro-batch — what makes a stream-written store stream-READABLE,
    // since the streaming source tails the commit log); a raw root
    // lands plain block files unless option("commitVersions", "true")
    // asks for a catalog from the first batch
    val isCatalog = java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path, "commits"))
    val wantCommits = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("commitVersions") => v.toBoolean }
      .getOrElse(false)
    if (isCatalog || wantCommits) new TimeboxCatalogStreamSink(sqlContext.sparkSession, path, ns)
    else new TimeboxStreamSink(sqlContext.sparkSession, path, ns)
  }

  // ---- streaming READ of a versioned store ---------------------------
  // `spark.readStream.format("timebox").load(root)` serves each
  // committed snapshot version as it appears in the catalog's commit
  // log — the 24/7 face of the batch CDC diff (ts_store_cdc): offsets
  // ARE catalog versions, a micro-batch decodes exactly the delta
  // snapshots in (start, end], and every row carries its
  // commit_version. Implemented as a V1 streaming Source (the
  // getBatch-returns-a-DataFrame API) so the per-batch pipeline IS the
  // existing Catalyst decode — no hand-rolled row reader, same reason
  // the batch scan rides V1Scan. Spark routes readStream here because
  // the V2 table does not advertise MICRO_BATCH_READ.

  private def pathFromParams(parameters: Map[String, String]): String =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }.getOrElse(
      throw new IllegalArgumentException("timebox: a catalog root is required — spark.readStream.format(\"timebox\").load(root)")
    )

  // `option("startingVersion", v)`: the stream's first micro-batch
  // begins at catalog version v instead of 1 — the CDC-consumer door
  // for readers that already hold a snapshot through v−1 (the same
  // contract the asOf option gives the batch read door, aimed
  // forward). Only the FIRST offset is affected; a checkpointed
  // restart resumes from the checkpoint as always.
  private def startingVersionOf(parameters: Map[String, String]): Option[Long] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("startingVersion") => v }.map { v =>
      val n =
        try v.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"timebox: option startingVersion must be a version number, got '$v'"
            )
        }
      if (n < 1)
        throw new IllegalArgumentException(s"timebox: startingVersion must be >= 1, got $n")
      n
    }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]
  ): (String, StructType) =
    (shortName(), TimeboxStreamSource.streamSchema(sqlContext.sparkSession, pathFromParams(parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]
  ): org.apache.spark.sql.execution.streaming.Source =
    new TimeboxStreamSource(
      sqlContext.sparkSession,
      pathFromParams(parameters),
      startingVersionOf(parameters).map(_ - 1L).getOrElse(0L)
    )

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("timebox: a store path is required — spark.read.format(\"timebox\").load(path)")
    )

  private def asOfOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("asOf")).map { v =>
      try v.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"timebox: option asOf must be a version number, got '$v'")
      }
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TimeboxFormat.pointSchema(
      SparkSession.active,
      TimeboxFormat.resolveDataPaths(pathOf(options), asOfOf(options))
    )

  // writes carry the query's own (point-schema) columns — Spark hands
  // them to getTable directly instead of inferring from a store that
  // may not exist yet
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new TimeboxTable(pathOf(opts), TimeboxFormat.resolveDataPaths(pathOf(opts), asOfOf(opts)), schema, asOfOf(opts))
  }
}

private[sources] class TimeboxTable(
    path: String,
    dataPaths: Seq[String],
    schema0: StructType,
    asOf: Option[Long] = None
) extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  override def name(): String = s"timebox:$path"

  /** (store path, resolved data paths, asOf) — what the MERGE command
    * needs to route DML the same way the DELETE door does.
    */
  private[sources] def dmlInfo: (String, Seq[String], Option[Long]) = (path, dataPaths, asOf)

  // ---- SQL DML: `DELETE FROM t WHERE tag = v` -------------------------
  // The predicate-delete operator (TimeboxStore.deleteWhereEqualsAll —
  // blocks whose dictionary/bloom/zone map PROVE the conjunction
  // unsatisfiable pass through encoded and byte-identical; only
  // candidate blocks decode, drop, re-encode) surfaced through Spark's
  // row-level-delete door, so a SQL-only user owns the GDPR purge
  // without a library import. AND-ed tag equalities run as ONE
  // conjunction pass (a point dies iff it matches every conjunct — the
  // SupportsDelete contract; per-filter passes would purge the UNION);
  // anything else is declined loudly at canDeleteWhere so Spark reports
  // "cannot delete" instead of silently over- or under-deleting.
  private def tagEq(f: Filter): Option[(String, Long)] = f match {
    case EqualTo(t, v: java.lang.Number) if TimeboxFormat.tagFields(schema0)(t) => Some(t -> v.longValue)
    case _                                                                      => None
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    // DML mutates the PRESENT: a time-travel relation (asOf) is a
    // read-only view of history and declines
    asOf.isEmpty && filters.nonEmpty && filters.forall(tagEq(_).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(asOf.isEmpty, s"timebox: cannot DELETE through a time-travel (asOf) read of $path")
    val spark = SparkSession.active
    val eqs = filters.toSeq.map(f =>
      tagEq(f).getOrElse(
        throw new IllegalArgumentException(s"timebox DELETE supports tag-equality predicates only, got $f")
      )
    )
    if (dataPaths != Seq(path)) { deleteWhereVersioned(spark, eqs); return }
    TimeboxFormat.rewriteRawStore(spark, path)(store =>
      TimeboxStore.deleteWhereEqualsAll(store, eqs, TimeboxFormat.tagsOf(store.schema))
    )
  }

  /** DELETE on a snapshot-catalog root = a VERSION COMMIT, the store's
    * own atomicity machinery doing what the raw path's staged swap only
    * approximates: the skip structures pick the candidate FILES (any
    * block the dictionaries/blooms/zone maps cannot clear), ONLY those
    * files' blocks decode-drop-re-encode into the new snapshot, and the
    * commit names the originals in its `removed` list. Cost is O(delta)
    * — untouched files are never read past their block metadata, never
    * rewritten; readers race-free resolve v_n or v_n+1 (the hard-link
    * CAS); and every older version still time-travels to the
    * pre-delete state (`option("asOf", v)`).
    */
  private def deleteWhereVersioned(spark: SparkSession, eqs: Seq[(String, Long)]): Unit = {
    val head = spark.read.parquet(dataPaths: _*)
    val tagCols = TimeboxFormat.tagsOf(head.schema)
    val candFiles = head
      .filter(TimeboxStore.mayMatchExpr(eqs))
      .select(input_file_name().as("f"))
      .distinct()
      .collect()
      .map(r => new java.net.URI(r.getString(0)).getPath)
      .toSeq
      .sorted
    if (candFiles.isEmpty) return // skip-proven no-op: nothing to commit
    val survivors = TimeboxStore.deleteWhereEqualsAll(
      spark.read.parquet(candFiles: _*), eqs, tagCols
    )
    SnapshotCatalog.commit(
      spark, TimeboxFormat.osPath(path),
      p => survivors.write.parquet(p),
      removed = candFiles
    ): Unit
  }

  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    // BATCH_WRITE admits the write at the DataFrameWriter.save() gate;
    // V1_BATCH_WRITE is what the planner checks before routing a
    // V1Write through the InsertableRelation fallback execs — without
    // it the V2 exec calls toBatch and dies
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE
    )
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // startingVersion is a STREAMING-only option (consumed by
    // createSource; the streaming reader passes through getTable too,
    // so the guard lives here on the batch-scan path only): a batch
    // relation would otherwise silently ignore it and serve the full
    // store — fail loudly like every other invalid option
    if (options.containsKey("startingVersion"))
      throw new IllegalArgumentException(
        "timebox: startingVersion is a streaming read option (spark.readStream) — a batch " +
          "read always serves a full snapshot; use option(\"asOf\", v) to read an older version"
      )
    new TimeboxScanBuilder(dataPaths, schema0)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // a versioned root's write door IS SnapshotCatalog.commit: INSERT
    // INTO lands as a delta version, INSERT OVERWRITE as a version
    // whose removed list supersedes every current file — never an
    // in-place write that would mutate a committed snapshot. DML on a
    // time-travel (asOf) relation declines: history is read-only.
    require(asOf.isEmpty, s"timebox: cannot write through a time-travel (asOf) read of $path")
    new TimeboxWriteBuilder(path, isCatalog = dataPaths != Seq(path), info)
  }
}

/** `df.write.format("timebox").save(path)` — the write half of the
  * facade, completing the reference's public API pair (timebox.py
  * write/read). Input is the POINT schema the read side produces
  * (`series_id`, `ts_us`, `seq`, one LONG column per tag), so
  * read-transform-write round-trips compose without renaming. The
  * write is the existing [[TimeboxStore.encode]] Catalyst pipeline
  * (one subset-key-clustered shuffle to (series, day) block grain,
  * then codegen'd mode selection / delta packing), reached through the
  * V1Write ↔ InsertableRelation bridge — the same bridge the scan side
  * uses, so no hand-rolled row writer exists on either path.
  * `mode("append")` lays down additional block files (blocks are
  * self-contained; readers union them), `mode("overwrite")` truncates
  * the store directory first.
  */
private[sources] class TimeboxWriteBuilder(path: String, isCatalog: Boolean, info: LogicalWriteInfo)
    extends WriteBuilder
    with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        val tagCols = TimeboxFormat.validatePointSchema(data.schema)
        val blocks = TimeboxStore.encode(data, "series_id", "ts_us", "seq", tagCols)
        val wipe = truncateFirst || overwrite
        if (isCatalog) {
          // append = a delta version; overwrite = a version superseding
          // every currently-live file (still time-travelable below it)
          val root = TimeboxFormat.osPath(path)
          val removed =
            if (!wipe) Nil
            else SnapshotCatalog.manifests(root).flatMap(m => SnapshotCatalog.dataFilesOf(m.path))
          SnapshotCatalog.commit(
            data.sparkSession, root,
            p => blocks.write.parquet(p),
            removed = removed
          ): Unit
        } else {
          blocks.write.mode(if (wipe) "overwrite" else "append").parquet(path)
        }
      }
    }
  }
}

/** `df.writeStream.format("timebox").start()` — the STREAMING write
  * half, completing batch + stream + SQL symmetry on the write door
  * (the read door got all three in earlier rounds; the reference's
  * write surface is timebox.py:123). Each micro-batch runs the same
  * Catalyst encode pipeline the batch writer uses and lands as new
  * self-contained block files — and delivery is EXACTLY-ONCE over the
  * engine's at-least-once replays: a batch's blocks land under
  * batchId-deterministic file names via stage-and-rename, a commit
  * marker (`_stream_commits/<batchId>`) is written last, and a replay
  * either skips (marker present) or clears the partial landing and
  * re-lands it byte-identically. The drained store is therefore equal
  * to the one-shot batch write of the same rows — the shared oracle.
  * Fragmentation from micro-batch boundaries is the store's normal
  * aging ([[TimeboxStore.compactFragmented]] is the counterpart).
  */
private[graft] class TimeboxStreamSink(spark: SparkSession, path: String, ns: String)
    extends org.apache.spark.sql.execution.streaming.Sink {
  import org.apache.hadoop.fs.Path

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$path/${TimeboxStreamSink.CommitsDir}/$ns-$batchId")
    if (fs.exists(marker)) return // replayed batch, already landed
    val tagCols = TimeboxFormat.validatePointSchema(data.schema)
    val staging = s"$path/_staging_sink_$ns-$batchId"
    TimeboxStore
      .encode(org.apache.spark.sql.graftshim.GraftShims.batchFrame(data), "series_id", "ts_us", "seq", tagCols)
      .write.mode("overwrite").parquet(staging)
    // clear a crashed attempt's partial landing, then land this batch's
    // blocks under deterministic names — the replay-idempotence anchor
    for (f <- fs.globStatus(new Path(s"$path/b$ns-$batchId-*.parquet")))
      fs.delete(f.getPath, false): Unit
    val parts = fs.listStatus(new Path(staging))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
    for ((f, i) <- parts.zipWithIndex)
      fs.rename(f.getPath, new Path(s"$path/b$ns-$batchId-$i.parquet")): Unit
    fs.delete(new Path(staging), true): Unit
    fs.mkdirs(new Path(s"$path/${TimeboxStreamSink.CommitsDir}")): Unit
    fs.create(marker, true).close()
  }

  override def toString: String = s"TimeboxStreamSink[$path:$ns]"
}

/** The VERSION-COMMITTING streaming sink: each micro-batch encodes
  * through the same Catalyst pipeline and lands as one
  * [[SnapshotCatalog]] commit — so a stream-written store is
  * immediately stream-READABLE (the streaming source tails the commit
  * log) and time-travelable, closing the last store-to-store streaming
  * gap. Exactly-once over replays WITHOUT side markers: the snapshot
  * directory name is batch-deterministic (`stream-<ns>-<batchId>`), so
  * a replayed batch is recognized from the manifest itself before any
  * work, and a crashed attempt (dir written, commit marker never
  * claimed) is simply overwritten by the replay — the hard-link CAS
  * means a version listed is a version fully committed.
  */
private[graft] class TimeboxCatalogStreamSink(spark: SparkSession, root: String, ns: String)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val tag = s"stream-$ns-$batchId"
    if (SnapshotCatalog.manifests(root).exists(_.path.endsWith(s"/data/$tag"))) return // replayed
    val tagCols = TimeboxFormat.validatePointSchema(data.schema)
    val batch = org.apache.spark.sql.graftshim.GraftShims.batchFrame(data)
    SnapshotCatalog.commit(
      spark,
      root,
      p => TimeboxStore.encode(batch, "series_id", "ts_us", "seq", tagCols).write.mode("overwrite").parquet(p),
      snapName = Some(tag)
    ): Unit
  }

  override def toString: String = s"TimeboxCatalogStreamSink[$root:$ns]"
}

private[graft] object TimeboxStreamSink {
  val CommitsDir = "_stream_commits"

  /** Query identity → marker namespace: 8 hex chars of the checkpoint
    * location's digest (the checkpoint is the only durable thing a
    * restarted query shares with its past self).
    */
  def namespaceOf(checkpointLocation: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(checkpointLocation.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)

  private val Landed = "^b([0-9a-f]{8})-(\\d+)-\\d+\\.parquet$".r
  private val LandedLegacy = "^b(\\d+)-\\d+\\.parquet$".r

  /** Sink-landed block file name → its commit-marker key (None for
    * batch-written block files). Understands the pre-namespace layout
    * so purges on stores landed by older builds stay correct.
    */
  def batchKeyOf(fileName: String): Option[String] = fileName match {
    case Landed(n, b)    => Some(s"$n-$b")
    case LandedLegacy(b) => Some(b)
    case _               => None
  }
}

private[sources] class TimeboxScanBuilder(paths: Seq[String], full: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private val tags = TimeboxFormat.tagFields(full)
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[TimeboxFormat.PushedAgg] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(TimeboxFormat.handles(_, tags))
    // block skipping is inexact — EVERY filter is re-applied post-scan
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  // AGGREGATE pushdown — the store's defining read path surfaced
  // through the public format: COUNT/SUM/MIN/MAX (optionally grouped
  // by series_id) are answered from block METADATA + the closed-form
  // mode algebra (TimeboxStore.blockSumExpr) with no point ever
  // decoded. Complete pushdown only: Spark hands aggregates to the
  // source only when every filter was fully pushed, and this source
  // deliberately reports all filters as post-scan (block skipping is
  // inexact), so the pushdown fires exactly on the filterless
  // "all metrics per series" dashboard shape — where it is exact.
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    TimeboxFormat.translateAgg(agg, tags).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    TimeboxFormat.translateAgg(agg, tags) match {
      case some @ Some(pa) =>
        pushedAgg = some
        required = TimeboxFormat.aggSchema(pa)
        true
      case None => false
    }

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (pushedAgg.isEmpty) required = requiredSchema
  override def build(): Scan = new TimeboxV1Scan(paths, required, pushed, pushedAgg)
}

private[sources] class TimeboxV1Scan(
    paths: Seq[String],
    required: StructType,
    filters: Array[Filter],
    agg: Option[TimeboxFormat.PushedAgg]
) extends V1Scan {
  override def readSchema(): StructType = required
  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
    new TimeboxRelation(context, paths, required, filters, agg).asInstanceOf[T]
}

private[sources] class TimeboxRelation(
    ctx: SQLContext,
    paths: Seq[String],
    required: StructType,
    filters: Array[Filter],
    agg: Option[TimeboxFormat.PushedAgg]
) extends BaseRelation
    with TableScan {
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = required
  override def buildScan(): RDD[Row] = agg match {
    case Some(pa) => TimeboxFormat.aggScanDataFrame(ctx.sparkSession, paths, pa).rdd
    case None     => TimeboxFormat.scanDataFrame(ctx.sparkSession, paths, required, filters).rdd
  }
}

/** The V1 streaming Source over a [[SnapshotCatalog]] root: offsets are
  * catalog versions (a LongOffset of the committed head), and
  * `getBatch(lo, hi)` decodes the UNION of delta snapshots with
  * version in (lo, hi] — each row stamped with its `commit_version`.
  * Per-batch cost is the DELTA only (one manifest read + the new
  * snapshots' blocks); the catalog's immutable-commit protocol means a
  * version listed is fully written, so a micro-batch can never observe
  * a half-committed snapshot. Restart replays from the checkpointed
  * version offset — exactly-once delivery of every committed version.
  */
private[sources] class TimeboxStreamSource(spark: SparkSession, root: String, floorVersion: Long = 0L)
    extends org.apache.spark.sql.execution.streaming.Source {
  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}

  // tag layout is fixed at stream start from the first committed
  // snapshot (schema evolution mid-stream = restart the query, the
  // file-stream convention)
  private val tagCols: Seq[String] = TimeboxStreamSource.tagColsOf(spark, root)

  override val schema: StructType = TimeboxStreamSource.streamSchema(spark, root)

  override def getOffset: Option[V1Offset] = {
    val v = SnapshotCatalog.currentVersion(root)
    if (v <= 0L) None else Some(LongOffset(v))
  }

  private def ver(o: V1Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other               => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    // no prior offset = first batch: begin after the startingVersion
    // floor (0 = serve from version 1, the default)
    val (lo, hi) = (start.map(ver).getOrElse(floorVersion), ver(end))
    val ms = SnapshotCatalog.manifests(root).filter(m => m.version > lo && m.version <= hi)
    val ordered = schema.fieldNames.toIndexedSeq.map(col)
    val out = ms
      .map(m =>
        TimeboxStore
          .decode(spark.read.parquet(m.path), tagCols)
          .withColumn("commit_version", lit(m.version))
          .select(ordered: _*)
      )
      .reduceOption(_ unionByName _)
      .getOrElse(
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      )
    org.apache.spark.sql.graftshim.GraftShims.streamingFrame(out)
  }

  override def stop(): Unit = ()
}

private[sources] object TimeboxStreamSource {
  private def tagColsOf(spark: SparkSession, root: String): Seq[String] = {
    val ms = SnapshotCatalog.manifests(root)
    require(
      ms.nonEmpty,
      s"timebox streaming read: no committed snapshot under $root — commit version 1 before starting the stream"
    )
    TimeboxFormat.tagsOf(spark.read.parquet(ms.head.path).schema)
  }

  /** Point schema + the provenance column every served row carries. */
  def streamSchema(spark: SparkSession, root: String): StructType =
    StructType(
      Seq(
        StructField("series_id", LongType),
        StructField("ts_us", LongType),
        StructField("seq", LongType)
      ) ++ tagColsOf(spark, root).map(t => StructField(t, LongType))
        :+ StructField("commit_version", LongType)
    )
}

object TimeboxFormat {

  /** Resolve a `.load(path)` + optional `asOf` version to the concrete
    * block-store directories the scan reads — the TIME-TRAVEL door on
    * the public format (the reference's read surface is "open the
    * store, get the data", timebox.py:102-123; versioned reads ride
    * the same call with one option):
    *
    *   - `path` is a [[SnapshotCatalog]] root (has `commits/`):
    *     state(v) = the UNION of committed delta snapshots with
    *     version ≤ v (the log-structured add-files composition the
    *     catalog commits). `asOf` absent = the current head. Cost is
    *     one manifest resolution — O(1) metadata in store size.
    *   - `path` is a raw block store: `asOf` is an error (nothing is
    *     versioned there), the path itself is the data.
    */
  /** `CREATE TABLE ... LOCATION` hands the provider a `file:` URI where
    * `.load(path)` hands a plain path — normalize before any java.nio
    * catalog-structure check (Paths.get on a URI string never matches).
    */
  private[sources] def osPath(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  private[graft] def resolveDataPaths(path: String, asOf: Option[Long]): Seq[String] = {
    val root = osPath(path)
    val isCatalog = java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, "commits"))
    if (!isCatalog) recoverSwap(path) // heal a crashed DELETE swap before any read resolves
    (isCatalog, asOf) match {
      case (false, None) => Seq(path)
      case (false, Some(v)) =>
        throw new IllegalArgumentException(
          s"timebox: option asOf=$v given but $path has no snapshot catalog (commits/) — only versioned roots time-travel"
        )
      case (true, _) =>
        val all = SnapshotCatalog.manifests(root)
        val upTo = asOf.fold(all)(v => all.filter(_.version <= v))
        require(
          upTo.nonEmpty,
          s"timebox: no committed snapshot${asOf.fold("")(v => s" at or below version $v")} under $path" +
            asOf.fold("")(_ => " (expired by retention, or never committed)")
        )
        // append-only history: the snapshot DIRS compose by union (one
        // resolution, no file listing). Any delete/rewrite commit in
        // range forces the FILE-granular composition: every data file
        // of every snapshot ≤ v, minus the files removed by ≤ v —
        // older versions' untouched files keep serving newer states,
        // and an asOf below the delete never sees its removals.
        val removed = upTo.flatMap(_.removed).toSet
        if (removed.isEmpty) upTo.map(_.path)
        else {
          val files = upTo.flatMap(m => SnapshotCatalog.dataFilesOf(m.path)).filterNot(removed)
          require(files.nonEmpty, s"timebox: state at ${asOf.getOrElse("head")} has no data files under $path")
          files
        }
    }
  }

  /** The crash-recovery marker of a DELETE's staged swap: present means
    * "staging is fully materialized; the swap may be anywhere between
    * not-started and done". Written AFTER the staging write completes,
    * removed after the rename lands — so its presence makes staging the
    * single source of truth.
    */
  private[sources] def swapMarker(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"${path}__delete_swap")

  /** Finish a crashed DELETE swap. Decision table (marker present):
    *   - staging exists  → the destination is suspect (the crash may
    *     have landed mid-`delete(dst)` — a partially-deleted store);
    *     clear whatever remains of dst, rename staging into place,
    *     clear the marker. Staging is complete by the marker protocol.
    *   - staging missing → the rename landed; only the marker-clear was
    *     lost. Clear it.
    * No marker → nothing to do. Idempotent; any reader may run it.
    */
  private[graft] def recoverSwap(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path)
  }

  private[graft] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val marker = swapMarker(path)
    if (!fs.exists(marker)) return
    val staging = new org.apache.hadoop.fs.Path(s"${path}__delete_staging")
    val dst = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(staging)) {
      fs.delete(dst, true): Unit
      require(fs.rename(staging, dst), s"timebox DELETE recovery: could not swap $staging into place")
    }
    fs.delete(marker, false): Unit
  }

  /** Whole-store rewrite of a RAW block store (the DML shape shared by
    * SQL DELETE and SQL MERGE): the store is both source and sink, so
    * the rewritten blocks materialize to a staging sibling and the
    * directories swap. The swap is crash-RECOVERABLE (not atomic — a
    * raw store has no snapshot log; the versioned root is the door for
    * stores that need one): a `__delete_swap` marker written only after
    * staging is fully materialized names the staging dir, and
    * [[recoverSwap]] on the read path finishes the swap from any crash
    * point. Streaming sidecar state survives (committed batch markers
    * must keep suppressing replays), and uncommitted partial landings
    * are purged BEFORE the rewrite — the sink re-lands them
    * byte-identically on replay, but folding them into anonymous
    * rewritten blocks would lose the b-names the replay-clear keys on
    * and duplicate their points.
    */
  private[sources] def rewriteRawStore(spark: SparkSession, path: String)(
      rewrite: DataFrame => DataFrame
  ): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path) // finish any crashed predecessor first
    purgeUncommittedLandings(fs, path)
    val blocks = rewrite(spark.read.parquet(path))
    val staging = new Path(s"${path}__delete_staging")
    fs.delete(staging, true): Unit
    blocks.write.mode("overwrite").parquet(staging.toString)
    val commits = new Path(dst, TimeboxStreamSink.CommitsDir)
    if (fs.exists(commits))
      org.apache.hadoop.fs.FileUtil.copy(
        fs, commits, fs, new Path(staging, TimeboxStreamSink.CommitsDir),
        false, spark.sparkContext.hadoopConfiguration
      ): Unit
    val marker = swapMarker(path)
    val out = fs.create(marker, true)
    out.write(staging.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    fs.delete(dst, true): Unit
    require(fs.rename(staging, dst), s"timebox DML rewrite: could not swap $staging into place")
    fs.delete(marker, false): Unit
  }

  /** Remove sink block files whose batch never committed (no marker
    * under `_stream_commits`) — a crashed micro-batch's partial
    * landing. Safe by the sink's replay contract: the batch re-lands
    * byte-identically when the stream resumes.
    */
  private[sources] def purgeUncommittedLandings(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(dir)) return
    val landed = fs.listStatus(dir).filter(_.isFile).flatMap { f =>
      TimeboxStreamSink.batchKeyOf(f.getPath.getName).map(f.getPath -> _)
    }
    for ((file, key) <- landed)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/${TimeboxStreamSink.CommitsDir}/$key")))
        fs.delete(file, false): Unit
  }

  /** A translated aggregate-pushdown request: optional series group,
    * then one block-computable aggregate per output position.
    */
  private[graft] sealed trait AggCol
  private[graft] case object CountAll extends AggCol
  private[graft] final case class SumTag(t: String) extends AggCol
  private[graft] final case class MinTag(t: String) extends AggCol
  private[graft] final case class MaxTag(t: String) extends AggCol
  private[graft] case object MinTs extends AggCol
  private[graft] case object MaxTs extends AggCol
  private[graft] final case class PushedAgg(bySeries: Boolean, cols: Seq[AggCol])

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case n: NamedReference if n.fieldNames.length == 1 => Some(n.fieldNames.head)
      case _                                             => None
    }

  /** Translate Spark's pushed Aggregation into block-computable form;
    * None = not answerable from block metadata, Spark keeps the plan.
    */
  private[graft] def translateAgg(agg: Aggregation, tags: Set[String]): Option[PushedAgg] = {
    val bySeries = agg.groupByExpressions() match {
      case Array()                                      => Some(false)
      case Array(g) if fieldOf(g).contains("series_id") => Some(true)
      case _                                            => None
    }
    val cols = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(CountAll)
      // every decoded point column is non-null by construction, so
      // count(col) == count(*) == Σ n_points
      case c: Count if !c.isDistinct && fieldOf(c.column).isDefined => Some(CountAll)
      case s: Sum if !s.isDistinct =>
        fieldOf(s.column).filter(tags).map(SumTag)
      case m: Min =>
        fieldOf(m.column).flatMap {
          case "ts_us"        => Some(MinTs)
          case t if tags(t)   => Some(MinTag(t))
          case _              => None
        }
      case m: Max =>
        fieldOf(m.column).flatMap {
          case "ts_us"        => Some(MaxTs)
          case t if tags(t)   => Some(MaxTag(t))
          case _              => None
        }
      case _ => None
    }
    val flat = cols.flatten
    bySeries.flatMap { bs =>
      if (flat.length == cols.length && flat.nonEmpty) Some(PushedAgg(bs, flat)) else None
    }
  }

  /** The aggregated scan's output schema: group columns first, then
    * one LONG per aggregate, positionally matching the Aggregation.
    */
  private[graft] def aggSchema(pa: PushedAgg): StructType =
    StructType(
      (if (pa.bySeries) Seq(StructField("series_id", LongType)) else Nil) ++
        pa.cols.zipWithIndex.map { case (_, i) => StructField(s"agg_$i", LongType) }
    )

  /** The pushed-aggregate pipeline: per-block closed forms (count =
    * n_points, sum = the mode algebra, min/max = zone maps, ts bounds
    * = start_us and start_us + Σdeltas·unit) folded into one block-row
    * aggregation — no posexplode, no window, no point materialization.
    */
  private[graft] def aggScanDataFrame(spark: SparkSession, path: String, pa: PushedAgg): DataFrame =
    aggScanDataFrame(spark, Seq(path), pa)

  private[graft] def aggScanDataFrame(spark: SparkSession, paths: Seq[String], pa: PushedAgg): DataFrame = {
    val store = spark.read.parquet(paths: _*)
    def blockExpr(c: AggCol): org.apache.spark.sql.Column = c match {
      case CountAll  => col("n_points")
      case SumTag(t) => TimeboxStore.blockSumExpr(t)
      case MinTag(t) => col(s"min_$t")
      case MaxTag(t) => col(s"max_$t")
      case MinTs     => col("start_us")
      case MaxTs     => col("start_us") + expr("aggregate(deltas, 0L, (a, x) -> a + x)") * col("unit_us")
    }
    def finalAgg(c: AggCol, i: Int): org.apache.spark.sql.Column = (c match {
      // count over an empty (or fully-pruned) store is 0, never null
      case CountAll           => coalesce(sum(col(s"b_$i")), lit(0L))
      case SumTag(_)          => sum(col(s"b_$i"))
      case MinTag(_) | MinTs  => min(col(s"b_$i"))
      case MaxTag(_) | MaxTs  => max(col(s"b_$i"))
    }).as(s"agg_$i")
    val withB = pa.cols.zipWithIndex.foldLeft(store) { case (df, (c, i)) =>
      df.withColumn(s"b_$i", blockExpr(c))
    }
    val aggs = pa.cols.zipWithIndex.map { case (c, i) => finalAgg(c, i) }
    if (pa.bySeries) withB.groupBy(col("series_id")).agg(aggs.head, aggs.tail: _*)
    else withB.agg(aggs.head, aggs.tail: _*)
  }

  /** Point-schema contract shared by every write door (batch V1Write,
    * SQL INSERT, streaming sink): LONG coordinates, ≥1 LONG tag.
    * Returns the tag columns.
    */
  private[sources] def validatePointSchema(schema: StructType): Seq[String] = {
    val cols = schema.fields.map(f => f.name -> f.dataType).toMap
    for (c <- Seq("series_id", "ts_us", "seq"))
      require(
        cols.get(c).contains(LongType),
        s"timebox write: point schema requires LONG column '$c' (got ${cols.get(c).getOrElse("nothing")})"
      )
    val tagCols = schema.fieldNames.filterNot(Set("series_id", "ts_us", "seq")).toSeq
    require(tagCols.nonEmpty, "timebox write: at least one tag column is required")
    tagCols.foreach(t =>
      require(cols(t) == LongType, s"timebox write: tag column '$t' must be LONG (got ${cols(t)})")
    )
    tagCols
  }

  /** Tag names off a block schema: every stored `offs_<tag>` column. */
  private[sources] def tagsOf(blockSchema: StructType): Seq[String] =
    blockSchema.fieldNames.toIndexedSeq.filter(_.startsWith("offs_")).map(_.stripPrefix("offs_"))

  private[sources] def tagFields(pointSchema: StructType): Set[String] =
    pointSchema.fieldNames.toSet -- Set("series_id", "ts_us", "seq")

  /** The decoded point schema a store presents: fixed coordinates plus
    * one LONG column per tag, derived from the block layout's own
    * column names (one driver-side schema read, no data scan).
    */
  def pointSchema(spark: SparkSession, path: String): StructType = pointSchema(spark, Seq(path))

  def pointSchema(spark: SparkSession, paths: Seq[String]): StructType =
    StructType(
      Seq(
        StructField("series_id", LongType),
        StructField("ts_us", LongType),
        StructField("seq", LongType)
      ) ++ tagsOf(spark.read.parquet(paths: _*).schema).map(t => StructField(t, LongType))
    )

  private def longOf(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue)
    case _                   => None
  }

  /** Structural test: can this filter drive block-level skipping? */
  private[graft] def handles(f: Filter, tags: Set[String]): Boolean = f match {
    case GreaterThan("ts_us", v)         => longOf(v).isDefined
    case GreaterThanOrEqual("ts_us", v)  => longOf(v).isDefined
    case LessThan("ts_us", v)            => longOf(v).isDefined
    case LessThanOrEqual("ts_us", v)     => longOf(v).isDefined
    case EqualTo("ts_us", v)             => longOf(v).isDefined
    case EqualTo("series_id", v)         => longOf(v).isDefined
    case In("series_id", vs)             => vs.nonEmpty && vs.forall(longOf(_).isDefined)
    case GreaterThan(t, v)               => tags(t) && longOf(v).isDefined
    case GreaterThanOrEqual(t, v)        => tags(t) && longOf(v).isDefined
    case LessThan(t, v)                  => tags(t) && longOf(v).isDefined
    case LessThanOrEqual(t, v)           => tags(t) && longOf(v).isDefined
    case EqualTo(t, v)                   => tags(t) && longOf(v).isDefined
    case _                               => false
  }

  /** One pushed filter → one block-level skip predicate (None = the
    * filter cannot prune blocks and only runs post-scan).
    */
  private def blockPred(f: Filter, tags: Set[String], blockUs: Long): Option[org.apache.spark.sql.Column] = {
    // epoch-us timestamps are non-negative; integral day math below
    // assumes it, so negative bounds simply skip pruning
    def dayLo(lo: Long) = if (lo >= 0) Some(col("day_id") >= lo / blockUs) else None
    def dayHi(hiEx: Long) =
      if (hiEx >= 1) Some(col("day_id") <= (hiEx - 1) / blockUs && col("start_us") < hiEx) else None
    def bloomBit(t: String, v: Long, seed: String) = expr(
      s"(element_at(bloom_$t, CAST(pmod(xxhash64('$seed', ${v}L), 256) DIV 64 AS INT) + 1)" +
        s" & shiftleft(1L, CAST(pmod(xxhash64('$seed', ${v}L), 256) % 64 AS INT))) != 0L"
    )
    f match {
      case GreaterThanOrEqual("ts_us", v) => longOf(v).flatMap(dayLo)
      case GreaterThan("ts_us", v)        => longOf(v).flatMap(a => dayLo(a + 1))
      case LessThan("ts_us", v)           => longOf(v).flatMap(dayHi)
      case LessThanOrEqual("ts_us", v)    => longOf(v).flatMap(b => dayHi(b + 1))
      case EqualTo("ts_us", v) =>
        longOf(v).flatMap(a => for (l <- dayLo(a); h <- dayHi(a + 1)) yield l && h)
      case EqualTo("series_id", v) => longOf(v).map(col("series_id") === _)
      case In("series_id", vs) =>
        val ls = vs.flatMap(longOf)
        if (ls.length == vs.length && ls.nonEmpty) Some(col("series_id").isin(ls: _*)) else None
      case GreaterThanOrEqual(t, v) if tags(t) => longOf(v).map(col(s"max_$t") >= _)
      case GreaterThan(t, v) if tags(t)        => longOf(v).map(col(s"max_$t") > _)
      case LessThanOrEqual(t, v) if tags(t)    => longOf(v).map(col(s"min_$t") <= _)
      case LessThan(t, v) if tags(t)           => longOf(v).map(col(s"min_$t") < _)
      case EqualTo(t, v) if tags(t) =>
        longOf(v).map { x =>
          col(s"min_$t") <= x && col(s"max_$t") >= x &&
          (col(s"dict_$t").isNull || array_contains(col(s"dict_$t"), lit(x))) &&
          bloomBit(t, x, "b1") && bloomBit(t, x, "b2")
        }
      case _ => None
    }
  }

  /** The facade's inner pipeline: block scan with every translatable
    * predicate applied as a skip filter, then the existing Catalyst
    * [[TimeboxStore.decode]] restricted to the REQUIRED tags, projected
    * to the required column order. Residual point-level filtering is
    * Spark's (every filter was returned post-scan).
    */
  private[graft] def scanDataFrame(
      spark: SparkSession,
      path: String,
      required: StructType,
      filters: Array[Filter]
  ): DataFrame = scanDataFrame(spark, Seq(path), required, filters)

  private[graft] def scanDataFrame(
      spark: SparkSession,
      paths: Seq[String],
      required: StructType,
      filters: Array[Filter]
  ): DataFrame = {
    val store = spark.read.parquet(paths: _*)
    val allTags = tagsOf(store.schema)
    val tagSet = allTags.toSet
    val blockUs = TimeboxStore.storedBlockUs(store)
    val blocks = filters.flatMap(blockPred(_, tagSet, blockUs)).foldLeft(store)(_ filter _)
    val neededTags = allTags.filter(required.fieldNames.contains(_))
    val decoded = TimeboxStore.decode(blocks, neededTags)
    decoded.select(required.fieldNames.toIndexedSeq.map(col): _*)
  }
}
