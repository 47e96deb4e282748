package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted GRAPH tiers — the edge tables the graph_* analytics read
  * instead of rebuilding their graph in-query.
  *
  * Two graphs back the nine graph analytics:
  *
  *   - the NEAR-DUP CANDIDATE graph (MinHash-LSH pairs over the
  *     `documents` corpus) — the [[SignatureStore]]'s `edges/` tier,
  *     built once at ingest ([[SignatureStore.writeEdges]]) and
  *     maintained incrementally per batch ([[SignatureStore.appendRelabel]],
  *     exercised end-to-end by the `dedup_edge_tier` query);
  *   - the part CO-PURCHASE graph (parts sharing an order in
  *     `lineitem`) — one order-key self-join, materialized once.
  *
  * At 100 TB the build joins ARE the cost of the job: a dashboard that
  * re-runs shingle→minhash→band per query (or the lineitem self-join
  * per query) pays the whole ingest pipeline every refresh. This
  * object is the read door: `ensure*` builds a tier at most once per
  * process per corpus dir (production would point at the store the
  * ingest pipeline already maintains), and the accessors serve plain
  * parquet scans — GraphTierSpec proves the analytics run with the
  * raw corpus DELETED, i.e. the edge table is their only corpus-scale
  * input.
  *
  * The tier location deliberately ignores `graft.scratch.percall`
  * (see [[TimeboxStore.sharedScratchPath]]): percall isolates
  * per-query FIXTURE builds from each other; a shared input tier is
  * the opposite — rebuilding it per call is exactly the per-query
  * recompute the tier exists to kill.
  */
object GraphTier {

  // bounded + validated (ProcessMemo): a long-lived service pointing at
  // many corpus dirs caps at 64 remembered tiers, and a tier whose
  // directory vanished (external cleanup, corpus swap) is REBUILT on
  // the next call, never served as a dangling path
  private val ready = new ProcessMemo[String, String](64)

  /** Build-at-most-once gate. ProcessMemo holds its lock across the
    * build (a concurrent second caller waits, then reads) — builds are
    * rare, per-process, and the waiters would otherwise race the same
    * overwrite. Cached only after `build` returns, so a failed build
    * retries on the next call (writes are overwrite-mode).
    */
  private def ensure(path: String)(build: => Unit): String =
    ready.getOrElseUpdate(path, p => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p))) {
      build
      path
    }

  /** Content fingerprint of a built tier: the max mtime over its
    * top-level entries (stamp files included — every rebuild/append
    * re-stamps). One directory listing; used to key derived memos
    * (the louvain run) so a rebuilt tier invalidates them.
    */
  private[graft] def tierFingerprint(path: String): Long = {
    val d = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(d)) return -1L
    val s = java.nio.file.Files.list(d)
    try {
      var m = java.nio.file.Files.getLastModifiedTime(d).toMillis
      val it = s.iterator()
      while (it.hasNext) {
        val t = java.nio.file.Files.getLastModifiedTime(it.next()).toMillis
        if (t > m) m = t
      }
      m
    } finally s.close()
  }

  // ---- near-dup candidate graph (documents corpus) -------------------

  def lshTierPath(dir: String): String =
    TimeboxStore.sharedScratchPath("graft_graphtier", dir)

  /** Full-corpus signature store with its `edges/` candidate tier —
    * the rep-level LSH pair set (`doc_a < doc_b`, distinct), identical
    * by construction to [[graft.operators.Dedup.lshRepPairsFromNormed]]
    * over the exact-collapsed corpus (same collapse, same signature
    * family, same band join, same bucket cap — GraphTierSpec asserts
    * the equality). Labels are NOT built here: the graph analytics
    * derive their own community structure; they only need edges.
    */
  def ensureLshTier(spark: SparkSession, dir: String): String =
    ensure(lshTierPath(dir)) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      SignatureStore.write(spark, docs, lshTierPath(dir))
      SignatureStore.writeEdges(spark, lshTierPath(dir))
    }

  /** Rep-level candidate edges (doc_a < doc_b, distinct) off the tier. */
  def repEdges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${ensureLshTier(spark, dir)}/edges")

  /** Member-level candidate pairs off the tier — the same output
    * contract as [[graft.operators.Dedup.minhashLsh]] (cross-group
    * pairs through groups, within-group pairs for banded reps), with
    * zero band joins at read time.
    */
  def memberEdges(spark: SparkSession, dir: String): DataFrame =
    SignatureStore.readEdges(spark, ensureLshTier(spark, dir))

  // ---- part co-purchase graph (lineitem) -----------------------------

  def coPurchasePath(dir: String): String =
    TimeboxStore.sharedScratchPath("graft_copurchase", dir)

  /** DIRECTED co-purchase edges (src, dst): distinct part pairs
    * sharing an order, both directions, src ≠ dst — the edge list
    * graph_part_rank / graph_khop / graph_kcore /
    * graph_common_neighbors previously each rebuilt with the same
    * order-key self-join. The join shuffles on l_orderkey once at
    * build; per-order fan-out is |parts-per-order|², bounded by order
    * size, never corpus².
    */
  def ensureCoPurchaseTier(spark: SparkSession, dir: String): String =
    ensure(coPurchasePath(dir)) {
      writeCoPurchase(Tables.lineitem(spark, dir), coPurchasePath(dir))
    }

  def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    readCoPurchase(spark, ensureCoPurchaseTier(spark, dir))

  // ---- co-purchase tier: incremental maintenance --------------------
  //
  // The edge_tier discipline applied to the relational graph: a batch
  // of NEW orders contributes co-purchase pairs only WITHIN its own
  // orders (an order's item set ships complete — pairs never span
  // orders), so the delta self-join is |batch| × per-order-fanout and
  // old orders never recompute. Unlike the LSH tier, a delta pair can
  // ALREADY exist (two parts co-bought in an old order and again in a
  // new one), so the append anti-joins the delta against the stored
  // tier — and because Spark can never broadcast the RIGHT side of a
  // LeftAnti build, a flat tier would make that probe shuffle the
  // ENTIRE store per batch, O(store) maintenance. The tier therefore
  // rides the [[SignatureStore]] leveled layout: `edges/` is
  // prefix-partitioned by `pmod(src, 16^l)` ([[SignatureStore.chooseL]]
  // picks l, flat below the prune threshold where partition fan-out
  // would only add overhead), and the append probe prunes to the
  // DELTA's src prefixes at file-listing time
  // ([[SignatureStore.prunedScan]]) — O(batch) store bytes per batch,
  // the same discipline measured flat across an 11× signature store.
  // Equality with the from-scratch self-join over the full table is
  // the graft_copurchase_tier query's oracle; GraphTierSpec pins the
  // leveled append against the flat rebuild.

  /** Full build from a (l_orderkey, l_partkey) pair frame. `dirRows`
    * is the edge-rows-per-partition-dir target the leveler sizes
    * against ([[SignatureStore.DefaultDirRows]] in production; tests
    * pass a tiny value to force leveling at toy scale).
    */
  def writeCoPurchase(li: DataFrame, path: String, dirRows: Long = SignatureStore.DefaultDirRows): Unit = {
    val edges = coEdgesOf(li).localCheckpoint() // pinned: counted, then written
    val n = edges.count()
    val l = SignatureStore.chooseL(n, dirRows)
    SignatureStore.stampLayout(edges.sparkSession, path, l, n, dirRows)
    SignatureStore.writeTable(edges, path, "edges", l, "sp", SignatureStore.idPrefix(col("src"), l))
  }

  /** Append a batch of COMPLETE new orders: within-batch pairs,
    * deduped against the stored tier through a probe pruned to the
    * delta's src prefixes, land as ONE flat L0 run — never a per-batch
    * fan-out write. Measured at toy scale: a partitioned write costs
    * ~12 ms per touched dir regardless of row count (parquet writer
    * open + commit rename), so per-batch prefix-dir appends are
    * O(batch-prefixes) file operations every batch — the LSM answer is
    * an L0: batches land as single sorted runs, and [[foldL0]] folds
    * accumulated runs into the leveled dirs in bulk once they pass the
    * dir-size target, amortizing the fan-out over many batches. Probes
    * union the prefix-pruned leveled tier with the (bounded) L0, so
    * per-batch maintenance reads O(batch prefixes × dir size + L0) —
    * never O(store). L0 rows are globally distinct by construction:
    * each batch anti-joins against leveled ∪ L0 before landing.
    */
  def appendCoPurchase(spark: SparkSession, liDelta: DataFrame, path: String): Unit = {
    recoverFold(spark, path)
    val lay = SignatureStore.readLayoutInfo(spark, path)
    val delta = coEdgesOf(liDelta).localCheckpoint() // batch-sized pin
    val pl = if (lay.prune) lay.l else 0
    val stored = storedEdges(spark, path, pl, SignatureStore.prefixesOf(delta, SignatureStore.idPrefix(col("src"), pl)))
    val fresh = delta.join(stored, Seq("src", "dst"), "left_anti")
    if (lay.l == 0) fresh.write.mode("append").parquet(s"$path/edges")
    else {
      // one sorted run per batch (the batch is small by definition)
      fresh.coalesce(1).write.mode("append").parquet(l0Path(path))
      // advisory only — over-counting (dup pairs in the delta) errs
      // toward keeping the prune on, which is correctness-neutral
      SignatureStore.bumpLayoutRows(spark, path, delta.count())
      maybeFold(spark, path, lay)
    }
  }

  def readCoPurchase(spark: SparkSession, path: String): DataFrame = {
    recoverFold(spark, path)
    storedEdges(spark, path, 0, Seq.empty) // pl=0: full leveled scan ∪ L0
  }

  /** The stored edge set a probe (or full read) sees: the leveled
    * table — prefix-pruned to the batch when `pl > 0` — unioned with
    * the flat L0 runs.
    */
  private def storedEdges(spark: SparkSession, path: String, pl: Int, prefixes: => Seq[String]): DataFrame = {
    val leveled = SignatureStore
      .prunedScan(spark, path, "edges", pl, "sp", prefixes)
      .select(col("src"), col("dst"))
    val l0 = l0DataFiles(spark, path)
    if (l0.isEmpty) leveled
    else leveled.unionByName(spark.read.parquet(l0: _*).select(col("src"), col("dst")))
  }

  private def l0Path(path: String): String = s"$path/edges_l0"
  private def foldMarkerPath(path: String) = new org.apache.hadoop.fs.Path(s"$path/_fold")

  /** The L0 runs' data files (empty when no L0 exists — e.g. right
    * after a fold, when only `_SUCCESS` leftovers remain).
    */
  private def l0DataFiles(spark: SparkSession, path: String): Seq[String] = {
    val l0 = new org.apache.hadoop.fs.Path(l0Path(path))
    val fs = l0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(l0)) Seq.empty
    else fs.listStatus(l0)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
      .toIndexedSeq
  }

  /** Fold the L0 runs into the leveled dirs once they pass the
    * dir-size target — one fan-out write amortized over every batch
    * since the last fold.
    */
  private def maybeFold(spark: SparkSession, path: String, lay: SignatureStore.Layout): Unit = {
    val l0 = l0DataFiles(spark, path)
    if (l0.nonEmpty && spark.read.parquet(l0: _*).count() > lay.dirRows)
      foldL0(spark, path, lay)
  }

  /** CRASH-SAFE fold protocol (the duplicate-edge hazard: L0 rows are
    * already deduped against the leveled tier, so a half-renamed fold
    * that leaves L0 in place would double those pairs — unlike the
    * ledger's semi-join probes, edge readers require exact
    * distinctness):
    *
    *   1. stage the L0 rows prefix-partitioned under `_staging_fold_*`
    *      (a crash here leaves an invisible orphan);
    *   2. write the `_fold` marker naming the staging dir and the L0
    *      files it covers — the commit point;
    *   3. rename staged files into the leveled dirs, delete the L0
    *      files, drop marker + staging.
    *
    * Every append/read first runs [[recoverFold]]: a surviving marker
    * means step 3 was interrupted — renames resume (a staged file
    * already moved is simply gone from staging), the covered L0 files
    * are deleted, and the tier is exact again. `crashAfterMarker` is
    * the test hook that stops at the commit point.
    */
  private[graft] def foldL0(spark: SparkSession, path: String, lay: SignatureStore.Layout, crashAfterMarker: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = l0DataFiles(spark, path)
    if (files.isEmpty) return
    val staging = s"$path/_staging_fold_${java.util.UUID.randomUUID().toString.take(12)}"
    spark.read.parquet(files.toIndexedSeq: _*)
      .withColumn("sp", SignatureStore.idPrefix(col("src"), lay.l))
      .repartition(col("sp"))
      .write.partitionBy("sp").mode("overwrite").parquet(staging)
    val marker = foldMarkerPath(path)
    val out = fs.create(marker, true)
    try out.write((staging + "\n" + files.mkString("\n")).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (crashAfterMarker) return
    completeFold(spark, path)
  }

  /** Complete a committed fold: idempotent, resumable at any point. */
  private[graft] def recoverFold(spark: SparkSession, path: String): Unit = {
    val fs = foldMarkerPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(foldMarkerPath(path))) completeFold(spark, path)
  }

  private def completeFold(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val marker = foldMarkerPath(path)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = new Array[Byte](fs.getFileStatus(marker).getLen.toInt)
    val in = fs.open(marker)
    try in.readFully(0, buf)
    finally in.close()
    val lines = new String(buf, java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    val (staging, files) = (lines.head, lines.tail)
    val stg = new Path(staging)
    if (fs.exists(stg)) {
      for (d <- fs.listStatus(stg) if d.isDirectory) {
        val dst = new Path(s"$path/edges/${d.getPath.getName}")
        if (!fs.exists(dst)) fs.mkdirs(dst)
        for (f <- fs.listStatus(d.getPath) if !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          fs.rename(f.getPath, new Path(dst, f.getPath.getName)): Unit
      }
    }
    for (f <- files) { val p = new Path(f); if (fs.exists(p)) fs.delete(p, false): Unit }
    // drop the L0 dir once no runs remain (runs appended after the
    // marker — impossible mid-batch, possible before a delayed
    // recovery — keep theirs)
    val l0 = new Path(l0Path(path))
    if (fs.exists(l0) && l0DataFiles(spark, path).isEmpty) fs.delete(l0, true): Unit
    if (fs.exists(stg)) fs.delete(stg, true): Unit
    fs.delete(marker, false): Unit
  }

  /** The directed distinct co-purchase edge list of an order-item
    * frame — the one self-join, shuffled on the order key.
    */
  private def coEdgesOf(li: DataFrame): DataFrame = {
    val d = li.select(col("l_orderkey"), col("l_partkey")).distinct()
    val b = d.select(col("l_orderkey").as("ok"), col("l_partkey").as("dst"))
    d.join(b, col("ok") === col("l_orderkey") && col("l_partkey") =!= col("dst"))
      .select(col("l_partkey").as("src"), col("dst"))
      .distinct()
  }
}
