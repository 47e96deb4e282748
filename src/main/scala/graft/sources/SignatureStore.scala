package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Persisted dedup-signature store: the corpus-side state an
  * incremental dedup pipeline keeps between ingest batches, so a new
  * batch is matched against SIGNATURES on disk instead of re-running
  * the shingle→minhash pipeline over the whole corpus (at 100 TB that
  * recompute IS the cost of the job).
  *
  * Layout (all parquet under one root, each table hive-partitioned on
  * a prefix of its lookup key — see the leveled-layout section):
  *   groups/  (doc_id, rep_id)      every doc → canonical rep of its
  *                                  exact-dup group  [gp = rep_id mod 16^l]
  *   reps/    (rep_id, th)          one row per distinct text, with
  *                                  the md5 content hash  [tp = th prefix]
  *   bands/   (doc_id, band, sig)   MinHash band signatures, REP-LEVEL
  *                                  only (members inherit their rep's)
  *                                  [sp = sig prefix]
  *
  * Rep-level storage is the skew-safe shape from [[Dedup]]: a
  * 10^5-copy boilerplate cluster stores ONE signature row set, and the
  * match join's buckets stay clone-free. Appends are partition-aware
  * parquet appends — each batch adds its new members/reps/bands exactly
  * once, one new file per touched partition dir (LSM-style;
  * [[compactTombstones]] re-levels and folds batch files back down).
  */
object SignatureStore {

  /** Signature-format identity: names the hash family + constants that
    * determine every persisted signature byte (universal-hash 31-bit
    * MinHash slots off one md5 per shingle, band sig = md5 of the
    * ':'-joined decimal slots, b-bits = packed slot low bits). Two
    * format generations NEVER collide — old-format bands match nothing
    * new — so silently appending to a store written under a different
    * family would silently miss every cross-generation near-dup.
    * [[write]] stamps `$$path/_format`; every append/match path
    * verifies it and fails fast on mismatch OR absence (a store from
    * before this marker existed must be rebuilt with [[write]]).
    */
  private[graft] val FormatId: String =
    s"graft-sig-v3 minhash=uhash61-mersenne-split-from-md5 K=${Dedup.K} bands=4x3-md5 bbits=packed-low-bits"

  private def formatMarkerPath(path: String) = new org.apache.hadoop.fs.Path(s"$path/_format")

  private def stampFormat(spark: SparkSession, path: String): Unit = {
    val p = formatMarkerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(FormatId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def requireFormat(spark: SparkSession, path: String): Unit = {
    val p = formatMarkerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"signature store at $path has no _format marker (written before format versioning, " +
          s"or not a signature store) — rebuild it with SignatureStore.write; current format: $FormatId"
      )
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf)
    finally in.close()
    val found = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    if (found != FormatId)
      throw new IllegalStateException(
        s"signature store at $path was written with format [$found] but this build produces " +
          s"[$FormatId] — cross-format signatures never collide, so matching/appending would " +
          "silently miss near-dups; rebuild the store with SignatureStore.write"
      )
  }

  // ---- leveled (prefix-partitioned) layout ---------------------------
  //
  // Every store table is hive-partitioned on a short prefix of its
  // lookup key: bands on the first l hex chars of `sig`, reps on `th`,
  // groups/bbits on rep-id mod 16^l. A delta match only needs the
  // partitions whose prefix appears in the BATCH, so the per-batch
  // store read is |batch prefixes| × dir size — independent of corpus
  // size (the flat layout's per-batch full band-store scan was the one
  // remaining O(store) term in the streaming-dedup loop). l is chosen
  // at build time so dirs stay near a target row count, i.e. dir SIZE
  // is capped and the dir COUNT grows with the corpus — that is what
  // makes per-batch I/O flat at 100 TB, not merely smaller.

  /** Band rows per partition dir the leveler sizes against (~8M rows ≈
    * low hundreds of MB at production row widths). Tests pass a tiny
    * value to force higher levels at toy scale.
    */
  private[graft] val DefaultDirRows = 8L * 1024 * 1024

  /** Smallest prefix length l (1..4) with rows/16^l <= dirRows — or 0
    * (FLAT layout) when the store is too small for pruning to ever
    * engage ([[Layout.prune]] needs rows > 4·dirRows): below that,
    * partitioned writes pay 16^l-dir fan-out on every append/overwrite
    * and the reads never prune, which is pure overhead (the r9
    * write-family regression — dedup_store_delete 2.3x — was exactly
    * this: l=1 stores whose prune flag was false). A flat store that
    * grows past the threshold re-levels at compaction, the LSM moment
    * ([[compactTombstones]] re-chooses l).
    */
  private[graft] def chooseL(rows: Long, dirRows: Long): Int = {
    if (rows <= 4 * dirRows) 0
    else {
      var l = 1
      while (l < 4 && rows / math.pow(16.0, l.toDouble) > dirRows.toDouble) l += 1
      l
    }
  }

  private def layoutMarkerPath(path: String) = new org.apache.hadoop.fs.Path(s"$path/_layout")

  /** Stored layout facts: prefix length, approximate band-row count
    * (advisory — concurrent appends may under-count; compaction
    * re-stamps exactly), and the dir-row target the store was leveled
    * against. Pruning machinery (prefix collects + batch pins) is a
    * fixed per-batch cost, so the match paths only engage it once the
    * store spans a few target dirs — below that the full scan is
    * cheaper than the bookkeeping.
    */
  private[graft] final case class Layout(l: Int, rows: Long, dirRows: Long) {
    def prune: Boolean = l > 0 && rows > 4 * dirRows
  }

  private[graft] def stampLayout(spark: SparkSession, path: String, l: Int, rows: Long, dirRows: Long): Unit = {
    val p = layoutMarkerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"prefix-l=$l rows=$rows dir-rows=$dirRows".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[graft] def readLayoutInfo(spark: SparkSession, path: String): Layout = {
    val p = layoutMarkerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Layout(0, 0L, DefaultDirRows)
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf)
      finally in.close()
      val kv = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
        .split("\\s+").filter(_.contains("=")).map { t => val i = t.indexOf('='); t.take(i) -> t.drop(i + 1) }
        .toMap
      Layout(
        kv.getOrElse("prefix-l", "0").toInt,
        // a marker without a row count (older stamp) conservatively
        // prunes — production correctness over toy-scale speed
        kv.get("rows").map(_.toLong).getOrElse(Long.MaxValue),
        kv.get("dir-rows").map(_.toLong).getOrElse(DefaultDirRows)
      )
    }
  }

  /** Partition-prefix length of the store, 0 = legacy flat layout. */
  private[graft] def readLayout(spark: SparkSession, path: String): Int =
    readLayoutInfo(spark, path).l

  /** Advisory row-count bump after an append (lost updates under
    * concurrent appenders only UNDER-count, which errs toward the
    * full-scan side — never toward wrongly pruning).
    */
  private[graft] def bumpLayoutRows(spark: SparkSession, path: String, added: Long): Unit = {
    val lay = readLayoutInfo(spark, path)
    if (lay.l > 0 && lay.rows != Long.MaxValue)
      stampLayout(spark, path, lay.l, lay.rows + added, lay.dirRows)
  }

  /** Partition value off a hex-key column (md5 sig/th). The 'p' guard
    * keeps partition values typed STRING under schema inference (an
    * all-digit dir set would otherwise infer int and drop zeros).
    */
  private[graft] def hexPrefix(c: Column, l: Int): Column = concat(lit("p"), substring(c, 1, l))

  /** Partition value off a numeric rep/doc id column. */
  private[graft] def idPrefix(c: Column, l: Int): Column = concat(lit("p"), pmod(c, lit(1L << (4 * l))))

  /** The batch side's distinct partition values, collected. Bounded by
    * min(|batch keys|, 16^l) — strictly smaller than the batch itself,
    * which the match join already broadcasts, so the driver pull is
    * safe by the same argument.
    */
  private[graft] def prefixesOf(df: DataFrame, pcol: Column): Seq[String] =
    df.select(pcol.as("p")).distinct().collect().map(_.getString(0)).toIndexedSeq

  /** Partition-pruned scan of a store table: on a leveled store ONLY
    * the batch's prefix DIRS are ever listed or opened — the reader is
    * scoped to those directories (basePath read), so per-batch metadata
    * work is O(batch prefixes), never O(store dirs). (An earlier
    * version read the whole table and filtered on the partition column:
    * data bytes pruned at file-listing time, but the LISTING itself was
    * still a full-store partition discovery — measured at ~8 s per
    * batch on a 4096-dir tier, i.e. O(store) metadata per micro-batch.)
    * The isin filter stays on top as a correctness guard and so the
    * plan shows the prefix set as a PartitionFilter. Falls back to the
    * full scan on legacy flat stores, or when the batch covers most of
    * the prefix space and pruning would only add listing work.
    */
  private[graft] def prunedScan(
      spark: SparkSession,
      path: String,
      table: String,
      l: Int,
      partCol: String,
      prefixes: => Seq[String]
  ): DataFrame = {
    def full = spark.read.parquet(s"$path/$table")
    if (l == 0) full
    else {
      val ps = prefixes
      if (2 * ps.size >= (1 << (4 * l))) full
      else {
        val base = s"$path/$table"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dirs = ps
          .map(p => s"$base/$partCol=$p")
          .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
        if (dirs.isEmpty)
          // no batch prefix has a dir yet: schema-correct empty result
          full.filter(col(partCol).isin(ps: _*)).filter(lit(false))
        else
          spark.read
            .option("basePath", base)
            .parquet(dirs: _*)
            .filter(col(partCol).isin(ps: _*))
      }
    }
  }

  /** Append rows to a leveled table keeping its partitioning (flat
    * append on legacy stores). The pre-write repartition on the
    * partition value keeps each touched dir to one new file per batch.
    *
    * The batch is written partitioned into a FRESH staging dir and its
    * files renamed into the store's prefix dirs (driver-side, one
    * rename per touched dir's files): a direct `mode("append")` into
    * the partitioned table re-resolves the existing relation — a
    * full-store partition discovery per batch (measured ~8 s on a
    * 4096-dir tier), the O(store) metadata cost the leveled layout
    * exists to avoid. Part-file names carry a fresh UUID, so renames
    * never collide; a crash mid-rename leaves a partial batch exactly
    * like a crash mid-commit did before (callers' append paths are
    * replay-idempotent or anti-join-deduped).
    */
  private[graft] def appendTable(df: DataFrame, path: String, table: String, l: Int, partCol: String, pcol: Column): Unit =
    if (l == 0) df.write.mode("append").parquet(s"$path/$table")
    else {
      import org.apache.hadoop.fs.Path
      val spark = df.sparkSession
      val staging = s"$path/_staging_${table}_${java.util.UUID.randomUUID().toString.take(12)}"
      df.withColumn(partCol, pcol)
        .repartition(col(partCol))
        .write.partitionBy(partCol).mode("overwrite").parquet(staging)
      val fs = new Path(staging).getFileSystem(spark.sparkContext.hadoopConfiguration)
      for (d <- fs.listStatus(new Path(staging)) if d.isDirectory) {
        val dst = new Path(s"$path/$table/${d.getPath.getName}")
        if (!fs.exists(dst)) fs.mkdirs(dst)
        for (f <- fs.listStatus(d.getPath) if !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          fs.rename(f.getPath, new Path(dst, f.getPath.getName)): Unit
      }
      fs.delete(new Path(staging), true): Unit
    }

  /** Overwrite-mode twin of [[appendTable]] for the initial build and
    * compaction rewrites: flat single write at l=0, prefix-partitioned
    * (one file per dir — repartition on the partition value) above.
    */
  private[graft] def writeTable(df: DataFrame, path: String, table: String, l: Int, partCol: String, pcol: Column): Unit =
    if (l == 0) df.write.mode("overwrite").parquet(s"$path/$table")
    else
      df.withColumn(partCol, pcol)
        .repartition(col(partCol))
        .write.partitionBy(partCol).mode("overwrite").parquet(s"$path/$table")

  /** Deterministic scratch root for oracle queries (overwrite-mode,
    * keyed by input dir — reused, not leaked, across runs).
    */
  def scratchPath(dir: String): String = TimeboxStore.scratchPath("graft_sigstore", dir)

  /** Shared BASE-STORE template for the incremental/streaming dedup
    * drills: the corpus-side store ([[write]] over docs < splitId)
    * plus its label tier ([[writeLabels]] — ignored by drills that
    * only probe reps/bands/groups), built at most once per process
    * (the cdcAsofFixture discipline). Seven queries previously each
    * re-encoded this exact store per call; each drill's SUBJECT — the
    * per-batch match / append / relabel / takedown path — is what it
    * still computes from scratch. Read-only consumers (matchDelta,
    * matchDeltaScored) take the template path directly; mutating
    * consumers clone it first ([[TimeboxStore.fixtureClone]]).
    */
  private[graft] def baseStoreTemplate(spark: SparkSession, dir: String, splitId: Long): String =
    TimeboxStore.sharedFixture("graft_sigtmpl", dir, s"s$splitId") { path =>
      val docs = Tables
        .documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < splitId)
      write(spark, docs, path)
      writeLabels(spark, path)
    }

  /** Separate scratch root for the incremental-CC drill, so it never
    * collides with [[scratchPath]]'s store when both queries run.
    */
  def ccScratchPath(dir: String): String = TimeboxStore.scratchPath("graft_sigcc", dir)

  /** Scratch root for the b-bit scored-match drill (kept apart from
    * the CC drill, whose store gets delta signatures appended).
    */
  def bbScratchPath(dir: String): String = TimeboxStore.scratchPath("graft_sigbb", dir)

  private def normed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Dedup.normText(col("text")).as("norm"))

  /** Build the store from scratch for a corpus of (doc_id, text).
    * Bands AND the b-bit verification tier (`bbits/ (doc_id, bits)`,
    * K packed low bits per rep — see [[Dedup.bbitsFromSigs]]) derive
    * from ONE signature aggregation over the rep shingles.
    */
  def write(spark: SparkSession, docs: DataFrame, path: String, dirRows: Long = DefaultDirRows): Unit = {
    stampFormat(spark, path)
    val c = Dedup.collapseExact(normed(docs))
    val reps = c.reps.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // level on the band tier (4 rows per banded rep) — the table every
    // micro-batch probes; groups can run larger per dir (it is only
    // probed per MATCHED rep, a much smaller prefix set)
    val nBandRows = 4L * reps.count()
    val l = chooseL(nBandRows, dirRows)
    stampLayout(spark, path, l, nBandRows, dirRows)
    writeTable(c.groups, path, "groups", l, "gp", idPrefix(col("rep_id"), l))
    writeTable(
      reps.select(col("doc_id").as("rep_id"), md5(col("norm")).as("th")),
      path, "reps", l, "tp", hexPrefix(col("th"), l)
    )
    val sigs = Dedup
      .minhashSignaturesOf(reps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    writeTable(Dedup.bandSignaturesFromSigs(sigs), path, "bands", l, "sp", hexPrefix(col("sig"), l))
    writeTable(Dedup.bbitsFromSigs(sigs), path, "bbits", l, "bp", idPrefix(col("doc_id"), l))
    sigs.unpersist()
    reps.unpersist(): Unit
  }

  /** Append a new batch: docs whose content hash matches an existing
    * rep join that group; unseen texts form new groups (canonical =
    * min doc_id per hash within the batch) and contribute new rep +
    * band rows. The store never rewrites existing rows — ingest-order
    * doc ids keep canonical choice stable across append vs rebuild.
    * The `reps` probe for known texts is partition-pruned by the
    * batch's th prefixes (leveled layout), so the append reads
    * O(batch) store bytes, not O(corpus). Returns the batch's FRESH
    * BAND rows (doc_id, band, sig — batch-sized, materialized) so
    * callers maintaining derived tiers ([[appendRelabel]]) can prune
    * their own store probes by the appended signatures without
    * re-deriving anything against the corpus.
    */
  def append(spark: SparkSession, docs: DataFrame, path: String): DataFrame = {
    requireFormat(spark, path)
    val lay = readLayoutInfo(spark, path)
    val l = lay.l
    // prune level: 0 disables the prefix machinery (and its batch
    // pins) on stores small enough that the full scan is cheaper
    val pl = if (lay.prune) l else 0
    // batch-sized pin: feeds the prefix collect, the known join, and
    // the fresh collapse without recomputing normalization
    val nm0 = normed(docs).withColumn("th", md5(col("norm")))
    val nm = if (pl > 0) nm0.localCheckpoint() else nm0
    val reps = prunedScan(spark, path, "reps", pl, "tp", prefixesOf(nm, hexPrefix(col("th"), pl)))
    // the store side streams, the (small) batch broadcasts; `known` is
    // batch-sized, so FRESH derives from it by anti-join — never by
    // broadcasting the store's own hash column (at 100 TB the reps
    // table is corpus-scaled; the batch is the only broadcastable side)
    val known = reps
      .join(broadcast(nm.select(col("doc_id"), col("th"))), Seq("th"))
      .select(col("doc_id"), col("rep_id"))
      .localCheckpoint()
    val fresh = nm.join(broadcast(known.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    val freshC = Dedup.collapseExact(fresh.select(col("doc_id"), col("norm")))
    // batch-sized pins: the four append writes below would otherwise
    // each recompute the batch's normalize+collapse lineage
    val fGroups = freshC.groups.localCheckpoint()
    val fReps = freshC.reps.localCheckpoint()
    appendTable(known.union(fGroups), path, "groups", l, "gp", idPrefix(col("rep_id"), l))
    appendTable(
      fReps.select(col("doc_id").as("rep_id"), md5(col("norm")).as("th")),
      path, "reps", l, "tp", hexPrefix(col("th"), l)
    )
    val sigs = Dedup
      .minhashSignaturesOf(fReps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fBands = Dedup.bandSignaturesFromSigs(sigs).localCheckpoint()
    appendTable(fBands, path, "bands", l, "sp", hexPrefix(col("sig"), l))
    appendTable(Dedup.bbitsFromSigs(sigs), path, "bbits", l, "bp", idPrefix(col("doc_id"), l))
    sigs.unpersist()
    if (l > 0) bumpLayoutRows(spark, path, fBands.count())
    fBands
  }

  /** Bucketed band table: a corpus' rep-level band signatures written
    * as a sig-bucketed, sig-sorted metastore table. Two corpora stored
    * this way match with a CO-LOCATED band join — no exchange on
    * either side — which is the batch-vs-batch shape (contamination
    * audits between two stored corpora) where neither side is small
    * enough to broadcast. The scan IS the shuffle, paid at write time.
    */
  def writeBucketedBands(spark: SparkSession, docs: DataFrame, table: String, buckets: Int = 8): Unit = {
    val c = Dedup.collapseExact(normed(docs))
    Dedup
      .bandSignaturesFromSigs(Dedup.minhashSignaturesOf(c.reps))
      .write.mode("overwrite")
      .bucketBy(buckets, "sig")
      .sortBy("sig")
      .saveAsTable(table)
  }

  /** Rep-level near matches between two bucketed band tables. The join
    * key is exactly the bucket key (sig) — a band signature is the md5
    * of that band's minhash triple, so sig equality alone IS the
    * banded-LSH match (the band index adds nothing) — and both scans
    * come in pre-partitioned, so the join itself needs NO exchange.
    * BucketingSpec asserts the only shuffle left is the final
    * candidate dedup, which is match-sized, not corpus-sized.
    */
  def crossStoreMatches(spark: SparkSession, tableA: String, tableB: String): DataFrame =
    spark
      .table(tableA)
      .select(col("doc_id").as("doc_a"), col("sig"))
      .join(spark.table(tableB).select(col("doc_id").as("doc_b"), col("sig")), Seq("sig"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

  /** N-corpora contamination matrix: pairwise rep-level near-match
    * counts between every pair of bucketed signature stores — the
    * "which of my N ingest feeds leak into each other" audit, where
    * every pairwise join is co-located on the shared bucket layout
    * (no corpus-sized shuffle anywhere; see [[crossStoreMatches]]).
    */
  def contaminationMatrix(spark: SparkSession, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    val pairs = for {
      (a, i) <- tables.zipWithIndex
      b <- tables.drop(i + 1)
    } yield (a, b)
    pairs
      .map { case (a, b) =>
        crossStoreMatches(spark, a, b)
          .agg(count(lit(1)).as("n_pairs"))
          .select(lit(a).as("store_a"), lit(b).as("store_b"), col("n_pairs"))
      }
      .reduce(_ unionByName _)
  }

  /** Rep-level LSH candidate pairs straight off stored band rows — the
    * same capped bucket join [[Dedup.lshRepPairsFrom]] runs, but over
    * the persisted `bands/` table instead of a freshly shingled corpus.
    */
  private def bandPairs(bands: DataFrame): DataFrame = {
    val safe = Dedup.dropOversizedBuckets(bands, Seq("band", "sig"), Dedup.DefaultBucketCap, "sigstore-cc")
    safe
      .as("a")
      .join(
        safe.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Materialize the store's CANDIDATE-EDGE tier: rep-level LSH pairs
    * off the stored bands, persisted as `edges/ (doc_a, doc_b)` —
    * built ONCE at ingest and maintained incrementally by
    * [[appendRelabel]], so the 9 graph_* analytics read a table
    * instead of re-running the band self-join per query (at 100 TB
    * that join IS the cost; here it's paid once per ingest batch,
    * delta-keyed). [[readEdges]] serves the member-level expansion.
    */
  def writeEdges(spark: SparkSession, path: String): Unit = {
    requireFormat(spark, path)
    bandPairs(spark.read.parquet(s"$path/bands")).write.mode("overwrite").parquet(s"$path/edges")
  }

  /** Member-level candidate pairs read OFF the persisted edge tier —
    * the same output contract as [[Dedup.minhashLsh]] (cross-group
    * pairs through live groups, within-group pairs for banded reps,
    * tombstones excluded), with zero band joins at read time.
    */
  def readEdges(spark: SparkSession, path: String): DataFrame = {
    val groups = liveGroups(spark, path)
    val banded = spark.read.parquet(s"$path/bands").select(col("doc_id")).distinct()
    Dedup.expandMemberPairs(spark.read.parquet(s"$path/edges"), groups, banded)
  }

  /** Materialize the store's CLUSTER-LABEL tier: connected components
    * over the persisted edge tier ([[writeEdges]] runs first — labels
    * are DERIVED from edges, which makes edges the primary candidate
    * artifact), persisted as `labels/ (doc_id = rep, cluster_id =
    * component-min rep)`. Built once at ingest time; [[appendRelabel]]
    * maintains BOTH tiers per batch without ever re-running CC (or the
    * band self-join) over the corpus.
    */
  def writeLabels(spark: SparkSession, path: String): Unit = {
    requireFormat(spark, path)
    writeEdges(spark, path)
    Dedup
      .connectedComponents(spark.read.parquet(s"$path/edges"))
      .write.mode("overwrite").parquet(s"$path/labels")
  }

  /** Append a batch AND maintain the label tier incrementally — the
    * scale answer to "a new crawl arrived, refresh the dedup clusters"
    * that does NOT re-run connected components over the corpus:
    *
    *   1. [[append]] the batch (groups/reps/bands grow as usual);
    *   2. DELTA EDGES: the batch's fresh rep bands join the full band
    *      table — every new candidate pair has a new rep on one side,
    *      so the join is delta-keyed, never corpus × corpus;
    *   3. CONTRACT + mini-CC: each existing component is already one
    *      supernode (its stored label), so delta edges map through the
    *      label table and connected components runs on a DELTA-SIZED
    *      graph whose nodes are old labels and new reps. Component
    *      mins stay canonical: an old label IS its component's min doc
    *      id, so the min over merged supernodes is the min over the
    *      merged membership.
    *   4. RELABEL: one corpus-scan join rewrites labels through the
    *      (tiny) old-label → new-label map; new reps take their mini
    *      label. No CC iteration ever touches corpus-sized data.
    *
    * One accepted drift vs from-scratch: a bucket that crosses the
    * oversize cap only AFTER this append stops producing NEW pairs,
    * but pairs it produced in earlier batches keep their edges (a
    * from-scratch run would drop the whole bucket).
    */
  def appendRelabel(spark: SparkSession, docs: DataFrame, path: String): Unit = {
    // append returns the batch's fresh BAND rows (batch-sized,
    // materialized) — the delta side comes from a broadcast join
    // against their rep ids, and the store-side band probe is pruned
    // to the fresh sigs' partition prefixes (a fresh band can only
    // collide inside its own sig partition), so the per-batch read is
    // O(batch prefixes), never the whole band table. Bucket-cap counts
    // over the pruned scan are EXACT for every relevant bucket: a
    // (band, sig) bucket lives wholly in sig's partition.
    val fresh = append(spark, docs, path) // already materialized by append
    val pl = { val lay = readLayoutInfo(spark, path); if (lay.prune) lay.l else 0 }
    val store =
      prunedScan(spark, path, "bands", pl, "sp", prefixesOf(fresh, hexPrefix(col("sig"), pl)))
    val safe = Dedup.dropOversizedBuckets(store, Seq("band", "sig"), Dedup.DefaultBucketCap, "sigstore-cc-delta")
    val freshBands = safe.join(broadcast(fresh.select(col("doc_id")).distinct()), Seq("doc_id"))
    val deltaPairs = freshBands
      .as("a")
      .join(safe.as("b"), col("a.band") === col("b.band") && col("a.sig") === col("b.sig") && col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")
      )
      .distinct()
      // pinned: feeds BOTH the edge-tier append and the mini-CC below
      .localCheckpoint()
    // maintain the candidate-edge tier incrementally: every delta pair
    // has a fresh rep on one side, so append-only keeps edges/ equal to
    // a from-scratch band self-join (old-old pairs never recur)
    if (new java.io.File(s"$path/edges").exists)
      deltaPairs.write.mode("append").parquet(s"$path/edges")
    val old = spark.read.parquet(s"$path/labels").cache()
    old.count()
    // contract: endpoint → its component supernode (label), self if new
    val lab = (side: String) =>
      old.select(col("doc_id").as(side), col("cluster_id").as(s"l_$side"))
    val mini = deltaPairs
      .join(lab("doc_a"), Seq("doc_a"), "left")
      .join(lab("doc_b"), Seq("doc_b"), "left")
      .select(
        coalesce(col("l_doc_a"), col("doc_a")).as("doc_a"),
        coalesce(col("l_doc_b"), col("doc_b")).as("doc_b")
      )
      .filter(col("doc_a") =!= col("doc_b"))
    val miniLabels = Dedup.connectedComponents(mini).cache()
    miniLabels.count()
    val remap = miniLabels.select(col("doc_id").as("node"), col("cluster_id").as("new_label"))
    val relabeledOld = old
      .join(remap, old("cluster_id") === col("node"), "left")
      .select(old("doc_id"), coalesce(col("new_label"), old("cluster_id")).as("cluster_id"))
    // mini nodes with no stored label row are previously-unlabeled reps
    // (batch reps, or corpus reps isolated until now)
    val freshLabels = miniLabels
      .join(old.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
    val staging = s"$path/labels_next"
    relabeledOld.unionByName(freshLabels).write.mode("overwrite").parquet(staging)
    old.unpersist(); miniLabels.unpersist()
    spark.read.parquet(staging).write.mode("overwrite").parquet(s"$path/labels")
  }

  /** Per-doc cluster labels read off the store: star-expand the label
    * tier through `groups/`, plus the lone-group rule (≥2 exact clones
    * of a banded rep with no near-dup partner form their own
    * component) — the same output contract as [[Dedup.clusters]].
    */
  def readClusters(spark: SparkSession, path: String): DataFrame = {
    val groups = liveGroups(spark, path)
    val labels = spark.read.parquet(s"$path/labels")
    val banded = spark.read.parquet(s"$path/bands").select(col("doc_id").as("rep_id")).distinct()
    val lone = groups
      .groupBy(col("rep_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .join(banded, Seq("rep_id"))
      .join(labels.withColumnRenamed("doc_id", "rep_id"), Seq("rep_id"), "left_anti")
      .select(col("rep_id"), col("rep_id").as("cluster_id"))
    groups
      .join(labels.withColumnRenamed("doc_id", "rep_id").unionByName(lone), Seq("rep_id"))
      .select(col("doc_id"), col("cluster_id"))
  }

  /** TAKEDOWN deletes, tier 1 — tombstones: append the doc ids to
    * `deletes/`; every member-expanding read ([[liveGroups]]) filters
    * them out from that moment on. O(|delete batch|) — nothing
    * corpus-sized is touched, which is what a takedown SLA needs at
    * 100 TB. [[compactTombstones]] applies them physically later.
    */
  def tombstone(spark: SparkSession, path: String, del: DataFrame): Unit =
    del.select(col("doc_id")).write.mode("append").parquet(s"$path/deletes")

  /** The groups table with tombstones applied — the membership every
    * match/report read expands through. Without a `deletes/` tier the
    * plan is byte-identical to the raw read (no join is added).
    */
  private def liveGroups(spark: SparkSession, path: String): DataFrame =
    liveGroupsFrom(spark, path, spark.read.parquet(s"$path/groups"))

  /** Tombstone filtering over an arbitrary (possibly partition-pruned)
    * groups scan — pruning and takedown semantics compose: the delete
    * set is small and broadcast, the base scan decides the I/O.
    */
  private def liveGroupsFrom(spark: SparkSession, path: String, g: DataFrame): DataFrame =
    if (!new java.io.File(s"$path/deletes").exists) g
    else g.join(broadcast(spark.read.parquet(s"$path/deletes")), Seq("doc_id"), "left_anti")

  /** TAKEDOWN deletes, tier 2 — physical compaction: rewrite the store
    * with tombstones applied, then drop the tombstone tier. Deleted
    * members leave `groups/`; a group whose REP was deleted promotes
    * its minimum surviving member (the from-scratch canonical rule, so
    * the compacted store is INDISTINGUISHABLE from one built on the
    * live corpus — SignatureStoreSpec pins table-level equality); the
    * promoted rep INHERITS the old rep's th/band/bbit rows with only
    * the id rewritten — members share their rep's normalized text, so
    * re-shingling would recompute byte-identical rows (the zero-
    * recompute property that makes compaction affordable). Fully
    * deleted groups drop their rep/band/bbit rows entirely.
    */
  def compactTombstones(spark: SparkSession, path: String): Unit = {
    if (!new java.io.File(s"$path/deletes").exists) return
    val del = broadcast(spark.read.parquet(s"$path/deletes"))
    val live = spark.read.parquet(s"$path/groups").join(del, Seq("doc_id"), "left_anti")
    val remap = live.groupBy(col("rep_id")).agg(min(col("doc_id")).as("new_rep")).localCheckpoint()
    val staged = Seq(
      "groups" -> live
        .join(remap, Seq("rep_id"))
        .select(col("doc_id"), col("new_rep").as("rep_id")),
      "reps" -> spark.read.parquet(s"$path/reps")
        .join(remap, Seq("rep_id"))
        .select(col("new_rep").as("rep_id"), col("th")),
      "bands" -> spark.read.parquet(s"$path/bands")
        .join(remap.withColumnRenamed("rep_id", "doc_id"), Seq("doc_id"))
        .select(col("new_rep").as("doc_id"), col("band"), col("sig")),
      "bbits" -> spark.read.parquet(s"$path/bbits")
        .join(remap.withColumnRenamed("rep_id", "doc_id"), Seq("doc_id"))
        .select(col("new_rep").as("doc_id"), col("bits"))
    )
    staged.foreach { case (t, df) => df.write.mode("overwrite").parquet(s"$path/${t}_next") }
    // re-level on rewrite: the compacted store may be much smaller (or,
    // after many appends, much bigger) than the layout it inherited —
    // compaction is the LSM moment to re-choose l and fold the
    // per-batch append files back into one file per partition dir
    // same leveling basis as [[write]] (4 band rows per rep), so a
    // compacted store is layout-identical to one built on the live
    // corpus — the spec's table-equality pin includes partition values
    val nBandRows = 4L * spark.read.parquet(s"$path/reps_next").count()
    val l = chooseL(nBandRows, DefaultDirRows)
    val partCols: Map[String, (String, Column)] = Map(
      "groups" -> (("gp", idPrefix(col("rep_id"), l))),
      "reps"   -> (("tp", hexPrefix(col("th"), l))),
      "bands"  -> (("sp", hexPrefix(col("sig"), l))),
      "bbits"  -> (("bp", idPrefix(col("doc_id"), l)))
    )
    staged.foreach { case (t, _) =>
      val (pc, pe) = partCols(t)
      writeTable(spark.read.parquet(s"$path/${t}_next"), path, t, l, pc, pe)
    }
    stampLayout(spark, path, l, nBandRows, DefaultDirRows)
    val dels = new java.io.File(s"$path/deletes")
    dels.listFiles().foreach(f => f.delete(): Unit)
    dels.delete(): Unit
  }

  /** Match an incoming batch against the stored signatures: exact
    * matches via the content hash, near matches via shared LSH band
    * signatures; a pair matched both ways reports 'exact'. The corpus
    * appears ONLY through the store tables — no corpus text is read,
    * let alone re-shingled. The batch is collapsed first, matched at
    * rep level, and matches expand to members on both sides
    * (tombstoned members excluded — [[liveGroups]]).
    */
  def matchDelta(spark: SparkSession, path: String, delta: DataFrame): DataFrame = {
    requireFormat(spark, path)
    val pl = { val lay = readLayoutInfo(spark, path); if (lay.prune) lay.l else 0 }
    val dc = Dedup.collapseExact(normed(delta))
    // batch-sized pins (pruning path only): the prefix collects below
    // would otherwise recompute the batch's normalize/shingle/minhash
    // lineage; on a small store the lazy single-use plans are cheaper
    val dReps0 = dc.reps.withColumn("th", md5(col("norm")))
    val dReps = if (pl > 0) dReps0.localCheckpoint() else dReps0
    val dBands0 = Dedup
      .bandSignaturesFromSigs(Dedup.minhashSignaturesOf(dc.reps))
      .select(col("doc_id").as("d_rep"), col("band"), col("sig"))
    val dBands = if (pl > 0) dBands0.localCheckpoint() else dBands0
    val reps = prunedScan(spark, path, "reps", pl, "tp", prefixesOf(dReps, hexPrefix(col("th"), pl)))
    val bands = prunedScan(spark, path, "bands", pl, "sp", prefixesOf(dBands, hexPrefix(col("sig"), pl)))
    val exact = reps
      .join(broadcast(dReps.select(col("doc_id").as("d_rep"), col("th"))), Seq("th"))
      .select(col("rep_id"), col("d_rep"), lit("exact").as("kind"))
    val near = bands
      .join(broadcast(dBands), Seq("band", "sig"))
      .select(col("doc_id").as("rep_id"), col("d_rep"), lit("near").as("kind"))
      .distinct()
    // two-phase member expansion: pin the (match-sized) rep candidates,
    // then prune the corpus-scale groups scan to the partitions their
    // rep ids can live in
    val cand0 = exact.union(near)
    val cand = if (pl > 0) cand0.localCheckpoint() else cand0
    val groups = liveGroupsFrom(
      spark, path,
      prunedScan(spark, path, "groups", pl, "gp", prefixesOf(cand, idPrefix(col("rep_id"), pl)))
    )
    cand
      .join(groups.select(col("rep_id"), col("doc_id").as("match_doc_id")), Seq("rep_id"))
      .join(dc.groups.select(col("rep_id").as("d_rep"), col("doc_id").as("new_doc_id")), Seq("d_rep"))
      .groupBy(col("new_doc_id"), col("match_doc_id"))
      .agg(min(col("kind")).as("kind"))
  }

  /** [[matchDelta]] + [[append]] fused for the streaming ingest loop:
    * ONE normalization + exact-collapse + shingle/minhash pass over the
    * micro-batch feeds both the match (against the pre-append store)
    * and the append. dedupStream previously called matchDelta then
    * append, paying the batch's signature computation twice per
    * micro-batch — at 24/7 scale that constant is the throughput
    * ceiling, and this halves its batch-proportional part. Match rows
    * are materialized (localCheckpoint) BEFORE any append write, so
    * the match semantics vs the pre-append store are unchanged.
    * Returns the match result ([[matchDelta]]'s exact shape).
    */
  def matchAppend(spark: SparkSession, path: String, delta: DataFrame): DataFrame = {
    requireFormat(spark, path)
    val lay = readLayoutInfo(spark, path)
    val l = lay.l
    val pl = if (lay.prune) l else 0
    val dc = Dedup.collapseExact(normed(delta))
    // batch-sized: pin them eagerly so nothing recomputes after the
    // append mutates the store files
    val dGroups = dc.groups.localCheckpoint()
    val dReps = dc.reps.withColumn("th", md5(col("norm"))).localCheckpoint()
    val dSigs = Dedup
      .minhashSignaturesOf(dc.reps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dBands = Dedup.bandSignaturesFromSigs(dSigs).localCheckpoint()
    val dBbits = Dedup.bbitsFromSigs(dSigs).localCheckpoint()
    dSigs.unpersist()
    // store probes pruned to the batch's key prefixes — the leveled
    // layout's point: per-batch store I/O stops scaling with the store
    val reps = prunedScan(spark, path, "reps", pl, "tp", prefixesOf(dReps, hexPrefix(col("th"), pl)))
    val bands = prunedScan(spark, path, "bands", pl, "sp", prefixesOf(dBands, hexPrefix(col("sig"), pl)))
    // ---- match against the PRE-append store (matchDelta's shape) ----
    val exact = reps
      .join(broadcast(dReps.select(col("doc_id").as("d_rep"), col("th"))), Seq("th"))
      .select(col("rep_id"), col("d_rep"), lit("exact").as("kind"))
    val near = bands
      .join(broadcast(dBands.select(col("doc_id").as("d_rep"), col("band"), col("sig"))), Seq("band", "sig"))
      .select(col("doc_id").as("rep_id"), col("d_rep"), lit("near").as("kind"))
      .distinct()
    val cand0 = exact.union(near)
    val cand = if (pl > 0) cand0.localCheckpoint() else cand0
    val groups = liveGroupsFrom(
      spark, path,
      prunedScan(spark, path, "groups", pl, "gp", prefixesOf(cand, idPrefix(col("rep_id"), pl)))
    )
    val matches = cand
      .join(groups.select(col("rep_id"), col("doc_id").as("match_doc_id")), Seq("rep_id"))
      .join(dGroups.select(col("rep_id").as("d_rep"), col("doc_id").as("new_doc_id")), Seq("d_rep"))
      .groupBy(col("new_doc_id"), col("match_doc_id"))
      .agg(min(col("kind")).as("kind"))
      .localCheckpoint()
    // ---- append (same rows [[append]] writes, minus the recompute) --
    // a dc-group's members share their rep's content hash, so the whole
    // group is known or fresh together; the reps probe reuses the same
    // pruned scan (the batch's th prefix set is rep-level == doc-level)
    val docTh = dGroups
      .select(col("doc_id"), col("rep_id").as("b_rep"))
      .join(broadcast(dReps.select(col("doc_id").as("b_rep"), col("th"))), Seq("b_rep"))
    val known = reps
      .join(broadcast(docTh.select(col("doc_id"), col("th"))), Seq("th"))
      .select(col("doc_id"), col("rep_id"))
      .localCheckpoint()
    val freshGroups = dGroups
      .join(broadcast(known.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val freshReps = freshGroups.filter(col("doc_id") === col("rep_id")).select(col("rep_id"))
    appendTable(known.union(freshGroups), path, "groups", l, "gp", idPrefix(col("rep_id"), l))
    appendTable(
      dReps
        .join(broadcast(freshReps.withColumnRenamed("rep_id", "doc_id")), Seq("doc_id"))
        .select(col("doc_id").as("rep_id"), col("th")),
      path, "reps", l, "tp", hexPrefix(col("th"), l)
    )
    appendTable(
      dBands.join(broadcast(freshReps.withColumnRenamed("rep_id", "doc_id")), Seq("doc_id")),
      path, "bands", l, "sp", hexPrefix(col("sig"), l)
    )
    appendTable(
      dBbits.join(broadcast(freshReps.withColumnRenamed("rep_id", "doc_id")), Seq("doc_id")),
      path, "bbits", l, "bp", idPrefix(col("doc_id"), l)
    )
    if (l > 0)
      bumpLayoutRows(
        spark, path,
        dBands.join(broadcast(freshReps.withColumnRenamed("rep_id", "doc_id")), Seq("doc_id")).count()
      )
    matches
  }

  /** [[matchDelta]]'s near matches SCORED from the persisted b-bit
    * tier: candidates come from the stored bands, the Jaccard estimate
    * from the stored K packed low bits — the corpus contributes 8
    * bytes per rep to verification, and its text/shingles are never
    * touched (the batch side computes its own signatures once). The
    * debiased estimator is exact integer math on a XOR popcount:
    *
    *   agree = K − popcount(bits_a XOR bits_b)
    *   Ĵ     = max(0, (2·agree − K) / K)
    *
    * This is what makes sketch verification affordable at 100 TB:
    * the full-signature tier (12×32-char hex per rep) stays cold,
    * the b-bit tier rides along with the band join.
    */
  def matchDeltaScored(spark: SparkSession, path: String, delta: DataFrame): DataFrame = {
    requireFormat(spark, path)
    val pl = { val lay = readLayoutInfo(spark, path); if (lay.prune) lay.l else 0 }
    val dc = Dedup.collapseExact(normed(delta))
    val dSigs = Dedup
      .minhashSignaturesOf(dc.reps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dBands0 = Dedup
      .bandSignaturesFromSigs(dSigs)
      .select(col("doc_id").as("d_rep"), col("band"), col("sig"))
    val dBands = if (pl > 0) dBands0.localCheckpoint() else dBands0
    val dBbits = Dedup.bbitsFromSigs(dSigs).select(col("doc_id").as("d_rep"), col("bits").as("d_bits"))
    val k = Dedup.K
    val bands = prunedScan(spark, path, "bands", pl, "sp", prefixesOf(dBands, hexPrefix(col("sig"), pl)))
    val near0 = bands
      .join(broadcast(dBands), Seq("band", "sig"))
      .select(col("doc_id").as("rep_id"), col("d_rep"))
      .distinct()
    val near = if (pl > 0) near0.localCheckpoint() else near0
    // candidate-pruned b-bit + groups probes (two-phase, as matchDelta)
    val bbits = prunedScan(spark, path, "bbits", pl, "bp", prefixesOf(near, idPrefix(col("rep_id"), pl)))
    val groups = liveGroupsFrom(
      spark, path,
      prunedScan(spark, path, "groups", pl, "gp", prefixesOf(near, idPrefix(col("rep_id"), pl)))
    )
    val scored = near
      .join(bbits.withColumnRenamed("doc_id", "rep_id"), Seq("rep_id"))
      .join(broadcast(dBbits), Seq("d_rep"))
      .withColumn("n_bit_agree", lit(k.toLong) - expr(s"bit_count((bits ^ d_bits) & ${(1L << k) - 1}L)"))
      .withColumn(
        "est_jaccard_micro",
        greatest(lit(0L), expr(s"(2 * n_bit_agree - $k) * 1000000 DIV $k"))
      )
    val out = scored
      .join(groups.select(col("rep_id"), col("doc_id").as("match_doc_id")), Seq("rep_id"))
      .join(dc.groups.select(col("rep_id").as("d_rep"), col("doc_id").as("new_doc_id")), Seq("d_rep"))
      .select(col("new_doc_id"), col("match_doc_id"), col("n_bit_agree"), col("est_jaccard_micro"))
    Dedup.releaseAfterRun(spark, out, Seq(dSigs))
  }
}
