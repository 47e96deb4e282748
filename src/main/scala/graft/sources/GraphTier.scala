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

  private val ready = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val lock  = new Object

  /** Build-at-most-once gate. The global lock serializes builds (a
    * concurrent second caller waits, then reads) — builds are rare,
    * per-process, and the waiters would otherwise race the same
    * overwrite. Marked ready only after `build` returns, so a failed
    * build retries on the next call (writes are overwrite-mode).
    */
  private def ensure(path: String)(build: => Unit): String = lock.synchronized {
    if (!ready.contains(path)) { build; ready.add(path): Unit }
    path
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
    spark.read.parquet(s"${ensureCoPurchaseTier(spark, dir)}/edges")

  // ---- co-purchase tier: incremental maintenance --------------------
  //
  // The edge_tier discipline applied to the relational graph: a batch
  // of NEW orders contributes co-purchase pairs only WITHIN its own
  // orders (an order's item set ships complete — pairs never span
  // orders), so the delta self-join is |batch| × per-order-fanout and
  // old orders never recompute. Unlike the LSH tier, a delta pair can
  // ALREADY exist (two parts co-bought in an old order and again in a
  // new one), so the append anti-joins the delta against the stored
  // tier — a delta-keyed probe, never tier × tier. Equality with the
  // from-scratch self-join over the full table is the
  // graph_copurchase_tier query's oracle.

  /** Full build from a (l_orderkey, l_partkey) pair frame. */
  def writeCoPurchase(li: DataFrame, path: String): Unit =
    coEdgesOf(li).write.mode("overwrite").parquet(s"$path/edges")

  /** Append a batch of COMPLETE new orders: within-batch pairs,
    * deduped against the stored tier, land as new files.
    */
  def appendCoPurchase(spark: SparkSession, liDelta: DataFrame, path: String): Unit = {
    val delta = coEdgesOf(liDelta).localCheckpoint() // batch-sized pin
    delta
      .join(spark.read.parquet(s"$path/edges"), Seq("src", "dst"), "left_anti")
      .write.mode("append").parquet(s"$path/edges")
  }

  def readCoPurchase(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/edges")

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
