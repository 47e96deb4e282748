package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Persisted dedup-signature store: the corpus-side state an
  * incremental dedup pipeline keeps between ingest batches, so a new
  * batch is matched against SIGNATURES on disk instead of re-running
  * the shingle→minhash pipeline over the whole corpus (at 100 TB that
  * recompute IS the cost of the job).
  *
  * Layout (all parquet under one root):
  *   groups/  (doc_id, rep_id)      every doc → canonical rep of its
  *                                  exact-dup group
  *   reps/    (rep_id, th)          one row per distinct text, with
  *                                  the md5 content hash
  *   bands/   (doc_id, band, sig)   MinHash band signatures, REP-LEVEL
  *                                  only (members inherit their rep's)
  *
  * Rep-level storage is the skew-safe shape from [[Dedup]]: a
  * 10^5-copy boilerplate cluster stores ONE signature row set, and the
  * match join's buckets stay clone-free. Appends are plain parquet
  * appends — each batch adds its new members/reps/bands exactly once.
  */
object SignatureStore {

  /** Deterministic scratch root for oracle queries (overwrite-mode,
    * keyed by input dir — reused, not leaked, across runs).
    */
  def scratchPath(dir: String): String = TimeboxStore.scratchPath("graft_sigstore", dir)

  private def normed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Dedup.normText(col("text")).as("norm"))

  /** Build the store from scratch for a corpus of (doc_id, text). */
  def write(spark: SparkSession, docs: DataFrame, path: String): Unit = {
    val c = Dedup.collapseExact(normed(docs))
    c.groups.write.mode("overwrite").parquet(s"$path/groups")
    c.reps
      .select(col("doc_id").as("rep_id"), md5(col("norm")).as("th"))
      .write.mode("overwrite").parquet(s"$path/reps")
    Dedup
      .bandSignaturesFrom(Dedup.shinglesOf(c.reps).distinct())
      .write.mode("overwrite").parquet(s"$path/bands")
  }

  /** Append a new batch: docs whose content hash matches an existing
    * rep join that group; unseen texts form new groups (canonical =
    * min doc_id per hash within the batch) and contribute new rep +
    * band rows. The store never rewrites existing rows — ingest-order
    * doc ids keep canonical choice stable across append vs rebuild.
    */
  def append(spark: SparkSession, docs: DataFrame, path: String): Unit = {
    val reps = spark.read.parquet(s"$path/reps")
    val nm = normed(docs).withColumn("th", md5(col("norm")))
    // the store side streams, the (small) batch broadcasts
    val known = reps
      .join(broadcast(nm.select(col("doc_id"), col("th"))), Seq("th"))
      .select(col("doc_id"), col("rep_id"))
    val fresh = nm.join(broadcast(reps.select(col("th"))), Seq("th"), "left_anti")
    val freshC = Dedup.collapseExact(fresh.select(col("doc_id"), col("norm")))
    known.union(freshC.groups).write.mode("append").parquet(s"$path/groups")
    freshC.reps
      .select(col("doc_id").as("rep_id"), md5(col("norm")).as("th"))
      .write.mode("append").parquet(s"$path/reps")
    Dedup
      .bandSignaturesFrom(Dedup.shinglesOf(freshC.reps).distinct())
      .write.mode("append").parquet(s"$path/bands")
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
      .bandSignaturesFrom(Dedup.shinglesOf(c.reps).distinct())
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

  /** Match an incoming batch against the stored signatures: exact
    * matches via the content hash, near matches via shared LSH band
    * signatures; a pair matched both ways reports 'exact'. The corpus
    * appears ONLY through the store tables — no corpus text is read,
    * let alone re-shingled. The batch is collapsed first, matched at
    * rep level, and matches expand to members on both sides.
    */
  def matchDelta(spark: SparkSession, path: String, delta: DataFrame): DataFrame = {
    val groups = spark.read.parquet(s"$path/groups")
    val reps = spark.read.parquet(s"$path/reps")
    val bands = spark.read.parquet(s"$path/bands")
    val dc = Dedup.collapseExact(normed(delta))
    val dReps = dc.reps.withColumn("th", md5(col("norm")))
    val exact = reps
      .join(broadcast(dReps.select(col("doc_id").as("d_rep"), col("th"))), Seq("th"))
      .select(col("rep_id"), col("d_rep"), lit("exact").as("kind"))
    val dBands = Dedup
      .bandSignaturesFrom(Dedup.shinglesOf(dc.reps).distinct())
      .select(col("doc_id").as("d_rep"), col("band"), col("sig"))
    val near = bands
      .join(broadcast(dBands), Seq("band", "sig"))
      .select(col("doc_id").as("rep_id"), col("d_rep"), lit("near").as("kind"))
      .distinct()
    exact
      .union(near)
      .join(groups.select(col("rep_id"), col("doc_id").as("match_doc_id")), Seq("rep_id"))
      .join(dc.groups.select(col("rep_id").as("d_rep"), col("doc_id").as("new_doc_id")), Seq("d_rep"))
      .groupBy(col("new_doc_id"), col("match_doc_id"))
      .agg(min(col("kind")).as("kind"))
  }
}
