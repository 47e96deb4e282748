package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SignatureStore

class SignatureStoreSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"), col("text"))

  private lazy val (incPath, fullPath) = {
    val root = java.nio.file.Files.createTempDirectory("graft_sigstore_spec").toString
    val inc = s"$root/inc"
    val full = s"$root/full"
    // incremental: batch A then batch B appended; rebuild: A∪B at once
    SignatureStore.write(spark, docs.filter(col("doc_id") < 300), inc)
    SignatureStore.append(spark, docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), inc)
    SignatureStore.write(spark, docs.filter(col("doc_id") < 400), full)
    (inc, full)
  }

  test("format marker: append/match fail fast on a missing or foreign-format store") {
    val root = java.nio.file.Files.createTempDirectory("graft_sigfmt_spec").toString
    val path = s"$root/store"
    val batch = docs.filter(col("doc_id") < 50)
    SignatureStore.write(spark, batch, path)
    assert(new java.io.File(s"$path/_format").exists(), "write must stamp _format")
    // a pre-versioning store (marker absent): every signature-touching
    // path must refuse rather than silently miss cross-format matches.
    // (Also drop the local-FS checksum sidecar so the out-of-band
    // rewrite below reads cleanly.)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$path/_format"))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$path/._format.crc"))
    val miss = intercept[IllegalStateException](SignatureStore.append(spark, batch, path))
    assert(miss.getMessage.contains("_format"))
    intercept[IllegalStateException](SignatureStore.matchDelta(spark, path, batch))
    // a marker from a different hash-family generation: same refusal
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_format"),
      "graft-sig-v1 seeded-md5".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
    val stale = intercept[IllegalStateException](SignatureStore.matchAppend(spark, path, batch))
    assert(stale.getMessage.contains("graft-sig-v1"))
    // rebuilding re-stamps and everything works again
    SignatureStore.write(spark, batch, path)
    assert(SignatureStore.matchDelta(spark, path, batch).count() > 0)
  }

  test("append equals rebuild: groups/reps/bands are set-identical for id-ordered batches") {
    for (t <- Seq("groups", "reps", "bands", "bbits")) {
      val x = spark.read.parquet(s"$incPath/$t")
      val y = spark.read.parquet(s"$fullPath/$t")
      assert(x.count() === y.count(), s"$t row count diverged")
      assert(x.except(y).count() === 0, s"$t has rows the rebuild lacks")
      assert(y.except(x).count() === 0, s"$t is missing rebuilt rows")
    }
  }

  test("tombstone compaction equals a store built on the live corpus — rep promotion, zero re-shingling") {
    val root = java.nio.file.Files.createTempDirectory("graft_sigdel_spec").toString
    val (tomb, live) = (s"$root/tomb", s"$root/live")
    // the shipped corpus has no exact duplicates, so CONSTRUCT the
    // promotion scenario: every doc gets a +10000 clone (2-member
    // groups, rep = low id). 10000 ≡ 1 (mod 11), so doc_id % 11 == 5
    // deletes some REPS whose clone survives (orig ≡ 5 → promotion)
    // AND some clones whose rep survives (orig ≡ 4 → member delete) —
    // both paths run, the non-degeneracy asserts below prove it.
    val base = docs.filter(col("doc_id") < 200)
    val corpus = base.unionByName(base.select((col("doc_id") + 10000L).as("doc_id"), col("text")))
    val deleted = col("doc_id") % 11 === 5
    SignatureStore.write(spark, corpus, tomb)
    SignatureStore.tombstone(spark, tomb, corpus.filter(deleted).select(col("doc_id")))
    SignatureStore.compactTombstones(spark, tomb)
    SignatureStore.write(spark, corpus.filter(!deleted), live)
    for (t <- Seq("groups", "reps", "bands", "bbits")) {
      val x = spark.read.parquet(s"$tomb/$t")
      val y = spark.read.parquet(s"$live/$t")
      assert(x.except(y).count() === 0 && y.except(x).count() === 0,
        s"$t diverged from the live-corpus build after compaction")
    }
    // tombstone tier is gone — the compacted store carries no residue
    assert(!new java.io.File(s"$tomb/deletes").exists)
    // non-degenerate both ways: promoted clones are reps now...
    val groups = spark.read.parquet(s"$tomb/groups")
    assert(groups.filter(col("rep_id") >= 10000L).count() > 0,
      "no clone was promoted to rep — promotion path untested")
    // ...and some groups lost a member but kept their rep
    assert(groups.groupBy(col("rep_id")).count().filter(col("count") === 1).count() > 0,
      "no group shrank to one member — member-delete path untested")
  }

  test("contamination matrix over three bucketed stores: symmetric pair counts, no corpus shuffle") {
    val d = docs
    SignatureStore.writeBucketedBands(spark, d.filter(col("doc_id") < 170), "cmx_a")
    SignatureStore.writeBucketedBands(spark, d.filter(col("doc_id") >= 170 && col("doc_id") < 340), "cmx_b")
    SignatureStore.writeBucketedBands(spark, d.filter(col("doc_id") >= 340), "cmx_c")
    try {
      val m = SignatureStore.contaminationMatrix(spark, Seq("cmx_a", "cmx_b", "cmx_c")).collect()
      assert(m.length === 3, "expected C(3,2) = 3 store pairs")
      // every count equals the direct pairwise match count
      m.foreach { r =>
        val expect = SignatureStore.crossStoreMatches(spark, r.getString(0), r.getString(1)).count()
        assert(r.getAs[Long]("n_pairs") === expect)
      }
    } finally Seq("cmx_a", "cmx_b", "cmx_c").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("incremental CC merges two existing components through one bridging delta doc") {
    import spark.implicits._
    // two disjoint near-dup components in the corpus (1≈2, 10≈11).
    // Texts are PRE-SEARCHED against the engine's exact banding (K=12
    // universal-hash min slots (A_j·h + B_j) mod 2³¹−1, 4 bands × 3)
    // so that, deterministically: each pair shares ≥1 band, the pairs
    // share none across, and the concatenated bridge shares ≥1 band
    // with BOTH components.
    val baseA = "eta eta sigma gamma xi gamma xi eta tau delta delta sigma beta tau epsilon"
    val baseB = "one seven twelve five nine five two nine seven ten nine eight"
    val corpus = Seq(
      (1L, s"$baseA tail"),
      (2L, s"$baseA tails"),
      (10L, s"$baseB tail"),
      (11L, s"$baseB tails")
    ).toDF("doc_id", "text")
    // the bridge shares enough shingles with BOTH bases to band-match
    // both components (its first 12 tokens ≈ baseA, last 12 ≈ baseB)
    val bridge = Seq((20L, s"$baseA $baseB")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_ccmerge").toString
    SignatureStore.write(spark, corpus, path)
    SignatureStore.writeLabels(spark, path)
    val pre = SignatureStore.readClusters(spark, path).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assume(pre.get(2L).contains(1L) && pre.get(11L).contains(10L), s"corpus components not formed: $pre")
    assert(pre.get(1L) !== pre.get(10L), "components must start disjoint")
    SignatureStore.appendRelabel(spark, bridge, path)
    val post = SignatureStore.readClusters(spark, path).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one component, labelled by the global min (doc 1), covering both
    // old components AND the bridge
    for (d <- Seq(1L, 2L, 10L, 11L, 20L))
      assert(post.get(d).contains(1L), s"doc $d not relabelled to the merged min: $post")
  }

  test("incremental CC label maintenance equals from-scratch clusters on the real corpus") {
    val incCc = graft.operators.Dedup.incrementalClusters(spark, sf)
    val scratch = graft.operators.Dedup.clusters(spark, sf)
    assert(incCc.exceptAll(scratch).count() === 0, "incremental labels not in from-scratch answer")
    assert(scratch.exceptAll(incCc).count() === 0, "from-scratch labels missing incrementally")
  }

  test("matchDelta over the appended store equals the from-scratch match") {
    val delta = docs.filter(col("doc_id") >= 400)
    val a = SignatureStore.matchDelta(spark, incPath, delta)
    val b = SignatureStore.matchDelta(spark, fullPath, delta)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // matches against batch-B docs (appended, not rewritten) must appear
    assert(a.filter(col("match_doc_id") >= 300 && col("match_doc_id") < 400).count() > 0)
  }
}
