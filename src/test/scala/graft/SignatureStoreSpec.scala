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

  test("leveled store: per-batch match I/O is flat in store size (10x store, same batch)") {
    import graft.operators.Dedup
    // corpus A = 300 real docs; corpus B = A plus 9 salted variants per
    // doc (distinct texts, ~10x the reps). dirRows=5 levels A to l=2
    // (256 dirs) and B to l=3 (4096 dirs): dir SIZE stays capped while
    // dir COUNT absorbs the growth — the flat-I/O mechanism.
    val base = docs.filter(col("doc_id") < 300).localCheckpoint()
    val variants = base
      .select(col("doc_id"), col("text"), explode(sequence(lit(0), lit(8))).as("j"))
      .select(
        (lit(10000) + col("doc_id") * 10 + col("j")).as("doc_id"),
        col("text")
      )
      .select(col("doc_id"), concat(col("text"), lit(" salt "), col("doc_id").cast("string")).as("text"))
    val root = java.nio.file.Files.createTempDirectory("graft_leveled").toString
    val (pa, pb) = (s"$root/a", s"$root/b")
    SignatureStore.write(spark, base, pa, dirRows = 5)
    SignatureStore.write(spark, base.unionByName(variants), pb, dirRows = 5)
    assert(SignatureStore.readLayout(spark, pa) === 2)
    assert(SignatureStore.readLayout(spark, pb) === 3, "10x store must level one step deeper")
    // the batch: 12 re-submissions of known docs under new ids
    val batch = base
      .filter(col("doc_id") < 12)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      .localCheckpoint()
    val ma = SignatureStore.matchDelta(spark, pa, batch).collect()
    val mb = SignatureStore.matchDelta(spark, pb, batch).collect()
    // correctness is store-size-invariant: restricted to A's corpus ids,
    // the 10x store reports the identical match set
    def key(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(_._2 < 300)
      .toSet
    assert(key(ma).nonEmpty, "batch of known docs must match")
    assert(key(ma) === key(mb))
    // the pruned band probe is PARTITION pruning, not a post-scan filter
    val pruned = SignatureStore.prunedScan(
      spark, pb, "bands", 3, "sp",
      Seq("p000", "p001") // any literal prefix set: the mechanism is what's pinned
    )
    val meta = pruned.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata("PartitionFilters")
    }
    assert(meta.exists(m => m.contains("sp") && m.replaceAll("\\s", "") != "[]"),
      s"prefix filter did not land as a partition filter: $meta")
    // flat I/O: bytes under the batch's touched band dirs stay ~constant
    // while the store (and its total band bytes) grew ~10x
    def normed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).getOrElse(Array.empty).map(dirBytes).sum
    def touchedAndTotal(path: String): (Long, Long) = {
      val l = SignatureStore.readLayout(spark, path)
      val prefixes = Dedup
        .bandSignaturesFromSigs(Dedup.minhashSignaturesOf(normed(batch)))
        .select(SignatureStore.hexPrefix(col("sig"), l).as("p"))
        .distinct().collect().map(_.getString(0)).toSet
      val dirs = new java.io.File(s"$path/bands").listFiles().filter(_.isDirectory)
      (dirs.filter(d => prefixes.contains(d.getName.stripPrefix("sp="))).map(dirBytes).sum,
        dirs.map(dirBytes).sum)
    }
    val (touchedA, totalA) = touchedAndTotal(pa)
    val (touchedB, totalB) = touchedAndTotal(pb)
    assert(totalB >= 4 * totalA, s"store did not grow as planned: $totalA -> $totalB")
    assert(touchedB <= 2 * touchedA,
      s"per-batch band I/O grew with the store: touched $touchedA -> $touchedB (total $totalA -> $totalB)")
  }

  test("write side: flat below the prune threshold, and per-batch APPEND I/O flat across a 10x leveled store") {
    import graft.operators.Dedup
    // 1) the r9 regression pin: a store too small for pruning to ever
    // engage (rows <= 4*dirRows) must be written FLAT — the leveled
    // fan-out write was pure cost there (dedup_store_delete 2.3x)
    assert(SignatureStore.chooseL(100, 100) === 0, "tiny store must stay flat")
    assert(SignatureStore.chooseL(400, 100) === 0, "at the prune threshold: still flat")
    assert(SignatureStore.chooseL(401, 100) === 1, "past the threshold: leveled")
    val flat = java.nio.file.Files.createTempDirectory("graft_flatwrite").toString + "/s"
    SignatureStore.write(spark, docs.filter(col("doc_id") < 50), flat)
    assert(SignatureStore.readLayout(spark, flat) === 0)
    assert(!new java.io.File(s"$flat/bands").listFiles().exists(_.getName.startsWith("sp=")),
      "flat store must not carry partition dirs")
    // 2) write-side twin of the leveled READ drill: appending the same
    // batch to a store and to its ~10x sibling must cost ~the same
    // NEW bytes and files (touched dirs are batch-keyed, not
    // store-sized). Stores reuse the read drill's construction.
    val base = docs.filter(col("doc_id") < 300).localCheckpoint()
    val variants = base
      .select(col("doc_id"), col("text"), explode(sequence(lit(0), lit(8))).as("j"))
      .select(
        (lit(20000) + col("doc_id") * 10 + col("j")).as("doc_id"),
        concat(col("text"), lit(" wsalt "), (lit(20000) + col("doc_id") * 10 + col("j")).cast("string")).as("text")
      )
    val root = java.nio.file.Files.createTempDirectory("graft_levelwrite").toString
    val (pa, pb) = (s"$root/a", s"$root/b")
    SignatureStore.write(spark, base, pa, dirRows = 5)
    SignatureStore.write(spark, base.unionByName(variants), pb, dirRows = 5)
    def snapshot(path: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
      walk(new java.io.File(path)).map(f => f.getPath -> f.length).toMap
    }
    val batch = docs
      .filter(col("doc_id") >= 300 && col("doc_id") < 330)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
      .localCheckpoint()
    def appendCost(path: String): (Long, Long) = {
      val before = snapshot(path)
      SignatureStore.append(spark, batch, path)
      val added = snapshot(path).filterNot { case (p, _) => before.contains(p) }
        .filter { case (p, _) => p.endsWith(".parquet") }
      (added.size.toLong, added.values.sum)
    }
    val (filesA, bytesA) = appendCost(pa)
    val (filesB, bytesB) = appendCost(pb)
    assert(filesA > 0 && bytesA > 0, "append wrote nothing?")
    // dir fan-out is keyed by the BATCH's prefixes on both stores;
    // level depth differs by one (l=2 vs l=3) so allow 2x slack, but
    // a store-sized write would blow straight past it
    assert(filesB <= 2 * filesA + 8, s"append file fan-out grew with the store: $filesA -> $filesB")
    assert(bytesB <= 2 * bytesA + 65536, s"append bytes grew with the store: $bytesA -> $bytesB")
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
    // min slots over the 61-bit Mersenne family — tools/BandSearch
    // re-finds a fixture whenever the signature family changes) so
    // that, deterministically: each pair shares ≥1 band, the pairs
    // share none across, and the concatenated bridge shares ≥1 band
    // with BOTH components.
    val baseA = "beta epsilon alpha gamma kappa delta delta gamma epsilon kappa eta tau delta tau beta"
    val baseB = "twelve two five seven three eight nine three two two ten six"
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

  test("edge tier: incremental append equals a from-scratch rebuild, labels derive from it") {
    import graft.operators.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_edgetier").toString
    val (inc, full) = (s"$root/inc", s"$root/full")
    // incremental: build on A, writeLabels (materializes edges/), then
    // append B through appendRelabel (delta edges appended)
    SignatureStore.write(spark, docs.filter(col("doc_id") < 350), inc)
    SignatureStore.writeLabels(spark, inc)
    SignatureStore.appendRelabel(spark, docs.filter(col("doc_id") >= 350), inc)
    // rebuild: the full corpus at once
    SignatureStore.write(spark, docs, full)
    SignatureStore.writeLabels(spark, full)
    for (t <- Seq("edges", "labels")) {
      val x = spark.read.parquet(s"$inc/$t")
      val y = spark.read.parquet(s"$full/$t")
      assert(x.except(y).count() === 0, s"$t has rows the rebuild lacks")
      assert(y.except(x).count() === 0, s"$t is missing rebuilt rows")
    }
    // the member-level read off the tier equals the in-query pipeline's
    // contract (same expansion minhashLsh uses)
    val served = SignatureStore.readEdges(spark, inc)
    assert(served.count() > 0)
    // labels are CC over exactly the persisted edges
    val cc = Dedup.connectedComponents(spark.read.parquet(s"$inc/edges"))
    val lab = spark.read.parquet(s"$inc/labels")
    assert(cc.except(lab).count() === 0 && lab.except(cc).count() === 0)
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
