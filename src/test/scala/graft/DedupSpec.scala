package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  import TestSpark._

  test("exact: group sizes sum to corpus size; canonical is in group") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val g = Dedup.exact(spark, sf)
    assert(g.agg(sum("n_docs")).head.getLong(0) === docs)
    assert(g.filter(col("n_docs") < 1).count() === 0)
  }

  test("keep-first: canonical_id <= doc_id, dups flagged consistently") {
    val df = Dedup.exactKeepFirst(spark, sf)
    assert(df.filter(col("canonical_id") > col("doc_id")).count() === 0)
    assert(df.filter((col("doc_id") === col("canonical_id")) && col("is_dup") === 1).count() === 0)
    assert(df.filter((col("doc_id") =!= col("canonical_id")) && col("is_dup") === 0).count() === 0)
  }

  test("minhash-lsh: pairs are ordered and unique") {
    val df = Dedup.minhashLsh(spark, sf).cache()
    try {
      assert(df.filter(col("doc_a") >= col("doc_b")).count() === 0)
      assert(df.count() === df.distinct().count())
    } finally df.unpersist()
  }

  test("minhash-lsh recall: exact duplicate texts are always candidates") {
    // exact dup groups (same normalized text, >=3 tokens) must share all
    // minhashes, hence all band signatures -> guaranteed candidate pair
    val hashed = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
      .filter(size(split(col("norm"), " ")) >= 3)
    val pairs = hashed
      .as("a")
      .join(hashed.as("b"), col("a.norm") === col("b.norm") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand = Dedup.minhashLsh(spark, sf)
    val missed = pairs.join(cand, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed === 0, s"$missed exact-dup pairs missed by LSH")
  }

  test("clusters: both endpoints of every candidate pair share a cluster") {
    val labels = Dedup.clusters(spark, sf).cache()
    try {
      assert(labels.filter(col("cluster_id") > col("doc_id")).count() === 0)
      // every cluster label is itself a member of that cluster
      val members = labels.select(col("doc_id").as("m")).distinct()
      assert(labels.join(members, labels("cluster_id") === members("m"), "left_anti").count() === 0)
      val pairs = Dedup.minhashLsh(spark, sf)
      val la = labels.toDF("doc_a", "ca")
      val lb = labels.toDF("doc_b", "cb")
      val split = pairs.join(la, "doc_a").join(lb, "doc_b").filter(col("ca") =!= col("cb"))
      assert(split.count() === 0, "a candidate pair crosses two clusters")
    } finally labels.unpersist()
  }

  test("jaccard: intersection <= union, verdict matches ratio") {
    val df = Dedup.ngramJaccard(spark, sf).cache()
    try {
      assert(df.filter(col("inter_n") > col("union_n")).count() === 0)
      assert(df.filter((col("inter_n") * 10 >= col("union_n") * 8) =!= (col("is_dup") === 1)).count() === 0)
    } finally df.unpersist()
  }

  test("simhash: hamming distance within declared radius and symmetric-free") {
    val df = Dedup.simhash(spark, sf).cache()
    try {
      assert(df.filter(col("hamming") > 3 || col("hamming") < 0).count() === 0)
      assert(df.filter(col("doc_a") >= col("doc_b")).count() === 0)
    } finally df.unpersist()
  }

  test("connected components: 300-hop chain converges within a logarithmic round budget") {
    import spark.implicits._
    // adversarial path graph 0-1-2-...-299: diameter 299 >> 20, where
    // pure min propagation needs one round per hop; relax+pointer-jump
    // must land it in <= 12 rounds (throws if the budget is exceeded)
    val pairs = (0L until 299L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs, maxIters = 12)
    assert(labels.count() === 300)
    assert(labels.filter(col("cluster_id") =!= 0L).count() === 0, "not all nodes reached the component min")
  }

  test("star-contraction CC: same chain lands in the log budget and agrees with relax+jump everywhere") {
    import spark.implicits._
    // the same adversarial 300-hop path, through the edge-rewriting
    // core: large-star/small-star must reach the star fixpoint in a
    // logarithmic round count (throws otherwise)
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val starLabels = Dedup.connectedComponentsStar(chain, maxIters = 12)
    assert(starLabels.count() === 300)
    assert(starLabels.filter(col("cluster_id") =!= 0L).count() === 0)
    // and on a multi-component mixed graph (two cliques, a chain, an
    // isolated pair) both cores produce IDENTICAL label tables
    val mixed = (
      (10L until 14L).flatMap(a => (a + 1 to 14L).map(b => (a, b))) ++ // clique 10..14
        Seq((100L, 101L), (101L, 102L), (102L, 103L)) ++               // chain
        Seq((200L, 201L))                                              // pair
    ).toDF("doc_a", "doc_b")
    val a = Dedup.connectedComponents(mixed).select("doc_id", "cluster_id")
    val b = Dedup.connectedComponentsStar(mixed).select("doc_id", "cluster_id")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("embedding near-dup: cosine above threshold, pairs ordered") {
    val df = Dedup.embeddingNearDup(spark, sf, threshold = 0.4)
    assert(df.filter(col("cos_micro") < 400000).count() === 0)
    assert(df.filter(col("vec_a") >= col("vec_b")).count() === 0)
  }

  test("embedding near-dup: LSH recall >= 0.9 on planted near-duplicates at cos 0.95") {
    import spark.implicits._
    // plant 25 near-duplicate pairs (cos > 0.99) among 150 random
    // vectors; deterministic seed so the bound is a regression guard,
    // not a flake
    val rnd = new scala.util.Random(42)
    def randVec(): Array[Float] = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = (0 until 150).map(i => (i.toLong, randVec()))
    val dups = (0 until 25).map { i =>
      val (_, v) = base(i)
      (1000L + i, v.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_embed_recall").toString
    (base ++ dups)
      .map { case (id, v) => (id, v.toSeq, (id % 10).toInt) }
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val found = Dedup
      .embeddingNearDup(spark, dir, threshold = 0.95)
      .select("vec_a", "vec_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val planted = (0 until 25).map(i => (i.toLong, 1000L + i)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"LSH recall $recall below bound; found ${found.size} pairs")
  }

  test("containment: a quoted subset flags is_contained while Jaccard stays below its bar") {
    import spark.implicits._
    // small doc quoted whole inside a much longer doc: banding still
    // pairs them (the small doc's shingles dominate its signature is
    // not guaranteed — so plant the quote as a PREFIX and pad the
    // host with the same leading run to keep band collisions), then
    // containment must fire where Jaccard cannot
    // plant 8 quote/host pairs: each host = its quote + 3 fresh pad
    // tokens, so containment = 1 exactly while Jaccard = 10/13 < 0.8.
    // Band collision at J≈0.77 is per-pair md5 luck; with 8 planted
    // pairs on fixed data at least one collides (deterministic, a
    // regression pin — not a flake)
    val rows = (0 until 8).flatMap { p =>
      val quote = (1 to 12).map(i => s"w${p}x$i").mkString(" ")
      val host = quote + " " + (1 to 3).map(i => s"p${p}y$i").mkString(" ")
      Seq(
        (100L + p, quote, "en", "src0", quote.length.toLong),
        (200L + p, host, "en", "src0", host.length.toLong)
      )
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_containment").toString
    rows
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = (0 until 8).map(p => (100L + p, 200L + p)).toSet
    val cont = Dedup.containmentPairs(spark, dir).collect()
      .filter(r => planted.contains((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
    assert(cont.nonEmpty, "no planted subset pair survived banding")
    assert(cont.forall(_.getAs[Long]("is_contained") === 1L), "full quote not flagged as contained")
    val jac = Dedup.ngramJaccard(spark, dir).collect()
      .filter(r => planted.contains((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
    assert(jac.forall(_.getAs[Long]("is_dup") === 0L), "Jaccard should stay below 0.8 here")
    // the signature-only estimator must land near the exact answer
    // (containment = 1) on the same pairs — deterministic on fixed
    // data, but a K=12 sketch carries per-pair variance (agreement ~
    // Binomial(K, J)), so the pin is mean-accuracy plus a per-pair
    // floor rather than a tight bound on every single pair. The floor
    // is back at 800000 micro: the r9 31-bit base hash forced it down
    // to 550000 (within-doc base collisions bled into the estimate);
    // the 61-bit-prime family removes that collision source
    val est = Dedup.containmentEstimate(spark, dir).collect()
      .filter(r => planted.contains((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
    assert(est.nonEmpty)
    val vals = est.map(_.getAs[Long]("est_containment_micro"))
    assert(vals.forall(_ >= 800000L), s"a signature estimate collapsed: ${vals.mkString(",")}")
    assert(vals.sum / vals.length >= 800000L,
      s"mean signature estimate far below the exact containment of 1: ${vals.mkString(",")}")
  }

  test("long-match anchor df cap: boilerplate anchors dropped, genuine runs survive, n_sh uncapped") {
    import spark.implicits._
    // boiler = an 8-token phrase planted once in each of 6 train docs
    // (train-side anchor df 6); passage = a unique 20-token run shared
    // by exactly one eval/train pair (anchor df 1 per side)
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val passage = (1 to 20).map(i => s"g$i").mkString(" ")
    val train = (0 until 6).map { i =>
      (100L + i, s"t${i}a t${i}b $boiler t${i}c t${i}d", "en", "b_train", 0L)
    } :+ ((200L, s"tq1 tq2 $passage tq3", "en", "b_train", 0L))
    val evals = Seq(
      (1L, s"e1a e1b $passage e1c", "en", "a_eval", 0L),
      (2L, s"e2a e2b $boiler e2c e2d", "en", "a_eval", 0L)
    )
    val dir = java.nio.file.Files.createTempDirectory("graft_longmatch").toString
    (train ++ evals)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def runs(cap: Int) = Dedup
      .contaminationLongMatch(spark, dir, anchorDfCap = cap)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_sh"), r.getAs[Long]("max_run_tokens"))))
      .toMap
    val capped = runs(4)
    assert(capped(1L)._2 === 20L, "genuine 20-token run must survive the df cap")
    assert(capped(2L)._2 === 0L, "boilerplate-only overlap (anchor df 6 > cap 4) must be dropped")
    val uncapped = runs(1000)
    assert(uncapped(1L)._2 === 20L)
    assert(uncapped(2L)._2 === 8L, "without the cap the boilerplate 8-gram reads as a run")
    // n_sh is a per-doc size metric, never capped
    assert(capped(1L)._1 === uncapped(1L)._1 && capped(2L)._1 === uncapped(2L)._1)
  }

  test("substring dedup: overlapping shared spans union, sub-threshold runs report max_run only") {
    import spark.implicits._
    // A = x1..x30; B = x1..x20; C = x11..x30. A shares a 20-run with
    // each — the two spans OVERLAP on [10,20) and the union must cover
    // all 30 tokens exactly once. B∩C is a 10-token run: >= 8 so it
    // feeds max_run, < 16 so it adds nothing to dup_tokens beyond the
    // 20-run each already has with A. D is unrelated.
    val xs = (1 to 30).map(i => s"x$i")
    val docs = Seq(
      (1L, xs.mkString(" "), "en", "s0", 0L),
      (2L, xs.take(20).mkString(" "), "en", "s0", 0L),
      (3L, xs.drop(10).mkString(" "), "en", "s0", 0L),
      (4L, (1 to 10).map(i => s"u$i").mkString(" "), "en", "s0", 0L)
    )
    val dir = java.nio.file.Files.createTempDirectory("graft_substr").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup
      .substringDedup(spark, dir)
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_toks"), r.getAs[Long]("max_run_tokens"), r.getAs[Long]("dup_tokens"),
            r.getAs[Long]("dup_share_bp")))
      )
      .toMap
    assert(got(1L) === ((30L, 20L, 30L, 10000L)), s"overlapping spans must union: ${got(1L)}")
    assert(got(2L) === ((20L, 20L, 20L, 10000L)))
    assert(got(3L) === ((20L, 20L, 20L, 10000L)))
    assert(got(4L) === ((10L, 0L, 0L, 0L)))
  }

  test("keep-best: exactly one kept doc per cluster, and it is a longest member") {
    val df = Dedup.keepBest(spark, sf).cache()
    try {
      val perCluster = df
        .groupBy(col("cluster_id"))
        .agg(
          sum(col("keep")).as("n_keep"),
          max(col("n_chars")).as("max_chars"),
          max(when(col("keep") === 1L, col("n_chars"))).as("kept_chars")
        )
      assert(perCluster.filter(col("n_keep") =!= 1L).count() === 0, "clusters without exactly one keeper")
      assert(perCluster.filter(col("kept_chars") =!= col("max_chars")).count() === 0,
        "a kept doc is not a longest member")
    } finally df.unpersist()
  }

  test("caching contract: intermediates are unpersisted once the caller materializes") {
    spark.catalog.clearCache() // known-clean baseline (suites run sequentially)
    val df = Dedup.ngramJaccard(spark, sf)
    assert(!spark.sharedState.cacheManager.isEmpty, "operator registered no caches to manage")
    df.count() // the caller's one materialization
    // the release listener runs on the async listener bus — wait for it
    val deadline = System.currentTimeMillis() + 30000
    while (!spark.sharedState.cacheManager.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(spark.sharedState.cacheManager.isEmpty, "cached intermediates leaked after the run")
  }

  test("skewed corpus: rep-level candidate count is independent of the clone count") {
    // a b-copy exact-dup cluster must collapse to ONE banded rep, so
    // the rep-level pair structure — and hence the output row count —
    // cannot grow with b; only the cluster's own group_n does.
    val a = Dedup.skewedCorpus(spark, sf, nClones = 50).cache()
    val b = Dedup.skewedCorpus(spark, sf, nClones = 500).cache()
    try {
      assert(a.count() === b.count(), "output rows grew with the clone count")
      assert(
        a.select("rep_id", "n_cand").except(b.select("rep_id", "n_cand")).count() === 0,
        "candidate-partner structure changed with the clone count"
      )
      assert(a.filter(col("rep_id") === 0L).head.getAs[Long]("group_n") === 51L)
      assert(b.filter(col("rep_id") === 0L).head.getAs[Long]("group_n") === 501L)
    } finally { a.unpersist(); b.unpersist() }
  }

  test("paragraph keep-first: partial-aggregable (no window), stable under a segment clone blowup") {
    import spark.implicits._
    // hand fixture, segTokens = 2: doc 1 owns both its segments; doc 2's
    // "y y" loses to doc 1; doc 3 repeats doc 1's "x x" twice — keeps 0
    val base = Seq(
      (1L, "x x y y"),
      (2L, "y y z z"),
      (3L, "x x x x")
    ).toDF("doc_id", "norm")
    def withClones(n: Int) = base.union(
      // n clone docs, every one the boilerplate segment "x x" — the
      // single-hash hot key a license paragraph produces corpus-wide
      spark.range(1000L, 1000L + n).select(col("id").as("doc_id"), lit("x x").as("norm"))
    )
    val small = Dedup.dedupParagraphFrom(withClones(10), 2)
    val big   = Dedup.dedupParagraphFrom(withClones(100000), 2)
    // the keep-first winner must collapse map-side: no window exec may
    // appear anywhere in the plan (a rank window partitioned by the
    // segment hash funnels the whole hot hash into one task)
    big.count() // execute so the adaptive plan is final
    val plan = big.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"keep-first regressed to a window plan:\n$plan")
    assert(plan.contains("partial_min"), "hash winner must partial-aggregate map-side")
    // the base docs' ledger is INVARIANT to the clone count
    val expect = Map(1L -> (2L, 2L, 10000L), 2L -> (2L, 1L, 5000L), 3L -> (2L, 0L, 0L))
    for (df <- Seq(small, big); r <- df.filter(col("doc_id") < 100L).collect()) {
      val (ns, nk, bp) = expect(r.getAs[Long]("doc_id"))
      assert(
        r.getAs[Long]("n_segs") === ns && r.getAs[Long]("n_kept") === nk && r.getAs[Long]("kept_bp") === bp,
        s"ledger changed for doc ${r.getAs[Long]("doc_id")}: $r"
      )
    }
    // every clone loses its one segment to doc 1
    assert(big.filter(col("doc_id") >= 1000L && col("n_kept") =!= 0L).count() === 0)
    assert(big.count() === 3L + 100000L)
  }

  test("clusters: CC eats rep-level edges — count invariant to clone count; labels star-expand") {
    // member-level expansion of a k-clone group would push ~k²/2 edges
    // through one join key; the rep-level CC input must not grow with k
    val docs = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
    def cloned(n: Int) = docs.union(
      docs
        .filter(col("doc_id") === 0L)
        .select(explode(sequence(lit(1000000L), lit(1000000L + n - 1))).as("doc_id"), col("norm"))
    )
    def ccEdges(n: Int): Long =
      Dedup.lshRepPairsFrom(Dedup.shinglesOf(Dedup.collapseExact(cloned(n)).reps).distinct()).pairs.count()
    assert(ccEdges(10) === ccEdges(10000), "CC edge count grew with the clone count")
    // end-to-end: every clone inherits the rep's component label (0 is
    // the corpus-wide min, so doc 0's component is labelled 0)
    val labels = Dedup.clustersFromNorm(spark, cloned(1000)).cache()
    try {
      assert(labels.filter(col("doc_id") >= 1000000L).count() === 1000)
      assert(labels.filter(col("doc_id") >= 1000000L && col("cluster_id") =!= 0L).count() === 0)
    } finally labels.unpersist()
  }

  test("contamination: rep-level product formula equals member-pair counting") {
    val src = spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"), col("source"))
    val naive = Dedup
      .minhashLsh(spark, sf)
      .join(src.toDF("doc_a", "src_a"), Seq("doc_a"))
      .join(src.toDF("doc_b", "src_b"), Seq("doc_b"))
      .filter(col("src_a") =!= col("src_b"))
      .select(
        least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b")
      )
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .cache()
    val rep = Dedup.contamination(spark, sf).cache()
    try {
      assert(rep.except(naive).count() === 0 && naive.except(rep).count() === 0)
    } finally { naive.unpersist(); rep.unpersist() }
  }

  test("bucket cap: oversized LSH buckets are dropped from pair generation") {
    import spark.implicits._
    val bands = Seq(
      // one bucket of 4 members (oversized at cap 3), one of 2
      (1L, 0, "sigA"), (2L, 0, "sigA"), (3L, 0, "sigA"), (4L, 0, "sigA"),
      (5L, 1, "sigB"), (6L, 1, "sigB")
    ).toDF("doc_id", "band", "sig")
    val kept = Dedup.dropOversizedBuckets(bands, Seq("band", "sig"), cap = 3, what = "spec")
    assert(kept.select("sig").distinct().as[String].collect().toSet === Set("sigB"))
    // cap=1 kills every pairable bucket -> zero pairs; default cap is a no-op
    val uniq = Dedup.shingles(spark, sf).distinct().cache()
    try {
      assert(Dedup.lshRepPairsFrom(uniq, bucketCap = 1).pairs.count() === 0L)
      assert(Dedup.lshRepPairsFrom(uniq).pairs.count() > 0L)
    } finally uniq.unpersist()
  }

  test("lsh tune: nested bandings give subset-monotone candidates and recall") {
    val rows = Dedup.lshTune(spark, sf).collect().map(r => r.getAs[String]("cfg") -> r).toMap
    def cand(c: String) = rows.get(c).map(_.getAs[Long]("n_cand")).getOrElse(0L)
    def hits(c: String) = rows.get(c).map(_.getAs[Long]("n_hits")).getOrElse(0L)
    // (2x6) ⊆ (3x4) ⊆ (6x2) and (2x6) ⊆ (4x3) ⊆ (6x2): every 6-row
    // band is aligned 3-row halves, every 3-/4-row band contains an
    // aligned 2-row band — agreement propagates down the chain
    assert(cand("2x6") <= cand("3x4") && cand("3x4") <= cand("6x2"), rows.toString)
    assert(cand("2x6") <= cand("4x3") && cand("4x3") <= cand("6x2"), rows.toString)
    assert(hits("2x6") <= hits("3x4") && hits("3x4") <= hits("6x2"), rows.toString)
    assert(hits("2x6") <= hits("4x3") && hits("4x3") <= hits("6x2"), rows.toString)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_cand"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_truth"))
    }
  }

  test("recall eval: hits bounded by both sides, rates bounded by 10000 bp") {
    val r = Dedup.recallEval(spark, sf).head()
    val (nTruth, nCand, nHits) =
      (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"), r.getAs[Long]("n_hits"))
    assert(nHits <= nTruth && nHits <= nCand, "intersection exceeds a side")
    assert(r.getAs[Long]("recall_bp") <= 10000L && r.getAs[Long]("precision_bp") <= 10000L)
  }

  test("degree dist: bins partition the degree domain and hold their extremes") {
    val rows = Dedup.graphDegreeDist(spark, sf).collect()
    assert(rows.nonEmpty)
    var totalDeg = 0L
    for (r <- rows) {
      val (bin, n, minD, maxD, sumD) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // deg_bin = floor(log2 deg) + 1: the bin's degrees live in [2^(bin-1), 2^bin)
      assert(minD >= (1L << (bin - 1).toInt) && maxD < (1L << bin.toInt),
        s"bin $bin holds degrees outside [${1L << (bin - 1).toInt}, ${1L << bin.toInt}): min=$minD max=$maxD")
      assert(n >= 1 && sumD >= n * minD && sumD <= n * maxD)
      totalDeg += sumD
    }
    // an undirected edge contributes exactly two endpoint degrees
    assert(totalDeg % 2 === 0, s"total degree $totalDeg is odd — edge accounting broken")
  }

  test("clustering coeff: per-node triangles reconcile with the census, coefficients bounded") {
    val rows = Dedup.clusteringCoeff(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (deg, nTri, nWedges, coeff) =
        (r.getAs[Long]("deg"), r.getAs[Long]("n_tri"), r.getAs[Long]("n_wedges"), r.getAs[Long]("coeff_bp"))
      assert(nWedges === deg * (deg - 1) / 2)
      assert(nTri <= nWedges, "a node cannot close more triangles than it has wedges")
      assert(coeff >= 0L && coeff <= 10000L)
      if (nWedges > 0) assert(coeff === nTri * 10000L / nWedges)
    }
    // every triangle has exactly 3 corners: per-node counts sum to 3x the census
    val census = Dedup.graphTriangles(spark, sf).head()
    assert(rows.map(_.getAs[Long]("n_tri")).sum === 3L * census.getAs[Long]("n_triangles"))
    assert(rows.length.toLong === census.getAs[Long]("n_nodes"))
  }

  test("novelty: the first doc is all-novel, an exact clone is zero-novel, counts bounded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_novel").toString
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, base, "en", "a", 1L),                       // first: all shingles novel
      (2L, base, "en", "a", 1L),                       // clone of 1: zero novel
      (3L, base + " fresh tail of brand new tokens here now", "en", "a", 1L) // mixed
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.ngramNovelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_sh"), r.getAs[Long]("n_novel")))).toMap
    assert(out(1L)._1 === 13L && out(1L)._2 === 13L, "doc 1 owns every first occurrence")
    assert(out(2L)._1 === 13L && out(2L)._2 === 0L, "an exact clone introduces nothing")
    assert(out(3L)._2 > 0L && out(3L)._2 < out(3L)._1, "the extended doc is partially novel")
    val bp = Dedup.ngramNovelty(spark, sf).collect()
    assert(bp.forall(r => r.getAs[Long]("novelty_bp") >= 0L && r.getAs[Long]("novelty_bp") <= 10000L))
    assert(bp.forall(r => r.getAs[Long]("n_novel") <= r.getAs[Long]("n_sh")))
  }

  test("store stats: tier rows reconcile with the corpus, dirs bounded by the prefix space") {
    val rows = Dedup.storeStats(spark, sf).collect()
    assert(rows.map(_.getAs[String]("tier")).toSet === Set("groups", "reps", "bands", "bbits"))
    val byTier = rows.map(r => r.getAs[String]("tier") -> r).toMap
    // at test SF the store sits below the prune threshold, so the
    // health report honestly states the FLAT layout (l=0, one dir per
    // tier); the leveled branch is pinned by SignatureStoreSpec's
    // forced-tiny-dirRows drills
    val l = rows.head.getAs[Long]("layout_l")
    assert(l >= 0L && l <= 4L)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(byTier("groups").getAs[Long]("n_rows") === nDocs)
    val nReps = byTier("reps").getAs[Long]("n_rows")
    assert(nReps <= nDocs && nReps > 0L)
    assert(byTier("bands").getAs[Long]("n_rows") === 4L * nReps)
    assert(byTier("bbits").getAs[Long]("n_rows") === nReps)
    for (r <- rows) {
      val dirs = r.getAs[Long]("n_dirs")
      assert(dirs >= 1L && dirs <= math.pow(16, l.toDouble).toLong)
      assert(r.getAs[Long]("rows_per_dir") === r.getAs[Long]("n_rows") / math.max(dirs, 1L))
    }
  }

  test("assortativity: one summary row, Cauchy-Schwarz bound, incidence count is 2|E|") {
    val r = Dedup.graphAssortativity(spark, sf).head()
    val (n, cov, varn, bp) =
      (r.getAs[Long]("n_inc"), r.getAs[Long]("cov_num"), r.getAs[Long]("var_num"), r.getAs[Long]("assort_bp"))
    assert(n % 2 === 0, "each undirected edge contributes exactly two incidences")
    assert(varn >= 0L)
    assert(math.abs(cov) <= varn, "|r| <= 1: covariance bounded by the (symmetric) variance")
    assert(bp >= -10000L && bp <= 10000L)
    val census = Dedup.graphTriangles(spark, sf).head()
    assert(n === 2L * census.getAs[Long]("n_edges"))
  }

  test("row-local minhash signatures are bit-identical to the groupBy signature pass") {
    val normed = graft.sources.Tables
      .documents(spark, sf)
      .select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
    val viaGroupBy = Dedup.minhashSignatures(Dedup.shinglesOf(normed).distinct())
    val rowLocal   = Dedup.minhashSignaturesOf(normed)
    assert(rowLocal.exceptAll(viaGroupBy).count() === 0, "row-local signatures diverge")
    assert(viaGroupBy.exceptAll(rowLocal).count() === 0, "row-local path dropped signatures")
  }

  test("bloom prefilter: no false negatives, flags nested, hit counts bounded") {
    val df = Dedup.bloomPrefilter(spark, sf).cache()
    try {
      assert(df.count() > 0)
      // a Bloom filter admits false positives, NEVER false negatives:
      // every exact hit's probe positions are set by construction
      assert(df.filter(col("n_bloom_hit") < col("n_exact_hit")).count() === 0)
      assert(df.filter(col("is_contaminated") && !col("is_candidate")).count() === 0)
      assert(df.filter(col("n_bloom_hit") > col("n_sh") || col("n_exact_hit") > col("n_sh")).count() === 0)
      assert(df.filter(col("bloom_micro") > 1000000 || col("exact_micro") > 1000000).count() === 0)
    } finally df.unpersist()
  }

  test("source overlap: full pair frame, set laws hold, exact tier non-vacuous") {
    val df = Dedup.sourceOverlap(spark, sf).cache()
    try {
      val nSrc = spark.read
        .parquet(s"$sf/documents.parquet")
        .select(col("source"))
        .distinct()
        .count()
      assert(df.count() === nSrc * (nSrc - 1) / 2, "pair frame is not the full source matrix")
      // set algebra on the exact tier
      assert(df.filter(col("exact_inter") > least(col("exact_a"), col("exact_b"))).count() === 0)
      assert(df.filter(col("exact_union") =!= col("exact_a") + col("exact_b") - col("exact_inter")).count() === 0)
      assert(df.filter(col("est_inter") > col("est_union")).count() === 0)
      // the corpus shares boilerplate shingles across sources, so the
      // overlap question must have a non-zero answer somewhere
      assert(df.agg(sum(col("exact_inter"))).head().getLong(0) > 0, "no cross-source overlap found — vacuous")
    } finally df.unpersist()
  }

  test("winnowing pairs: invariants hold and a planted verbatim copy is caught at full overlap") {
    import spark.implicits._
    val rows = Dedup.winnowingPairs(spark, sf).collect()
    for (r <- rows) {
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared") >= 2L)
      assert(
        r.getAs[Long]("n_shared") <= math.min(r.getAs[Long]("n_fp_a"), r.getAs[Long]("n_fp_b")),
        "shared prints exceed a doc's own selection"
      )
      assert(r.getAs[Long]("overlap_bp") <= 10000L)
    }
    // planted copy: doc 9001 is doc 9000 verbatim — the winnowing
    // guarantee makes the pair unmissable with identical print sets
    val dir = java.nio.file.Files.createTempDirectory("graft_winpairs").toString
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    Seq(
      (9000L, body, "en", "s0", body.length.toLong),
      (9001L, body, "en", "s1", body.length.toLong),
      (9002L, "totally different words entirely here now yes", "en", "s2", 46L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Dedup.winnowingPairs(spark, dir).collect()
    assert(planted.length === 1)
    assert(planted.head.getAs[Long]("doc_a") === 9000L && planted.head.getAs[Long]("doc_b") === 9001L)
    assert(planted.head.getAs[Long]("overlap_bp") === 10000L, "verbatim copy did not score full overlap")
  }

  test("ngram curve: sharing shrinks as n grows, containments lawful, n=3 leg agrees with contamination_ngram") {
    val rows = Dedup.contaminationNgramCurve(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (sh, na, nb, c) = (
        r.getAs[Long]("n_shared"),
        r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"),
        r.getAs[Long]("contain_small_micro")
      )
      assert(sh >= 1L && sh <= math.min(na, nb))
      assert(c === sh * 1000000L / math.min(na, nb) && c <= 1000000L)
    }
    // longer shingles only match inside runs whose shorter sub-shingles
    // matched, and each shared run contributes fewer n-grams as n grows;
    // distinct-count monotonicity is not a theorem (repetitive text can
    // invert it) but holds on this fixed corpus — pinned as measured
    // behavior, verified at both local SFs
    val byPair = rows.groupBy(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")))
    for ((_, rs) <- byPair) {
      val byN = rs.map(r => r.getAs[Long]("n") -> r.getAs[Long]("n_shared")).toMap
      for (Seq(a, b) <- Seq(3L, 5L, 8L).filter(byN.contains).sliding(2) if byN.contains(a) && byN.contains(b))
        assert(byN(a) >= byN(b), s"shared mass grew from n=$a to n=$b")
    }
    // the n=3 leg must reproduce contamination_ngram's shared counts
    val leg3 = rows
      .filter(_.getAs[Long]("n") === 3L)
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> r.getAs[Long]("n_shared"))
      .toMap
    val base = Dedup
      .contaminationNgram(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> r.getAs[Long]("n_shared"))
      .toMap
    for ((k, v) <- base if v > 0) assert(leg3.get(k).contains(v), s"pair $k: curve ${leg3.get(k)} != base $v")
  }

  test("modularity: books lawful, Q in range, LPA communities refine the CC components") {
    val r = Dedup.modularity(spark, sf).head()
    val (n, m, comm, intra, q) = (
      r.getAs[Long]("n_nodes"),
      r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_communities"),
      r.getAs[Long]("intra_edges"),
      r.getAs[Long]("modularity_bp")
    )
    assert(n > 0L && m > 0L)
    assert(comm >= 1L && comm <= n)
    assert(intra <= m)
    // Q ∈ (−1, 1) structurally; near-dup candidate graphs are
    // community-shaped by construction, so Q must be positive here
    assert(q > -10000L && q < 10000L)
    assert(q > 0L, s"modularity $q bp: LPA found no structure on a clustered-by-construction graph")
    // LPA communities can only REFINE connected components (labels
    // never cross an edgeless gap), so there are at least as many
    // communities as components
    val nCc = Dedup.clusters(spark, sf).select(col("cluster_id")).distinct().count()
    assert(comm >= nCc)
  }

  test("norm ablation: tiers monotone (coarser keys, fewer groups, more dup mass)") {
    val rows = Dedup
      .normAblation(spark, sf)
      .collect()
      .map(r => r.getAs[String]("tier") -> r)
      .toMap
    assert(rows.keySet === Set("raw", "casefold", "norm"))
    val n = rows("raw").getAs[Long]("n_docs")
    assert(rows.values.forall(_.getAs[Long]("n_docs") === n), "every tier sees the whole corpus")
    // each tier's key is a function of the previous one: groups can
    // only merge, never split, so dup mass is monotone non-decreasing
    def g(t: String) = rows(t).getAs[Long]("n_groups")
    def d(t: String) = rows(t).getAs[Long]("n_dup_docs")
    assert(g("raw") >= g("casefold") && g("casefold") >= g("norm"))
    assert(d("raw") <= d("casefold") && d("casefold") <= d("norm"))
    for (r <- rows.values) {
      assert(r.getAs[Long]("n_groups") <= n)
      assert(r.getAs[Long]("dup_bp") === r.getAs[Long]("n_dup_docs") * 10000L / n)
      // dup docs live in groups of >= 2, so they can't exceed
      // n − (groups that are singletons)… the cheap law: dup ≤ n
      assert(r.getAs[Long]("n_dup_docs") <= n)
    }
    // the full-norm tier must agree with dedup_exact's group books
    val exactDup = Dedup
      .exact(spark, sf)
      .filter(col("n_docs") >= 2)
      .agg(coalesce(sum(col("n_docs")), lit(0L)))
      .head()
      .getLong(0)
    assert(d("norm") === exactDup, "norm tier disagrees with dedup_exact on the same corpus")
  }

  test("minhash k curve: three budgets on one pair frame, error shrinking with slots") {
    val rows = Dedup.minhashKCurve(spark, sf).collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(4L, 8L, 12L))
    // one pair frame: every budget scores the same candidate pairs
    assert(rows.map(_.getAs[Long]("n_pairs")).distinct.length === 1)
    assert(rows.head.getAs[Long]("n_pairs") > 0L)
    for (r <- rows) {
      val (mean, mx) = (r.getAs[Long]("mean_abs_err_micro"), r.getAs[Long]("max_abs_err_micro"))
      assert(mean >= 0L && mean <= mx && mx <= 1000000L)
      // a K-slot estimate moves in 10⁶/K steps, so its error can never
      // resolve finer than half a step on average... but it CAN be 0;
      // only the upper law is structural: max ≤ 1e6 (both sides in
      // [0, 1e6]).
    }
    // more slots buy accuracy on this fixed corpus (deterministic
    // data, so this pins the measured curve, not a probabilistic law)
    val m = rows.map(r => r.getAs[Long]("k") -> r.getAs[Long]("mean_abs_err_micro")).toMap
    assert(m(12L) <= m(4L), s"12-slot mean error ${m(12L)} above the 4-slot ${m(4L)}")
  }

  test("prefix filter is exact-recall at tau: every LSH-verified jac>=0.8 pair is in the prefix-filter result") {
    // the prefix theorem guarantees 100% recall at the threshold; the
    // banded LSH matcher can only MISS pairs — so the LSH-verified set
    // (same 3-gram shingle unit, same exact-Jaccard verification) must
    // embed in the prefix-filter result. The reverse direction is the
    // LSH recall gap dedup_recall_eval measures.
    val exact = Dedup
      .prefixFilterPairs(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .cache()
    val lsh = Dedup
      .ngramJaccard(spark, sf)
      .filter(col("is_dup") === 1L && col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    try {
      val missed = lsh.exceptAll(exact).count()
      assert(missed === 0L, s"$missed LSH-verified pairs missing from the exact-recall prefix filter")
    } finally exact.unpersist()
  }

  test("louvain levels: Q-acceptance gate rejects the symmetric-ring collapse, keeps Q monotone") {
    import spark.implicits._
    // 16 triangles in a ring, single inter-clique links — level 1 finds
    // the cliques; level 2's simultaneous apply chains EVERY clique
    // into one community around the cycle (the relaxation's classic
    // pathology), which would crater Q — the gate must reject it
    val k = 16; val c = 3
    val clique = for (i <- 0 until k; x <- 0 until c; y <- x + 1 until c)
      yield ((i * c + x).toLong, (i * c + y).toLong)
    val ring = for (i <- 0 until k) yield ((i * c + c - 1).toLong, (((i + 1) % k) * c).toLong)
    val pairs = (clique ++ ring).map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.toDF("doc_a", "doc_b")
    val rows = Dedup.louvainLevelsFrom(spark, pairs, 3).orderBy("level").collect()
    assert(rows.map(_.getAs[Long]("m_w")).toSet === Set((k * 3 + k).toLong), "total weight not invariant under contraction")
    val q = rows.map(_.getAs[Long]("q_bp"))
    assert(q.zip(q.tail).forall { case (a, b) => b >= a }, s"Q not monotone: ${q.toSeq}")
    val l1 = rows(0); val l2 = rows(1)
    assert(l1.getAs[Long]("accepted") === 1L && l1.getAs[Long]("n_communities") === k.toLong,
      "level 1 should find exactly the cliques")
    assert(l2.getAs[Long]("n_moves") > 0L && l2.getAs[Long]("accepted") === 0L,
      "level 2's whole-ring collapse must be gate-rejected")
    assert(l2.getAs[Long]("q_bp") === l1.getAs[Long]("q_bp"), "a rejected level must not change Q")
  }

  test("louvain levels: contraction lets level 2 make a merge level 1 cannot, Q strictly improves") {
    import spark.implicits._
    // 8 dumbbells (clique pairs joined by a DOUBLE link) in a weak
    // ring: level 1 collapses each dumbbell; level 2 runs on the
    // CONTRACTED graph where the asymmetric weights let supernode
    // merges clear the gate — the multi-level payoff in one number
    val k = 8; val c = 3
    def n(pair: Int, side: Int, x: Int): Long = ((pair * 2 + side) * c + x).toLong
    val clique = for (p <- 0 until k; sd <- 0 to 1; x <- 0 until c; y <- x + 1 until c)
      yield (n(p, sd, x), n(p, sd, y))
    val pairLinks = for (p <- 0 until k; x <- 0 to 1) yield (n(p, 0, x), n(p, 1, x))
    val ring = for (p <- 0 until k) yield (n(p, 1, 2), n((p + 1) % k, 0, 2))
    val pairs = (clique ++ pairLinks ++ ring).map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.toDF("doc_a", "doc_b")
    val rows = Dedup.louvainLevelsFrom(spark, pairs, 4).orderBy("level").collect()
    val q = rows.map(_.getAs[Long]("q_bp"))
    assert(q.zip(q.tail).forall { case (a, b) => b >= a }, s"Q not monotone: ${q.toSeq}")
    val l2 = rows(1)
    assert(l2.getAs[Long]("accepted") === 1L && l2.getAs[Long]("q_bp") > rows(0).getAs[Long]("q_bp"),
      "level 2 should accept a Q-improving supernode merge")
    assert(l2.getAs[Long]("n_communities") < rows(0).getAs[Long]("n_communities"),
      "level 2 must coarsen the level-1 partition")
    // convergence: once a level proposes no moves, later levels are
    // exact no-ops (same Q, same community count)
    val l3 = rows(2); val l4 = rows(3)
    assert(l3.getAs[Long]("n_moves") === 0L)
    assert(l4.getAs[Long]("q_bp") === l3.getAs[Long]("q_bp")
      && l4.getAs[Long]("n_communities") === l3.getAs[Long]("n_communities"))
    // the composed final labels expose the level-2 coarsening: as many
    // distinct communities as the ledger's last row, every node labeled
    val labels = Dedup.louvainLabelsFrom(spark, pairs, 4)
    assert(labels.select("doc_id").distinct().count() === 2L * k * c, "every graph node gets a community")
    assert(labels.select("community").distinct().count() === l4.getAs[Long]("n_communities"),
      "final label count must equal the ledger's last level")
  }

  test("paragraph dedup: keep-first accounting — corpus keeps exactly one occurrence per distinct segment") {
    val r = Dedup.dedupParagraph(spark, sf).cache()
    try {
      // per-doc sanity: never keep more than you have, ledger covers every doc
      assert(r.filter(col("n_kept") > col("n_segs")).count() === 0)
      assert(r.count() === spark.read.parquet(s"$sf/documents.parquet").count())
      // global keep-first property: total kept == DISTINCT segment count,
      // recomputed independently from the raw corpus
      val distinctSegs = spark.read.parquet(s"$sf/documents.parquet")
        .select(Dedup.normText(col("text")).as("norm"))
        .withColumn("toks", split(col("norm"), " "))
        .select(explode(expr(
          "transform(sequence(0, CAST((size(toks) - 1) DIV 8 AS INT)), " +
            "i -> array_join(slice(toks, i * 8 + 1, 8), ' '))")).as("seg"))
        .agg(countDistinct(col("seg"))).head().getLong(0)
      assert(r.agg(sum(col("n_kept"))).head().getLong(0) === distinctSegs,
        "kept total must equal the corpus' distinct segment count (keep-first keeps exactly one each)")
      // the corpus has real duplicate segments, so the pass must drop some
      assert(r.filter(col("n_kept") < col("n_segs")).count() > 0, "drill corpus has no duplicate segments?")
    } finally { r.unpersist(): Unit }
  }
}
