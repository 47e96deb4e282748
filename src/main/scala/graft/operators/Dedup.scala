package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Training-data deduplication over the `documents` corpus: exact
  * (hash groups), MinHash+LSH candidates, n-gram Jaccard verification,
  * SimHash near-dups, and embedding-cosine near-dups.
  *
  * Scale posture: nothing here is O(n²) over the corpus. Every
  * all-pairs step is bucketed first — LSH band signatures for MinHash,
  * 16-bit simhash blocks (pigeonhole: hamming<=3 ⇒ one of 4 blocks
  * equal), label buckets for embeddings — so pair generation is a
  * shuffle join on the bucket key and the quadratic blowup is confined
  * to within-bucket groups. That is the only shape that survives a
  * 100 TB corpus.
  *
  * Hashing discipline: all hashes are md5-hex over explicit strings
  * (graft.functions.PortableHash), so signatures are engine-portable.
  *
  * CACHING CONTRACT (enforced in code): the multi-consumer operators
  * (minhashLsh, ngramJaccard, simhash, clusters, …) persist shared
  * intermediates (shingle sets, band/simhash signatures, candidate
  * pairs) because each feeds 2-3 downstream joins of the RETURNED lazy
  * plan — the cache cannot be released before the caller materializes
  * the result. Each operator therefore registers a one-shot
  * QueryExecutionListener ([[releaseAfterRun]]) that unpersists its
  * intermediates as soon as ANY query touching them completes — i.e.
  * right after the caller's first action on the returned frame — so a
  * library consumer never accumulates stale cache blocks (DedupSpec
  * asserts the cache manager drains).
  */
object Dedup {

  /** normalization every text operator shares: lowercase, strip
    * non-alphanumerics, collapse whitespace.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  private def docsNorm(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), normText(col("text")).as("norm"))

  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  /** The caching contract as code: register a one-shot listener that
    * unpersists `cached` once any completed query's plan contains one
    * of them — in the normal flow, the caller's first action on
    * `result` (whose plan reads every cached frame). Firing on a
    * different query that happens to share the subtree only releases
    * the cache early, which costs recompute, never correctness. The
    * listener deregisters itself after firing.
    */
  private[graft] def releaseAfterRun(
      spark: SparkSession,
      result: DataFrame,
      cached: Seq[DataFrame]
  ): DataFrame = {
    val plans = cached.map(_.queryExecution.analyzed)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def touches(qe: org.apache.spark.sql.execution.QueryExecution): Boolean =
        qe.analyzed.exists(node => plans.exists(p => node.sameResult(p)))
      private def release(): Unit = if (fired.compareAndSet(false, true)) {
        cached.foreach(_.unpersist(false))
        spark.listenerManager.unregister(this)
      }
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (!fired.get() && touches(qe)) release()
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
        if (!fired.get() && touches(qe)) release()
    }
    spark.listenerManager.register(listener)
    result
  }

  /** Default per-bucket cap for LSH pair generation. Within-bucket
    * pairing is O(b²) on one reducer; the cap bounds that to cap²/2
    * pairs (~5×10^7 at the default) no matter how degenerate the
    * corpus. Post-collapse buckets only reach this size when a huge
    * NEAR-duplicate (not exact) family collides — the drop is logged
    * so the pipeline owner sees what was skipped.
    */
  private[graft] val DefaultBucketCap = 10000

  /** Anchor document-frequency cap for [[contaminationLongMatch]]: an
    * 8-token anchor at more positions than this on one side is
    * boilerplate, not contaminated content, and is dropped from pair
    * generation (E·T join fan-out bound). Mirrored verbatim in the
    * DuckDB oracle.
    */
  private[graft] val AnchorDfCap = 64

  /** word 3-gram shingles per document (0-based transform over the
    * token array — array work stays inside codegen, no explode until
    * the shingle stream itself is needed).
    */
  private[graft] def shingles(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    shinglesOf(docsNorm(spark, dir), n)

  /** shingles over an arbitrary (doc_id, norm) frame — the rep-level
    * pipelines shingle only canonical representatives.
    */
  private[graft] def shinglesOf(normed: DataFrame, n: Int = 3): DataFrame =
    normed
      .select(col("doc_id"), split(col("norm"), " ").as("toks"))
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("toks")) >= n,
            expr(
              s"transform(sequence(0, size(toks) - $n), i -> " +
                (0 until n).map(o => s"toks[i + $o]").mkString("concat_ws(' ', ", ", ", ")") + ")"
            )
          ).otherwise(array())
        ).as("shingle")
      )

  // -------------------------------------------------------------------
  // 21. dedup_exact — hash groups over normalized text. One shuffle on
  // the 128-bit content hash; group sizes and canonical representative
  // fall out of the same agg.
  // -------------------------------------------------------------------
  def exact(spark: SparkSession, dir: String): DataFrame =
    docsNorm(spark, dir)
      .groupBy(md5(col("norm")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))

  // -------------------------------------------------------------------
  // 22. dedup_exact_keep_first — canonical-representative selection:
  // every doc mapped to the min doc_id of its hash group.
  // -------------------------------------------------------------------
  def exactKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("text_hash"))
    docsNorm(spark, dir)
      .withColumn("text_hash", md5(col("norm")))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(
        col("doc_id"),
        col("canonical_id"),
        when(col("doc_id") =!= col("canonical_id"), 1L).otherwise(0L).as("is_dup")
      )
  }

  // -------------------------------------------------------------------
  // Skew-safe LSH core. Real crawl corpora carry 10^4-10^6-copy EXACT
  // duplicate clusters (boilerplate, license text); every copy lands in
  // the same band bucket, so naive within-bucket pairing emits ~b²/2
  // pairs from ONE reducer key. The fix (every pair family below uses
  // it): (1) collapse exact-dup groups to their canonical
  // representative BEFORE shingling/banding — clones never even reach
  // the signature pipeline; (2) cap any bucket that still survives
  // oversized, with a logged drop; (3) re-expand rep-level pairs to
  // member pairs afterward, where the output contract needs them.
  // -------------------------------------------------------------------

  /** Exact-duplicate collapse: `groups` maps every doc to the min
    * doc_id of its md5(norm) group; `reps` holds one (doc_id, norm)
    * row per distinct text. One shuffle on the content hash — the same
    * shuffle dedup_exact already pays.
    */
  private[graft] case class ExactCollapse(groups: DataFrame, reps: DataFrame)

  private[graft] def collapseExact(normed: DataFrame): ExactCollapse = {
    val g = normed.withColumn(
      "rep_id",
      min(col("doc_id")).over(Window.partitionBy(md5(col("norm"))))
    )
    ExactCollapse(
      g.select(col("doc_id"), col("rep_id")),
      g.filter(col("doc_id") === col("rep_id")).select(col("doc_id"), col("norm"))
    )
  }

  /** Drop buckets larger than `cap` from a bucketed signature table
    * (keys = the bucket columns). The common case — no oversized
    * buckets — costs one aggregation over the (persisted) input and
    * keeps the plan untouched; the drop path logs how many buckets
    * were skipped so the loss is observable, and broadcasts the tiny
    * oversized-key set into an anti-join.
    */
  private[graft] def dropOversizedBuckets(
      bucketed: DataFrame,
      keys: Seq[String],
      cap: Int,
      what: String,
      // eager (default): count first — the common no-oversize case
      // keeps the original plan untouched and the drop is LOGGED.
      // lazy: skip the decision job and anti-join unconditionally —
      // one job total, for callers that pay the cap on every run
      // (the oversized aggregate builds inside the join's broadcast)
      eager: Boolean = true
  ): DataFrame = {
    val over = bucketed
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)
    if (!eager) bucketed.join(broadcast(over.select(keys.map(col): _*)), keys, "left_anti")
    else {
      val nOver = over.count()
      if (nOver == 0) bucketed
      else {
        log.warn(
          s"$what: dropping $nOver oversized LSH bucket(s) (> $cap members) from pair generation"
        )
        bucketed.join(broadcast(over.select(keys.map(col): _*)), keys, "left_anti")
      }
    }
  }

  /** Rep-level LSH pair generation: band signatures over canonical
    * representatives only, oversized buckets capped, bucket-local
    * self-join. `banded` is the set of reps that produced ≥1 band
    * (i.e. had ≥1 shingle) — the member expansion needs it to decide
    * which exact-dup groups pair among themselves.
    */
  private[graft] case class RepLsh(pairs: DataFrame, banded: DataFrame, bands: DataFrame)

  private[graft] def lshRepPairsFrom(repUniq: DataFrame, bucketCap: Int = DefaultBucketCap): RepLsh =
    lshRepPairsFromBands(bandSignaturesFrom(repUniq), bucketCap)

  /** The shuffle-free entry: band signatures straight off the reps'
    * normalized text via the row-local signature path — for consumers
    * that only need pairs/bands, never the shingle table.
    */
  private[graft] def lshRepPairsFromNormed(reps: DataFrame, bucketCap: Int = DefaultBucketCap): RepLsh =
    lshRepPairsFromBands(bandSignaturesFromSigs(minhashSignaturesOf(reps)), bucketCap)

  private def lshRepPairsFromBands(bandsIn: DataFrame, bucketCap: Int): RepLsh = {
    val bands = bandsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.count()
    val safe = dropOversizedBuckets(bands, Seq("band", "sig"), bucketCap, "minhash-lsh")
    val pairs = safe
      .as("a")
      .join(
        safe.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    RepLsh(pairs, bands.select(col("doc_id")).distinct(), bands)
  }

  /** Expand rep-level pairs (doc_a, doc_b = canonical ids, plus any
    * carried score columns) to member-level pairs: cross-group pairs
    * via two joins on the group table, within-group pairs (exact
    * clones of a rep that has ≥1 band — identical text shares ALL
    * bands, so the un-collapsed pipeline would emit them) via a
    * rep_id-bucketed self-join. Output ids are (least, greatest)
    * ordered, matching the a<b contract. `withinValues` supplies the
    * carried columns for within-group pairs (identical docs: J = 1,
    * hamming = 0, all signature slots agree — known without scoring).
    */
  private[graft] def expandMemberPairs(
      repPairs: DataFrame,
      groups: DataFrame,
      banded: DataFrame,
      carried: Seq[String] = Nil,
      withinValues: Seq[Column] = Nil
  ): DataFrame = {
    val carry = carried.map(col)
    val cross = repPairs
      .join(groups.select(col("rep_id").as("doc_a"), col("doc_id").as("m_a")), Seq("doc_a"))
      .join(groups.select(col("rep_id").as("doc_b"), col("doc_id").as("m_b")), Seq("doc_b"))
      .select(
        least(col("m_a"), col("m_b")).as("doc_a") +:
          greatest(col("m_a"), col("m_b")).as("doc_b") +: carry: _*
      )
    // banded is unique per rep (one row per canonical doc), so the
    // inner join is a semi-join that additionally exposes any
    // rep-level value columns `withinValues` wants to carry.
    val within = groups
      .as("x")
      .join(groups.as("y"), col("x.rep_id") === col("y.rep_id") && col("x.doc_id") < col("y.doc_id"))
      .join(banded.withColumnRenamed("doc_id", "b_rep"), col("x.rep_id") === col("b_rep"))
      .select(
        col("x.doc_id").as("doc_a") +: col("y.doc_id").as("doc_b") +:
          withinValues.zip(carried).map { case (c, n) => c.as(n) }: _*
      )
    cross.union(within)
  }

  /** MinHash signatures: K seeded md5 min-hashes over the shingle set.
    * Computed as K conditional-min aggregates in ONE groupBy pass —
    * partial aggregation reduces each partition to one signature row
    * per doc before the shuffle.
    */
  private[graft] val K = 12
  private val Bands = 4 // 4 bands x 3 rows

  /** distinct (doc, shingle) — the set both the MinHash signatures and
    * the Jaccard verification are defined over (min over a multiset ==
    * min over its set, so signatures are unaffected).
    */
  private def uniqShingles(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir).distinct()

  /** Fixed universal-hash constants for the K min-wise slots:
    * slot_j(x) = (A_j·x + B_j) mod p over the Mersenne prime
    * p = 2⁶¹−1, with the 60-bit digest prefix as x. Each slot's
    * element ORDER is scrambled independently (the property a naive
    * h1 + j·h2 double-hash lacks — there one low-hash shingle wins
    * many slots, slots correlate, and banded candidate sets explode;
    * measured as a 10× CC blow-up before this form). A_j < 2³¹ keeps
    * the split multiply in exact LONG arithmetic AND makes every slot
    * INJECTIVE on the 60-bit domain: p is prime and both a and (x−y)
    * are nonzero below p, so a·(x−y) ≢ 0 (mod p) — two distinct
    * digest prefixes can never collide within a slot.
    */
  private[graft] val MhP61: Long = 2305843009213693951L // 2^61 - 1
  private[graft] val MhA: Seq[Long] = Seq(894684356L, 21838115L, 1772117479L, 641324194L,
    791158068L, 415884587L, 1215493283L, 347221958L, 266861099L, 929723558L, 1207054355L, 374399941L)
  private[graft] val MhB: Seq[Long] = Seq(1573429661L, 1761311798L, 1724103795L, 1836395613L,
    2000992392L, 580346373L, 936793384L, 801148508L, 1877275096L, 560686510L, 1346933383L, 1313764614L)

  /** One slot's SQL over the split base hash (xh, xl) = (hm ÷ 2³⁰,
    * hm mod 2³⁰) — shared verbatim with the DuckDB oracles
    * (SparkEntry generates their CTEs from the same constants):
    *
    *   a·hm = (a·xh)·2³⁰ + a·xl,  and with t = a·xh = th·2³¹ + tl:
    *   t·2³⁰ = th·2⁶¹ + tl·2³⁰ ≡ th + tl·2³⁰  (mod 2⁶¹−1)
    *
    * so slot = (th + tl·2³⁰ + a·xl + b) mod p. Magnitudes: t < 2⁶¹,
    * th < 2³⁰, tl·2³⁰ < 2⁶¹, a·xl < 2⁶¹ — the sum < 3·2⁶¹ < 2⁶³,
    * every intermediate exact in signed 64-bit on both engines, and
    * all operands non-negative so truncating division == floor.
    */
  private[graft] def mhSlotSql(j: Int): String = {
    val (a, b) = (MhA(j), MhB(j))
    s"((${a}L * xh) DIV 2147483648L + ((${a}L * xh) % 2147483648L) * 1073741824L + ${a}L * xl + ${b}L) % ${MhP61}L"
  }

  /** per-doc MinHash signature row: doc_id, mh0..mh{K-1} (K integer
    * mins in ONE groupBy pass) — ONE md5 per shingle (the dedup
    * family's dominant cost, K-fold cheaper than K seeded md5s), with
    * the K slots drawn from the (a·x + b) mod p family over the FULL
    * 60-bit digest prefix, p = 2⁶¹−1 via split multiply ([[mhSlotSql]]).
    * All intermediates < 2⁶³, so ANSI arithmetic is exact and the
    * DuckDB oracle replays the identical integers.
    *
    * This is the r9 verdict's named upgrade from the 31-bit family:
    * there all K slots were affine maps of ONE 31-bit base hash, so a
    * ~10⁵-shingle doc expected a within-doc base collision near the
    * 2³¹ birthday bound (every slot colliding at once). Over 60 bits
    * the birthday bound moves to ~2³⁰ shingles — beyond any real
    * document — and each slot is injective on the domain, so the only
    * residual collision source is the 60-bit digest prefix itself.
    */
  private[graft] def minhashSignatures(uniq: DataFrame): DataFrame = {
    val withH = uniq
      .withColumn("g", md5(col("shingle")))
      .withColumn("h60", expr("CAST(conv(substring(g, 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("xh", expr("h60 DIV 1073741824L"))
      .withColumn("xl", expr("h60 % 1073741824L"))
    val mins = (0 until K).map(j => min(expr(mhSlotSql(j))).as(s"mh$j"))
    withH.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** The same K signatures WITHOUT the shingle-distinct shuffle: min
    * over the span MULTISET equals min over its set, so the distinct
    * is pure overhead — the explode stays pipeline-local (no
    * exchange) and the groupBy's map-side combine collapses each
    * partition to one signature row per doc BEFORE its shuffle, so
    * the only exchange is DOC-grain (docs × K hex strings), never
    * token-grain. Signatures are bit-identical to
    * [[minhashSignatures]] over distinct shingles (DedupSpec pins
    * it). Kept as codegen'd explode + hash-aggregate on purpose: a
    * fully row-local HOF variant (array_min of transform per slot)
    * measured ~6× slower because higher-order functions evaluate
    * interpreted (tools/SigBench).
    */
  private[graft] def minhashSignaturesOf(normed: DataFrame, n: Int = 3): DataFrame =
    minhashSignatures(shinglesOf(normed, n))

  private[graft] def bandSignaturesFrom(uniq: DataFrame): DataFrame =
    bandSignaturesFromSigs(minhashSignatures(uniq))

  /** Band signatures off an already-computed signature frame — lets a
    * store writer derive bands AND the b-bit tier from ONE signature
    * aggregation instead of re-shingling per artifact.
    */
  private[graft] def bandSignaturesFromSigs(sigs: DataFrame): DataFrame = {
    val rows = K / Bands
    val bandStructs = (0 until Bands).map { b =>
      struct(
        lit(b).as("band"),
        // ':'-joined decimal slots: unambiguous, engine-identical text
        md5(concat_ws(":", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)).as("sig")
      )
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** b-bit signature tier: the LOWEST BIT of each of the K min-hashes
    * (parity of the integer min-hash slot — the same portable rule
    * the b-bit estimator and its oracle use), packed LSB-first into one
    * long. K bits per rep instead of K×128-bit hex strings — the
    * 128× smaller verification tier a 100 TB signature store persists
    * alongside its bands.
    */
  private[graft] def bbitsFromSigs(sigs: DataFrame): DataFrame = {
    val bit = (j: Int) => expr(s"pmod(mh$j, 2)") // slots are non-negative longs
    sigs.select(
      col("doc_id"),
      (0 until K).map(j => shiftleft(bit(j), j)).reduce(_ bitwiseOR _).as("bits")
    )
  }

  // -------------------------------------------------------------------
  // 23. dedup_minhash_lsh — LSH candidate pairs: docs sharing any band
  // signature. Skew-safe: exact-dup groups collapse to their canonical
  // rep BEFORE shingling (clones never reach the signature pipeline),
  // the rep-level self-join shuffles on (band, sig) with oversized
  // buckets capped, and rep pairs re-expand to the member-level
  // contract afterward. Output is identical to the naive per-doc band
  // join — identical texts share ALL bands, so within-group pairs are
  // exactly the groups whose rep has ≥1 band.
  // -------------------------------------------------------------------
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val c = collapseExact(docsNorm(spark, dir))
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lsh = lshRepPairsFromNormed(c.reps)
    releaseAfterRun(spark, expandMemberPairs(lsh.pairs, groups, lsh.banded), Seq(lsh.bands, groups))
  }

  // -------------------------------------------------------------------
  // 23q. dedup_recall_eval — LSH QUALITY EVALUATION: recall and
  // precision of the banded candidate generator against exact n-gram
  // Jaccard ≥ 0.8 ground truth, the numbers bands×rows budgets are
  // tuned against (4 bands × 3 rows ⇒ theoretical recall ≥ 94% at
  // J = 0.8). The exact truth needs the inverted-index shingle join —
  // quadratic in per-shingle doc frequency, the very cost LSH exists
  // to avoid — so the eval runs on a DETERMINISTIC HASH SAMPLE of the
  // corpus (md5-band keep, ~50%; the production practice at 100 TB).
  // Inside the sample the usual skew discipline holds: exact dups
  // collapse to reps before BOTH the truth join and the banding, pairs
  // re-expand to members afterward; the three 1-row count aggregates
  // broadcast into the single summary row.
  // -------------------------------------------------------------------
  def recallEval(spark: SparkSession, dir: String): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val hv = expr(
      "(instr('0123456789abcdef', substring(md5(concat('eval:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(md5(concat('eval:', CAST(doc_id AS STRING))), 2, 1)) - 1)"
    )
    val sampled = docsNorm(spark, dir).withColumn("hv", hv.cast("long")).filter(col("hv") < 128).drop("hv")
    val c = collapseExact(sampled)
    val groups = c.groups.persist(mem)
    groups.count()
    val uniq = shinglesOf(c.reps).distinct().persist(mem)
    uniq.count()
    // candidates: the production banded generator over the sample
    val lsh = lshRepPairsFrom(uniq)
    val cand = expandMemberPairs(lsh.pairs, groups, lsh.banded).persist(mem)
    // truth: exact Jaccard over the shingle inverted index (rep-level,
    // members inherit — identical texts share identical shingle sets)
    val cnt = uniq.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = uniq
      .as("x")
      .join(uniq.as("y"), col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_n"))
    val truthRep = inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .filter(col("inter_n") * 10 >= (col("n_a") + col("n_b") - col("inter_n")) * 8)
      .select(col("doc_a"), col("doc_b"))
    val shingled = uniq.select(col("doc_id")).distinct()
    val truth = expandMemberPairs(truthRep, groups, shingled).persist(mem)
    val hits = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
    val out = truth
      .agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select(
        col("n_truth"),
        col("n_cand"),
        col("n_hits"),
        when(col("n_truth") > 0, expr("n_hits * 10000 DIV n_truth")).otherwise(10000L).as("recall_bp"),
        when(col("n_cand") > 0, expr("n_hits * 10000 DIV n_cand")).otherwise(10000L).as("precision_bp")
      )
    releaseAfterRun(spark, out, Seq(lsh.bands, groups, uniq, cand, truth))
  }

  // -------------------------------------------------------------------
  // 23t. dedup_lsh_tune — the (bands × rows) PARAMETER SWEEP, computed
  // as one query: candidate count, recall and precision vs the exact
  // Jaccard ≥ 0.8 truth for every banding of the K=12 signature —
  // (2×6) strict … (6×2) loose — on the same deterministic eval
  // sample as dedup_recall_eval. This is the tuning CURVE an operator
  // reads before fixing the production banding, and it reuses ONE
  // signature pass: all configs' band keys explode from the same
  // signature rows (15 band rows/rep total) and pair through ONE
  // (cfg, band, sig)-keyed self-join. Because the bandings NEST
  // (every 6-row band is two aligned 3-row bands, etc.), the
  // candidate sets form subset chains (2×6) ⊆ (3×4) ⊆ (6×2) and
  // (2×6) ⊆ (4×3) ⊆ (6×2) — DedupSpec pins that monotonicity.
  // -------------------------------------------------------------------
  private[graft] val TuneConfigs = Seq((2, 6), (3, 4), (4, 3), (6, 2))

  def lshTune(spark: SparkSession, dir: String): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val hv = expr(
      "(instr('0123456789abcdef', substring(md5(concat('eval:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(md5(concat('eval:', CAST(doc_id AS STRING))), 2, 1)) - 1)"
    )
    val sampled = docsNorm(spark, dir).withColumn("hv", hv.cast("long")).filter(col("hv") < 128).drop("hv")
    val c = collapseExact(sampled)
    val groups = c.groups.persist(mem)
    groups.count()
    val uniq = shinglesOf(c.reps).distinct().persist(mem)
    uniq.count()
    val sigs = minhashSignatures(uniq)
    // all configs' band keys off ONE signature row: (cfg, band, sig)
    val bandStructs = TuneConfigs.flatMap { case (bands, rows) =>
      (0 until bands).map { b =>
        struct(
          lit(s"${bands}x$rows").as("cfg"),
          lit(b).as("band"),
          md5(concat_ws(":", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)).as("sig")
        )
      }
    }
    val bk = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.cfg").as("cfg"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .persist(mem)
    bk.count()
    val safe = dropOversizedBuckets(bk, Seq("cfg", "band", "sig"), DefaultBucketCap, "lsh-tune")
    val repCand = safe
      .as("a")
      .join(
        safe.as("b"),
        col("a.cfg") === col("b.cfg") && col("a.band") === col("b.band") &&
          col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.cfg").as("cfg"), col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // member expansion per config (cross-group via the groups table;
    // within-group clone pairs belong to EVERY config — identical
    // texts agree on all bands)
    val cross = repCand
      .join(groups.select(col("rep_id").as("doc_a"), col("doc_id").as("m_a")), Seq("doc_a"))
      .join(groups.select(col("rep_id").as("doc_b"), col("doc_id").as("m_b")), Seq("doc_b"))
      .select(col("cfg"), least(col("m_a"), col("m_b")).as("doc_a"), greatest(col("m_a"), col("m_b")).as("doc_b"))
    val shingled = uniq.select(col("doc_id")).distinct()
    val within = groups
      .as("x")
      .join(groups.as("y"), col("x.rep_id") === col("y.rep_id") && col("x.doc_id") < col("y.doc_id"))
      .join(shingled.withColumnRenamed("doc_id", "b_rep"), col("x.rep_id") === col("b_rep"))
      .crossJoin(
        broadcast(
          spark
            .range(1)
            .select(explode(typedlit(TuneConfigs.map { case (b, r) => s"${b}x$r" })).as("cfg"))
        )
      )
      .select(col("cfg"), col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val cand = cross.union(within).persist(mem)
    // exact truth — identical to dedup_recall_eval's
    val cnt = uniq.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = uniq
      .as("x")
      .join(uniq.as("y"), col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_n"))
    val truthRep = inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .filter(col("inter_n") * 10 >= (col("n_a") + col("n_b") - col("inter_n")) * 8)
      .select(col("doc_a"), col("doc_b"))
    val truth = expandMemberPairs(truthRep, groups, shingled).persist(mem)
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val hits = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
    val out = cand
      .groupBy(col("cfg"))
      .agg(count(lit(1)).as("n_cand"))
      .join(hits.groupBy(col("cfg")).agg(count(lit(1)).as("hits")), Seq("cfg"), "left")
      .withColumn("n_hits", coalesce(col("hits"), lit(0L)))
      .crossJoin(broadcast(nTruth))
      .select(
        col("cfg"),
        col("n_truth"),
        col("n_cand"),
        col("n_hits"),
        when(col("n_truth") > 0, expr("n_hits * 10000 DIV n_truth")).otherwise(10000L).as("recall_bp"),
        when(col("n_cand") > 0, expr("n_hits * 10000 DIV n_cand")).otherwise(10000L).as("precision_bp")
      )
    releaseAfterRun(spark, out, Seq(groups, uniq, bk, cand, truth))
  }

  // -------------------------------------------------------------------
  // 23r. graph_triangles — TRIANGLE CENSUS over the rep-level LSH
  // candidate graph: triangle count + global clustering coefficient,
  // the graph-shape diagnostic that separates boilerplate families
  // (dense cliques — transitivity ≈ 1) from chain-like false-positive
  // candidate paths (transitivity ≈ 0). The enumeration is the
  // classic DEGREE-ORDERED ORIENTATION: each undirected edge points
  // from its (degree, id)-smaller endpoint, every triangle is counted
  // exactly once from its lowest-ordered corner, and a high-degree hub
  // contributes wedges only through its few LOWER-ordered neighbors —
  // the skew bound that makes the join feasible on power-law graphs
  // (wedge work is Σ out-deg², out-deg ≤ √(2|E|)). Wedge total for
  // the coefficient is the closed form Σ d(d−1)/2 off the degree
  // table. Single summary row via 1-row count broadcasts.
  // -------------------------------------------------------------------
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // edges come off the PERSISTED candidate tier (GraphTier) — a
    // dashboard query reads a table; the LSH pipeline ran at ingest
    val edges = graft.sources.GraphTier.repEdges(spark, dir).persist(mem) // doc_a < doc_b, distinct, rep-level
    edges.count()
    val deg = edges
      .select(col("doc_a").as("node"))
      .unionAll(edges.select(col("doc_b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))
      .persist(mem)
    // total order key: (degree, id) packed into one long — no global
    // rank window over a corpus-scaled node set
    val key = (d: Column, id: Column) => d * lit(4294967296L) + id
    val keyed = edges
      .join(deg.select(col("node").as("doc_a"), col("deg").as("da")), Seq("doc_a"))
      .join(deg.select(col("node").as("doc_b"), col("deg").as("db")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        key(col("da"), col("doc_a")).as("ka"),
        key(col("db"), col("doc_b")).as("kb")
      )
    val oriented = keyed
      .select(
        when(col("ka") < col("kb"), col("doc_a")).otherwise(col("doc_b")).as("src"),
        when(col("ka") < col("kb"), col("doc_b")).otherwise(col("doc_a")).as("dst"),
        least(col("ka"), col("kb")).as("ksrc"),
        greatest(col("ka"), col("kb")).as("kdst")
      )
      .persist(mem)
    oriented.count()
    val wedgePairs = oriented
      .as("x")
      .join(oriented.as("y"), col("x.src") === col("y.src") && col("x.kdst") < col("y.kdst"))
      .select(col("x.dst").as("v"), col("y.dst").as("w"))
    val triangles = wedgePairs.join(
      oriented.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"),
      "left_semi"
    )
    val out = deg
      .agg(count(lit(1)).as("n_nodes"), coalesce(sum(expr("deg * (deg - 1) DIV 2")), lit(0L)).as("n_wedges"))
      .crossJoin(broadcast(edges.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(triangles.agg(count(lit(1)).as("n_triangles"))))
      .select(
        col("n_nodes"),
        col("n_edges"),
        col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0, expr("n_triangles * 3 * 10000 DIV n_wedges"))
          .otherwise(0L)
          .as("transitivity_bp")
      )
    releaseAfterRun(spark, out, Seq(edges, deg, oriented))
  }

  // -------------------------------------------------------------------
  // 23r2. graph_clustering_coeff — PER-NODE clustering coefficient
  // over the same rep-level candidate graph as graph_triangles: for
  // each node, its triangle participation count against its wedge
  // budget d(d−1)/2 — the LOCAL transitivity that separates a doc
  // sitting inside a boilerplate clique (coeff → 10000) from a hub
  // whose candidates are unrelated to each other (coeff → 0), which is
  // exactly the triage signal for LSH false-positive hubs. Same
  // degree-ordered orientation as the census, but the enumeration
  // KEEPS all three corners (apex, v, w) and explodes each confirmed
  // triangle into its three node increments — one extra bounded
  // groupBy over 3×|triangles| rows; wedge work unchanged
  // (Σ out-deg², out-deg ≤ √(2|E|)).
  // -------------------------------------------------------------------
  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = graft.sources.GraphTier.repEdges(spark, dir).persist(mem)
    edges.count()
    val deg = edges
      .select(col("doc_a").as("node"))
      .unionAll(edges.select(col("doc_b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))
      .persist(mem)
    val key = (d: Column, id: Column) => d * lit(4294967296L) + id
    val oriented = edges
      .join(deg.select(col("node").as("doc_a"), col("deg").as("da")), Seq("doc_a"))
      .join(deg.select(col("node").as("doc_b"), col("deg").as("db")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        key(col("da"), col("doc_a")).as("ka"),
        key(col("db"), col("doc_b")).as("kb")
      )
      .select(
        when(col("ka") < col("kb"), col("doc_a")).otherwise(col("doc_b")).as("src"),
        when(col("ka") < col("kb"), col("doc_b")).otherwise(col("doc_a")).as("dst"),
        least(col("ka"), col("kb")).as("ksrc"),
        greatest(col("ka"), col("kb")).as("kdst")
      )
      .persist(mem)
    oriented.count()
    val triangles = oriented
      .as("x")
      .join(oriented.as("y"), col("x.src") === col("y.src") && col("x.kdst") < col("y.kdst"))
      .select(col("x.src").as("apex"), col("x.dst").as("v"), col("y.dst").as("w"))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"), "left_semi")
    val perNode = triangles
      .select(explode(array(col("apex"), col("v"), col("w"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_tri"))
    val out = deg
      .join(perNode.hint("merge"), Seq("node"), "left")
      .select(
        col("node"),
        col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("deg * (deg - 1) DIV 2").as("n_wedges")
      )
      .withColumn(
        "coeff_bp",
        when(col("n_wedges") > 0, expr("n_tri * 10000 DIV n_wedges")).otherwise(0L)
      )
    releaseAfterRun(spark, out, Seq(edges, deg, oriented))
  }

  /** dedup_store_stats — SIGNATURE-STORE health report (the
    * ts_store_stats analogue for the dedup tier): the store is built
    * in-query from the corpus, then each persisted table —
    * groups (doc→rep), reps, bands (4/rep), bbits — reports its row
    * count, leveled-prefix DIRECTORY count, and rows/dir, next to the
    * layout's chosen level. This is the table an operator watches to
    * know the prefix layout still bounds per-dir size as the corpus
    * grows (the property that keeps per-batch match I/O O(batch)).
    * The oracle replays everything from documents: rep collapse,
    * chooseL's level rule, prefix cardinalities per tier (band
    * prefixes off the shared minhash CTE chain). Scale shape: the
    * build is the store write (bounded by the corpus pass); the stats
    * are per-table count + distinct-prefix aggregates — partition
    * values, metadata-sized.
    */
  def storeStats(spark: SparkSession, dir: String): DataFrame = {
    // default dirRows: at test SF chooseL goes FLAT (l=0, one dir per
    // tier) because the store sits far below the prune threshold —
    // the report states that honestly (n_dirs=1). The leveled branch
    // of the same report is exercised by SignatureStoreSpec's 10x
    // drill, where dirRows is forced tiny. The full-corpus store this
    // report describes is the SHARED LSH tier (same write(), same
    // layout rule) — stats are a read-only audit of it.
    val path = graft.sources.GraphTier.ensureLshTier(spark, dir)
    val lay = graft.sources.SignatureStore.readLayoutInfo(spark, path)
    val tables = Seq("groups" -> "gp", "reps" -> "tp", "bands" -> "sp", "bbits" -> "bp")
    tables
      .map { case (t, p) =>
        val nDirs = if (lay.l == 0) max(lit(1L)) else countDistinct(col(p))
        spark.read
          .parquet(s"$path/$t")
          .agg(count(lit(1)).as("n_rows"), nDirs.as("n_dirs"))
          .select(lit(t).as("tier"), col("n_rows"), col("n_dirs"))
      }
      .reduce(_.unionByName(_))
      .withColumn("layout_l", lit(lay.l.toLong))
      .withColumn("rows_per_dir", expr("n_rows DIV greatest(n_dirs, 1L)"))
  }

  /** text_ngram_novelty — per-document NOVELTY audit: the fraction of
    * a doc's distinct 8-token shingles whose corpus-wide FIRST
    * occurrence (min doc_id — the house arrival order) is this doc.
    * The curation number behind "is this feed still contributing new
    * content or re-serving what we already have" — a late doc at 0
    * novelty is pure repetition of earlier data; dedup won't
    * necessarily drop it (below the near-dup threshold) but a mixture
    * planner should down-weight it. Scale shape: one distinct
    * (doc, shingle) table, ONE partial-aggregable min per shingle,
    * novelty = a shingle-keyed semi-join back (first_doc = doc), two
    * doc-grain aggregates — never a pair join.
    */
  def ngramNovelty(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val sh = shinglesOf(docsNorm(spark, dir), n)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count()
    val first = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
    val cnt   = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val novel = sh
      .join(first.hint("merge"), Seq("shingle"))
      .filter(col("first_doc") === col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    val out = cnt
      .join(novel.hint("merge"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_sh"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("coalesce(n_novel, 0) * 10000 DIV greatest(n_sh, 1L)").as("novelty_bp")
      )
    releaseAfterRun(spark, out, Seq(sh))
  }

  // -------------------------------------------------------------------
  // 23r3. graph_assortativity — DEGREE ASSORTATIVITY of the rep-level
  // candidate graph: the Pearson correlation of endpoint degrees over
  // all edge incidences (both orientations — the standard symmetric
  // treatment), published as exact integer numerators + the bp ratio.
  // Positive = hubs attach to hubs (a boilerplate-family core);
  // negative = hub-and-spoke (one template fanning into many one-off
  // docs) — which of the two the dedup graph is decides whether star
  // contraction or plain CC converges faster. Classic-sums Pearson
  // with the ts_linear_trend DECIMAL(38,0) discipline (degrees are
  // bucket-cap-bounded but 2E·Σxy still wants the headroom). Scale
  // shape: one edges⋈degrees join (degree table is node-grain), one
  // row-local orientation explode, ONE 1-row global aggregate.
  // -------------------------------------------------------------------
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = graft.sources.GraphTier.repEdges(spark, dir).persist(mem)
    edges.count()
    val deg = edges
      .select(col("doc_a").as("node"))
      .unionAll(edges.select(col("doc_b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))
    val inc = edges
      .join(deg.select(col("node").as("doc_a"), col("deg").as("da")), Seq("doc_a"))
      .join(deg.select(col("node").as("doc_b"), col("deg").as("db")), Seq("doc_b"))
      .select(explode(array(struct(col("da").as("x"), col("db").as("y")), struct(col("db").as("x"), col("da").as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val out = inc
      .agg(
        count(lit(1)).as("n_inc"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx")
      )
      .select(
        col("n_inc"),
        expr("CAST(n_inc AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sx").as("cov"),
        expr("CAST(n_inc AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx").as("varx")
      )
      .select(
        col("n_inc"),
        expr("CAST(cov AS BIGINT)").as("cov_num"),
        expr("CAST(varx AS BIGINT)").as("var_num"),
        expr(
          "CASE WHEN varx = 0 THEN CAST(0 AS BIGINT) ELSE CAST((cov * 10000) DIV varx AS BIGINT) END"
        ).as("assort_bp")
      )
    releaseAfterRun(spark, out, Seq(edges))
  }

  // -------------------------------------------------------------------
  // 23b. dedup_clusters — connected components over the LSH candidate
  // graph: the canonical-cluster step every dedup pipeline runs after
  // pair generation (keep one doc per component).
  //
  // CC runs REP-LEVEL: member-level expansion of a k-copy exact-dup
  // group funnels ~k²/2 edges through one join key (the reducer-skew
  // shape the collapse exists to kill) while carrying zero extra
  // connectivity — a member pair (m_a, m_b) connects exactly what the
  // rep pair (rep_a, rep_b) already connects. So the component loop
  // eats only rep pairs (edge count independent of exact-dup group
  // sizes — DedupSpec pins that invariance on a 10k-clone corpus) and
  // members inherit their rep's label by a STAR EXPANSION join at the
  // end. Labels agree with member-level CC exactly: rep_id is the min
  // doc_id of its group, so the min reachable member id IS the min
  // reachable rep id.
  // -------------------------------------------------------------------
  def clusters(spark: SparkSession, dir: String, maxIters: Int = 20): DataFrame =
    clustersFromTier(spark, dir, maxIters)

  /** [[clusters]] riding the PERSISTED full-corpus LSH tier
    * ([[graft.sources.GraphTier.ensureLshTier]]) instead of re-running
    * collapse + shingle + minhash + band join in-query: the tier's
    * edges/ IS lshRepPairsFromNormed's pair set (GraphTierSpec pins the
    * equality), its groups/bands tables are the collapse artifacts, so
    * only the CC loop + star expansion run per query — the same
    * build-once/read-many contract the 9 graph_* analytics already
    * ride, extended to the label-family consumers (clusters, stats,
    * soft_weights, keep_best, near_rate). At 100 TB this is the only
    * sane shape: candidate generation happened at ingest.
    */
  private def clustersFromTier(
      spark: SparkSession,
      dir: String,
      maxIters: Int,
      ccCore: (DataFrame, Int) => DataFrame = connectedComponents
  ): DataFrame = {
    val tier = graft.sources.GraphTier.ensureLshTier(spark, dir)
    val groups = spark.read
      .parquet(s"$tier/groups")
      .select(col("doc_id"), col("rep_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = spark.read.parquet(s"$tier/edges")
    val banded = spark.read.parquet(s"$tier/bands").select(col("doc_id")).distinct()
    val repLabels = ccCore(pairs, maxIters)
    val lone = groups
      .groupBy(col("rep_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .join(banded.withColumnRenamed("doc_id", "rep_id"), Seq("rep_id"))
      .join(repLabels.withColumnRenamed("doc_id", "rep_id"), Seq("rep_id"), "left_anti")
      .select(col("rep_id").as("doc_id"), col("rep_id").as("cluster_id"))
    val out = groups
      .join(
        repLabels.union(lone).withColumnRenamed("doc_id", "rep_id"),
        Seq("rep_id")
      )
      .select(col("doc_id"), col("cluster_id"))
    releaseAfterRun(spark, out, Seq(groups))
  }

  /** [[clusters]] with the star-contraction CC core — identical labels
    * (both converge to the component min), different scaling trade:
    * see [[connectedComponentsStar]]. Oracle-gated by the same
    * recursive-reachability SQL as dedup_clusters.
    */
  /** dedup_label_prop — synchronous LABEL PROPAGATION over the
    * near-dup candidate graph: the bounded-round soft-clustering
    * alternative to connected components (LPA stops after R rounds —
    * communities, not full transitive closure, and a FIXED round
    * budget where CC's is log-diameter). Deterministic: labels start
    * as own ids; each round every node adopts the plurality label of
    * its neighbors with (count desc, label asc) tiebreak — the same
    * one-join + one-partial-aggregable-sum per round as the PageRank
    * loop, per-round localCheckpoint, never a driver collect.
    */
  def labelProp(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val pairs = graft.sources.GraphTier.memberEdges(spark, dir)
    val edges = symEdges(pairs)
    labelPropFrom(edges, rounds).select(col("node").as("doc_id"), col("lab").as("label"))
  }

  /** symmetric, deduplicated edge list of an (doc_a, doc_b) pair frame */
  private def symEdges(pairs: DataFrame): DataFrame =
    pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()

  /** the synchronous LPA recursion over a symmetric edge list (shared
    * by labelProp and the modularity scorer — identical tiebreak)
    */
  private def labelPropFrom(edges: DataFrame, rounds: Int): DataFrame = {
    var labels = edges.select(col("src").as("node")).distinct().withColumn("lab", col("node"))
    val wArg = Window.partitionBy(col("node")).orderBy(col("cnt").desc, col("lab").asc)
    for (_ <- 1 to rounds) {
      labels = edges
        .join(labels.select(col("node").as("dst"), col("lab")), Seq("dst"))
        .groupBy(col("src").as("node"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(wArg))
        .filter(col("rn") === 1)
        .select(col("node"), col("lab"))
        .localCheckpoint()
    }
    labels
  }

  // -------------------------------------------------------------------
  // graph_modularity — CLUSTERING-QUALITY ledger: Newman modularity of
  // the label-propagation communities over the near-dup candidate
  // graph, in EXACT rationals (Q = (4m·I − Σ_c deg_c²) / 4m², where I
  // = intra-community edges — no float ever appears, bp by one
  // truncating division). This is the number that says whether LPA's
  // fixed round budget actually found community structure or just
  // relabeled noise — the acceptance gate before anyone swaps CC for
  // LPA to save rounds at 100 TB. Plan: the LSH pair frame and the LPA
  // loop are the machinery the pipeline already runs; the scoring adds
  // one label join per edge side (intra count), one degree groupBy,
  // and 1-row scalar aggregates — the final five numbers assemble
  // driver-side (bounded model-object pulls, the recall_eval
  // precedent) into a single summary row.
  // -------------------------------------------------------------------
  def modularity(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val pairs = graft.sources.GraphTier.memberEdges(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = pairs.count()
    val edges = symEdges(pairs)
    val labels = labelPropFrom(edges, rounds).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNodes = labels.count()
    val intra = pairs
      .join(labels.select(col("node").as("doc_a"), col("lab").as("la")), Seq("doc_a"))
      .join(labels.select(col("node").as("doc_b"), col("lab").as("lb")), Seq("doc_b"))
      .filter(col("la") === col("lb"))
      .count()
    val degc = edges
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .join(labels, Seq("node"))
      .groupBy(col("lab"))
      .agg(sum(col("deg")).as("dc"))
    val row = degc
      .agg(count(lit(1)).as("n_comm"), sum(expr("CAST(dc AS DECIMAL(38,0)) * dc")).as("sdc2"))
      .head()
    val (nComm, sdc2) = (
      row.getAs[Long]("n_comm"),
      Option(row.getAs[java.math.BigDecimal]("sdc2")).map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0))
    )
    // m == 0 (no candidate pairs at all): modularity is undefined —
    // report the conventional 0 instead of dividing by zero (the
    // oracle guards the same branch)
    val qBp =
      if (m == 0L) 0L
      else ((BigInt(10000) * (BigInt(4) * m * intra - sdc2)) / (BigInt(4) * m * m)).toLong
    val spark2 = pairs.sparkSession
    pairs.unpersist()
    labels.unpersist()
    spark2
      .range(1)
      .select(
        lit(nNodes).as("n_nodes"),
        lit(m).as("n_edges"),
        lit(nComm).as("n_communities"),
        lit(intra).as("intra_edges"),
        lit(qBp).as("modularity_bp")
      )
  }

  /** dedup_near_rate_by_source — the near-dup DASHBOARD per ingest
    * feed: which source is shipping near-copies, and what fraction of
    * it a near-dedup pass would drop (cluster members beyond each
    * cluster's min-id canonical). Rides the rep-level cluster labels
    * (edge count invariant to clone blowup) joined back to the corpus
    * source column — one extra broadcast-size join and a bounded-key
    * groupBy on top of machinery the pipeline already runs.
    */
  def nearDupRateBySource(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(clusters(spark, dir), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("cluster_id")).as("n_clustered"),
        sum(when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"), 1L).otherwise(0L))
          .as("n_dropped")
      )
      .withColumn("drop_rate_micro", expr("n_dropped * 1000000 DIV n_docs"))

  def clustersStar(spark: SparkSession, dir: String, maxIters: Int = 30): DataFrame =
    clustersFromTier(spark, dir, maxIters, connectedComponentsStar)

  private[graft] def clustersFromNorm(
      spark: SparkSession,
      norm: DataFrame,
      maxIters: Int = 20,
      ccCore: (DataFrame, Int) => DataFrame = connectedComponents
  ): DataFrame = {
    val c = collapseExact(norm)
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lsh = lshRepPairsFromNormed(c.reps)
    val repLabels = ccCore(lsh.pairs, maxIters)
    // groups whose members pair only among themselves (exact clones of
    // a banded rep with no near-dup partner): their own component,
    // labelled by the rep
    val lone = groups
      .groupBy(col("rep_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .join(lsh.banded.withColumnRenamed("doc_id", "rep_id"), Seq("rep_id"))
      .join(repLabels.withColumnRenamed("doc_id", "rep_id"), Seq("rep_id"), "left_anti")
      .select(col("rep_id").as("doc_id"), col("rep_id").as("cluster_id"))
    // star expansion: one join on the O(n) groups table — never a pair
    // blowup — maps every member to its rep's component label
    val out = groups
      .join(
        repLabels.union(lone).withColumnRenamed("doc_id", "rep_id"),
        Seq("rep_id")
      )
      .select(col("doc_id"), col("cluster_id"))
    releaseAfterRun(spark, out, Seq(lsh.bands, groups, repLabels))
  }

  // -------------------------------------------------------------------
  // 23h. dedup_cluster_stats — cluster-size distribution: how many
  // near-dup clusters of each size the corpus holds, the one-page
  // report a dedup pipeline publishes after clustering ("408 pairs,
  // 12 triples, one 40k-copy boilerplate family"). Two tiny
  // aggregations over the O(n) label table — the expensive part is
  // [[clusters]], shared.
  // -------------------------------------------------------------------
  def clusterStats(spark: SparkSession, dir: String): DataFrame =
    clusters(spark, dir)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  // -------------------------------------------------------------------
  // 23s. dedup_soft_weights — the KEEP-BUT-DOWNWEIGHT alternative to
  // hard dedup: every doc gets a sampling weight 1/cluster_size
  // (micro), so a 40-copy boilerplate family contributes one doc's
  // worth of probability mass to training instead of being 39/40
  // deleted — the soft-dedup recipe several LLM data pipelines prefer
  // because it keeps coverage while killing the duplication bias.
  // Singletons (no near-dup partner) are their own cluster at weight
  // 1.0. Cost = the shared clusters pipeline + one O(n) size join;
  // the output is the corpus-complete weight table a sampler consumes
  // directly.
  // -------------------------------------------------------------------
  def softWeights(spark: SparkSession, dir: String): DataFrame = {
    val lab = clusters(spark, dir)
    val labeled = Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .join(lab, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = labeled.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    labeled
      .join(sizes, Seq("cluster_id"))
      .select(
        col("doc_id"),
        col("cluster_id"),
        col("cluster_size"),
        expr("1000000 DIV cluster_size").as("weight_micro")
      )
  }

  // -------------------------------------------------------------------
  // 23h2. dedup_keep_best — the dedup DECISION: per near-dup cluster,
  // keep the best copy and drop the rest. "Best" = the longest
  // version (fullest copy — the standard keep heuristic when near-dups
  // are truncations/excerpts of each other), doc_id as the
  // deterministic tiebreak. One cheap window over the O(n) label
  // table (partitioned by cluster — cluster sizes bound the sort)
  // joined to per-doc metadata; the expensive part is [[clusters]],
  // shared. The keep/drop verdict column is what the filter stage of
  // a training pipeline actually consumes.
  // -------------------------------------------------------------------
  def keepBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
    val w = Window.partitionBy(col("cluster_id")).orderBy(col("n_chars").desc, col("doc_id").asc)
    clusters(spark, dir)
      .join(docs, Seq("doc_id"))
      .withColumn("keep", when(row_number().over(w) === 1, 1L).otherwise(0L))
      .select(col("doc_id"), col("cluster_id"), col("n_chars"), col("keep"))
  }

  /** Distributed connected components over a (doc_a, doc_b) pair set.
    *
    * Each round combines MIN-LABEL RELAXATION (every node takes the
    * min label in its neighborhood — one shuffle join + agg) with
    * POINTER JUMPING (label(u) <- label(label(u)) — labels always
    * point at a smaller component member, so chasing one hop per
    * round doubles the contraction): the label chain contracts
    * geometrically and convergence is O(log diameter) rounds, not
    * O(diameter) — a 300-hop chain graph lands in <= 9 rounds where
    * pure propagation needs 300 (DedupSpec drives exactly that
    * adversarial shape). Driver sees only the convergence counter,
    * never rows; each round is two bounded jobs.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(mem)
    edges.count() // eager: both loop consumers read the cache, not the lineage
    // init IS the first relaxation round: label = min(self, neighbors)
    var labels = edges
      .groupBy(col("src").as("doc_id"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("doc_id"), least(col("doc_id"), col("nmin")).as("cluster_id"))
      .persist(mem)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val neighborMin = edges
        .join(labels, col("dst") === col("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("cluster_id")).as("nmin"))
      // relax: carry the previous label through for the change count.
      // Materialized eagerly — it feeds BOTH sides of the pointer-jump
      // join below, and a lazy persist would let them race.
      val relaxed = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(
          labels("doc_id"),
          least(labels("cluster_id"), coalesce(col("nmin"), labels("cluster_id"))).as("cluster_id"),
          labels("cluster_id").as("prev")
        )
        .persist(mem)
      relaxed.count()
      // pointer jump: label(u) <- label(label(u)). Every label IS a
      // node of the same component with label <= itself, so the jump
      // is sound and monotone.
      val parents = relaxed.select(col("doc_id").as("p_id"), col("cluster_id").as("p_cluster"))
      val jumped = relaxed
        .join(parents, relaxed("cluster_id") === col("p_id"), "left")
        .select(
          relaxed("doc_id"),
          coalesce(col("p_cluster"), relaxed("cluster_id")).as("cluster_id"),
          relaxed("prev")
        )
      // localCheckpoint TRUNCATES the logical plan: the self-join above
      // doubles the lineage every round, so without a per-round cut the
      // plan tree (and every explain/codegen of it) grows 2^rounds
      val snap = jumped.localCheckpoint(true)
      changed = snap.filter(col("cluster_id") =!= col("prev")).count()
      labels.unpersist()
      relaxed.unpersist()
      labels = snap.drop("prev")
      iter += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIters rounds ($changed labels still " +
          "changing): a component's diameter exceeds the round budget — raise maxIters"
      )
    labels
  }

  /** Alternating LARGE-STAR / SMALL-STAR connected components (the
    * MapReduce CC of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — the alternative to
    * [[connectedComponents]] for adversarially DEEP components. Both
    * are O(log) rounds, but the star operations rewrite the EDGE SET
    * itself (every round reattaches nodes directly to their
    * neighborhood minimum) instead of keeping the original edges and
    * relaxing a label table against them, so each round's join cost
    * SHRINKS with the contracting edge set where relax+jump re-scans
    * every original edge each round — the better trade once
    * components are long chains of millions of edges rather than LSH's
    * shallow near-clique blobs.
    *
    *   - large-star: every node's strictly-LARGER neighbors reattach
    *     to its neighborhood min (never creates self-loops, halves
    *     long chains);
    *   - small-star: every node's smaller-or-equal neighbors compact
    *     onto the local min (turns the halved chains into stars).
    *
    * Convergence = the canonical undirected edge set reaches a
    * fixpoint; at that point every component IS a star around its
    * min node (asserted structurally: each leaf has exactly one
    * edge), and labels read off the edge list with no final
    * aggregation. Same contract as [[connectedComponents]]: one
    * (doc_id, cluster_id = component min) row per node that appears
    * in `pairs`.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIters: Int = 30): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var und = pairs
      .select(
        least(col("doc_a"), col("doc_b")).as("lo"),
        greatest(col("doc_a"), col("doc_b")).as("hi")
      )
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .persist(mem)
    var undCount = und.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val sym = und
        .select(col("lo").as("src"), col("hi").as("dst"))
        .union(und.select(col("hi").as("src"), col("lo").as("dst")))
      // large-star: m(u) = min(N(u) ∪ {u}); every neighbor v > u
      // re-attaches as (m(u), v). m <= u < v, so no self-loops.
      val mins = sym
        .groupBy(col("src"))
        .agg(min(col("dst")).as("nmin"))
        .select(col("src").as("u"), least(col("src"), col("nmin")).as("m"))
      val ls = sym
        .filter(col("dst") > col("src"))
        .join(mins, col("src") === col("u"))
        .select(col("m").as("lo"), col("dst").as("hi"))
        .distinct()
      // small-star over the large-star output: every node u with
      // below-neighbors compacts them (and itself) onto their min.
      val sym2 = ls
        .select(col("lo").as("src"), col("hi").as("dst"))
        .union(ls.select(col("hi").as("src"), col("lo").as("dst")))
      val below = sym2.filter(col("dst") < col("src"))
      val mins2 = below.groupBy(col("src").as("u2")).agg(min(col("dst")).as("m2"))
      val ss = below
        .join(mins2, col("src") === col("u2"))
        .select(col("m2").as("lo"), col("dst").as("hi"))
        .filter(col("lo") =!= col("hi"))
        .union(below.join(mins2, col("src") === col("u2")).select(col("m2").as("lo"), col("src").as("hi")))
        .distinct()
      // fixpoint check + the per-round lineage cut (the edge set is
      // rewritten every round; without the cut the plan doubles)
      val next = ss.localCheckpoint(true)
      val nextCount = next.count()
      converged = nextCount == undCount && next.exceptAll(und).isEmpty
      und.unpersist()
      und = next.persist(mem)
      undCount = nextCount
      iter += 1
    }
    // structural star check: a fixpoint of both operations must leave
    // every leaf exactly one edge (to its component min) — if not, the
    // round budget was too small for the component depth
    val nonStar = und.groupBy(col("hi")).agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    if (!converged || nonStar > 0)
      throw new IllegalStateException(
        s"connectedComponentsStar did not reach a star fixpoint after $maxIters rounds " +
          s"($nonStar leaves with >1 edge): raise maxIters"
      )
    val out = und
      .select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
      .union(und.select(col("lo"), col("lo")).distinct())
    releaseAfterRun(und.sparkSession, out, Seq(und))
  }

  // -------------------------------------------------------------------
  // 24. dedup_ngram_jaccard — verify LSH candidates with exact word
  // 3-gram Jaccard. Duplicate verdict uses pure integer arithmetic
  // (10*|A∩B| >= 8*|A∪B| ⇔ J >= 0.8): no float boundary anywhere.
  // -------------------------------------------------------------------
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Rep-level end to end: a member's shingle set IS its rep's, so
    // intersection/union/verdict computed once per rep pair are exact
    // for every member pair they expand to — the expensive shingle
    // join scales with DISTINCT texts, not corpus size. The rep
    // shingle set feeds three consumers (signatures, intersection,
    // per-rep counts) — materialize it once, EAGERLY: lazy persist
    // lets the consumers race partition computation inside one job
    // and nobody hits the cache.
    val c = collapseExact(docsNorm(spark, dir))
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = shinglesOf(c.reps).distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lsh = lshRepPairsFrom(uniq) // its eager bands.count() fills the uniq cache too
    val cand = lsh.pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand.count()
    val counts = uniq.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // intersection joins carry the 60-bit shingle HASH, not the string:
    // the verification shuffle's payload drops ~3x (8-byte keys), and
    // the hash is derived off the already-cached distinct set so both
    // engines count identical (doc, hash) rows. This makes the
    // "exact" verification tier probabilistic with a known bound: a
    // cross-doc 60-bit collision inflates inter_n by 1 (expected
    // collisions ≈ n_a·n_b/2⁶⁰ per pair — negligible below ~10⁹
    // shingles/doc), and hashing the DISTINCT set first means no
    // within-doc duplicate hsh can turn the join into a cross
    // product; overlap can only read HIGH on a collision, never low
    val uniqH = uniq.select(
      col("doc_id"),
      expr("CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT)").as("hsh")
    )
    val inter = cand
      .join(uniqH.as("x"), col("x.doc_id") === col("doc_a"))
      .join(uniqH.as("y"), col("y.doc_id") === col("doc_b") && col("y.hsh") === col("x.hsh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_n"))
    val repScores = cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter_n", coalesce(col("inter_n"), lit(0L)))
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), Seq("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        col("inter_n"),
        (col("na") + col("nb") - col("inter_n")).as("union_n"),
        when(col("inter_n") * 10 >= (col("na") + col("nb") - col("inter_n")) * 8, 1L)
          .otherwise(0L)
          .as("is_dup")
      )
    // within-group pairs are identical texts: inter = union = |rep's
    // shingle set|, J = 1 ⇒ is_dup = 1
    val out = expandMemberPairs(
      repScores,
      groups,
      counts, // unique per rep; carries n_sh for the within values
      carried = Seq("inter_n", "union_n", "is_dup"),
      withinValues = Seq(col("n_sh"), col("n_sh"), lit(1L))
    )
    releaseAfterRun(spark, out, Seq(uniq, lsh.bands, cand, groups))
  }

  // -------------------------------------------------------------------
  // 24b. dedup_containment — CONTAINMENT scoring over the same banded
  // candidates: is the smaller document's shingle set (nearly) inside
  // the larger's? Jaccard misses exactly this case — a short doc
  // quoted whole inside a long one has tiny |∩|/|∪| but containment
  // ≈ 1 — and quote/subset duplication is a first-class training-data
  // leak. Verdict is orientation-invariant (containment of the
  // SMALLER set: inter·10 ≥ 9·min(na,nb)), so member expansion's
  // least/greatest reorientation cannot flip it. Same rep-level
  // skeleton as dedup_ngram_jaccard: shingle join scales with
  // distinct texts, candidates stay banded, never all-pairs.
  // -------------------------------------------------------------------
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val c = collapseExact(docsNorm(spark, dir))
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = shinglesOf(c.reps).distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lsh = lshRepPairsFrom(uniq)
    val cand = lsh.pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand.count()
    val counts = uniq.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // intersection joins carry the 60-bit shingle HASH, not the string:
    // the verification shuffle's payload drops ~3x (8-byte keys), and
    // the hash is derived off the already-cached distinct set so both
    // engines count identical (doc, hash) rows. This makes the
    // "exact" verification tier probabilistic with a known bound: a
    // cross-doc 60-bit collision inflates inter_n by 1 (expected
    // collisions ≈ n_a·n_b/2⁶⁰ per pair — negligible below ~10⁹
    // shingles/doc), and hashing the DISTINCT set first means no
    // within-doc duplicate hsh can turn the join into a cross
    // product; overlap can only read HIGH on a collision, never low
    val uniqH = uniq.select(
      col("doc_id"),
      expr("CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT)").as("hsh")
    )
    val inter = cand
      .join(uniqH.as("x"), col("x.doc_id") === col("doc_a"))
      .join(uniqH.as("y"), col("y.doc_id") === col("doc_b") && col("y.hsh") === col("x.hsh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_n"))
    val repScores = cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter_n", coalesce(col("inter_n"), lit(0L)))
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), Seq("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        col("inter_n"),
        least(col("na"), col("nb")).as("n_small"),
        greatest(col("na"), col("nb")).as("n_big"),
        when(col("inter_n") * 10 >= least(col("na"), col("nb")) * 9, 1L).otherwise(0L).as("is_contained")
      )
    val out = expandMemberPairs(
      repScores,
      groups,
      counts,
      carried = Seq("inter_n", "n_small", "n_big", "is_contained"),
      withinValues = Seq(col("n_sh"), col("n_sh"), col("n_sh"), lit(1L))
    )
    releaseAfterRun(spark, out, Seq(uniq, lsh.bands, cand, groups))
  }

  // -------------------------------------------------------------------
  // 25. dedup_simhash — 64-bit SimHash held as 4x16-bit blocks
  // (h0..h3). Token weights are occurrence counts; per-bit sign sums
  // come from md5 nibbles. Near-dup pairing joins on equal blocks
  // (pigeonhole: hamming<=3 forces >=1 of 4 blocks equal), then
  // filters on exact Hamming distance.
  // -------------------------------------------------------------------
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // skew-safe: signatures only for canonical reps (identical text ⇒
    // identical simhash), block buckets capped, rep pairs expanded to
    // members with hamming inherited (0 within a group).
    val cx = collapseExact(docsNorm(spark, dir))
    val groups = cx.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // All 64 weighted bit-sums with NO token-grain exchange: the
    // simhash sum is over the token MULTISET (Σ tf·(±1) ≡ Σ ±1 over
    // occurrences), so the old (doc, token) pre-group was pure
    // overhead — the explode stays pipeline-local, each token row
    // contributes its 64 ±1s as conditional-sum columns, and the
    // groupBy's map-side combine collapses to one 64-column row per
    // doc per partition BEFORE the only (doc-grain) shuffle. Codegen'd
    // end to end (an interpreted aggregate()-HOF variant measured
    // slower — tools/SigBench's lesson).
    val toks = cx.reps
      .select(col("doc_id"), explode(split(col("norm"), " ")).as("tok"))
      .withColumn("h", substring(md5(col("tok")), 1, 16))
    val bitSumCols = (0 until 64).map { b =>
      val nibblePos = b / 4 + 1 // 1-based hex digit holding this bit
      val shift = 3 - b % 4
      sum(
        expr(
          s"shiftright(instr('0123456789abcdef', substring(h, $nibblePos, 1)) - 1, $shift) & 1"
        ) * 2 - 1
      ).as(s"s$b")
    }
    val sums = toks.groupBy(col("doc_id")).agg(bitSumCols.head, bitSumCols.tail: _*)
    // 4x16-bit signature blocks from the bit signs — pure projection
    val blockCols = (0 until 4).map { blk =>
      (0 until 16)
        .map(j => when(col(s"s${blk * 16 + j}") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
        .cast("long")
        .as(s"h$blk")
    }
    // sig feeds pair generation (twice) and hamming scoring (twice);
    // it is n_docs x 5 narrow columns — materialize instead of
    // recomputing the token-hash aggregation per consumer.
    val sig = sums
      .select(col("doc_id") +: blockCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.count() // eager: see ngramJaccard — lazy persist races its consumers
    val blocks = sig.select(
      col("doc_id"),
      explode(
        array((0 until 4).map(blk => struct(lit(blk).as("blk"), col(s"h$blk").as("v"))): _*)
      ).as("bv")
    ).select(col("doc_id"), col("bv.blk").as("blk"), col("bv.v").as("v"))
    val safeBlocks = dropOversizedBuckets(blocks, Seq("blk", "v"), DefaultBucketCap, "simhash")
    val cand = safeBlocks
      .as("a")
      .join(
        safeBlocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val repNear = cand
      .join(sig.toDF("doc_a", "xa0", "xa1", "xa2", "xa3"), Seq("doc_a"))
      .join(sig.toDF("doc_b", "xb0", "xb1", "xb2", "xb3"), Seq("doc_b"))
      .withColumn(
        "hamming",
        expr(
          "CAST(bit_count(xa0 ^ xb0) + bit_count(xa1 ^ xb1) + " +
            "bit_count(xa2 ^ xb2) + bit_count(xa3 ^ xb3) AS BIGINT)"
        )
      )
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    // every doc tokenizes to ≥1 token (empty norm still yields one ""
    // token), so every rep has a signature and every multi-member
    // group self-pairs at hamming 0
    val out = expandMemberPairs(
      repNear,
      groups,
      sig.select(col("doc_id")),
      carried = Seq("hamming"),
      withinValues = Seq(lit(0L))
    )
    releaseAfterRun(spark, out, Seq(sig, groups))
  }

  // -------------------------------------------------------------------
  // 23e. dedup_minhash_estimate — SKETCH-based similarity for the LSH
  // candidates: Jaccard estimated as the fraction of agreeing MinHash
  // slots (n_agree/K), never touching the shingle sets again. At
  // 100 TB this replaces ngramJaccard's exact verification when the
  // shingle join is the bottleneck: the signatures are K small strings
  // per doc, the estimate is unbiased, and the integer micro-score is
  // engine-exact. Pair scoring joins the fixed-width signature table
  // twice — candidate-sized, not corpus-sized.
  // -------------------------------------------------------------------
  def minhashEstimate(spark: SparkSession, dir: String): DataFrame = {
    // rep-level signatures + pairs (see the skew-safe core): member
    // signatures equal their rep's, so rep-pair slot agreement is
    // exact for every expanded member pair; within-group pairs agree
    // on all K slots by construction.
    val c = collapseExact(docsNorm(spark, dir))
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = shinglesOf(c.reps).distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = minhashSignatures(uniq).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count() // eager: pairs and both scoring joins read the caches
    val lsh = lshRepPairsFrom(uniq)
    val sigA = sigs.toDF("doc_a" +: (0 until K).map(j => s"a$j"): _*)
    val sigB = sigs.toDF("doc_b" +: (0 until K).map(j => s"b$j"): _*)
    val agree = (0 until K)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val repScored = lsh.pairs
      .join(sigA, Seq("doc_a"))
      .join(sigB, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), agree.as("n_agree"))
      .withColumn("est_jaccard_micro", expr(s"n_agree * 1000000 DIV $K"))
    val out = expandMemberPairs(
      repScored,
      groups,
      lsh.banded,
      carried = Seq("n_agree", "est_jaccard_micro"),
      withinValues = Seq(lit(K.toLong), lit(1000000L * K / K))
    )
    releaseAfterRun(spark, out, Seq(uniq, sigs, lsh.bands, groups))
  }

  // -------------------------------------------------------------------
  // 23l2. dedup_containment_estimate — SIGNATURE-ONLY containment:
  // the scale path for dedup_containment exactly as minhashEstimate
  // is for ngramJaccard. Estimated intersection from slot agreement
  // (J = agree/K ⇒ I = J·(na+nb)/(1+J) = agree·(na+nb)/(K+agree))
  // over the cheap EXACT per-doc shingle counts; containment of the
  // smaller set in micro units, all integer. At 100 TB the shingle
  // intersection join disappears — pairs score from K signature
  // slots + two counters.
  // -------------------------------------------------------------------
  def containmentEstimate(spark: SparkSession, dir: String): DataFrame = {
    val c = collapseExact(docsNorm(spark, dir))
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = shinglesOf(c.reps).distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = minhashSignatures(uniq).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val lsh = lshRepPairsFrom(uniq)
    val counts = uniq.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val sigA = sigs.toDF("doc_a" +: (0 until K).map(j => s"a$j"): _*)
    val sigB = sigs.toDF("doc_b" +: (0 until K).map(j => s"b$j"): _*)
    val agree = (0 until K)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val repScored = lsh.pairs
      .join(sigA, Seq("doc_a"))
      .join(sigB, Seq("doc_b"))
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), Seq("doc_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        agree.as("n_agree"),
        least(col("na"), col("nb")).as("n_small"),
        greatest(col("na"), col("nb")).as("n_big")
      )
      .withColumn(
        "est_containment_micro",
        expr(s"n_agree * (n_small + n_big) * 1000000 DIV (($K + n_agree) * n_small)")
      )
    val out = expandMemberPairs(
      repScored,
      groups,
      counts,
      carried = Seq("n_agree", "n_small", "n_big", "est_containment_micro"),
      withinValues = Seq(lit(K.toLong), col("n_sh"), col("n_sh"), lit(1000000L))
    )
    releaseAfterRun(spark, out, Seq(uniq, sigs, lsh.bands, groups))
  }

  // -------------------------------------------------------------------
  // 23m. dedup_minhash_bbit — b-BIT minhash (Li & König, WWW'10): keep
  // only the LOWEST BIT of each of the K min-hashes. The signature
  // store shrinks 128× vs full md5 slots (K bits vs K×128-bit hashes)
  // — the difference between "signatures fit in executor memory for
  // the whole corpus" and "they don't" at 100 TB. One bit agrees by
  // chance half the time, so the estimator debiases:
  //   J ≈ 2·(agree/K) − 1, clamped at 0
  // (exact integers: GREATEST(0, (2·n_agree − K)·1e6 DIV K)). Same
  // skew-safe rep-level pipeline as the full estimator; same oracle
  // CTE chain scores the same pairs.
  // -------------------------------------------------------------------
  def minhashBbit(spark: SparkSession, dir: String): DataFrame = {
    val c = collapseExact(docsNorm(spark, dir))
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = shinglesOf(c.reps).distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = minhashSignatures(uniq).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val lsh = lshRepPairsFrom(uniq)
    // lowest bit of the integer min-hash slot — parity, identical in
    // both engines on non-negative longs
    def lowBit(c: Column): Column = pmod(c, lit(2L))
    val sigA = sigs.toDF("doc_a" +: (0 until K).map(j => s"a$j"): _*)
    val sigB = sigs.toDF("doc_b" +: (0 until K).map(j => s"b$j"): _*)
    val agree = (0 until K)
      .map(j => when(lowBit(col(s"a$j")) === lowBit(col(s"b$j")), 1L).otherwise(0L))
      .reduce(_ + _)
    val repScored = lsh.pairs
      .join(sigA, Seq("doc_a"))
      .join(sigB, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), agree.as("n_bit_agree"))
      .withColumn(
        "est_jaccard_micro",
        greatest(lit(0L), expr(s"(2 * n_bit_agree - $K) * 1000000 DIV $K"))
      )
    val out = expandMemberPairs(
      repScored,
      groups,
      lsh.banded,
      carried = Seq("n_bit_agree", "est_jaccard_micro"),
      withinValues = Seq(lit(K.toLong), lit(1000000L))
    )
    releaseAfterRun(spark, out, Seq(uniq, sigs, lsh.bands, groups))
  }

  // -------------------------------------------------------------------
  // 23d. dedup_contamination — cross-source overlap audit: how many
  // near-duplicate document pairs STRADDLE two sources (the train/test
  // contamination question — "does src A leak into src B?"),
  // aggregated to a per-source-pair matrix. The candidate pair set is
  // orders of magnitude smaller than the corpus, so the source lookups
  // are joins AQE broadcasts at runtime; the corpus itself is touched
  // only by the (bucketed) LSH pair generation.
  // -------------------------------------------------------------------
  // Rep-level: the member-pair count between two exact-dup groups is a
  // PRODUCT of per-source member counts, so the expansion never has to
  // be materialized. Cross-group pairs contribute c_a(s1)·c_b(s2) per
  // rep pair and source pair; within-group pairs (clones of one banded
  // rep split across sources) contribute c(s1)·c(s2) per group. Edge
  // volume is O(rep pairs × sources-per-group), independent of clone
  // counts — same invariance DedupSpec pins for clusters.
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = Tables.documents(spark, dir)
    val c = collapseExact(docs.select(col("doc_id"), normText(col("text")).as("norm")))
    val lsh = lshRepPairsFromNormed(c.reps)
    // per-group per-source member counts: one O(n) join + agg
    val srcCnt = c.groups
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("rep_id"), col("source"))
      .agg(count(lit(1)).as("cnt"))
      .persist(mem)
    srcCnt.count() // eager: feeds three joins below
    val cross = lsh.pairs
      .join(srcCnt.toDF("doc_a", "src_a", "c_a"), Seq("doc_a"))
      .join(srcCnt.toDF("doc_b", "src_b", "c_b"), Seq("doc_b"))
      .filter(col("src_a") =!= col("src_b"))
      .select(
        least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"),
        (col("c_a") * col("c_b")).as("n")
      )
    val within = srcCnt
      .as("x")
      .join(
        srcCnt.as("y"),
        col("x.rep_id") === col("y.rep_id") && col("x.source") < col("y.source")
      )
      .join(lsh.banded.withColumnRenamed("doc_id", "b_rep"), col("x.rep_id") === col("b_rep"))
      .select(
        col("x.source").as("source_a"),
        col("y.source").as("source_b"),
        (col("x.cnt") * col("y.cnt")).as("n")
      )
    val out = cross
      .union(within)
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("n")).as("n_pairs"))
    releaseAfterRun(spark, out, Seq(lsh.bands, srcCnt))
  }

  // -------------------------------------------------------------------
  // 23c. dedup_incremental — dedupe an INCOMING batch against the
  // existing corpus (the production ingest shape: new crawl data vs
  // everything already collected). Asymmetric by design: the corpus
  // side streams — at 100 TB it is never re-shuffled, only its
  // signature table is scanned — while the small delta BROADCASTS to
  // every executor. Exact matches via the content hash; near matches
  // via shared LSH band signatures; a pair matched both ways reports
  // 'exact' (min over the kind column).
  // -------------------------------------------------------------------
  def incrementalDedup(spark: SparkSession, dir: String, splitId: Long = 400L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // the corpus side's signatures live ON DISK between batches — at
    // 100 TB this write happened at ingest time; the SHARED template
    // (built at most once per process) keeps that posture while the
    // drill prices its subject, the delta match. matchDelta is
    // read-only, so no clone is needed. The match itself never touches
    // corpus text (PlanSpec asserts it).
    val store = graft.sources.SignatureStore.baseStoreTemplate(spark, dir, splitId)
    graft.sources.SignatureStore.matchDelta(spark, store, docs.filter(col("doc_id") >= splitId))
  }

  // -------------------------------------------------------------------
  // 25f. dedup_store_delete — TAKEDOWN deletes against the signature
  // store (GDPR/purge flow, the delta/iceberg delete-file shape):
  // tombstone the condemned doc ids (O(batch) — nothing corpus-sized
  // moves at takedown time), then match a delta batch — tombstoned
  // members can never be reported as matches, even where a condemned
  // doc was its group's REP (the group's surviving members still
  // match through the rep's stored signatures, exactly as a store
  // built on the live corpus would behave — that equivalence IS the
  // oracle: the incremental-dedup query over the corpus minus the
  // deleted docs). Physical compaction (rep promotion with zero
  // re-shingling, SignatureStoreSpec-pinned store ≡ from-scratch) runs
  // on maintenance schedule, not in the takedown path.
  // -------------------------------------------------------------------
  def storeDeleteMatch(spark: SparkSession, dir: String, splitId: Long = 400L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // tombstone MUTATES the store — clone the shared template so the
    // takedown drill pays its subject (tombstone + match), not the
    // corpus-side re-encode
    val store = graft.sources.TimeboxStore.fixtureClone(
      graft.sources.SignatureStore.baseStoreTemplate(spark, dir, splitId), "graft_sigdel", dir)
    graft.sources.SignatureStore.tombstone(
      spark,
      store,
      docs.filter(col("doc_id") < splitId && col("doc_id") % 11 === 4).select(col("doc_id"))
    )
    graft.sources.SignatureStore.matchDelta(spark, store, docs.filter(col("doc_id") >= splitId))
  }

  // -------------------------------------------------------------------
  // 25c. dedup_incremental_cc — INCREMENTAL connected components over
  // signature appends: the corpus' cluster labels live in the
  // SignatureStore's label tier; a new batch appends its signatures and
  // the labels refresh by contracting existing components to their
  // label supernodes and running CC on the DELTA-SIZED graph only
  // (SignatureStore.appendRelabel). The oracle is the from-scratch
  // dedup_clusters reachability over the full corpus — equality proves
  // the incremental maintenance converges to the same components, while
  // the CC loop never iterates over corpus-sized data.
  // -------------------------------------------------------------------
  // -------------------------------------------------------------------
  // 25d. dedup_incremental_bbit — incremental matching against the
  // PERSISTED b-bit tier: band candidates from the stored signatures,
  // Jaccard estimates from the stored packed low bits (8 bytes/rep).
  // The corpus contributes only its sketch tiers; its text is never
  // re-read, and the full hex signatures stay cold. The oracle
  // recomputes the same debiased estimator from raw shingles.
  // -------------------------------------------------------------------
  def incrementalBbit(spark: SparkSession, dir: String, splitId: Long = 400L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // read-only probe (matchDeltaScored) — the shared template is the
    // persisted sketch tier the drill's posture assumes
    val store = graft.sources.SignatureStore.baseStoreTemplate(spark, dir, splitId)
    graft.sources.SignatureStore.matchDeltaScored(spark, store, docs.filter(col("doc_id") >= splitId))
  }

  def incrementalClusters(spark: SparkSession, dir: String, splitId: Long = 400L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // appendRelabel mutates (appends + relabels) — clone the template
    // (which already carries the label tier writeLabels built)
    val store = graft.sources.TimeboxStore.fixtureClone(
      graft.sources.SignatureStore.baseStoreTemplate(spark, dir, splitId), "graft_sigcc", dir)
    graft.sources.SignatureStore.appendRelabel(spark, docs.filter(col("doc_id") >= splitId), store)
    graft.sources.SignatureStore.readClusters(spark, store)
  }

  // -------------------------------------------------------------------
  // 25g. dedup_edge_tier — the PERSISTED CANDIDATE-EDGE tier and its
  // incremental maintenance: the store is built on the first corpus
  // slice (edges/ materialized once by writeLabels), a second slice
  // appends through appendRelabel — which maintains edges/ by
  // appending only DELTA pairs (every new pair has a fresh rep on one
  // side, so old-old edges never recompute) — and the query reads the
  // member-expanded edge tier. Oracle = the from-scratch LSH pair set
  // over the FULL corpus (dedup_minhash_lsh's SQL): equality proves
  // the incrementally-maintained tier converges to what a full
  // rebuild would store, while no band self-join ever touches
  // corpus-sized data after ingest. This is what lets the 9 graph_*
  // analytics read a TABLE at 100 TB instead of re-running LSH
  // in-query.
  // -------------------------------------------------------------------
  def edgeTier(spark: SparkSession, dir: String, splitId: Long = 400L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // appendRelabel mutates — clone the template (label tier included)
    val store = graft.sources.TimeboxStore.fixtureClone(
      graft.sources.SignatureStore.baseStoreTemplate(spark, dir, splitId), "graft_sigedge", dir)
    graft.sources.SignatureStore.appendRelabel(spark, docs.filter(col("doc_id") >= splitId), store)
    graft.sources.SignatureStore.readEdges(spark, store)
  }

  // -------------------------------------------------------------------
  // 26. dedup_embedding — cosine near-dup pairs, bucketed by
  // random-hyperplane LSH (nTables independent tables of nPlanes sign
  // bits each — the classic OR-construction): candidates are pairs
  // sharing a bucket in ANY table, then verified with the exact
  // integer cosine. Pair generation shuffles on (table, bucket) —
  // bucket-local pairing over content-derived keys, the same shape as
  // minhashLsh's band join — and the quadratic step never sees the
  // corpus, only bucket-mates. Recall at the semantic threshold
  // (cos >= 0.95) is 1-(1-p^nPlanes)^nTables with p = 1-theta/pi ≈
  // 0.9998 at the defaults; DedupSpec asserts it empirically against
  // planted near-duplicates. Dot products are exact integer
  // micro-units; the cosine is IEEE-deterministic from those integers.
  // -------------------------------------------------------------------
  /** Shared HYPERPLANE-LSH candidate core over the embeddings corpus —
    * the embedding twin of the text corpus' persisted LSH tier
    * ([[graft.sources.GraphTier.ensureLshTier]]): the exact-identity
    * collapse (groups/) and the bucket self-join's DISTINCT rep-level
    * candidate pairs (cand/), persisted once per process per
    * (nTables, nPlanes). Candidates are threshold-FREE by construction
    * (they depend only on bucket membership), so every consumer —
    * the 0.95 near-dup report, the 0.4 cluster graph, the threshold
    * curve — verifies the same pair set with exact integer cosines
    * against its own τ. At 100 TB this tier is built at ingest;
    * re-running the window collapse + 32 hyperplane dots + bucket
    * self-join per dashboard query is the recompute it kills.
    */
  private[graft] def embCandidateCore(
      spark: SparkSession,
      dir: String,
      nTables: Int = 8,
      nPlanes: Int = 4
  ): String =
    graft.sources.TimeboxStore.sharedFixture("graft_embcand", dir, s"t${nTables}_p$nPlanes") { p =>
      val allPlanes = graft.functions.PortableHash.planeWeights(nTables * nPlanes, 64)
      val q = Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), quantizeMicro(col("embedding")).as("q"))
      // skew-safe collapse: byte-identical quantized vectors (the
      // embedding analogue of exact text dups — re-crawled pages embed
      // identically) share every bucket in every table, so only their
      // canonical rep is bucketed; groups re-expand candidates after.
      val grp = q.withColumn("rep_id", min(col("vec_id")).over(Window.partitionBy(col("q"))))
      val groups = grp.select(col("vec_id").as("doc_id"), col("rep_id"))
      groups.write.parquet(s"$p/groups")
      val reps = spark.read
        .parquet(s"$p/groups")
        .filter(col("doc_id") === col("rep_id"))
        .select(col("doc_id").as("vec_id"))
        .join(q, Seq("vec_id"))
      // per-table bucket: sign pattern of that table's planes (plane
      // index p = tbl*nPlanes + bit, matching the oracle's p//4 / p%4)
      val tableStructs = (0 until nTables).map { t =>
        val b = (0 until nPlanes)
          .map(j => when(dotQ(col("q"), typedlit(allPlanes(t * nPlanes + j))) > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _)
        struct(lit(t).as("tbl"), b.as("bucket"))
      }
      val bk = reps
        .select(col("vec_id"), explode(array(tableStructs: _*)).as("tb"))
        .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bk.count()
      val safeBk = dropOversizedBuckets(bk, Seq("tbl", "bucket"), DefaultBucketCap, "embedding-lsh")
      safeBk
        .as("x")
        .join(
          safeBk.as("y"),
          col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
            col("x.vec_id") < col("y.vec_id")
        )
        .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
        .distinct()
        .write.parquet(s"$p/cand")
      bk.unpersist(): Unit
    }

  def embeddingNearDup(
      spark: SparkSession,
      dir: String,
      threshold: Double = 0.95,
      nTables: Int = 8,
      nPlanes: Int = 4
  ): DataFrame = {
    val core = embCandidateCore(spark, dir, nTables, nPlanes)
    val groups = spark.read.parquet(s"$core/groups")
    val repCand = spark.read.parquet(s"$core/cand")
    val q = Tables
      .embeddings(spark, dir)
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        quantizeMicro(col("embedding")).as("q")
      )
      .withColumn("n2", norm2Q(col("q")))
    val reps = groups.filter(col("doc_id") === col("rep_id")).select(col("doc_id"))
    // expand to member candidates, then score member-level exactly as
    // before (labels are per-member, so scoring cannot stay rep-level)
    val cand = expandMemberPairs(repCand, groups, reps).toDF("vec_a", "vec_b")
    val cos = cosineQ(dotQ(col("a.q"), col("b.q")), col("a.n2"), col("b.n2"))
    cand
      .join(q.as("a"), col("a.vec_id") === col("vec_a"))
      .join(q.as("b"), col("b.vec_id") === col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("a.label").as("label"), cos.as("cos"))
      .filter(col("cos") >= threshold)
      .select(
        col("vec_a"),
        col("vec_b"),
        col("label"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  // -------------------------------------------------------------------
  // 26b. dedup_embedding_clusters — SEMANTIC dedup clusters: connected
  // components over the cosine near-dup graph (the embedding twin of
  // dedup_clusters). Same skew discipline: byte-identical quantized
  // vectors collapse to their canonical rep BEFORE bucketing (a
  // re-crawled page embeds identically — the exact-dup family of the
  // vector world), CC eats rep-level verified pairs only, members
  // inherit labels by star expansion, and any ≥2-member identity group
  // is its own component even without a near-dup partner (identical
  // vectors have cosine 1 by definition — no band condition needed).
  // The oracle runs recursive reachability over the member-level
  // verified pair set.
  // -------------------------------------------------------------------
  def embeddingClusters(
      spark: SparkSession,
      dir: String,
      threshold: Double = 0.4,
      nTables: Int = 8,
      nPlanes: Int = 4,
      maxIters: Int = 20
  ): DataFrame = {
    // candidates come off the shared persisted core (threshold-free by
    // construction); this query's subject — exact-cosine verification
    // at its τ, the CC loop, and the star expansion — runs from there
    val core = embCandidateCore(spark, dir, nTables, nPlanes)
    val groups = spark.read.parquet(s"$core/groups")
    val repCand = spark.read
      .parquet(s"$core/cand")
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    val q = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), quantizeMicro(col("embedding")).as("q"))
      .withColumn("n2", norm2Q(col("q")))
    val cos = cosineQ(dotQ(col("a.q"), col("b.q")), col("a.n2"), col("b.n2"))
    val repPairs = repCand
      .join(q.as("a"), col("a.vec_id") === col("vec_a"))
      .join(q.as("b"), col("b.vec_id") === col("vec_b"))
      .filter(cos >= threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val repLabels = connectedComponents(repPairs, maxIters)
    val lone = groups
      .groupBy(col("rep_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .join(repLabels.withColumnRenamed("doc_id", "rep_id"), Seq("rep_id"), "left_anti")
      .select(col("rep_id"), col("rep_id").as("cluster_id"))
    groups
      .join(repLabels.withColumnRenamed("doc_id", "rep_id").unionByName(lone), Seq("rep_id"))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
  }

  // -------------------------------------------------------------------
  // 23g. contamination_ngram — n-gram-level cross-source overlap: for
  // every source pair, how much of each side's DISTINCT shingle set
  // appears in the other (the standard train/eval contamination audit
  // an LLM pipeline runs before training — pair-level LSH finds copied
  // DOCUMENTS, this finds copied PHRASES). Scale shape: the self-join
  // shuffles on the shingle hash and a shingle shared by k sources
  // emits k²/2 pairs — bounded by the SOURCE count squared, never the
  // corpus; containments are exact integer micro-ratios.
  // -------------------------------------------------------------------
  def contaminationNgram(spark: SparkSession, dir: String): DataFrame = {
    val srcShingles = Tables
      .documents(spark, dir)
      .select(col("source"), normText(col("text")).as("norm"))
      .select(col("source").as("doc_id"), col("norm")) // shinglesOf keys on doc_id
      .transform(shinglesOf(_))
      .select(col("doc_id").as("source"), col("shingle"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = srcShingles.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val shared = srcShingles
      .as("x")
      .join(
        srcShingles.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.source") < col("y.source")
      )
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    val out = shared
      .join(sizes.select(col("source").as("source_a"), col("n_sh").as("n_a")), Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("n_sh").as("n_b")), Seq("source_b"))
      .select(
        col("source_a"),
        col("source_b"),
        col("n_shared"),
        col("n_a"),
        col("n_b"),
        expr("n_shared * 1000000 DIV n_a").as("contain_a_micro"),
        expr("n_shared * 1000000 DIV n_b").as("contain_b_micro")
      )
    releaseAfterRun(spark, out, Seq(srcShingles))
  }

  // -------------------------------------------------------------------
  // 23j. contamination_doc_overlap — per-DOCUMENT decontamination
  // verdict: for every doc of the eval source (deterministically the
  // MIN source id), the fraction of its distinct 8-token shingles that
  // appear verbatim anywhere in the OTHER sources. Source-level
  // matrices say "feed A leaks into B"; this is the per-doc number a
  // decontamination pass actually thresholds on ("drop eval docs >50%
  // covered by training text"). Scale shape: one shuffle join on the
  // shingle — the train side is a corpus-wide DISTINCT shingle set
  // (vocabulary-sized after dedup), the eval side is per-doc shingles;
  // the join emits at most the eval side's row count. Long anchors
  // (8 tokens) make a hit mean an exact phrase copy, not topical
  // similarity.
  // -------------------------------------------------------------------
  def contaminationDocOverlap(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), normText(col("text")).as("norm"))
    // the eval source is a 1-row scalar — pulled to the driver (the
    // house range-planning pattern) rather than broadcast-joined, so
    // no peer's cache maintenance can interpose between the scalar
    // and the filters that consume it
    val evalSrc = docs.agg(min(col("source"))).head().getString(0)
    require(evalSrc != null, "contamination_doc_overlap: empty corpus")
    val evalSh = shinglesOf(
      docs.filter(col("source") === evalSrc).select(col("doc_id"), col("norm")),
      n
    ).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainSh = shinglesOf(
      docs.filter(col("source") =!= evalSrc).select(col("doc_id"), col("norm")),
      n
    ).select(col("shingle")).distinct()
    val counts = evalSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val hits = evalSh
      .join(trainSh, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"))
    val out = counts
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        expr("coalesce(n_hit, 0) * 1000000 DIV n_sh").as("overlap_micro")
      )
    releaseAfterRun(spark, out, Seq(evalSh))
  }

  // -------------------------------------------------------------------
  // 23l. contamination_long_match — LONGEST exact token run each eval
  // doc shares with any training-source doc, the "50-consecutive-token"
  // rule decontamination pipelines enforce. Anchor-and-extend, no
  // suffix structure: every common run of L >= n tokens shows up as
  // L-n+1 consecutive n-token anchors on ONE (eval_pos - train_pos)
  // diagonal of one doc pair, so the longest run is the longest
  // same-diagonal anchor streak plus n-1 — exact for runs >= n, and
  // runs < n are below the audit threshold by construction. Scale
  // shape: the join is anchor-keyed (8-token anchors are phrase-
  // specific, so fan-out stays near 1 for CONTENT anchors) AND
  // df-capped: an anchor occurring at more than `anchorDfCap`
  // positions on either side (license boilerplate, page chrome) would
  // emit E·T rows into one shuffle key, so both join inputs drop
  // those anchors with the dropOversizedBuckets logged-drop policy
  // before pairing. The loss mode is documented and bounded: a run
  // whose interior anchor is dropped splits into two shorter streaks,
  // so max_run can only UNDER-report, and only for runs threaded
  // through >cap boilerplate phrases — which are exactly the matches
  // the 50-token decontamination rule doesn't care about. n_sh stays
  // uncapped (it is a per-doc size metric, not a pair generator).
  // Streaks are a gaps-and-islands window per (pair, diagonal) —
  // partition keys are fine-grained, no skew pile-up; output is one
  // row per eval doc.
  // -------------------------------------------------------------------
  def contaminationLongMatch(
      spark: SparkSession,
      dir: String,
      n: Int = 8,
      anchorDfCap: Int = AnchorDfCap
  ): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), normText(col("text")).as("norm"))
    // 1-row scalar pulled to the driver (see contaminationDocOverlap):
    // the full sweep once produced a 0-row result when the broadcast
    // eval-source join raced concurrent cache maintenance — a literal
    // filter has no such surface, and an empty corpus now fails loudly
    val evalSrc = docs.agg(min(col("source"))).head().getString(0)
    require(evalSrc != null, "contamination_long_match: empty corpus")
    val evalSh = shinglePositionsOf(
      docs.filter(col("source") === evalSrc).select(col("doc_id"), col("norm")),
      n
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    evalSh.count() // eager: the join side and the per-doc aggregate read the cache, not racing lineage
    val trainSh = shinglePositionsOf(
      docs.filter(col("source") =!= evalSrc).select(col("doc_id"), col("norm")),
      n
    ).withColumnRenamed("doc_id", "t_doc").withColumnRenamed("pos", "t_pos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager (count-first) capping on BOTH sides: in the common
    // no-oversize case the anchor join's plan then contains no
    // broadcast anti-join at all — one transient full-sweep anomaly
    // (all max_run = 0, the dropped-everything shape) pointed at the
    // lazy variant's unconditional broadcast racing concurrent cache
    // maintenance, the same race class the evalSrc literal above
    // already closed. Two extra count jobs on persisted inputs buy a
    // literal-free plan for the correctness gate.
    val evalCapped =
      dropOversizedBuckets(evalSh, Seq("shingle"), anchorDfCap, "contamination_long_match eval anchors")
    val trainCapped =
      dropOversizedBuckets(trainSh, Seq("shingle"), anchorDfCap, "contamination_long_match train anchors")
    val streaks = evalCapped
      .join(trainCapped, Seq("shingle"))
      .select(col("doc_id"), col("t_doc"), (col("pos") - col("t_pos")).as("diag"), col("pos"))
      // same diagonal => same aligned run; consecutive pos values chain.
      // pos is unique per (pair, diag), so pos - row_number is the
      // classic island id
      .withColumn(
        "island",
        col("pos") - row_number().over(
          Window.partitionBy(col("doc_id"), col("t_doc"), col("diag")).orderBy(col("pos"))
        )
      )
      .groupBy(col("doc_id"), col("t_doc"), col("diag"), col("island"))
      .agg(count(lit(1)).as("streak"))
    val runs = streaks
      .groupBy(col("doc_id"))
      .agg((max(col("streak")) + lit(n - 1)).as("max_run"))
    val out = evalSh
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_sh"))
      .join(runs, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_sh"),
        coalesce(col("max_run"), lit(0L)).as("max_run_tokens")
      )
    releaseAfterRun(spark, out, Seq(evalSh, trainSh))
  }

  // -------------------------------------------------------------------
  // dedup_substring — WITHIN-CORPUS exact-substring duplication (the
  // train-train counterpart of contamination_long_match; the
  // ExactSubstr audit of Lee et al.'s "Deduplicating Training Data
  // Makes Language Models Better"): for every doc, the longest token
  // run it shares with any OTHER doc, plus how many of its token
  // positions are covered by ANY shared run >= minRun — the exact
  // number of tokens substring-dedup would delete. Same
  // anchor-and-extend machinery as long_match (common runs of L >= n
  // tokens are same-diagonal streaks of n-token anchors), self-joined
  // across the whole corpus with doc_id != t_doc. Scale shape: ONE
  // anchor table, df-capped once with the logged-drop policy before
  // the self-join (a > cap anchor is boilerplate; pair fan-out is
  // bounded at cap² per anchor); islands are a per-(pair, diagonal)
  // window — fine-grained keys, no pile-up; the interval union is a
  // per-doc running-max merge over DISTINCT spans (bounded by doc
  // length, not corpus size). Coverage can only UNDER-report through
  // dropped boilerplate anchors — the long_match contract, same
  // documented loss mode.
  // -------------------------------------------------------------------
  def substringDedup(
      spark: SparkSession,
      dir: String,
      n: Int = 8,
      minRun: Int = 16,
      anchorDfCap: Int = AnchorDfCap
  ): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), normText(col("text")).as("norm"))
    val nToks = docs.select(col("doc_id"), size(split(col("norm"), " ")).cast("long").as("n_toks"))
    val sh = shinglePositionsOf(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count() // eager: both join sides read the cache, not racing lineage
    val capped = dropOversizedBuckets(sh, Seq("shingle"), anchorDfCap, "dedup_substring anchors")
    val other  = capped.select(col("shingle"), col("doc_id").as("t_doc"), col("pos").as("t_pos"))
    // both sides of the anchor self-join are corpus-sized — pin the
    // shuffle merge join so tiny-SF stats can't flip one side into a
    // broadcast the 100 TB plan could never afford
    val runs = capped
      .join(other.hint("merge"), Seq("shingle"))
      .filter(col("doc_id") =!= col("t_doc"))
      .select(col("doc_id"), col("t_doc"), (col("pos") - col("t_pos")).as("diag"), col("pos"))
      .withColumn(
        "island",
        col("pos") - row_number().over(
          Window.partitionBy(col("doc_id"), col("t_doc"), col("diag")).orderBy(col("pos"))
        )
      )
      .groupBy(col("doc_id"), col("t_doc"), col("diag"), col("island"))
      .agg(min(col("pos")).cast("long").as("s"), (count(lit(1)) + lit(n - 1)).as("run"))
      // runs feeds BOTH the max-run branch and the coverage branch —
      // persist it so the anchor self-join runs once, not once per
      // consumer subtree
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxRun = runs.groupBy(col("doc_id")).agg(max(col("run")).as("max_run_tokens"))
    val iv = runs
      .filter(col("run") >= minRun)
      .select(col("doc_id"), col("s"), (col("s") + col("run")).as("e"))
      .distinct()
    val wPrev = Window
      .partitionBy(col("doc_id"))
      .orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cov = iv
      .withColumn("lo", greatest(coalesce(max(col("e")).over(wPrev), col("s")), col("s")))
      .groupBy(col("doc_id"))
      .agg(sum(greatest(col("e") - col("lo"), lit(0L))).as("dup_tokens"))
    // the back-joins are doc-grain on BOTH sides — corpus-sized at
    // 100 TB, so neither ever broadcasts there; pin the shuffle merge
    // join so the plan profile is the same one the big cluster runs
    // (stats at tiny SFs would otherwise flip these to broadcasts)
    val out = nToks
      .join(maxRun.hint("merge"), Seq("doc_id"), "left")
      .join(cov.hint("merge"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_toks"),
        coalesce(col("max_run_tokens"), lit(0L)).as("max_run_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        expr("coalesce(dup_tokens, 0) * 10000 DIV n_toks").as("dup_share_bp")
      )
    releaseAfterRun(spark, out, Seq(sh, runs))
  }

  // -------------------------------------------------------------------
  // 23m. dedup_paragraph — SEGMENT-grain keep-first dedup (the CCNet
  // discipline: dedup at paragraph grain so boilerplate paragraphs
  // vanish corpus-wide while their host documents survive — the stage
  // between exact doc dedup and near-dup LSH). The corpus ships
  // without paragraph delimiters, so fixed token windows stand in for
  // paragraphs (the delimiter is a config; the keep-first accounting
  // is the operator): each doc's token stream splits into consecutive
  // segTokens-word segments, a segment OCCURRENCE survives iff it is
  // the globally FIRST occurrence of its hash (by (doc_id, seg_idx) —
  // deterministic, ingest-order-stable), and the output is the per-doc
  // retention ledger a curation pipeline writes back. Scale shape:
  // keep-first is PARTIAL-AGGREGABLE — the winner of a hash is
  // min(struct(doc_id, seg_idx)), so a boilerplate segment's 10^8
  // corpus occurrences collapse MAP-SIDE to one candidate per input
  // partition before the hash shuffle ever sees them (a rank window
  // partitioned by the hash would funnel the whole occurrence list
  // into ONE window group — the exact skew this operator exists to
  // measure; DedupSpec's clone-blowup drill pins the aggregate form),
  // then two doc-grain aggs merge-join; never all-pairs, never a
  // self-join.
  // -------------------------------------------------------------------
  def dedupParagraph(spark: SparkSession, dir: String, segTokens: Int = 8): DataFrame =
    dedupParagraphFrom(docsNorm(spark, dir), segTokens)

  private[graft] def dedupParagraphFrom(normed: DataFrame, segTokens: Int): DataFrame = {
    val segs = normed
      .withColumn("toks", split(col("norm"), " "))
      .select(
        col("doc_id"),
        posexplode(
          expr(
            s"transform(sequence(0, CAST((size(toks) - 1) DIV $segTokens AS INT)), " +
              s"i -> array_join(slice(toks, i * $segTokens + 1, $segTokens), ' '))"
          )
        ).as(Seq("seg_idx", "seg"))
      )
      .withColumn("h", md5(col("seg")))
    val nSegs = segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_segs"))
    // struct ordering = (doc_id, seg_idx) lexicographic — the same
    // ingest-order-stable identity the rank formulation ordered by
    val winners = segs
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("w"))
    val kept = winners.groupBy(col("w.doc_id").as("doc_id")).agg(count(lit(1)).as("n_kept"))
    // doc-grain on BOTH sides — corpus-sized at 100 TB, so pin the
    // shuffle merge join (tiny-SF stats would flip it to a broadcast)
    nSegs
      .join(kept.hint("merge"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        expr("coalesce(n_kept, 0) * 10000 DIV n_segs").as("kept_bp")
      )
  }

  /** [[shinglesOf]] with the anchor's starting TOKEN POSITION — the
    * coordinate the long-match diagonal chaining needs.
    */
  private[graft] def shinglePositionsOf(normed: DataFrame, n: Int): DataFrame =
    normed
      .select(col("doc_id"), split(col("norm"), " ").as("toks"))
      .select(
        col("doc_id"),
        posexplode(
          when(
            size(col("toks")) >= n,
            expr(
              s"transform(sequence(0, size(toks) - $n), i -> " +
                (0 until n).map(o => s"toks[i + $o]").mkString("concat_ws(' ', ", ", ", ")") + ")"
            )
          ).otherwise(array())
        ).as(Seq("pos", "shingle"))
      )

  // -------------------------------------------------------------------
  // 23f. dedup_skewed_corpus — the adversarial-skew drill: the corpus
  // plus a synthetic 10k-copy clone cluster of one document (the
  // boilerplate/license-text shape real crawls contain). The skew-safe
  // pipeline collapses the cluster to ONE representative before any
  // shingle is computed, so band buckets stay clone-free and the
  // rep-level candidate pair count is INDEPENDENT of the clone count
  // (DedupSpec asserts that invariance). Output is the O(n) per-rep
  // dedup summary — group size + number of near-dup candidate
  // partners — never the quadratic member-pair expansion.
  // -------------------------------------------------------------------
  def skewedCorpus(spark: SparkSession, dir: String, nClones: Int = 10000): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val clones = docs
      .filter(col("doc_id") === 0L)
      .select(
        explode(sequence(lit(1000000L), lit(1000000L + nClones - 1))).as("doc_id"),
        col("text")
      )
    val norm = docs
      .union(clones)
      .select(col("doc_id"), normText(col("text")).as("norm"))
    val c = collapseExact(norm)
    val lsh = lshRepPairsFromNormed(c.reps)
    val sizes = c.groups.groupBy(col("rep_id")).agg(count(lit(1)).as("group_n"))
    val partners = lsh.pairs
      .select(col("doc_a").as("rep_id"))
      .union(lsh.pairs.select(col("doc_b").as("rep_id")))
      .groupBy(col("rep_id"))
      .agg(count(lit(1)).as("n_cand"))
    val out = sizes
      .join(partners, Seq("rep_id"), "left")
      .select(col("rep_id"), col("group_n"), coalesce(col("n_cand"), lit(0L)).as("n_cand"))
      .filter(col("group_n") > 1 || col("n_cand") > 0)
    releaseAfterRun(spark, out, Seq(lsh.bands))
  }

  // -------------------------------------------------------------------
  // graph_degree_dist — log₂-binned DEGREE DISTRIBUTION of the
  // rep-level LSH candidate graph: the one-glance skew diagnostic
  // (power-law tail ⇒ boilerplate hubs ⇒ the bucket caps and salting
  // earn their keep; flat ⇒ they don't). deg_bin = ⌊log₂ deg⌋ + 1
  // computed as length(bin(deg)) — pure integer, engine-portable, no
  // float log. Edges come off the persisted GraphTier (a table scan,
  // no in-query LSH); both endpoints explode ROW-LOCALLY from each
  // edge, then two partial-aggregable groupBys, the second ≤ 64 bins.
  // -------------------------------------------------------------------
  def graphDegreeDist(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.GraphTier
      .repEdges(spark, dir)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))
      .withColumn("deg_bin", length(expr("bin(deg)")).cast("long"))
      .groupBy(col("deg_bin"))
      .agg(
        count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"),
        sum(col("deg")).as("sum_deg")
      )
    out
  }

  // -------------------------------------------------------------------
  // 23m. dedup_bloom_prefilter — the BLOOM TIER of the contamination
  // funnel: before the exact shingle join (contamination_doc_overlap's
  // tier), every decontamination pipeline at scale first probes a
  // Bloom filter built over the training side's shingle set — the
  // filter is a fixed m-bit bitmap (m = 2²⁰ → 128 KiB) that broadcasts
  // to every executor, so the first pass over 100 TB of eval data
  // touches NO train-side shuffle at all. Expressed relationally: the
  // train bit set is a ≤m-row distinct-position table (structural
  // bound — positions live in [0, m)), broadcast-joined against eval
  // probe positions; a shingle "hits" iff all k probes find set bits.
  // Per eval doc the output carries both tiers — bloom hit fraction
  // and exact hit fraction, in micro — so the operator doubles as its
  // own false-positive accounting (Bloom admits FPs, never FNs:
  // n_bloom_hit >= n_exact_hit is structural, and DedupSpec pins it).
  // Probe-side dedup: positions are derived once per DISTINCT eval
  // shingle, then joined back per (doc, shingle).
  // -------------------------------------------------------------------
  def bloomPrefilter(
      spark: SparkSession,
      dir: String,
      m: Int = graft.functions.BloomFilter.DefaultBits,
      kProbes: Int = graft.functions.BloomFilter.DefaultProbes,
      candMicro: Long = 200000L
  ): DataFrame = {
    import graft.functions.BloomFilter
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), normText(col("text")).as("norm"))
    val evalSrc = docs.agg(min(col("source"))).head().getString(0)
    require(evalSrc != null, "dedup_bloom_prefilter: empty corpus")
    val trainBits = shinglesOf(docs.filter(col("source") =!= evalSrc).select(col("doc_id"), col("norm")))
      .select(col("shingle"))
      .distinct()
      .withColumn("hm", BloomFilter.baseHash(col("shingle")))
      .select(explode(BloomFilter.positions(col("hm"), m, kProbes)).as("pos"))
      .distinct() // <= m rows, structurally
    bloomProbe(spark, docs, evalSrc, trainBits, m, kProbes, candMicro)
  }

  /** probe tier of the bloom funnel against an already-built bit-set
    * table (`trainBits`: one `pos` column, ≤ m rows) — shared by the
    * batch operator (which derives the bits inline) and the streaming
    * dual (whose bits are drained state; the set-of-positions is
    * identical by idempotence, so the outputs match row for row)
    */
  private[graft] def bloomProbe(
      spark: SparkSession,
      docs: DataFrame,
      evalSrc: String,
      trainBits: DataFrame,
      m: Int,
      kProbes: Int,
      candMicro: Long
  ): DataFrame = {
    import graft.functions.BloomFilter
    val evalSh = shinglesOf(docs.filter(col("source") === evalSrc).select(col("doc_id"), col("norm")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    evalSh.count()
    val evalHits = evalSh
      .select(col("shingle"))
      .distinct()
      .withColumn("hm", BloomFilter.baseHash(col("shingle")))
      .select(col("shingle"), explode(BloomFilter.positions(col("hm"), m, kProbes)).as("pos"))
      .join(broadcast(trainBits.withColumn("set", lit(1L))), Seq("pos"), "left")
      .groupBy(col("shingle"))
      .agg(sum(coalesce(col("set"), lit(0L))).as("n_set"))
      .select(col("shingle"), (col("n_set") === kProbes.toLong).as("bloom_hit"))
    val trainShingleSet = shinglesOf(docs.filter(col("source") =!= evalSrc).select(col("doc_id"), col("norm")))
      .select(col("shingle"))
      .distinct()
      .withColumn("exact", lit(1L))
    val out = evalSh
      .join(evalHits, Seq("shingle"))
      .join(trainShingleSet, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_sh"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hit"),
        sum(coalesce(col("exact"), lit(0L))).as("n_exact_hit")
      )
      .withColumn("bloom_micro", expr("n_bloom_hit * 1000000 DIV n_sh"))
      .withColumn("exact_micro", expr("n_exact_hit * 1000000 DIV n_sh"))
      .withColumn("is_candidate", col("bloom_micro") >= candMicro)
      .withColumn("is_contaminated", col("exact_micro") >= candMicro)
    releaseAfterRun(spark, out, Seq(evalSh))
  }

  // -------------------------------------------------------------------
  // dedup_source_overlap — the cross-SOURCE corpus-overlap matrix:
  // per source pair, how many distinct 4-gram shingles the two feeds
  // share (the "is source B already inside source A" question a
  // mixture planner asks before paying for both), exact AND
  // KMV-estimated with both error ledgers. The KMV tier is the part
  // that survives 100 TB: per source the sketch is the k=128 smallest
  // 48-bit shingle hashes — the rank-filter window Spark rewrites into
  // a WindowGroupLimit bounded heap, never a per-source sort — so the
  // pair frame is the |sources|²-bounded self-join of 1-row-per-source
  // summaries (tiny broadcast). The exact tier joins distinct member
  // hashes with ≤|sources| fan-out per hash (a shingle lives in at
  // most every source once after the per-source DISTINCT), published
  // here because the operator reports its own error; at production
  // scale the sketch columns are the ones a planner would keep.
  // Shared estimator algebra and hash-prefix family with
  // approx_kmv_setops (Relational.kmvSetops).
  // -------------------------------------------------------------------
  def sourceOverlap(spark: SparkSession, dir: String, kSketch: Int = 128): DataFrame = {
    val P48  = 281474976710656L // 2^48
    val kNum = (kSketch - 1).toLong
    val members = Tables
      .documents(spark, dir)
      .select(col("source"), split(normText(col("text")), " ").as("toks"))
      .select(
        col("source"),
        explode(
          when(
            size(col("toks")) >= 4,
            expr("transform(sequence(0, size(toks) - 4), i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3]))")
          ).otherwise(array())
        ).as("g")
      )
      .withColumn(
        "h",
        conv(substring(md5(concat(lit("kso:"), col("g"))), 1, 12), 16, 10).cast("long")
      )
      .select(col("source"), col("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketch = members
      .withColumn("rn", row_number().over(Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rn") <= kSketch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = members.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    val perSrc = sketch
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("h_k"))
      .join(exact, Seq("source"))
      .withColumn(
        "est",
        when(col("n_sk") < kSketch, col("n_sk")).otherwise(expr(s"(${kNum}L * ${P48}L) DIV h_k"))
      )
    val a = perSrc.select(col("source").as("src_a"), col("n_exact").as("exact_a"), col("est").as("est_a"))
    val b = perSrc.select(col("source").as("src_b"), col("n_exact").as("exact_b"), col("est").as("est_b"))
    val pairs = a.join(broadcast(b), col("src_a") < col("src_b")) // |sources|² rows
    val pairSh = pairs
      .select(col("src_a"), col("src_b"))
      .join(
        broadcast(sketch.select(col("source"), col("h"))),
        col("source") === col("src_a") || col("source") === col("src_b")
      )
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(
        max(when(col("source") === col("src_a"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("source") === col("src_b"), 1L).otherwise(0L)).as("in_b")
      )
      .withColumn("rn", row_number().over(Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
      .filter(col("rn") <= kSketch)
      .groupBy(col("src_a"), col("src_b"))
      .agg(
        count(lit(1)).as("n_u"),
        max(col("h")).as("h_ku"),
        sum(col("in_a") * col("in_b")).as("n_both")
      )
    val exactInter = members
      .as("x")
      .join(members.as("y"), col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val out = pairs
      .join(pairSh, Seq("src_a", "src_b"))
      .join(exactInter, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("exact_union", expr("exact_a + exact_b - exact_inter"))
      .withColumn(
        "est_union",
        when(col("n_u") < kSketch, col("n_u")).otherwise(expr(s"(${kNum}L * ${P48}L) DIV h_ku"))
      )
      .withColumn("est_inter", expr("n_both * est_union DIV greatest(n_u, 1L)"))
      .withColumn("inter_err", expr("abs(est_inter - exact_inter)"))
      .select(
        col("src_a"),
        col("src_b"),
        col("exact_a"),
        col("exact_b"),
        col("est_a"),
        col("est_b"),
        col("exact_union"),
        col("est_union"),
        col("exact_inter"),
        col("est_inter"),
        col("inter_err")
      )
    releaseAfterRun(spark, out, Seq(members, sketch))
  }

  // -------------------------------------------------------------------
  // dedup_winnowing — the MOSS MATCHER on winnowed fingerprints:
  // text_winnowing selects ~2/(w+1) of each doc's 4-gram hashes (every
  // rolling-window minimum — guaranteed to catch any shared run ≥ w+3
  // tokens); this operator JOINS docs on those selected fingerprints
  // and reports pairs sharing ≥ 2, with overlap in bp of the smaller
  // doc's fingerprint set. The plagiarism/near-dup tier between
  // MinHash (probabilistic, full-doc) and ExactSubstr (exact, heavy):
  // deterministic selection, pair evidence you can point at. Scale
  // guardrail: fingerprints at > 64 docs (boilerplate) are dropped
  // from the PAIR JOIN — the dropOversizedBuckets policy; per-doc
  // fingerprint counts (the denominators) stay uncapped and honest.
  // -------------------------------------------------------------------
  def winnowingPairs(
      spark: SparkSession,
      dir: String,
      w: Int = 4,
      dfCap: Long = 64L,
      minShared: Long = 2L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(normText(col("text")), " ").as("toks"))
      .select(
        col("doc_id"),
        posexplode(
          when(
            size(col("toks")) >= 4,
            expr(
              "transform(sequence(0, size(toks) - 4), i -> " +
                "md5(concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3])))"
            )
          ).otherwise(array())
        ).as(Seq("pos", "h"))
      )
    val sel = (0 until w)
      .map { a =>
        val fr = Window
          .partitionBy(col("doc_id"))
          .orderBy(col("pos"))
          .rowsBetween(-a.toLong, (w - 1 - a).toLong)
        col("h") === min(col("h")).over(fr)
      }
      .reduce(_ || _)
    val fp = grams
      .withColumn("selected", when(sel, 1L).otherwise(0L))
      .filter(col("selected") === 1L)
      .select(col("doc_id"), col("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fp.count()
    val rare = fp
      .groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("h"))
    val capped = fp.join(rare, Seq("h"))
    val perDoc = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val out = capped
      .select(col("h"), col("doc_id").as("doc_a"))
      .join(capped.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(perDoc.toDF("doc_a", "n_fp_a"), Seq("doc_a"))
      .join(perDoc.toDF("doc_b", "n_fp_b"), Seq("doc_b"))
      .withColumn("overlap_bp", expr("n_shared * 10000 DIV least(n_fp_a, n_fp_b)"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_fp_a"), col("n_fp_b"), col("overlap_bp"))
    releaseAfterRun(spark, out, Seq(fp))
  }

  // -------------------------------------------------------------------
  // contamination_ngram_curve — the DECONTAMINATION KNOB swept: cross-
  // source shared-n-gram mass at n = 3/5/8, the curve that prices the
  // n-gram size every decontamination rule hard-codes (WMDP-style
  // 13-grams vs C4's shorter spans: small n over-matches boilerplate,
  // large n misses paraphrase — this is the measured middle). Per
  // (n, source pair): shared DISTINCT n-grams + containment of the
  // smaller set in micro. Joins carry the 60-bit shingle HASH (the
  // ngramJaccard tier — collisions can only read HIGH, bound n_a·n_b/2⁶⁰
  // per pair); each leg is a source-grain distinct + a hash self-join,
  // pairs with zero sharing drop from that leg (inner-join semantics,
  // mirrored by the oracle). All legs over one normalized corpus scan
  // per n; output is |n-values| × source-pairs rows.
  // -------------------------------------------------------------------
  def contaminationNgramCurve(spark: SparkSession, dir: String, ns: Seq[Int] = Seq(3, 5, 8)): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .select(col("source"), normText(col("text")).as("norm"))
    val cached = ns.map { n =>
      docs
        .select(col("source").as("doc_id"), col("norm"))
        .transform(shinglesOf(_, n))
        .select(
          col("doc_id").as("source"),
          expr("CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT)").as("hsh")
        )
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val legs = ns.zip(cached).map { case (n, sh) =>
      val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
      sh.as("x")
        .join(sh.as("y"), col("y.hsh") === col("x.hsh") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(sizes.toDF("source_a", "n_a"), Seq("source_a"))
        .join(sizes.toDF("source_b", "n_b"), Seq("source_b"))
        .select(
          lit(n.toLong).as("n"),
          col("source_a"),
          col("source_b"),
          col("n_shared"),
          col("n_a"),
          col("n_b"),
          expr("(n_shared * 1000000) DIV least(n_a, n_b)").as("contain_small_micro")
        )
    }
    releaseAfterRun(spark, legs.reduce(_ unionByName _), cached)
  }

  // -------------------------------------------------------------------
  // dedup_norm_ablation — how much duplicate mass does each
  // NORMALIZATION tier buy? Exact-dup rates under three canonical
  // forms — raw bytes, casefold, and the full normText (casefold +
  // punctuation→space + whitespace squeeze) — the ablation every
  // dedup paper tables (C4/RefinedWeb report exactly this) and the
  // number that decides whether a pipeline can afford the cheapest
  // tier. Monotone by construction (each tier's key is a function of
  // the previous tier's), which the spec pins. Plan: ONE corpus scan,
  // a row-local 3-way (tier, md5) stack, then two partial-aggregable
  // groupBys ((tier, hash) sizes → per-tier books); no joins, no
  // windows.
  // -------------------------------------------------------------------
  def normAblation(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .documents(spark, dir)
      .select(
        expr(
          "stack(3, " +
            "'raw', md5(text), " +
            "'casefold', md5(lower(text)), " +
            "'norm', md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' ')))" +
            ") AS (tier, h)"
        )
      )
      .groupBy(col("tier"), col("h"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("tier"))
      .agg(
        sum(col("sz")).as("n_docs"),
        count(lit(1)).as("n_groups"),
        sum(when(col("sz") >= 2L, col("sz")).otherwise(0L)).as("n_dup_docs")
      )
      .select(
        col("tier"),
        col("n_docs"),
        col("n_groups"),
        col("n_dup_docs"),
        expr("(n_dup_docs * 10000) DIV n_docs").as("dup_bp")
      )
  }

  // -------------------------------------------------------------------
  // dedup_minhash_k_curve — the SIGNATURE-BUDGET operating curve: how
  // much Jaccard-estimate accuracy does each MinHash slot buy? For
  // K = 4/8/12 (prefixes of the SAME K=12 signature, so the curve is
  // the budget decision a store admin actually faces — truncate or
  // keep), the candidate pairs' |estimate − exact| error is aggregated
  // fleet-wide: mean and max absolute error in micro. This is the
  // measured answer to "are 12 universal-hash slots enough", the
  // estimator-variance ledger next to dedup_lsh_tune's recall ledger
  // and ann_recall_vs_nprobe's probe curve. Plan: the skew-safe
  // rep-level core (exact-dup collapse → capped banded LSH pairs),
  // ONE exact-Jaccard hash join + one signature join per pair, a
  // row-local 3-way k-prefix stack, then a 3-row partial-aggregable
  // aggregate; within-group member pairs carry zero error (identical
  // shingle sets estimate exactly at every K) — they enter the books
  // as the oracle sees them but cannot distort max.
  // -------------------------------------------------------------------
  def minhashKCurve(spark: SparkSession, dir: String, ks: Seq[Int] = Seq(4, 8, 12)): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= K))
    val c = collapseExact(docsNorm(spark, dir))
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = shinglesOf(c.reps).distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = minhashSignatures(uniq).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val lsh = lshRepPairsFrom(uniq)
    val cand = lsh.pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand.count()
    // exact tier: the ngramJaccard 60-bit hash intersection
    val uniqH = uniq.select(
      col("doc_id"),
      expr("CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT)").as("hsh")
    )
    val counts = uniq.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(uniqH.as("x"), col("x.doc_id") === col("doc_a"))
      .join(uniqH.as("y"), col("y.doc_id") === col("doc_b") && col("y.hsh") === col("x.hsh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_n"))
    val sigA = sigs.toDF("doc_a" +: (0 until K).map(j => s"a$j"): _*)
    val sigB = sigs.toDF("doc_b" +: (0 until K).map(j => s"b$j"): _*)
    val errCols = ks.map { k =>
      val agreeSql = (0 until k).map(j => s"(CASE WHEN a$j = b$j THEN 1L ELSE 0L END)").mkString(" + ")
      expr(s"abs(($agreeSql) * 1000000 DIV $k - exact_micro)").as(s"err$k")
    }
    val repScored = cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter_n", coalesce(col("inter_n"), lit(0L)))
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), Seq("doc_b"))
      .withColumn("exact_micro", expr("inter_n * 1000000 DIV (na + nb - inter_n)"))
      .join(sigA, Seq("doc_a"))
      .join(sigB, Seq("doc_b"))
      .select(col("doc_a") +: col("doc_b") +: errCols: _*)
    val expanded = expandMemberPairs(
      repScored,
      groups,
      lsh.banded,
      carried = ks.map(k => s"err$k"),
      withinValues = ks.map(_ => lit(0L))
    )
    val stacked = expanded.select(
      expr(
        "stack(" + ks.size + ", " +
          ks.map(k => s"CAST($k AS BIGINT), err$k").mkString(", ") + ") AS (k, err)"
      )
    )
    val out = stacked
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("err")).as("serr"), max(col("err")).as("max_abs_err_micro"))
      .select(
        col("k"),
        col("n_pairs"),
        expr("serr DIV n_pairs").as("mean_abs_err_micro"),
        col("max_abs_err_micro")
      )
    releaseAfterRun(spark, out, Seq(uniq, sigs, cand, lsh.bands, groups))
  }

  // -------------------------------------------------------------------
  // 39x. dedup_prefix_filter — the AllPairs/PPJoin PREFIX-FILTERING
  // set-similarity join (Bayardo et al. WWW'07; Xiao et al. WWW'08):
  // the EXACT-recall alternative to MinHash-LSH, over the same word
  // 3-gram shingle sets the LSH family bands (single-word token sets
  // are degenerate on a bounded vocabulary — every doc shares the hot
  // words — while shingles keep similarity sparse). Each document
  // keeps only its p = n − ⌈τ·n⌉ + 1 RAREST shingles (global
  // (df, shingle) order — no global rank materialized, the pair IS
  // the sort key), and the prefix theorem guarantees any pair with
  // Jaccard ≥ τ shares a prefix shingle, so candidate generation is a
  // self-equi-join on prefix shingles only. Verification is the exact
  // integer Jaccard over the full distinct-shingle sets, the
  // threshold cross-multiplied (den·inter ≥ num·union — no division).
  // Scale shape: the join fans out per SHINGLE with df bounded by
  // rarity (a doc's prefix holds its rarest shingles; boilerplate
  // stays out of prefixes), work scales with Σ_prefix df², never
  // corpus²; recall is 100% by theorem — the trade against LSH this
  // row exists to publish (compare dedup_recall_eval's measured LSH
  // recall at the same τ).
  // -------------------------------------------------------------------
  def prefixFilterPairs(
      spark: SparkSession,
      dir: String,
      tauNum: Int = 8,
      tauDen: Int = 10
  ): DataFrame = {
    // exact-dup collapse FIRST (the house LSH discipline): a 10^5-copy
    // boilerplate family would otherwise put every copy's prefix in
    // the same buckets — quadratic pair melt on one reducer; reps pay
    // the prefix join once, members re-expand after with the J=1
    // within-group contract
    val c      = collapseExact(docsNorm(spark, dir))
    val groups = c.groups.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // toks (normalize + shingle + distinct over the rep corpus) feeds
    // FOUR downstream branches (df, ranked/prefix, counts, both inter
    // sides) — persist it or the shingle pipeline recomputes per branch
    val toks = shinglesOf(c.reps)
      .withColumnRenamed("shingle", "tok")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df     = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ranked = toks
      .join(df, Seq("tok"))
      .withColumn(
        "rn",
        row_number()
          .over(Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("tok").asc))
          .cast("long")
      )
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // p = n − ⌈τn⌉ + 1 with ⌈τn⌉ = (num·n + den − 1) DIV den
      .withColumn("p", expr(s"n - ($tauNum * n + $tauDen - 1) DIV $tauDen + 1"))
    val prefix = ranked.filter(col("rn") <= col("p")).select(col("doc_id"), col("tok"))
    val cand = prefix
      .as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val counts = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val inter = cand
      .join(toks.as("x"), col("x.doc_id") === col("doc_a"))
      .join(toks.as("y"), col("y.doc_id") === col("doc_b") && col("y.tok") === col("x.tok"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_n"))
    val repScores = cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter_n", coalesce(col("inter_n"), lit(0L)))
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_tok", "na"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_tok", "nb"), Seq("doc_b"))
      .withColumn("union_n", col("na") + col("nb") - col("inter_n"))
      .filter(col("inter_n") * tauDen >= col("union_n") * tauNum)
      .select(
        col("doc_a"),
        col("doc_b"),
        col("inter_n"),
        col("union_n"),
        expr("inter_n * 10000 DIV union_n").as("jac_bp")
      )
    // within-group member pairs are identical texts: inter = union =
    // |rep's shingle set|, J exactly 1
    val out = expandMemberPairs(
      repScores,
      groups,
      counts,
      carried = Seq("inter_n", "union_n", "jac_bp"),
      withinValues = Seq(col("n_tok"), col("n_tok"), lit(10000L))
    )
    releaseAfterRun(spark, out, Seq(groups, toks))
  }

  // -------------------------------------------------------------------
  // 39y. emb_threshold_curve — the COSINE-THRESHOLD operating curve
  // for embedding dedup (the number a pipeline owner reads before
  // picking dedup_embedding's τ): over the SAME hyperplane-LSH
  // candidate set and exact-cosine verification as dedup_embedding
  // (threshold 0.4 — the registered operating point's own base), the
  // pair count, distinct-document count, and corpus dup-mass (bp) at
  // each tighter tier ∈ {0.4, 0.6, 0.8, 0.95}·10⁶. Candidates come
  // from the banded matcher, so tiers read "what the deployed
  // pipeline would remove at τ" — the LSH recall gap below the
  // operating band is dedup_recall_eval's number, not this one. One
  // LSH pass + one scoring, then a 4-row rollup; the corpus size is a
  // 1-row broadcast.
  // -------------------------------------------------------------------
  def embThresholdCurve(
      spark: SparkSession,
      dir: String,
      tiers: Seq[Long] = Seq(400000L, 600000L, 800000L, 950000L)
  ): DataFrame = {
    val pairs = embeddingNearDup(spark, dir, threshold = 0.4)
      .select(col("vec_a"), col("vec_b"), col("cos_micro"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tiered = pairs
      .withColumn("thr_micro", explode(typedlit(tiers)))
      .filter(col("cos_micro") >= col("thr_micro"))
    val np = tiered.groupBy(col("thr_micro")).agg(count(lit(1)).as("np"))
    val nd = tiered
      .select(col("thr_micro"), col("vec_a").as("v"))
      .unionByName(tiered.select(col("thr_micro"), col("vec_b").as("v")))
      .distinct()
      .groupBy(col("thr_micro"))
      .agg(count(lit(1)).as("nd"))
    val tot = Tables.embeddings(spark, dir).agg(count(lit(1)).as("n_vecs"))
    val out = spark
      .range(1)
      .select(explode(typedlit(tiers)).as("thr_micro"))
      .join(np, Seq("thr_micro"), "left")
      .join(nd, Seq("thr_micro"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("thr_micro"),
        coalesce(col("np"), lit(0L)).as("n_pairs"),
        coalesce(col("nd"), lit(0L)).as("n_dup_docs"),
        expr("coalesce(nd, 0L) * 10000 DIV n_vecs").as("dup_mass_bp")
      )
    releaseAfterRun(spark, out, Seq(pairs))
  }

  // -------------------------------------------------------------------
  // 39z. graph_louvain_gain — ONE Louvain modularity-gain round from
  // singleton communities in exact integers (the greedy move step the
  // Louvain method iterates; LPA + the modularity score already exist
  // — this is the gain-DRIVEN move rule those methods lack): for node
  // i and neighbor j, merging i into j's singleton community changes
  // Q by (2m·w_ij − k_i·k_j)/(2m²) — with unit edge weights the
  // numerator 2m − k_i·k_j is a pure integer, so the per-node argmax
  // (gain desc, neighbor asc) is bit-identical cross-engine and only
  // POSITIVE-gain moves emit (the Louvain acceptance rule). One edge
  // pass + two degree joins + a per-node rank window; m is a 1-row
  // broadcast. At 100 TB this is the shape each Louvain level runs
  // per sweep — nothing is corpus-pairwise beyond the edge table the
  // LSH tier already maintains.
  // -------------------------------------------------------------------
  def louvainGain(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.sources.GraphTier.memberEdges(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = symEdges(pairs)
    val deg   = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("k"))
    val m1    = pairs.agg(count(lit(1)).as("mm"))
    val w     = Window.partitionBy(col("node")).orderBy(col("gain_num").desc, col("merges_into").asc)
    val out = edges
      .join(deg.select(col("node").as("src"), col("k").as("k_node")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("k").as("k_best")), Seq("dst"))
      .crossJoin(broadcast(m1))
      .select(
        col("src").as("node"),
        col("dst").as("merges_into"),
        col("k_node"),
        col("k_best"),
        // DECIMAL selection arithmetic: 2m and k_i·k_j overflow Long at
        // 100 TB edge counts (the published column casts back to LONG —
        // the unit-weight singleton gain is bounded by 2m there)
        expr("CAST(2 AS DECIMAL(38,0)) * mm - CAST(k_node AS DECIMAL(38,0)) * k_best").as("gain_num")
      )
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1 && col("gain_num") > 0L)
      .select(
        col("node"),
        col("merges_into"),
        col("k_node"),
        col("k_best"),
        col("gain_num").cast("long").as("gain_num")
      )
    releaseAfterRun(spark, out, Seq(pairs))
  }

  // -------------------------------------------------------------------
  // 39z2. graph_louvain_apply — APPLY the gain round and MEASURE the
  // modularity it buys: the positive-gain moves of [[louvainGain]]
  // merge via connected components (the distributed SIMULTANEOUS
  // apply — chained moves a→b→c collapse to one community, the
  // standard parallel-Louvain relaxation), and the report publishes
  // Newman Q before (singletons: intra = 0, Q = −Σk²/4m²) and after
  // in exact basis points. A positive q_after − q_before is the
  // measured proof the move rule does its job (simultaneous apply is
  // a relaxation, so the gate is the measurement, not a theorem —
  // which is exactly why the number is published). Costs: the gain
  // round + a CC over ONLY the move edges (≤ one edge per node) +
  // the modularity joins — nothing corpus-pairwise.
  // -------------------------------------------------------------------
  def louvainApply(spark: SparkSession, dir: String): DataFrame = {
    val mem   = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pairs = graft.sources.GraphTier.memberEdges(spark, dir).select(col("doc_a"), col("doc_b")).persist(mem)
    val m     = pairs.count()
    val edges = symEdges(pairs)
    val deg   = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("k")).persist(mem)
    val wRnk  = Window.partitionBy(col("node")).orderBy(col("gain_num").desc, col("merges_into").asc)
    // m is already on the driver (the pairs.count above) — reuse it as
    // a literal instead of a second edge-count aggregate in the plan;
    // moves is pinned because BOTH the CC loop and nMoves consume it
    // (unpinned, the gain join + rank window re-executes per consumer)
    val moves = edges
      .join(deg.select(col("node").as("src"), col("k").as("k_node")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("k").as("k_best")), Seq("dst"))
      .select(
        col("src").as("node"),
        col("dst").as("merges_into"),
        // DECIMAL, like louvainGain/louvainCore: exact at any scale
        (lit(2L * m).cast("decimal(38,0)") -
          col("k_node").cast("decimal(38,0)") * col("k_best")).as("gain_num")
      )
      .withColumn("rnk", row_number().over(wRnk))
      .filter(col("rnk") === 1 && col("gain_num") > 0L)
      .select(col("node").as("doc_a"), col("merges_into").as("doc_b"))
      .localCheckpoint()
    val cc = connectedComponents(moves).persist(mem) // (doc_id, cluster_id) over move participants
    cc.count()
    // every node gets a community: movers their component, the rest themselves
    val labels = deg
      .select(col("node"))
      .join(cc.withColumnRenamed("doc_id", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("cluster_id"), col("node")).as("lab"))
      .persist(mem)
    val nNodes = labels.count()
    val nMoves = moves.count()
    val intra = pairs
      .join(labels.select(col("node").as("doc_a"), col("lab").as("la")), Seq("doc_a"))
      .join(labels.select(col("node").as("doc_b"), col("lab").as("lb")), Seq("doc_b"))
      .filter(col("la") === col("lb"))
      .count()
    val degc = deg
      .join(labels, Seq("node"))
      .groupBy(col("lab"))
      .agg(sum(col("k")).as("dc"))
    val row = degc
      .agg(count(lit(1)).as("n_comm"), sum(expr("CAST(dc AS DECIMAL(38,0)) * dc")).as("sdc2"))
      .head()
    val (nComm, sdc2) = (
      row.getAs[Long]("n_comm"),
      Option(row.getAs[java.math.BigDecimal]("sdc2")).map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0))
    )
    // singleton Q: intra = 0, Σ(dc²) = Σk² — compute from deg directly
    val sk2 = deg
      .agg(sum(expr("CAST(k AS DECIMAL(38,0)) * k")).as("sk2"))
      .head()
      .getAs[java.math.BigDecimal]("sk2")
    val sk2B     = Option(sk2).map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0))
    val qBefore  = if (m == 0L) 0L else ((BigInt(-10000) * sk2B) / (BigInt(4) * m * m)).toLong
    val qAfter =
      if (m == 0L) 0L
      else ((BigInt(10000) * (BigInt(4) * m * intra - sdc2)) / (BigInt(4) * m * m)).toLong
    val spark2 = pairs.sparkSession
    Seq(pairs, deg, cc, labels).foreach(_.unpersist())
    spark2
      .range(1)
      .select(
        lit(nNodes).as("n_nodes"),
        lit(m).as("n_edges"),
        lit(nMoves).as("n_moves"),
        lit(nComm).as("n_communities"),
        lit(intra).as("intra_edges"),
        lit(qBefore).as("q_before_bp"),
        lit(qAfter).as("q_after_bp")
      )
  }

  // -------------------------------------------------------------------
  // 39z3. graph_louvain_levels — the REAL Louvain loop: gain + apply
  // iterated with community CONTRACTION between levels (communities
  // collapse to super-nodes; cross-community edge weights aggregate,
  // intra weights become self-loops) and the Q-ACCEPTANCE gate per
  // level — a level's simultaneous apply is kept only if it RAISES
  // modularity, else the level is a published no-op and the partition
  // has converged (the relaxation can in principle overshoot; the
  // gate is what makes per-level Q monotone non-decreasing BY
  // CONSTRUCTION, which the output row sequence proves). All exact
  // integers: weighted gain numerator 2M·w_ij − k_i·k_j (k counts a
  // self-loop twice; M = total weight, INVARIANT under contraction —
  // published per level as the conservation check), and the gate
  // compares Q NUMERATORS N = 4M·ΣIN − Σdeg_c² over the shared
  // constant denominator 4M² — no truncation ever enters the
  // accept/reject decision (bp truncation happens only in the
  // published q_bp). Scale shape per level: one weighted-degree
  // aggregate, one gain join + rank window, CC over ≤1 move edge per
  // node, and a contraction groupBy — every input is the PERSISTED
  // edge tier or the (monotonically shrinking) contracted graph;
  // level count is bounded by the gate, nothing is ever
  // corpus-pairwise. This is the quality/cost referee the modularity
  // op was built for: LPA's fixed round budget vs gain-driven moves,
  // measured on the same exact-Q scale.
  // -------------------------------------------------------------------
  def louvainLevels(spark: SparkSession, dir: String, maxLevels: Int = 3): DataFrame =
    louvainRunFor(spark, dir, maxLevels).levels

  /** graph_louvain_labels — the CONSUMABLE artifact of the multi-level
    * loop: every candidate-graph doc mapped to its FINAL community
    * (gated labels composed through the levels — a doc's level-1
    * community is a level-2 node, whose label is a level-3 node, …).
    * The ledger (graph_louvain_levels) says the loop worked; this is
    * the column a dedup/curation pipeline actually joins on — the
    * Louvain alternative to dedup_clusters' CC labels and
    * dedup_label_prop's LPA labels, same output grain.
    */
  def louvainLabels(spark: SparkSession, dir: String, maxLevels: Int = 3): DataFrame =
    louvainRunFor(spark, dir, maxLevels).labels

  /** ONE louvainCore execution serves both graph_louvain_levels and
    * graph_louvain_labels (they are two projections of the same run) —
    * the [[graft.sources.GraphTier]] ensure discipline applied to the
    * computation: memoized per (tier path, maxLevels) per process. The
    * cached frames are driver-local rows (levels) and a
    * localCheckpoint-pinned label table, so replay never recomputes
    * the level loop. Keyed by the TIER path (collision-proof digest,
    * see TimeboxStore.sharedScratchPath) PLUS the tier's content
    * fingerprint and the owning SparkContext's applicationId —
    * rebuilding the tier or restarting the session in-process makes a
    * fresh key instead of serving stale rows / checkpoint frames bound
    * to a dead context — and BOUNDED (LRU cap 8): a long-lived service
    * over many corpora caps its pinned checkpoint frames instead of
    * accumulating one per corpus-ever-seen.
    */
  private val louvainCache =
    new graft.sources.ProcessMemo[(String, Int, Long, String), LouvainRun](8)

  private def louvainRunFor(spark: SparkSession, dir: String, maxLevels: Int): LouvainRun = {
    val tier = graft.sources.GraphTier.ensureLshTier(spark, dir)
    val key = (
      tier,
      maxLevels,
      graft.sources.GraphTier.tierFingerprint(tier),
      spark.sparkContext.applicationId
    )
    louvainCache.getOrElseUpdate(key) {
      louvainCore(spark, graft.sources.GraphTier.memberEdges(spark, dir), maxLevels)
    }
  }

  private[graft] def louvainLevelsFrom(spark: SparkSession, pairs: DataFrame, maxLevels: Int): DataFrame =
    louvainCore(spark, pairs, maxLevels).levels

  private[graft] def louvainLabelsFrom(spark: SparkSession, pairs: DataFrame, maxLevels: Int): DataFrame =
    louvainCore(spark, pairs, maxLevels).labels

  private[graft] case class LouvainRun(levels: DataFrame, labels: DataFrame)

  /** The level loop over an arbitrary unit-weight (doc_a, doc_b) pair
    * frame — DedupSpec drives it with a ring-of-cliques graph, the
    * textbook case where level 1 finds the cliques and level 2's
    * contracted pass merges adjacent clique supernodes (the
    * resolution-limit merge a single gain round can never see).
    * Returns both the per-level ledger and the composed final labels
    * (original node → community after the last accepted level).
    */
  private[graft] def louvainCore(spark: SparkSession, pairs: DataFrame, maxLevels: Int): LouvainRun = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var edges = pairs
      .select(col("doc_a").as("a"), col("doc_b").as("b"), lit(1L).as("w"))
      .localCheckpoint()
    // self-loop weights per node (empty at level 1; contraction fills it)
    var selfs = spark.range(0).select(col("id").as("node"), col("id").as("s"))
    val M = edges.count() // total weight — invariant under contraction
    val m2 = BigInt(2) * M
    var qNumPrev: BigInt = null // set from level 1's singleton Σk²
    var acc: DataFrame = null   // original node → current community
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long, Long, Long, Long)]
    for (level <- 1 to maxLevels) {
      val sym = edges
        .select(col("a").as("src"), col("b").as("dst"), col("w"))
        .unionByName(edges.select(col("b").as("src"), col("a").as("dst"), col("w")))
      // nodes = edge endpoints ∪ self-loop-only supernodes (a fully
      // collapsed component has no external edges but still a node)
      val nodes = sym
        .select(col("src").as("node"))
        .unionByName(selfs.select(col("node")))
        .distinct()
      val deg = nodes
        .join(sym.groupBy(col("src").as("node")).agg(sum(col("w")).as("kw")), Seq("node"), "left")
        .join(selfs, Seq("node"), "left")
        .select(col("node"), (coalesce(col("kw"), lit(0L)) + lit(2L) * coalesce(col("s"), lit(0L))).as("k"))
        .persist(mem)
      val sk2Row = deg.agg(sum(expr("CAST(k AS DECIMAL(38,0)) * k")).as("sk2")).head()
      val sk2 = Option(sk2Row.getAs[java.math.BigDecimal]("sk2")).map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0))
      if (qNumPrev == null) qNumPrev = -sk2 // singleton partition: ΣIN = 0
      val wRnk = Window.partitionBy(col("node")).orderBy(col("gain_num").desc, col("merges_into").asc)
      // gain in DECIMAL(38,0): at 100 TB scale 2M·w and k_i·k_j overflow
      // Long (the Q-gate side is already exact BigInt/DECIMAL; the move
      // SELECTION must be too, or overflow silently corrupts the argmax)
      val moves = sym
        .join(deg.select(col("node").as("src"), col("k").as("k_node")), Seq("src"))
        .join(deg.select(col("node").as("dst"), col("k").as("k_best")), Seq("dst"))
        .select(
          col("src").as("node"),
          col("dst").as("merges_into"),
          (lit(m2.toLong).cast("decimal(38,0)") * col("w") -
            col("k_node").cast("decimal(38,0)") * col("k_best")).as("gain_num")
        )
        .withColumn("rnk", row_number().over(wRnk))
        .filter(col("rnk") === 1 && col("gain_num") > 0L)
        .select(col("node").as("doc_a"), col("merges_into").as("doc_b"))
        .localCheckpoint()
      val nMoves = moves.count()
      val cc = connectedComponents(moves)
      val labCand = nodes
        .join(cc.withColumnRenamed("doc_id", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("cluster_id"), col("node")).as("lab"))
        .localCheckpoint()
      def bigOf(r: org.apache.spark.sql.Row): BigInt =
        Option(r.getAs[java.math.BigDecimal]("x")).map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0))
      val selfSumB = bigOf(selfs.agg(sum(expr("CAST(s AS DECIMAL(38,0))")).as("x")).head())
      // the conservation check, MEASURED: total weight of THIS level's
      // graph (cross edges + self loops), re-computed from the
      // contracted tables — not the level-1 driver constant re-published
      // — so a contraction that loses or duplicates weight fails the
      // published m_w invariance row (and DedupSpec's assertion on it)
      val mW = bigOf(edges.agg(sum(expr("CAST(w AS DECIMAL(38,0))")).as("x")).head()) + selfSumB
      // candidate Q numerator: ΣIN (same-label edge weight + ALL self
      // loops — intra by definition) and Σdeg_c² over candidate labels
      val sIn = bigOf(
        edges
          .join(labCand.select(col("node").as("a"), col("lab").as("la")), Seq("a"))
          .join(labCand.select(col("node").as("b"), col("lab").as("lb")), Seq("b"))
          .filter(col("la") === col("lb"))
          .agg(sum(expr("CAST(w AS DECIMAL(38,0))")).as("x"))
          .head()
      ) + selfSumB
      val dc = deg
        .join(labCand, Seq("node"))
        .groupBy(col("lab"))
        .agg(sum(col("k")).as("dcv"))
        .persist(mem)
      val dcRow = dc
        .agg(count(lit(1)).as("n_comm"), sum(expr("CAST(dcv AS DECIMAL(38,0)) * dcv")).as("sdc2"))
        .head()
      val sdc2 = Option(dcRow.getAs[java.math.BigDecimal]("sdc2")).map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0))
      val qNumCand = BigInt(2) * m2 * sIn - sdc2 // 4M·ΣIN − Σdc²
      val accepted = qNumCand > qNumPrev
      val nNodes = deg.count()
      val nCommCand = dcRow.getAs[Long]("n_comm")
      val (lab, nComm) =
        if (accepted) (labCand, nCommCand)
        else (labCand.select(col("node"), col("node").as("lab")), nNodes)
      if (accepted) qNumPrev = qNumCand
      val qBp = if (M == 0L) 0L else ((BigInt(10000) * qNumPrev) / (m2 * m2)).toLong
      rows += ((level.toLong, nNodes, mW.toLong, nMoves, if (accepted) 1L else 0L, nComm, qBp))
      // compose the ORIGINAL-node → community mapping through this
      // level (a level's node IS a previous level's label)
      acc =
        if (acc == null) lab.select(col("node"), col("lab").as("cur")).localCheckpoint()
        else
          acc
            .join(lab.withColumnRenamed("node", "cur"), Seq("cur"))
            .select(col("node"), col("lab").as("cur"))
            .localCheckpoint()
      // contract for the next level (identity labels → graph unchanged)
      val nextEdges = edges
        .join(lab.select(col("node").as("a"), col("lab").as("la")), Seq("a"))
        .join(lab.select(col("node").as("b"), col("lab").as("lb")), Seq("b"))
        .filter(col("la") =!= col("lb"))
        .groupBy(least(col("la"), col("lb")).as("a"), greatest(col("la"), col("lb")).as("b"))
        .agg(sum(col("w")).as("w"))
        .localCheckpoint()
      val nextSelfs = edges
        .join(lab.select(col("node").as("a"), col("lab").as("la")), Seq("a"))
        .join(lab.select(col("node").as("b"), col("lab").as("lb")), Seq("b"))
        .filter(col("la") === col("lb"))
        .select(col("la").as("node"), col("w").as("s"))
        .unionByName(selfs.join(lab, Seq("node")).select(col("lab").as("node"), col("s")))
        .groupBy(col("node"))
        .agg(sum(col("s")).as("s"))
        .localCheckpoint()
      deg.unpersist()
      dc.unpersist()
      edges = nextEdges
      selfs = nextSelfs
    }
    import spark.implicits._
    LouvainRun(
      rows.toSeq
        .toDF("level", "n_nodes", "m_w", "n_moves", "accepted", "n_communities", "q_bp"),
      acc.select(col("node").as("doc_id"), col("cur").as("community"))
    )
  }
}
