package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup.normText
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines: token stats,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All row-local (embarrassingly parallel — no shuffle at all except
  * where an aggregate is the point), all built from codegen'd
  * built-ins (split/transform/filter/regexp), and all scores emitted
  * as integers (counts or micro-ratios via integer division) so
  * results are exact.
  */
object TextAnalysis {

  private def docsToks(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text"), split(normText(col("text")), " ").as("toks"))

  // -------------------------------------------------------------------
  // 29. text_tokens — whitespace tokens, alpha-run "BPE-ish" tokens,
  // unique-token counts.
  // -------------------------------------------------------------------
  def tokens(spark: SparkSession, dir: String): DataFrame =
    docsToks(spark, dir).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
      expr("size(regexp_extract_all(lower(text), '[a-z]+', 0))").cast("long").as("n_alpha_tokens"),
      size(array_distinct(col("toks"))).cast("long").as("n_unique_tokens")
    )

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  // -------------------------------------------------------------------
  // 30. text_quality — length/stopword/punctuation sub-scores and an
  // integer quality verdict (n_chars>=100 and stopword ratio >= 5%).
  // -------------------------------------------------------------------
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    docsToks(spark, dir)
      .select(
        col("doc_id"),
        col("text"),
        col("toks"),
        // repetition signal: duplicate 4-token windows (the Gopher-style
        // duplicate n-gram fraction) — row-local array work, no explode
        when(
          size(col("toks")) >= 4,
          expr(
            "transform(sequence(0, size(toks) - 4), i -> " +
              "concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3]))"
          )
        ).otherwise(array()).as("wins")
      )
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), t => array_contains(stopArr, t))).cast("long").as("n_stopwords"),
        expr("size(regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0))").cast("long").as("n_punct"),
        size(col("wins")).cast("long").as("n_windows"),
        size(array_distinct(col("wins"))).cast("long").as("n_unique_windows")
      )
      .withColumn("stop_ratio_micro", expr("n_stopwords * 1000000 DIV n_tokens"))
      .withColumn(
        "dup_win_micro",
        when(col("n_windows") > 0, expr("(n_windows - n_unique_windows) * 1000000 DIV n_windows"))
          .otherwise(0L)
      )
      .withColumn(
        "is_quality",
        when(col("n_chars_raw") >= 100 && col("n_stopwords") * 20 >= col("n_tokens"), 1L).otherwise(0L)
      )
  }

  // -------------------------------------------------------------------
  // 30b. quality_rules_by_source — the corpus-health dashboard: the
  // Gopher-style hard-filter rule set (too short / too long / mean
  // word length out of band / too few stopwords) evaluated per doc and
  // AGGREGATED PER SOURCE, so a pipeline owner sees which ingest feed
  // is rotting before anything trains on it. One corpus scan, fully
  // partial-aggregable (rule verdicts are row-local 0/1 longs); mean
  // word length uses the exact identity sum_len = len(norm) − (n−1)
  // over the single-spaced normalized text — no HOF, no float.
  // -------------------------------------------------------------------
  /** doc-grain rule flags shared by the batch report and its
    * streaming dual — the flags are ROW-LOCAL, so the per-source
    * aggregate is purely additive and the drained stream state equals
    * the batch answer by algebra
    */
  private[graft] def qualityFlags(docs: DataFrame): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    docs
      .select(
        col("source"),
        split(normText(col("text")), " ").as("toks"),
        normText(col("text")).as("nrm")
      )
      .select(
        col("source"),
        size(col("toks")).cast("long").as("n_toks"),
        (length(col("nrm")) - size(col("toks")) + 1).cast("long").as("sum_len"),
        size(filter(col("toks"), t => array_contains(stopArr, t))).cast("long").as("n_stop")
      )
      .withColumn("mean_len_micro", expr("sum_len * 1000000 DIV n_toks"))
      .select(
        col("source"),
        when(col("n_toks") < 25, 1L).otherwise(0L).as("fail_short"),
        when(col("n_toks") > 80, 1L).otherwise(0L).as("fail_long"),
        when(col("mean_len_micro") < 4000000L || col("mean_len_micro") > 5000000L, 1L)
          .otherwise(0L)
          .as("fail_wordlen"),
        when(col("n_stop") < 2, 1L).otherwise(0L).as("fail_stop")
      )
      .withColumn(
        "keep",
        when(col("fail_short") + col("fail_long") + col("fail_wordlen") + col("fail_stop") === 0L, 1L)
          .otherwise(0L)
      )
  }

  /** the per-source rule-violation aggregate both tiers share */
  private[graft] def qualityBooks(flags: DataFrame): DataFrame =
    flags
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("fail_short")).as("n_fail_short"),
        sum(col("fail_long")).as("n_fail_long"),
        sum(col("fail_wordlen")).as("n_fail_wordlen"),
        sum(col("fail_stop")).as("n_fail_stop"),
        sum(col("keep")).as("n_keep")
      )

  def qualityRulesBySource(spark: SparkSession, dir: String): DataFrame =
    qualityBooks(qualityFlags(Tables.documents(spark, dir)))

  // -------------------------------------------------------------------
  // 31f. sample_hash_split — deterministic train/valid/test assignment
  // (80/10/10) by content-independent hash threshold: the split a doc
  // lands in is a pure function of its id, so re-runs, backfills, and
  // incremental ingests all agree without any coordination — the
  // property rand()-based splits lack. Pure map + one partial-
  // aggregable groupBy: no shape that changes at 100 TB.
  // -------------------------------------------------------------------
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    val hv = expr(
      "(instr('0123456789abcdef', substring(md5(concat('split:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(md5(concat('split:', CAST(doc_id AS STRING))), 2, 1)) - 1)"
    )
    Tables
      .documents(spark, dir)
      .withColumn("hv", hv.cast("long"))
      .withColumn(
        "split",
        when(col("hv") < 204, "train").when(col("hv") < 230, "valid").otherwise("test")
      )
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** sample_split_leakage — EVAL-HYGIENE audit: near-dup pairs that
    * STRADDLE the train/valid/test hash split. A benchmark split is
    * only honest if no test doc has a near-duplicate in train — this
    * operator counts exactly those pairs, per split-pair cell (the
    * same LSH candidate pairs dedup_minhash_lsh emits, joined to
    * sample_hash_split's own assignment rule). At 100 TB this is the
    * audit run BEFORE any eval is trusted; a nonzero train↔test cell
    * is a leaked benchmark. Scale shape: the pair table is the
    * already-bounded LSH output; two doc-keyed joins to the row-local
    * split assignment (pinned shuffle-merge — the split side is
    * corpus-sized and must never broadcast at scale), ONE groupBy onto
    * ≤ 6 split-pair cells.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val hv = expr(
      "(instr('0123456789abcdef', substring(md5(concat('split:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(md5(concat('split:', CAST(doc_id AS STRING))), 2, 1)) - 1)"
    )
    val split = Tables
      .documents(spark, dir)
      .select(col("doc_id"), hv.cast("long").as("hv"))
      .select(
        col("doc_id"),
        when(col("hv") < 204, "train").when(col("hv") < 230, "valid").otherwise("test").as("split")
      )
    graft.operators.Dedup
      .minhashLsh(spark, dir)
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")).hint("merge"), Seq("doc_a"))
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")).hint("merge"), Seq("doc_b"))
      .select(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi")
      )
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak", col("split_lo") =!= col("split_hi"))
  }

  // -------------------------------------------------------------------
  // 31g. text_dedup_rate_by_source — per-source duplication audit: doc
  // count vs distinct-content count and the integer dup rate. The
  // per-feed health metric a pipeline owner watches to catch a crawler
  // re-fetching the same pages. One shuffle on (source, hash) worth of
  // partial aggregation — countDistinct plans as the standard
  // two-phase expand, never a pair join.
  // -------------------------------------------------------------------
  def dedupRateBySource(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("source"), md5(normText(col("text"))).as("th"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("th")).as("n_distinct"))
      .withColumn("dup_rate_micro", expr("(n_docs - n_distinct) * 1000000 DIV n_docs"))

  // -------------------------------------------------------------------
  // 31d. sample_temperature — temperature-based data mixing (T = 2):
  // per-language keep probability ∝ sqrt(min_lang_count / lang_count),
  // so over-represented languages downsample toward balance while the
  // rarest keeps everything — the standard multilingual mixing step.
  // The keep test is the deterministic md5-threshold trick (no rand()):
  // threshold = floor(256·sqrt(min_n/n)) in 1/256 units, compared to
  // the first two hex digits of md5('mix:'||doc_id). The sqrt is
  // IEEE-deterministic from exact integer counts, so the kept SET —
  // not just its size — is engine-reproducible.
  // -------------------------------------------------------------------
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs")).as("min_n"))
    val thresh = counts
      .crossJoin(broadcast(minN))
      .withColumn(
        "thresh",
        floor(lit(256.0) * sqrt(col("min_n").cast("double") / col("n_docs").cast("double"))).cast("long")
      )
    val hexVal = expr(
      "(instr('0123456789abcdef', substring(md5(concat('mix:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(md5(concat('mix:', CAST(doc_id AS STRING))), 2, 1)) - 1)"
    )
    docs
      .withColumn("hv", hexVal.cast("long"))
      .join(thresh, Seq("lang"))
      .withColumn("kept", when(col("hv") < col("thresh"), 1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(
        first(col("n_docs")).as("n_docs"),
        first(col("thresh")).as("thresh"),
        sum(col("kept")).as("n_kept")
      )
  }

  // -------------------------------------------------------------------
  // 31. text_langid — stopword-marker language ID. Scores count marker
  // hits per language; the argmax is a fixed-priority CASE so ties are
  // deterministic.
  // -------------------------------------------------------------------
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "is"),
    "es" -> Seq("el", "la", "los", "es"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "les", "des", "et")
  )

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = LangMarkers.foldLeft(docsToks(spark, dir)) { case (df, (lang, markers)) =>
      val arr = array(markers.map(lit): _*)
      df.withColumn(s"s_$lang", size(filter(col("toks"), t => array_contains(arr, t))).cast("long"))
    }
    scored
      .withColumn(
        "pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr")
      )
      .select(col("doc_id"), col("s_en"), col("s_es"), col("s_de"), col("s_fr"), col("pred_lang"))
  }

  // -------------------------------------------------------------------
  // 31b. text_ngram_freq — corpus-level token statistics: global top-k
  // tokens by document frequency and total count. The classic
  // vocabulary-building pass; one explode + one agg, fully
  // partial-aggregable, then a driver-sized top-k.
  // -------------------------------------------------------------------
  def ngramFreq(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    // orderBy+limit plans as TakeOrderedAndProject: each partition
    // keeps k rows, the driver merges — never a global sort of the
    // vocabulary. The rank window then runs over k rows only.
    val top = docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_total"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_total").desc, col("tok").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n_total").desc, col("tok").asc)
    top.withColumn("rnk", row_number().over(w).cast("long"))
  }

  // -------------------------------------------------------------------
  // 31d. text_bigram_pmi — collocation extraction: top-k adjacent
  // token pairs by frequency, each scored with an integer PMI-style
  // lift (n_ab·N·10^6 / (n_a·n_b) — the pointwise-mutual-information
  // ratio without the log, so the score is exact integer math and
  // cross-engine deterministic). One explode per doc for bigrams, one
  // for unigrams; both aggs are fully partial-aggregable; the unigram
  // count table joins in twice (vocabulary-sized, broadcast-friendly).
  // -------------------------------------------------------------------
  def bigramPmi(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val toks = docsToks(spark, dir)
    val bigrams = toks
      .select(
        explode(
          when(
            size(col("toks")) >= 2,
            expr("transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS a, toks[i + 1] AS b))")
          ).otherwise(array())
        ).as("bg")
      )
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
    val uni = toks
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_tok"))
    val total = uni.agg(sum(col("n_tok")).as("n_total"))
    val top = bigrams
      .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
      .limit(k) // TakeOrderedAndProject — never a global sort
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
    top
      .join(broadcast(uni.withColumnRenamed("tok", "a").withColumnRenamed("n_tok", "n_a")), Seq("a"))
      .join(broadcast(uni.withColumnRenamed("tok", "b").withColumnRenamed("n_tok", "n_b")), Seq("b"))
      .crossJoin(broadcast(total))
      // the numerator overflows BIGINT once the corpus passes a few
      // million tokens (n_ab·N·10^6 ~ 10^19); DECIMAL(38,0) keeps the
      // intermediate exact to 10^38 and DIV truncates back to a long —
      // identical floor semantics (operands non-negative) to the
      // oracle's HUGEINT arithmetic
      .withColumn(
        "lift_micro",
        expr(
          "CAST(n_ab AS DECIMAL(19,0)) * CAST(n_total AS DECIMAL(19,0)) * 1000000" +
            " DIV (CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)))"
        )
      )
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"), col("lift_micro"), col("rnk"))
  }

  // -------------------------------------------------------------------
  // 31c. sample_stratified — deterministic stratified sampling, the
  // data-mixing step of a training pipeline: per-language keep rates
  // applied via an md5 hash threshold instead of rand(), so the sample
  // is reproducible run-to-run, engine-portable, and stable under
  // repartitioning. Hex strings compare lexicographically == numerically
  // ('0'-'9' < 'a'-'f' in ASCII), so `substr(md5, 1, 2) < threshold`
  // IS a uniform keep-with-probability test in 1/256 units.
  // -------------------------------------------------------------------
  private val StrataThresholds: Seq[(String, String)] = Seq(
    "en" -> "80", // 128/256 = 50%
    "es" -> "4d", //  77/256 ≈ 30%
    "de" -> "33", //  51/256 ≈ 20%
    "fr" -> "1a"  //  26/256 ≈ 10%
  )

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val threshold = StrataThresholds.foldLeft(lit("00")) { case (acc, (lang, t)) =>
      when(col("pred_lang") === lang, lit(t)).otherwise(acc)
    }
    langId(spark, dir)
      .select(col("doc_id"), col("pred_lang"))
      .withColumn("h2", substring(md5(concat(lit("sample:"), col("doc_id"))), 1, 2))
      .filter(col("h2") < threshold)
      .select(col("doc_id"), col("pred_lang"), col("h2"))
  }

  // -------------------------------------------------------------------
  // 31e. pipeline_keep_set — the training-data pipeline END-TO-END:
  // quality filter → canonical exact-dedup → deterministic stratified
  // sample. Semantically the composition of the three operators users
  // call individually (the md5-threshold sample is per-doc and
  // content-independent, so it commutes with the filters), but planned
  // as ONE corpus scan: every per-doc predicate (quality, language,
  // sample hash) computes in the scan stage, and the only shuffle is
  // the content-hash window that picks canonical representatives. A
  // naive stage-by-stage composition would scan the corpus three
  // times — at 100 TB the scan IS the cost.
  // -------------------------------------------------------------------
  def pipelineKeepSet(spark: SparkSession, dir: String): DataFrame =
    keepFlags(spark, dir)
      .filter(col("is_quality") && col("doc_id") === col("canonical_id") && col("h2") < col("sample_threshold"))
      .select(col("doc_id"), col("pred_lang"))

  /** Per-doc stage flags shared by pipeline_keep_set (which filters to
    * the survivors) and pipeline_funnel (which publishes the
    * per-stage survival books).
    */
  private def keepFlags(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    val base = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"), split(normText(col("text")), " ").as("toks"))
      .withColumn(
        "is_quality",
        length(col("text")) >= 100 &&
          size(filter(col("toks"), t => array_contains(stopArr, t))) * 20 >= size(col("toks"))
      )
      .withColumn("th", md5(normText(col("text"))))
      .withColumn("h2", substring(md5(concat(lit("sample:"), col("doc_id"))), 1, 2))
    val scored = LangMarkers.foldLeft(base) { case (df, (lang, markers)) =>
      val arr = array(markers.map(lit): _*)
      df.withColumn(s"s_$lang", size(filter(col("toks"), t => array_contains(arr, t))).cast("long"))
    }
    val threshold = StrataThresholds.foldLeft(lit("00")) { case (acc, (lang, t)) =>
      when(col("pred_lang") === lang, lit(t)).otherwise(acc)
    }
    scored
      .withColumn(
        "pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr")
      )
      .withColumn("canonical_id", min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy("th")))
      .withColumn("sample_threshold", threshold)
  }

  // -------------------------------------------------------------------
  // pipeline_funnel — the per-SOURCE stage-survival books of the keep
  // pipeline: raw → quality → exact-dedup canonical → sampled, each
  // stage CUMULATIVE (a doc is counted at a stage only if it survived
  // every stage before it — the funnel every training-data pipeline
  // publishes next to its keep set, and the first place a broken
  // filter shows up as a per-source cliff). Same stage flags as
  // pipeline_keep_set (shared code), one conditional-aggregate
  // groupBy per source — partial-aggregable, |sources|-bounded output.
  // -------------------------------------------------------------------
  def pipelineFunnel(spark: SparkSession, dir: String): DataFrame =
    keepFlags(spark, dir)
      .select(
        col("source"),
        col("is_quality"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"),
        (col("h2") < col("sample_threshold")).as("is_sampled")
      )
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("is_quality"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("is_quality") && col("is_canonical"), 1L).otherwise(0L)).as("n_canonical"),
        sum(when(col("is_quality") && col("is_canonical") && col("is_sampled"), 1L).otherwise(0L)).as("n_kept")
      )
      .select(
        col("source"),
        col("n_raw"),
        col("n_quality"),
        col("n_canonical"),
        col("n_kept"),
        expr("n_quality * 10000 DIV greatest(n_raw, 1L)").as("quality_bp"),
        expr("n_canonical * 10000 DIV greatest(n_quality, 1L)").as("dedup_keep_bp"),
        expr("n_kept * 10000 DIV greatest(n_canonical, 1L)").as("sample_keep_bp"),
        expr("n_kept * 10000 DIV greatest(n_raw, 1L)").as("end_to_end_bp")
      )

  // -------------------------------------------------------------------
  // 29c. text_salient — TF-IDF-style salient token per document with a
  // pure-integer score: tf·10^6 / df (document frequency from one
  // corpus-wide agg, broadcast back). Integer scoring keeps the argmax
  // deterministic across engines — float idf logs would not be. Two
  // aggs + one broadcast join; the corpus-side df table is
  // vocabulary-sized, not corpus-sized.
  // -------------------------------------------------------------------
  def salient(spark: SparkSession, dir: String): DataFrame = {
    val toks = docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df_ = toks.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("tok").asc)
    tf.join(broadcast(df_), Seq("tok"))
      .withColumn("score_micro", expr("tf * 1000000 DIV df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("tok").as("salient_tok"), col("tf"), col("df"), col("score_micro"))
  }

  // -------------------------------------------------------------------
  // 32. text_fingerprint — rolling-window fingerprint: md5 over each
  // 4-token window, keep the minimum (winnowing-style stable id that
  // survives small edits elsewhere in the doc).
  // -------------------------------------------------------------------
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docsToks(spark, dir)
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("toks")) >= 4,
            expr(
              "transform(sequence(0, size(toks) - 4), i -> " +
                "md5(concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3])))"
            )
          ).otherwise(array())
        ).as("h")
      )
      .groupBy(col("doc_id"))
      .agg(min(col("h")).as("fingerprint"), count(lit(1)).as("n_windows"))

  /** text_winnowing — WINNOWING fingerprint selection (Schleimer/
    * Wilkerson/Aiken's MOSS scheme): over each doc's 4-gram hash
    * sequence, select every position that is the minimum of at least
    * one length-w=4 window — the selection whose guarantee is that
    * any match of length ≥ w+k−1 tokens shares a selected
    * fingerprint, at ~2/(w+1) the density of keeping every k-gram.
    * This is the storage/recall dial for fingerprint indexes: the
    * report is per doc (k-grams, selected, density bp), the number a
    * fingerprint store is sized by. "Min of some window" is computed
    * as an OR over the w frame-minima [pos−a, pos+w−1−a] — w bounded
    * rolling mins per series, identically replayed by the oracle
    * (hash ties double-select identically in both engines). Scale
    * shape: row-local k-gram hashing, one per-doc ordered window pass
    * (w frames over one ordering), one doc-grain aggregate.
    */
  def winnowing(spark: SparkSession, dir: String, w: Int = 4): DataFrame = {
    val grams = docsToks(spark, dir)
      .select(
        col("doc_id"),
        posexplode(
          when(
            org.apache.spark.sql.functions.size(col("toks")) >= 4,
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
    grams
      .withColumn("selected", when(sel, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kgrams"), sum(col("selected")).as("n_selected"))
      .withColumn("density_bp", expr("n_selected * 10000 DIV n_kgrams"))
  }

  // -------------------------------------------------------------------
  // 34. text_vocab_growth — Heaps-law vocabulary growth per source:
  // after each document (in doc_id order) how many DISTINCT tokens the
  // source has accumulated. The naive shape (per-doc distinct-so-far)
  // is quadratic; the linear plan keys on FIRST OCCURRENCE: a token
  // contributes exactly once, at min(doc_id) per (source, token), so
  // one vocabulary-sized aggregation + a left join back to the doc
  // spine + one running sum per source gives the whole curve. At
  // 100 TB the per-token agg shuffles vocabulary cardinality (not
  // corpus tokens — array_distinct collapses within-doc repeats in
  // the scan stage) and the window runs over doc counts, not tokens.
  // -------------------------------------------------------------------
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = docsSourceToks(spark, dir)
      .select(col("source"), col("doc_id"), explode(array_distinct(col("toks"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok"))
      .agg(min(col("doc_id")).as("doc_id"))
    growthCurve(spark, dir, firstSeen)
  }

  /** The Heaps-curve finisher over a (source, tok, first doc_id)
    * table — shared by the batch vocabGrowth and the streaming twin
    * (whose state IS that table, maintained by a min-merge).
    */
  private[graft] def growthCurve(spark: SparkSession, dir: String, firstSeenToks: DataFrame): DataFrame = {
    val firstSeen = firstSeenToks
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_new_tokens"))
    // TWO-LEVEL running sum over the doc spine: a plain per-source
    // window is skew-bound by the LARGEST source (billions of docs on
    // one reducer at corpus scale). Chunk the spine by doc_id DIV 4096:
    // chunk-level running totals ride a per-source window over the
    // CHUNK AGGREGATE (docs/4096 rows), the within-chunk sum rides a
    // window partitioned by (source, chunk) — bounded at 4096 rows.
    // base_cum + within-chunk cum == the global per-source running sum.
    val unb = org.apache.spark.sql.expressions.Window.unboundedPreceding
    val spine = Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"))
      .join(firstSeen, Seq("source", "doc_id"), "left")
      .withColumn("n_new_tokens", coalesce(col("n_new_tokens"), lit(0L)))
      .withColumn("chunk", expr("doc_id DIV 4096"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("chunk"))
    val chunkBase = spine
      .groupBy(col("source"), col("chunk"))
      .agg(sum(col("n_new_tokens")).as("ctotal"))
      .withColumn("base_cum", coalesce(sum(col("ctotal")).over(wc.rowsBetween(unb, -1)), lit(0L)))
      .select(col("source"), col("chunk"), col("base_cum"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("chunk")).orderBy(col("doc_id"))
    spine
      .join(chunkBase, Seq("source", "chunk"))
      .withColumn("vocab_size", col("base_cum") + sum(col("n_new_tokens")).over(wd.rowsBetween(unb, 0)))
      .select(col("source"), col("doc_id"), col("n_new_tokens"), col("vocab_size"))
  }

  private def docsSourceToks(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"), split(normText(col("text")), " ").as("toks"))

  // -------------------------------------------------------------------
  // 35. text_coverage_topk — tokenizer-budget planning: the smallest
  // top-k vocabulary (by corpus frequency) that covers 50% / 90% /
  // 99% of all token occurrences. One corpus scan collapses to a
  // vocabulary-sized count table; the rank + running sum run as a
  // TWO-LEVEL prefix sum over (count value, token prefix) bands, so
  // even a 10^9-row whitespace vocabulary never sorts on one reducer
  // (see coverageTopk body). Ties break on token text so both
  // engines rank identically; coverage compares cross-multiplied in
  // integers (cum·10⁴ ≥ thr·total), no float shares.
  // -------------------------------------------------------------------
  // -------------------------------------------------------------------
  // 37. text_source_terms — per-source DISTINCTIVE vocabulary: which
  // tokens a feed over-uses relative to the rest of the corpus (the
  // contrastive fingerprint that spots a crawler pulling one template,
  // or a source drifting off-domain). Smoothed rate-ratio lift in
  // micro units: tf_src·rest_total·10⁶ / ((tf_rest+1)·src_total),
  // computed through DECIMAL(38,0) like the PMI lift so the cross
  // products stay exact past BIGINT scale; top-3 per source by
  // (lift, token) — deterministic. The contrast table is
  // vocabulary×sources sized (aggregated domain), never corpus-sized.
  // -------------------------------------------------------------------
  def sourceTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val occ = docsSourceToks(spark, dir)
      .select(col("source"), explode(col("toks")).as("tok"))
      .filter(length(col("tok")) > 0)
    val bySrc = occ.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("tf_src"))
    val byTok = occ.groupBy(col("tok")).agg(count(lit(1)).as("tf_all"))
    val srcTotals = occ.groupBy(col("source")).agg(count(lit(1)).as("src_total"))
    val grand = occ.agg(count(lit(1)).as("all_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("lift_micro").desc, col("tok").asc)
    bySrc
      .join(broadcast(byTok), Seq("tok"))
      .join(broadcast(srcTotals), Seq("source"))
      .crossJoin(broadcast(grand))
      .withColumn(
        "lift_micro",
        expr(
          "CAST(tf_src AS DECIMAL(19,0)) * CAST(all_total - src_total AS DECIMAL(19,0)) * 1000000" +
            " DIV (CAST(tf_all - tf_src + 1 AS DECIMAL(19,0)) * CAST(src_total AS DECIMAL(19,0)))"
        ).cast("long")
      )
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("source"), col("rnk"), col("tok"), col("tf_src"), col("lift_micro"))
  }

  // -------------------------------------------------------------------
  // 36. text_oov_rate — per-document OUT-OF-VOCABULARY rate against
  // the corpus top-K vocabulary: the per-doc face of the coverage
  // question (a doc full of tokens the tokenizer budget excludes is
  // exactly the doc that fragments into byte-level pieces). The
  // vocabulary is one aggregated rank (tokens, not occurrences) that
  // BROADCASTS; each doc then scores in the scan stage via the left
  // join's null pattern — one corpus scan, one vocabulary-sized
  // shuffle, rates in integer basis points.
  // -------------------------------------------------------------------
  def oovRate(spark: SparkSession, dir: String, topK: Int = 32): DataFrame = {
    val occurrences = docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(length(col("tok")) > 0)
    // top-K membership via orderBy+limit = TakeOrdered (per-partition
    // top-K then a K-row merge) — an unpartitioned Window here would
    // rank EVERY distinct token on one reducer (10^8-10^9 rows at
    // corpus scale)
    val vocab = occurrences
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(topK)
      .select(col("tok"), lit(1L).as("in_vocab"))
    occurrences
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov")
      )
      .withColumn("oov_bp", expr("n_oov * 10000 DIV n_tokens"))
  }

  def coverageTopk(spark: SparkSession, dir: String): DataFrame = {
    val counts = docsToks(spark, dir)
      .select(explode(col("toks")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
    // TWO-LEVEL prefix sum — a single global window ordered by
    // (n desc, tok asc) would sort the whole VOCABULARY on one
    // partition (at 100 TB a whitespace vocabulary is 10^8..10^9 rows:
    // urls, typos, hashes — a single-reducer sort). Instead:
    //   1. band the vocab by (count value, 2-char token prefix) —
    //      band order (n desc, pfx asc) IS the global token order,
    //      because all of one band's tokens are contiguous under it;
    //   2. band-level running totals ride an unpartitioned window over
    //      the BAND AGGREGATE (|distinct counts| x |prefixes| rows —
    //      aggregate-scale, never vocab-scale);
    //   3. within-band rank/cum ride a window PARTITIONED by the band
    //      key, so the heavy hapax band (n=1 holds ~half a Zipfian
    //      vocab) splits across its ~1.6k prefixes instead of landing
    //      on one reducer.
    // base_rnk + row_number / base_cum + running sum reproduce the
    // global window EXACTLY — same oracle.
    val unb = org.apache.spark.sql.expressions.Window.unboundedPreceding
    val banded = counts.withColumn("pfx", substring(col("tok"), 1, 2))
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("pfx").asc)
    val bands = banded
      .groupBy(col("n"), col("pfx"))
      .agg(count(lit(1)).as("bsize"), sum(col("n")).as("btotal"))
      .withColumn("base_rnk", coalesce(sum(col("bsize")).over(wb.rowsBetween(unb, -1)), lit(0L)))
      .withColumn("base_cum", coalesce(sum(col("btotal")).over(wb.rowsBetween(unb, -1)), lit(0L)))
      .select(col("n"), col("pfx"), col("base_rnk"), col("base_cum"))
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n"), col("pfx")).orderBy(col("tok").asc)
    val ranked = banded
      .join(bands, Seq("n", "pfx"))
      .withColumn("rnk", col("base_rnk") + row_number().over(wt).cast("long"))
      .withColumn("cum_n", col("base_cum") + sum(col("n")).over(wt.rowsBetween(unb, 0)))
    val total = counts.agg(sum(col("n")).as("total_n"))
    val thresholds = spark
      .range(1)
      .select(explode(array(lit(5000L), lit(9000L), lit(9900L))).as("threshold_bp"))
    ranked
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(thresholds))
      .filter(col("cum_n") * 10000 >= col("threshold_bp") * col("total_n"))
      .groupBy(col("threshold_bp"))
      .agg(min(col("rnk")).as("k_tokens"), max(col("total_n")).as("total_n"))
  }

  // -------------------------------------------------------------------
  // 31i. text_domain_mix — the data-mixture table a training run is
  // configured from: per source, document and token counts, the
  // source's share of the corpus (basis points), and the REWEIGHT
  // factor that would equalize the mix to a uniform target (micro
  // units) — the static form of domain-mixture balancing (DoReMi-style
  // weights plug into the same column). One corpus scan into a
  // partial-aggregable groupBy on the (bounded, ~dozens) source key;
  // the global total rides a window over the per-source AGGREGATE, so
  // the single-partition exchange touches |sources| rows, never the
  // corpus. Reweight arithmetic goes through DECIMAL(38,0): at 10^14
  // corpus tokens total·10^6 overflows BIGINT, the DECIMAL DIV
  // truncates back to a long with oracle-identical floor semantics.
  // -------------------------------------------------------------------
  // -------------------------------------------------------------------
  // 31j. sample_quality_weighted — importance sampling by DOCUMENT
  // quality: each doc's keep probability scales with its own signals
  // (token count ramp, halved when stopword-poor), decided by a
  // content-independent 16-bit hash threshold — deterministic, so
  // re-runs and backfills agree with no coordination, and the kept
  // set is reproducible from doc_id alone (the property rand() can't
  // give). Pure row-local map over one corpus scan, zero shuffles;
  // keep iff hash16·10⁴ < quality_bp·2¹⁶, all integer.
  // -------------------------------------------------------------------
  def qualityWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(Stopwords.map(lit): _*)
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), split(normText(col("text")), " ").as("toks"))
      .select(
        col("doc_id"),
        col("source"),
        size(col("toks")).cast("long").as("n_toks"),
        size(filter(col("toks"), t => array_contains(stopArr, t))).cast("long").as("n_stop"),
        expr("CAST(conv(substring(md5(concat('qw:', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT)")
          .as("hash16")
      )
      .withColumn("base_bp", least(lit(10000L), col("n_toks") * 250L))
      .withColumn(
        "quality_bp",
        when(col("n_stop") * 40 < col("n_toks"), expr("base_bp DIV 2")).otherwise(col("base_bp"))
      )
      .withColumn("kept", when(col("hash16") * 10000L < col("quality_bp") * 65536L, 1L).otherwise(0L))
      .select(col("doc_id"), col("source"), col("n_toks"), col("quality_bp"), col("hash16"), col("kept"))
  }

  // -------------------------------------------------------------------
  // 31k. text_length_histogram — corpus length distribution per
  // source in LOG2 buckets (every corpus health report's first chart;
  // linear buckets are useless across the 10..10⁶-char span real
  // corpora cover). Bucket = length(bin(n_chars)) = floor(log2)+1 —
  // pure integer, no float log. One scan, one partial-aggregable
  // groupBy on a (sources × ~20 buckets) key space.
  // -------------------------------------------------------------------
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("source"), length(col("text")).cast("long").as("n_chars"))
      .withColumn("bucket", length(bin(col("n_chars"))).cast("long"))
      .groupBy(col("source"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars")
      )

  // -------------------------------------------------------------------
  // 31l. text_bpe_train — TOKENIZER TRAINING: the first rounds of
  // byte-pair encoding learned distributedly. The iterative part runs
  // on the DISTINCT-WORD frequency table (Heaps-bounded — millions of
  // rows at 100 TB corpus scale, not trillions; the corpus itself is
  // scanned exactly once to build it). Each round: adjacent-symbol
  // pairs weighted by word frequency → one partial-aggregable count →
  // the argmax pair (deterministic count/lex tiebreak, a 1-row
  // broadcast — never a driver collect) → merge applied to every word
  // via plain string replace over '<'-delimited symbol strings (the
  // delimiter makes a pair match ONLY at symbol starts, and replace's
  // left-to-right non-overlap IS BPE's merge order — identical in
  // both engines). Per-round localCheckpoint cuts the lineage the
  // same way the CC loop does. Output: the learned merge table.
  // -------------------------------------------------------------------
  def bpeTrain(spark: SparkSession, dir: String, rounds: Int = 5): DataFrame =
    bpeLoop(spark, dir, rounds)._1.reduce(_ unionByName _)

  // -------------------------------------------------------------------
  // 31q. text_bpe_batch — BPE at PRODUCTION merge counts: the
  // sequential trainer's one-merge-per-round driver loop cannot reach
  // a 30k-merge tokenizer (30k driver rounds). The batched variant
  // learns up to M DISJOINT pairs per round: rank the top-C candidate
  // pairs by (weight, lhs, rhs), keep a pair iff NO higher-ranked
  // candidate shares a symbol with it (an order-free rule both engines
  // compute identically — kept pairs are pairwise disjoint because
  // each kept pair is disjoint from EVERY higher-ranked one), and
  // apply all kept merges in ONE pass over the word table (disjoint
  // symbols ⇒ the replaces commute, so a single fold is exact). With
  // M=1 the rule degenerates to the argmax — batch ≡ sequential BPE,
  // TextSpec pins it. 64+ merges land in 8 driver rounds instead of
  // 64; a 30k-merge production run is ~2.5k rounds of the same shape.
  // -------------------------------------------------------------------
  def bpeBatchTrain(
      spark: SparkSession,
      dir: String,
      rounds: Int = 8,
      m: Int = 12,
      cand: Int = 40
  ): DataFrame =
    bpeBatchLoop(spark, dir, rounds, m, cand)._1.reduce(_ unionByName _)

  private[graft] def bpeBatchLoop(
      spark: SparkSession,
      dir: String,
      rounds: Int,
      m: Int,
      cand: Int,
      // production-run instrumentation (tools/BpeBench): called with
      // (round, seconds) after each round's checkpoint lands; no-op in
      // query paths
      roundHook: (Int, Double) => Unit = (_, _) => ()
  ): (Vector[DataFrame], DataFrame) = {
    val ord = Seq(col("pair_weight").desc, col("lhs").asc, col("rhs").asc)
    val wRank = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    var words = docsToks(spark, dir)
      .select(explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("f"))
      .select(col("w"), col("f"), regexp_replace(col("w"), "(.)", "<$1").as("s"))
      .localCheckpoint()
    var merges = Vector.empty[DataFrame]
    for (r <- 1 to rounds) {
      val tRound = System.nanoTime()
      val pairs = words
        .select(col("f"), expr("filter(split(s, '<'), x -> x != '')").as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(
          col("f"),
          explode(expr("transform(sequence(0, size(sy)-2), i -> struct(sy[i] AS lhs, sy[i+1] AS rhs))")).as("p")
        )
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("f")).as("pair_weight"))
      // top-C candidates land as TakeOrdered (never a global sort);
      // the rank window then runs over C rows only
      val ranked = pairs
        .orderBy(ord: _*)
        .limit(cand)
        .withColumn("rn", row_number().over(wRank))
      val keptW = org.apache.spark.sql.expressions.Window.orderBy(col("rn").asc)
      val kept = ranked
        .as("a")
        .join(
          ranked.select(col("rn").as("b_rn"), col("lhs").as("b_lhs"), col("rhs").as("b_rhs")),
          col("b_rn") < col("rn") &&
            (col("b_lhs") === col("lhs") || col("b_lhs") === col("rhs") ||
              col("b_rhs") === col("lhs") || col("b_rhs") === col("rhs")),
          "left_anti"
        )
        .orderBy(col("rn").asc)
        .limit(m)
        .withColumn("k", row_number().over(keptW).cast("long"))
        .select(col("k"), col("lhs"), col("rhs"), col("pair_weight"))
        .localCheckpoint()
      merges = merges :+ kept.select(
        lit(r.toLong).as("merge_round"),
        col("k"),
        col("lhs"),
        col("rhs"),
        col("pair_weight")
      )
      // ONE pass applies the whole round: fold the (tiny, broadcast)
      // merge list over each word's symbol string. An empty round
      // folds the identity — the word table is never wiped.
      val selArr = kept.agg(
        sort_array(collect_list(struct(col("k"), col("lhs"), col("rhs")))).as("ms")
      )
      words = words
        .crossJoin(broadcast(selArr))
        .select(
          col("w"),
          col("f"),
          expr(
            "aggregate(ms, s, (acc, mg) -> replace(acc, concat('<', mg.lhs, '<', mg.rhs), concat('<', mg.lhs, mg.rhs)))"
          ).as("s")
        )
        .localCheckpoint()
      roundHook(r, (System.nanoTime() - tRound) / 1e9)
    }
    (merges, words)
  }

  private def bpeLoop(spark: SparkSession, dir: String, rounds: Int): (Vector[DataFrame], DataFrame) = {
    var words = docsToks(spark, dir)
      .select(explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("f"))
      .select(col("w"), col("f"), regexp_replace(col("w"), "(.)", "<$1").as("s"))
      .localCheckpoint()
    var merges = Vector.empty[DataFrame]
    for (r <- 1 to rounds) {
      val pairs = words
        .select(col("f"), expr("filter(split(s, '<'), x -> x != '')").as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(
          col("f"),
          explode(expr("transform(sequence(0, size(sy)-2), i -> struct(sy[i] AS lhs, sy[i+1] AS rhs))")).as("p")
        )
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("f")).as("pair_weight"))
      val best = pairs.orderBy(col("pair_weight").desc, col("lhs").asc, col("rhs").asc).limit(1)
      merges = merges :+ best.select(lit(r.toLong).as("merge_round"), col("lhs"), col("rhs"), col("pair_weight"))
      // left join on TRUE (not crossJoin): when a round finds no
      // adjacent pair (tiny corpus / rounds > learnable merges), best
      // is EMPTY and a crossJoin would silently wipe the word table —
      // the pass-through coalesce keeps every word at its last state,
      // so training stops at the final learnable merge instead.
      words = words
        .join(broadcast(best), lit(true), "left")
        .select(
          col("w"),
          col("f"),
          coalesce(
            expr("replace(s, concat('<', lhs, '<', rhs), concat('<', lhs, rhs))"),
            col("s")
          ).as("s")
        )
        .localCheckpoint()
    }
    (merges, words)
  }

  // -------------------------------------------------------------------
  // 31m. text_bpe_apply — TOKENIZE with the trained merges: every doc
  // segmented by the learned BPE table, reported as per-doc whitespace
  // vs BPE token counts and the chars→tokens compression (bp). The
  // segmentation rides the SAME distinct-word table the trainer built
  // (each word segments once, docs join the result by word — at
  // 100 TB the join is corpus×vocab on the word key, the classic
  // apply shape), so no document is ever re-segmented.
  // -------------------------------------------------------------------
  def bpeApply(spark: SparkSession, dir: String, rounds: Int = 5): DataFrame = {
    val (_, words) = bpeLoop(spark, dir, rounds)
    val wordSyms = words.select(
      col("w"),
      length(col("w")).cast("long").as("w_chars"),
      size(expr("filter(split(s, '<'), x -> x != '')")).cast("long").as("n_syms")
    )
    docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
      .join(wordSyms, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_ws_tokens"),
        sum(col("n_syms")).as("n_bpe_tokens"),
        sum(col("w_chars")).as("n_chars")
      )
      .withColumn("compress_bp", expr("n_bpe_tokens * 10000 DIV n_chars"))
  }

  /** text_chunk_for_rag — RETRIEVAL CHUNKING: split each doc into
    * overlapping token windows (size 64, stride 48 — the classic RAG
    * prep before embedding), emitting the chunk table a vector index
    * is built FROM: (doc, chunk_id, start, len, chunk md5). Tail
    * chunks shorter than minLen are dropped unless they are the doc's
    * only chunk (a short doc still yields one chunk). Everything is
    * ROW-LOCAL (sequence + slice + hash inside the row — no shuffle at
    * all until a downstream consumer groups), so the pass is pure
    * map-side at any corpus size.
    */
  def chunkForRag(
      spark: SparkSession,
      dir: String,
      size: Int = 64,
      stride: Int = 48,
      minLen: Int = 16
  ): DataFrame =
    docsToks(spark, dir)
      .select(col("doc_id"), col("toks"), org.apache.spark.sql.functions.size(col("toks")).cast("long").as("n_toks"))
      .select(
        col("doc_id"),
        col("toks"),
        col("n_toks"),
        explode(expr(s"sequence(0L, greatest(n_toks - 1, 0L), ${stride}L)")).as("start")
      )
      .withColumn("len", least(lit(size.toLong), col("n_toks") - col("start")))
      .filter(col("len") >= minLen || col("start") === 0L)
      .filter(col("len") > 0L)
      .withColumn("chunk_id", expr(s"start DIV ${stride}L"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        col("start"),
        col("len"),
        md5(expr("concat_ws(' ', slice(toks, CAST(start + 1 AS INT), CAST(len AS INT)))")).as("chunk_md5")
      )

  /** text_fertility_by_lang — TOKENIZER FERTILITY panel: per language,
    * BPE tokens per whitespace word (fertility) and characters per BPE
    * token, under the same trained merge chain as text_bpe_apply. This
    * is THE number multilingual token budgets are priced with — a
    * language at 2× fertility pays 2× the sequence length for the same
    * text, which moves sampling weights, context budgets, and cost
    * models. Scale shape: the merge chain trains once (the bpe_train
    * tier), the corpus pass is one explode + one vocabulary-keyed join
    * + ONE partial-aggregable groupBy onto the language enum.
    */
  def fertilityByLang(spark: SparkSession, dir: String, rounds: Int = 5): DataFrame = {
    val (_, words) = bpeLoop(spark, dir, rounds)
    val wordSyms = words.select(
      col("w"),
      length(col("w")).cast("long").as("w_chars"),
      size(expr("filter(split(s, '<'), x -> x != '')")).cast("long").as("n_syms")
    )
    Tables
      .documents(spark, dir)
      .select(col("lang"), explode(split(normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(wordSyms, Seq("w"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_ws_tokens"),
        sum(col("n_syms")).as("n_bpe_tokens"),
        sum(col("w_chars")).as("n_chars")
      )
      .withColumn("fertility_x10k", expr("n_bpe_tokens * 10000 DIV n_ws_tokens"))
      .withColumn("chars_per_tok_x10k", expr("n_chars * 10000 DIV n_bpe_tokens"))
  }

  // -------------------------------------------------------------------
  // 31p. text_search_topk — LEXICAL RETRIEVAL: rank documents against
  // a keyword query by integer-exact TF-IDF (idf as the monotone
  // rational N·10⁶ DIV df — no float log, so scores are bit-identical
  // across engines; products ride DECIMAL(38,0) against warehouse-
  // scale overflow). The inverted shape is the plan: the corpus
  // explode filters to QUERY TERMS in the scan stage (everything else
  // never leaves the scan), tf/df are partial-aggregable counts, the
  // corpus size is a 1-row broadcast, and the top-10 is TakeOrdered.
  // At 100 TB the same query runs against a pre-materialized postings
  // table; this operator is the build + query composed.
  // -------------------------------------------------------------------
  def searchTopk(
      spark: SparkSession,
      dir: String,
      query: Seq[String] = Seq("fast", "key", "sort"),
      k: Int = 10
  ): DataFrame = {
    val t = docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(query: _*))
    val tf = t.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = t.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    val nd = Tables.documents(spark, dir).agg(count(lit(1)).as("nd"))
    val w  = org.apache.spark.sql.expressions.Window.orderBy(col("score").desc, col("doc_id").asc)
    tf.join(df, Seq("tok"))
      .crossJoin(broadcast(nd))
      .withColumn("idf_micro", expr("nd * 1000000 DIV df"))
      .groupBy(col("doc_id"))
      .agg(
        expr("CAST(SUM(CAST(tf AS DECIMAL(19,0)) * CAST(idf_micro AS DECIMAL(19,0))) AS BIGINT)")
          .as("score")
      )
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("score"))
  }

  // -------------------------------------------------------------------
  // 31y. text_rank_fusion — RECIPROCAL RANK FUSION of two retrieval
  // legs, the standard hybrid-search combiner (RRF: score = Σ 1/(k+r)
  // — rank-only, so incomparable score scales fuse without
  // calibration; here in exact micro units, 1000000 DIV (60+r)).
  // Leg 1 = the TF-IDF relevance ranking (text_search_topk's exact
  // integer scoring); leg 2 = a deterministic document-length prior
  // (longest docs first — standing in for any second scorer: BM25,
  // embeddings, recency). A doc missing from a leg contributes 0 from
  // it (the RRF convention). Plan: each leg is its own bounded top-N
  // (the candidate budget), the fusion is an outer join of two ≤N-row
  // frames + one ordered limit — at 100 TB the legs do the retrieval
  // work and fusion stays driver-trivial.
  // -------------------------------------------------------------------
  def rankFusion(
      spark: SparkSession,
      dir: String,
      query: Seq[String] = Seq("fast", "key", "sort"),
      k: Int = 10,
      kRrf: Int = 60,
      cand: Int = 20
  ): DataFrame = {
    // leg 1: TF-IDF top-`cand` (searchTopk's construction, deeper list)
    val t = docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(query: _*))
    val tf = t.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = t.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    val nd = Tables.documents(spark, dir).agg(count(lit(1)).as("nd"))
    val wRel = org.apache.spark.sql.expressions.Window.orderBy(col("score").desc, col("doc_id").asc)
    val rel = tf
      .join(df, Seq("tok"))
      .crossJoin(broadcast(nd))
      .withColumn("idf_micro", expr("nd * 1000000 DIV df"))
      .groupBy(col("doc_id"))
      .agg(
        expr("CAST(SUM(CAST(tf AS DECIMAL(19,0)) * CAST(idf_micro AS DECIMAL(19,0))) AS BIGINT)").as("score")
      )
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(cand)
      .withColumn("rel_rank", row_number().over(wRel).cast("long"))
      .select(col("doc_id"), col("rel_rank"))
    // leg 2: document-length prior, top-`cand` by token count
    val wLen = org.apache.spark.sql.expressions.Window.orderBy(col("n_toks").desc, col("doc_id").asc)
    val len = docsToks(spark, dir)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
      .orderBy(col("n_toks").desc, col("doc_id").asc)
      .limit(cand)
      .withColumn("len_rank", row_number().over(wLen).cast("long"))
      .select(col("doc_id"), col("len_rank"))
    val wOut = org.apache.spark.sql.expressions.Window.orderBy(col("rrf_micro").desc, col("doc_id").asc)
    rel
      .join(len, Seq("doc_id"), "full_outer")
      .withColumn(
        "rrf_micro",
        coalesce(expr(s"1000000 DIV ($kRrf + rel_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($kRrf + len_rank)"), lit(0L))
      )
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(wOut).cast("long"))
      .select(col("rnk"), col("doc_id"), col("rel_rank"), col("len_rank"), col("rrf_micro"))
  }

  // -------------------------------------------------------------------
  // 31u. text_surprisal — integer UNIGRAM SURPRISAL scoring, the
  // perplexity-shaped quality signal without a float log: each
  // token's surprisal proxy is the BIT LENGTH of N/freq (length(bin(·))
  // ≈ ⌊log2⌋+1 — exact integers, engine-portable), summed per doc.
  // Rare-token-heavy docs (gibberish, code dumps, other-language
  // leakage) score high; boilerplate scores low — the cheap corpus-
  // level filter a pipeline runs before anything model-based. Plan:
  // one vocabulary aggregation, a token-keyed shuffle join back to
  // the corpus (the corpus×vocab apply shape — the full vocabulary
  // never broadcasts), one per-doc aggregate, N a 1-row broadcast.
  // -------------------------------------------------------------------
  def surprisal(spark: SparkSession, dir: String): DataFrame = {
    val toks = docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val n = toks.agg(count(lit(1)).as("nt"))
    toks
      .join(freq, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("sbits", expr("CAST(length(bin(nt DIV f)) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_toks"),
        sum(col("sbits")).as("sum_bits"),
        max(col("sbits")).as("max_bits")
      )
      .withColumn("mean_bits_micro", expr("sum_bits * 1000000 DIV n_toks"))
  }

  // -------------------------------------------------------------------
  // 31t. text_cdc_chunks — CONTENT-DEFINED CHUNKING, the storage-dedup
  // primitive fixed-size chunking (mm_chunk_*) cannot replace: chunk
  // boundaries are decided by the CONTENT (a 16-char polynomial
  // rolling hash hitting a modulus), so an insertion near a doc's head
  // shifts only the chunk it lands in — every later chunk re-aligns
  // and keeps deduplicating, where fixed-size offsets would all move
  // (the rsync/LBFS/backup-store trick). Hash arithmetic is exact
  // integer (codes · B^k mod 1000003, boundary when ≡ 0 mod 61 →
  // ~61-char expected chunks), entirely row-local HOFs over the char
  // array — zero shuffle until the final chunk-hash groupBy. Output =
  // the chunk-group table (occurrence counts, distinct-doc counts,
  // canonical holder) the dedup store would persist.
  // -------------------------------------------------------------------
  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunkTable(
      Tables
        .documents(spark, dir)
        .select(col("doc_id"), normText(col("text")).as("s"))
    )
      .groupBy(col("chunk_md5"))
      .agg(
        min(col("chunk_len")).as("chunk_len"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canonical_doc")
      )

  /** Per-chunk rows (doc_id, chunk_md5, chunk_len) for an arbitrary
    * (doc_id, s) frame — the reusable CDC core; TextSpec drives the
    * re-alignment property through it directly.
    */
  private[graft] def cdcChunkTable(normed: DataFrame): DataFrame = {
    val pw = "array(513573L, 286364L, 727379L, 211660L, 55051L, 259963L, 108855L, 176404L, 718906L, 982590L, 373914L, 499039L, 248085L, 17161L, 131L, 1L)"
    normed
      .filter(length(col("s")) >= 1)
      .withColumn("cs", expr("filter(split(s, ''), c -> c <> '')"))
      .withColumn("n", size(col("cs")))
      .withColumn("codes", expr("transform(cs, c -> CAST(ascii(c) AS BIGINT))"))
      .withColumn(
        "bnds",
        when(
          col("n") >= 16,
          expr(
            s"filter(sequence(1, n - 15), i -> " +
              s"aggregate(sequence(0, 15), 0L, (acc, j) -> acc + element_at(codes, i + j) * element_at($pw, j + 1)) % 1000003 % 61 = 0)"
          )
        ).otherwise(expr("array()").cast("array<int>"))
      )
      .withColumn("ebs", expr("transform(bnds, i -> i + 15)"))
      .withColumn(
        "ends",
        expr("concat(ebs, IF(size(ebs) > 0 AND element_at(ebs, size(ebs)) = n, array(), array(n)))")
      )
      .withColumn(
        "c",
        explode(
          expr(
            "transform(sequence(1, size(ends)), k -> named_struct(" +
              "'st', IF(k = 1, 1, element_at(ends, k - 1) + 1), 'en', element_at(ends, k)))"
          )
        )
      )
      .select(
        col("doc_id"),
        md5(expr("substring(s, c.st, c.en - c.st + 1)")).as("chunk_md5"),
        (col("c.en") - col("c.st") + 1).cast("long").as("chunk_len")
      )
  }

  // -------------------------------------------------------------------
  // 31s. text_search_index — lexical retrieval BUILD/QUERY split: the
  // inverted index text_search_topk computes inline, persisted the way
  // a production search tier lays it out. The postings (tok, doc_id,
  // tf) and term dictionary (tok, df) land as parquet HIVE-PARTITIONED
  // BY A TERM-HASH BUCKET (first md5 nibble, 16 shards) — a k-term
  // query prunes the read to ≤k bucket directories by partition
  // filter before any row is touched (spec-asserted), the file-level
  // twin of the IVF index's probed-cell pruning. The corpus size is a
  // 1-row stats file. Scoring is the same integer-exact TF-IDF, so
  // the roundtrip is byte-identical to the inline search (shared
  // oracle) — the index provably loses nothing.
  // -------------------------------------------------------------------
  private def termBucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    expr(s"instr('0123456789abcdef', substring(md5(${c.toString}), 1, 1)) - 1")

  /** driver-side twin of [[termBucket]] for pruning literals */
  private def termBucketOf(tok: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
    "0123456789abcdef".indexOf(f"${d(0) & 0xff}%02x".charAt(0)).toLong
  }

  def searchIndexTopk(
      spark: SparkSession,
      dir: String,
      query: Seq[String] = Seq("fast", "key", "sort"),
      k: Int = 10
  ): DataFrame = {
    val out = graft.sources.TimeboxStore.scratchPath("graft_text_search_index", dir)
    // BUILD: postings + term dictionary, sharded by term-hash bucket
    val toks = docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
    toks
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket", termBucket(col("tok")))
      .write
      .mode("overwrite")
      .partitionBy("term_bucket")
      .parquet(s"$out/postings")
    toks
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .withColumn("term_bucket", termBucket(col("tok")))
      .write
      .mode("overwrite")
      .partitionBy("term_bucket")
      .parquet(s"$out/terms")
    Tables
      .documents(spark, dir)
      .agg(count(lit(1)).as("nd"))
      .write
      .mode("overwrite")
      .parquet(s"$out/stats")
    // QUERY: reads ONLY the query terms' bucket directories. The IN
    // literals are Ints matching the inferred partition-column type —
    // a Long literal would wrap the column in a cast and the predicate
    // would no longer be extractable as a partition filter.
    val buckets = query.map(t => termBucketOf(t).toInt).distinct
    val tf = spark.read
      .parquet(s"$out/postings")
      .filter(col("term_bucket").isin(buckets: _*) && col("tok").isin(query: _*))
    val df = spark.read
      .parquet(s"$out/terms")
      .filter(col("term_bucket").isin(buckets: _*) && col("tok").isin(query: _*))
      .select(col("tok"), col("df"))
    val nd = spark.read.parquet(s"$out/stats")
    val w  = org.apache.spark.sql.expressions.Window.orderBy(col("score").desc, col("doc_id").asc)
    tf.join(df, Seq("tok"))
      .crossJoin(broadcast(nd))
      .withColumn("idf_micro", expr("nd * 1000000 DIV df"))
      .groupBy(col("doc_id"))
      .agg(
        expr("CAST(SUM(CAST(tf AS DECIMAL(19,0)) * CAST(idf_micro AS DECIMAL(19,0))) AS BIGINT)")
          .as("score")
      )
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("score"))
  }

  // -------------------------------------------------------------------
  // 31o. text_bpe_index — the tokenizer BUILD/APPLY split (the same
  // split the ANN index got): training writes the merge table AND the
  // per-word segmentation (vocab) table as parquet; tokenization then
  // joins the corpus against ONLY the persisted vocab — no training
  // lineage, no re-segmentation, the shape a production pipeline runs
  // daily against a tokenizer trained once. Output is byte-identical
  // to the in-memory text_bpe_apply (same oracle), so the index
  // roundtrip provably loses nothing; PlanSpec pins that the apply
  // side reads the vocab parquet rather than re-deriving it.
  // -------------------------------------------------------------------
  def bpeIndexApply(spark: SparkSession, dir: String, rounds: Int = 5): DataFrame = {
    val out = graft.sources.TimeboxStore.scratchPath("graft_bpe", dir)
    val (merges, words) = bpeLoop(spark, dir, rounds)
    merges.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$out/merges")
    words
      .select(
        col("w"),
        length(col("w")).cast("long").as("w_chars"),
        size(expr("filter(split(s, '<'), x -> x != '')")).cast("long").as("n_syms")
      )
      .write.mode("overwrite").parquet(s"$out/vocab")
    applyFromVocab(spark, dir, s"$out/vocab")
  }

  /** The pure apply phase: corpus tokens joined against a persisted
    * vocab segmentation — callable on its own against any stored
    * tokenizer.
    */
  def applyFromVocab(spark: SparkSession, dir: String, vocabPath: String): DataFrame =
    docsToks(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
      .join(spark.read.parquet(vocabPath), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_ws_tokens"),
        sum(col("n_syms")).as("n_bpe_tokens"),
        sum(col("w_chars")).as("n_chars")
      )
      .withColumn("compress_bp", expr("n_bpe_tokens * 10000 DIV n_chars"))

  // -------------------------------------------------------------------
  // 31n. text_heavy_hitters — EXACT top-k over an unbounded key stream
  // in BOUNDED memory: per-partition Misra-Gries summaries (cap
  // counters, decrement-all on overflow — the classic frequent-items
  // sketch) nominate a candidate set that PROVABLY contains every key
  // with frequency > n/cap; a second pass exact-counts ONLY the
  // broadcast candidates. The full key space is never shuffled — at
  // 100 TB with billions of distinct keys the plain groupBy-then-sort
  // top-k shuffles them all, this plan shuffles ≤ cap·partitions
  // summary rows + the candidate recount. Exactness of the top-k is
  // guaranteed (and spec-asserted) whenever the k-th count exceeds
  // n/cap. The corpus' 31-word vocabulary is near-uniform, so the
  // drill amplifies a deterministic boilerplate tail (every 4th doc
  // contributes 120 copies of a synthetic header token — the
  // dedup_skewed_corpus pattern) to make real heavy hitters AND force
  // summary eviction (cap 16 < the ~31 live keys per base partition,
  // spec-observed via per-partition summary sizes). mapPartitions is the
  // deliberate ladder choice here: a decrement-all counter sketch is
  // genuine per-partition imperative state, not expressible as a
  // Catalyst aggregate without losing the bounded-memory property.
  // -------------------------------------------------------------------
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 5, cap: Int = 16): DataFrame = {
    val toks = heavyStream(spark, dir)
    val cands = mgSummaries(spark, toks, cap).select(col("w")).distinct()
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("w").asc)
    toks
      .join(broadcast(cands), Seq("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("w"), col("n"))
  }

  /** The drill's token stream: corpus tokens + the deterministic
    * amplified boilerplate tail.
    */
  private[graft] def heavyStream(spark: SparkSession, dir: String): DataFrame = {
    val base = docsToks(spark, dir)
      .select(explode(col("toks")).as("w"))
      .filter(length(col("w")) > 0)
    val heavy = Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .filter(col("doc_id") % 4 === 0)
      .select(explode(expr("transform(sequence(1, 120), i -> concat('hh_', CAST(doc_id % 5 AS STRING)))")).as("w"))
    base.unionByName(heavy)
  }

  /** Per-partition Misra-Gries summaries: (partition, key, lower-bound
    * count) rows, ≤ cap per partition. Decrement-all is O(1) amortized
    * via a global delta with lazy eviction; the partition id is
    * emitted so the bounded-memory property is observable in specs.
    */
  private[graft] def mgSummaries(spark: SparkSession, toks: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val tupEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING, Encoders.scalaLong)
    toks
      .select(col("w"))
      .as(Encoders.STRING)
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        var delta = 0L
        it.foreach { w =>
          m.get(w) match {
            case Some(c) => m.update(w, c + 1)
            case None =>
              if (m.size < cap) m.update(w, delta + 1)
              else {
                // decrement-all: raise the floor, lazily evict sunk keys
                delta += 1
                m.filterInPlace((_, c) => c > delta)
                if (m.size < cap) m.update(w, delta + 1)
              }
          }
        }
        m.iterator.map { case (w, c) => (pid, w, c - delta) }
      }(tupEnc)
      .toDF("pid", "w", "c_lb")
  }

  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    Tables
      .documents(spark, dir)
      .select(col("source"), size(split(normText(col("text")), " ")).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("total_tokens", sum(col("n_tokens")).over(w))
      .withColumn("n_sources", count(lit(1)).over(w))
      .select(
        col("source"),
        col("n_docs"),
        col("n_tokens"),
        expr("n_tokens * 10000 DIV total_tokens").as("share_bp"),
        expr(
          "CAST(total_tokens AS DECIMAL(19,0)) * 1000000" +
            " DIV (CAST(n_sources AS DECIMAL(19,0)) * CAST(n_tokens AS DECIMAL(19,0)))"
        ).as("weight_micro")
      )
  }

  // -------------------------------------------------------------------
  // 31r. text_pii_scrub — PII detection + redaction, the compliance
  // pass every training pipeline runs before anything trains: count
  // emails / IPv4 literals / phone numbers per doc and emit the
  // scrubbed text's length + md5 (the redaction receipt). Entirely
  // row-local regexp work (codegen'd, zero shuffle); the patterns are
  // the ASCII-safe common subset of Java regex and RE2 so the DuckDB
  // oracle matches byte-for-byte.
  //
  // The synthetic corpus carries no PII, so the drill SPLICES
  // deterministic residue derived from doc_id (an email every 5th doc,
  // an IPv4 every 7th, a phone every 11th — both engines construct the
  // identical augmented text), making the detection provably
  // non-vacuous: the specs pin that every spliced token is found and
  // that the scrubbed text contains none.
  // -------------------------------------------------------------------
  private[graft] val PiiEmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val PiiIpv4Pat  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val PiiPhonePat = "\\b555-\\d{3}-\\d{4}\\b"

  /** The augmented-text expression (shared by query and specs). */
  private[graft] def piiAugmented(text: org.apache.spark.sql.Column, docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      text,
      when(docId % 5 === 0, concat(lit(" contact user"), docId, lit("@example.com now"))).otherwise(lit("")),
      when(docId % 7 === 0, concat(lit(" from 10."), docId % 200, lit(".0."), docId % 250, lit(" logged"))).otherwise(lit("")),
      when(docId % 11 === 0, concat(lit(" call 555-"), lpad((docId % 1000).cast("string"), 3, "0"), lit("-"), lpad((docId % 10000).cast("string"), 4, "0"), lit(" today"))).otherwise(lit(""))
    )

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), piiAugmented(col("text"), col("doc_id")).as("aug"))
      .select(
        col("doc_id"),
        // NOTE: the Column/lit form, not expr(...) — a SQL string
        // literal would escape-process '\b' into a backspace byte
        size(regexp_extract_all(col("aug"), lit(PiiEmailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("aug"), lit(PiiIpv4Pat), lit(0))).cast("long").as("n_ipv4"),
        size(regexp_extract_all(col("aug"), lit(PiiPhonePat), lit(0))).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("aug"), PiiEmailPat, "<EMAIL>"),
            PiiIpv4Pat,
            "<IP>"
          ),
          PiiPhonePat,
          "<PHONE>"
        ).as("scrubbed")
      )
      .select(
        col("doc_id"),
        col("n_emails"),
        col("n_ipv4"),
        col("n_phones"),
        (col("n_emails") + col("n_ipv4") + col("n_phones")).as("n_pii"),
        length(col("scrubbed")).cast("long").as("scrub_len"),
        md5(col("scrubbed")).as("scrub_md5")
      )

  // -------------------------------------------------------------------
  // text_readability — ARI-style readability scoring, integer-exact:
  // score_milli = 4710·(chars/words) + 500·(words/sentences) − 21430
  // with truncating division on the strictly-positive ratios (words ≥
  // 1 by the split contract, sentences clamped ≥ 1), banded per source
  // at 5 000 milli (floor-div so negative scores band identically in
  // both engines). Pure row-local scoring + ONE partial-aggregable
  // groupBy on a (source × band) key space — the scan is the cost.
  // -------------------------------------------------------------------
  def readability(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .documents(spark, dir)
      .select(
        col("source"),
        length(col("text")).cast("long").as("n_chars_t"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"),
        greatest(
          lit(1L),
          (length(col("text")) - length(translate(col("text"), ".!?", ""))).cast("long")
        ).as("n_sents")
      )
      .withColumn(
        "score_milli",
        expr("4710 * n_chars_t DIV n_words + 500 * n_words DIV n_sents - 21430")
      )
      .withColumn("band", expr("(score_milli - pmod(score_milli, 5000)) DIV 5000"))
      .groupBy(col("source"), col("band"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("score_milli")).as("min_milli"),
        max(col("score_milli")).as("max_milli")
      )
  }

  // -------------------------------------------------------------------
  // text_bigram_lm — the bigram language-model table: for every head
  // token with support ≥ 50, its top-3 continuations with conditional
  // probability in basis points. Bigram counts roll up partial-
  // aggregably; the rank window is PARTITIONED by head token (rank ≤ 3
  // plans a WindowGroupLimit pushdown, so per-head work is top-k, not
  // sort-all); the conditional denominator is the per-head sum over
  // the same partition — one shuffle on the bigram key, one on the
  // head token.
  // -------------------------------------------------------------------
  def bigramLm(spark: SparkSession, dir: String, minSupport: Long = 50L, k: Int = 3): DataFrame = {
    val wr = Window.partitionBy(col("a")).orderBy(col("n_ab").desc, col("b").asc)
    val wh = Window.partitionBy(col("a"))
    docsToks(spark, dir)
      .select(
        explode(
          when(
            size(col("toks")) >= 2,
            expr("transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS a, toks[i + 1] AS b))")
          ).otherwise(array())
        ).as("bg")
      )
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
      .withColumn("n_a", sum(col("n_ab")).over(wh))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("n_a") >= minSupport && col("rnk") <= k)
      .withColumn("cond_bp", expr("n_ab * 10000 DIV n_a"))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("rnk"), col("cond_bp"))
  }

  // -------------------------------------------------------------------
  // sample_cap_per_source — per-source document cap (the anti-
  // domination lever in corpus mixing): keep at most K docs per
  // source, chosen by the deterministic md5 order (no rand(), so the
  // sample is reproducible and engine-portable), accounted as one
  // per-source summary row with a kept-id checksum. The rank window
  // is partitioned by source; at 100 TB a skewed source's window is
  // the irreducible cost of an EXACT cap — the approximate escape is
  // the md5-threshold pre-filter (sample_hash_split's trick) feeding
  // this exact pass a bounded superset.
  // -------------------------------------------------------------------
  def capPerSource(spark: SparkSession, dir: String, k: Long = 100L): DataFrame = {
    val wSrc = Window.partitionBy(col("source")).orderBy(col("hkey"), col("doc_id"))
    Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"))
      .withColumn("hkey", md5(concat(lit("cap:"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(wSrc).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("rn") <= k, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") <= k, col("doc_id")).otherwise(0L)).as("kept_id_sum")
      )
  }

  // -------------------------------------------------------------------
  // text_boilerplate — repeated-SPAN boilerplate detection (the
  // C4-style span dedup that document-level dedup structurally misses:
  // navigation chrome, license footers, banners repeated across
  // otherwise-distinct pages). This corpus carries no sentence
  // punctuation, so the span unit is the sliding 8-WORD window over
  // the normalized token stream; per-doc distinct spans (one row per
  // (doc, span) however often it repeats inside a page), then ONE
  // partial-aggregable groupBy on the span key — a span shared by k
  // docs costs k rows into its group, never a pairwise join. Top-K
  // offenders via orderBy+limit (TakeOrdered, no global sort),
  // lexical ties.
  // -------------------------------------------------------------------
  def boilerplate(spark: SparkSession, dir: String, span: Int = 8, minDocs: Long = 2L, k: Int = 20): DataFrame = {
    docsToks(spark, dir)
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("toks")) >= span,
            expr(s"transform(sequence(0, size(toks) - $span), i -> array_join(slice(toks, i + 1, $span), ' '))")
          ).otherwise(array())
        ).as("span")
      )
      .distinct()
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("span").asc)
      .limit(k)
  }

  // -------------------------------------------------------------------
  // text_boilerplate_scrub — the REMOVAL step text_boilerplate only
  // detects: per document, how much text a C4/RefinedWeb-style span
  // scrub would actually delete. A span (sliding 8-word window) is
  // boilerplate iff ≥2 distinct docs contain it; a doc's scrubbed
  // region is the UNION of its boilerplate-span intervals
  // [pos, pos+8) — overlapping spans must not double-count, so the
  // union is a per-doc gaps-and-islands pass: an island starts where
  // pos ≥ max(prev pos+8), islands aggregate to [min pos, max pos+8),
  // coverage = Σ island widths. Emits per doc the span-hit count,
  // covered/residual tokens and the scrub rate in bp — the numbers a
  // pipeline owner reads before turning the scrub on. Scale shape:
  // span df-filtering is ONE partial-aggregable groupBy on the span
  // key (k sharing docs cost k rows, never a pairwise join); the
  // islands window is PARTITIONED by doc (fine-grained keys, bounded
  // by doc length); docs with no hits ride a left join, so the output
  // is exactly one row per document.
  // -------------------------------------------------------------------
  def boilerplateScrub(spark: SparkSession, dir: String, span: Int = 8, minDocs: Long = 2L): DataFrame = {
    val sp = docsToks(spark, dir)
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("toks")) >= span,
            expr(
              s"transform(sequence(0, size(toks) - $span), i -> struct(i AS pos, array_join(slice(toks, i + 1, $span), ' ') AS span))"
            )
          ).otherwise(array())
        ).as("s")
      )
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.span").as("span"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boiler = sp
      .select(col("doc_id"), col("span"))
      .distinct()
      .groupBy(col("span"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("span"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cov = sp
      .join(boiler, Seq("span"), "left_semi")
      .withColumn(
        "prev_end",
        max(col("pos") + span).over(w.rowsBetween(Window.unboundedPreceding, -1))
      )
      .withColumn("ni", when(col("prev_end").isNull || col("pos") >= col("prev_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + span).as("e"), count(lit(1)).as("n_hits"))
      .groupBy(col("doc_id"))
      .agg(sum(col("e") - col("s")).as("covered"), sum(col("n_hits")).as("n_spans"))
    val out = docsToks(spark, dir)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
      .join(cov, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_toks"),
        coalesce(col("n_spans"), lit(0L)).as("n_boiler_spans"),
        coalesce(col("covered"), lit(0L)).as("covered_tokens"),
        (col("n_toks") - coalesce(col("covered"), lit(0L))).as("residual_tokens"),
        expr("coalesce(covered, 0L) * 10000 DIV greatest(n_toks, 1L)").as("scrub_bp")
      )
    Dedup.releaseAfterRun(spark, out, Seq(sp))
  }

  // -------------------------------------------------------------------
  // sample_pack_sequences — SEQUENCE-PACKING accounting for LLM
  // pretraining (concat-and-chunk): documents concatenate in a
  // deterministic global order and are chunked into fixed L-token
  // training sequences; the audit reports, per source, how many docs
  // get split across a sequence boundary (the attention-contamination
  // / truncation cost every packing strategy trades against). The
  // global order is (md5 band, hash, doc_id) and the GLOBAL prefix sum
  // is two-level — 256-band totals roll up partial-aggregably, band
  // offsets come from a window over the 256-ROW band table (the
  // coverage_topk exception pattern), and within-band running sums are
  // band-partitioned — so no corpus-scaled single-partition window
  // exists anywhere. Token counts use the n_chars DIV 4 proxy
  // (pipeline_mix_plan's contract). A doc crosses a boundary iff
  // start DIV L ≠ (end−1) DIV L.
  // -------------------------------------------------------------------
  def packSequences(spark: SparkSession, dir: String, seqLen: Long = 2048L): DataFrame = {
    val wBandTotals = Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, -1)
    val wInBand = Window
      .partitionBy(col("band"))
      .orderBy(col("hkey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        expr("greatest(n_chars DIV 4, 1L)").as("toks"),
        md5(concat(lit("pack:"), col("doc_id").cast("string"))).as("hkey")
      )
      .withColumn(
        "band",
        expr("(instr('0123456789abcdef', substring(hkey, 1, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(hkey, 2, 1)) - 1)")
      )
    val bandTotals = docs
      .groupBy(col("band"))
      .agg(sum(col("toks")).as("band_toks"))
      .withColumn("band_offset", coalesce(sum(col("band_toks")).over(wBandTotals), lit(0L)))
      .select(col("band"), col("band_offset"))
    docs
      .join(broadcast(bandTotals), Seq("band"))
      .withColumn("g_end", col("band_offset") + sum(col("toks")).over(wInBand))
      .withColumn("g_start", col("g_end") - col("toks"))
      .withColumn("crosses", (expr(s"g_start DIV ${seqLen}L") =!= expr(s"(g_end - 1) DIV ${seqLen}L")).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("crosses")).as("n_boundary_crossings"),
        expr("sum(1 - crosses) * 10000").as("pure_docs_x10k")
      )
      .withColumn("pure_bp", expr("pure_docs_x10k DIV n_docs"))
      .drop("pure_docs_x10k")
  }

  // -------------------------------------------------------------------
  // pipeline_mix_plan — BALANCED mixture planning: given per-source
  // available tokens (n_chars DIV 4, the standard chars-per-token
  // proxy — no tokenization pass needed), compute the keep rate that
  // equalizes every source to the scarcest one (the epoch-balanced
  // mix), in basis points, plus the expected token yield. One
  // partial-aggregable groupBy to the per-source table, then an
  // unpartitioned window over that BOUNDED aggregate (one row per
  // corpus source — the text_domain_mix exception pattern). All
  // quantities positive integers: DIV ≡ floor ≡ DuckDB //.
  // -------------------------------------------------------------------
  def mixPlan(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy()
    Tables
      .documents(spark, dir)
      .select(col("source"), expr("n_chars DIV 4").as("toks_est"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks_est")).as("avail_tokens"))
      .withColumn("target_tokens", min(col("avail_tokens")).over(w))
      .withColumn("keep_bp", expr("target_tokens * 10000 DIV avail_tokens"))
      .withColumn("expected_tokens", expr("avail_tokens * keep_bp DIV 10000"))
      .select(
        col("source"),
        col("n_docs"),
        col("avail_tokens"),
        col("target_tokens"),
        col("keep_bp"),
        col("expected_tokens")
      )
  }

  // -------------------------------------------------------------------
  // text_repetition — Gopher-style REPETITION filter: per document,
  // the fraction of n-gram occurrences (n = 2, 3) whose n-gram repeats
  // within the document, in basis points, plus the combined flag a
  // pretraining pipeline gates on (templated / machine-generated pages
  // score high). Both gram sizes ride ONE explode (grams carry an
  // "n:" tag so a single (doc, gram) groupBy counts both families),
  // then one doc-grain conditional aggregate — partial-aggregable end
  // to end, no token-grain shuffle survives the map-side combine on
  // the (doc, gram) key. Ratios are exact integers: DIV by the
  // occurrence total, guarded by greatest(·, 1) for short docs.
  // -------------------------------------------------------------------
  def repetition(
      spark: SparkSession,
      dir: String,
      rep2FlagBp: Long = 2000L,
      rep3FlagBp: Long = 1800L
  ): DataFrame =
    docsToks(spark, dir)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        explode(
          concat(
            when(
              size(col("toks")) >= 2,
              expr("transform(sequence(0, size(toks) - 2), i -> '2:' || array_join(slice(toks, i + 1, 2), ' '))")
            ).otherwise(array()),
            when(
              size(col("toks")) >= 3,
              expr("transform(sequence(0, size(toks) - 3), i -> '3:' || array_join(slice(toks, i + 1, 3), ' '))")
            ).otherwise(array())
          )
        ).as("gram")
      )
      .groupBy(col("doc_id"), col("n_toks"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_toks"))
      .agg(
        sum(when(col("gram").startsWith("2:"), col("c")).otherwise(0L)).as("g2_total"),
        sum(when(col("gram").startsWith("2:") && col("c") >= 2, col("c")).otherwise(0L)).as("g2_dup"),
        sum(when(col("gram").startsWith("3:"), col("c")).otherwise(0L)).as("g3_total"),
        sum(when(col("gram").startsWith("3:") && col("c") >= 2, col("c")).otherwise(0L)).as("g3_dup")
      )
      .withColumn("rep2_bp", expr("g2_dup * 10000 DIV greatest(g2_total, 1L)"))
      .withColumn("rep3_bp", expr("g3_dup * 10000 DIV greatest(g3_total, 1L)"))
      .withColumn("flagged", col("rep2_bp") > rep2FlagBp || col("rep3_bp") > rep3FlagBp)
      .select(
        col("doc_id"),
        col("n_toks"),
        col("g2_dup"),
        col("rep2_bp"),
        col("g3_dup"),
        col("rep3_bp"),
        col("flagged")
      )

  // -------------------------------------------------------------------
  // sample_importance — DSIR-style data selection: importance weights
  // for every raw document from HASHED-unigram language models of a
  // target domain vs the raw corpus (Xie et al.'s data-selection-with-
  // importance-resampling shape, integer-exact). Tokens hash into
  // B = 1024 buckets; each corpus keeps one Laplace-smoothed count per
  // bucket; a raw doc's log-weight is the sum over its tokens of
  //   bits(ct_b + 1) − bits(cr_b + 1) + [bits(Nr + B) − bits(Nt + B)]
  // — the integer-bit log of the smoothed probability ratio
  // (bits(x) = ⌊log₂ x⌋ + 1 via length(bin(x)), the text_surprisal
  // idiom both engines replay exactly). Target = the min-source
  // convention (contamination family); the corpus-size term makes
  // weights comparable across corpora, so keep = logw >= 0 reads
  // "more target-like than raw-like". Scale shape: the bucket-stat
  // table is ≤B rows (broadcast — the full vocabulary never
  // broadcasts, that's the POINT of hashing the features), bucket ids
  // are row-local md5 arithmetic, one doc-grain aggregate; the two
  // corpus sizes are a 1-row driver scalar (house pattern).
  // -------------------------------------------------------------------
  def importanceWeights(spark: SparkSession, dir: String, buckets: Int = 1024): DataFrame = {
    val t = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn(
        "bucket",
        expr(s"CAST(conv(substring(md5(concat('dsir:', tok)), 1, 12), 16, 10) AS BIGINT) % $buckets")
      )
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val targetSrc = t.agg(min(col("source"))).head().getString(0)
    require(targetSrc != null, "sample_importance: empty corpus")
    val sizes = t
      .agg(
        sum(when(col("source") === targetSrc, 1L).otherwise(0L)).as("nt"),
        sum(when(col("source") =!= targetSrc, 1L).otherwise(0L)).as("nr")
      )
      .head()
    val (nt, nr) = (sizes.getLong(0), sizes.getLong(1))
    val tgt = t
      .filter(col("source") === targetSrc)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("ct"))
    val raw = t.filter(col("source") =!= targetSrc)
    val bt = raw
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"))
      .join(tgt, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ct"), lit(0L)).as("ct"), col("cr"))
      .withColumn(
        "contrib",
        expr(
          s"CAST(length(bin(ct + 1)) AS BIGINT) - CAST(length(bin(cr + 1)) AS BIGINT)" +
            s" + ${java.lang.Long.toBinaryString(nr + buckets).length}L" +
            s" - ${java.lang.Long.toBinaryString(nt + buckets).length}L"
        )
      )
    val out = raw
      .join(broadcast(bt.select(col("bucket"), col("contrib"))), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("contrib")).as("logw_bits"))
      .withColumn("mean_logw_milli", expr("logw_bits * 1000 DIV n_toks"))
      .withColumn("keep", col("logw_bits") >= 0L)
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(t))
  }

  // -------------------------------------------------------------------
  // -------------------------------------------------------------------
  // approx_cms — COUNT-MIN SKETCH over the corpus token stream, its
  // estimates published next to the exact counts so the operator is
  // its own error report (the KMV/HLL house pattern). The sketch a
  // 100 TB pipeline keeps per shard/day to answer "roughly how often
  // does this token appear" in O(D·W) memory: D=4 hash rows × W=256
  // counters; every token occurrence increments one cell per row;
  // a point estimate is the MIN over its D cells (Cormode–
  // Muthukrishnan, one-sided overestimate only). Scale shape: cells
  // are ONE partial-aggregable groupBy on (row, bucket) — a D×W = 1k
  // key space, so map-side combine collapses each partition to ≤1k
  // rows regardless of corpus size; the D-fold occurrence expansion
  // happens BEFORE the combine and never reaches the shuffle. Probes
  // are the top-k exact tokens (orderBy+limit = TakeOrdered, no
  // global sort); the 1k-row cell table broadcasts to them. Hashing
  // is the house md5-hex-prefix integer both engines replay exactly.
  // -------------------------------------------------------------------
  /** CMS cell address for the (r, tok) row — shared by the batch
    * sketch and its streaming-state twin so their counters collide.
    */
  private[graft] def cmsBucketExpr(width: Int) = expr(
    s"CAST(conv(substring(md5(concat('cms', CAST(r AS STRING), ':', tok)), 1, 12), 16, 10) AS BIGINT) % $width"
  )

  /** CMS probe tier: top-k exact tokens joined against a (r, bucket,
    * c) counter table; estimate = MIN over the D cells. Shared by the
    * batch and streaming variants — the sketch is additive, so both
    * counter tables are identical and so is this read.
    */
  private[graft] def cmsProbe(
      spark: SparkSession,
      dir: String,
      cells: DataFrame,
      width: Int,
      depth: Int,
      k: Int
  ): DataFrame = {
    val probes = docsToks(spark, dir)
      .select(explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc)
      .limit(k)
    probes
      .select(col("tok"), col("n_exact"), explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn("bucket", cmsBucketExpr(width))
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("c")).as("est_cms"))
      .withColumn("over_count", col("est_cms") - col("n_exact"))
  }

  def cmsTokens(spark: SparkSession, dir: String, width: Int = 256, depth: Int = 4, k: Int = 20): DataFrame = {
    val occ = docsToks(spark, dir)
      .select(explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def bucketOf = cmsBucketExpr(width)
    val cells = occ
      .select(col("tok"), explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn("bucket", bucketOf)
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val probes = occ
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc)
      .limit(k)
    val out = probes
      .select(col("tok"), col("n_exact"), explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn("bucket", bucketOf)
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("c")).as("est_cms"))
      .withColumn("over_count", col("est_cms") - col("n_exact"))
    Dedup.releaseAfterRun(spark, out, Seq(occ))
  }

  // -------------------------------------------------------------------
  // sample_priority — PRIORITY SAMPLING (Duffield–Lund–Thorup): a
  // weight-sensitive k-per-source sample with an unbiased subset-sum
  // estimator, fully deterministic (the md5 salt is the seed, so
  // reruns and audits reproduce the same sample — the property a
  // training-data lineage system needs). Each doc draws u = 48-bit
  // md5 uniform; priority q = w·2⁴⁸ DIV u; keep the k largest per
  // source; τ = the (k+1)-th priority; each kept doc's weight
  // estimate is ŵ = max(w, τ) — Σŵ estimates the source's total
  // weight, and the estimate is published NEXT TO the exact total so
  // the operator is its own error report. Weight = n_chars (token
  // mass). Scale shape: the k+1 largest per source run through the
  // rank-filter window Spark rewrites into WindowGroupLimit (a
  // bounded heap per partition, never a per-source sort of the
  // corpus); τ and the exact totals are per-source 1-row aggregates
  // broadcast back. All arithmetic < 2⁶² and every division a floor,
  // so DuckDB replays bit-identical integers.
  // -------------------------------------------------------------------
  def prioritySample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val P48 = 281474976710656L // 2^48
    val docs = Tables
      .documents(spark, dir)
      .select(
        col("source"),
        col("doc_id"),
        col("n_chars").as("weight"),
        conv(substring(md5(concat(lit("ps:"), col("doc_id").cast("string"))), 1, 12), 16, 10)
          .cast("long")
          .as("u")
      )
      // md5 of a fixed-length hex prefix is never 0 in practice, but
      // the estimator needs u >= 1 structurally, not probabilistically
      .withColumn("q", expr(s"weight * ${P48}L DIV greatest(u, 1L)"))
    val ranked = docs
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(col("source")).orderBy(col("q").desc, col("doc_id").asc))
      )
      .filter(col("rn") <= k + 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tau = ranked
      .groupBy(col("source"))
      .agg(max(when(col("rn") === k + 1, col("q")).otherwise(0L)).as("tau"))
    val totals = Tables
      .documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("total_weight"))
    val out = ranked
      .filter(col("rn") <= k)
      .join(broadcast(tau), Seq("source"))
      .withColumn("w_hat", greatest(col("weight"), col("tau")))
      .join(broadcast(totals), Seq("source"))
      .select(
        col("source"),
        col("doc_id"),
        col("weight"),
        col("q"),
        col("tau"),
        col("w_hat"),
        col("total_weight")
      )
    Dedup.releaseAfterRun(spark, out, Seq(ranked))
  }

  // -------------------------------------------------------------------
  // text_langid_eval — language-ID CONFUSION MATRIX against the gold
  // `lang` label the corpus carries: per (gold, predicted) cell, the
  // doc count and its share of the gold language in basis points. The
  // eval every classifier-gated pipeline publishes next to the
  // classifier itself — and an honest one: the marker heuristic has no
  // zh markers, so zh's row shows exactly where unmatched languages
  // land. Reuses the text_langid scorer; cells are a |langs|²-bounded
  // key space, per-gold totals come from a broadcast join against the
  // tiny gold-grain aggregate (never a corpus-scaled window).
  // -------------------------------------------------------------------
  def langIdEval(spark: SparkSession, dir: String): DataFrame = {
    val pred = langId(spark, dir).select(col("doc_id"), col("pred_lang"))
    val cells = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val goldTotals = cells.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_gold"))
    cells
      .join(broadcast(goldTotals), Seq("lang"))
      .select(
        col("lang"),
        col("pred_lang"),
        col("n_docs"),
        expr("n_docs * 10000 DIV n_gold").as("share_bp"),
        (col("lang") === col("pred_lang")).as("correct")
      )
  }

  // -------------------------------------------------------------------
  // text_span_df_profile — the span DOCUMENT-FREQUENCY histogram: how
  // much of the corpus' 8-word span mass sits at each df power-of-2
  // band. This is the report that justifies every df-cap in the
  // engine (dropOversizedBuckets, the long-match anchor cap, the
  // common-neighbors middle cap): the high-df tail IS the boilerplate
  // mass those caps drop, and this operator prices it before a cap is
  // chosen. Same per-doc-distinct span grain as text_boilerplate;
  // one partial-aggregable groupBy on the span key (a span shared by
  // k docs costs k rows into its group, never a pairwise join), then
  // a second groupBy on the ~log₂(corpus) band key space. Bands via
  // length(bin(df)) − 1 — the integer floor-log2 both engines share.
  // -------------------------------------------------------------------
  def spanDfProfile(spark: SparkSession, dir: String, span: Int = 8): DataFrame = {
    val df = docsToks(spark, dir)
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("toks")) >= span,
            expr(s"transform(sequence(0, size(toks) - $span), i -> array_join(slice(toks, i + 1, $span), ' '))")
          ).otherwise(array())
        ).as("span")
      )
      .distinct()
      .groupBy(col("span"))
      .agg(count(lit(1)).as("df"))
    val total = df.agg(sum(col("df")).as("total_occ"))
    df
      .groupBy(expr("CAST(length(bin(df)) - 1 AS BIGINT)").as("df_band"))
      .agg(count(lit(1)).as("n_spans"), sum(col("df")).as("occ"))
      .crossJoin(broadcast(total))
      .select(
        col("df_band"),
        expr("CAST(pow(2, df_band) AS BIGINT)").as("df_lo"),
        col("n_spans"),
        col("occ"),
        expr("occ * 10000 DIV total_occ").as("occ_share_bp")
      )
  }

  // -------------------------------------------------------------------
  // text_lexical_diversity — per-doc lexical-diversity quality panel:
  // type-token ratio, hapax share, and the most-common-token share
  // (the Gopher "fraction of most frequent word" rule). Entirely
  // ROW-LOCAL: sort the doc's token array once, then every statistic
  // is run-length analysis of the sorted array (a run start is a
  // type, a length-1 run is a hapax, the longest run is the top
  // token) — O(n log n) per doc, ZERO shuffle, so at 100 TB this is
  // embarrassingly parallel scan work with no skew surface at all
  // (the token-grain explode+groupBy alternative shuffles the entire
  // corpus by token and melts on stopword keys). Integer bp ratios;
  // the oracle replays the identical indexed-lambda run analysis.
  // -------------------------------------------------------------------
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    docsToks(spark, dir)
      .select(col("doc_id"), expr("array_sort(filter(toks, x -> x != ''))").as("srt"))
      // 1-based positions; IF guards the empty doc (Spark sequence(1, 0)
      // DESCENDS), and in-run index probes are clamped with
      // greatest/least so no branch can read out of bounds under ANSI
      .select(
        col("doc_id"),
        col("srt"),
        size(col("srt")).cast("long").as("n_toks"),
        expr("IF(size(srt) = 0, array(), sequence(1, size(srt)))").as("pos")
      )
      .select(
        col("doc_id"),
        col("n_toks"),
        // run starts of the sorted array = distinct types
        expr("filter(pos, i -> i = 1 OR srt[i - 1] != srt[greatest(i - 2, 0)])").as("starts"),
        // a hapax is a run start that is also a run end
        expr(
          "CAST(size(filter(pos, i -> (i = 1 OR srt[i - 1] != srt[greatest(i - 2, 0)])" +
            " AND (i = size(srt) OR srt[i - 1] != srt[least(i, size(srt) - 1)]))) AS BIGINT)"
        ).as("n_hapax")
      )
      .select(
        col("doc_id"),
        col("n_toks"),
        size(col("starts")).cast("long").as("n_types"),
        col("n_hapax"),
        // longest run = max delta between consecutive start positions
        // (next start after the last is the sentinel n_toks + 1)
        expr(
          "CAST(coalesce(array_max(zip_with(starts, concat(slice(starts, 2, greatest(size(starts) - 1, 0)), " +
            "array(CAST(n_toks + 1 AS INT))), (s, e) -> e - s)), 0) AS BIGINT)"
        ).as("top_tok_n")
      )
      .select(
        col("doc_id"),
        col("n_toks"),
        col("n_types"),
        expr("n_types * 10000 DIV greatest(n_toks, 1)").as("ttr_bp"),
        col("n_hapax"),
        expr("n_hapax * 10000 DIV greatest(n_toks, 1)").as("hapax_bp"),
        col("top_tok_n"),
        expr("top_tok_n * 10000 DIV greatest(n_toks, 1)").as("top_tok_bp")
      )

  /** sample_epoch_schedule — MULTI-EPOCH SHUFFLE decorrelation audit:
    * every training run reshuffles the corpus per epoch with a
    * deterministic seeded hash order (position_e(doc) ∝
    * md5(epoch:doc)); this operator measures that the epochs are
    * actually independent of each other — the property that makes
    * multi-epoch training see data in fresh order rather than
    * replaying epoch 0. Per epoch pair: (a) mean displacement between
    * the doc's 256-bucket position proxies (independent uniforms give
    * ~85.3, identical orders give 0), and (b) the overlap of the two
    * epochs' 10%-hash samples (membership h % 10 = 0) against its
    * independence expectation n_s1·n_s2/N in bp. Everything is
    * ROW-LOCAL (each doc computes both epochs' hashes in place — no
    * join between epochs, no global sort; the position proxy replaces
    * the rank exactly so the audit never orders the corpus) followed
    * by ONE groupBy onto the 6 constant pair keys — map-side combine
    * collapses every partition to 6 rows regardless of corpus size.
    */
  def epochSchedule(spark: SparkSession, dir: String, epochs: Int = 4): DataFrame = {
    val pairs = (0 until epochs).combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val docs = Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .withColumn("pair", explode(typedlit(pairs)))
      .select(col("doc_id"), col("pair._1").as("e1"), col("pair._2").as("e2"))
      .withColumn(
        "h1",
        expr("CAST(conv(substring(md5(concat('epoch:', CAST(e1 AS STRING), ':', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
      )
      .withColumn(
        "h2",
        expr("CAST(conv(substring(md5(concat('epoch:', CAST(e2 AS STRING), ':', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
      )
    docs
      .groupBy(col("e1").cast("long").as("e1"), col("e2").cast("long").as("e2"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(expr("CASE WHEN h1 % 10 = 0 THEN 1 ELSE 0 END")).as("n_s1"),
        sum(expr("CASE WHEN h2 % 10 = 0 THEN 1 ELSE 0 END")).as("n_s2"),
        sum(expr("CASE WHEN h1 % 10 = 0 AND h2 % 10 = 0 THEN 1 ELSE 0 END")).as("n_both"),
        sum(expr("abs(h1 % 256 - h2 % 256)")).as("disp_sum")
      )
      .select(
        col("e1"),
        col("e2"),
        col("n_docs"),
        col("n_s1"),
        col("n_s2"),
        col("n_both"),
        expr("disp_sum * 100 DIV n_docs").as("mean_disp_x100"),
        expr("n_both * 10000 * n_docs DIV greatest(n_s1 * n_s2, 1L)").as("overlap_vs_exp_bp")
      )
  }

  // -------------------------------------------------------------------
  // 31zq. sample_budget_alloc — WATER-FILLING a token budget across
  // sources: given budget B (a fixed share of the corpus so the drill
  // scales), allocate aₛ = min(nₛ, cap) with cap the water level that
  // spends the budget — small sources keep everything, the surplus
  // redistributes to large ones. The classic budgeted-mixing planner
  // (pipeline_mix_plan rebalances to uniform; this one spends an
  // explicit budget). The level is found by T=4 exact integer rounds:
  // each round pins sources below the current level as fully-kept,
  // then re-floors the level over the rest — each round's level is a
  // 1-row scalar aggregate (the evalSrc/bpe-argmax precedent), so the
  // only corpus-sized pass is the per-source token count; everything
  // after runs on the ≤|sources|-row table.
  // -------------------------------------------------------------------
  def budgetAlloc(spark: SparkSession, dir: String, budgetBp: Long = 4000L, rounds: Int = 4): DataFrame = {
    val perSource = docsToks(spark, dir)
      .select(col("doc_id"), col("toks"))
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total  = perSource.agg(sum(col("n_tokens"))).head().getLong(0)
    val budget = total * budgetBp / 10000L
    var cap    = budget / math.max(perSource.count(), 1L) // level 0: equal split
    for (_ <- 1 until rounds) {
      // pin fully-kept sources at the current level, re-floor over the rest
      val row = perSource
        .agg(
          sum(when(col("n_tokens") <= cap, col("n_tokens"))).as("spent"),
          sum(when(col("n_tokens") > cap, 1L).otherwise(0L)).as("open")
        )
        .head()
      val spent = Option(row.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val open  = row.getLong(1)
      if (open > 0L) cap = (budget - spent) / open
    }
    val out = perSource
      .withColumn("alloc_tokens", least(col("n_tokens"), lit(cap)))
      .withColumn("kept_bp", expr("alloc_tokens * 10000 DIV n_tokens"))
      .withColumn("is_capped", col("n_tokens") > cap)
      .withColumn("cap_tokens", lit(cap))
      .select(col("source"), col("n_tokens"), col("alloc_tokens"), col("kept_bp"), col("is_capped"), col("cap_tokens"))
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(perSource))
  }

  // -------------------------------------------------------------------
  // 31zp. sample_perplexity_filter — the CCNet selection rule: bucket
  // every document into head/middle/tail by PER-LANGUAGE perplexity
  // terciles and keep head+middle (the tail is the gibberish/leakage
  // band a model-based filter would drop). Perplexity proxy is the
  // integer unigram surprisal (bit-length of N/freq — text_surprisal's
  // machinery, no float log). The terciles are NOT a doc-grain global
  // sort: per-doc means land in 1/40-bit HISTOGRAM bins (bounded
  // domain — mean bits ≤ 63 so ≤ 2520 bins), the cumulative window runs
  // over the per-lang BIN table, and the tercile threshold bins come
  // off that ≤|langs|·252-row aggregate — the two-pass histogram-
  // quantile shape that survives 100 TB where a global NTILE dies on
  // one reducer. Thresholds re-join the corpus as a per-lang tiny
  // broadcast; bucketing is then row-local.
  // -------------------------------------------------------------------
  def perplexityFilter(spark: SparkSession, dir: String, binMicro: Long = 25000L): DataFrame = {
    val toks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val n = toks.agg(count(lit(1)).as("nt"))
    val perDoc = toks
      .join(freq, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("sbits", expr("CAST(length(bin(nt DIV f)) AS BIGINT)"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_toks"), sum(col("sbits")).as("sum_bits"))
      .withColumn("mean_micro", expr("sum_bits * 1000000 DIV n_toks"))
      .withColumn("bin", expr(s"mean_micro DIV ${binMicro}L"))
    val wl = Window.partitionBy(col("lang")).orderBy(col("bin"))
    val th = perDoc
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("nb"))
      .withColumn("cum", sum(col("nb")).over(wl))
      .withColumn("total", sum(col("nb")).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(
        min(when(col("cum") * 3 >= col("total"), col("bin"))).as("t1"),
        min(when(col("cum") * 3 >= col("total") * 2, col("bin"))).as("t2")
      )
    perDoc
      .join(broadcast(th), Seq("lang"))
      .withColumn(
        "bucket",
        when(col("bin") <= col("t1"), lit("head"))
          .when(col("bin") <= col("t2"), lit("middle"))
          .otherwise(lit("tail"))
      )
      .withColumn("keep", when(col("bin") > col("t2"), lit(0L)).otherwise(lit(1L)))
      .groupBy(col("lang"), col("bucket"))
      .agg(
        min(col("keep")).as("keep"),
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_toks"),
        min(col("mean_micro")).as("lo_micro"),
        max(col("mean_micro")).as("hi_micro")
      )
  }

  // -------------------------------------------------------------------
  // text_zipf_slope — the ZIPF-LAW slope of the corpus vocabulary,
  // the single-number "does this feed look like natural language"
  // screen (clean text fits freq ∝ rank^(−s) with s ≈ 1; machine spam
  // and template farms bend it). Fit entirely in integer bit
  // arithmetic so both engines agree bit-for-bit: the top-256 tokens
  // by frequency (TakeOrdered's bounded heap over the Heaps-bounded
  // vocab — never a global sort of the corpus) map to log-log points
  // (⌊log₂ rank⌋, ⌊log₂ freq⌋) via length(bin(·)) (the portable-HLL
  // msb trick), and the least-squares slope is the classic five-sum
  // formula published as an exact num/den pair + one truncating
  // milli-unit division. The only corpus-scaled work is the token
  // count groupBy (partial-aggregable); everything after runs on ≤256
  // rows.
  // -------------------------------------------------------------------
  def zipfSlope(spark: SparkSession, dir: String, topK: Int = 256): DataFrame = {
    val vocab = docsToks(spark, dir)
      .select(explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(topK)
    val w = Window.orderBy(col("n").desc, col("tok").asc)
    vocab
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(
        expr("length(bin(rnk)) - 1").as("lx"),
        expr("length(bin(n)) - 1").as("ly"),
        col("rnk"),
        col("n")
      )
      .agg(
        count(lit(1)).as("n_points"),
        max(when(col("rnk") === 1L, col("n"))).as("top_freq"),
        sum(col("lx")).as("sx"),
        sum(col("ly")).as("sy"),
        sum(col("lx") * col("ly")).as("sxy"),
        sum(col("lx") * col("lx")).as("sxx")
      )
      .select(
        col("n_points"),
        col("top_freq"),
        (col("n_points") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_points") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        expr(
          "CASE WHEN n_points * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE ((n_points * sxy - sx * sy) * 1000) DIV (n_points * sxx - sx * sx) END"
        ).as("slope_milli")
      )
  }

  // -------------------------------------------------------------------
  // 31z. text_encoding_audit — the ENCODING-HYGIENE screen a corpus
  // passes before tokenization: per source, the character-class
  // census (letters / digits / spaces / punctuation-residual) plus
  // the two contamination gates — non-ASCII bytes (mojibake,
  // double-encoded UTF-8, copy-paste smart quotes) and C0 control
  // characters (binary spill, NUL-padded extractions) — with the
  // share of fully-clean documents. On a healthy corpus the gate
  // columns are exactly zero and the census still validates the
  // counting machinery; on a real crawl the nonzero gates name which
  // source needs re-extraction. Counts are length-minus-stripped
  // (one regexp_replace per class, row-local, codegen'd), the report
  // ONE partial-aggregable groupBy onto the source enum. Both engines
  // count code points (the corpus contract is ASCII-clean; the gates
  // EXIST to prove it, so the count basis agrees exactly where it
  // matters and the gate fires on any non-ASCII byte either way).
  // -------------------------------------------------------------------
  def encodingAudit(spark: SparkSession, dir: String): DataFrame = {
    def cnt(pat: String) =
      (length(col("text")) - length(regexp_replace(col("text"), pat, ""))).cast("long")
    val per = Tables
      .documents(spark, dir)
      .select(
        col("source"),
        length(col("text")).cast("long").as("nc"),
        cnt("[A-Za-z]").as("letters"),
        cnt("[0-9]").as("digits"),
        cnt(" ").as("spaces"),
        cnt("[^\\x00-\\x7F]").as("nonascii"),
        cnt("[\\x00-\\x1F]").as("control")
      )
    per
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_chars"),
        sum(col("letters")).as("sl"),
        sum(col("digits")).as("sd"),
        sum(col("spaces")).as("ss"),
        sum(col("nonascii")).as("sna"),
        sum(col("control")).as("sct"),
        sum(when(col("nonascii") + col("control") === 0L, 1L).otherwise(0L)).as("clean_docs")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("n_chars"),
        expr("sl * 10000 DIV greatest(n_chars, 1L)").as("letters_bp"),
        expr("sd * 10000 DIV greatest(n_chars, 1L)").as("digits_bp"),
        expr("ss * 10000 DIV greatest(n_chars, 1L)").as("space_bp"),
        expr("(n_chars - sl - sd - ss - sna - sct) * 10000 DIV greatest(n_chars, 1L)").as("punct_bp"),
        col("sna").as("nonascii_chars"),
        col("sct").as("control_chars"),
        expr("clean_docs * 10000 DIV greatest(n_docs, 1L)").as("clean_bp")
      )
  }

  // -------------------------------------------------------------------
  // 31z2. text_bm25_topk — BM25 ranking (the Robertson/Spärck Jones
  // scorer every production search engine defaults to) next to
  // text_search_topk's plain TF-IDF: same query terms, same
  // scan-stage term filter, but the term weight saturates in tf and
  // normalizes by document length. Exactness: k1 = 6/5 and b = 3/4
  // clear denominators when the term fraction is multiplied through
  // by 20·avgdl — term = idf · 44·A·tf / (20·A·tf + 6·A + 18·dl),
  // every factor an integer (A = floor avg doc length), the product
  // riding DECIMAL(38,0) so a 10⁹-doc idf cannot overflow, floor-div
  // per term THEN summed (the same order both engines replay). The
  // corpus stats are a 1-row broadcast; tf/df partial-aggregable;
  // top-10 an ordered limit.
  // -------------------------------------------------------------------
  def bm25Topk(
      spark: SparkSession,
      dir: String,
      query: Seq[String] = Seq("fast", "key", "sort"),
      k: Int = 10
  ): DataFrame = {
    val toks = docsToks(spark, dir)
    val dl   = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl
      .agg(count(lit(1)).as("nd"), sum(col("dl")).as("tl"))
      .withColumn("a", expr("greatest(tl DIV nd, 1L)"))
      .select(col("nd"), col("a"))
    val t = toks
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(query: _*))
    val tf = t.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = t.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    val w  = org.apache.spark.sql.expressions.Window.orderBy(col("score_micro").desc, col("doc_id").asc)
    tf.join(df, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro", expr("nd * 1000000 DIV df"))
      .withColumn(
        "term_micro",
        expr(
          "CAST(CAST(idf_micro AS DECIMAL(38,0)) * (44 * a * tf) DIV (20 * a * tf + 6 * a + 18 * dl) AS BIGINT)"
        )
      )
      .groupBy(col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("score_micro"))
  }

  // -------------------------------------------------------------------
  // 31z3. sample_interleave — the DETERMINISTIC PROPORTIONAL
  // INTERLEAVE a shard-sequential dataloader consumes (stride
  // scheduling / virtual time, the WFQ idea): each source gets weight
  // w = ⌊1000·√n⌋ (temperature-0.5, sample_temperature's convention —
  // IEEE sqrt + floor is bit-stable on exact integer input), each
  // doc's virtual position is vt = rank_in_source·10⁶ DIV w, and the
  // global order by (vt, source, rank) interleaves sources
  // proportionally to weight WITHOUT any randomness — resumable from
  // a (source, rank) cursor, the property batch dataloaders need.
  // Report: per source, its docs inside the first-500 window vs its
  // weight share — the interleave is correct when the two agree to
  // quantization. Per-source rank windows partition by source; the
  // window selection is an ordered limit (TakeOrdered, never a global
  // sort); the weight table is a 1-row-per-source broadcast.
  // -------------------------------------------------------------------
  def sampleInterleave(spark: SparkSession, dir: String, window: Int = 500): DataFrame = {
    val docs   = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val wts = counts
      .withColumn("w", floor(lit(1000.0) * sqrt(col("n_docs").cast("double"))).cast("long"))
    val rnW = org.apache.spark.sql.expressions.Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val sel = docs
      .withColumn("rn", row_number().over(rnW).cast("long"))
      .join(broadcast(wts), Seq("source"))
      .withColumn("vt", expr("rn * 1000000 DIV w"))
      .orderBy(col("vt").asc, col("source").asc, col("rn").asc)
      .limit(window)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sel"))
    val totW = wts.agg(sum(col("w")).as("tw"))
    wts
      .join(sel, Seq("source"), "left")
      .crossJoin(broadcast(totW))
      .select(
        col("source"),
        col("n_docs"),
        col("w"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        expr(s"coalesce(n_sel, 0L) * 10000 DIV $window").as("sel_share_bp"),
        expr("w * 10000 DIV tw").as("weight_share_bp")
      )
  }
}
