package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.functions.PortableHash
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two tiers, same contract:
  *   - brute-force exact top-k: the correctness baseline. The probe
  *     set broadcasts (it is tiny by construction) and candidates
  *     stream through map-side — no shuffle of the corpus at all;
  *     the only wide step is the per-probe top-k, which AQE keeps to
  *     one small exchange because only k rows per probe survive.
  *   - random-hyperplane LSH: the 100 TB path. Vectors bucket by the
  *     sign pattern of md5-derived integer hyperplanes; search touches
  *     one bucket instead of the corpus. Plane weights are odd
  *     integers so an exact integer dot can never sit on the plane.
  */
object Similarity {

  private[graft] def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), quantizeMicro(col("embedding")).as("q"))
      .withColumn("n2", norm2Q(col("q")))

  /** hyperplane-LSH bucket id over a quantized vector column `q` —
    * shared by the batch bucketed searches and the streaming dual
    */
  private[graft] def bucketExpr(nPlanes: Int): org.apache.spark.sql.Column =
    PortableHash
      .planeWeights(nPlanes, 64)
      .zipWithIndex
      .map { case (wts, p) =>
        when(dotQ(col("q"), typedlit(wts)) > 0, lit(1 << p)).otherwise(lit(0))
      }
      .reduce(_ + _)
      .cast("long")

  // -------------------------------------------------------------------
  // 27. ann_topk_bruteforce — exact top-k cosine for a probe set.
  // -------------------------------------------------------------------
  def annTopkBruteForce(spark: SparkSession, dir: String, nProbes: Int = 5, k: Int = 10): DataFrame = {
    val q = quantized(spark, dir)
    val probes = q.filter(col("vec_id") < nProbes).toDF("probe_id", "pq", "pn2")
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    q.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  // -------------------------------------------------------------------
  // 28b. ann_ivf_bucketed — IVF coarse quantization: cells are nearest-
  // seed-centroid assignments (seeds sampled deterministically from the
  // corpus, the classic "train on a sample" coarse quantizer); probes
  // search their `probeCells` nearest cells exactly. All assignment
  // distances are exact integers (n2 + c2 - 2*dot over quantized
  // vectors), so cell membership is deterministic across engines. The
  // corpus-side pass is one broadcast-centroid map + shuffle on cell —
  // at 100 TB the cell count grows with the corpus and the per-cell
  // search cost stays constant.
  // -------------------------------------------------------------------
  def annIvfBucketed(
      spark: SparkSession,
      dir: String,
      nCells: Int = 8,
      probeCells: Int = 2,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    val q = quantized(spark, dir)
    ivfSearch(q, seedCentroids(q, nCells), probeCells, nProbes, k)
  }

  /** Deterministic seed sample: vec_ids 100..100+nCells-1 (clear of the
    * probe set). Centroids STAY a DataFrame — never collected to the
    * driver, never unrolled into per-row literal expressions — so the
    * plan is the same size at nCells=8 and nCells=64k.
    */
  private def seedCentroids(q: DataFrame, nCells: Int): DataFrame =
    q.filter(col("vec_id") >= 100 && col("vec_id") < 100 + nCells)
      .select((col("vec_id") - 100).as("c"), col("q").as("cq"), col("n2").as("c2"))

  /** exact integer distance of every vector to every centroid:
    * map-side broadcast expand (centroids are small relative to the
    * corpus — broadcasting THEM is legitimate), d2 = n2 + c2 - 2*dot
    */
  private def centroidDist(q: DataFrame, cen: DataFrame): DataFrame =
    q.crossJoin(broadcast(cen))
      .select(
        col("vec_id"),
        col("q"),
        col("n2"),
        col("c"),
        (col("n2") + col("c2") - lit(2L) * dotQ(col("q"), col("cq"))).as("d2")
      )

  /** IVF search against a centroid table: assign cells (argmin via
    * min_by — partial aggregation collapses the nCells-expanded rows
    * back to one per vector before any shuffle), probe the
    * `probeCells` nearest cells, exact in-cell top-k.
    */
  private def ivfSearch(q: DataFrame, cen: DataFrame, probeCells: Int, nProbes: Int, k: Int): DataFrame = {
    val dist = centroidDist(q, cen)
    val assigned = dist
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("c"), struct(col("d2"), col("c"))).as("cell"),
        first(col("q")).as("q"),
        first(col("n2")).as("n2")
      )
    // probes rank all cells and search the probeCells nearest; the
    // window runs over nProbes*nCells rows — trivially small
    val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("c").asc)
    val probes = dist
      .filter(col("vec_id") < nProbes)
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= probeCells)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("n2").as("pn2"), col("c").as("cell"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("cell").cast("long").as("cell"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("cell"),
        col("rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  // -------------------------------------------------------------------
  // 28c. ann_ivf_kmeans — IVF with a TRAINED coarse quantizer:
  // distributed Lloyd iterations refine the seed centroids before the
  // bucketed search. Each iteration is two shuffles (cell assignment
  // via broadcast argmin, then element-wise centroid means via
  // posexplode + partial-aggregable groupBy(cell, dim)); centroid
  // components are FLOOR-averaged integers ((sv - pmod(sv, n)) DIV n ==
  // SQL's floor division for any sign), so every iteration — and
  // therefore the final cell layout — is exactly reproducible in the
  // DuckDB oracle. Refinement tightens cells around the data, which is
  // what makes probeCells search recall hold as the corpus grows.
  // -------------------------------------------------------------------
  def annIvfKmeans(
      spark: SparkSession,
      dir: String,
      nCells: Int = 8,
      iters: Int = 2,
      probeCells: Int = 2,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    val q = quantized(spark, dir)
    var cen = seedCentroids(q, nCells)
    for (_ <- 0 until iters) {
      val assigned = centroidDist(q, cen)
        .groupBy(col("vec_id"))
        .agg(min_by(col("c"), struct(col("d2"), col("c"))).as("cell"))
      cen = q
        .join(assigned, Seq("vec_id"))
        .select(col("cell"), posexplode(col("q")).as(Seq("i", "v")))
        .groupBy(col("cell"), col("i"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .withColumn("cv", expr("(sv - pmod(sv, n)) DIV n")) // floor(sv / n), any sign
        .groupBy(col("cell").as("c"))
        .agg(transform(sort_array(collect_list(struct(col("i"), col("cv")))), p => p.getField("cv")).as("cq"))
        .withColumn("c2", norm2Q(col("cq")))
    }
    ivfSearch(q, cen, probeCells, nProbes, k)
  }

  // -------------------------------------------------------------------
  // 28d. ann_pq_search — PRODUCT QUANTIZATION + exact re-rank: the
  // memory-compression scale path. Vectors are unit-normalized (from
  // the exact integer norm, so normalization is order-free and
  // engine-reproducible), split into m=8 subspaces of 8 dims, and each
  // subspace quantizes to its nearest codebook entry (exact integer L2
  // argmin, codebook = deterministic corpus sample) — a 256-byte
  // vector becomes an 8-byte code. Search is the production two-stage
  // shape: (1) ASYMMETRIC DISTANCE COMPUTATION — the probe precomputes
  // its distance to every codebook entry (a tiny lookup table that
  // BROADCASTS) and shortlists the corpus by summed table lookups over
  // the codes alone; (2) EXACT cosine re-rank of the shortlist against
  // the full vectors. At 100 TB stage 1 scans 800 GB of codes instead
  // of 25 TB of floats, and stage 2 gathers only shortlist×probes
  // vectors. Normalized L2² = 2·(1−cos), so the shortlist chases the
  // same ordering the re-rank finalizes. Everything is integer-exact
  // (the one sqrt is IEEE-deterministic from an exact integer), so the
  // DuckDB oracle reproduces codes, lookup tables, and ranks
  // bit-for-bit; SimilaritySpec pins shortlist recall vs brute force.
  // -------------------------------------------------------------------
  /** the PQ model artifacts shared by [[annPqSearch]] and
    * [[pqDistortion]]: (subvecs, codebook, codes) — the normalized
    * sub-vector table, the Lloyd-trained per-subspace codebook, and
    * every vector's nearest-entry assignment
    */
  private[graft] def pqArtifacts(
      spark: SparkSession,
      dir: String,
      m: Int = 8,
      kCode: Int = 256,
      iters: Int = 3,
      trainN: Long = 1000L
  ): (DataFrame, DataFrame, DataFrame) = {
    val sub = 64 / m
    val q = quantized(spark, dir)
    // unit-normalize in micro units from the EXACT integer norm
    val qn = q
      .withColumn("sn", sqrt(col("n2").cast("double")))
      .select(
        col("vec_id"),
        transform(col("q"), x => round(x.cast("double") * lit(1000000.0) / col("sn")).cast("long"))
          .as("qn")
      )
    // (vec_id, mi, sv, sv2): the m sub-vectors of every normalized
    // vector, with the sub-vector norm precomputed ONCE — the K-way
    // expanded distance rows below must not each redo it. Repartition
    // + eager checkpoint: this frame feeds every training assign, the
    // encode pass, and the ADC table (≥5 consumers), and each consumer
    // expands it K-fold — computed from a single parquet file it would
    // expand inside ONE task per consumer; spread once, materialize
    // once.
    val subvecs = qn
      .select(
        col("vec_id"),
        posexplode(expr(s"transform(sequence(0, ${m - 1}), j -> slice(qn, j * $sub + 1, $sub))"))
          .as(Seq("mi", "sv"))
      )
      .withColumn("sv2", norm2Q(col("sv")))
      .repartition(col("vec_id"), col("mi"))
      .localCheckpoint(true)
    // seed codebook: sub-vectors of the deterministic sample (clear of
    // the probe set), one K-entry table per subspace
    val seedCb = subvecs
      .filter(col("vec_id") >= 100 && col("vec_id") < 100 + kCode)
      .select((col("vec_id") - 100).as("code"), col("mi"), col("sv").as("cv"))
      .withColumn("c2", norm2Q(col("cv")))
    // TRAINING SAMPLE: Lloyd refinement runs over the sub-vectors of a
    // deterministic id prefix, not the corpus — the production PQ
    // shape (train on a bounded sample once, encode everything). At
    // 100 TB the training cost is a constant while the encode pass
    // scales with the corpus; locally it keeps the K-way expanded
    // training joins sample-sized.
    val trainVecs = subvecs.filter(col("vec_id") < trainN)
    // assignment needs only the ARGMIN: d2 = sv2 + c2 - 2·dot and sv2
    // is constant per (vector, subspace), so ranking by c2 - 2·dot is
    // the same argmin (ties still break on code) with a third less
    // per-row work on the K-way expanded join — the hot path here
    def assign(over: DataFrame, cb: DataFrame): DataFrame = over
      .join(broadcast(cb), Seq("mi"))
      .select(
        col("vec_id"),
        col("mi"),
        col("code"),
        (col("c2") - lit(2L) * dotQ(col("sv"), col("cv"))).as("dk")
      )
      .groupBy(col("vec_id"), col("mi"))
      .agg(min_by(col("code"), struct(col("dk"), col("code"))).as("code"))
    // TRAIN the codebook: per-subspace Lloyd iterations with
    // floor-averaged integer components ((s - pmod(s, n)) DIV n ==
    // SQL's floor //), exactly as ann_ivf_kmeans trains its coarse
    // quantizer — so the refined codebook reproduces in the oracle.
    // Cells that attract no members drop out (both engines agree).
    // The trained codebook is localCheckpoint'd ONCE: its lineage
    // nests every iteration's sample-wide assign join, and the two
    // downstream consumers (the encode pass AND the ADC table) would
    // each re-execute the whole training chain without the cut. The
    // iterations themselves stay lazy inside one DAG — no per-round
    // job boundary.
    val codebook = (0 until iters)
      .foldLeft(seedCb) { (cb, _) =>
        assign(trainVecs, cb)
          .join(trainVecs, Seq("vec_id", "mi"))
          .select(col("mi"), col("code"), posexplode(col("sv")).as(Seq("i", "v")))
          .groupBy(col("mi"), col("code"), col("i"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .withColumn("cvi", expr("(s - pmod(s, n)) DIV n"))
          .groupBy(col("mi"), col("code"))
          .agg(
            transform(sort_array(collect_list(struct(col("i"), col("cvi")))), p => p.getField("cvi"))
              .as("cv")
          )
          .withColumn("c2", norm2Q(col("cv")))
      }
      .localCheckpoint(true)
    // PQ encode: per (vector, subspace) the nearest codebook entry by
    // exact integer L2 — min_by collapses the K-expanded rows map-side
    val codes = assign(subvecs, codebook)
    (subvecs, codebook, codes)
  }

  def annPqSearch(
      spark: SparkSession,
      dir: String,
      m: Int = 8,
      kCode: Int = 256,
      iters: Int = 3,
      trainN: Long = 1000L,
      shortlist: Int = 100,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    val q = quantized(spark, dir)
    val (subvecs, codebook, codes) = pqArtifacts(spark, dir, m, kCode, iters, trainN)
    val subDist =
      (col("sv2") + col("c2") - lit(2L) * dotQ(col("sv"), col("cv"))).as("d2")
    // ADC lookup table: probe-to-codebook distances (nProbes × m × K rows)
    val pd = subvecs
      .filter(col("vec_id") < nProbes)
      .join(broadcast(codebook), Seq("mi"))
      .select(col("vec_id").as("probe_id"), col("mi"), col("code"), subDist)
    val wShort = Window.partitionBy(col("probe_id")).orderBy(col("adist").asc, col("neighbor_id").asc)
    val short = codes
      .join(broadcast(pd), Seq("mi", "code"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("d2"))
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(sum(col("d2")).as("adist"))
      .withColumn("srnk", row_number().over(wShort))
      .filter(col("srnk") <= shortlist)
      .select(col("probe_id"), col("neighbor_id"))
    // exact re-rank of the shortlist on the ORIGINAL quantized vectors
    val probes = q
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("n2").as("pn2"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    short
      .join(q.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  // -------------------------------------------------------------------
  // 28e. ann_range_search — RANGE query: every neighbor above a cosine
  // threshold, not a fixed top-k (the dedup/link-discovery shape:
  // "give me all matches", unknown result size). Same bucketed plan as
  // ann_lsh_bucketed — probes broadcast, search touches bucket-mates
  // only — but the window/top-k stage disappears entirely: the
  // threshold is a scan-stage filter, so the plan has ZERO wide
  // operators after the bucket join. At 100 TB the result streams out
  // without ever ranking.
  // -------------------------------------------------------------------
  def annRangeSearch(
      spark: SparkSession,
      dir: String,
      nPlanes: Int = 4,
      nProbes: Int = 5,
      thresholdMicro: Long = 150000L
  ): DataFrame = {
    val q = quantized(spark, dir).withColumn("bucket", bucketExpr(nPlanes))
    val probes = q
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("n2").as("pn2"), col("bucket"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    q.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(
        col("probe_id"),
        col("vec_id").as("neighbor_id"),
        col("bucket"),
        round(cos * lit(1000000)).cast("long").as("cos_micro")
      )
      .filter(col("cos_micro") >= thresholdMicro)
  }

  // -------------------------------------------------------------------
  // 28. ann_lsh_bucketed — hyperplane-LSH bucketing + in-bucket exact
  // top-k. 4 planes -> 16 buckets here; at scale the plane count grows
  // with corpus size (buckets ~ corpus/expected-bucket-size) and the
  // in-bucket search stays constant-cost.
  // -------------------------------------------------------------------
  def annLshBucketed(spark: SparkSession, dir: String, nPlanes: Int = 4, nProbes: Int = 5, k: Int = 10): DataFrame = {
    val q = quantized(spark, dir).withColumn("bucket", bucketExpr(nPlanes))
    val probes = q
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("n2").as("pn2"), col("bucket"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("bucket"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("bucket"),
        col("rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  // -------------------------------------------------------------------
  // 28n. ann_lsh_multiprobe — MULTIPROBE LSH: each probe searches its
  // own bucket AND the nPlanes buckets at Hamming distance 1 (one sign
  // bit flipped) — the standard recall lever that beats adding hash
  // tables because the extra probes reuse the SAME corpus layout (no
  // new signatures, no rebucketing, just nPlanes+1 probe rows through
  // the identical equi-join). Candidate set strictly contains the
  // single-bucket search's (SimilaritySpec pins it); corpus-side cost
  // unchanged at any scale — the multiprobe explode is probe-side
  // only, 5×(nPlanes+1) rows.
  // -------------------------------------------------------------------
  def annLshMultiprobe(
      spark: SparkSession,
      dir: String,
      nPlanes: Int = 4,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    val q = quantized(spark, dir).withColumn("bucket", bucketExpr(nPlanes))
    val probes = q
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("n2").as("pn2"), col("bucket"))
      .withColumn(
        "pb",
        explode(
          expr(
            s"concat(array(bucket), transform(sequence(0, ${nPlanes - 1}), " +
              "j -> bucket ^ CAST(shiftleft(1, j) AS BIGINT)))"
          )
        )
      )
      .select(col("probe_id"), col("pq"), col("pn2"), col("pb").as("bucket"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  // -------------------------------------------------------------------
  // 28f. ann_ivfpq_search — IVF-PQ, the production vector-index
  // LAYOUT: a coarse quantizer partitions the corpus into cells, and
  // each vector stores only its cell id + the PQ code of its RESIDUAL
  // (vector − cell centroid). Residuals concentrate near zero, so the
  // same codebook budget quantizes them far tighter than raw vectors —
  // this is why every serious ANN system (IVF-ADC lineage) composes
  // the two stages rather than running PQ flat. Search: (1) rank cells
  // by centroid distance, probe the top few; (2) build the per-cell
  // ADC lookup table from the PROBE'S residual against the shared
  // codebook (nProbes × probeCells × m × K rows — broadcasts); (3)
  // score only vectors IN probed cells by summed table lookups over
  // their codes; (4) exact cosine re-rank of the shortlist. At 100 TB
  // the scan reads 9 bytes/vector (cell + code) for 1/nCells of the
  // corpus, the centroids and LUT are broadcast constants, and the
  // full-width vectors surface only for shortlist×probes rows. All
  // integer (micro-unit normalization, exact L2 argmins, ties on
  // code/cell), so the DuckDB oracle reproduces cells, residuals,
  // codes, tables, and ranks exactly; SimilaritySpec pins recall.
  // -------------------------------------------------------------------
  def annIvfPqSearch(
      spark: SparkSession,
      dir: String,
      nCells: Int = 8,
      probeCells: Int = 4,
      m: Int = 8,
      kCode: Int = 64,
      iters: Int = 3,
      trainN: Long = 500L,
      shortlist: Int = 100,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    val mdl = ivfPqModel(spark, dir, nCells, m, kCode, iters, trainN)
    ivfPqSearchTail(spark, dir, mdl, probeCells, m, shortlist, nProbes, k)
  }

  /** The three persistable artifacts of an IVF-PQ index. */
  private[graft] case class IvfPqModel(cen: DataFrame, cb: DataFrame, codes: DataFrame)

  /** micro-unit normalized vectors (exact integer norm): L2² on these
    * tracks cosine, so the ADC shortlist chases the re-rank's order
    */
  private def normalized(spark: SparkSession, dir: String): DataFrame =
    normalizedFrom(Tables.embeddings(spark, dir))

  /** The same normalization from any (vec_id, embedding) frame — the
    * entry point micro-batches use when new vectors arrive as a
    * stream rather than from the corpus table.
    */
  private[graft] def normalizedFrom(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), quantizeMicro(col("embedding")).as("q"))
      .withColumn("n2", norm2Q(col("q")))
      .withColumn("sn", sqrt(col("n2").cast("double")))
      .select(
        col("vec_id"),
        transform(col("q"), x => round(x.cast("double") * lit(1000000.0) / col("sn")).cast("long"))
          .as("qn")
      )
      .withColumn("qn2", norm2Q(col("qn")))

  /** INDEX BUILD: coarse cells (deterministic-sample centroids — the
    * trained variant is ann_ivf_kmeans's axis; the new machinery here
    * is the residual composition), Lloyd-refined residual codebook,
    * and the per-vector (cell, code⃗) assignment.
    */
  private def ivfPqModel(
      spark: SparkSession,
      dir: String,
      nCells: Int,
      m: Int,
      kCode: Int,
      iters: Int,
      trainN: Long
  ): IvfPqModel = ivfPqModelFrom(normalized(spark, dir), nCells, m, kCode, iters, trainN)

  /** Residual sub-vectors of `qn` against a given centroid table —
    * shared by full builds and by index APPEND (encoding new vectors
    * against a stored model).
    */
  private def residualSubvecs(qn: DataFrame, cen: DataFrame, m: Int): DataFrame = {
    val sub = 64 / m
    val cellDist = qn
      .crossJoin(broadcast(cen))
      .withColumn("d2", col("qn2") + col("c2") - lit(2L) * dotQ(col("qn"), col("cq")))
    // nearest cell + its centroid (needed for the residual) in one
    // map-side argmin — no window over the corpus
    val asg = cellDist
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cell"), col("cq")), struct(col("d2"), col("cell"))).as("a"))
      .join(qn, Seq("vec_id"))
      .select(
        col("vec_id"),
        col("a.cell").as("cell"),
        zip_with(col("qn"), col("a.cq"), (x, c) => x - c).as("r")
      )
    asg.select(
      col("vec_id"),
      col("cell"),
      posexplode(expr(s"transform(sequence(0, ${m - 1}), j -> slice(r, j * $sub + 1, $sub))"))
        .as(Seq("mi", "sv"))
    )
  }

  /** PQ-encode residual sub-vectors against a given codebook: exact
    * integer L2 argmin per subspace.
    */
  private def pqEncode(subvecs: DataFrame, cb: DataFrame): DataFrame =
    subvecs
      .join(broadcast(cb), Seq("mi"))
      .withColumn("d2", norm2Q(zip_with(col("sv"), col("cv"), (a, b) => a - b)))
      .groupBy(col("vec_id"), col("mi"))
      .agg(
        min_by(col("code"), struct(col("d2"), col("code"))).as("code"),
        first(col("cell")).as("cell")
      )

  private def ivfPqModelFrom(
      qn: DataFrame,
      nCells: Int,
      m: Int,
      kCode: Int,
      iters: Int,
      trainN: Long
  ): IvfPqModel = {
    val cen = qn
      .filter(col("vec_id") >= 100 && col("vec_id") < 100 + nCells)
      .select((col("vec_id") - 100).as("cell"), col("qn").as("cq"), col("qn2").as("c2"))
    val subvecs = residualSubvecs(qn, cen, m)
    // shared residual codebook: seeded from a deterministic sample
    // clear of both the probe set and the centroid seeds, then
    // Lloyd-REFINED over a bounded training sample (floor-averaged
    // integer components, exactly as ann_pq_search trains) — an
    // untrained residual codebook quantizes too coarsely for the ADC
    // shortlist to hold its recall. localCheckpoint cuts the
    // training lineage out of the encode and LUT consumers.
    val seedCb = subvecs
      .filter(col("vec_id") >= 200 && col("vec_id") < 200 + kCode)
      .select((col("vec_id") - 200).as("code"), col("mi"), col("sv").as("cv"))
    val trainVecs = subvecs.filter(col("vec_id") < trainN)
    val cb = (0 until iters)
      .foldLeft(seedCb) { (c, _) =>
        trainVecs
          .join(broadcast(c), Seq("mi"))
          .withColumn("d2", norm2Q(zip_with(col("sv"), col("cv"), (a, b) => a - b)))
          .groupBy(col("vec_id"), col("mi"))
          .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
          .join(trainVecs, Seq("vec_id", "mi"))
          .select(col("mi"), col("code"), posexplode(col("sv")).as(Seq("i", "v")))
          .groupBy(col("mi"), col("code"), col("i"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .withColumn("cvi", expr("(s - pmod(s, n)) DIV n"))
          .groupBy(col("mi"), col("code"))
          .agg(
            transform(sort_array(collect_list(struct(col("i"), col("cvi")))), p => p.getField("cvi"))
              .as("cv")
          )
      }
      .localCheckpoint(true)
    IvfPqModel(cen, cb, pqEncode(subvecs, cb))
  }

  /** SEARCH over an IVF-PQ model (in-memory or read back from a
    * persisted index — the two paths are byte-identical).
    */
  private def ivfPqSearchTail(
      spark: SparkSession,
      dir: String,
      mdl: IvfPqModel,
      probeCells: Int,
      m: Int,
      shortlist: Int,
      nProbes: Int,
      k: Int
  ): DataFrame = {
    val sub = 64 / m
    val q = quantized(spark, dir)
    val qn = normalized(spark, dir)
    val cb = mdl.cb
    val codes = mdl.codes
    // probed cells per probe + the probe's residual w.r.t. EACH
    // probed cell (the residual differs per cell — the per-cell LUT
    // is the IVF-PQ-specific piece)
    val probeDist = qn
      .filter(col("vec_id") < nProbes)
      .crossJoin(broadcast(mdl.cen))
      .withColumn("d2", col("qn2") + col("c2") - lit(2L) * dotQ(col("qn"), col("cq")))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cell").asc)
    val probeCellsDf = probeDist
      .withColumn("cr", row_number().over(wCell))
      .filter(col("cr") <= probeCells)
      .select(
        col("vec_id").as("probe_id"),
        col("cell"),
        zip_with(col("qn"), col("cq"), (x, c) => x - c).as("pr")
      )
    val lut = probeCellsDf
      .select(
        col("probe_id"),
        col("cell"),
        posexplode(expr(s"transform(sequence(0, ${m - 1}), j -> slice(pr, j * $sub + 1, $sub))"))
          .as(Seq("mi", "psv"))
      )
      .join(broadcast(cb), Seq("mi"))
      .select(
        col("probe_id"),
        col("cell"),
        col("mi"),
        col("code"),
        norm2Q(zip_with(col("psv"), col("cv"), (a, b) => a - b)).as("d2")
      )
    // ADC over probed cells only: the cell key in the join IS the
    // inverted-file restriction
    val wShort = Window.partitionBy(col("probe_id")).orderBy(col("adist").asc, col("neighbor_id").asc)
    val short = codes
      .join(broadcast(lut), Seq("cell", "mi", "code"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d2")).as("adist"))
      .withColumn("srnk", row_number().over(wShort))
      .filter(col("srnk") <= shortlist)
      .select(col("probe_id"), col("neighbor_id"))
    val probes = q
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("n2").as("pn2"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    short
      .join(q.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  /** Persist the IVF-PQ index: three parquet tables — centroids
    * (nCells rows), codebook (m×K rows), codes (9 bytes/vector of
    * information). This is the production build/search SPLIT: the
    * expensive model (training + corpus encode) is built once at
    * ingest and every query after it touches only the index tables.
    */
  def buildVectorIndex(
      spark: SparkSession,
      dir: String,
      outPath: String,
      nCells: Int = 8,
      m: Int = 8,
      kCode: Int = 64,
      iters: Int = 3,
      trainN: Long = 500L
  ): Unit = {
    val mdl = ivfPqModel(spark, dir, nCells, m, kCode, iters, trainN)
    mdl.cen.write.mode("overwrite").parquet(s"$outPath/centroids")
    mdl.cb.write.mode("overwrite").parquet(s"$outPath/codebook")
    // cell is the natural partition key: a probe reads probeCells
    // directories of codes, not the corpus
    mdl.codes.write.mode("overwrite").partitionBy("cell").parquet(s"$outPath/codes")
  }

  // -------------------------------------------------------------------
  // 28h. ann_index_search — search the PERSISTED index: build writes
  // centroids/codebook/codes to parquet (codes hive-partitioned BY
  // CELL, so the probed-cell restriction becomes partition pruning at
  // the file level), search reads ONLY the index tables + the
  // shortlist's full vectors. Must return byte-identical results to
  // the in-memory ann_ivfpq_search — same oracle — proving the index
  // roundtrip loses nothing. At 100 TB this split is the difference
  // between "every query pays training + encode" and "queries read a
  // few hundred MB of codes".
  // -------------------------------------------------------------------
  def annIndexSearch(
      spark: SparkSession,
      dir: String,
      probeCells: Int = 4,
      m: Int = 8,
      shortlist: Int = 100,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    // the production build/search split made literal: the index is a
    // SHARED template (built at most once per process — at 100 TB it
    // was built at ingest); the search is read-only, so no clone
    val out = vectorIndexTemplate(spark, dir)
    val mdl = IvfPqModel(
      spark.read.parquet(s"$out/centroids"),
      spark.read.parquet(s"$out/codebook"),
      spark.read.parquet(s"$out/codes")
    )
    ivfPqSearchTail(spark, dir, mdl, probeCells, m, shortlist, nProbes, k)
  }

  /** Shared persisted-index template ([[buildVectorIndex]] with its
    * defaults) — the read-only base for the index search drill and the
    * clone source for the mutating delete drill.
    */
  private[graft] def vectorIndexTemplate(spark: SparkSession, dir: String): String =
    graft.sources.TimeboxStore.sharedFixture("graft_vecidx", dir, "d") { p =>
      buildVectorIndex(spark, dir, p)
    }

  /** Shared appendable-base template ([[buildAppendBase]]) — the clone
    * source for the batch append drill and the streaming maintainer.
    */
  private[graft] def appendBaseTemplate(spark: SparkSession, dir: String, splitId: Long, m: Int = 8): String =
    graft.sources.TimeboxStore.sharedFixture("graft_vecidx_base", dir, s"s${splitId}_m$m") { p =>
      buildAppendBase(spark, dir, p, splitId, m)
    }

  // -------------------------------------------------------------------
  // 28g. ann_label_knn — FILTERED vector search: each probe's top-k
  // restricted to neighbors sharing its label (find same-class
  // near-neighbors — the dedup-within-language / retrieval-with-
  // predicate production shape). The filter is the JOIN KEY, not a
  // post-filter: probes broadcast keyed by label, so a candidate row
  // is touched only if it passes the predicate — a broadcast HASH
  // join, never a cross join, and the distance work scales with the
  // matching class, not the corpus. Post-filtering a plain top-k
  // would instead return < k rows whenever the filter thins the
  // neighborhood; pre-filtering is exact at any selectivity. At
  // 100 TB a label-partitioned layout turns the same plan into a
  // partition-pruned scan of one class.
  // -------------------------------------------------------------------
  def annLabelKnn(spark: SparkSession, dir: String, nProbes: Int = 5, k: Int = 10): DataFrame = {
    val q = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"), quantizeMicro(col("embedding")).as("q"))
      .withColumn("n2", norm2Q(col("q")))
    val probes = q
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("label"), col("q").as("pq"), col("n2").as("pn2"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("label"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("label"),
        col("neighbor_id"),
        col("rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  // -------------------------------------------------------------------
  // 28j. ann_index_append — index MAINTENANCE without retraining: the
  // index is built on the OLD half of the corpus only; new vectors are
  // then encoded against the STORED model (nearest existing cell +
  // existing residual codebook — the two reads are the whole model)
  // and appended into the cell-partitioned codes layout. Search over
  // the combined index. Because every training input (centroid seeds,
  // codebook seeds, Lloyd sample) lives in the old half, the appended
  // index is byte-identical to a full rebuild — same oracle as
  // ann_index_search, and SimilaritySpec pins the equality — while
  // the append pass touched ONLY the new vectors. At 100 TB this is
  // the difference between nightly retrains and a streaming-sized
  // encode job; codebook drift is monitored separately
  // (emb_norm_stats + residual envelopes) and triggers a real
  // retrain when it moves.
  // -------------------------------------------------------------------
  def annIndexAppend(
      spark: SparkSession,
      dir: String,
      splitId: Long = 400L,
      probeCells: Int = 4,
      m: Int = 8,
      shortlist: Int = 100,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    // the append MUTATES the codes layout — clone the shared old-half
    // base so the drill prices its subject (encode + append + search)
    val out = graft.sources.TimeboxStore.fixtureClone(
      appendBaseTemplate(spark, dir, splitId, m), "graft_vecidx_app", dir)
    appendToStoredIndex(spark, Tables.embeddings(spark, dir).filter(col("vec_id") >= splitId), out, m)
    searchStoredIndex(spark, dir, out, probeCells, m, shortlist, nProbes, k)
  }

  // -------------------------------------------------------------------
  // 28l. ann_index_delete — index DELETE without retraining, the third
  // leg of the index lifecycle (build / append / delete): vectors
  // leave the corpus (takedowns, dedup purges, retention) and their
  // CODES must leave the index, but the model — centroids + codebook,
  // trained before the delete — stays, exactly like the tombstone
  // deletes every production vector store runs between retrains. The
  // rewrite is PARTITION-PRUNED: only cells that actually contain a
  // deleted id are rewritten (dynamic partition overwrite of the
  // survivors); untouched cell directories are not read, not written.
  // At 100 TB a delete batch touches the handful of cells it lands
  // in, not the corpus. Search over the pruned index can never
  // return a deleted neighbor — the oracle (same IVF-PQ pipeline
  // with deleted codes excluded) value-checks exactly that.
  // -------------------------------------------------------------------
  def annIndexDelete(
      spark: SparkSession,
      dir: String,
      probeCells: Int = 4,
      m: Int = 8,
      shortlist: Int = 100,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    // the delete rewrites affected cell partitions — clone the shared
    // index template so the drill prices the tombstone rewrite + search
    val out = graft.sources.TimeboxStore.fixtureClone(
      vectorIndexTemplate(spark, dir), "graft_vecidx_del", dir)
    deleteFromStoredIndex(spark, out, col("vec_id") % 7 === 6)
    searchStoredIndex(spark, dir, out, probeCells, m, shortlist, nProbes, k)
  }

  /** Remove the codes of vectors matching `del` from a persisted
    * index, rewriting ONLY the cell partitions that contain a match:
    * survivors of affected cells are written back under dynamic
    * partition overwrite, every other cell directory stays untouched
    * on disk. The model tables are not read.
    */
  private[graft] def deleteFromStoredIndex(
      spark: SparkSession,
      out: String,
      del: org.apache.spark.sql.Column
  ): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val codes = spark.read.parquet(s"$out/codes")
      val affected = codes.filter(del).select(col("cell")).distinct()
      codes
        .join(broadcast(affected), Seq("cell"))
        .filter(!del)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Persist the appendable index base: model trained ONLY on the old
    * half (centroid seeds, codebook seeds, Lloyd sample all < splitId)
    * plus the old half's codes, cell-partitioned. Shared by the batch
    * append drill and the streaming index maintainer.
    */
  private[graft] def buildAppendBase(
      spark: SparkSession,
      dir: String,
      out: String,
      splitId: Long,
      m: Int = 8
  ): Unit = {
    val mdlOld =
      ivfPqModelFrom(normalized(spark, dir).filter(col("vec_id") < splitId), 8, m, 64, 3, splitId)
    mdlOld.cen.write.mode("overwrite").parquet(s"$out/centroids")
    mdlOld.cb.write.mode("overwrite").parquet(s"$out/codebook")
    mdlOld.codes.write.mode("overwrite").partitionBy("cell").parquet(s"$out/codes")
  }

  /** Encode a batch of NEW vectors against the STORED model (two tiny
    * reads — centroids + codebook — are the whole model) and append
    * their codes into the cell-partitioned layout. Row-local given the
    * model, so any batching of the same vectors appends the same codes.
    */
  private[graft] def appendToStoredIndex(
      spark: SparkSession,
      batch: DataFrame,
      out: String,
      m: Int = 8
  ): Unit = {
    val cen = spark.read.parquet(s"$out/centroids")
    val cb  = spark.read.parquet(s"$out/codebook")
    pqEncode(residualSubvecs(normalizedFrom(batch), cen, m), cb)
      .write.mode("append").partitionBy("cell").parquet(s"$out/codes")
  }

  /** Search a persisted index directory — byte-identical to searching
    * the in-memory model it was written from.
    */
  private[graft] def searchStoredIndex(
      spark: SparkSession,
      dir: String,
      out: String,
      probeCells: Int = 4,
      m: Int = 8,
      shortlist: Int = 100,
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame =
    ivfPqSearchTail(
      spark,
      dir,
      IvfPqModel(
        spark.read.parquet(s"$out/centroids"),
        spark.read.parquet(s"$out/codebook"),
        spark.read.parquet(s"$out/codes")
      ),
      probeCells,
      m,
      shortlist,
      nProbes,
      k
    )

  // -------------------------------------------------------------------
  // 32j. emb_norm_stats — embedding HYGIENE: the validation pass every
  // vector pipeline runs before indexing (bad upstream batches ship
  // zero vectors, truncated dims, or exploded norms; an index built
  // over them silently corrupts recall). Per label: vector count,
  // wrong-dimension count, zero-vector count, and the exact integer
  // squared-norm envelope (micro² units via the codegen'd long dot).
  // Row-local scoring + one partial-aggregable groupBy on the tiny
  // label key — nothing here changes shape at 100 TB.
  // -------------------------------------------------------------------
  def embNormStats(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    import graft.functions.VectorFunctions._
    Tables
      .embeddings(spark, dir)
      .select(
        col("label").cast("long").as("label"),
        size(col("embedding")).cast("long").as("vdim"),
        norm2Q(quantizeMicro(col("embedding"))).as("n2")
      )
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("vdim") =!= dim.toLong, 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("n2") === 0L, 1L).otherwise(0L)).as("n_zero"),
        min(col("n2")).as("min_n2"),
        max(col("n2")).as("max_n2")
      )
  }

  // -------------------------------------------------------------------
  // 28m. ann_recall_eval — index QUALITY EVALUATION as a first-class
  // query: recall@k of the IVF-PQ index against exact brute force, per
  // probe (n_hits in the intersection of the two top-k sets, recall in
  // basis points). This is the number an index owner tunes nCells/
  // probeCells/codebook size against; making it a query means the
  // evaluation itself is oracle-checked, not a notebook afterthought.
  // Composes the two existing pipelines; the intersection is a k-row
  // per-probe semi-join — cost is the two searches, the eval adds
  // nothing at scale.
  // -------------------------------------------------------------------
  def annRecallEval(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val truth  = annTopkBruteForce(spark, dir).select(col("probe_id"), col("neighbor_id"))
    val approx = annIvfPqSearch(spark, dir).select(col("probe_id"), col("neighbor_id"))
    val hits = truth
      .join(approx, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("hits"))
    truth
      .select(col("probe_id"))
      .distinct()
      .join(hits, Seq("probe_id"), "left")
      .withColumn("n_hits", coalesce(col("hits"), lit(0L)))
      .select(
        col("probe_id"),
        col("n_hits"),
        expr(s"n_hits * 10000 DIV $k").as("recall_bp")
      )
  }

  // -------------------------------------------------------------------
  // ann_knn_join — the k-NN JOIN: a corpus-scaled QUERY SET (every
  // 50th vector — 2% of the corpus, not a handful of probes) each
  // finds its top-k among the rest. This is the shape retrieval
  // augmentation and embedding-level cross-corpus dedup actually run,
  // and it changes the plan contract: the query side can NO LONGER
  // broadcast (it grows with the corpus), so both sides IVF-assign to
  // cells and meet in a cell-keyed SHUFFLE join — per-cell work is
  // |queries∩cell|·|cell|, bounded by the cell partition, never
  // corpus². Probing the top-2 cells bounds the fan-out at 2 rows per
  // query. At 100 TB nCells scales ~√N so cells stay partition-sized;
  // the per-query top-k is a query-partitioned rank window.
  // -------------------------------------------------------------------
  def annKnnJoin(
      spark: SparkSession,
      dir: String,
      nCells: Int = 8,
      probeCells: Int = 2,
      queryMod: Int = 50,
      k: Int = 5
  ): DataFrame = {
    val q    = quantized(spark, dir)
    val dist = centroidDist(q, seedCentroids(q, nCells))
    val assigned = dist
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("c"), struct(col("d2"), col("c"))).as("cell"),
        first(col("q")).as("q"),
        first(col("n2")).as("n2")
      )
    val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("c").asc)
    val queries = dist
      .filter(expr(s"vec_id % $queryMod = 0"))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= probeCells)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("n2").as("pn2"), col("c").as("cell"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w   = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned
      .join(queries, Seq("cell")) // no broadcast hint: the query side scales with the corpus
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  // -------------------------------------------------------------------
  // ann_knn_recall — the knn-JOIN's recall eval (the third leg of the
  // recall triptych next to ann_recall_eval and dedup_recall_eval):
  // exact brute-force top-k for a BOUNDED eval subset of the join's
  // query set, intersected with the join's own answers. The eval
  // probes are the query-set members under a fixed id horizon, so the
  // truth side is one corpus scan × a bounded broadcast at any corpus
  // size — the sampled-recall shape an index owner can afford weekly
  // at 100 TB, while the knn join itself stays corpus-scaled.
  // -------------------------------------------------------------------
  def annKnnRecall(
      spark: SparkSession,
      dir: String,
      queryMod: Int = 50,
      k: Int = 5,
      evalHorizon: Long = 2500L
  ): DataFrame = {
    val approx = annKnnJoin(spark, dir)
      .filter(col("probe_id") < evalHorizon)
      .select(col("probe_id"), col("neighbor_id"))
    val q = quantized(spark, dir)
    val probes = q
      .filter(expr(s"vec_id % $queryMod = 0") && col("vec_id") < evalHorizon)
      .toDF("probe_id", "pq", "pn2")
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    val truth = q
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"))
    val hits = truth
      .join(approx, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("hits"))
    truth
      .select(col("probe_id"))
      .distinct()
      .join(hits, Seq("probe_id"), "left")
      .withColumn("n_hits", coalesce(col("hits"), lit(0L)))
      .select(
        col("probe_id"),
        col("n_hits"),
        expr(s"n_hits * 10000 DIV $k").as("recall_bp")
      )
  }

  // -------------------------------------------------------------------
  // ann_cell_skew — IVF cell-occupancy diagnostics (the
  // graph_degree_dist analogue for vector cells): per-cell member
  // counts off the same deterministic seed-centroid assignment the
  // IVF family uses, with each cell's share and its load versus a
  // uniform spread (10000 bp = perfectly balanced). Skewed cells are
  // the stragglers of every cell-keyed search/join — this report is
  // what decides a re-train or a cell split. One corpus pass + an
  // nCells-row aggregate; the balance window runs on that bounded
  // domain, never on vectors.
  // -------------------------------------------------------------------
  def annCellSkew(spark: SparkSession, dir: String, nCells: Int = 8): DataFrame = {
    val q = quantized(spark, dir)
    val assigned = centroidDist(q, seedCentroids(q, nCells))
      .groupBy(col("vec_id"))
      .agg(min_by(col("c"), struct(col("d2"), col("c"))).as("cell"))
    assigned
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("total", sum(col("n_vecs")).over(Window.partitionBy()))
      .select(
        col("cell"),
        col("n_vecs"),
        expr("n_vecs * 10000 DIV total").as("share_bp"),
        expr(s"n_vecs * $nCells * 10000 DIV total").as("load_bp")
      )
  }

  // -------------------------------------------------------------------
  // emb_quantize_int8 — symmetric per-vector int8 scalar quantization
  // (the 4× storage cut every vector store ships): scale = 127/maxabs,
  // codes = ⌊x·127/maxabs⌋ — floor, not cast, because floor is exact
  // on IEEE doubles in both engines while DuckDB's CAST rounds.
  // Entirely ROW-LOCAL array math (transform/aggregate higher-order
  // functions — no explode, no shuffle at all beyond the scan), so at
  // 100 TB the operator is scan-bound. All-zero vectors carry no
  // scale and are filtered (none exist in this corpus; the filter is
  // the contract). Emits the code summary per vector: dim, scale in
  // micro, code sum/min/max, and the saturation count.
  // -------------------------------------------------------------------
  def embQuantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
      .filter(col("maxabs") > 0)
      // greatest(·, -127): for x within an ulp of -maxabs the two FP
      // roundings can land x·127/maxabs just below -127.0 and floor
      // would emit -128, breaking the symmetric [-127,127] code
      // contract (the positive side clamps naturally at 127). The
      // oracle clamps identically.
      .withColumn(
        "codes",
        expr("transform(v, x -> greatest(CAST(floor(x * 127.0 / maxabs) AS BIGINT), CAST(-127 AS BIGINT)))")
      )
      .select(
        col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        expr("CAST(floor(maxabs * 1000000) AS BIGINT)").as("maxabs_micro"),
        expr("aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_code"),
        expr("array_min(codes)").as("min_code"),
        expr("array_max(codes)").as("max_code"),
        expr("size(filter(codes, x -> x <= -127 OR x >= 127))").cast("long").as("n_sat")
      )
  }

  // -------------------------------------------------------------------
  // emb_label_centroids — label SEPARATION report in embedding space:
  // per label the centroid (milli units, integer DIV), its squared
  // distance to the GLOBAL centroid, and the nearest OTHER label with
  // its squared centroid distance — the "are these classes actually
  // separated" read a labeler/router publishes before anyone trusts
  // the labels. All integer arithmetic (milli quantize → sum → DIV →
  // squared diffs), bit-identical cross-engine. Scale shape: ONE
  // corpus pass (posexplode + partial-aggregable groupBy on the
  // |labels|·d key space); everything after runs on the ≤|labels|·d
  // centroid table with broadcast joins — |labels|² pair work is
  // bounded by the label enum, never the corpus.
  // -------------------------------------------------------------------
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables
      .embeddings(spark, dir)
      .select(
        col("label").cast("long").as("label"),
        posexplode(expr("transform(embedding, x -> CAST(round(x * 1000.0) AS BIGINT))")).as(Seq("i", "qi"))
      )
    val sl = x
      .groupBy(col("label"), col("i"))
      .agg(sum(col("qi")).as("s"), count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cl = sl.select(col("label"), col("i"), expr("s DIV n").as("c"), col("n"))
    val g = sl
      .groupBy(col("i"))
      .agg(expr("CAST(SUM(s) AS BIGINT) DIV CAST(SUM(n) AS BIGINT)").as("gc"))
    val dg = cl
      .join(broadcast(g), Seq("i"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"), sum(expr("(c - gc) * (c - gc)")).as("dist2_global"))
    val pair = cl
      .select(col("label").as("la"), col("i"), col("c").as("ca"))
      .join(broadcast(cl.select(col("label").as("lb"), col("i"), col("c").as("cb"))), Seq("i"))
      .filter(col("la") =!= col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum(expr("(ca - cb) * (ca - cb)")).as("d2"))
    val nearest = pair
      .groupBy(col("la"))
      .agg(min(struct(col("d2"), col("lb"))).as("m"))
      .select(col("la").as("label"), col("m.lb").as("nearest_label"), col("m.d2").as("dist2_nearest"))
    val out = dg
      .join(nearest, Seq("label"))
      .select(col("label"), col("n_vecs"), col("dist2_global"), col("nearest_label"), col("dist2_nearest"))
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(sl))
  }

  // -------------------------------------------------------------------
  // emb_pca_power — the TOP PRINCIPAL COMPONENT of the embedding
  // cloud by POWER ITERATION, entirely in exact integer arithmetic so
  // both engines replay it bit-for-bit: vectors quantize to milli
  // units, the centered scatter matrix is Σxᵢxⱼ − (Σxᵢ·Σxⱼ DIV n)
  // (the correction term integer-divided FIRST, keeping every cell
  // ~n·q² ≈ 2⁴¹ at sf1.0 — headroom to sf10 before long overflow),
  // and each
  // iteration renormalizes by the L∞ norm (v ← Cv·1000 DIV max|Cv|) —
  // integer DIV, no sqrt, same fixed-point-recursion discipline as
  // ts_kalman. Scale shape: the only corpus-sized pass is the scatter
  // accumulation — a row-LOCAL d² pair expansion (no self-join, no
  // shuffle of the corpus) feeding ONE partial-aggregable groupBy on
  // a d²-bounded key space (4096 cells at d=64); the iterations then
  // run on that 4096-row table with 64-row / 1-row broadcasts, cost
  // independent of corpus size. The d² explosion is d²·rows map-side
  // rows but map-side combine collapses every partition to ≤d² cells
  // — the same "aggregate, never join" shape as approx_cms.
  // -------------------------------------------------------------------
  def pcaPower(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val q = Tables
      .embeddings(spark, dir)
      .select(expr("transform(embedding, x -> CAST(round(x * 1000.0) AS BIGINT))").as("q"))
    // flat-long cell stream: the d² expansion emits ONE long per cell
    // (the flattened position IS the (i, j) key: pos = i·d + j) instead
    // of a 3-field struct per cell — no per-cell struct allocation, a
    // single-column int key through the exchange, same exact sums.
    // Grouping carries d so a mixed-dimension corpus can never alias
    // two different (i, j) cells onto one pos.
    val pair = q
      .select(
        size(col("q")).as("d"),
        posexplode(expr("flatten(transform(q, xi -> transform(q, xj -> xi * xj)))")).as(Seq("pos", "xx"))
      )
      .groupBy(col("pos"), col("d"))
      .agg(sum(col("xx")).as("p"))
      .select(
        (col("pos") / col("d")).cast("int").as("i"),
        (col("pos") % col("d")).cast("int").as("j"),
        col("p")
      )
    val s = q
      .select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy(col("i"))
      .agg(sum(col("qi")).as("s"))
      .persist(mem)
    val n = q.agg(count(lit(1)).as("n"))
    val cMat = pair
      .join(broadcast(s.select(col("i"), col("s").as("si"))), Seq("i"))
      .join(broadcast(s.select(col("i").as("j"), col("s").as("sj"))), Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), expr("p - (si * sj DIV n)").as("c"))
      .persist(mem)
    cMat.count()
    var v = s.select(col("i"), lit(1000L).as("v"))
    for (_ <- 1 to iters) {
      val w = cMat
        .join(broadcast(v.select(col("i").as("j"), col("v").as("vj"))), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(expr("c * vj")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = w.crossJoin(broadcast(m)).select(col("i"), expr("w * 1000 DIV greatest(m, 1L)").as("v"))
    }
    val out = v.select(col("i").cast("long").as("dim"), col("v").as("v_milli"))
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(s, cMat))
  }

  /** emb_matryoshka_eval — PREFIX-DIMENSION recall: exact top-k by
    * cosine over the first d components (d ∈ dims) scored against the
    * full-dimension truth — the matryoshka-representation question
    * ("how many dims can the index store before recall degrades?")
    * that prices every memory/recall trade at 100 TB: a 16-of-64
    * prefix index is 4× smaller, and this operator is the measured
    * evidence for whether that's free. Same exact-integer ladder as
    * [[annTopkBruteForce]]: quantized prefixes via `slice`, exact
    * integer dots/norms (zero-norm prefixes clamped greatest(·,1) —
    * identically in the oracle), IEEE-deterministic cosine, ties
    * broken by neighbor id. The d = max(dims) tier IS the truth, so
    * its rows pin recall = 10000 structurally. Scale shape: probes
    * broadcast (tiny by construction), corpus streams map-side once
    * per d; the only wide step is the per-(probe, d) top-k, k rows
    * each — no corpus shuffle anywhere.
    */
  def matryoshkaEval(
      spark: SparkSession,
      dir: String,
      dims: Seq[Int] = Seq(8, 16, 32, 64),
      nProbes: Int = 5,
      k: Int = 10
  ): DataFrame = {
    val q = quantized(spark, dir)
      .select(col("vec_id"), col("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def topkAt(d: Int): DataFrame = {
      val qd = q
        .select(col("vec_id"), slice(col("q"), 1, d).as("qd"))
        .withColumn("nd", greatest(norm2Q(col("qd")), lit(1L)))
      val probes = qd.filter(col("vec_id") < nProbes).toDF("probe_id", "pq", "pn2")
      val cos    = cosineQ(dotQ(col("pq"), col("qd")), col("pn2"), col("nd"))
      val w      = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
      qd.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col("probe_id"), col("neighbor_id"))
    }
    val truth = topkAt(dims.max).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perDim = dims
      .map(d => topkAt(d).withColumn("dims", lit(d.toLong)))
      .reduce(_.unionByName(_))
    val hits = perDim
      .join(truth, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id"), col("dims"))
      .agg(count(lit(1)).as("hits"))
    val base = truth
      .select(col("probe_id"))
      .distinct()
      .withColumn("dims", explode(typedlit(dims.map(_.toLong))))
    val out = base
      .join(hits, Seq("probe_id", "dims"), "left")
      .withColumn("n_hits", coalesce(col("hits"), lit(0L)))
      .select(
        col("probe_id"),
        col("dims"),
        col("n_hits"),
        expr(s"n_hits * 10000 DIV $k").as("recall_bp")
      )
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(q, truth))
  }

  /** emb_pq_distortion — PQ QUANTIZATION-ERROR ledger: per subspace,
    * the exact integer squared L2 between every sub-vector and its
    * assigned codebook entry — the codebook-quality number next to
    * [[annRecallEval]]'s recall (distortion is what Lloyd training
    * minimizes; a subspace whose mean distortion dwarfs the others is
    * where the codebook budget should move). Same trained model as
    * [[annPqSearch]] via [[pqArtifacts]]. Scale shape: one
    * codebook-broadcast join at the (vector, subspace) grain, ONE
    * partial-aggregable groupBy onto the m-row subspace enum.
    */
  def pqDistortion(spark: SparkSession, dir: String): DataFrame = {
    val (subvecs, codebook, codes) = pqArtifacts(spark, dir)
    codes
      .join(subvecs, Seq("vec_id", "mi"))
      .join(broadcast(codebook), Seq("mi", "code"))
      .select(
        col("mi"),
        (col("sv2") + col("c2") - lit(2L) * dotQ(col("sv"), col("cv"))).as("d2")
      )
      .groupBy(col("mi").cast("long").as("mi"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2")).as("sum_d2"), max(col("d2")).as("max_d2"))
      .withColumn("mean_d2", expr("sum_d2 DIV n_vecs"))
  }

  /** ann_recall_vs_nprobe — the IVF PROBE-BUDGET operating curve:
    * recall@k of the bucketed IVF search at probeCells ∈ {1,2,3,4}
    * against exact brute force, per (probe, budget). Every IVF
    * deployment tunes exactly this dial — probing more cells buys
    * recall linearly in scan cost, and this table is the measured
    * curve the budget is chosen from ([[annRecallEval]] scores ONE
    * configured point; this sweeps the dial). Same machinery as
    * [[annIvfBucketed]] run once per budget; candidates are
    * budget-nested by construction so recall is monotone in nprobe
    * (spec-pinned). Scale shape: per budget one centroid-broadcast
    * map pass + cell-pruned candidate scoring — the sweep is 4
    * independent bounded searches, never a corpus pair join.
    */
  def recallVsNprobe(
      spark: SparkSession,
      dir: String,
      budgets: Seq[Int] = Seq(1, 2, 3, 4),
      k: Int = 10
  ): DataFrame = {
    val truth = annTopkBruteForce(spark, dir)
      .select(col("probe_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perBudget = budgets
      .map(p =>
        annIvfBucketed(spark, dir, probeCells = p)
          .select(col("probe_id"), col("neighbor_id"))
          .withColumn("nprobe", lit(p.toLong))
      )
      .reduce(_.unionByName(_))
    val hits = perBudget
      .join(truth, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id"), col("nprobe"))
      .agg(count(lit(1)).as("hits"))
    val base = truth
      .select(col("probe_id"))
      .distinct()
      .withColumn("nprobe", explode(typedlit(budgets.map(_.toLong))))
    val out = base
      .join(hits, Seq("probe_id", "nprobe"), "left")
      .withColumn("n_hits", coalesce(col("hits"), lit(0L)))
      .select(col("probe_id"), col("nprobe"), col("n_hits"), expr(s"n_hits * 10000 DIV $k").as("recall_bp"))
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(truth))
  }

  /** emb_dim_variance — PER-DIMENSION variance ledger of the
    * embedding cloud: for each of the d dimensions, exact integer
    * moment sums over the quantized micro units (n, Σx, Σx²) and the
    * scale-free variance numerator n·Σx² − (Σx)², plus each
    * dimension's share of total variance in bp. This is the
    * diagnosis behind every dimension-truncation decision
    * ([[matryoshkaEval]] measures the recall consequence; this shows
    * WHY — which dims carry signal): flat-variance dims are free to
    * drop, and a dim with near-zero variance is wasting index bytes
    * corpus-wide. Scale shape: ONE partial-aggregable groupBy from a
    * row-local posexplode onto the d-row key space (map-side combine
    * collapses every partition to ≤ d rows); the share window runs
    * over that d-row table — never the corpus.
    */
  def dimVariance(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    quantized(spark, dir)
      .select(posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sum_q"),
        sum(col("x") * col("x")).as("sumsq_q")
      )
      // truncated-mean variance (the ts_ar_fit headroom discipline):
      // the n·Σx² − (Σx)² form overflows 2⁶³ already at sf0.1
      // (n·Σx² ≈ 5000·5e15); E[x²] − E[x]² in micro² stays ≤ 1e12
      // with the truncation identical in both engines
      .withColumn("var_micro2", expr("sumsq_q DIV n - (sum_q DIV n) * (sum_q DIV n)"))
      .withColumn("total_var", sum(col("var_micro2")).over(wAll))
      .withColumn("share_bp", expr("var_micro2 * 10000 DIV greatest(total_var, 1L)"))
      .select(col("dim"), col("n"), col("sum_q"), col("sumsq_q"), col("var_micro2"), col("share_bp"))
  }

  /** emb_cosine_histogram — the SIMILARITY BACKGROUND calibration:
    * the distribution of probe↔corpus cosines binned into 20
    * 0.1-wide buckets over [−1, 1], with each bucket's observed
    * min/max in micro. Every near-dup/contamination threshold
    * (dedup_embedding's 0.9, range search radii) is a cut through
    * exactly this histogram — the report shows where the unrelated-
    * pair noise floor sits so thresholds are set above it by
    * evidence rather than folklore. Exact integer dots/norms, the
    * bin from the micro-scaled cosine by integer floor-div (negatives
    * shifted first so DIV's toward-zero truncation can't straddle
    * zero differently across engines). Scale shape: probes broadcast,
    * corpus streams map-side, ONE partial-aggregable groupBy onto
    * ≤ 21 bins.
    */
  def cosineHistogram(spark: SparkSession, dir: String, nProbes: Int = 5): DataFrame = {
    val q      = quantized(spark, dir)
    val probes = q.toDF("probe_id", "pq", "pn2").filter(col("probe_id") < nProbes)
    val cosMicro = round(
      cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2")) * lit(1000000)
    ).cast("long")
    q.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(cosMicro.as("cos_micro"))
      .withColumn("bin", expr("(cos_micro + 1000000) DIV 100000"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_pairs"),
        min(col("cos_micro")).as("lo_micro"),
        max(col("cos_micro")).as("hi_micro")
      )
  }

  /** sign-binarize a quantized vector column `q` into two packed
    * 32-bit words (`lo` = dims 1–32, `hi` = dims 33–64) carried as
    * non-negative BIGINTs — the multi-word layout that generalizes to
    * d > 64 and keeps every shift inside signed-64 range (a single
    * 64-bit word would need bit 63, whose 1L<<63 is the sign bit and
    * whose DuckDB `<<` overflows). Shared by the Hamming search and
    * any future binary-code op.
    */
  private[graft] def signPack(lo: Int, hi: Int): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(
         |  transform(sequence($lo, $hi),
         |            j -> IF(element_at(q, j) > 0, shiftleft(CAST(1 AS BIGINT), j - $lo), CAST(0 AS BIGINT))),
         |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin
    )

  // -------------------------------------------------------------------
  // 27q. ann_hamming_search — BINARY-CODE similarity search: each
  // vector collapses to its 64-bit sign pattern (1 bit per dimension,
  // packed into two 32-bit words), and search ranks by Hamming
  // distance bit_count(xor) — the 32×-compression tier below int8 in
  // the quantization ladder (float32 256 B → int8 64 B → binary 8 B
  // per vector). Sign-of-micro-quantized is exact and engine-portable
  // (ties at 0 map to bit 0 on both sides), xor+bit_count are integer
  // ops, so ranks are deterministic. The probe side is a ≤nProbes-row
  // broadcast (the house ANN pattern); the corpus streams map-side,
  // codes are built row-locally, and the only wide step is the
  // per-probe top-k that AQE keeps to one small exchange. At 100 TB
  // the binary code table is what you'd actually scan — 8 bytes/vector
  // against 256 — with exact rerank on the shortlist (ann_refine
  // pattern); here the Hamming tier itself is the measured object.
  // -------------------------------------------------------------------
  def annHammingSearch(spark: SparkSession, dir: String, nProbes: Int = 5, k: Int = 10): DataFrame = {
    val codes = quantized(spark, dir)
      .select(col("vec_id"), signPack(1, 32).as("lo"), signPack(33, 64).as("hi"))
    val probes = codes
      .filter(col("vec_id") < nProbes)
      .toDF("probe_id", "plo", "phi")
    val ham = (expr("bit_count(lo ^ plo)") + expr("bit_count(hi ^ phi)")).cast("long")
    val w = Window.partitionBy(col("probe_id")).orderBy(col("ham").asc, col("neighbor_id").asc)
    codes
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), ham.as("ham"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"), col("ham"))
  }

  // -------------------------------------------------------------------
  // 27r. ann_hamming_rerank — the production TWO-STAGE search: a cheap
  // binary-code scan shortlists `shortlist` candidates per probe by
  // Hamming distance (8 bytes/vector — what the 100 TB first pass
  // actually reads), then the exact integer-dot cosine reranks ONLY
  // the shortlist (exact arithmetic touches shortlist·P rows, never
  // the corpus). Both ranks are emitted so the reorder is visible:
  // ham_rnk is where the binary tier had the neighbor, rnk is where
  // exact cosine puts it. Plan shape: one corpus pass builds codes
  // row-locally, the hamming window group-limits to the shortlist
  // BEFORE any dot product is evaluated, and the rerank window runs
  // over ≤ shortlist rows per probe.
  // -------------------------------------------------------------------
  def annHammingRerank(
      spark: SparkSession,
      dir: String,
      nProbes: Int = 5,
      shortlist: Int = 50,
      k: Int = 10
  ): DataFrame = {
    val base = quantized(spark, dir)
      .withColumn("lo", signPack(1, 32))
      .withColumn("hi", signPack(33, 64))
    val probes = base
      .filter(col("vec_id") < nProbes)
      .toDF("probe_id", "pq", "pn2", "plo", "phi")
    val ham = (expr("bit_count(lo ^ plo)") + expr("bit_count(hi ^ phi)")).cast("long")
    val wHam = Window.partitionBy(col("probe_id")).orderBy(col("ham").asc, col("neighbor_id").asc)
    val wCos = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    base
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), ham.as("ham"), col("q"), col("n2"), col("pq"), col("pn2"))
      .withColumn("ham_rnk", row_number().over(wHam).cast("long"))
      .filter(col("ham_rnk") <= shortlist)
      .withColumn("cos", cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2")))
      .withColumn("rnk", row_number().over(wCos).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rnk"), col("ham_rnk"), col("cos"))
  }

  // -------------------------------------------------------------------
  // 27t. emb_outlier_topk — embedding-cloud OUTLIERS: exact integer
  // squared L2 from the corpus centroid (true FLOOR average per dim —
  // micro components go negative, the pmod identity again), top-20 by
  // (d2 desc, vec_id asc). The embedding-QA read that surfaces broken
  // encodes, wrong-modality rows, and adversarial junk before they
  // poison a nearest-neighbor index. Scale shape: the centroid is a
  // d-row aggregate broadcast back (1 corpus pass), d2 is row-local,
  // and the top-20 is an orderBy+limit — TakeOrdered's bounded heap,
  // never a global sort or an unpartitioned rank window.
  // -------------------------------------------------------------------
  def embOutlierTopk(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val q = quantized(spark, dir)
    val cen = q
      .select(posexplode(col("q")).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .withColumn("cv", expr("(sv - pmod(sv, n)) DIV n")) // floor(sv / n), any sign
      .groupBy()
      .agg(transform(sort_array(collect_list(struct(col("i"), col("cv")))), p => p.getField("cv")).as("cq"))
      .withColumn("c2", norm2Q(col("cq")))
    val ranked = q
      .crossJoin(broadcast(cen))
      .select(
        col("vec_id"),
        (col("n2") + col("c2") - lit(2L) * dotQ(col("q"), col("cq"))).as("d2")
      )
      .orderBy(col("d2").desc, col("vec_id").asc)
      .limit(k)
    ranked
      .withColumn(
        "rnk",
        row_number()
          .over(Window.orderBy(col("d2").desc, col("vec_id").asc))
          .cast("long")
      )
      .select(col("vec_id"), col("rnk"), col("d2"))
  }

  // -------------------------------------------------------------------
  // 27s. ann_hamming_recall — the binary tier's measured operating
  // point (the recall-eval discipline: approximations publish their
  // own error): per probe, recall@10 of the RAW hamming top-10 and of
  // the RERANKED top-10 (hamming shortlist-50 → exact rerank) against
  // the exact cosine truth. The gap between the two columns is the
  // rerank's recovered recall — the number that justifies the
  // two-stage design.
  // -------------------------------------------------------------------
  def annHammingRecall(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val truth = annTopkBruteForce(spark, dir)
      .select(col("probe_id"), col("neighbor_id"))
    val raw = annHammingSearch(spark, dir)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("hit_raw"))
    val rr = annHammingRerank(spark, dir)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("hit_rr"))
    truth
      .join(raw, Seq("probe_id", "neighbor_id"), "left")
      .join(rr, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(
        sum(coalesce(col("hit_raw"), lit(0L))).as("n_hits_binary"),
        sum(coalesce(col("hit_rr"), lit(0L))).as("n_hits_rerank")
      )
      .withColumn("recall_binary_bp", expr(s"n_hits_binary * 10000 DIV ${k}L"))
      .withColumn("recall_rerank_bp", expr(s"n_hits_rerank * 10000 DIV ${k}L"))
  }

  // -------------------------------------------------------------------
  // ann_recall_vs_nplanes — the HYPERPLANE-BUDGET operating curve, the
  // LSH-rung sibling of ann_recall_vs_nprobe's IVF curve: recall@10 of
  // the single-bucket hyperplane search at 2/4/6 planes. More planes =
  // smaller buckets = cheaper scans but lower recall — this is the
  // measured trade behind the nPlanes every deployment hard-codes, and
  // together with the multiprobe variant it prices "fewer planes vs
  // more probes". One brute-force truth pass (bounded probe set),
  // one bucketed search per budget (probe side explodes, corpus-side
  // layout identical per leg), left-semi hit counting.
  // -------------------------------------------------------------------
  def recallVsNplanes(
      spark: SparkSession,
      dir: String,
      budgets: Seq[Int] = Seq(2, 4, 6),
      k: Int = 10
  ): DataFrame = {
    // k threads through BOTH legs — truth depth and per-budget search
    // depth — so the recall_bp denominator below always matches the
    // numerator's top-k (a k != 10 caller gets real recall, not a
    // silently-mislabeled one)
    val truth = annTopkBruteForce(spark, dir, k = k)
      .select(col("probe_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perBudget = budgets
      .map(p =>
        annLshBucketed(spark, dir, nPlanes = p, k = k)
          .select(col("probe_id"), col("neighbor_id"))
          .withColumn("nplanes", lit(p.toLong))
      )
      .reduce(_.unionByName(_))
    val hits = perBudget
      .join(truth, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id"), col("nplanes"))
      .agg(count(lit(1)).as("hits"))
    val base = truth
      .select(col("probe_id"))
      .distinct()
      .withColumn("nplanes", explode(typedlit(budgets.map(_.toLong))))
    val out = base
      .join(hits, Seq("probe_id", "nplanes"), "left")
      .withColumn("n_hits", coalesce(col("hits"), lit(0L)))
      .select(col("probe_id"), col("nplanes"), col("n_hits"), expr(s"n_hits * 10000 DIV $k").as("recall_bp"))
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(truth))
  }

  // -------------------------------------------------------------------
  // emb_centroid_drift — EMBEDDING-DISTRIBUTION DRIFT between two
  // snapshots: per label, how far did the class centroid move? The
  // monitor run when an embedding model is re-versioned or a feed
  // shifts — centroid movement is the cheap first-order alarm before
  // anyone re-runs a full eval. Snapshots are the deterministic vec_id
  // parity halves (standing in for "last week's index vs this week's");
  // vectors quantize to milli units and each half's centroid is the
  // per-dim integer floor mean (the emb_label_centroids discipline),
  // so drift² = Σ_d (cA_d − cB_d)² is exact cross-engine. Also pins
  // the WORST-moving dimension per label — the "which feature drifted"
  // pointer. Plan: one partial-aggregable groupBy onto the
  // (|labels| × 64-dim) key space with conditional half sums (the
  // halves never shuffle separately), then a per-label fold over that
  // bounded table. The corpus is scanned once; nothing pairs.
  // -------------------------------------------------------------------
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables
      .embeddings(spark, dir)
      .select(
        col("label").cast("long").as("label"),
        (col("vec_id") % 2L === 0L).as("in_a"),
        posexplode(expr("transform(embedding, x -> CAST(round(x * 1000.0) AS BIGINT))")).as(Seq("i", "qi"))
      )
      .groupBy(col("label"), col("i"))
      .agg(
        sum(when(col("in_a"), col("qi")).otherwise(0L)).as("sa"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("in_a"), 0L).otherwise(col("qi"))).as("sb"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("nb")
      )
      .select(
        col("label"),
        col("i"),
        col("na"),
        col("nb"),
        expr("sa DIV greatest(na, 1L)").as("ca"),
        expr("sb DIV greatest(nb, 1L)").as("cb")
      )
    dims
      .groupBy(col("label"))
      .agg(
        max(col("na")).as("n_a"),
        max(col("nb")).as("n_b"),
        sum(expr("(ca - cb) * (ca - cb)")).as("drift2_milli2"),
        max(struct(expr("abs(ca - cb)").as("d"), (-col("i").cast("long")).as("ni"))).as("w")
      )
      .select(
        col("label"),
        col("n_a"),
        col("n_b"),
        col("drift2_milli2"),
        (-col("w.ni")).as("worst_dim"),
        col("w.d").as("worst_delta_milli")
      )
  }

  // -------------------------------------------------------------------
  // 27u. ann_sq_search — SCALAR-QUANTIZED (SQ8) two-stage search, the
  // FAISS IndexScalarQuantizer ladder rung between binary codes
  // (ann_hamming_*) and PQ (ann_pq_search): each dimension maps to an
  // 8-bit code on its own corpus [min, max] range (code = trained
  // per-dim affine grid — 4x memory cut at far higher fidelity than
  // 1-bit signs), the shortlist ranks by ASYMMETRIC distance (exact
  // probe against dequantized codes — the ADC trick: the query side
  // never quantizes), and the exact rerank recovers true cosine order
  // on the survivors. Every quantize/dequantize is truncating integer
  // arithmetic on non-negative operands, so codes and dequantized
  // values are bit-identical cross-engine; the two float cosines ride
  // the house IEEE-deterministic exact-integer-input discipline.
  // Scale: the per-dim range table is 64 rows broadcast; code
  // assignment is one row-local map over the corpus; at 100 TB the
  // shortlist pass reads 1/4 the bytes of the exact index and the
  // exact tier touches only shortlist·probes rows.
  // -------------------------------------------------------------------
  def annSqSearch(
      spark: SparkSession,
      dir: String,
      nProbes: Int = 5,
      shortlist: Int = 30,
      k: Int = 10
  ): DataFrame = {
    val wCos = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    sqShortlistScored(spark, dir, nProbes, shortlist)
      .withColumn("rnk", row_number().over(wCos).cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("probe_id"),
        col("neighbor_id"),
        col("rnk"),
        col("sq_rnk"),
        round(col("cos") * lit(1000000)).cast("long").as("cos_micro")
      )
  }

  /** The SQ8 two-stage pipeline up to the exact-scored shortlist:
    * (probe_id, neighbor_id, sq_rnk, cos) for every shortlist member —
    * the prefix property (a depth-d shortlist is exactly the sq_rnk <=
    * d slice of a deeper run, the ranking being deterministic) is what
    * lets [[recallVsShortlist]] build the whole depth curve from ONE
    * run at max(depths) instead of re-running the ADC crossJoin and
    * the dequantized corpus per depth.
    */
  private def sqShortlistScored(
      spark: SparkSession,
      dir: String,
      nProbes: Int,
      shortlist: Int
  ): DataFrame = {
    val q    = quantized(spark, dir)
    val dims = q.select(col("vec_id"), posexplode(col("q")).as(Seq("i", "v")))
    val rng = dims
      .groupBy(col("i"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .withColumn("span", expr("greatest(hi - lo, 1L)"))
    val rebuilt = dims
      .join(broadcast(rng), Seq("i"))
      .withColumn("dq", expr("lo + ((((v - lo) * 255) DIV span) * span) DIV 255"))
      .groupBy(col("vec_id"))
      .agg(
        sort_array(collect_list(struct(col("i"), col("dq")))).as("p"),
        greatest(sum(col("dq") * col("dq")), lit(1L)).as("dn2")
      )
      .select(col("vec_id"), expr("transform(p, x -> x.dq)").as("dqv"), col("dn2"))
    val probes = q.filter(col("vec_id") < nProbes).toDF("probe_id", "pq", "pn2")
    val wSq    = Window.partitionBy(col("probe_id")).orderBy(col("acos").desc, col("neighbor_id").asc)
    rebuilt
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(
        col("probe_id"),
        col("vec_id").as("neighbor_id"),
        cosineQ(dotQ(col("pq"), col("dqv")), col("pn2"), col("dn2")).as("acos"),
        col("pq"),
        col("pn2")
      )
      .withColumn("sq_rnk", row_number().over(wSq).cast("long"))
      .filter(col("sq_rnk") <= shortlist)
      .join(q.toDF("neighbor_id", "nq", "nn2"), Seq("neighbor_id"))
      .withColumn("cos", cosineQ(dotQ(col("pq"), col("nq")), col("pn2"), col("nn2")))
      .select(col("probe_id"), col("neighbor_id"), col("sq_rnk"), col("cos"))
  }

  // -------------------------------------------------------------------
  // 27v. ann_recall_vs_shortlist — the SHORTLIST-DEPTH operating curve
  // for the SQ8 two-stage search (the ann_recall_vs_nprobe /
  // ann_recall_vs_nplanes discipline applied to the reranker's one
  // tunable): per probe and depth ∈ {10, 30, 50}, the recall of the
  // exact top-10 recovered after ADC-shortlist→exact-rerank. This is
  // the measured depth-vs-recall trade a deployment prices (depth
  // IS the exact-tier cost multiplier); the curve flattening at the
  // corpus' own noise floor is the signal to stop paying.
  // -------------------------------------------------------------------
  def recallVsShortlist(
      spark: SparkSession,
      dir: String,
      depths: Seq[Int] = Seq(10, 30, 50),
      k: Int = 10
  ): DataFrame = {
    val truth = annTopkBruteForce(spark, dir, k = k)
      .select(col("probe_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE shortlist run at max(depths): a depth-d shortlist is exactly
    // the sq_rnk <= d prefix of the deeper run (deterministic ADC
    // ranking), so each depth's rerank is a filter + rank over the
    // shared scored frame — the per-dim range table, dequantized
    // corpus, and crossJoin ADC pass are built once, not per depth
    val scored = sqShortlistScored(spark, dir, nProbes = 5, shortlist = depths.max)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wD = Window
      .partitionBy(col("probe_id"), col("depth"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val perDepth = scored
      .withColumn("depth", explode(typedlit(depths.map(_.toLong))))
      .filter(col("sq_rnk") <= col("depth"))
      .withColumn("rnk", row_number().over(wD))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("depth"))
    val hits = perDepth
      .join(truth, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id"), col("depth"))
      .agg(count(lit(1)).as("hits"))
    val base = truth
      .select(col("probe_id"))
      .distinct()
      .withColumn("depth", explode(typedlit(depths.map(_.toLong))))
    val out = base
      .join(hits, Seq("probe_id", "depth"), "left")
      .withColumn("n_hits", coalesce(col("hits"), lit(0L)))
      .select(col("probe_id"), col("depth"), col("n_hits"), expr(s"n_hits * 10000 DIV $k").as("recall_bp"))
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(truth, scored))
  }
}
