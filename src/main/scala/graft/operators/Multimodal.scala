package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Multimodal plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata alongside.
  *
  * The Spark-side machinery — schema, batch shape, partition-parallel
  * decode, chunk planning for object-store multipart layout — is real
  * and tested. The codec itself is a clearly-marked deterministic STUB
  * (this container has no image/audio libraries): swap
  * [[stubDecode]] for a real decoder without touching any plumbing.
  */
object Multimodal {

  // -------------------------------------------------------------------
  // 33. mm_binary_stats — the metadata pass every multimodal pipeline
  // starts with: byte length, content hashes, and a fixed-size chunk
  // plan (256-byte chunks here; multi-MB parts against an object store
  // in production). Row-local, zero shuffle.
  // -------------------------------------------------------------------
  def binaryStats(spark: SparkSession, dir: String, chunkBytes: Int = 256): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        expr("octet_length(text)").cast("long").as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha256_hex"),
        md5(col("text")).as("md5_hex"),
        expr(s"(octet_length(text) + ${chunkBytes - 1}) DIV $chunkBytes").cast("long").as("n_chunks"),
        sha2(substring(col("text"), 1, chunkBytes).cast("binary"), 256).as("first_chunk_sha")
      )

  // -------------------------------------------------------------------
  // 33n. mm_shard_plan — WEBDATASET-STYLE SHARD PACKING: assign each
  // asset to a training shard by greedy sequential fill per source
  // (deterministic ingest order = doc_id), targeting `shardBytes` per
  // shard — the layout step between a curated corpus and a dataloader
  // that streams whole shards. OFFSET-based assignment: shard_seq =
  // (bytes before me) DIV target, so an asset STRADDLING a boundary
  // stays in the shard it started in (a shard may overshoot by its
  // last asset, the overshoot eating the next shard's budget — unlike
  // the stateful reset-per-shard greedy, this is a pure window
  // expression, embarrassingly parallel, and resumable from byte
  // offsets alone; nothing splits). Report per shard: asset
  // count, bytes, the id range a resumable writer needs. Plan: one
  // running-sum window per source + one (source, shard) aggregate —
  // row-local packing, no pair work, the same shape at 100 TB where
  // this table IS the shard manifest.
  // -------------------------------------------------------------------
  def shardPlan(spark: SparkSession, dir: String, shardBytes: Long = 16384L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("doc_id"))
    Tables
      .documents(spark, dir)
      .select(col("source"), col("doc_id"), expr("octet_length(text)").cast("long").as("n_bytes"))
      .withColumn("cum_before", sum(col("n_bytes")).over(w) - col("n_bytes"))
      .withColumn("shard_seq", expr(s"cum_before DIV ${shardBytes}L"))
      .groupBy(col("source"), col("shard_seq"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc_id"),
        max(col("doc_id")).as("last_doc_id")
      )
  }

  // -------------------------------------------------------------------
  // 33j. mm_asset_dedup — ASSET-level content-addressed dedup
  // accounting, the storage-planning view above chunk-level dedup
  // (33c): per ingest source, how many whole payloads are distinct,
  // what the source pays in a GLOBAL CAS object store (bytes of the
  // shas whose canonical holder — min doc_id corpus-wide — lives in
  // this source), and the basis-point saving vs storing every copy.
  // One content-hash groupBy for canonicals + one per-source
  // aggregate; at 100 TB this table is what sizes the blob store and
  // shows which feed re-uploads the same assets.
  // -------------------------------------------------------------------
  def assetDedup(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        sha2(col("text").cast("binary"), 256).as("sha"),
        expr("octet_length(text)").cast("long").as("n_bytes")
      )
    val canon = a.groupBy(col("sha")).agg(min(col("doc_id")).as("canonical_doc"))
    a.join(canon, Seq("sha"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("sha")).as("n_unique"),
        sum(when(col("doc_id") === col("canonical_doc"), col("n_bytes")).otherwise(0L)).as("cas_bytes"),
        sum(when(col("doc_id") === col("canonical_doc"), 1L).otherwise(0L)).as("n_canonical")
      )
      .withColumn("savings_bp", expr("(total_bytes - cas_bytes) * 10000 DIV total_bytes"))
  }

  // -------------------------------------------------------------------
  // 33b. mm_chunk_table — materialize the multipart chunk table: one
  // row per fixed-size chunk with its offset and content hash, the
  // layout an object-store upload (or a chunk-level dedup pass) works
  // from. sequence+explode per doc — no driver involvement, chunk
  // count bounded per row.
  // -------------------------------------------------------------------
  def chunkTable(spark: SparkSession, dir: String, chunkBytes: Int = 256): DataFrame =
    chunksOf(Tables.documents(spark, dir), chunkBytes)

  /** Fixed-size chunk expansion shared by the batch chunk table and
    * the streaming CAS ingest (works on a streaming DataFrame too —
    * all row-local).
    */
  private[graft] def chunksOf(docs: DataFrame, chunkBytes: Int): DataFrame =
    docs
      .select(col("doc_id"), col("text"), expr("octet_length(text)").as("n_bytes"))
      .select(
        col("doc_id"),
        col("text"),
        // guard the empty payload: sequence(0, -1) would step BACKWARD
        // ([0, -1]) instead of yielding no chunks, so an n_bytes=0 doc
        // must map to an empty array explicitly (same pattern as
        // Dedup.shingles)
        explode(
          when(
            col("n_bytes") > 0,
            expr(s"sequence(0, CAST((n_bytes + ${chunkBytes - 1}) DIV $chunkBytes AS INT) - 1)")
          ).otherwise(expr("CAST(array() AS ARRAY<INT>)"))
        ).as("chunk_idx")
      )
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * chunkBytes).cast("long").as("offset"),
        expr(s"octet_length(substring(text, chunk_idx * $chunkBytes + 1, $chunkBytes))")
          .cast("long")
          .as("chunk_len"),
        sha2(expr(s"CAST(substring(text, chunk_idx * $chunkBytes + 1, $chunkBytes) AS BINARY)"), 256)
          .as("chunk_sha")
      )

  // -------------------------------------------------------------------
  // 33c. mm_chunk_dedup — content-defined storage dedup over the chunk
  // table: chunks whose hash appears in more than one document, with
  // occurrence counts and a canonical holder — what an object store
  // dedupes uploads against, and the binary-payload analogue of
  // dedup_exact. One shuffle on the chunk hash; counts are fully
  // partial-aggregable.
  // -------------------------------------------------------------------
  def chunkDedup(spark: SparkSession, dir: String, chunkBytes: Int = 256): DataFrame =
    chunkTable(spark, dir, chunkBytes)
      .groupBy(col("chunk_sha"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("canonical_doc")
      )
      .filter(col("n_docs") > 1)

  // -------------------------------------------------------------------
  // 33c2. mm_chunk_gc — CAS GARBAGE COLLECTION after takedowns: when
  // documents are deleted (here the deterministic doc_id % 17 == 0
  // takedown set, the dedup_store_delete convention), a
  // content-addressed chunk store cannot just delete their chunks —
  // a chunk lives as long as ANY live document references it. The GC
  // sweep is ONE chunk-sha groupBy over the reference table with two
  // conditional counts (live refs, deleted refs); a chunk is
  // reclaimable iff live_refs = 0. Per-source accounting (by the
  // chunk's canonical holder, the CAS owner-of-record): distinct
  // chunks, reclaimable chunks, reclaimed bytes, and still-pinned
  // chunks that a naive per-doc delete would have corrupted (deleted
  // canonical holder but live references elsewhere — the exact case
  // reference counting exists for). At 100 TB this sweep is the
  // storage bill: one shuffle at chunk grain, one at source grain.
  // -------------------------------------------------------------------
  def chunkGc(spark: SparkSession, dir: String, chunkBytes: Int = 256): DataFrame = {
    val refs = chunkTable(spark, dir, chunkBytes)
      .withColumn("deleted", (col("doc_id") % 17 === 0).cast("long"))
    val chunks = refs
      .groupBy(col("chunk_sha"))
      .agg(
        min(col("chunk_len")).as("chunk_len"),
        min(col("doc_id")).as("canonical_doc"),
        sum(lit(1) - col("deleted")).as("live_refs"),
        sum(col("deleted")).as("deleted_refs")
      )
    val canonSrc = Tables.documents(spark, dir).select(col("doc_id").as("canonical_doc"), col("source"))
    chunks
      .join(canonSrc, Seq("canonical_doc"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("live_refs") === 0, 1L).otherwise(0L)).as("n_gc_chunks"),
        sum(when(col("live_refs") === 0, col("chunk_len")).otherwise(0L)).as("gc_bytes"),
        sum(when(col("live_refs") > 0 && col("canonical_doc") % 17 === 0, 1L).otherwise(0L))
          .as("n_pinned_by_live_refs")
      )
  }

  // -------------------------------------------------------------------
  // 33e. mm_upload_plan — object-store upload batching: assign each
  // payload to a fixed-capacity upload bin per source by its exclusive
  // running byte total (bin = prefix_bytes DIV binBytes), so millions
  // of small payloads become bounded-size multipart batches. One
  // window pass per source; all integer.
  // -------------------------------------------------------------------
  def uploadPlan(spark: SparkSession, dir: String, binBytes: Long = 4096L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), expr("octet_length(text)").cast("long").as("n_bytes"))
      .withColumn("cum_bytes", sum(col("n_bytes")).over(w))
      .select(
        col("doc_id"),
        col("source"),
        col("n_bytes"),
        col("cum_bytes"),
        expr(s"(cum_bytes - n_bytes) DIV ${binBytes}L").as("bin_id")
      )
  }

  /** Decoded-asset schema a real decoder would emit per payload. */
  val decodedSchema: StructType = StructType(
    Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)
    )
  )

  /** STUB decoder — deterministic fake standing in for the image/audio
    * codec this container lacks. Derives "dimensions" and a 4-float
    * "feature" from the payload bytes so the plumbing (schema, batch
    * shape, per-partition parallelism) is fully exercised and
    * reproducible. Replace the body with e.g. a JNI/FFmpeg call; the
    * mapPartitions contract stays identical.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val checksum = payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffff)
    val width = 16 + (checksum % 64).toInt
    val height = 16 + ((checksum / 64) % 64).toInt
    val frames = 1 + (n % 4)
    val feature = Array(n.toFloat, width.toFloat, height.toFloat, (checksum % 1000).toFloat)
    (width, height, frames, feature)
  }

  // -------------------------------------------------------------------
  // 33d. mm_decode_index — the multimodal indexing pipeline end to
  // end: partition-parallel decode (stub codec, real mapPartitions
  // plumbing) → quantized feature vector → hyperplane-LSH bucket.
  // The stub's byte-fold checksum is deterministic, so the whole
  // decode→quantize→bucket chain is oracle-reproducible; swap the stub
  // for a real codec and only the feature values change, never the
  // indexing machinery. Decode is embarrassingly parallel; the bucket
  // assignment is row-local (broadcast-free) — zero shuffles.
  // -------------------------------------------------------------------
  def decodeIndex(spark: SparkSession, dir: String, nPlanes: Int = 4): DataFrame = {
    import graft.functions.{PortableHash, VectorFunctions}
    val payloads = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val planes = PortableHash.planeWeights(nPlanes, 4)
    val bucket = planes.zipWithIndex
      .map { case (w, p) =>
        when(VectorFunctions.dotQ(col("q"), typedlit(w)) > 0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)
    decodeAll(spark, payloads)
      .withColumn("q", VectorFunctions.quantizeMicro(col("feature")))
      .select(
        col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        bucket.cast("long").as("bucket")
      )
  }

  /** Partition-parallel decode over an opaque binary column: the
    * mapPartitions shape a real decoder plugs into (one codec init per
    * partition, streamed rows, no driver involvement).
    */
  def decodeAll(spark: SparkSession, payloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    payloads
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .mapPartitions { rows =>
        // real impl: initialize the codec ONCE here, per partition
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, f, feat) = stubDecode(payload)
          Row(r.getAs[Long]("doc_id"), payload.length.toLong, w, h, f, feat.toSeq)
        }
      }(enc)
  }

  // -------------------------------------------------------------------
  // 33g. mm_resize_plan — the RESIZE plan an image pipeline derives
  // from decoded dimensions before touching pixels: fit each asset
  // inside a target box preserving aspect ratio, all in exact integer
  // math (scale chosen by cross-multiplied comparison, output dims by
  // floor division, micro-scaled ratio recorded for the executor).
  // Row-local over the stub decode's deterministic dimensions — a real
  // decoder changes the numbers, never the plan.
  // -------------------------------------------------------------------
  def resizePlan(spark: SparkSession, dir: String, box: Int = 48): DataFrame = {
    // box=48 sits inside the stub decoder's 16..79 dimension range, so
    // the drill exercises fit, landscape-limited, and portrait-limited
    // branches; a production 224 box works identically
    val payloads = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    decodeAll(spark, payloads)
      .select(col("doc_id"), col("width").cast("long").as("width"), col("height").cast("long").as("height"))
      // limiting side by cross-multiplication (no division): width
      // limits iff width·box... both scale ratios are box/side; the
      // smaller ratio (larger side) wins
      .withColumn("fits", col("width") <= box && col("height") <= box)
      .withColumn(
        "out_w",
        when(col("fits"), col("width"))
          .when(col("width") >= col("height"), lit(box.toLong))
          .otherwise(expr(s"(width * $box) DIV height"))
      )
      .withColumn(
        "out_h",
        when(col("fits"), col("height"))
          .when(col("height") > col("width"), lit(box.toLong))
          .otherwise(expr(s"(height * $box) DIV width"))
      )
      .withColumn(
        "scale_micro",
        when(col("fits"), lit(1000000L))
          .when(col("width") >= col("height"), expr(s"(${box}L * 1000000) DIV width"))
          .otherwise(expr(s"(${box}L * 1000000) DIV height"))
      )
      .select(col("doc_id"), col("width"), col("height"), col("out_w"), col("out_h"), col("scale_micro"))
  }

  // -------------------------------------------------------------------
  // 33f. mm_frame_sample — the frame-sampling PLAN a video pipeline
  // derives before touching pixels: per asset, a deterministic uniform
  // sample of up to `samples` frame indices plus the byte seek range
  // each sampled frame occupies. The clip length is demuxer METADATA —
  // here derived from the stub decoder's deterministic dimensions
  // ((width−16) + 64·(height−16) ≡ checksum mod 4096, so the oracle
  // recomputes it from the same byte fold); a real demuxer would
  // return it and nothing else changes. Uniform sampling in exact
  // integers: j·v DIV min(S, v) for j < min(S, v) — strictly
  // increasing when v ≥ S, the identity when v < S. One explode of a
  // bounded sequence per asset; row-local, zero shuffle.
  // -------------------------------------------------------------------
  def frameSamplePlan(spark: SparkSession, dir: String, samples: Int = 8): DataFrame = {
    val payloads = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    decodeAll(spark, payloads)
      .withColumn("vframes", expr("CAST(1 + ((width - 16) + 64 * (height - 16)) % 120 AS BIGINT)"))
      .withColumn("n_samples", least(lit(samples.toLong), col("vframes")))
      .select(
        col("doc_id"),
        col("n_bytes"),
        col("vframes"),
        col("n_samples"),
        explode(expr("sequence(0L, n_samples - 1)")).as("sample_ord")
      )
      .withColumn("frame_idx", expr("(sample_ord * vframes) DIV n_samples"))
      .withColumn("frame_bytes", expr("n_bytes DIV vframes"))
      .select(
        col("doc_id"),
        col("sample_ord"),
        col("frame_idx"),
        col("vframes"),
        (col("frame_idx") * col("frame_bytes")).as("frame_offset"),
        // the last frame absorbs the remainder of the equal byte split
        expr("frame_bytes + IF(frame_idx = vframes - 1, n_bytes % vframes, 0L)").as("frame_len")
      )
  }

  // -------------------------------------------------------------------
  // 33i. mm_chunk_restore — the INTEGRITY proof for the chunk layout:
  // reassemble every payload from its chunks (ordered concat) and
  // verify the restored bytes hash-match the original — the end-to-end
  // check an object-store restore path runs before anyone trusts the
  // multipart layout with deletes. One explode + one groupBy per doc
  // (chunk count bounded per row); the comparison is sha-256 on both
  // sides, so a single out-of-order or truncated chunk fails loudly.
  // -------------------------------------------------------------------
  def chunkRestore(spark: SparkSession, dir: String, chunkBytes: Int = 256): DataFrame = {
    val cb = chunkBytes
    // Chunking happens in HEX space (2 hex chars = 1 byte) so the
    // boundaries are BYTE offsets, not character offsets — for
    // multibyte text a char-based substring would inflate n_chunks
    // (trailing empty chunks) and never exercise true byte-range
    // reassembly. Hex is injective, so sha-256 over the hex string is
    // the same integrity proof as sha-256 over the raw bytes, and is
    // engine-portable (no blob-hash signature differences).
    val hx = 2 * cb
    val re = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        lower(hex(col("text").cast("binary"))).as("body_hex"),
        expr("octet_length(text)").as("n_bytes")
      )
      .filter(col("n_bytes") > 0)
      .select(
        col("doc_id"),
        col("body_hex"),
        explode(expr(s"sequence(0, CAST((n_bytes + ${cb - 1}) DIV $cb AS INT) - 1)")).as("chunk_idx")
      )
      .select(
        col("doc_id"),
        col("chunk_idx"),
        expr(s"substring(body_hex, chunk_idx * $hx + 1, $hx)").as("chunk_hex")
      )
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        expr("array_join(transform(sort_array(collect_list(struct(chunk_idx, chunk_hex))), p -> p.chunk_hex), '')")
          .as("reassembled_hex")
      )
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), sha2(lower(hex(col("text").cast("binary"))), 256).as("orig_sha"))
      .join(re, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        col("orig_sha"),
        sha2(coalesce(col("reassembled_hex"), lit("")), 256).as("restored_sha")
      )
      .withColumn("intact", when(col("orig_sha") === col("restored_sha"), 1L).otherwise(0L))
  }

  // -------------------------------------------------------------------
  // 33h. mm_modality_route — container sniffing: route each opaque
  // payload to its decode queue by MAGIC BYTES (the first thing any
  // mixed-modality ingest does — upstream content-type headers lie).
  // The sniff inspects the payload's leading bytes for real container
  // signatures: JPEG (ff d8 ff), PNG (89 50 4e 47), RIFF/WAVE (52 49
  // 46 46 .. 57 41 56 45 at byte 8), ISO-BMFF/MP4 (66 74 79 70 'ftyp'
  // at byte 4); anything unsigned falls through to the text queue.
  // Header synthesis is the deterministic STUB (this container ships
  // no media files): each doc is prefixed with one of four REAL magic
  // headers — or none — chosen by a content hash. The router below
  // never looks at that choice, only at the bytes. The whole pass is
  // row-local in hex-string space (byte-exact across engines), zero
  // shuffles, codegen-friendly.
  // -------------------------------------------------------------------
  def modalityRoute(spark: SparkSession, dir: String): DataFrame = {
    // real signatures: JPEG/JFIF, PNG, RIFF....WAVE, MP4 ftyp isom
    val magics = Seq(
      "ffd8ffe000104a464946",
      "89504e470d0a1a0a",
      "52494646aabbccdd57415645",
      "000000186674797069736f6d",
      "" // bare payload, no container
    )
    val magicArr = array(magics.map(lit): _*)
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        expr("CAST(conv(substring(md5(text), 1, 1), 16, 10) AS BIGINT) % 5").as("k"),
        lower(hex(col("text").cast("binary"))).as("body_hex")
      )
      .select(
        col("doc_id"),
        concat(element_at(magicArr, (col("k") + 1).cast("int")), col("body_hex")).as("ph")
      )
      .withColumn(
        "container",
        when(col("ph").startsWith("ffd8ff"), "jpeg")
          .when(col("ph").startsWith("89504e47"), "png")
          .when(col("ph").startsWith("52494646") && substring(col("ph"), 17, 8) === "57415645", "wav")
          .when(substring(col("ph"), 9, 8) === "66747970", "mp4")
          .otherwise("raw_text")
      )
      .withColumn(
        "modality",
        when(col("container").isin("jpeg", "png"), "image")
          .when(col("container") === "wav", "audio")
          .when(col("container") === "mp4", "video")
          .otherwise("text")
      )
      .select(
        col("doc_id"),
        (length(col("ph")) / 2).cast("long").as("n_bytes"),
        col("container"),
        col("modality"),
        when(col("modality") === "image", "img-decode")
          .when(col("modality") === "audio", "audio-decode")
          .when(col("modality") === "video", "frame-sample")
          .otherwise("tokenize")
          .as("queue")
      )
  }

  /** mm_modal_mix_plan — the MODALITY MIX planner: per modality (off
    * [[modalityRoute]]'s magic-byte classification), document/byte
    * counts, the corpus share, and the keep rate that would rebalance
    * toward a uniform modality mix (keep = min_n/n — the
    * pipeline_mix_plan pattern applied to modalities instead of
    * sources). This is the multimodal curriculum decision: a corpus
    * that is 95% text trains a text model; the plan says what to
    * down-sample to change that. Scale shape: the route pass is
    * row-local, then ONE partial-aggregable groupBy onto the ≤5
    * modality enum; the share/min windows run over that enum table.
    */
  def modalMixPlan(spark: SparkSession, dir: String): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    modalityRoute(spark, dir)
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("n_bytes"))
      .withColumn("total", sum(col("n_docs")).over(wAll))
      .withColumn("min_n", min(col("n_docs")).over(wAll))
      .withColumn("share_bp", expr("n_docs * 10000 DIV total"))
      .withColumn("keep_bp", expr("min_n * 10000 DIV n_docs"))
      .select(col("modality"), col("n_docs"), col("n_bytes"), col("share_bp"), col("keep_bp"))
  }

  // -------------------------------------------------------------------
  // 33m. mm_aspect_bucket — ASPECT-RATIO BUCKETING, the batch planner
  // every image-training pipeline runs before batching: images in one
  // batch must share an output shape, so each asset is assigned to the
  // NEAREST of a fixed aspect-ratio ladder (portrait 1:4 … landscape
  // 4:1, in exact bp = w·10000 DIV h; tie → the smaller/portrait
  // bucket) and per-bucket batch books are derived (full batches of
  // `batch`, the remainder reported as dropped — the padding-vs-drop
  // decision needs the number either way). Assignment is ROW-LOCAL
  // (array_min over a 7-struct literal ladder — no join), the only
  // shuffle is the partial-aggregable groupBy onto the ≤7-bucket enum;
  // at 100 TB this is one scan + a 7-row report. Dimensions come from
  // the stub decode (deterministic, oracle-reproducible); a real
  // decoder changes the numbers, never the plan.
  // -------------------------------------------------------------------
  def aspectBucket(spark: SparkSession, dir: String, batch: Int = 32): DataFrame = {
    val ladder = Seq(2500L, 5000L, 7500L, 10000L, 13333L, 20000L, 40000L)
    val payloads = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val nearest =
      s"""array_min(transform(array(${ladder.map(_ + "L").mkString(", ")}),
         |  b -> named_struct('d', abs(ratio_bp - b), 'b', b))).b""".stripMargin
    decodeAll(spark, payloads)
      .select(col("doc_id"), col("width").cast("long").as("width"), col("height").cast("long").as("height"))
      .withColumn("ratio_bp", expr("(width * 10000) DIV height"))
      .withColumn("bucket_bp", expr(nearest))
      .groupBy(col("bucket_bp"))
      .agg(
        count(lit(1)).as("n_assets"),
        min(col("ratio_bp")).as("lo_ratio_bp"),
        max(col("ratio_bp")).as("hi_ratio_bp")
      )
      .withColumn("n_batches", expr(s"n_assets DIV ${batch}L"))
      .withColumn("n_dropped", expr(s"n_assets % ${batch}L"))
      .select(
        col("bucket_bp"),
        col("n_assets"),
        col("n_batches"),
        col("n_dropped"),
        col("lo_ratio_bp"),
        col("hi_ratio_bp")
      )
  }

  // -------------------------------------------------------------------
  // mm_frame_dedup — SHARED-SEGMENT detection across video assets: the
  // "same intro/outro/channel-chrome in a thousand uploads" audit a
  // video pipeline runs before paying for per-frame embeddings. Each
  // payload slices into its frame grid (vframes = 1 + len % 24 — the
  // stub's deterministic frame count; a real demuxer changes the
  // numbers, never the plan), frames fingerprint by md5 OF THE ACTUAL
  // BYTES (content addressing, the mm_asset_dedup discipline one level
  // down), and a frame shared by ≥2 assets is chrome. Per asset: frame
  // count, shared-frame count, shared share in bp. Plan: the slicing
  // explode is row-local (≤24 frames/asset, bounded); the only
  // shuffles are the frame-hash document-frequency groupBy and the
  // per-asset rollup — both partial-aggregable; trailing remainder
  // bytes (len − vframes·frame_len < vframes) are dropped from every
  // asset identically, so the fingerprint domain is well-defined.
  // -------------------------------------------------------------------
  def frameDedup(spark: SparkSession, dir: String): DataFrame = {
    val frames = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("len"))
      .filter(col("len") >= 24L)
      .withColumn("vf", expr("1L + len % 24"))
      .withColumn("flen", expr("len DIV vf"))
      .select(
        col("doc_id"),
        col("vf"),
        explode(expr("sequence(0L, vf - 1)")).as("i"),
        expr("md5(substring(text, CAST(i * flen + 1 AS INT), CAST(flen AS INT)))").as("h")
      )
    val df = frames
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    frames
      .join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(when(col("df") >= 2L, 1L).otherwise(0L)).as("n_shared")
      )
      .select(
        col("doc_id"),
        col("n_frames"),
        col("n_shared"),
        expr("(n_shared * 10000) DIV n_frames").as("shared_bp")
      )
  }

  // -------------------------------------------------------------------
  // 33p. mm_ahash_neardup — PERCEPTUAL near-duplicate detection by
  // AVERAGE HASH (the aHash of the pHash/aHash/dHash family): each
  // asset downsamples to 64 deterministic "pixels" (byte samples at
  // positions 1 + ⌊i·n/64⌋ — the stand-in for the real 8×8 grayscale
  // resize, which plugs in where a codec exists), the 64-bit code sets
  // bit i when pixel_i exceeds the asset's own pixel mean, and the
  // report is the per-asset NEAR-DUP LEDGER: code words + banded
  // candidate count + neighbors within Hamming radius 6. The code
  // rides TWO 32-bit words (the ann_hamming sign-pack discipline — no
  // 1<<63 signed-overflow edge on any engine); candidates come from 4
  // × 16-bit bands (the LSH OR-construction — pigeonhole makes band
  // recall EXACT for radius ≤ 3 and probabilistic above it, the same
  // documented trade as every banded matcher here). Hash + code are
  // row-local (zero shuffle until banding); the band join fans out
  // per band bucket, never corpus²; production reuses the LSH
  // family's capped-bucket discipline when a degenerate
  // (constant-pixel) corpus makes a band hot.
  // -------------------------------------------------------------------
  def ahashNearDup(spark: SparkSession, dir: String, maxHam: Int = 6): DataFrame = {
    val codes = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
      .withColumn(
        "pxs",
        expr(
          "transform(sequence(0, 63), i -> CAST(ascii(substring(text, CAST(1 + (i * n) DIV 64 AS INT), 1)) AS BIGINT))"
        )
      )
      .withColumn("mean_p", expr("aggregate(pxs, CAST(0 AS BIGINT), (a, x) -> a + x) DIV 64"))
      .withColumn(
        "lo",
        expr(
          "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (a, i) -> a + IF(pxs[i] > mean_p, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
        )
      )
      .withColumn(
        "hi",
        expr(
          "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (a, i) -> a + IF(pxs[i + 32] > mean_p, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
        )
      )
      .select(col("doc_id"), col("lo"), col("hi"))
    val bands = codes
      .withColumn("b", explode(typedlit(Seq(0L, 1L, 2L, 3L))))
      .withColumn(
        "sig",
        expr("CASE WHEN b < 2 THEN shiftright(lo, CAST(b * 16 AS INT)) & 65535 ELSE shiftright(hi, CAST((b - 2) * 16 AS INT)) & 65535 END")
      )
    val pairs = bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.b") === col("b.b") && col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id")
      )
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("a.lo").as("la"),
        col("a.hi").as("ha"),
        col("b.lo").as("lb"),
        col("b.hi").as("hb")
      )
      .distinct()
      .withColumn("close", expr(s"IF(bit_count(la ^ lb) + bit_count(ha ^ hb) <= $maxHam, 1L, 0L)"))
    val perDoc = pairs
      .select(col("doc_a").as("doc_id"), col("close"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"), col("close")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("cand"), sum(col("close")).as("nc"))
    codes
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("lo"),
        col("hi"),
        coalesce(col("cand"), lit(0L)).as("n_cand"),
        coalesce(col("nc"), lit(0L)).as("n_close")
      )
  }

  // -------------------------------------------------------------------
  // 33q. mm_scene_split — SCENE-BOUNDARY detection over a video
  // asset's frame run (the shot-change pass a video curation pipeline
  // runs before sampling training frames): the payload splits into
  // fixed 32-byte frames (mm_frame_dedup's frame convention), each
  // frame summarizes to a mean "brightness" (8 sampled bytes, stride
  // 4 — the 1-D stand-in for the histogram a real decoder feeds), and
  // a scene boundary fires where consecutive frame means jump by more
  // than the threshold — exactly the histogram-difference scene
  // detector, in integers. Report per asset: frames, scenes, the
  // longest scene, mean scene length (centi-frames). Frame expansion
  // is row-local; the lag + segment windows partition per asset.
  // -------------------------------------------------------------------
  def sceneSplit(spark: SparkSession, dir: String, flen: Int = 32, thr: Long = 2L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy(col("i"))
    val frames = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text"), expr(s"length(text) DIV $flen").cast("long").as("nf"))
      .filter(col("nf") >= 1L)
      .select(col("doc_id"), col("text"), posexplode(expr("sequence(0L, nf - 1)")).as(Seq("i", "fi")))
      .withColumn(
        "mean_b",
        expr(
          (0 until 8)
            .map(j => s"ascii(substring(text, CAST(fi * $flen + 1 + $j * 4 AS INT), 1))")
            .mkString("(", " + ", s") DIV 8")
        ).cast("long")
      )
      .select(col("doc_id"), col("fi").as("i"), col("mean_b"))
    val seg = frames
      .withColumn("prev", lag(col("mean_b"), 1).over(w))
      .withColumn(
        "brk",
        when(col("prev").isNull || abs(col("mean_b") - col("prev")) > thr, 1L).otherwise(0L)
      )
      .withColumn(
        "seg",
        sum(col("brk")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        )
      )
    seg
      .groupBy(col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("sc_n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("sc_n")).as("n_frames"), count(lit(1)).as("n_scenes"), max(col("sc_n")).as("longest_scene"))
      .withColumn("scene_len_centi", expr("n_frames * 100 DIV n_scenes"))
  }
}
