package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Canonical readers for the engine's tables.
  *
  * All reads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown freedom (predicate pushdown, column pruning, partition
  * pruning at cluster scale). Never cache here — callers decide.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Canonicalize the events `ts` column to epoch-NANO longs whatever
    * the file's physical type is. Shipped testdata has carried BOTH
    * encodings across rounds: TIMESTAMP(NANOS) int64 (read as long
    * under nanosAsLong) and plain timestamp[us] (read as
    * TIMESTAMP_NTZ). Downstream operators all assume the integer nano
    * domain (`ts DIV 1000` → micros), so the ingest edge is the one
    * place the physical type may vary — the row-local conversion
    * keeps pushdown freedom (a ts range predicate still prunes on the
    * cast column's stats) and costs one codegen'd projection.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    if (df.schema.fieldNames.contains("ts") && df.schema("ts").dataType != LongType)
      // NTZ → session-UTC instant → epoch micros → nanos
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    else df

  /** Fail-loud pre-epoch guard for WATERMARK-filtered streams. Spark's
    * global watermark initializes at epoch 0 ms and only ratchets
    * upward (WatermarkTracker), so a stateful stream with
    * watermark-based late-row filtering DROPS every pre-1970 event as
    * late — silently. That is a platform bound, not a query bug
    * (tools/negts.py WATERMARK_BOUND; SURVEY §3): the guard turns the
    * silent data loss into an error at the row that would vanish. A
    * codegen'd per-row branch on the already-normalized epoch-nanos
    * column — no extra pass, no action.
    */
  def requirePostEpochTs(df: DataFrame): DataFrame =
    df.withColumn(
      "ts",
      when(
        col("ts") < 0L,
        raise_error(concat(
          lit("timebox streaming: pre-epoch event time (ts="),
          col("ts").cast("string"),
          lit(" ns) — Spark's watermark floors at epoch 0 and would silently drop this row as late; " +
            "filter pre-1970 events upstream or use a non-watermarked operator")
        )).cast(LongType)
      ).otherwise(col("ts"))
    )

  /** The events file's ON-DISK schema — what a readStream needs
    * (passing the normalized schema would mis-declare the ts type).
    */
  def eventsFileSchema(spark: SparkSession, dir: String): org.apache.spark.sql.types.StructType =
    spark.read.parquet(p(dir, "events")).schema

  /** Events restricted to [startUs, endUs) with the time predicate
    * expressed against the RAW on-disk ts representation — that is
    * what makes it a parquet PushedFilter (a predicate over the
    * normalized, computed column would be evaluated post-scan; at
    * 100 TB that is the difference between reading one week's row
    * groups and the whole table). The literal side carries the cast,
    * so it constant-folds and the scan prunes on native stats.
    */
  def eventsInRangeUs(spark: SparkSession, dir: String, startUs: Long, endUs: Long): DataFrame = {
    val raw = spark.read.parquet(p(dir, "events"))
    val filtered = raw.schema("ts").dataType match {
      case LongType => raw.filter(col("ts") >= startUs * 1000 && col("ts") < endUs * 1000)
      case t =>
        raw.filter(
          col("ts") >= timestamp_micros(lit(startUs)).cast(t) &&
            col("ts") < timestamp_micros(lit(endUs)).cast(t)
        )
    }
    normalizeEventsTs(filtered)
  }

  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(p(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "lineitem"))
  def events(spark: SparkSession, dir: String): DataFrame    =
    normalizeEventsTs(spark.read.parquet(p(dir, "events")))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "embeddings"))
}
