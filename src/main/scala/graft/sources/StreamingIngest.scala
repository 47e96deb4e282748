package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.FixedPoint._

/** Structured Streaming ingest path — the Spark-native re-expression of
  * the reference's write/ingest surface (timebox.py:57-88 from_pandas +
  * the fcntl-locked file update, timebox.py:405-455). In Spark-land the
  * single-writer lock becomes the streaming commit log: each micro-batch
  * is an atomic, exactly-once append, and readers never observe a
  * half-written update.
  *
  * The ingest pipeline is readStream → event-time tumbling-window
  * aggregation → sink. Here the sink is an in-memory table so the
  * driver's oracle can compare it against the batch answer; in
  * production the same query writes parquet/Kafka with identical
  * semantics. `Trigger.AvailableNow` drains the source to its current
  * end and stops — which is also the deterministic replay mode for a
  * correctness gate.
  *
  * Scale posture: the windowed aggregation is keyed on (window,
  * event_type), so state partitions across executors by group key;
  * map-side partial aggregation compacts each micro-batch before the
  * state-store shuffle. With a watermark (production mode `append`),
  * state for closed windows is dropped, so memory is bounded by the
  * watermark horizon, not stream length.
  */
object StreamingIngest {

  /** Hourly tumbling-window ingest aggregation over the events stream;
    * returns the materialized result table (== the batch oracle).
    */
  def ingestHourly(spark: SparkSession, dir: String): DataFrame = {
    // File streams need an explicit schema: take it from the batch reader.
    val schema = Tables.events(spark, dir).schema
    val stream = spark.readStream
      .schema(schema)
      // the source path is a single file; glob it so the stream's base
      // path resolves to the enclosing directory
      .parquet(s"$dir/events.parque[t]")

    // ts is epoch-nanos (nanosAsLong); event-time windowing needs a real
    // timestamp column, truncated to micros exactly like the batch path.
    val agg = stream
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"),
        col("n"),
        col("sum_c")
      )

    val name = "graft_ingest_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
