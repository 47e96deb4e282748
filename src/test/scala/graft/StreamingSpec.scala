package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FixedPoint._
import graft.sources.{StreamingIngest, Tables}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("durable parquet ingest: streamed rows == batch projection, exactly once") {
    val out = java.nio.file.Files.createTempDirectory("graft_ingest").toString + "/data"
    StreamingIngest.ingestRawToParquet(spark, sf, out)
    val streamed = spark.read.parquet(out)
    val batch = Tables
      .events(spark, sf)
      .select(
        col("event_id"),
        col("user_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_type"),
        cents(col("value")).as("value_c")
      )
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    // replaying the drained stream appends nothing (checkpoint dedup)
    StreamingIngest.ingestRawToParquet(spark, sf, out)
    assert(spark.read.parquet(out).count() === batch.count())
  }

  test("windowed ingest matches the direct batch aggregation") {
    val streamed = StreamingIngest.ingestHourly(spark, sf)
    val batch = Tables
      .events(spark, sf)
      .groupBy(
        (expr("ts DIV 1000") - pmod(expr("ts DIV 1000"), lit(3600000000L))).as("window_start_us"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }
}
