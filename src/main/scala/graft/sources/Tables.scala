package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical readers for the engine's tables.
  *
  * All reads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown freedom (predicate pushdown, column pruning, partition
  * pruning at cluster scale). Never cache here — callers decide.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(p(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "lineitem"))
  def events(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "embeddings"))
}
