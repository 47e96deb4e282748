package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's baked-in conf.
  *
  * Local testing runs `local[32]`; the conf is written for a real
  * multi-executor cluster (AQE on, skew-join handling, sane shuffle
  * parallelism) so plans translate 1:1 to 1000-executor deployments.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read as epoch-nano longs (oracle side uses
      // duckdb epoch_ns() for the same integer domain).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // streaming state on RocksDB: state size is bounded by native
      // memory + local disk instead of executor heap, and changelog
      // checkpointing ships per-batch deltas (not full SST snapshots)
      // to the checkpoint — the production posture for large state
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      )
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
