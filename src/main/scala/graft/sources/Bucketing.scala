package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-layout helpers: co-located joins without a shuffle.
  *
  * Bucketing is the 100 TB answer to repeated joins on the same key:
  * both sides pre-hash into the same bucket count on the join key, so
  * the join planner sees compatible output partitioning and skips the
  * exchange entirely — the scan IS the shuffle, paid once at write
  * time instead of per query.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
