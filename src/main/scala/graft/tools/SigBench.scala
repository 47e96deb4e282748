package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch micro-benchmark: no-distinct vs distinct-groupBy MinHash signature
  * derivation over the sf0.1 documents (investigating the
  * dedup_incremental regression).
  */
object SigBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
    docs.cache().count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    for (i <- 1 to 2) {
      time(s"noDistinct-$i")(Dedup.minhashSignaturesOf(docs).count())
      time(s"groupBy-$i")(Dedup.minhashSignatures(Dedup.shinglesOf(docs).distinct()).count())
    }
    spark.stop()
  }
}
