package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch search for SignatureStoreSpec's deterministic CC-merge
  * fixture: finds base/tail token choices whose band signatures (under
  * the CURRENT hash family) give two disjoint near-dup components plus
  * a concatenated bridge doc that band-matches BOTH. Re-run whenever
  * the signature family changes (the spec comments name the family it
  * was searched against).
  */
object BandSearch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def bandsOf(texts: Seq[(Long, String)]): Map[Long, Set[(Long, String)]] = {
      val df = texts.toDF("doc_id", "text")
      val normed = df.select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
      Dedup
        .bandSignaturesFromSigs(Dedup.minhashSignaturesOf(normed))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (d, rs) => d -> rs.map(r => (r.getAs[Number](1).longValue, r.getString(2))).toSet }
    }

    val wordsA = Seq("eta", "sigma", "gamma", "xi", "tau", "delta", "beta", "epsilon", "alpha", "kappa")
    val wordsB = Seq("one", "seven", "twelve", "five", "nine", "two", "ten", "eight", "three", "six")
    val rnd = new scala.util.Random(7)
    def mkBase(ws: Seq[String], n: Int): String =
      (0 until n).map(_ => ws(rnd.nextInt(ws.length))).mkString(" ")

    var found = false
    var tries = 0
    while (!found && tries < 400) {
      tries += 1
      val baseA = mkBase(wordsA, 15)
      val baseB = mkBase(wordsB, 12)
      val m = bandsOf(Seq(
        (1L, s"$baseA tail"),
        (2L, s"$baseA tails"),
        (10L, s"$baseB tail"),
        (11L, s"$baseB tails"),
        (20L, s"$baseA $baseB")
      ))
      val okPairA = (m(1L) & m(2L)).nonEmpty
      val okPairB = (m(10L) & m(11L)).nonEmpty
      val cross = (m(1L) | m(2L)) & (m(10L) | m(11L))
      val okBridge = (m(20L) & (m(1L) | m(2L))).nonEmpty && (m(20L) & (m(10L) | m(11L))).nonEmpty
      if (okPairA && okPairB && cross.isEmpty && okBridge) {
        println(s"FOUND after $tries tries")
        println(s"baseA = $baseA")
        println(s"baseB = $baseB")
        found = true
      }
    }
    if (!found) println(s"no fixture found in $tries tries")
    spark.stop()
  }
}
