package graft.tools

import graft.GraftSession
import graft.operators.TextAnalysis

/** Dev tool: price text_bpe_batch at PRODUCTION merge counts — the
  * 30k-merge tokenizer the batched trainer exists for (rounds × m
  * merges/round; the sequential trainer would need 30k driver rounds).
  * The per-round driver-loop latency is the number the "~2.5k rounds"
  * claim in SURVEY/BASELINE rests on; this measures it instead of
  * asserting it: per-round p50/p95/max, total wall, merges learned,
  * and the final symbol-table size.
  *
  * Usage: runMain graft.tools.BpeBench <sfDir> [rounds] [m] [cand]
  * Defaults: sf0.1, 2500 rounds x m=12 (30k merge budget), cand=40.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(2500)
    val m = args.lift(2).map(_.toInt).getOrElse(12)
    val cand = args.lift(3).map(_.toInt).getOrElse(40)
    val spark = GraftSession.get()
    val times = new scala.collection.mutable.ArrayBuffer[Double](rounds)
    val t0 = System.nanoTime()
    val (merges, words) = TextAnalysis.bpeBatchLoop(
      spark, dir, rounds, m, cand,
      roundHook = (r, sec) => {
        times += sec
        if (r % 100 == 0)
          println(f"[bpe] round $r%5d: ${sec}%.3f s (cum ${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
    )
    val total = (System.nanoTime() - t0) / 1e9
    val nMerges = merges.map(_.count()).sum
    val sorted = times.sorted
    def pct(p: Double) = sorted((sorted.size * p).toInt.min(sorted.size - 1))
    println(f"[bpe] rounds=$rounds m=$m cand=$cand dir=$dir")
    println(f"[bpe] merges learned: $nMerges (budget ${rounds.toLong * m})")
    println(f"[bpe] per-round: p50=${pct(0.5)}%.3f s  p95=${pct(0.95)}%.3f s  max=${sorted.last}%.3f s")
    println(f"[bpe] total wall: $total%.1f s  (${total / rounds}%.3f s/round avg)")
    println(s"[bpe] word table rows: ${words.count()}")
    spark.stop()
  }
}
