package graft.tools

import graft.GraftSession
import graft.sources.{GraphTier, SignatureStore, StreamingIngest, Tables, TimeboxStore}
import org.apache.spark.sql.functions._

/** Dev tool: price the co-purchase tier's per-batch maintenance — the
  * r11 weak mark. The append's dedup anti-join probes the stored edge
  * tier; on a FLAT tier Spark cannot broadcast the right side of a
  * LeftAnti build, so the probe scans the whole store per batch
  * (O(store)); on the LEVELED layout the probe prunes to the batch's
  * src prefixes at file-listing time (O(batch)). This tool measures
  * exactly that: the same fixed batch appended to a tier and to its
  * ~10x sibling, flat vs leveled, plus the streaming ledger probe.
  *
  * Usage: runMain graft.tools.CoPurchaseProfile <sfDir>
  */
object CoPurchaseProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    sys.props("graft.scratch.percall") = "true"
    val spark = GraftSession.get()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def li(d: String) = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey"))
    // fixed batch: ~30 complete orders under fresh keys (novel pairs on
    // every tier, so each append is a real write)
    def batch(shift: Long) = li(dir)
      .filter(col("l_orderkey") < 120)
      .select(
        (col("l_orderkey") + 1000000000L + shift).as("l_orderkey"),
        (col("l_partkey") + 10000000L + shift).as("l_partkey")
      )
      .localCheckpoint()
    val sf1dir = ScaleUp.ensure(spark, dir)

    // warm pass: codegen + parquet footers
    val warm = TimeboxStore.scratchPath("graft_copprof_warm", dir)
    GraphTier.writeCoPurchase(li(dir), warm, dirRows = 40000)
    GraphTier.appendCoPurchase(spark, batch(0L), warm)

    // FLAT tiers (the r11 shape): per-batch probe scans the store
    val flatS = TimeboxStore.scratchPath("graft_copprof_fs", dir)
    val flatB = TimeboxStore.scratchPath("graft_copprof_fb", dir)
    GraphTier.writeCoPurchase(li(dir), flatS)     // DefaultDirRows: flat at sf0.1
    GraphTier.writeCoPurchase(li(sf1dir), flatB)  // flat at derived sf1.0 too
    timed("FLAT append: 30-order batch vs sf0.1 tier") {
      GraphTier.appendCoPurchase(spark, batch(1L), flatS)
    }
    timed("FLAT append: same batch vs 10x tier") {
      GraphTier.appendCoPurchase(spark, batch(1L), flatB)
    }

    // LEVELED tiers (the fix): probe prunes to the batch's prefixes
    val levS = TimeboxStore.scratchPath("graft_copprof_ls", dir)
    val levB = TimeboxStore.scratchPath("graft_copprof_lb", dir)
    GraphTier.writeCoPurchase(li(dir), levS, dirRows = 40000)
    GraphTier.writeCoPurchase(li(sf1dir), levB, dirRows = 40000)
    println(s"[profile] leveled layouts: sf0.1 l=${SignatureStore.readLayout(spark, levS)}, " +
      s"10x l=${SignatureStore.readLayout(spark, levB)}")
    timed("LEVELED append: 30-order batch vs sf0.1 tier") {
      GraphTier.appendCoPurchase(spark, batch(2L), levS)
    }
    timed("LEVELED append: same batch vs 10x tier") {
      GraphTier.appendCoPurchase(spark, batch(2L), levB)
    }

    // streaming per-batch body (straddle probe + append + ledger write)
    // against the leveled tiers — the coPurchaseStream steady state
    for ((p, tag) <- Seq((levS, "sf0.1"), (levB, "10x"))) {
      StreamingIngest.writeOrderLedger(spark, p, li(if (tag == "10x") sf1dir else dir), -1L, bootstrap = true)
      timed(s"LEVELED stream batch (guard+append+ledger) vs $tag tier") {
        StreamingIngest.coPurchaseBatch(spark, p, batch(3L), 0L)
      }
    }

    // the full queries, end to end
    timed("graph_copurchase_tier end-to-end") {
      graft.operators.Relational.coPurchaseTier(spark, dir).count()
    }
    timed("graph_copurchase_stream end-to-end (AvailableNow)") {
      StreamingIngest.coPurchaseStream(spark, dir).count()
    }
    spark.stop()
  }
}
