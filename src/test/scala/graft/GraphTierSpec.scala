package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Relational}
import graft.sources.{GraphTier, Tables}

/** The graph analytics' scale contract: they read PERSISTED edge
  * tiers, never rebuild their graph in-query. Two pins:
  *
  *   1. EQUALITY — the tier's edge sets are exactly what the in-query
  *      pipelines would build (so riding the tier cannot change any
  *      answer);
  *   2. CORPUS-DELETED — with the tiers built, every graph op runs to
  *      completion after the raw corpus files are DELETED. That is the
  *      strongest possible form of "the only corpus-scale input is the
  *      edges table": there is no corpus to read.
  */
class GraphTierSpec extends AnyFunSuite {
  import TestSpark._

  test("LSH tier edges equal the in-query pipelines (rep and member level)") {
    // rep level: tier edges vs a fresh collapse+band+join over the corpus
    val fromTier = GraphTier.repEdges(spark, sf)
    val norm = Tables
      .documents(spark, sf)
      .select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
    val inQuery = Dedup.lshRepPairsFromNormed(Dedup.collapseExact(norm).reps).pairs
    assert(fromTier.count() > 0, "tier produced no rep edges")
    assert(
      fromTier.except(inQuery).count() === 0 && inQuery.except(fromTier).count() === 0,
      "rep-level tier edges diverge from the in-query LSH pair set"
    )
    // member level: tier expansion vs minhashLsh's full output contract
    val memberTier = GraphTier.memberEdges(spark, sf)
    val memberInQ  = Dedup.minhashLsh(spark, sf)
    assert(
      memberTier.except(memberInQ).count() === 0 && memberInQ.except(memberTier).count() === 0,
      "member-level tier edges diverge from minhashLsh"
    )
  }

  test("co-purchase tier equals the in-query order-key self-join") {
    import spark.implicits._
    val fromTier = GraphTier.coPurchaseEdges(spark, sf)
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey").distinct()
    val b  = li.select($"l_orderkey".as("ok"), $"l_partkey".as("dst"))
    val inQuery = li
      .join(b, $"ok" === $"l_orderkey" && $"l_partkey" =!= $"dst")
      .select($"l_partkey".as("src"), $"dst")
      .distinct()
    assert(fromTier.count() > 0, "tier produced no co-purchase edges")
    assert(
      fromTier.except(inQuery).count() === 0 && inQuery.except(fromTier).count() === 0,
      "co-purchase tier diverges from the in-query self-join"
    )
  }

  // synthetic order-item frame: order k carries `perOrder` parts drawn
  // deterministically from a 997-key part space, so pair sets overlap
  // across orders (the anti-join has real dedup work to do)
  private def liOf(fromOrder: Long, toOrder: Long, partOffset: Long = 0L, perOrder: Int = 4) = {
    import spark.implicits._
    spark
      .range(fromOrder, toOrder)
      .select($"id".as("l_orderkey"), explode(sequence(lit(0), lit(perOrder - 1))).as("j"))
      .select($"l_orderkey", (($"l_orderkey" * 7 + $"j" * 131) % 997 + partOffset).as("l_partkey"))
  }

  test("leveled co-purchase tier: append equals flat rebuild, probe prunes partitions, per-batch I/O flat across a 10x tier") {
    import graft.sources.SignatureStore
    val root = java.nio.file.Files.createTempDirectory("graft_coptier_spec").toString
    val (pa, pb, pFlat) = (s"$root/a", s"$root/b", s"$root/flat")
    val baseA = liOf(0, 200)
    val baseB = liOf(0, 2000) // ~10x the orders (and ~10x the edges)
    // half the batch's orders repeat base part sets exactly (k ≡ 0..9
    // mod 997 — their pairs must anti-join away), half bring new pairs
    val batch = liOf(99700, 99710).unionByName(liOf(100000, 100010))
    // dirRows=10 levels A past the prune threshold (l=2); B one step deeper (l=3)
    GraphTier.writeCoPurchase(baseA, pa, dirRows = 10)
    GraphTier.writeCoPurchase(baseB, pb, dirRows = 10)
    assert(SignatureStore.readLayout(spark, pa) >= 1, "A must level")
    assert(
      SignatureStore.readLayout(spark, pb) > SignatureStore.readLayout(spark, pa),
      "10x tier must level deeper"
    )
    // 1) EQUALITY — leveled incremental == flat from-scratch build
    GraphTier.writeCoPurchase(baseA.unionByName(batch), pFlat)
    assert(SignatureStore.readLayout(spark, pFlat) === 0, "default dirRows stays flat at toy scale")
    GraphTier.appendCoPurchase(spark, batch, pa)
    val inc = GraphTier.readCoPurchase(spark, pa)
    val scratch = GraphTier.readCoPurchase(spark, pFlat)
    assert(inc.count() === scratch.count())
    assert(
      inc.except(scratch).count() === 0 && scratch.except(inc).count() === 0,
      "leveled incremental tier diverges from the flat rebuild"
    )
    // 2) the append's anti-join probe is PARTITION pruning, not a post-scan filter
    val pruned = SignatureStore.prunedScan(
      spark, pb, "edges", SignatureStore.readLayout(spark, pb), "sp",
      Seq("p0", "p1") // any literal prefix set: the mechanism is what's pinned
    )
    val meta = pruned.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata("PartitionFilters")
    }
    assert(
      meta.exists(m => m.contains("sp") && m.replaceAll("\\s", "") != "[]"),
      s"prefix filter did not land as a partition filter: $meta"
    )
    // 3) FLAT per-batch write cost: appending the same batch to the 10x
    // tier adds ~the same new files/bytes (fan-out is batch-keyed, one
    // extra level of dirs allowed 2x slack — a store-sized rewrite
    // would blow straight past it)
    def snapshot(path: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
      walk(new java.io.File(path)).map(f => f.getPath -> f.length).toMap
    }
    def appendCost(path: String): (Long, Long) = {
      val before = snapshot(path)
      // fresh part space (offset 1000): genuinely NEW pairs on both
      // tiers, so the cost measured is a real write, not an empty one
      GraphTier.appendCoPurchase(spark, liOf(200000, 200020, partOffset = 1000), path)
      val added = snapshot(path)
        .filterNot { case (p, _) => before.contains(p) }
        .filter { case (p, _) => p.endsWith(".parquet") }
      (added.size.toLong, added.values.sum)
    }
    val (filesA, bytesA) = appendCost(pa)
    val (filesB, bytesB) = appendCost(pb)
    assert(filesA > 0 && bytesA > 0, "append wrote nothing?")
    assert(filesB <= 2 * filesA + 8, s"append file fan-out grew with the tier: $filesA -> $filesB")
    assert(bytesB <= 2 * bytesA + 65536, s"append bytes grew with the tier: $bytesA -> $bytesB")
  }

  test("co-purchase L0 fold: a crash mid-fold (even mid-rename) recovers to the exact tier — no duplicates, no loss") {
    import graft.sources.SignatureStore
    val root = java.nio.file.Files.createTempDirectory("graft_copfold_spec").toString
    val p = s"$root/t"
    val base = liOf(0, 200)
    val (b1, b2) = (liOf(1000, 1010, partOffset = 5000), liOf(2000, 2010, partOffset = 6000))
    // dirRows=500: leveled (l=1) but batches stay under the fold
    // threshold, so both land as L0 runs and the fold is driven by hand
    GraphTier.writeCoPurchase(base, p, dirRows = 500)
    GraphTier.appendCoPurchase(spark, b1, p)
    GraphTier.appendCoPurchase(spark, b2, p)
    assert(new java.io.File(s"$p/edges_l0").listFiles().exists(_.getName.endsWith(".parquet")), "batches must land as L0 runs")
    // crash at the commit point: staging complete, marker written, no rename done
    GraphTier.foldL0(spark, p, SignatureStore.readLayoutInfo(spark, p), crashAfterMarker = true)
    val marker = new java.io.File(s"$p/_fold")
    assert(marker.exists(), "fold must commit via the marker")
    // worse: simulate a crash MID-rename — move one staged file by hand
    val staging = new java.io.File(
      scala.io.Source.fromFile(marker).getLines().next()
    )
    val d = staging.listFiles().filter(_.isDirectory).head
    val f = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dstDir = new java.io.File(s"$p/edges/${d.getName}")
    if (!dstDir.exists()) assert(dstDir.mkdirs())
    assert(f.renameTo(new java.io.File(dstDir, f.getName)))
    // any read recovers: resumes the renames, drops the folded L0 runs
    val got = GraphTier.readCoPurchase(spark, p)
    val pFlat = s"$root/flat"
    GraphTier.writeCoPurchase(base.unionByName(b1).unionByName(b2), pFlat)
    val expect = GraphTier.readCoPurchase(spark, pFlat)
    assert(got.count() === expect.count(), "recovered tier lost or duplicated edges")
    assert(
      got.except(expect).count() === 0 && expect.except(got).count() === 0,
      "recovered tier diverges from the flat rebuild"
    )
    assert(!marker.exists(), "recovery must clear the fold marker")
    assert(
      !new java.io.File(s"$p/edges_l0").exists() ||
        !new java.io.File(s"$p/edges_l0").listFiles().exists(_.getName.endsWith(".parquet")),
      "recovery must drop the folded L0 runs"
    )
  }

  test("all graph analytics run with the raw corpus DELETED — the tier is their only corpus-scale input") {
    // stage a private corpus dir, build both tiers off it
    val dir = java.nio.file.Files.createTempDirectory("graft_tierdrill").toFile
    for (t <- Seq("documents", "lineitem")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/$t.parquet"),
        java.nio.file.Paths.get(s"${dir.getAbsolutePath}/$t.parquet")
      )
    }
    val d = dir.getAbsolutePath
    GraphTier.ensureLshTier(spark, d)
    GraphTier.ensureCoPurchaseTier(spark, d)
    // delete the corpus: any in-query rebuild now throws
    for (t <- Seq("documents", "lineitem"))
      assert(new java.io.File(s"$d/$t.parquet").delete(), s"could not delete $t")
    intercept[Exception](Tables.documents(spark, d).count())

    // every graph op must complete and produce rows off the tier alone
    val ops: Seq[(String, () => Long)] = Seq(
      "graph_triangles"        -> (() => Dedup.graphTriangles(spark, d).count()),
      "graph_clustering_coeff" -> (() => Dedup.clusteringCoeff(spark, d).count()),
      "graph_assortativity"    -> (() => Dedup.graphAssortativity(spark, d).count()),
      "graph_modularity"       -> (() => Dedup.modularity(spark, d).count()),
      "graph_louvain_gain"     -> (() => Dedup.louvainGain(spark, d).count()),
      "graph_louvain_apply"    -> (() => Dedup.louvainApply(spark, d).count()),
      "dedup_label_prop"       -> (() => Dedup.labelProp(spark, d).count()),
      "graph_degree_dist"      -> (() => Dedup.graphDegreeDist(spark, d).count()),
      "graph_part_rank"        -> (() => Relational.partRank(spark, d).count()),
      "graph_khop"             -> (() => Relational.kHop(spark, d).count()),
      "graph_kcore"            -> (() => Relational.kCore(spark, d).count()),
      "graph_common_neighbors" -> (() => Relational.commonNeighbors(spark, d).count())
    )
    for ((name, run) <- ops) {
      val n =
        try run()
        catch {
          case e: Exception =>
            fail(s"$name touched the deleted corpus (or failed off the tier): ${e.getMessage}", e)
        }
      assert(n > 0, s"$name returned no rows off the tier")
    }
  }
}
