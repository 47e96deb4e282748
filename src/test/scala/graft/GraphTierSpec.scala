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
