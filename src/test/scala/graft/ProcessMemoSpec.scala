package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraphTier, ProcessMemo}

/** The bounded-memo policy every build-at-most-once cache rides
  * (SURVEY §4): hard LRU cap, validated entries, build-once under the
  * lock — and its GraphTier wiring (a deleted tier rebuilds instead of
  * serving a dangling path).
  */
class ProcessMemoSpec extends AnyFunSuite {
  import TestSpark._

  test("compute-once, LRU eviction at the cap, access refreshes recency") {
    val m = new ProcessMemo[String, String](3)
    var builds = 0
    def get(k: String) = m.getOrElseUpdate(k) { builds += 1; s"v$k" }
    assert(get("a") === "va" && get("a") === "va")
    assert(builds === 1, "a cached key must not rebuild")
    get("b"); get("c")
    assert(m.size === 3)
    get("a") // refresh a's recency — b is now eldest
    get("d") // evicts b
    assert(m.size === 3)
    assert(m.keys.toSet === Set("a", "c", "d"), s"LRU must evict the eldest: ${m.keys}")
    builds = 0
    get("b") // evicted → rebuilt
    assert(builds === 1)
  }

  test("invalid entries rebuild; invalidate() forces the next build") {
    val m = new ProcessMemo[String, Int](4)
    var builds = 0
    def get(valid: Boolean) = m.getOrElseUpdate("k", _ => valid) { builds += 1; builds }
    assert(get(valid = true) === 1 && get(valid = true) === 1)
    assert(get(valid = false) === 2, "a stale entry must rebuild, not serve")
    m.invalidate("k")
    assert(get(valid = true) === 3)
  }

  test("GraphTier: a tier whose directory vanished is rebuilt on the next call") {
    val path = GraphTier.ensureCoPurchaseTier(spark, sf)
    assert(GraphTier.coPurchaseEdges(spark, sf).count() > 0)
    // external cleanup (corpus swap, scratch purge) deletes the tier
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete(): Unit
    }
    rm(new java.io.File(path))
    assert(!new java.io.File(path).exists())
    // the ready-gate validates existence: the next ensure REBUILDS
    val again = GraphTier.ensureCoPurchaseTier(spark, sf)
    assert(again === path)
    assert(GraphTier.coPurchaseEdges(spark, sf).count() > 0, "deleted tier must rebuild, not dangle")
  }
}
