package graft.sources

/** Bounded per-process memo — the policy object behind every
  * build-at-most-once cache in the engine (graph tiers, the louvain
  * run, shared store fixtures). A bench process never notices the
  * bound; a long-lived SERVICE embedding the library must not grow a
  * cache per corpus-dir-ever-seen, so:
  *
  *   - capacity is a hard LRU cap (access-ordered; eldest evicted);
  *   - entries are validated on read via a caller-supplied `stillValid`
  *     check (existence of the backing dir, a layout stamp, a session
  *     id) — an entry whose backing state changed is rebuilt, not
  *     served stale;
  *   - `getOrElseUpdate` holds the lock across the build, so two
  *     concurrent callers of the same key build once (builds are rare
  *     and the waiters would otherwise race the same overwrite —
  *     GraphTier's original contract, kept).
  */
private[graft] final class ProcessMemo[K, V](maxEntries: Int) {
  require(maxEntries > 0, "ProcessMemo needs a positive capacity")

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }

  /** Cached value for `k`, building (and caching) if absent OR if the
    * cached entry fails `stillValid`.
    */
  def getOrElseUpdate(k: K, stillValid: V => Boolean = (_: V) => true)(build: => V): V =
    synchronized {
      val cur = map.get(k)
      if (cur != null && stillValid(cur)) cur
      else {
        map.remove(k): Unit
        val v = build
        map.put(k, v): Unit
        v
      }
    }

  def invalidate(k: K): Unit = synchronized { map.remove(k): Unit }
  def clear(): Unit = synchronized(map.clear())
  def size: Int = synchronized(map.size())
  private[graft] def keys: Seq[K] = synchronized {
    val it = map.keySet().iterator()
    val b = Seq.newBuilder[K]
    while (it.hasNext) b += it.next()
    b.result()
  }
}
