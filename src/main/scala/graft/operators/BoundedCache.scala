package graft.operators

/** Tiny bounded build-once cache for materialized (checkpointed) plans
  * shared across queries in one application — the policy lives here once
  * so the graph-edge, IVF-model, and LSH caches cannot drift: clear past
  * `max` entries, and run the build OUTSIDE the map lock — a rare
  * duplicate build under a race is cheaper than serializing first-touch
  * queries behind a Spark job holding the bin lock.
  *
  * Eviction deliberately only DROPS REFERENCES — it does not eagerly
  * unpersist checkpoint blocks. `localCheckpoint` output is
  * non-recomputable (lineage truncated), so unpersisting an evicted frame
  * that an in-flight query still references would corrupt that query;
  * dropping the reference instead lets the blocks free when GC +
  * ContextCleaner reclaim them, bounding growth without a use-after-free
  * hazard.
  */
final class BoundedCache[V](max: Int = 8) {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, V]()

  def getOrBuild(key: String)(build: => V): V = {
    val cached = m.get(key)
    if (cached != null) cached
    else {
      val built = build
      if (m.size >= max) m.clear()
      val prev = m.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }
}
