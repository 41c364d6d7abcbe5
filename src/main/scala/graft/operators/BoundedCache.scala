package graft.operators

/** Tiny bounded build-once cache for materialized (checkpointed) plans
  * shared across queries in one application — the policy lives here once
  * so Graph's edge cache and Embeddings' IVF-model cache cannot drift:
  * clear past `max` entries (checkpoint blocks are block-manager resident;
  * unbounded growth would starve storage memory in a long-lived JVM), and
  * run the build OUTSIDE the map lock — a rare duplicate build under a
  * race is cheaper than serializing first-touch queries behind a Spark job
  * holding the bin lock.
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
