package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BoundedCache

/** The shared build-once cache policy behind the graph-edge, IVF-model,
  * and LSH-signature caches: build exactly once per key, LRU-evict ONE
  * entry past the bound (checkpoint blocks must not accumulate in a
  * long-lived JVM, but hot entries must survive a burst of first-touch
  * builds).
  */
class BoundedCacheSpec extends AnyFunSuite {

  test("builds once per key and returns the cached value afterwards") {
    val c = new BoundedCache[String]()
    var builds = 0
    def get() = c.getOrBuild("k") { builds += 1; s"v$builds" }
    assert(get() === "v1" && get() === "v1" && builds === 1)
  }

  test("evicts only the least-recently-used entry past the bound") {
    val c = new BoundedCache[Int](max = 2)
    var builds = 0
    (1 to 3).foreach(i => c.getOrBuild(s"k$i") { builds += 1; i })
    assert(builds === 3)
    // Only k1 (the LRU entry) was evicted at the third insert; k2 and k3
    // survive — no clear-all.
    assert(c.getOrBuild("k3") { builds += 1; -1 } === 3 && builds === 3)
    assert(c.getOrBuild("k2") { builds += 1; -1 } === 2 && builds === 3)
    assert(c.getOrBuild("k1") { builds += 1; 11 } === 11 && builds === 4)
  }

  test("a hot entry survives a burst of first-touch builds") {
    val c = new BoundedCache[Int](max = 2)
    c.getOrBuild("hot") { 1 }
    for (i <- 1 to 10) {
      c.getOrBuild("hot") { -1 }         // touch: keeps it most-recently-used
      c.getOrBuild(s"cold$i") { i }      // burst of one-off builds
    }
    var rebuilt = false
    assert(c.getOrBuild("hot") { rebuilt = true; -1 } === 1 && !rebuilt)
  }
}
