package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BoundedCache

/** The shared build-once cache policy behind the graph-edge, IVF-model,
  * and LSH-signature caches: build exactly once per key, clear-all past
  * the bound (checkpoint blocks must not accumulate in a long-lived JVM).
  */
class BoundedCacheSpec extends AnyFunSuite {

  test("builds once per key and returns the cached value afterwards") {
    val c = new BoundedCache[String]()
    var builds = 0
    def get() = c.getOrBuild("k") { builds += 1; s"v$builds" }
    assert(get() === "v1" && get() === "v1" && builds === 1)
  }

  test("clears past the bound, then rebuilds on next access") {
    val c = new BoundedCache[Int](max = 2)
    var builds = 0
    (1 to 3).foreach(i => c.getOrBuild(s"k$i") { builds += 1; i })
    assert(builds === 3)
    // k1/k2 were evicted by the clear at the third insert; k3 survives.
    assert(c.getOrBuild("k3") { builds += 1; -1 } === 3 && builds === 3)
    assert(c.getOrBuild("k1") { builds += 1; 11 } === 11 && builds === 4)
  }
}
