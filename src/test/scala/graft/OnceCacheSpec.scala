package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.util.OnceCache

/** OnceCache is the shared-pair-set cache's concurrency core: loads for
  * different keys must run in parallel (the round-3 finding was a lock
  * held across the whole LSH pipeline), same-key loads must collapse to
  * one, and failures must not be cached. */
class OnceCacheSpec extends AnyFunSuite {

  test("a blocked load on one key does not serialize a load on another key") {
    val cache = new OnceCache[String, Int](4)
    val k1Entered = new CountDownLatch(1)
    val k1Release = new CountDownLatch(1)
    val t1 = new Thread(() =>
      cache.getOrCompute("k1") { k1Entered.countDown(); k1Release.await(); 1 })
    t1.start()
    assert(k1Entered.await(5, TimeUnit.SECONDS), "k1 load never started")

    // while k1's loader is in flight, k2 must complete — under the old
    // compute-under-lock shape this thread would block until k1Release
    val k2Done = new CountDownLatch(1)
    @volatile var v2 = 0
    val t2 = new Thread(() => { v2 = cache.getOrCompute("k2")(2); k2Done.countDown() })
    t2.start()
    assert(k2Done.await(5, TimeUnit.SECONDS), "k2 load serialized behind k1's")
    assert(v2 == 2)

    k1Release.countDown()
    t1.join(5000)
    assert(cache.getOrCompute("k1")(fail("k1 must be cached")) == 1)
  }

  test("concurrent callers of the same key share one load") {
    val cache = new OnceCache[String, Int](4)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    def loadOnce(): Int = { loads.incrementAndGet(); entered.countDown(); release.await(); 42 }
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 4).map(_ => new Thread(() =>
      results.add(cache.getOrCompute("k")(loadOnce()))))
    threads.foreach(_.start())
    assert(entered.await(5, TimeUnit.SECONDS))
    release.countDown()
    threads.foreach(_.join(5000))
    assert(loads.get() == 1, s"${loads.get()} loads for one key")
    assert(results.size == 4 && results.stream().allMatch(_ == 42))
  }

  test("a failed load is not cached; waiters see the failure, later calls retry") {
    val cache = new OnceCache[String, Int](4)
    val boom = intercept[RuntimeException](
      cache.getOrCompute("k")(throw new RuntimeException("load failed")))
    assert(boom.getMessage == "load failed")
    assert(cache.size == 0)
    assert(cache.getOrCompute("k")(7) == 7) // retry succeeds
  }

  test("FIFO bound evicts the oldest entry") {
    val cache = new OnceCache[Int, Int](2)
    (1 to 3).foreach(i => cache.getOrCompute(i)(i * 10))
    assert(cache.size == 2)
    // key 1 evicted: a new load runs; keys 2 and 3 still cached
    assert(cache.getOrCompute(1)(-1) == -1)
    assert(cache.getOrCompute(3)(fail("3 must be cached")) == 30)
  }

  test("the bound never evicts an in-flight load (compute-once holds under churn)") {
    val cache = new OnceCache[String, Int](1)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val t1 = new Thread(() => cache.getOrCompute("slow") {
      loads.incrementAndGet(); entered.countDown(); release.await(); 1
    })
    t1.start()
    assert(entered.await(5, TimeUnit.SECONDS))
    // churn past the bound while "slow" is still loading — eviction
    // must skip the in-flight eldest (soft bound), not drop it
    (1 to 3).foreach(i => cache.getOrCompute(s"fast$i")(i))
    release.countDown()
    t1.join(5000)
    assert(cache.getOrCompute("slow")(fail("in-flight entry was evicted")) == 1)
    assert(loads.get() == 1)
  }
}
