package graft

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap,
  CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of `MemoRegistry.memoGet` (the ADVICE-r7 fix:
  * build OUTSIDE the map lock, single-flight per key). Pure-JVM tests —
  * the builds here are plain values, the properties are about locking.
  */
class MemoGetSpec extends AnyFunSuite {

  private def freshMaps() = (
    scala.collection.mutable.Map.empty[String, Int],
    new ConcurrentHashMap[String, CompletableFuture[Int]]())

  test("single-flight: N concurrent callers of one key build once") {
    val (memo, inflight) = freshMaps()
    val builds = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val results = new ConcurrentHashMap[Int, Int]()
    val threads = (0 until 16).map { i =>
      new Thread(() => {
        start.await()
        val v = MemoRegistry.memoGet(memo, inflight, "k") {
          builds.incrementAndGet(); Thread.sleep(50); 42
        }
        results.put(i, v)
      })
    }
    threads.foreach(_.start()); start.countDown()
    threads.foreach(_.join(10000))
    assert(builds.get() == 1, s"build ran ${builds.get()} times")
    assert((0 until 16).forall(results.get(_) == 42))
    assert(memo.synchronized(memo.get("k")).contains(42))
    assert(inflight.isEmpty, "in-flight entry leaked")
  }

  test("a slow build does not serialize other keys or map access") {
    val (memo, inflight) = freshMaps()
    val slowStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slow = new Thread(() => {
      MemoRegistry.memoGet(memo, inflight, "slow") {
        slowStarted.countDown()
        release.await(10, TimeUnit.SECONDS); 1
      }: Unit
    })
    slow.start()
    assert(slowStarted.await(5, TimeUnit.SECONDS), "slow build never ran")
    // with the build held open: a DIFFERENT key must complete promptly,
    // and the synchronized section must be free (evictAll's pattern)
    val t0 = System.nanoTime()
    assert(MemoRegistry.memoGet(memo, inflight, "fast")(2) == 2)
    memo.synchronized(memo.remove("absent")): Unit
    val heldMs = (System.nanoTime() - t0) / 1e6
    assert(heldMs < 1000, s"blocked ${heldMs}ms behind an unrelated build")
    release.countDown(); slow.join(10000)
    assert(memo.synchronized(memo.get("slow")).contains(1))
  }

  test("a failing build propagates, cleans up, and allows retry") {
    val (memo, inflight) = freshMaps()
    val boom = intercept[RuntimeException] {
      MemoRegistry.memoGet(memo, inflight, "k") {
        throw new RuntimeException("boom")
      }: Unit
    }
    assert(boom.getMessage == "boom")
    assert(inflight.isEmpty, "failed build left an in-flight entry")
    assert(memo.synchronized(memo.get("k")).isEmpty)
    // the key is not poisoned: the next call rebuilds
    assert(MemoRegistry.memoGet(memo, inflight, "k")(7) == 7)
  }

  test("waiters on a failing build are released, not hung") {
    val (memo, inflight) = freshMaps()
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val failer = new Thread(() => {
      try MemoRegistry.memoGet(memo, inflight, "k") {
        started.countDown(); release.await(10, TimeUnit.SECONDS)
        throw new RuntimeException("boom")
      }: Unit
      catch { case _: RuntimeException => () }
    })
    failer.start()
    assert(started.await(5, TimeUnit.SECONDS))
    val waiterErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val waiter = new Thread(() => {
      try MemoRegistry.memoGet(memo, inflight, "k")(99): Unit
      catch { case t: Throwable => waiterErr.set(t) }
    })
    waiter.start()
    Thread.sleep(100) // let the waiter reach join() on the in-flight future
    release.countDown()
    waiter.join(10000); failer.join(10000)
    assert(!waiter.isAlive, "waiter hung behind a failed build")
    assert(waiterErr.get() != null,
      "waiter silently succeeded off a failed build")
  }
}
