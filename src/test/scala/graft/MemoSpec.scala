package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Memo contract: the build closure runs exactly once per
  * (session, dir, key) even when many threads race the FIRST access —
  * a TrieMap getOrElseUpdate would admit one winner but still evaluate
  * the losers' `build.persist()`, leaking cached plans (round-6 advice).
  */
class MemoSpec extends SparkSpec {

  test("concurrent first access builds exactly once and all callers share it") {
    import spark.implicits._
    val builds = new AtomicInteger(0)
    val nThreads = 16
    val pool = Executors.newFixedThreadPool(nThreads)
    val ready = new CountDownLatch(nThreads)
    val go = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    try {
      (1 to nThreads).foreach { _ =>
        pool.execute { () =>
          ready.countDown()
          go.await(10, TimeUnit.SECONDS)
          val df = Memo.df(spark, "memoSpecRace", "test-dir") {
            builds.incrementAndGet()
            Seq(1L, 2L, 3L).toDF("x")
          }
          results.add(df.count())
        }
      }
      ready.await(10, TimeUnit.SECONDS)
      go.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(builds.get() === 1, "build closure must run exactly once")
    assert(results.size() === nThreads)
    results.forEach(c => assert(c === 3L))
  }

  test("distinct keys still build independently") {
    import spark.implicits._
    val builds = new AtomicInteger(0)
    val a = Memo.df(spark, "memoSpecA", "test-dir") {
      builds.incrementAndGet(); Seq(1).toDF("x")
    }
    val b = Memo.df(spark, "memoSpecB", "test-dir") {
      builds.incrementAndGet(); Seq(1, 2).toDF("x")
    }
    assert(builds.get() === 2)
    assert(a.count() === 1L && b.count() === 2L)
    // second access of either is a cache hit
    Memo.df(spark, "memoSpecA", "test-dir") {
      builds.incrementAndGet(); Seq(1).toDF("x")
    }
    assert(builds.get() === 2)
  }
}
