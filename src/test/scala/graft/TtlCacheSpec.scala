package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TtlCache

/** The reference's cache middleware semantics (cache/middleware.go):
  * TTL hits, expiry, singleflight collapse, failure passthrough,
  * write invalidation, opportunistic cleanup. */
class TtlCacheSpec extends AnyFunSuite {

  test("hits within TTL never recompute; expiry recomputes") {
    var now = 0L
    val cache = new TtlCache[String, Int](ttlMs = 5000, clock = () => now)
    val computed = new AtomicInteger()
    def get() = cache.getOrCompute("k") { computed.incrementAndGet(); 42 }
    assert(get() == 42 && computed.get() == 1)
    now = 4999
    assert(get() == 42 && computed.get() == 1, "fresh hit must not recompute")
    now = 5000
    assert(get() == 42 && computed.get() == 2, "expired entry must recompute")
    now = 5001
    assert(get() == 42 && computed.get() == 2)
  }

  test("concurrent identical requests share one computation (singleflight)") {
    val cache = new TtlCache[String, Int](ttlMs = 60000)
    val computed = new AtomicInteger()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 16).map { _ =>
      new Thread(() => {
        gate.await()
        results.add(cache.getOrCompute("hot") {
          Thread.sleep(50) // widen the race window
          computed.incrementAndGet()
        })
      })
    }
    threads.foreach(_.start())
    gate.countDown()
    threads.foreach(_.join(10000))
    assert(results.size() == 16)
    assert(computed.get() == 1, s"computed ${computed.get()} times")
    assert(results.toArray.forall(_ == 1))
  }

  test("waiters see the winner's ORIGINAL exception, not a CompletionException") {
    val cache = new TtlCache[String, Int](ttlMs = 60000)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val winnerStarted = new java.util.concurrent.CountDownLatch(1)
    val caught = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val winner = new Thread(() => {
      try cache.getOrCompute("k") {
        winnerStarted.countDown()
        gate.await() // hold the flight open until waiters have joined
        throw new IllegalStateException("boom")
      } catch { case t: Throwable => caught.add(t) }
    })
    winner.start()
    winnerStarted.await()
    val waiters = (1 to 4).map { _ =>
      new Thread(() => {
        try cache.getOrCompute("k")(99)
        catch { case t: Throwable => caught.add(t) }
      })
    }
    waiters.foreach(_.start())
    Thread.sleep(100) // let waiters reach join() before the flight fails
    gate.countDown()
    (winner +: waiters).foreach(_.join(10000))
    // a pathologically-delayed waiter may miss the flight and recompute
    // (fresh value 99, no exception) — every thread that DID observe the
    // failure must see the raw IllegalStateException on both paths
    assert(caught.size() >= 2, "winner plus at least one waiter failed")
    caught.forEach { t =>
      assert(t.isInstanceOf[IllegalStateException] && t.getMessage == "boom",
        s"waiter path must unwrap to the winner's exception, got: $t")
    }
  }

  test("a failed computation caches nothing and the next caller retries") {
    val cache = new TtlCache[String, Int](ttlMs = 60000)
    val attempts = new AtomicInteger()
    intercept[RuntimeException] {
      cache.getOrCompute("k") { attempts.incrementAndGet(); sys.error("boom") }
    }
    assert(cache.getOrCompute("k") { attempts.incrementAndGet(); 7 } == 7)
    assert(attempts.get() == 2)
  }

  test("invalidate forces recompute; cleanup drops expired entries") {
    var now = 0L
    val cache = new TtlCache[String, Int](ttlMs = 10, cleanupEveryMs = 100,
      clock = () => now)
    val computed = new AtomicInteger()
    cache.getOrCompute("a") { computed.incrementAndGet() }
    cache.invalidate("a")
    cache.getOrCompute("a") { computed.incrementAndGet() }
    assert(computed.get() == 2, "invalidate must drop the entry")
    // expired entries vanish on the next post-interval write
    (0 until 5).foreach(i => cache.getOrCompute(s"e$i") { i })
    now = 200
    cache.getOrCompute("fresh") { 1 }
    assert(cache.liveEntries == 1, "sweeper must drop the expired entries")
  }

  test("CachedSearch answers repeats from the cache and invalidates on demand") {
    val spark = SparkSuite.spark
    import org.apache.spark.sql.functions._
    import graft.index.IvfIndex
    val e = Tables.load(spark, SparkSuite.sf0001, "embeddings")
    val (indexed, model) = IvfIndex.build(e, "embedding",
      IvfIndex.Params(listSize = 20, sampleSize = 1000))
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select(col("doc_id").as("document_id"), col("lang"))
    val chunks = indexed.withColumnRenamed("vec_id", "document_id")
    var now = 0L
    val svc = new SearchService.CachedSearch(spark, chunks, docs, model,
      ttlMs = 5000, clock = () => now)
    val req = SearchService.SearchRequest("cached query", count = 5,
      offset = 0, centroids = 2)
    val first = svc.search(req)
    assert(first.nonEmpty)
    // a hit runs ZERO Spark jobs: no job-start events while repeating
    val jobs = new AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val again = svc.search(req)
      Thread.sleep(300) // drain the listener bus
      assert(again.sameElements(first))
      assert(jobs.get() == 0, "cache hit must not touch the cluster")
    } finally spark.sparkContext.removeSparkListener(l)
    // matches the uncached path exactly
    val direct = SearchService.searchHot(spark, chunks, docs, model, req).collect()
    assert(first.sameElements(direct))
    svc.invalidate()
    assert(svc.search(req).sameElements(direct), "recompute after invalidate")
  }
}
