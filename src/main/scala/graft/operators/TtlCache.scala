package graft.operators

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

/** TTL cache with singleflight collapse — the reference's serving-side
  * middleware (cache/middleware.go:18-163, cache/cache.go:12-79: 5 s TTL,
  * periodic cleanup; config/constants.go:15-16) re-expressed for the
  * engine's request path. Spark already covers the ANALYTIC caching rows
  * of SURVEY §2.10 (broadcast dims, `.cache()`); what the reference's
  * middleware adds — and what this class carries over — is the SERVING
  * pattern: repeated point queries (hot search texts, owner/category
  * lookups) answer from a driver-side result cache, and concurrent
  * identical requests share ONE computation instead of stampeding the
  * cluster with duplicate jobs.
  *
  * Values are computed results (e.g. collected rows), never lazy
  * DataFrames — caching a plan would re-run it per read. The clock is
  * injectable so TTL expiry is unit-testable without sleeps.
  *
  * Semantics, matching the reference:
  *  - hit within TTL → cached value, no computation;
  *  - expired or absent → compute once; concurrent callers of the SAME
  *    key await that computation (singleflight, middleware.go:77-118);
  *  - a failed computation propagates to every waiter and caches
  *    NOTHING — the next caller retries;
  *  - opportunistic cleanup piggybacks on writes every `cleanupEveryMs`
  *    (the reference's 15 s sweeper) so the map never grows unbounded
  *    even without a background thread.
  */
final class TtlCache[K, V](ttlMs: Long, cleanupEveryMs: Long = 15000L,
    clock: () => Long = () => System.currentTimeMillis()) {
  require(ttlMs > 0, "ttlMs must be positive")

  private final case class Entry(value: V, storedAt: Long)
  private val store = new ConcurrentHashMap[K, Entry]()
  private val inflight = new ConcurrentHashMap[K, CompletableFuture[V]]()
  @volatile private var lastCleanup = clock()

  private def fresh(e: Entry, now: Long): Boolean = now - e.storedAt < ttlMs

  /** Number of live (unexpired) entries — test/metrics hook. */
  def liveEntries: Int = {
    val now = clock()
    var n = 0
    store.forEach((_, e) => if (fresh(e, now)) n += 1)
    n
  }

  /** Cached value if fresh, else compute via `f` with singleflight. */
  def getOrCompute(key: K)(f: => V): V = {
    val now = clock()
    val hit = store.get(key)
    if (hit != null && fresh(hit, now)) return hit.value
    // singleflight: first caller installs a future and computes; every
    // concurrent caller for the key awaits the same future. NOT
    // reentrant: getOrCompute on the SAME key from inside `f` would
    // self-deadlock on the join (the reference's middleware has the same
    // constraint — a handler never calls back into its own cache entry).
    val mine = new CompletableFuture[V]()
    val race = inflight.putIfAbsent(key, mine)
    if (race != null) {
      // unwrap so waiters see the SAME exception type the winner threw,
      // not a CompletionException shell around it
      try return race.join()
      catch {
        case e: java.util.concurrent.CompletionException if e.getCause != null =>
          throw e.getCause
      }
    }
    try {
      // double-check: a prior flight may have refreshed the entry
      // between our staleness check and winning the inflight slot
      val again = store.get(key)
      val value =
        if (again != null && fresh(again, clock())) again.value
        else {
          val v = f
          store.put(key, Entry(v, clock()))
          v
        }
      mine.complete(value)
      maybeCleanup()
      value
    } catch {
      case t: Throwable =>
        mine.completeExceptionally(t) // waiters fail too; nothing cached
        throw t
    } finally inflight.remove(key, mine)
  }

  /** Drop a key (the reference invalidates on writes through the same
    * middleware — delete.go/upload.go call cache.Delete). */
  def invalidate(key: K): Unit = store.remove(key)

  def invalidateAll(): Unit = store.clear()

  private def maybeCleanup(): Unit = {
    val now = clock()
    if (now - lastCleanup >= cleanupEveryMs) {
      lastCleanup = now
      val it = store.entrySet().iterator()
      while (it.hasNext) if (!fresh(it.next().getValue, now)) it.remove()
    }
  }
}
