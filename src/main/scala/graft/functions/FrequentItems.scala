package graft.functions

import scala.collection.mutable

/** Misra-Gries frequent-items summary (Misra & Gries 1982; mergeable
  * form Agarwal et al. 2012 §3.2 "Mergeable Summaries").
  *
  * Holds at most `k` counters. After absorbing a stream of `n` items:
  *   - every item with true frequency > n/(k+1) HAS a counter
  *     (no false negatives at the φ = 1/(k+1) threshold), and
  *   - each counter undercounts its item's true frequency by at most
  *     n/(k+1).
  * Both bounds survive `merge` with the combined n (the merge sums
  * counters, then subtracts the (k+1)-th largest value and drops
  * non-positive counters — the subtraction is exactly the extra
  * undercount the bound budgets for).
  *
  * The summary CONTENT depends on stream/merge order (which near-misses
  * survive), so it is a candidate generator, not a deterministic
  * result: the engine's q83 uses per-partition summaries as a pruning
  * pass, then verifies candidates with an exact count — output exact
  * and order-independent, with the full-vocabulary shuffle replaced by
  * a candidates-only one. */
final class MisraGries(val k: Int) extends Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  private val counters = mutable.HashMap.empty[String, Long]
  private var processed = 0L

  /** Items absorbed so far (including via merges). */
  def n: Long = processed

  def add(x: String): Unit = {
    processed += 1
    counters.get(x) match {
      case Some(c) => counters.update(x, c + 1)
      case None if counters.size < k => counters.update(x, 1L)
      case None =>
        // decrement-all step: every live counter pays 1; zeros vacate
        val dead = mutable.ArrayBuffer.empty[String]
        counters.foreach { case (key, c) =>
          if (c == 1L) dead += key else counters.update(key, c - 1)
        }
        dead.foreach(counters.remove)
    }
  }

  def addAll(it: Iterator[String]): this.type = { it.foreach(add); this }

  /** Absorb `other` into this summary (both sides size-k ⇒ result
    * size-k, error bounds add). `other` is left untouched. */
  def merge(other: MisraGries): this.type = {
    require(other.k == k, s"cannot merge k=${other.k} into k=$k")
    other.counters.foreach { case (key, c) =>
      counters.update(key, counters.getOrElse(key, 0L) + c)
    }
    processed += other.processed
    if (counters.size > k) {
      val sorted = counters.values.toArray.sortInPlace()(Ordering[Long].reverse)
      val off = sorted(k) // (k+1)-th largest counter value
      val dead = mutable.ArrayBuffer.empty[String]
      counters.foreach { case (key, c) =>
        if (c - off <= 0L) dead += key else counters.update(key, c - off)
      }
      dead.foreach(counters.remove)
    }
    this
  }

  /** Surviving items with their (under-)estimates. */
  def estimates: Map[String, Long] = counters.toMap

  /** Superset of every item with true frequency > n/(k+1). */
  def candidates: Iterator[String] = counters.keysIterator.toSeq.iterator
}

object MisraGries {
  /** Rebuild a summary from exported (n, keys, counts) — the streaming
    * state-store round trip: counters are the summary's entire state,
    * so restore-then-add continues the stream exactly where the
    * exported summary stopped, bounds intact. */
  def restore(k: Int, n: Long, keys: Array[String],
              counts: Array[Long]): MisraGries = {
    require(keys.length == counts.length && keys.length <= k)
    val mg = new MisraGries(k)
    var i = 0
    while (i < keys.length) {
      mg.counters.update(keys(i), counts(i))
      i += 1
    }
    mg.processed = n
    mg
  }
}
