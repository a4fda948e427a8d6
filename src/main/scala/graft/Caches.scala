package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Intermediate-cache registry — the cache-hygiene contract for
  * operators that persist a reused intermediate (the exploded n-gram
  * relation of t13/t14, the rate table of t15, q39's survivor chain,
  * d11's tagged shingle sets, m06's chunk relation, d03/d07/d10's
  * shingle sets).
  *
  * Operators return LAZY plans, so they cannot unpersist before the
  * caller's action (the cache would do nothing); and persisting the
  * same logical plan twice — an operator invoked twice in one session —
  * trips the CacheManager's "already cached" warning and layers a
  * second entry. [[tracked]] solves both: it persists only when the
  * plan isn't already cached, and records the frame so [[release]] can
  * drop every graft-held intermediate once the caller has materialized
  * its result. Verify releases per query, Bench per rep, the spec base
  * per suite; a long-lived session calls release() (or
  * spark.catalog.clearCache()) at its own cadence. The d07-style
  * operators that persist, materialize and unpersist INSIDE one call
  * keep doing that — this registry is only for caches that must
  * outlive the operator's return.
  */
object Caches {
  private val held = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val scopeLocal = new ThreadLocal[java.util.ArrayList[DataFrame]]()

  /** Persist `df` (if not already cached) and track it for [[release]]
    * — or, inside a [[scoped]] block on this thread, for that block's
    * own release. Returns `df` for chaining. */
  private[graft] def tracked(df: DataFrame): DataFrame = {
    // storageLevel consults the session CacheManager: an equal plan
    // cached earlier (same operator re-invoked) reports its level and
    // is NOT re-persisted — no duplicate entry, no warning
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist()
      val sc = scopeLocal.get()
      if (sc != null) sc.add(df) else held.add(df)
    }
    df
  }

  /** Run `body` with its tracked caches SCOPED: frames tracked on this
    * thread inside the block are unpersisted when it exits, and
    * nothing else is touched — the release for callers embedded in a
    * long-lived session (s14's per-trigger admission), where the
    * global [[release]] would thrash caches other concurrent queries
    * still need. The body must materialize its results before
    * returning (s14 localCheckpoints), since its caches die with the
    * scope. Operator plan construction is single-threaded from the
    * caller, so the thread-local sees every tracked() the body
    * triggers. Scopes nest: the inner block releases only its own
    * frames and restores the outer scope's list on exit. */
  def scoped[T](body: => T): T = {
    val outer = scopeLocal.get()
    val sc = new java.util.ArrayList[DataFrame]()
    scopeLocal.set(sc)
    try body
    finally {
      if (outer != null) scopeLocal.set(outer) else scopeLocal.remove()
      sc.forEach(_.unpersist())
    }
  }

  /** Track a frame the operator persisted ITSELF (e.g. the surviving
    * state of an iterative loop) so [[release]] covers it too. The
    * frame must be the persisted plan, not a projection over it —
    * unpersist() on a derived plan does not uncache the parent. */
  private[graft] def adopt(df: DataFrame): DataFrame = {
    held.add(df)
    df
  }

  /** Unpersist every tracked intermediate. Call after the action that
    * materializes an operator's result; the result itself (already
    * computed) is unaffected, only a re-execution would recompute. */
  def release(): Unit = {
    var df = held.poll()
    while (df != null) {
      df.unpersist()
      df = held.poll()
    }
  }
}
