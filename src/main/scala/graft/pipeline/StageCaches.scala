package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Registry of the midstream frames the pipeline operators pin with
  * `.cache()` (staged token/paragraph arrays, cluster assignments, the
  * C4 survivor frame): the pins prevent quadratic Generate re-evaluation
  * and multi-consumer recompute, but the operators return LAZY frames,
  * so they cannot unpersist on the caller's behalf — Spark has no
  * refcounted release. A long-lived application that runs many corpus
  * passes should call [[unpersistAll]] between passes (after an action
  * has materialized the downstream result) or executor storage stays
  * pinned across invocations. References are STRONG on purpose: Spark's
  * CacheManager pins the cached data independently of the DataFrame
  * object, so a weak ref that GC cleared would leave an unreleasable
  * cache entry behind — and the queue cannot leak UNDER THE DRAIN
  * DISCIPLINE: the strong refs accumulate without bound in an
  * application that composes tracked operators (quantileBuckets, ccnet,
  * maskSpans*, cleanCorpus*) but never calls [[unpersistAll]] — the
  * drain between passes is a REQUIREMENT of using the pipeline surface,
  * not an optimization, and [[track]] logs a warning once the queue
  * passes [[warnThreshold]] so the omission is visible before executor
  * storage is. */
object StageCaches {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Queue depth at which [[track]] starts warning (once per crossing):
    * a healthy pass tracks a handful of frames; hundreds pending means
    * the application is skipping the [[unpersistAll]] drain. */
  private val warnThreshold = 256
  private val warned = new java.util.concurrent.atomic.AtomicBoolean(false)
  // O(1) depth mirror: ConcurrentLinkedQueue.size() is an O(n) traversal,
  // so checking it in track() would make tracking cost quadratic in
  // exactly the undrained-leak scenario the warning exists to catch
  private val depth = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Track a frame the pipeline just cached; returns it unchanged.
    * graft-wide: gate code composing pipeline operators pins its own
    * staged frames through the same drained registry. */
  private[graft] def track(df: DataFrame): DataFrame = {
    frames.add(df)
    if (depth.incrementAndGet() > warnThreshold && warned.compareAndSet(false, true))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"StageCaches holds > $warnThreshold pinned frames — call " +
          "StageCaches.unpersistAll() between corpus passes or executor " +
          "storage stays pinned (strong refs accumulate until drained)")
    df
  }

  /** Unpersist every tracked frame; returns the count.
    * Safe to call while downstream frames are still lazy — the next
    * action recomputes (slower, never wrong). */
  def unpersistAll(blocking: Boolean = false): Int = {
    var n = 0
    var df = frames.poll()
    while (df != null) {
      df.unpersist(blocking); n += 1
      df = frames.poll()
    }
    // re-arm the growth warning: each drain starts a new accumulation
    // window, so a LATER leak past the threshold warns again.
    // decrement (not set(0)): a concurrent track() between our last
    // poll() and here must keep its +1 or the mirror undercounts
    depth.addAndGet(-n)
    warned.set(false)
    n
  }
}
