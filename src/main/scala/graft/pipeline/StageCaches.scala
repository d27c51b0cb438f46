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
  * cache entry behind — and the queue cannot leak, because
  * [[unpersistAll]] drains it fully. */
object StageCaches {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Track a frame the pipeline just cached; returns it unchanged.
    * graft-wide: gate code composing pipeline operators pins its own
    * staged frames through the same drained registry. */
  private[graft] def track(df: DataFrame): DataFrame = {
    frames.add(df)
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
    n
  }
}
