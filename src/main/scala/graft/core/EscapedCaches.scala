package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for persisted relations that ESCAPE inside a returned
  * plan: some operators persist an intermediate (a normed ANN corpus,
  * a funnel's per-user stats) that the returned DataFrame still
  * references, so it cannot be unpersisted before the caller
  * materializes the result. Every such persist registers here; a
  * long-lived process (server, notebook) calls [[release]] after
  * materializing results. The Bench harness performs an equivalent
  * sweep via `spark.sharedState.cacheManager.clearCache()` per rep;
  * single-shot drivers (Verify) exit before it matters. Releasing
  * EARLY only costs recomputation, never correctness. */
object EscapedCaches {

  private val queue =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and register it for caller-driven
    * cleanup; returns `df` for chaining. */
  def persistTracked(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    queue.add(df)
    df
  }

  /** Unpersist every escaped cache registered since the last call;
    * returns how many were released. */
  def release(): Int = {
    var n = 0
    var df = queue.poll()
    while (df != null) {
      // a queue entry can outlive its SparkSession (tests, short-lived
      // drivers): unpersist on a stopped context throws, but the cache
      // died with the session — count it released and keep draining
      try df.unpersist(false)
      catch { case scala.util.control.NonFatal(_) => () }
      n += 1
      df = queue.poll()
    }
    n
  }
}
