package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for persisted relations that ESCAPE inside a returned
  * plan: some operators persist an intermediate (a normed ANN corpus,
  * a funnel's per-user stats) that the returned DataFrame still
  * references, so it cannot be unpersisted before the caller
  * materializes the result. Every such persist registers here; a
  * long-lived process (server, notebook) releases after materializing
  * results. Releasing EARLY only costs recomputation, never
  * correctness.
  *
  * Scoping (r12 verdict: the process-global queue meant one
  * concurrent query's release could evict another in-flight query's
  * escaped cache — recompute-only, but a p99 cliff under
  * concurrency): a caller that runs queries concurrently wraps each
  * query's CONSTRUCTION in [[scoped]], which collects that query's
  * escaped persists into a private [[Scope]] released independently
  * of every other query's. Registration follows the CONSTRUCTING
  * thread (operators persist while the plan is being built), so the
  * scope must enclose the `SparkEntry.queries(...)(spark, dir)` call,
  * not just the materializing action. Outside any scope,
  * registrations land in the process-global scope drained by
  * [[release]] — the single-query drivers' (Bench per-rep, Verify
  * exit) behavior, unchanged. */
object EscapedCaches {

  /** One query's escaped persists; [[release]] drains ONLY these. */
  final class Scope private[EscapedCaches] () {
    private[EscapedCaches] val queue =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

    /** Unpersist every cache registered in this scope; returns how
      * many were released. Safe to call more than once. */
    def release(): Int = drain(queue)

    /** The still-registered frames (test/diagnostic visibility: a
      * concurrency soak asserts a sibling scope's relations stay
      * cached after this scope releases). */
    def registered: Seq[DataFrame] = {
      val it = queue.iterator()
      val b = Seq.newBuilder[DataFrame]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  private val global = new Scope()
  private val current = new scala.util.DynamicVariable[Scope](global)

  /** Persist `df` at `level` and register it — in the innermost
    * enclosing [[scoped]] block's scope, else the process-global
    * one — for caller-driven cleanup; returns `df` for chaining. */
  def persistTracked(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    current.value.queue.add(df)
    df
  }

  /** Run `body` (a query's construction, possibly including its
    * materialization) with a fresh scope collecting its escaped
    * persists; returns (body's result, the scope). The caller
    * releases the scope after materializing the result — other
    * queries' scopes are untouched.
    *
    * A THROWING body releases its own scope before rethrowing: the
    * caller never sees the scope reference on that path, so anything
    * it registered would otherwise be orphaned forever (a long-lived
    * server would leak cache blocks on every failing statement).
    *
    * Thread-pool hazard: scope selection rides a [[DynamicVariable]]
    * (an InheritableThreadLocal) — a worker thread CREATED while this
    * scope is active inherits it permanently, so plans constructed
    * later on that pooled thread register into an already-released
    * foreign scope and are never drained. Do not construct plans on
    * long-lived shared pools from inside a scoped block; threads the
    * block spawns and joins before returning are fine. */
  def scoped[A](body: => A): (A, Scope) = {
    val s = new Scope()
    val a =
      try current.withValue(s)(body)
      catch { case t: Throwable => s.release(); throw t }
    (a, s)
  }

  /** Unpersist every escaped cache registered OUTSIDE any [[scoped]]
    * block since the last call; returns how many were released. */
  def release(): Int = drain(global.queue)

  private def drain(
      q: java.util.concurrent.ConcurrentLinkedQueue[DataFrame]): Int = {
    var n = 0
    var df = q.poll()
    while (df != null) {
      // a queue entry can outlive its SparkSession (tests, short-lived
      // drivers): unpersist on a stopped context throws, but the cache
      // died with the session — count it released and keep draining
      try df.unpersist(false)
      catch { case scala.util.control.NonFatal(_) => () }
      n += 1
      df = q.poll()
    }
    n
  }
}
