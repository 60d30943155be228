package graft

/** Shared test helper: walk an exception's cause chain (cycle-guarded —
  * Throwable(message, cause) constructors can build cyclic chains,
  * which a naive getCause recursion turns into StackOverflowError). */
object TestCauses {
  def chain(t: Throwable): Seq[Throwable] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    Iterator.iterate(t)(_.getCause)
      .takeWhile(x => x != null && seen.add(x))
      .toSeq
  }

  def classNames(t: Throwable): Seq[String] = chain(t).map(_.getClass.getSimpleName)
}
