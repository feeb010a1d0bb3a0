package graft.ops

import org.apache.spark.sql.DataFrame

/** Scoped release for the module-internal caches.
  *
  * Several operators cache an intermediate relation that feeds MULTIPLE
  * downstream branches of the RETURNED (lazy) plan — shingle sets, tf
  * relations, LM occurrence tables, posting banks. Because the result is
  * lazy, the operator itself can never unpersist: the cache must outlive
  * the call, until the CALLER materializes the result. That historically
  * left two contracts — the graded-harness one ("harness clears the cache
  * between queries", which Verify/Bench honor) and per-operator `*Managed`
  * variants returning explicit release handles
  * ([[TextOps.textRankManaged]], [[SamplingOps.temperatureAllocationManaged]],
  * [[DedupOps.decontaminateBloomManaged]]). [[withCached]] generalizes the
  * second without multiplying APIs: construct AND materialize inside one
  * scope, and every ops-internal cache created on this thread inside it is
  * released at exit.
  *
  * {{{
  * Caching.withCached {
  *   TextOps.bm25Search(docs, "doc_id", "text", queries).write.parquet(out)
  * } // the tf/dl caches the operator registered are unpersisted here
  * }}}
  *
  * Semantics and guarantees:
  *  - Registration happens at PLAN-CONSTRUCTION time on the calling thread
  *    (the Spark jobs that materialize the plan run wherever they like), so
  *    construct the operator's plan INSIDE the scope you want to own it.
  *  - Scopes nest: an inner scope releases only the caches constructed
  *    inside it; the enclosing scope keeps its own.
  *  - Outside any scope, [[scoped]] degrades to exactly `.cache()` — the
  *    graded-harness contract is unchanged, and so is every query plan
  *    (same InMemoryRelation nodes; PlanContractSpec pins the heavy ones).
  *  - Release is cache-metadata only (`unpersist(blocking = false)`):
  *    correctness never depends on a cache, so releasing before a caller
  *    re-materializes merely recomputes that branch.
  */
object Caching {

  private val scopes =
    new ThreadLocal[java.util.ArrayDeque[java.util.ArrayList[DataFrame]]] {
      override def initialValue() =
        new java.util.ArrayDeque[java.util.ArrayList[DataFrame]]()
    }

  /** Cache `df` and, when a [[withCached]] scope is active on this thread,
    * register it for release at that scope's exit. The module-internal
    * spelling for every multi-consumer intermediate in `ops/`.
    */
  private[graft] def scoped(df: DataFrame): DataFrame = {
    val c = df.cache()
    val s = scopes.get()
    if (!s.isEmpty) { s.peek().add(c); () }
    c
  }

  /** Caches registered in the innermost active scope (test/debug hook). */
  private[graft] def registeredInCurrentScope: Int = {
    val s = scopes.get()
    if (s.isEmpty) 0 else s.peek().size()
  }

  /** Run `body`; every ops-internal cache constructed on this thread
    * inside it is unpersisted when it completes (normally or not).
    */
  def withCached[A](body: => A): A = {
    val s = scopes.get()
    s.push(new java.util.ArrayList[DataFrame]())
    try body
    finally {
      val own = s.pop()
      own.forEach { df => df.unpersist(blocking = false): Unit }
    }
  }

  /** Scope an EXPLICIT frame: `df` is cached, handed to `body`, and
    * released — together with any ops-internal caches `body`'s operators
    * register — when `body` completes. `body` should materialize what it
    * needs before returning (a lazy result referencing `df` stays correct
    * after release, it just recomputes).
    */
  def withCached[A](df: DataFrame)(body: DataFrame => A): A =
    withCached { body(scoped(df)) }

  /** Postfix spelling for module internals: `relation.scopedCache()`. */
  private[graft] implicit class Syntax(private val df: DataFrame) extends AnyVal {
    def scopedCache(): DataFrame = scoped(df)
  }
}
