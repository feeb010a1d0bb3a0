package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** A14 — structured log sink. The reference logs every job step to
  * file+stdout (`etl/utils.py:37-56`); the engine equivalent is a
  * QueryExecutionListener emitting one structured record per completed
  * query (function name, wall time, success/failure), which a deployment
  * routes to log4j/metrics instead of the in-memory buffer used for tests.
  */
class MetricsListener extends QueryExecutionListener {
  import MetricsListener.{QueryMetric, StoreMetric}

  private val buffer = new ConcurrentLinkedQueue[QueryMetric]()
  private val storeBuffer = new ConcurrentLinkedQueue[StoreMetric]()

  def records: Seq[QueryMetric] = {
    val it = buffer.iterator()
    val b = Seq.newBuilder[QueryMetric]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** One record per committed store write (see [[MetricsListener.StoreMetric]]). */
  def storeRecords: Seq[StoreMetric] = {
    val it = storeBuffer.iterator()
    val b = Seq.newBuilder[StoreMetric]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Report a maintained-store batch write. Called by the store maintainers
    * themselves (e.g. [[graft.streaming.Streaming.NearDupClusterStream]]) —
    * the write path is driver code inside `foreachBatch`, which no
    * QueryExecutionListener callback observes.
    */
  def recordStore(m: StoreMetric): Unit = { storeBuffer.add(m): Unit }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    buffer.add(QueryMetric(funcName, durationNs, None))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    buffer.add(QueryMetric(funcName, 0L, Option(exception.getMessage)))
}

object MetricsListener {
  /** One record per completed query. Lives on the companion so the type is
    * nameable without a listener instance and records don't pin their
    * listener through an $outer reference.
    */
  case class QueryMetric(funcName: String, durationNs: Long, error: Option[String])

  /** One maintained-store batch write: how many rows each persisted DELTA
    * relation carried (the bytes-written proxy — the O(batch)-persistence
    * claim is observable as `postingsDeltaRows`/`sizesDeltaRows` tracking
    * batch size, not store size) and the store's current document count
    * (`storeDocs`, the fold-size axis those deltas are flat against).
    */
  case class StoreMetric(
      store: String,
      batchId: Long,
      postingsDeltaRows: Long,
      sizesDeltaRows: Long,
      labelsDeltaRows: Long,
      storeDocs: Long)

  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
