package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed last-wins merge — the engine's restatement of the reference's
  * `INSERT … ON CONFLICT DO UPDATE` upsert sinks (SURVEY.md §2.A A11-A13,
  * §2.B B12/B18).
  *
  * Parquet has no in-place MERGE, so state is modeled as
  * `current = merge(previous, delta)`: union then keep the newest row per
  * key. Crucially this is NOT `dropDuplicates` (which keeps an arbitrary
  * row); the reference's EXCLUDED-wins semantics require an explicit
  * ordering — `row_number() over (partition by key order by version desc)`
  * with a total order (version column + tiebreakers) so the result is
  * deterministic under re-delivery, matching at-least-once Kafka input
  * collapsing via upsert keys.
  *
  * Scale notes: one shuffle on the merge key. The window needs no global
  * sort — each key's rows sort within its hash partition. For streaming,
  * `foreachBatch` applies the same function per micro-batch
  * (graft.streaming.Streaming).
  */
object Merge {

  /** Newest row per key under `orderBy` (descending, first wins). `orderBy`
    * must be a total order for determinism — pass tiebreakers.
    */
  def lastWins(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Debounce: drop events that repeat the previous event's `dedupCols`
    * values within the same key's (ts, id)-ordered stream — the standard
    * at-least-once-feed cleaner for consecutive duplicate emissions
    * (sensor re-sends, double-fired webhooks). Unlike [[lastWins]] this
    * keeps EVERY run's first row, so an A→B→A alternation survives while
    * A→A→B collapses to A→B. One window pass per key; emits run_seq (the
    * per-key run index) so downstream run-length analytics need no second
    * pass.
    */
  def debounceConsecutive(
      df: DataFrame,
      keys: Seq[String],
      orderBy: Seq[Column],
      dedupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    // the first row of a partition is ALWAYS a new run — detected by
    // row_number, not by comparing against the (absent) previous row:
    // a null-safe compare of a leading NULL value against lag's NULL
    // would otherwise read as "unchanged" and silently drop the run
    val changed = (row_number().over(w) === 1) || dedupCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    df.withColumn("__new_run", when(changed, lit(1L)).otherwise(lit(0L)))
      .withColumn("run_seq",
        sum(col("__new_run")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__new_run") === 1L)
      .drop("__new_run")
  }

  /** A11-A13 — upsert = union(previous, delta) → last-wins by version. */
  def upsert(previous: DataFrame, delta: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame =
    lastWins(previous.unionByName(delta), keys, orderBy)

  /** Skew-safe last-wins: two-phase reduction — a partial latest-pick per
    * (key, salt) bucket collapses a hot key's rows map-side-ish before the
    * final per-key pick, so no single reducer sorts a whale key's entire
    * history. Result is identical to [[lastWins]] (max is associative);
    * checked by MergeSpec. Use when key skew is known; plain [[latestByKey]]
    * already gets partial-aggregation for the agg form.
    */
  def lastWinsSalted(
      df: DataFrame,
      keys: Seq[String],
      versionCols: Seq[String],
      payloadCols: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(versionCols.map(col): _*), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(max_by(
        struct((payloadCols ++ versionCols).map(col): _*),
        struct(versionCols.map(col): _*)).as("__p"))
      .select(keys.map(col) ++ (payloadCols ++ versionCols).map(c => col(s"__p.$c").as(c)): _*)
    // version cols ride along in the payload so the result carries the
    // same columns as lastWins, not just keys + payload
    latestByKey(partial, keys, versionCols, payloadCols ++ versionCols)
  }

  /** Persist a store relation partitioned by a low-cardinality key column
    * (month date for the monthly table, asset_type for snapshots): at 100 TB
    * the store must be laid out so incremental reads prune — a gap-detection
    * or backfill pass touching 3 months reads 3 partitions, not the table.
    * Readers get partition pruning automatically (verified in MergeSpec via
    * the scan's PartitionFilters).
    */
  def writePartitionedStore(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  /** Persist a store as a BUCKETED table on its merge key: joins and
    * last-wins merges against a store bucketed on the same key need no
    * shuffle of the store side (the dominant side at 100 TB — the delta is
    * small by construction). Requires a catalog table (`saveAsTable`);
    * `sortBy` within buckets lets the merge window skip the sort too.
    */
  def writeBucketedStore(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** B12 — current-period last-value pick (`api_data[-1]`,
    * `fetch_historical_market_data.py:50-61`): keep only the latest row per
    * key, expressed with `max_by(struct(payload), struct(version))` — a
    * hash-aggregate (map-side partial, no sort), preferable to a window when
    * only ONE row survives per key.
    */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      versionCols: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    val picked = df
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(payloadCols.map(col): _*), struct(versionCols.map(col): _*)).as("__p"))
    payloadCols
      .foldLeft(picked) { (d, c) => d.withColumn(c, col(s"__p.$c")) }
      .drop("__p")
  }

  /** CDC apply: merge a change stream carrying upserts AND deletes into a
    * snapshot — the full MERGE semantics the reference's upsert-only sinks
    * (A11-A13) lack a delete path for. Per key, the LAST change (by
    * `orderBy`) wins: a final 'D' removes the key, anything else replaces
    * the stored row; keys untouched by the stream pass through. One
    * last-wins reduction over the (small) change stream + one anti join +
    * one union — the snapshot is never shuffled on anything but its key.
    *
    * `orderBy` must TOTALLY order the change stream — include a unique
    * tiebreaker (e.g. event_id), same contract as [[lastWins]]. A 'D' and
    * a 'U' row tied on every orderBy column would make the delete-vs-upsert
    * winner arbitrary; with a total order the apply is deterministic and
    * idempotent under re-delivery (pinned by a PropertiesSpec property).
    */
  def applyCdc(
      snapshot: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      orderBy: Seq[Column],
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val last = lastWins(changes, keys, orderBy)
    // NULL-inclusive: a change row with a NULL op (malformed CDC input) is
    // treated as an upsert — a bare `=!=` would exclude it from ups while
    // the anti join still removed its key, silently DELETING on malformed
    // input (the same three-valued-logic trap Jobs.partitionByErrorClass
    // guards for statuses)
    val ups = last.filter(col(opCol).isNull || col(opCol) =!= deleteOp).drop(opCol)
    snapshot
      .join(last.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(ups)
  }

  /** SCD type-2 history: turn a keyed change stream into validity intervals.
    * Consecutive rows whose `valueCol` did not change are compressed away
    * (null-safe comparison), then each surviving change row gets
    * `valid_from = its timestamp`, `valid_to = next change's timestamp`
    * (NULL and `is_current = true` on the open interval) — the standard
    * warehouse history table the snapshot upserts (A11-A13) discard.
    *
    * One shuffle on the key; both windows use the same partitioning and
    * ordering so the sort is planned once and reused (verified in
    * PLANS.md — a single Sort node feeds both Window operators).
    */
  def scd2History(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // __rn = 1 keeps a key's FIRST row even when its value is NULL: lag's
      // no-previous-row NULL is otherwise indistinguishable from a previous
      // NULL value, and the key's opening interval would silently vanish
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(valueCol)))
      .drop("__prev", "__rn")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
