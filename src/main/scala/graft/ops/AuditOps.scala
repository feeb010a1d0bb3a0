package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/great-expectations shape): a
  * constraint suite evaluated into one scorecard relation — per constraint,
  * its violation count, the total rows it judged, and a pass flag. The
  * production gate a pipeline runs between ingest and publish; unlike
  * [[Relational.validateRequired]] (per-ROW tagging for reject routing)
  * this is the per-CONSTRAINT aggregate view.
  *
  * Scale shape, per family:
  *  - row checks: ALL predicates of a table audit in ONE scan — a single
  *    aggregate of conditional sums (map-side partial, codegen'd), however
  *    many checks are declared; violation counting never re-reads the table
  *    per constraint.
  *  - uniqueness: one groupBy on the key (the only shuffle), then a
  *    two-sum aggregate over the group counts — no self-join, no distinct
  *    + count double-pass.
  *  - referential integrity: the child aggregates to (key, n) BEFORE the
  *    parent join, so the join carries one row per distinct child key (at
  *    100 TB: key-cardinality-sized, not child-row-sized) against the
  *    deduplicated parent key relation; orphan rows are summed from the
  *    unmatched groups.
  *
  * Every family emits the same schema — (check_name, table_name,
  * violations, total, pass) — so suites union into one scorecard.
  */
object AuditOps {

  /** Row-predicate checks: `checks` are (name, violatedWhen) pairs; NULL
    * predicate evaluations count as violations (a null comparison means
    * the constraint could not be established — the conservative audit
    * stance), made explicit with a coalesce-to-true on the violation side.
    */
  def auditRows(
      df: DataFrame,
      table: String,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one row check")
    val sums =
      count(lit(1)).as("__total") +:
        checks.zipWithIndex.map { case ((_, viol), i) =>
          sum(when(coalesce(viol, lit(true)), 1L).otherwise(0L)).as(s"__v$i")
        }
    val wide = df.agg(sums.head, sums.tail: _*)
    wide.select(
      explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
        struct(
          lit(name).as("check_name"),
          // empty table: sum() is NULL while count() is 0 — an empty
          // relation trivially passes every row check, never NULLs it
          coalesce(col(s"__v$i"), lit(0L)).as("violations"))
      }: _*)).as("__c"), col("__total"))
      .select(
        col("__c.check_name"),
        lit(table).as("table_name"),
        col("__c.violations"),
        col("__total").as("total"),
        (col("__c.violations") === 0L).as("pass"))
  }

  /** Key-uniqueness check: violations = rows belonging to a key group of
    * size > 1 (every row of a duplicated key counts, the Deequ
    * `uniqueness` convention). NULL key components group like values
    * (a repeated all-NULL key is a duplicate, not an exemption).
    */
  def auditUnique(
      df: DataFrame,
      table: String,
      keyCols: Seq[String],
      name: String): DataFrame =
    auditUniqueFromCounts(keyCounts(df, keyCols), table, name)

  /** Referential-integrity check: violations = child ROWS whose key has no
    * parent (NULL child keys are orphans — the FK could not be resolved).
    * The child pre-aggregates to (key, n) so the parent join is
    * key-cardinality-sized; the parent side deduplicates before joining.
    */
  def auditReferential(
      child: DataFrame,
      childTable: String,
      keys: Seq[(String, String)],
      parent: DataFrame,
      name: String): DataFrame =
    auditReferentialFromCounts(
      keyCounts(child, keys.map(_._1)), childTable, keys, parent, name)

  /** Union a suite of audit relations into the single scorecard. */
  def suite(audits: DataFrame*): DataFrame = {
    require(audits.nonEmpty, "need at least one audit")
    audits.reduce(_.unionByName(_))
  }

  // ──────────────────── incremental (fold) forms ────────────────────
  //
  // Every audit family reduces over a MONOID, so an append-only pipeline
  // folds per-batch partials instead of re-scanning history:
  //  - row checks: (violations, total) add directly — fold the scorecards;
  //  - uniqueness / referential integrity: fold at the (key, n) count
  //    level (counts add across disjoint batches), finalize after.
  // Means/flags are computed only AFTER the fold, so incremental audits
  // are bit-identical to from-scratch — the registered incremental query
  // shares q_constraint_audit's oracle as the losslessness proof.

  /** Long-form row-check relation — one row per (input row × check) with
    * a 0/1 violation value, `(check_name, table_name, viol)`. This is the
    * STREAMING adapter: feeding it to a
    * [[graft.streaming.Streaming.RollupStream]] with
    * `keys = (check_name, table_name)`, `valueCol = "viol"` maintains the
    * scorecard over a micro-batched stream under the rollup store's
    * existing guarantees (per-batch-id partial slots, crash-safe
    * compaction, checkpoint-replay fencing) — count(n) is the rows judged
    * and sum(viol) the violations, exactly [[auditRows]]' aggregate.
    * Finalize the rollup's `current` with [[scorecardFromRollup]].
    */
  def rowCheckLong(
      df: DataFrame,
      table: String,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one row check")
    df.select(explode(array(checks.map { case (name, viol) =>
      struct(
        lit(name).as("check_name"),
        lit(table).as("table_name"),
        when(coalesce(viol, lit(true)), 1L).otherwise(0L).as("viol"))
    }: _*)).as("__c"))
      .select(col("__c.check_name"), col("__c.table_name"), col("__c.viol"))
  }

  /** Finalize a rollup-maintained `(check_name, table_name, n, __total)`
    * relation (from [[rowCheckLong]] partials) into the scorecard schema.
    *
    * Column bridge, named explicitly because the rollup's names INVERT the
    * scorecard's: `Analytics.rollupStats` emits `n` = count(rows judged)
    * and `__total` = sum(value) — and since [[rowCheckLong]]'s value is
    * the 0/1 `viol`, the rollup's `__total` is the VIOLATION sum while the
    * scorecard's `total` is the rollup's `n`. The two-step select makes
    * the swap self-evident so a future caller cannot wire it backwards.
    */
  def scorecardFromRollup(rollup: DataFrame): DataFrame =
    rollup.select(
      col("check_name"), col("table_name"),
      col("__total").cast("long").as("viol_sum"), // sum(viol) — violations
      col("n").as("rows_judged")) //                count(*)  — rows judged
      .select(
        col("check_name"), col("table_name"),
        col("viol_sum").as("violations"),
        col("rows_judged").as("total"),
        (col("viol_sum") === 0L).as("pass"))

  /** Fold row-check scorecards from DISJOINT batches of the same table:
    * per (check, table) violation/total sums, pass recomputed on the
    * folded counts.
    */
  def mergeRowAudits(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "need at least one scorecard")
    parts.reduce(_.unionByName(_))
      .groupBy(col("check_name"), col("table_name"))
      .agg(sum(col("violations")).as("violations"), sum(col("total")).as("total"))
      .select(col("check_name"), col("table_name"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
  }

  /** Per-key row counts — the sufficient statistic of [[auditUnique]] and
    * the child side of [[auditReferential]]. Adds across disjoint batches
    * via [[mergeKeyCounts]].
    */
  def keyCounts(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
  }

  /** Fold [[keyCounts]] increments (same key columns, disjoint batches). */
  def mergeKeyCounts(keyCols: Seq[String])(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "need at least one counts relation")
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*).agg(sum(col("__n")).as("__n"))
  }

  /** [[auditUnique]] finalized from a (possibly folded) [[keyCounts]]
    * relation.
    */
  def auditUniqueFromCounts(
      counts: DataFrame,
      table: String,
      name: String): DataFrame =
    counts.agg(
      sum(col("__n")).as("total"),
      sum(when(col("__n") > 1L, col("__n")).otherwise(0L)).as("violations"))
      .select(
        lit(name).as("check_name"),
        lit(table).as("table_name"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        coalesce(col("total"), lit(0L)).as("total"),
        (coalesce(col("violations"), lit(0L)) === 0L).as("pass"))

  /** [[auditReferential]] finalized from a (possibly folded) child
    * [[keyCounts]] relation keyed by the child key columns.
    */
  def auditReferentialFromCounts(
      childCounts: DataFrame,
      childTable: String,
      keys: Seq[(String, String)],
      parent: DataFrame,
      name: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key pair")
    val childKeys = keys.map(_._1)
    val parentKeys = parent
      .select(keys.map { case (c, p) => col(p).as(c) }: _*)
      .distinct()
      .withColumn("__hit", lit(1))
    childCounts.join(parentKeys, childKeys, "left")
      .agg(
        sum(col("__n")).as("total"),
        sum(when(col("__hit").isNull, col("__n")).otherwise(0L)).as("violations"))
      .select(
        lit(name).as("check_name"),
        lit(childTable).as("table_name"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        coalesce(col("total"), lit(0L)).as("total"),
        (coalesce(col("violations"), lit(0L)) === 0L).as("pass"))
  }
}
