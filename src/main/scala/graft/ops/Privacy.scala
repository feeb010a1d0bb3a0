package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy transforms for sharing/training on customer-shaped data — the
  * curation-side complement of the dedup/decontamination family: before a
  * corpus or dimension leaves its trust boundary (training-data export,
  * analytics share), direct identifiers are pseudonymized or masked and
  * quasi-identifier re-identification risk is audited/suppressed.
  *
  * Everything here is a deterministic, engine-portable projection or
  * keyed aggregate (md5 + regex + window counts — no randomness, no
  * driver state), so every operator is DuckDB-oracle-checkable
  * row-for-row, and at scale they are narrow codegen'd projections
  * (pseudonymize/mask) or one partial-aggregating shuffle on the quasi
  * columns (audit/suppress) — nothing global, nothing collected.
  */
object Privacy {

  /** Deterministic pseudonym for a direct identifier: the first 12 hex
    * chars of md5(salt ‖ value). Same salt + value → same pseudonym, so
    * joins ACROSS pseudonymized tables still link (the point of
    * pseudonymization vs suppression); NULL stays NULL (concat
    * null-propagates on both engines — the oracle must use `||`, not
    * DuckDB's null-ignoring `concat`). The salt is a caller-held secret
    * (a pepper): without it the 12-hex space (~2⁴⁸) is unsearchable for
    * high-entropy identifiers, and re-identification of LOW-entropy
    * identifiers (enumerable names) requires the salt by construction.
    * 12 hex chars keep collision odds negligible below ~10⁷ distinct
    * values (birthday bound ≈ n²/2⁴⁹); widen for larger key spaces.
    */
  def pseudonym(value: Column, salt: String): Column =
    substring(md5(concat(lit(salt), value)), 1, 12)

  /** Mask every digit except the trailing `keepLast` with 'X' — the
    * account/phone-number masking shape (suffix kept for human
    * verification, prefix entropy destroyed). Values with ≤ `keepLast`
    * characters pass through unchanged; NULL stays NULL. Pure codegen'd
    * string expression, no UDF.
    */
  def maskDigits(value: Column, keepLast: Int = 4): Column =
    when(value.isNull, lit(null).cast("string"))
      .otherwise(
        when(length(value) <= keepLast, value)
          .otherwise(concat(
            regexp_replace(
              value.substr(lit(1), length(value) - keepLast), "[0-9]", "X"),
            value.substr(length(value) - (keepLast - 1), lit(keepLast)))))

  /** Pseudonymize a dimension: `hashCols` become `<col>_pseudo`
    * (deterministic md5 pseudonym, original dropped), `maskCols` become
    * `<col>_masked` (digit-masked, original dropped), `keepCols` pass
    * through. One narrow projection — the scan's column pruning drops
    * every untouched identifier at the source.
    */
  def pseudonymize(
      df: DataFrame,
      keepCols: Seq[String],
      hashCols: Seq[String],
      maskCols: Seq[String],
      salt: String,
      keepLast: Int = 4): DataFrame = {
    val keep = keepCols.map(col)
    val hashed = hashCols.map(c => pseudonym(col(c), salt).as(s"${c}_pseudo"))
    val masked = maskCols.map(c => maskDigits(col(c), keepLast).as(s"${c}_masked"))
    df.select(keep ++ hashed ++ masked: _*)
  }

  /** k-anonymity audit: one row per quasi-identifier equivalence class
    * with its size and whether it meets `k` — the relation a release
    * gate joins against (classes below k re-identify: an attacker who
    * knows the quasi values pins the row set to < k candidates).
    * One partial-aggregating groupBy on the quasi columns.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("is_safe", col("class_size") >= k)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the attribute-
    * disclosure complement of [[kAnonymity]]: a class can be large enough
    * to hide WHICH row is the target yet still leak WHAT the target's
    * sensitive value is, if every member shares it. One row per
    * quasi-identifier class with its size, the number of DISTINCT
    * sensitive values, and whether it meets `l`. Same one
    * partial-aggregating groupBy shape as the k-audit.
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Int): DataFrame = {
    require(l >= 1, "l must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("is_diverse", col("distinct_sensitive") >= l)
  }

  /** Suppress rare quasi-identifier classes: rows whose equivalence class
    * has fewer than `k` members get EVERY quasi column replaced by
    * `replacement` (collapsing them into one residual class — full-domain
    * suppression, the simplest generalization that restores k-anonymity
    * whenever the residual class itself reaches k). Quasi columns are
    * emitted as strings (`<col>_gen`) since the replacement token must
    * inhabit the same type; other columns pass through. The class size
    * comes from a window partitioned by the quasi columns — a single
    * shuffle on the quasi key, no global sort, no second scan.
    */
  def suppressRare(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Int,
      replacement: String = "*"): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    val rare = count(lit(1)).over(w) < k
    val others = df.columns.filterNot(quasiCols.contains).map(col).toSeq
    val gens = quasiCols.map(c =>
      when(rare, lit(replacement)).otherwise(col(c).cast("string")).as(s"${c}_gen"))
    df.select(others ++ gens: _*)
  }
}
