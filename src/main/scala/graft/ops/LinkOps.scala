package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage operators: fuzzy key matching for dirty-data joins.
  *
  * Candidate generation is SymSpell-style deletion blocking (Garbe's
  * symmetric-delete scheme): each key expands to itself plus every
  * single-character-deletion variant, and any two keys within Levenshtein
  * distance 1 — substitution, insertion or deletion — provably share at
  * least one variant (delete the differing position from one or both
  * sides). Blocking is therefore an EQUI join on the variant string: no
  * O(n²) comparison, no nested-loop join, and unlike naive prefix/half
  * blocking it stays selective when keys share long constant prefixes
  * (every variant of "Customer#000001234" still carries the digits).
  * Candidates are verified with the exact `levenshtein` built-in, so the
  * filter affects nothing but cost.
  *
  * Scale shape: the exploded (id, variant) relation is (len+1)× the keys —
  * fixed-width fan-out, shuffled once on the variant for posting-list
  * pairing; only (id, id) pairs and the final verified rows survive.
  */
object LinkOps {

  /** The key itself plus all single-deletion variants, deduplicated.
    * Guarded for empty keys: Spark's `sequence(1, 0)` is DESCENDING
    * ([1, 0]), not empty, so the deletion positions must be gated on
    * length ≥ 1.
    */
  private def delVariants(name: Column): Column =
    array_union(
      array(name),
      when(length(name) >= 1,
        transform(
          sequence(lit(1), length(name)),
          i => concat(
            call_function("substring", name, lit(1), i - 1),
            call_function("substring", name, i + 1, length(name)))))
        .otherwise(array().cast("array<string>")))

  /** Self-match pairs (id_a < id_b) whose keys are within Levenshtein
    * distance `maxDist` (must be ≤ 1 — the deletion-variant pigeonhole
    * only guarantees completeness for one edit).
    */
  def fuzzySelfMatch(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist <= 1, "deletion blocking is complete only for maxDist <= 1")
    val keyed = df.select(col(idCol).as("__id"), col(nameCol).as("__name"))
    val exploded = keyed.select(col("__id"), explode(delVariants(col("__name"))).as("__v"))
    // posting-list pairing on the variant (one shuffle on the variant, one
    // on the pair) — same candidate core as the shingle dedup family
    val cand = DedupOps.bucketPairs(exploded, "__id", "__v")
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    cand
      .join(keyed.select(col("__id").as("id_a"), col("__name").as("name_a")), Seq("id_a"))
      .join(keyed.select(col("__id").as("id_b"), col("__name").as("name_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
