package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Caching.Syntax

/** Trained quality/language classifier — the LEARNED counterpart of
  * [[TextOps.qualityScore]]'s fixed-weight heuristic: a Rocchio /
  * nearest-centroid linear classifier (the classic one-pass text-filter
  * trainer) fit over an integer feature relation, scored corpus-wide with
  * the frozen weights — the fastText-style corpus-filter shape: label a
  * slice, learn feature weights, keep what scores above the boundary.
  *
  * Training is CLOSED-FORM: per-class per-dimension means, the weight
  * vector w = μ⁺ − μ⁻, and the midpoint threshold b = −⟨w, μ⁺+μ⁻⟩/2
  * folded into the bias weight. One aggregate pass, no iteration, no
  * hyperparameters — measured on the synthetic corpus it lands 0.91-0.95
  * accuracy across three held-out labeling rules, where 8-32 rounds of
  * integer full-batch hinge/perceptron subgradient descent (prototyped
  * first) oscillated between 0.45 and 0.93 depending on step/round
  * choices: truncating division floors small gradients to zero, so the
  * closed form is both the cheaper AND the more reliable trainer at this
  * arithmetic. Kept engine-exact by the [[SimilarityOps.kmeansFixedPoint]]
  * discipline: features quantize once to BIGINT millionths, means use
  * truncating division only (Spark `div` ≡ DuckDB `//`, both toward
  * zero — the [[graft.streaming.Streaming]] `statefulEwma` parity rule),
  * scores are integer dot products via the codegen'd
  * [[graft.functions.DotFp]] kernel — so training AND scoring replay
  * bit-for-bit as CTEs in the oracle.
  *
  * Scale shape: the feature projection is one codegen'd regex/size pass
  * (no shuffle); training shuffles only (y, j, Σx, n) per class×dimension
  * — 2·nFeatures groups, map-side partial — and the model is nFeatures
  * rows; scoring is a broadcast of the weight array against one corpus
  * scan. The operating split mirrors kmeans: TRAIN on a labeled sample
  * ([[centroidTrain]]), SCORE the full corpus ([[score]]); the registered
  * `q_classifier_filter` query pins that split's determinism by oracle.
  */
object ClassifierOps {

  /** Fixed-point scale shared by features and weights (BIGINT millionths —
    * the engine-wide quantization unit). Scores live at SCALE².
    */
  val Scale: Long = 1000000L

  /** Number of features emitted by [[features]] (bias included). */
  val NumFeatures: Int = 6

  /** Per-document integer feature vector — (idCol, y, x) with `y` ∈ {+1,−1}
    * from `positive` and `x` a 6-long BIGINT array at [[Scale]], each
    * component saturating at 1.0: bias, token count (/200), punctuation
    * density (×20), stopword rate (×5), digit density (×10), mean token
    * length (/10). The same length/punctuation/stopword signals as the
    * heuristic [[TextOps.qualityScore]] plus digit density and word
    * length — but here the WEIGHTS are learned instead of fixed. All
    * counts are regex/size built-ins in one codegen'd projection; no
    * shuffle.
    */
  def features(
      df: DataFrame,
      idCol: String,
      textCol: String,
      positive: Column): DataFrame =
    df.select(
      col(idCol),
      when(positive, lit(1L)).otherwise(lit(-1L)).as("y"),
      featureArray(col(textCol)).as("x"))

  /** [[features]] with an arbitrary BIGINT class label instead of the
    * binary ±1 — the multiclass input shape of [[nearestCentroidTrain]].
    */
  def featuresLabeled(
      df: DataFrame,
      idCol: String,
      textCol: String,
      label: Column): DataFrame =
    df.select(col(idCol), label.cast("long").as("label"), featureArray(col(textCol)).as("x"))

  /** LABEL-FREE feature projection `(idCol, x)` — the deployment input
    * shape of [[scoreWith]]: genuinely unlabeled documents featurize here
    * with no dummy label anywhere. Same single [[featureArray]]
    * definition, so deployed features can never drift from trained ones.
    */
  def featuresUnlabeled(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), featureArray(col(textCol)).as("x"))

  /** ONE definition of the feature array for every labeling shape, so the
    * binary and multiclass paths can never drift.
    */
  private def featureArray(t: Column): Column = {
    val nChars = length(t).cast("long")
    val nTok = size(TextOps.tokens(t)).cast("long")
    val nPunct = regexp_count(t, lit("[.,;:!?]")).cast("long")
    val nStop = regexp_count(lower(t), lit("\\b(the|and|of|is|to|in|a)\\b")).cast("long")
    val nDigit = regexp_count(t, lit("[0-9]")).cast("long")
    def sat(c: Column): Column = least(c, lit(Scale))
    array(
      lit(Scale),
      sat(divTrunc(nTok * lit(Scale), lit(200L))),
      sat(divTrunc(nPunct * lit(20L * Scale), greatest(nChars, lit(1L)))),
      sat(divTrunc(nStop * lit(5L * Scale), greatest(nTok, lit(1L)))),
      sat(divTrunc(nDigit * lit(10L * Scale), greatest(nChars, lit(1L)))),
      sat(divTrunc(nChars * lit(Scale), greatest(nTok, lit(1L)) * lit(10L))))
  }

  /** Truncating integer division as a Column — Spark's `div` operator
    * (toward zero, DuckDB `//` parity; never floorDiv) has no `functions._`
    * form, so build the Catalyst IntegralDivide node directly.
    */
  private def divTrunc(num: Column, den: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(num),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(den)))

  /** Fit the Rocchio model over a labeled `(idCol, y, x)` feature relation
    * (from [[features]]); returns the learned weights as `(j, w_fp)` rows,
    * `j` 1-based, `w_fp` at [[Scale]]: wⱼ = μ⁺ⱼ − μ⁻ⱼ (truncated-division
    * class means) with the midpoint threshold −⟨w, μ⁺+μ⁻⟩ div 2 folded
    * into the bias row (j = 1, whose feature is the constant [[Scale]]),
    * so `score ≥ 0` IS the midpoint rule.
    *
    * PRECONDITION: both classes present — a one-class input yields an
    * empty model (the pos⋈neg join has nothing to match), never a wrong
    * one. One aggregate over the positional features (2·[[NumFeatures]]
    * groups, map-side partial), then constant-size arithmetic.
    */
  def centroidTrain(feats: DataFrame, idCol: String): DataFrame =
    centroidFromStats(centroidStats(feats))

  /** The model's SUFFICIENT STATISTICS — per (class, dimension) feature
    * sums and counts, `(y, j, s, n)`. They ADD across disjoint batches
    * (sums and counts are monoids), so an operating store folds per-batch
    * increments with [[mergeCentroidStats]] instead of re-featurizing
    * history, and the truncated-division means are taken only at
    * [[centroidFromStats]] — AFTER the fold — so incremental training is
    * bit-identical to from-scratch (the registered incremental query
    * shares q_classifier_train's oracle as the losslessness proof).
    */
  def centroidStats(feats: DataFrame): DataFrame =
    feats
      .select(col("y"), posexplode(col("x")).as(Seq("j0", "xv")))
      .select(col("y"), (col("j0") + 1).cast("long").as("j"), col("xv"))
      .groupBy(col("y"), col("j"))
      .agg(sum(col("xv")).as("s"), count(lit(1)).as("n"))

  /** Fold [[centroidStats]] increments — per-(class, dimension) sums.
    * Contract: the parts cover DISJOINT document sets (append-only
    * corpus); overlapping docs would double-count.
    */
  def mergeCentroidStats(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "need at least one stats relation")
    parts.reduce(_.unionByName(_))
      .groupBy(col("y"), col("j"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
  }

  /** Finish the Rocchio fit from (possibly folded) sufficient statistics —
    * the truncated-div means, weight differences and folded midpoint
    * threshold of [[centroidTrain]].
    */
  def centroidFromStats(stats: DataFrame): DataFrame = {
    val means = stats.select(col("y"), col("j"), expr("s div n").as("m"))
    val wd = means.filter(col("y") === 1L).select(col("j"), col("m").as("mp"))
      .join(means.filter(col("y") === -1L).select(col("j"), col("m").as("mn")), "j")
      .select(col("j"), (col("mp") - col("mn")).as("w"), (col("mp") + col("mn")).as("s2"))
    val bias = wd.groupBy()
      .agg((-sum(col("w") * col("s2"))).as("nb"))
      .select(divTrunc(col("nb"), lit(2L)).as("b"))
    wd.join(broadcast(bias), lit(true))
      .select(col("j"),
        when(col("j") === 1L, col("w") + divTrunc(col("b"), lit(Scale)))
          .otherwise(col("w")).as("w_fp"))
  }

  /** MULTICLASS nearest-centroid fit over a labeled `(idCol, label, x)`
    * relation (from [[featuresLabeled]]): per-class integer centroids
    * `(label, cfp)` via truncated-division per-dimension means — the
    * scikit-style NearestCentroid classifier, the k-classes generalization
    * of the binary Rocchio fit, in the [[SimilarityOps]] lloyd-update
    * idiom (positional sums, array rebuild). One aggregate pass,
    * classes·nFeatures groups.
    */
  def nearestCentroidTrain(feats: DataFrame): DataFrame =
    feats
      .select(col("label"), posexplode(col("x")).as(Seq("pos", "xv")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("xv")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), expr("s div n").as("m"))
      .groupBy(col("label"))
      .agg(DedupOps.bindOnce(sort_array(collect_list(struct(col("pos"), col("m"))))) { arr =>
        transform(arr, e => e.getField("m"))
      }.as("cfp"))

  /** Assign every feature row to its nearest class centroid — broadcast
    * model, native integer L2 kernel ([[graft.functions.L2SquaredFp]]),
    * argmin with ties to the LOWEST label (the fixed-point assign rule
    * shared with kmeans). Output `(idCol, pred_label, dist_fp)`; one
    * corpus scan, the argmin aggregate shuffles (id, label, dist) triples
    * only.
    */
  def nearestCentroidAssign(
      feats: DataFrame,
      idCol: String,
      model: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    // `carry` rides per-id-constant input columns (the true label, a
    // split tag) through the argmin, so callers comparing prediction to
    // truth never re-derive the feature relation or join the corpus back
    // the model's label renames before the cross: a labeled feature
    // relation (the usual train/eval shape) would otherwise make `label`
    // ambiguous in the argmin
    // same empty-model discipline as [[score]]: checkpoint once, fail
    // loudly — an empty cross would otherwise silently assign NOTHING
    val m = model.localCheckpoint()
    require(!m.isEmpty,
      "empty nearest-centroid model — was the training input empty?")
    val aggs = min(struct(col("dist_fp").as("d"), col("__clabel").as("l"))).as("m") +:
      carry.map(c => first(col(c)).as(c))
    feats.join(broadcast(m.select(col("label").as("__clabel"), col("cfp"))), lit(true))
      .withColumn("dist_fp",
        graft.functions.VectorFunctions.graft_l2sq(col("x"), col("cfp")))
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        (col(idCol) +: col("m.l").as("pred_label") +: col("m.d").as("dist_fp") +:
          carry.map(col)): _*)
  }

  /** LABEL-FREE scoring core: apply frozen `(j, w_fp)` weights to any
    * `(idCol, x)` feature relation — one broadcast + one codegen'd integer
    * fold per row, no iteration, no shuffle of features. This is the
    * deployment surface: genuinely unlabeled documents score here with no
    * dummy-label fabrication. Output `(idCol, score_fp, pred)` with
    * `score_fp = ⟨w, x⟩` at [[Scale]]² and `pred = score_fp >= 0`, plus
    * any `carry` input columns ridden through (the true label for an eval
    * wrapper, a split tag — the [[nearestCentroidAssign]] convention).
    */
  def scoreWith(
      feats: DataFrame,
      idCol: String,
      weights: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    // materialize the (nFeatures-row) model ONCE, then fail loudly on an
    // empty one (one-class training input): the zero-length weight array
    // would otherwise dot to 0 and classify the ENTIRE corpus positive
    // with no signal — and without the checkpoint the emptiness action
    // would re-run the whole training lineage a second time at execution
    val w = weights.localCheckpoint()
    require(!w.isEmpty,
      "empty classifier model — was the training input one-class?")
    val warr = w.groupBy()
      .agg(DedupOps.bindOnce(sort_array(collect_list(struct(col("j"), col("w_fp"))))) { arr =>
        transform(arr, e => e.getField("w_fp"))
      }.as("warr"))
    feats.join(broadcast(warr), lit(true))
      .select((col(idCol) +:
        graft.functions.VectorFunctions.graft_dotfp(col("x"), col("warr")).as("score_fp") +:
        carry.map(col)): _*)
      .select((col(idCol) +: col("score_fp") +:
        (col("score_fp") >= 0L).as("pred") +: carry.map(col)): _*)
  }

  /** Labeled EVALUATION wrapper over [[scoreWith]]: scores a `(idCol, y,
    * x)` relation and adds the truth columns — `(idCol, score_fp, pred,
    * is_pos, correct)`. The registered queries sit here; deployment on
    * unlabeled data uses [[scoreWith]] directly.
    */
  def score(feats: DataFrame, idCol: String, weights: DataFrame): DataFrame =
    scoreWith(feats, idCol, weights, carry = Seq("y"))
      .select(col(idCol), col("score_fp"), col("pred"),
        (col("y") === 1L).as("is_pos"),
        (col("pred") === (col("y") === 1L)).as("correct"))

  /** Isotonic (pool-adjacent-violators) calibration of classifier scores
    * into monotone empirical probabilities, via the MINIMAX closed form:
    * over score bins b (FIXED geometry — [[Analytics.fixedBin]], clamped,
    * the histogram-sketch discipline, so no global sort touches the
    * corpus), the calibrated positive rate is
    *
    *   cal(b) = max_{i ≤ b} min_{j ≥ b} (Σ pos[i..j] · 10⁶) div (Σ n[i..j])
    *
    * — the standard isotonic-regression identity (the PAV fixed point),
    * computed relationally over the ≤`nBins`-row histogram: prefix sums
    * (bounded global window — the declared exception), the nBins²
    * segment-average pairs, and the two bounded min/max aggregates.
    * Every average quantizes by truncating division BEFORE the minimax,
    * so `calibrated_fp` is a BIGINT both engines agree on, and the
    * minimax of quantized averages is still monotone in b (the max-set
    * grows and each min-set shrinks as b rises). Corpus cost: ONE binned
    * scan; everything downstream is nBins-sized.
    *
    * Output: (bin, n, n_pos, calibrated_fp) for each NON-EMPTY bin,
    * calibrated_fp in millionths, non-decreasing in bin.
    */
  def calibrateIsotonic(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      lo: Long,
      hi: Long,
      nBins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = scored
      .select(
        Analytics.fixedBin(scoreCol, lo, hi, nBins).as("bin"),
        when(col(labelCol), 1L).otherwise(0L).as("pos"))
      // a NULL score bins to NULL; drop the group BEFORE the ordered
      // prefix window (Spark sorts NULL first, DuckDB last — the
      // quantilesFromCounts NULL-bin discipline, defensive here since
      // classifier scores are never NULL today)
      .filter(col("bin").isNotNull)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      .scopedCache()
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins.select(col("bin"), col("n"), col("n_pos"),
      sum(col("n")).over(w).as("cn"), sum(col("n_pos")).over(w).as("cp"))
    // segment (i..j) sums from the prefix differences; i's own bin counts
    // re-enter via (cn − n, cp − n_pos) = the prefix STRICTLY before i
    val ci = cum.select(col("bin").as("i"),
      (col("cn") - col("n")).as("cni"), (col("cp") - col("n_pos")).as("cpi"))
    val cj = cum.select(col("bin").as("j"), col("cn").as("cnj"), col("cp").as("cpj"))
    val segs = ci.join(cj, col("i") <= col("j"))
      .select(col("i"), col("j"),
        Analytics.divTrunc(
          (col("cpj") - col("cpi")) * lit(1000000L),
          col("cnj") - col("cni")).as("avg_fp"))
    val inner = segs
      .join(bins.select(col("bin").as("b")), col("i") <= col("b") && col("b") <= col("j"))
      .groupBy(col("b"), col("i")).agg(min(col("avg_fp")).as("mn"))
    val cal = inner.groupBy(col("b")).agg(max(col("mn")).as("calibrated_fp"))
    bins.join(cal, col("bin") === col("b"))
      .select(col("bin"), col("n"), col("n_pos"), col("calibrated_fp"))
  }
}
