package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Caching.Syntax

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Random `df.sample` is seed-and-partitioning dependent — re-running on a
  * different cluster layout yields a different sample, which is unacceptable
  * for train/val/test lineage. These operators derive membership from a
  * CONTENT hash (md5 of the key), so the assignment is a pure function of
  * the row: stable across runs, engines and partitionings, and expressible
  * in any SQL dialect with md5 (the DuckDB oracle checks it row-for-row).
  *
  * Scale: both are narrow map-side operations except the stratified take's
  * single shuffle on the strata key. The hex-prefix comparison keys on the
  * first 4 md5 nibbles (65536 buckets) — split-fraction granularity 1/65536.
  */
object SamplingOps {

  /** Assign each row to a named bucket with the given weights (must sum to
    * ~1) by md5(key) hex-prefix range — a deterministic train/val/test split.
    */
  def hashSplit(df: DataFrame, keyCol: String, fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val hx = substring(md5(col(keyCol).cast("string")), 1, 4)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    // clamp to 0xffff: a fraction rounding to 65536 would format as the
    // 5-char "10000" and break the 4-char lexicographic comparison
    val bounds = cum.init.map(c => f"${math.min(0xffff, math.round(c * 65536).toInt)}%04x")
    val bucket = fractions.init.zip(bounds)
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), b), elseC) =>
        when(hx < lit(b), lit(name)).otherwise(elseC)
      }
    df.withColumn("bucket", bucket)
  }

  /** Leakage-safe train/val/test split: buckets by the near-dup CLUSTER id,
    * not the document id, so a whole near-duplicate family lands in ONE
    * split. A doc-keyed [[hashSplit]] routinely strands one member of a
    * near-dup pair in train and its twin in test — the classic silent eval
    * contamination that survives doc-level dedup audits because no row is
    * actually duplicated across splits. `labels` is any (id, cluster)
    * relation — e.g. the connected-components labeling the cluster queries
    * build — and the bucket is the same md5-prefix function of the cluster
    * id, so singleton docs (cluster = own id) split exactly like
    * [[hashSplit]] while families move as a unit.
    *
    * Scale shape: one narrow map over the labeling (the md5 bucket is a
    * pure row function) — the clustering's cost is the caller's, already
    * paid for dedup; the split itself adds no shuffle.
    */
  def clusterSplit(
      labels: DataFrame,
      idCol: String,
      clusterCol: String,
      fractions: Seq[(String, Double)]): DataFrame =
    hashSplit(labels, clusterCol, fractions)
      .select(col(idCol), col(clusterCol), col("bucket"))

  /** Deterministic weight-proportional sampling without replacement
    * (priority sampling, Duffield–Lund–Thorup): each row gets priority
    * w/u where u ∈ (0,1] is a pure integer-LCG function of its id, and
    * each stratum keeps its top-`k` priorities — heavier rows are
    * proportionally more likely to survive, yet the selection is a pure
    * row function: stable across runs, engines and partitionings, like
    * every sampler in this module. The uniform is u = (h+1)/2³¹ with
    * h = (id·1103515245 + 12345) mod 2³¹ (the classic rand LCG step), so
    * the priority (w·2³¹)/(h+1) is ONE multiply and ONE divide — the
    * portability guarantee is the IDENTICAL IEEE operation sequence on
    * both engines (each op individually correctly rounded, no ln/pow
    * whose libm rounding could diverge, no FMA fusing in either), not
    * integer-exactness of the product, which exceeds 2⁵³ for weights
    * beyond ~4M. Ids must be non-negative and < 2³³ (the LCG
    * product must not overflow 64-bit — engines disagree on wrap
    * semantics); weights must be ≥ 0 (w=0 ⇒ priority 0, drawn only if a
    * stratum has fewer than k positive-weight rows).
    *
    * Scale shape: the priority is map-side; the per-stratum top-k is a
    * rank-filtered window (WindowGroupLimit pushes the k-limit into the
    * sort) — one shuffle on the strata key, never a global sort.
    */
  def prioritySample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      strataCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val h = (col(idCol) * lit(1103515245L) + lit(12345L)) % lit(2147483648L)
    // the portability contract above is ENFORCED, not just documented: an
    // id outside [0, 2³³) overflows the LCG product with engine-dependent
    // wrap semantics and a negative weight inverts the top-k, both silent
    // divergences from the oracle — fail loudly instead. The guard lives
    // inside the priority expression (not a droppable side column) so the
    // optimizer cannot prune it away.
    val priority = when(
      col(idCol).isNull || col(idCol) < 0 || col(idCol) >= lit(8589934592L) ||
        col(weightCol) < 0,
      raise_error(concat(
        lit("prioritySample portability contract violated: need 0 <= id < 2^33 and weight >= 0, got id="),
        col(idCol).cast("string"), lit(" weight="), col(weightCol).cast("string"))))
      .otherwise((col(weightCol).cast("double") * lit(2147483648.0)) / (h + lit(1L)))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("priority").desc, col(idCol))
    df.withColumn("priority", priority)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select((strataCols.map(col) :+ col(idCol) :+ col(weightCol) :+
        col("priority") :+ col("rank")): _*)
  }

  /** Temperature-flattened mixture allocation (the Pile/ROOTS mixture
    * shape at τ=0.5): apportion exactly `slots` training slots across
    * sources proportionally to √(source size), by Hamilton
    * largest-remainder apportionment in PURE integer arithmetic — the √
    * weights are quantized to BIGINT millionths (sqrt is correctly
    * rounded on every IEEE engine, and quantization makes the share sums
    * order-free), each source gets base = (slots·w) div W, and the
    * `slots − Σbase` leftover slots go to the largest remainders
    * ((slots·w) mod W, ties to source ASC). Σalloc == slots EXACTLY —
    * the invariant float-quota rounding schemes silently break.
    *
    * Scale shape: one partial-aggregating count per source, a single-row
    * total broadcast onto the (tiny) source relation, one bounded window
    * over #sources rows for the remainder ranking. The corpus is scanned
    * once for the counts; everything downstream is dimension-sized.
    */
  def temperatureAllocation(
      df: DataFrame,
      sourceCol: String,
      slots: Long): DataFrame =
    temperatureAllocationManaged(df, sourceCol, slots)._1

  /** [[temperatureAllocation]] plus an explicit release handle for the
    * cached per-source count relation (dimension-sized, but pinned until
    * released). Call AFTER materializing the returned frame; same contract
    * as [[graft.ops.DedupOps.decontaminateBloomManaged]] for long-lived
    * sessions that loop over corpora.
    */
  def temperatureAllocationManaged(
      df: DataFrame,
      sourceCol: String,
      slots: Long): (DataFrame, () => Unit) = {
    require(slots >= 0, "slots must be non-negative")
    // cached: the per-source counts feed the weight total, the leftover
    // aggregate and the final projection — without the barrier the corpus
    // scan runs three times. The returned release handle unpersists it;
    // [[temperatureAllocation]] callers get the legacy contract
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs").cast("double")) * lit(1.0e6)).cast("long"))
      .scopedCache()
    val tot = counts.agg(sum(col("w")).as("tw"))
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("base", expr("(w * cast(" + slots + " as bigint)) div tw"))
      .withColumn("rem", expr("(w * cast(" + slots + " as bigint)) % tw"))
    val leftover = based.agg((lit(slots) - sum(col("base"))).as("lo"))
    val w = Window.orderBy(col("rem").desc, col(sourceCol))
    val alloc = based.crossJoin(broadcast(leftover))
      // bounded window: #sources rows by contract (a mixture IS dimension-sized)
      .withColumn("rk", row_number().over(w))
      .select(
        col(sourceCol), col("n_docs"), col("w"),
        (col("base") + when(col("rk") <= col("lo"), lit(1L)).otherwise(lit(0L))).as("alloc"))
    (alloc, () => { counts.unpersist(); () })
  }

  /** Quota sampling: draw EXACTLY the [[temperatureAllocation]] mixture —
    * each source contributes its apportioned alloc_i documents, selected
    * deterministically by md5(id) order (the [[stratifiedTake]] content-
    * keyed convention, so the drawn set is partition- and engine-stable).
    * The end-to-end "build the eval set the mixture prescribes" step:
    * Σ|sample| == slots exactly whenever every source holds at least its
    * allocation; a source smaller than its quota contributes everything
    * it has (the apportionment caps at √-share, so only tiny sources
    * near-empty sources can under-fill).
    *
    * Scale shape: the allocation is dimension-sized and broadcast; the
    * per-source ranking is one rank-filtered window (WindowGroupLimit
    * prunes at the per-partition sort since alloc_i ≤ slots); the corpus
    * scans once for the counts and once for the ranking.
    */
  def quotaSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      slots: Long): DataFrame = {
    val alloc = temperatureAllocation(df, sourceCol, slots)
      .select(col(sourceCol), col("alloc"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(idCol), col(sourceCol))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .join(broadcast(alloc), Seq(sourceCol))
      .filter(col("sample_rank") <= col("alloc"))
      .select(col(idCol), col(sourceCol), col("sample_rank"))
  }

  /** Deterministic stratified take: within each stratum, keep the first
    * `fraction` of rows under md5(key) order (a content-keyed, reproducible
    * "sample" of every stratum — each stratum keeps ceil(fraction·n) rows).
    */
  def stratifiedTake(
      df: DataFrame, strataCols: Seq[String], keyCol: String, fraction: Double): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val wAll = Window.partitionBy(strataCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") <= ceil(col("__n") * lit(fraction)))
      .drop("__rn", "__n")
  }

  /** Domain-mix rebalancing: downsample each domain so the kept corpus
    * approximates the target weight distribution. The achievable total is
    * set by the limiting domain (budget = min over domains of size/weight —
    * no domain can be upsampled), each domain keeps
    * `min(1, weight·budget/size)` of its rows, and membership is decided by
    * a deterministic integer mix of the row id (Knuth multiplicative hash
    * mod a prime — exact in 64-bit arithmetic on any engine, so the kept
    * set is a pure function of (id, weights), reproducible row-for-row).
    * Domains absent from `weights` (or weighted 0) are dropped.
    *
    * Scale shape: the per-domain stats relation is tiny (|domains| rows) —
    * one partial-aggregating groupBy, then a broadcast join back; the keep
    * decision is a codegen'd filter. Nothing but the stats ever shuffles.
    */
  def rebalanceDomains(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      sizeCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    val wExpr = weights.foldRight(lit(0.0): Column) { case ((d, w), e) =>
      when(col(domainCol) === d, lit(w)).otherwise(e)
    }
    val stats = df.groupBy(col(domainCol)).agg(sum(col(sizeCol)).cast("double").as("__sz"))
      .withColumn("__w", wExpr).filter(col("__w") > 0)
    val budget = stats.agg(min(col("__sz") / col("__w")).as("__budget"))
    val frac = stats.crossJoin(broadcast(budget))
      .withColumn("keep_frac", least(lit(1.0), col("__w") * col("__budget") / col("__sz")))
      .select(col(domainCol), col("keep_frac"))
    // modular multiply: (id * c) mod p == ((id mod p)(c mod p)) mod p, and
    // the reduced form never exceeds ~10^12 — a raw id * c would overflow
    // Long (ANSI abort) for ids above ~3.5e9
    val p = 1000003L
    df.join(broadcast(frac), Seq(domainCol))
      .withColumn("__u",
        pmod(pmod(col(idCol), lit(p)) * lit(2654435761L % p), lit(p))
          .cast("double") / lit(p.toDouble))
      .filter(col("__u") < col("keep_frac"))
      .select(col(idCol), col(domainCol), col(sizeCol), col("keep_frac"))
  }

  /** Sequence packing for LLM pretraining — the concat-then-chunk layout:
    * documents are laid end-to-end in a deterministic order and the token
    * stream is cut every `chunkTokens` tokens, so each document maps to a
    * span `[offset, offset + n_tokens)` of its shard's stream and to the
    * chunk range `[chunk_first, chunk_last]` it lands in (documents may
    * straddle a chunk boundary, exactly like GPT-style packing).
    *
    * Scale shape: a single GLOBAL stream would serialize the cumulative sum
    * through one partition, so packing is SHARDED — `pmod(id, nShards)`
    * picks the shard, and the running sum is a window per shard (at 100 TB,
    * nShards = O(cluster cores) keeps every shard's sort-and-scan local
    * after one shuffle; shard streams are independent training files).
    * Assignment is a pure function of (id, token count), reproducible on
    * any engine/partitioning.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      nShards: Int): DataFrame = {
    // TextOps.tokens, not a raw split: an empty/whitespace-only document
    // must count 0 tokens (raw split yields a phantom [""] = 1 token that
    // would occupy a slot in the packed stream), consistent with n_tokens
    // in the quality/curation operators
    val nTok = size(TextOps.tokens(col(textCol))).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      col(idCol),
      pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
      nTok.as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("start_offset", (col("__cum") - col("n_tokens")))
      .withColumn("chunk_first", floor(col("start_offset") / chunkTokens))
      .withColumn("chunk_last", floor((col("__cum") - 1) / chunkTokens))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
      .drop("__cum")
  }

  /** Weighted epoch upsampling — the complement of [[rebalanceDomains]]'
    * downsampling: repeat each document `weight` times in expectation
    * (training recipes up-sample high-quality or rare-domain sources by
    * non-integer factors). Copies = floor(w) guaranteed + 1 more with
    * probability frac(w), decided by the same Knuth multiplicative hash of
    * the id as rebalanceDomains — exact 64-bit integer arithmetic, so the
    * expansion is a pure function of (id, weight), reproducible row-for-row
    * on any engine (the DuckDB oracle re-derives it). Weight 0 drops the
    * row; output carries `copy_idx` in 1..n_copies so downstream shuffles
    * (e.g. [[shuffleShards]] keyed on (id, copy_idx)) spread the copies.
    *
    * Scale shape: a narrow projection + explode — no shuffle, no UDF; the
    * output volume is sum(weights) rows, which is the point.
    */
  def upsampleByWeight(
      df: DataFrame,
      idCol: String,
      weightCol: String): DataFrame = {
    val p = 1000003L
    val u = pmod(pmod(col(idCol), lit(p)) * lit(2654435761L % p), lit(p))
      .cast("double") / lit(p.toDouble)
    val w = col(weightCol).cast("double")
    val copies = (floor(w) + when(u < w - floor(w), lit(1L)).otherwise(lit(0L)))
      .cast("long")
    df.withColumn("n_copies", copies)
      .filter(col("n_copies") >= 1)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("n_copies"))))
  }

  /** Deterministic global shuffle into training shards: every row gets a
    * `(shard, pos)` address from the md5 of (seed, key) — shard by the hash
    * prefix, position by rank of the full hash within the shard. Training
    * pipelines need the corpus in a reproducible pseudo-random ORDER (curriculum
    * and loss curves must not depend on storage layout); `df.orderBy(rand)` is
    * partitioning-dependent and a full global sort besides.
    *
    * Scale shape: exactly one shuffle — hash-partition by `shard`, sort by the
    * hash WITHIN each shard (`row_number` over a shard-partitioned window; no
    * global ordering anywhere). With nShards = O(total cores) each shard sorts
    * locally and writes one training file; re-running on any cluster layout
    * yields byte-identical shards. The key tiebreaker makes the order total
    * even under md5 collisions.
    */
  def shuffleShards(
      df: DataFrame,
      keyCol: String,
      nShards: Int,
      seed: String = "42"): DataFrame = {
    require(nShards >= 1 && nShards <= 0xffff, "nShards must be in [1, 65535]")
    val h = md5(concat_ws(":", lit(seed), col(keyCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Per-domain document cap (the Common-Crawl-style anti-SEO guard: no
    * single site may dominate the corpus): keep the top `maxPerDomain`
    * documents per domain by (score DESC, id) — deterministic at the cut.
    * Output keeps every surviving row with its `domain_rank`.
    *
    * Scale shape: one hash-partition by domain + per-partition sort; the
    * `row_number <= k` filter is recognized by Spark's WindowGroupLimit
    * rewrite, so each partition keeps a bounded top-k heap instead of
    * sorting its full domain history. A whale domain still lands on one
    * task — for web-scale whales, pre-reduce with the group-top-k
    * aggregator ([[graft.functions.TopKAggregator]] precedent) or salt +
    * re-rank, the same ladder as Merge.lastWinsSalted.
    */
  def capPerDomain(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      scoreCol: String,
      maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, "maxPerDomain must be positive")
    val w = Window.partitionBy(col(domainCol)).orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= maxPerDomain)
  }

  /** Sequence-length bucketing (training-batch shape planning): every
    * document lands in the smallest power-of-two token bucket that holds
    * it, and the per-bucket aggregate reports document count, token mass,
    * the PADDING cost of batching at that bucket length (bucket − n per
    * doc), and the truncation cost of the overflow bucket (−1: docs longer
    * than the largest bound, which would be cut to it). Bucket bounds are a
    * CASE chain over `bounds`, so the assignment is integer-exact on any
    * engine — no log2 round-trip, whose ulp error flips exactly at the
    * powers of two where buckets change.
    *
    * Scale shape: one narrow projection + one tiny aggregation (|bounds|+1
    * groups) with map-side partials.
    */
  def lengthBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bounds: Seq[Int] = Seq(32, 64, 128, 256, 512, 1024, 2048)): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.distinct == bounds,
      "bounds must be ascending and distinct")
    // let-bind the token count: inlined, CollapseProject would re-run the
    // tokenizing split once per CASE branch (|bounds|+1 times per row)
    val packed = DedupOps.bindOnce(size(TextOps.tokens(col(textCol))).cast("long")) { n =>
      struct(
        n.as("n"),
        bounds.reverse.foldLeft(lit(-1L)) { case (acc, b) =>
          when(n <= b, lit(b.toLong)).otherwise(acc)
        }.as("bucket"))
    }
    val maxB = bounds.last.toLong
    df.select(col(idCol), packed.as("__p"))
      .select(col(idCol), col("__p.n").as("__n"), col("__p.bucket").as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("sum_tokens"),
        sum(when(col("bucket") =!= -1L, col("bucket") - col("__n")).otherwise(lit(0L)))
          .as("pad_tokens"),
        sum(when(col("bucket") === -1L, col("__n") - maxB).otherwise(lit(0L)))
          .as("overflow_tokens"))
  }

  /** Overlapping token-window chunking (RAG / long-context training prep):
    * cut each document into windows of `chunkTokens` tokens every
    * `strideTokens` (stride < chunk ⇒ consecutive chunks overlap by
    * `chunkTokens - strideTokens` tokens, the standard boundary-context
    * trick). Chunk count is `1 + ceil(max(0, n - chunk) / stride)` — every
    * token is covered, the final chunk may be short, and an empty document
    * yields one empty chunk (so no document silently disappears).
    *
    * Scale shape: a pure narrow projection — `sequence` + `transform` +
    * `posexplode` inside one whole-stage-codegen span, no shuffle, no UDF;
    * output order and content are a pure function of the row.
    */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1 && strideTokens <= chunkTokens,
      "need 1 <= strideTokens <= chunkTokens")
    // token count per chunk is arithmetic on (n, i), not a re-tokenization
    // of the just-built string — the chunk struct carries it out of the
    // same transform that slices the tokens
    val chunks = DedupOps.bindOnce(TextOps.tokens(col(textCol))) { toks =>
      transform(
        sequence(
          lit(0L),
          ceil(greatest(size(toks).cast("long") - chunkTokens, lit(0L)) /
            lit(strideTokens.toDouble)).cast("long")),
        i => struct(
          least(lit(chunkTokens.toLong),
            greatest(size(toks).cast("long") - i * strideTokens, lit(0L))).as("n"),
          concat_ws(" ", slice(toks, (i * strideTokens + 1).cast("int"), lit(chunkTokens)))
            .as("t")))
    }
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "c")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("c.n").as("n_chunk_tokens"),
        col("c.t").as("chunk_text"))
  }

  /** 2-D Pareto frontier (skyline), MAXIMIZING both integral criteria —
    * multi-criteria curation's "undominated extremes" selector: a row is
    * kept iff no other row is ≥ on both dimensions and > on one.
    * Coordinate-duplicate rows are all kept (neither dominates).
    *
    * The naive skyline is an O(n²) dominance self-join and the textbook
    * single-pass needs a GLOBAL x-sort — both non-starters at corpus
    * scale. This runs in three bounded stages instead: (1) collapse to
    * x-LEVELS — per distinct x, the max y (one keyed shuffle; for
    * fixed-point scores the level relation is bounded by the VALUE DOMAIN,
    * e.g. ≤ 1e6 rows for millionth-quantized quality, regardless of corpus
    * size); (2) cross-bucket prune — levels bucket into the caller's fixed
    * x-geometry ([[Analytics.fixedBin]]), per-bucket y-maxima (nBuckets
    * rows) take a suffix-max over strictly-higher buckets (a window over
    * the nBuckets-row relation — the documented bounded-global-window
    * site), and a level survives only if its y beats every higher bucket's
    * best; (3) within-bucket residual — survivors sort per bucket (x
    * distinct ⇒ all preceding rows have strictly greater x) under a
    * bucket-partitioned running max. Exact, not approximate: a same-bucket
    * dominator pruned by stage 2 implies a higher-bucket dominator that
    * prunes the dominated level too. Frontier levels then equi-join back
    * to recover every row at a frontier coordinate.
    *
    * Output: (idCol, xCol, yCol), one row per undominated input row.
    */
  def paretoFrontier2(
      df: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      xLo: Long,
      xHi: Long,
      nBuckets: Int): DataFrame =
    paretoFrontier2Keyed(df, Seq.empty, idCol, xCol, yCol, xLo, xHi, nBuckets)

  /** [[paretoFrontier2]] computed independently PER KEY GROUP in one pass —
    * every stage gains the key columns (levels per (keys, x), the
    * suffix-max window partitioned by keys, the join-back on
    * (keys, x, y)), so N disjoint batches cost one plan instead of N
    * unioned copies of it. With `keyCols` empty this is exactly
    * [[paretoFrontier2]] (zero-column partitionBy ≡ the documented bounded
    * global window), so the single-frontier consumers' plans are
    * unchanged. Output: (keyCols..., idCol, xCol, yCol) — each key group's
    * rows are exactly `paretoFrontier2(df.filter(keys == g))`.
    */
  def paretoFrontier2Keyed(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      xCol: String,
      yCol: String,
      xLo: Long,
      xHi: Long,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && xHi > xLo, "need nBuckets >= 1 and xHi > xLo")
    val ks = keyCols.map(col)
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(ks ++ Seq(
        col(idCol), col(xCol).cast("long").as(xCol), col(yCol).cast("long").as(yCol)): _*)
      .scopedCache()
    val levels = pts.groupBy(ks :+ col(xCol): _*).agg(max(col(yCol)).as("__ymax"))
      .withColumn("__b", Analytics.fixedBin(xCol, xLo, xHi, nBuckets))
      .scopedCache()
    val wSuf = Window.partitionBy(ks: _*)
      .orderBy(col("__b").desc).rowsBetween(Window.unboundedPreceding, -1)
    val suf = levels.groupBy(ks :+ col("__b"): _*).agg(max(col("__ymax")).as("__bm"))
      .withColumn("__suf", max(col("__bm")).over(wSuf))
      .drop("__bm")
    val wIn = Window.partitionBy(ks :+ col("__b"): _*).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = levels.join(broadcast(suf), keyCols :+ "__b")
      .filter(col("__suf").isNull || col("__ymax") > col("__suf"))
      .withColumn("__pm", max(col("__ymax")).over(wIn))
      .filter(col("__pm").isNull || col("__ymax") > col("__pm"))
      .select(ks ++ Seq(col(xCol), col("__ymax").as(yCol)): _*)
    frontier.join(pts, keyCols ++ Seq(xCol, yCol))
      .select(ks ++ Seq(col(idCol), col(xCol), col(yCol)): _*)
  }
}
