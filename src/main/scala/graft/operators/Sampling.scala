package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset-assembly operators for training pipelines: deterministic splits
  * and context-window packing. Everything is hash- or key-derived — no
  * runtime RNG — so splits are reproducible run to run, engine to engine,
  * and a document's assignment never changes when the corpus grows (the
  * property `randomSplit` famously lacks).
  */
object Sampling {

  /** Deterministic train/val/test-style split by id hash: the first 8 md5
    * hex digits of the id, mod 100, compared against cumulative percentage
    * cut points. Stable under corpus growth and across engines (md5, not a
    * seeded hash). `cuts` maps split name -> positive percentage; entries
    * are applied in the given order and must sum to 100. A null id lands in
    * the LAST split (the CASE-fallthrough branch, matching SQL semantics). */
  def hashSplit(id: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    require(cuts.forall(_._2 > 0), "split percentages must be positive")
    val bucket = pmod(TF.md5Prefix32(id.cast("string")), lit(100))
    val cumulative = cuts.scanLeft(0)(_ + _._2).tail
    cuts.map(_._1).zip(cumulative).reverse
      .foldLeft(lit(cuts.last._1)) { case (acc, (name, upTo)) =>
        when(bucket < upTo, lit(name)).otherwise(acc)
      }
  }

  /** LEAKAGE-SAFE split: hashSplit keyed on the near-dup CLUSTER id instead
    * of the document id, so every member of a duplicate cluster lands in
    * the SAME split — the transform that makes q109's split-leakage audit
    * come back empty by construction (Lee et al. 2021 found ~3% of C4's
    * val set leaked into train exactly because splits hashed raw ids).
    * Documents absent from `pairs` are singleton clusters and hash on
    * their own id (identical to plain hashSplit — growth-stable). Cost on
    * top of hashSplit: the cluster resolution (pairs are usually already
    * materialized by the dedup pass) + ONE left join of labels onto the
    * corpus — labels cover only docs that appear in pairs, a small
    * fraction at web scale, so the join broadcasts or shuffles a sliver. */
  def clusterSafeSplit(docs: DataFrame, idCol: String,
                       pairs: DataFrame, aCol: String, bCol: String,
                       cuts: Seq[(String, Int)]): DataFrame =
    clusterSafeSplitFromLabels(docs, idCol,
      Dedup.resolveClusters(pairs, aCol, bCol), cuts)

  /** [[clusterSafeSplit]] over pre-resolved labels (id, cluster_id) — the
    * shared-closure form (see Dedup.bestPerClusterFromLabels). */
  def clusterSafeSplitFromLabels(docs: DataFrame, idCol: String,
                                 labelsRaw: DataFrame,
                                 cuts: Seq[(String, Int)]): DataFrame = {
    val labels = labelsRaw.withColumnRenamed("id", idCol)
    docs.select(col(idCol)).join(labels, Seq(idCol), "left")
      .select(col(idCol),
        hashSplit(coalesce(col("cluster_id"), col(idCol)), cuts).as("split"))
  }

  /** Deterministic WEIGHTED sampling (Poisson/Bernoulli form): keep each row
    * independently with probability p_i = min(1, targetK·w_i / W), giving an
    * expected sample size of ~targetK with inclusion probability
    * proportional to weight — the corpus-subsampling primitive behind
    * quality-weighted data mixing. The coin is the row id's md5 (stable
    * under reruns, growth-independent per id); the inclusion test compares
    * the 32-bit hash integer against p_i·2³² using only IEEE +,·,/ (exactly
    * rounded, hence bit-identical in any engine — deliberately NO pow/ln,
    * whose libm rounding differs across engines; the expectation-exact
    * tradeoff is the same one mixtureBalance documents). W is the exact
    * DECIMAL weight total cast to double once, broadcast as a 1-row frame —
    * one partial-agg pass plus one scan, no shuffle of the corpus. Rows
    * with null/NaN/non-positive weight are excluded; so are rows with a
    * null id (no id, no coin — the null comparison is never true). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     targetK: Long): DataFrame = {
    require(targetK >= 1, s"targetK must be >= 1, got $targetK")
    val w = weightCol.cast("double")
    // NaN sorts ABOVE every double in Spark comparisons, so `> 0.0` alone
    // would admit NaN weights (and a NaN coin threshold admits every row)
    val totals = df.select(w.as("__w"))
      .filter(col("__w").isNotNull && !isnan(col("__w")) && col("__w") > 0.0)
      // scale 18, not 6: a corpus of tiny weights (< 5e-7) would truncate
      // every addend to 0.000000, zero W, and keep EVERY row through the
      // null-skipping least(); 20 integer digits still hold any real sum
      .agg(sum(col("__w").cast(DecimalType(38, 18))).cast("double").as("__W"))
    df.filter(w.isNotNull && !isnan(w) && w > 0.0)
      .crossJoin(broadcast(totals))
      .filter(col("__W") > 0.0) // a zero/absent total keeps nothing, not all
      .withColumn("__p", least(lit(1.0), lit(targetK.toDouble) * w / col("__W")))
      .filter(TF.md5Prefix32(col(idCol).cast("string")).cast("double") <
        col("__p") * lit(4294967296.0))
      .drop("__W", "__p")
  }

  /** Stratified top-fraction sampling: within each stratum keep the best
    * `num/den` fraction of rows by `scoreCol` (ties broken by the unique
    * `tieCol`, so the cut is a total order). The keep test `rn·den <= n·num`
    * is pure integer arithmetic — no float rank boundary to diverge between
    * engines or runs. One shuffle on the stratum key; count and row_number
    * share the same window exchange. Deterministic under reruns AND under
    * per-stratum growth of the corpus (unlike sampleBy's RNG). */
  def stratifiedTopFrac(df: DataFrame, strataCol: String, scoreCol: Column,
                        tieCol: String, num: Int, den: Int): DataFrame = {
    require(num >= 1 && den >= num, s"fraction num/den must be in (0,1], got $num/$den")
    val w = Window.partitionBy(col(strataCol)).orderBy(scoreCol.desc, col(tieCol))
    val wc = Window.partitionBy(col(strataCol))
    // row_number() is IntegerType: widen BEFORE multiplying, or a stratum
    // beyond Int.MaxValue/den rows wraps negative and silently passes the cut
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wc))
      .filter(col("__rn") * den <= col("__n") * num)
      .drop("__rn", "__n")
  }

  /** Deterministic mixture balancing: thin each stratum (source/domain) so
    * the kept corpus approaches target mixture `weights` (name -> percent,
    * summing to 100) — the data-mixing step of pre-training corpus assembly
    * (e.g. The Pile's per-source weights, Gao et al. 2021). The output size
    * is the largest C such that no stratum is oversampled: C = min_s
    * floor(100·n_s / pct_s); stratum s then keeps ≈ pct_s·C/100 rows via an
    * md5-bucket threshold — the same hash gate as [[hashSplit]], so
    * membership is reproducible run to run, and NESTED under corpus growth:
    * a stratum's threshold only moves monotonically, so rows slide in or
    * out at the boundary — never an arbitrary reshuffle (in particular,
    * while the limiting stratum is unchanged, other strata growing leaves
    * every prior keep decision intact). Keeps are exact in expectation
    * (hash thinning), not exact quotas: exact quotas need a per-stratum
    * rank, which is a single-reducer sort per stratum at corpus scale.
    * All threshold arithmetic is 64-bit integer (pct·10⁴ ≤ 10⁶ times
    * C ≤ n rows stays < 2⁶³ up to ~10¹² rows) — no float rank boundary.
    * Strata absent from `weights` are dropped. A WEIGHTED stratum absent
    * from the DATA makes the target mixture unsatisfiable — its n_s = 0
    * forces C = 0 and the output is EMPTY, per the formula, rather than
    * silently rebalancing over the strata that happen to exist. Plan: one
    * partial-agg count per stratum, two tiny broadcasts, one scan filter —
    * no big shuffle. */
  def mixtureBalance(df: DataFrame, strataCol: String, idCol: String,
                     weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100, "mixture percentages must sum to 100")
    require(weights.forall(_._2 > 0), "mixture percentages must be positive")
    require(weights.map(_._1).distinct.size == weights.size, "duplicate stratum")
    val s = df.sparkSession
    import s.implicits._
    val wdf = weights.toDF(strataCol, "__pct")
    // LEFT join from the weights: a weighted stratum with no rows stays
    // visible with __ns = 0, so it participates in (and zeroes) the min
    val counts = broadcast(wdf)
      .join(df.groupBy(col(strataCol)).agg(count(lit(1)).as("__ns")), Seq(strataCol), "left")
      .withColumn("__ns", coalesce(col("__ns"), lit(0L)))
    // `div` (not `/`): exact BIGINT division — double division loses integer
    // precision past 2^53 and the floor would be wrong near boundaries
    val cfloor = counts.select(min(expr("(100 * __ns) div __pct")).as("__cf"))
    val th = counts.filter(col("__ns") > 0).crossJoin(broadcast(cfloor))
      .select(col(strataCol), expr("(__pct * 10000 * __cf) div __ns").as("__th"))
    df.join(broadcast(th), strataCol)
      .filter(pmod(TF.md5Prefix32(col(idCol).cast("string")), lit(1000000L)) < col("__th"))
      .drop("__th")
  }

  /** Greedy TOKEN-BUDGET selection per group: walk each group's documents
    * in `order` and keep every document while the RUNNING token total stays
    * within `budgetTokens` — the "cap each source at N tokens" step of
    * mixture assembly (the token-denominated sibling of [[mixtureBalance]]'s
    * row caps; budgets are how mixtures are actually specified for LM
    * training). Prefix semantics by construction: token counts are
    * non-negative so the running sum is monotone, and the cum <= budget
    * filter keeps exactly the maximal in-order prefix that fits — no
    * knapsack re-ordering, so selection is stable when the corpus grows
    * past the budget. One window exchange on the group key; the running
    * sum is computed per-partition after that exchange, so cost is one
    * shuffle of (group, order, n_tokens) rows regardless of budget. */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, textCol: String,
                        groupCol: String, budgetTokens: Long,
                        order: Seq[Column]): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .withColumn("n_tokens", TF.tokenCount(col(textCol)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(groupCol), col(idCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Per-group SCORE CALIBRATION by rank: percent_rank of `score` within
    * the row's own group over a TOTAL order (score, then id) — the
    * source-fair quality threshold. Raw scores aren't comparable across
    * sources (a median academic doc outscores a good forum post), so
    * filtering on a raw global threshold silently skews the mixture toward
    * high-scoring sources; rank-calibrated scores make "keep the top 30%"
    * mean the same thing in every source. One window exchange on the group
    * key, engine-exact ranks via the id tie-break. */
  def scoreCalibration(docs: DataFrame, idCol: String, groupCol: String,
                       score: Column): DataFrame = {
    // asc_nulls_last: Spark's bare asc sorts NULLS FIRST while ANSI/DuckDB
    // ASC is NULLS LAST — a nullable score would silently shift every
    // percent_rank. Dormant with today's non-null n_chars, fatal otherwise.
    val w = Window.partitionBy(col(groupCol))
      .orderBy(score.asc_nulls_last, col(idCol).asc_nulls_last)
    docs
      .withColumn("calibrated", round(percent_rank().over(w), 6))
      .select(col(groupCol), col(idCol), score.as("score"), col("calibrated"))
  }

  /** Split-leakage audit: near-duplicate pairs that STRADDLE a train/val/
    * test boundary — the held-out set is only held out if no near-copy of
    * its members sits in training (Lee et al. 2021 measured this exact
    * leak on C4). `pairs` is any near-dup pair table (LSH candidates or
    * verified pairs); `splits` maps id → split name. Two keyed joins onto
    * the pair table (pairs ≪ corpus, so this is cheap at any scale) and a
    * mismatch filter; an empty result is the green light. Output:
    * (aCol, bCol, split_a, split_b). */
  def crossSplitPairs(pairs: DataFrame, aCol: String, bCol: String,
                      splits: DataFrame, idCol: String,
                      splitCol: String): DataFrame =
    pairs
      .join(splits.select(col(idCol).as(aCol), col(splitCol).as("split_a")), aCol)
      .join(splits.select(col(idCol).as(bCol), col(splitCol).as("split_b")), bCol)
      .filter(col("split_a") =!= col("split_b"))
      .select(col(aCol), col(bCol), col("split_a"), col("split_b"))

  /** Temperature-scaled source mixing at α = 1/2 (the mC4/T5 mixing rule,
    * Raffel 2020 §3.4.1 / Xue 2021 §3.2): stratum s keeps each row with
    * probability p_s = min(1, K·w_s / (W·n_s)) where w_s = ⌊√n_s⌋ and
    * W = Σ w_s, so kept mass ∝ √n_s — heavy sources are damped, tail
    * sources up-weighted, expected output ≈ K rows. The weight is the
    * INTEGER square root on purpose: w_s and W stay exact BIGINTs (a float
    * Σ√n_s would depend on summation order), and the only float arithmetic
    * is one fixed-shape (K·w)/(W·n) expression over exactly-representable
    * integers — IEEE-identical in any engine. Inclusion is the same md5
    * coin as [[weightedSample]]: reproducible run to run, per-id stable.
    * Plan: one partial-agg count per stratum (bounded rows), two tiny
    * broadcasts, one corpus scan — no corpus shuffle at any scale. Rows
    * whose stratum is null are dropped (the equi-join semantics both
    * engines share); √ of a count is exact in doubles below 2⁵³ rows. */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
                     targetK: Long): DataFrame = {
    require(targetK >= 1, s"targetK must be >= 1, got $targetK")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("__ns"))
      .withColumn("__ws", floor(sqrt(col("__ns").cast("double"))).cast("long"))
    val total = counts.agg(sum(col("__ws")).as("__W"))
    df.join(broadcast(counts), strataCol)
      .crossJoin(broadcast(total))
      .withColumn("__p", least(lit(1.0),
        (lit(targetK.toDouble) * col("__ws").cast("double"))
          / (col("__W").cast("double") * col("__ns").cast("double"))))
      .filter(TF.md5Prefix32(col(idCol).cast("string")).cast("double") <
        col("__p") * lit(4294967296.0))
      .drop("__ns", "__ws", "__W", "__p")
  }

  /** Deterministic training-order shuffle: the reproducible global
    * permutation a training run reads, materialized as (shard, pos) — read
    * shards in index order, rows within a shard in pos order, and every
    * engine/run/restart sees the identical sequence for a given seed
    * (different seed ⇒ independent permutation; this is the per-epoch
    * reshuffle). The coin is md5(seed ‖ ":" ‖ id); shard = coin mod
    * `shards`, pos = row_number by (coin, id) within the shard. One
    * exchange on shard (shard count = write parallelism) and per-shard
    * sorts — deliberately NOT a global row_number, whose single-partition
    * window is the classic driver-melting anti-pattern at corpus scale. */
  def trainingOrder(df: DataFrame, idCol: String, shards: Int,
                    seed: Long): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val coin = TF.md5Prefix32(concat(lit(seed.toString), lit(":"),
      col(idCol).cast("string")))
    val w = Window.partitionBy(col("__shard")).orderBy(col("__coin"), col(idCol))
    df.withColumn("__coin", coin)
      .withColumn("__shard", pmod(col("__coin"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumnRenamed("__shard", "shard")
      .drop("__coin")
  }

  /** Class-balanced downsampling: every label class cut to the size of the
    * SMALLEST class (the classifier-training balance step), membership
    * decided by an md5-coin rank within the class — deterministic across
    * runs and engines, unlike an RNG `sampleBy`. Two bounded aggregates
    * (per-class counts → min) broadcast back; one exchange on the label for
    * the in-class rank window. Null-label rows form their own class, same
    * as both engines' GROUP BY/PARTITION BY null semantics. */
  def classBalance(df: DataFrame, labelCol: String, idCol: String): DataFrame = {
    val m = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__c"))
      .agg(min(col("__c")).as("__m"))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(TF.md5Prefix32(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(m))
      .filter(col("__rn") <= col("__m"))
      .drop("__rn", "__m")
  }

  /** Per-stratum discrete-percentile band filter: keep rows whose value
    * lies within [P_lo, P_hi] of their OWN stratum's distribution — the
    * per-language length-outlier trim every curation pipeline runs (too
    * short = boilerplate, too long = concatenation junk; CCNet/RefinedWeb
    * both cut by length percentile per language). DISCRETE percentiles
    * (actual elements, `percentile_disc`) so the bounds are
    * engine-divergence-free — no interpolation arithmetic to disagree on.
    * The bounds table is one partial-agg shuffle keyed on the stratum
    * (bounded rows: one per stratum) broadcast back onto a single corpus
    * scan. Rows with a null value or null stratum are dropped (no defined
    * band), matching the SQL join+BETWEEN semantics. */
  def percentileBand(df: DataFrame, strataCol: String, valueCol: String,
                     lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val bounds = df.groupBy(col(strataCol)).agg(
      expr(s"percentile_disc($lo) WITHIN GROUP (ORDER BY $valueCol)").as("__lo"),
      expr(s"percentile_disc($hi) WITHIN GROUP (ORDER BY $valueCol)").as("__hi"))
    df.join(broadcast(bounds), strataCol)
      .filter(col(valueCol).between(col("__lo"), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Robust outlier flags by median/MAD — the robust-statistics twin of the
    * z-score: a value is flagged when |x − median| > k·MAD, where MAD is
    * the median absolute deviation within the row's own stratum. Unlike
    * mean/stddev, both statistics are DISCRETE order statistics: immune to
    * the very outliers being hunted, exact integers when `valueCol` is an
    * integer (every comparison is integer arithmetic — no float tie can
    * diverge between engines), and percentile_disc-parity with DuckDB's
    * quantile_disc is already house-established (q58/q107/q112). Two
    * grouped percentile passes over a BOUNDED strata set; the (stratum,
    * med, mad) table broadcasts back onto one scan. */
  def madOutliers(df: DataFrame, strataCol: String, valueCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Spark's percentile_disc widens to double; the selected value IS one of
    // the inputs, so casting back to the value type is exact — and keeps the
    // output schema (and all comparisons) integral for integer inputs,
    // matching DuckDB's type-preserving quantile_disc
    val vType = df.schema(valueCol).dataType
    val med = df.groupBy(col(strataCol)).agg(
      expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $valueCol)")
        .cast(vType).as("med"))
    val dev = df.join(broadcast(med), strataCol)
      .withColumn("__ad", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(col(strataCol)).agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __ad)")
        .cast(vType).as("mad"))
    dev.join(broadcast(mad), strataCol)
      .withColumn("is_outlier", col("__ad") > lit(k) * col("mad"))
      .drop("__ad")
  }

  /** Approximate percentiles by FIXED-WIDTH histogram — the mergeable,
    * partial-agg-able answer when `percentile_disc`'s per-group value
    * buffering stops fitting (the very limitation madOutliers/percentileBand
    * document): the corpus collapses to a ≤`bins`-row count histogram (one
    * partial-agg shuffle), and each requested percentile resolves to its
    * bucket's exact integer [lo, hi] bounds — error bounded by bin width,
    * ENTIRELY in int64 arithmetic (bucket = (v−min)·bins div span; rank
    * test 100·cum ≥ pct·n avoids ceil), so the result is bit-identical in
    * any engine and under any partitioning, which seeded/interpolating
    * approx_percentile implementations are not. Two passes (min/max/count,
    * then histogram) — the price of fixed bins; a production pipeline reuses
    * stored stats. The cumulative window runs over ≤ bins rows (bounded,
    * single-partition by design — same contract as the vocab-id windows).
    * Requires (max−min+1)·bins < 2⁶³. Output per pct: (pct, bucket, lo, hi,
    * cum_count, n) with the true pct-th value guaranteed inside [lo, hi]. */
  def histogramPercentiles(df: DataFrame, valueCol: String, bins: Int,
                           pcts: Seq[Int]): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("long")
    val stats = df.agg(min(v).as("__mn"), max(v).as("__mx"), count(v).as("__n"))
    val hist = df.select(v.as("__v")).where(col("__v").isNotNull)
      .crossJoin(broadcast(stats))
      .select(expr(s"((__v - __mn) * $bins) div (__mx - __mn + 1)").as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(w))
      .crossJoin(broadcast(stats))
    pcts.toDF("pct")
      .join(broadcast(cum), expr("__cum * 100 >= pct * __n"))
      .groupBy(col("pct"))
      .agg(min(struct(col("__b"), col("__cum"), col("__mn"), col("__mx"),
        col("__n"))).as("__best"))
      .select(col("pct"), col("__best.__b").as("bucket"),
        expr(s"__best.__mn + ((__best.__b * (__best.__mx - __best.__mn + 1) + ${bins - 1}) div $bins)")
          .as("lo"),
        expr(s"__best.__mn + (((__best.__b + 1) * (__best.__mx - __best.__mn + 1) + ${bins - 1}) div $bins) - 1")
          .as("hi"),
        col("__best.__cum").as("cum_count"), col("__best.__n").as("n"))
  }

  /** Contiguous per-shard context-window packing: documents are sharded by
    * id hash, and within each shard assigned to consecutive token-budget
    * bins by running token count. One partitioned window — no global sort,
    * no driver loop — which is what makes packing viable at corpus scale
    * (true first-fit-decreasing is inherently sequential; per-shard
    * contiguous fill is the standard distributed approximation, and shard
    * count = parallelism). A document is labeled by the bin its FIRST token
    * falls in; an over-budget document overflows that bin, and the next
    * boundary realigns at the following budget multiple (so subsequent bins
    * stay budget-aligned) — callers chunk oversized docs upstream if strict
    * per-bin caps are required. */
  def contiguousBins(docs: DataFrame, idCol: String, textCol: String,
                     shards: Int, tokenBudget: Long): DataFrame = {
    require(shards >= 1 && tokenBudget >= 1)
    val shard = pmod(TF.md5Prefix32(col(idCol).cast("string")), lit(shards))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), shard.as("shard"),
        TF.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // a doc is labeled by the bin it STARTS in (tokens before it / budget):
      // bins start at 0 in every shard and zero-token docs can't go negative.
      // div, not /: double division loses integer exactness past 2^53 and a
      // boundary doc could land in the wrong bin (mixtureBalance's rule)
      .withColumn("bin",
        expr(s"(cum_tokens - n_tokens) div $tokenBudget").cast("long"))
      .select(idCol, "shard", "n_tokens", "bin")
  }
}
