package graft

/** Physical-plan assertions (SURVEY §4): the optimizations we rely on at
  * 100 TB must actually appear in the plan, not just be hoped for. */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("dim joins are broadcast hash joins, not shuffles (q02/q40)") {
    assert(plan("q02_revenue_by_nation").contains("BroadcastHashJoin"))
    val p40 = plan("q40_dim_assembly_multijoin")
    assert(p40.contains("BroadcastHashJoin"))
    assert(!p40.contains("SortMergeJoin")) // fact side shuffles only for the agg
  }

  test("range predicates are pushed to the parquet scan (q08)") {
    val p = plan("q08_filter_range")
    // plan strings truncate long filter lists; match the prefix
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_quantity,3"), p)
  }

  test("filtered vector search pushes the metadata predicate into the scan (q158)") {
    // the production filtered-kNN contract: the label predicate must reach
    // the parquet scan as a pushed filter (row-group stats can skip), not
    // evaluate above the join — and the serving heap then ranks only
    // qualifying rows. On the lake layout this composes with ivf_list
    // partition pruning.
    val p = plan("q158_filtered_knn_serve")
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(label,3)"), p)
  }

  test("hybrid fusion stays bounded: lexical cut is a TopK, lex side broadcasts (q159)") {
    // the two retrievers cut BEFORE fusion: the BM25 global top-20 must
    // plan as TakeOrderedAndProject (never a corpus-wide single-partition
    // window — that was the stated scale contract), and the per-probe
    // replication of the cut list is a broadcast nested loop, not an
    // exchange of the corpus
    val p = plan("q159_hybrid_rrf_serve")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("per-query BM25 plans as a broadcast posting join, never a corpus shuffle of the query side (q162)") {
    // the posting-list contract: the (probe, term) frame and the term
    // universe both BROADCAST onto the corpus-sided aggregates — a
    // sort-merge join keyed on `term` would reshuffle the postings per
    // query batch, exactly what the pre-pruned broadcast shape avoids
    val p = plan("q162_bm25_per_query")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // per-term partial scores are summed map-side before the
    // (probe, doc)-keyed exchange
    assert(p.contains("partial_sum"), p)
  }

  test("per-probe lexical rank is the bounded heap, never a probe-keyed window (q162)") {
    // the r10 top finding, closed: the per-probe rank runs through the
    // TopN Aggregator (ObjectHashAggregate, partial map-side combine →
    // exchange carries <= probes x partitions x n rows); a row_number
    // window keyed only by probe_id would haul a frequent term's whole
    // candidate set to one reducer
    val p = plan("q162_bm25_per_query")
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("proximity family plans are bucket-blocked equi-joins — no nested loop at any term frequency (q168/q169/q170)") {
    // the |pa − pb| <= w band predicate would plan as a broadcast nested
    // loop; the width-w bucket blocking (one side 3×-replicated) makes
    // every pairing a plain (doc, bucket) hash equi-join — pinned here for
    // the pair, overlay-fold, and full-matrix forms
    for (q <- Seq("q168_proximity_pairs", "q169_proximity_overlay",
        "q170_proximity_matrix")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(2000)}")
    }
  }

  test("batched positional plans stay bucket-blocked hash joins — no nested loop, heap-free aggs (q174/q175/q176)") {
    // r12 ask #1: the batch forms fan one tokenize pass out per probe via
    // broadcast probe joins; the pairings stay the same width-w bucket
    // blocking as the scalar forms — a nested loop at any term frequency
    // (or any probe count) would be the batching defeating itself
    for (q <- Seq("q174_phrase_batch", "q175_proximity_batch",
        "q176_passage_batch")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(2000)}")
    }
  }

  test("scan reads only the projected columns (q08 column pruning)") {
    val p = plan("q08_filter_range")
    // ReadSchema must not include unprojected cols like l_shipdate/l_returnflag
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_shipdate"), readSchema)
  }

  test("aggregations are partial (map-side combine) before the shuffle (q01)") {
    val p = plan("q01_agg_pricing")
    assert(p.contains("partial_"), p) // partial_sum/partial_count before Exchange
  }

  test("whole-stage codegen spans the scan+filter pipeline (q08)") {
    // (AQE's initial plan print omits codegen markers on some agg subtrees,
    // so assert on the filter pipeline where they always show)
    assert(plan("q08_filter_range").contains("*(")) // codegen stage markers
  }

  test("semi/anti joins plan as broadcast joins at this dim size (q06/q07)") {
    assert(plan("q06_anti_join").contains("LeftAnti"))
    assert(plan("q07_semi_join").contains("LeftSemi"))
  }

  test("the fused native CosineSim expression appears in the cosine plan (q33)") {
    assert(plan("q33_cosine_topk").toLowerCase.contains("cosinesim"))
  }

  test("global top-k plans as TakeOrderedAndProject, not full sort (q19)") {
    assert(plan("q19_global_topk").contains("TakeOrderedAndProject"))
  }

  test("q53 routes to the bitmap path here — probe bitsets broadcast into a popcount NLJ") {
    // the synthetic corpus's vocab (~916 bigrams) passes every bitmap gate,
    // so q53's plan is the pair scan: corpus bitsets × broadcast(probe
    // bitsets), never a sort-merge shuffle of either side
    val p = plan("q53_containment")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("containment JOIN path broadcasts the probe side — corpus shingles never shuffle") {
    // force the sparse-corpus shape (maxPairScan=0 disqualifies the bitmap
    // pair scan) and pin the plan the 100 TB path must produce: probe
    // shingles broadcast into the corpus scan, no shuffle of corpus shingle
    // rows — the only exchanges are the matched-pair count aggregation and
    // the (tiny, subsequently broadcast) probe-size aggregation
    val docs = Tables.documents(spark, dir)
    val p = operators.Dedup.containmentPairs(
      corpus = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
      probe = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
      "doc_id", "text", shingleN = 2, threshold = 0.2, maxPairScan = 0L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(600))
  }

  test("range join plans as an equi-join on the bucket, not a nested loop (q55)") {
    val p = plan("q55_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(400))
  }

  test("sliding/range window frames run in one shuffle per window spec (q57/q61)") {
    for (q <- Seq("q57_sliding_frame", "q61_time_range_frame")) {
      val p = plan(q)
      // one SHUFFLE exchange keyed on user_id feeds the window — the bare
      // substring would also match BroadcastExchange/ReusedExchange
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"$q: ${p.take(400)}")
    }
  }

  test("simhash banding joins on buckets — no cartesian/NLJ pair scan (q51)") {
    val p = plan("q51_simhash_near_dup")
    assert(!p.contains("CartesianProduct"), p.take(400))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
    // the popcount verify is an expression over the joined rows, not a
    // second pass: exactly the one band equi-join
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).size <= 2, p.take(600))
    // min-band emission replaced the trailing pair distinct: a distinct would
    // compile to HashAggregate(keys=[doc_a, doc_b]) + an exchange over the
    // full pair set — neither may appear; dedup happens streaming in-join
    // (the only HashAggregate allowed is simhash's per-doc bit-sum upstream)
    assert(!"HashAggregate\\(keys=\\[doc_a".r.findAllIn(p).hasNext, p.take(800))
    assert(!"hashpartitioning\\(doc_a".r.findAllIn(p).hasNext, p.take(800))
  }

  test("chunking and PQ are pure scans — no exchange at all (q68/q71)") {
    for (q <- Seq("q68_chunk_overlap", "q71_pq_assign")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q: ${p.take(400)}")
    }
  }

  test("rolling hash is one codegen'd scan, no shuffle, no UDF (q70)") {
    val p = plan("q70_rolling_hash")
    assert(!p.contains("Exchange") && !p.contains("BatchEvalPython"), p.take(400))
    assert(p.contains("*("), p.take(200)) // whole-stage codegen
  }

  test("stratified sample: rank and count share ONE window exchange (q69)") {
    val p = plan("q69_stratified_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(500))
  }

  test("tfidf/bm25 broadcast the 1-row corpus stats, never shuffle them in (q66/q67)") {
    for (q <- Seq("q66_tfidf_topk", "q67_bm25")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$q: ${p.take(400)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(400)}")
    }
  }

  test("kmeans assignment joins centroids broadcast — corpus never shuffles for assign (q72)") {
    val p = plan("q72_kmeans")
    // the only hash exchanges are the k·D-row update aggregations and the
    // final per-vector argmin — the embedding scan side stays unshuffled
    assert(p.contains("BroadcastExchange"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("int8 quantize: the only hash exchange is the dims-row stats agg (q78)") {
    val p = plan("q78_int8_quant")
    // one Exchange hashpartitioning(__d) + one SinglePartition assemble —
    // the corpus side must never hash-shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(600))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(600))
  }

  test("gopher rules are one codegen'd scan — no exchange, no UDF (q80)") {
    val p = plan("q80_gopher_rules")
    assert(!p.contains("Exchange") && !p.contains("BatchEvalPython"), p.take(400))
    assert(p.contains("*("), p.take(200)) // whole-stage codegen
  }

  test("mixture balance filters the scan against broadcast thresholds (q79)") {
    val p = plan("q79_mixture_balance")
    // per-source counts aggregate map-side; the full table joins thresholds
    // via broadcast hash join — never a sort-merge shuffle of the corpus
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
  }

  test("dsir: the bounded bucket table broadcasts — no term-keyed corpus shuffle (q81)") {
    val p = plan("q81_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
  }

  test("dup spans: every exchange is keyed (window hash or doc) — no global sort (q76)") {
    val p = plan("q76_dup_spans")
    assert(!p.contains("Exchange rangepartitioning") && !p.contains("Exchange SinglePartition"),
      p.take(600))
  }

  test("temperature mix: corpus joins bounded stats broadcast — no corpus shuffle (q103)") {
    val p = plan("q103_temperature_mix")
    // the corpus meets the per-stratum stats via broadcast joins; the only
    // exchanges are the bounded stats aggs (per-stratum + the 1-row W total)
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
    assert(!p.contains("Exchange rangepartitioning"), p.take(600))
  }

  test("training order: one keyed window exchange, never a global sort (q104)") {
    val p = plan("q104_training_order")
    assert(p.contains("Exchange hashpartitioning"), p.take(600))
    assert(!p.contains("Exchange rangepartitioning") && !p.contains("Exchange SinglePartition"),
      p.take(600))
  }

  test("percentile band: bounds broadcast back onto the scan (q107)") {
    val p = plan("q107_length_band")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
  }

  test("hard negatives: probe side broadcast, corpus scanned once unshuffled (q105)") {
    val p = plan("q105_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
    // the only hash exchange carries the <=k-per-partition heap rows
    assert(!p.contains("SortMergeJoin"), p.take(600))
  }

  test("oov rate: vocabulary cut is a TakeOrdered, never a global sort (q111)") {
    val p = plan("q111_oov_rate")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("Exchange rangepartitioning"), p.take(600))
  }

  test("centroid outliers: corpus never shuffles — centroids and bounds broadcast (q112)") {
    val p = plan("q112_centroid_outliers")
    assert(!p.contains("SortMergeJoin"), p.take(600))
    assert(!p.contains("Exchange rangepartitioning"), p.take(600))
  }

  test("snapshot diff: hashes computed below the join — the exchange carries (id, md5) only (q108)") {
    val p = plan("q108_snapshot_diff")
    // tree prints parent-above-child: the join sits above the exchanges and
    // the md5 projections sit below them, so the shuffle moves only (id, md5)
    val joinIdx = p.indexOf("SortMergeJoin")
    val exIdx = p.indexOf("Exchange hashpartitioning")
    val md5Idx = p.indexOf("md5(")
    assert(joinIdx >= 0 && exIdx > joinIdx && md5Idx > exIdx,
      s"expected join@$joinIdx < exchange@$exIdx < md5@$md5Idx")
  }

  test("pagerank: contributions partial-agg before the shuffle; no cartesian blowup (q116)") {
    val p = plan("q116_pagerank")
    // per-round groupBy(dst) must map-side combine, and the only nested-loop
    // join allowed is the broadcast of the 1-row node count
    assert(p.contains("partial_sum"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "node-count join must broadcast")
  }

  test("cross-source matrix: label-side scans read (id, source), never text (q117)") {
    val p = plan("q117_cross_source_dups")
    val labelScans = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("source")).toSeq
    assert(labelScans.nonEmpty, p.take(2000))
    assert(labelScans.forall(!_.contains("text")), labelScans.mkString("\n"))
  }

  test("bloom decontaminate: bitmap broadcasts onto the training scan — no shingle shuffle join (q123)") {
    val p = plan("q123_bloom_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "the bitmap probe must broadcast")
    assert(p.contains("partial_"), "per-(doc,shingle) AND per-doc aggs must map-side combine")
  }

  test("multi-probe rerank: probe frame broadcasts; top-k is a TakeOrdered (q124)") {
    val p = plan("q124_multiprobe_rerank")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), "rerank limit must not global-sort")
  }

  test("ivfpq: one pruned scan, broadcast query frame, TakeOrdered (q122)") {
    val p = plan("q122_ivfpq_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "nothing in IVFPQ serving may shuffle-join")
  }

  test("source signatures: min slots partial-agg before the source shuffle (q125)") {
    val p = plan("q125_source_minhash_sim")
    assert(p.contains("partial_min"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "the |sources|-row pair join must broadcast")
  }

  test("unicode normalize is exchange-free — one codegen'd scan (q126)") {
    val p = plan("q126_unicode_normalize")
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("*("), "normalization expressions must stay in codegen")
  }

  test("quality classifier: weights computed in the scan — no join at all (q130)") {
    val p = plan("q130_quality_classifier")
    assert(!p.contains("Join"), "weights must be derived in-scan, never joined")
    assert(p.contains("partial_"), "the per-doc logit sum must map-side combine")
  }

  test("novelty: first-seen table partial-aggs; join fans out linearly (q131)") {
    val p = plan("q131_novelty")
    assert(p.contains("partial_min"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the shingle join must be keyed, never a product")
  }

  test("mad outliers: both stats tables broadcast back onto the scan (q132)") {
    val p = plan("q132_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "bounded stats tables must broadcast")
  }

  test("histogram percentiles: partial-agg histogram, broadcast stats, no shuffle join (q133)") {
    val p = plan("q133_histogram_percentiles")
    assert(p.contains("partial_"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "stats and histogram frames must broadcast")
  }

  test("key skew report: partial-agg counts, TakeOrdered head (q134)") {
    val p = plan("q134_key_skew_report")
    assert(p.contains("partial_count"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), "the top-k head must not global-sort")
  }

  test("char entropy: alphabet-bounded partial agg, doc-keyed joins only (q135)") {
    val p = plan("q135_char_entropy")
    assert(p.contains("partial_"), p.take(2000))
    // counts x totals is a doc-keyed equi-join (shuffle or broadcast both
    // fine at scale); what must NEVER appear is an unkeyed pair scan
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), "no pair blowup")
  }

  test("ngram diversity: gram counts collapse map-side before the shuffle (q136)") {
    val p = plan("q136_ngram_diversity")
    assert(p.contains("partial_"), p.take(2000))
    assert(!p.contains("Sort ["), "no global sort in an agg-only plan")
  }

  test("column profile: each branch scan is pruned to its own column (q137)") {
    val p = plan("q137_column_profile")
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty, p.take(2000))
    // the doc_id branch must not drag text along: parquet prunes per branch
    assert(schemas.exists(s => s.contains("doc_id") && !s.contains("text")), schemas.mkString("\n"))
    assert(p.contains("partial_"), "global agg must map-side combine")
  }

  test("top tokens: one window exchange on the group key, never a global sort (q138)") {
    val p = plan("q138_top_tokens")
    assert(p.contains("partial_count"), p.take(2000))
    // rank window partitions on source — a single keyed exchange feeds it
    assert(p.contains("hashpartitioning"), "window must hash-partition on the group key")
  }

  test("token budget / score calibration: one keyed window exchange, no join, no global sort (q139/q140)") {
    for (q <- Seq("q139_token_budget", "q140_score_calibration")) {
      val p = plan(q)
      assert(p.contains("hashpartitioning(source"), s"$q: window must key on source\n${p.take(1500)}")
      assert(!p.contains("Join"), s"$q must be join-free")
      // the only Sort is the window's per-partition sort under the keyed
      // exchange — a global range-partitioned sort would print rangepartitioning
      assert(!p.contains("rangepartitioning"), s"$q must not global-sort")
    }
  }

  test("media curation skeleton: probes broadcast, corpus never re-shuffled for the kNN (q141)") {
    val p = plan("q141_media_curation")
    // the near-dup pair stage and the kNN candidate stage must both ride
    // broadcasts of the SMALL side (pairs-b / probes) — a SortMergeJoin or
    // range partition here would mean the corpus reshuffles with its size
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "corpus side must not sort-merge")
    assert(!p.contains("rangepartitioning"), "no global sort in the skeleton")
  }

  test("knn serving: the probe batch broadcasts, the corpus never shuffles (q144)") {
    val p = plan("q144_knn_serve")
    // constant 64-probe batch rides ONE BroadcastExchange against a single
    // corpus scan; the only exchange after it carries <= k rows per
    // (probe x partition) into the top-k agg. A SortMergeJoin or a range
    // partition would mean the corpus reshuffles with its size.
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "corpus must not sort-merge for serving")
    assert(!p.contains("rangepartitioning"), "no global sort in the serving path")
    // r13: the probe batch is PINNED (one TakeOrdered cut at checkpoint
    // build; the serve plan reads the 64-row materialized frame) — the
    // corpus TakeOrdered must NOT re-run inside the serve plan
    assert(p.contains("Scan ExistingRDD"),
      "probe batch is no longer pinned — the corpus cut re-runs per reference: " + p.take(1500))
    assert(!p.contains("TakeOrderedAndProject"),
      "probe cut re-executes inside the serve plan instead of reading the pin")
  }

  test("kmeans assignment runs the native NearestCentroid expression (q72/q73)") {
    val p = plan("q72_kmeans")
    assert(p.contains("nearestcentroid") || p.contains("NearestCentroid"),
      "assignment must use the native argmin, not the HOF lambda chain: " + p.take(1500))
  }

  test("incremental hamming ingest: the batch broadcasts, the index only scans") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val newFps = Seq((10L, 7L), (11L, -1L)).toDF("media_id", "dhash")
    val index = graft.operators.Dedup.hammingBandIndex(
      Seq((1L, 7L)).toDF("media_id", "dhash"), "media_id", "dhash", 8, 64)
    val kept = graft.operators.Dedup.incrementalHammingKeep(
      newFps, "media_id", "dhash", index, 8, 64)
    val p = kept.queryExecution.executedPlan.toString
    // both the index probe and the within-batch bucket join must be
    // broadcast-built from the batch side: the lake index never reshuffles
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "index side must not sort-merge")
  }

  test("q120 localizes its bounded overlap matrix: no corpus scan below pagerank") {
    // the LSH candidate pipeline behind the |sources|^2 matrix is referenced
    // from SIX subtrees (both union arms + pagerank's nodes/outw/ew/base);
    // the registration collects the matrix to a LocalRelation, so the
    // executed DAG of the result must contain NO file scan at all — the
    // candidate join can only have run once, during registration
    val df = SparkEntry.queries("q120_source_rank")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
      "q120's rank DAG re-reads the corpus: the matrix is no longer localized")
  }

  test("mmr rerank: ONE greedy fold over per-probe arrays, no per-step joins (q149)") {
    val p = plan("q149_mmr_rerank")
    // r13: the k−1 serialized join/window steps are gone — the greedy
    // selection is a single per-probe fold (explode of the UDF over the
    // collected pool/sim arrays). The plan must show exactly that shape:
    // the fold explode, the two collect_list aggs, the pinned pool (an
    // ExistingRDD scan), and the corpus entering ONLY through the sim
    // pass's self-join (two FileScans — both sides of cand × cand; the
    // pool pass ran once at checkpoint build). No window, no range sort.
    assert(p.contains("Generate explode(UDF"),
      "the greedy fold is gone — per-step joins are back: " + p.take(1500))
    assert(p.contains("collect_list"), p.take(1500))
    assert(p.contains("Scan ExistingRDD"), "the pool pin is gone")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2,
      s"expected <= 2 corpus scans (the sim self-join), got $scans")
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("rangepartitioning"), "no global sort in the rerank")
    assert(!p.contains("row_number"), "per-step windows are back")
  }

  test("sq recall: two corpus scans, stats as literals, top-k never a global sort (q152)") {
    val p = plan("q152_sq8_recall")
    // exact + dequantized sides each scan the corpus once; the 64-row probe
    // batch is PINNED (r13), so its two references read the materialized
    // frame, not the parquet: exactly 2 file scans. The min/max LUT is
    // collected to plan literals, NOT joined (no stats scan, no exchange).
    val scans = p.linesIterator.count(_.contains("ReadSchema"))
    assert(scans == 2, s"expected 2 corpus scans (probe batch pinned), got $scans:\n${p.take(1200)}")
    assert(p.contains("Scan ExistingRDD"), "probe batch pin is gone")
    // per-probe top-k runs through the bounded TopKAgg (ObjectHashAggregate),
    // so no rangepartitioning (global sort) appears anywhere
    assert(!p.toLowerCase.contains("rangepartitioning"), p.take(1500))
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
  }

  test("ivf-sq serving search: pruned single scan, k-row TakeOrdered head (q154)") {
    val p = plan("q154_ivfsq_topk")
    // the list filter prunes BEFORE dequantized scoring; the final top-k is
    // TakeOrderedAndProject (k rows per partition -> driver), never a
    // global sort-exchange of the corpus
    assert(p.contains("TakeOrdered"), p.take(1200))
    assert(!p.toLowerCase.contains("rangepartitioning"), p.take(1500))
    // one corpus scan feeds assignment+dequant+score (stats are literals)
    val scans = p.linesIterator.count(_.contains("ReadSchema"))
    assert(scans == 1, s"expected 1 corpus scan, got $scans")
  }

  test("banded repair decision: band-bucket exchanges only, no pair cartesian (q153)") {
    val p = plan("q153_banded_repair")
    // candidates come from an equi-join on (list, band, bucket) — a hash
    // join, never a cartesian/broadcast-nested-loop pair blowup
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("ivf drift report: two pruned scans, group-count-bounded exchanges (q150)") {
    val p = plan("q150_ivf_drift")
    // one scan per side, each reading ONLY the embedding column
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.size == 2, s"expected 2 scans, got ${scans.size}:\n$p")
    assert(scans.forall(s => s.contains("embedding") && !s.contains("label")),
      scans.mkString("\n"))
    // aggregation is partial before the numLists-row exchange; the final
    // full-outer join of two <= numLists-row sides must not range-partition
    assert(p.contains("partial_"), p.take(1500))
    assert(!p.contains("rangepartitioning"), "no global sort in the report")
  }
}
