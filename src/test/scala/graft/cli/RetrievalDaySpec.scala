package graft.cli

import graft.SparkSpec
import graft.domain.{LexLake, Retrieval, VectorLake}
import org.apache.spark.sql.functions.col

/** The composed retrieval-day smoke: all three lakes build from the driver
  * testdata, the hybrid serve answers, a cross-store purge never resurfaces
  * (not even through the reconcile fold), and a cross-store edit serves by
  * its new content through maintenance. */
class RetrievalDaySpec extends SparkSpec {

  test("retrieval day: build, serve, purge, edit, reconcile — the day survives its maintenance") {
    val workDir = java.nio.file.Files.createTempDirectory("retday").toString
    val r = RetrievalDay.run(spark, workDir, "/root/testdata/sf0.001")
    assert(r("lex_docs") == 500L, "every sf0.001 document is lexically resident")
    assert(r("lex_postings") > 500L)
    assert(r("vector_ingested") > 0L && r("dedup_keeps") > 0L)
    // 4 probes x k=5 fused rows, before and after purge and reconcile
    assert(r("hybrid_results") == 20L)
    assert(r("post_purge_hybrid") == 20L)
    assert(r("post_reconcile_hybrid") == 20L)
    assert(r("purged") == 2L && r("purged_lex") == 2L)
    assert(r("purge_leaks") == 0L && r("post_reconcile_purge_leaks") == 0L,
      "a purge must hold through the serve AND the fold")
    assert(r("edits_applied") == 1L)
    assert(r("zebra_hits") == 1L && r("post_reconcile_zebra_hits") == 1L,
      "the edit serves by its new content, before and after the fold")
    // round-11 surface: the health report feeds the impact threshold, the
    // fold adopts the tier behind the measured gate, the impact read
    // serves (the df-1 edit term exactly), and the snapshot-pinned serve
    // equals the unpinned one once every overlay is folded
    assert(r("health_buckets") > 0L && r("health_max_top_df") > 0L)
    assert(r("impact_adopted") == 1L,
      s"the gate must adopt (measured ${r("impact_recall_micros")} micros)")
    assert(r("impact_recall_micros") >= 50000L)
    assert(r("impact_results") > 0L)
    assert(r("impact_zebra_hits") == 1L,
      "an uncapped term serves exactly through the impact path")
    assert(r("pinned_hybrid") == r("post_reconcile_hybrid"),
      "with overlays folded, the pinned pair serves the same answers")
    // round-12 surface: the PRF two-pass serve answers, the freshly
    // folded tier passes the strictest staleness bound, the phrase-gated
    // hybrid serves exactly the quote-bearing edit, and the stored
    // positions answer the proximity read
    assert(r("prf_results") > 0L)
    assert(r("impact_fresh_results") > 0L)
    assert(r("phrase_hybrid_hits") == 1L,
      "the quote-bearing edited doc must serve through the phrase gate")
    assert(r("proximity_hits") == 1L,
      "the edit's adjacent tokens must co-occur via the stored positions")
    // round-13 surface: the batched positional serves answer whole probe
    // batches from one pruned read; the proximity-weighted rank and the
    // impact-tier PRF read serve
    assert(r("phrase_batch_hits") == 2L,
      "both phrase probes must hit the edited doc from one batched read")
    assert(r("proximity_batch_hits") == 2L)
    assert(r("passage_batch_hits") == 1L)
    assert(r("proximity_rank_results") > 0L)
    assert(r("prf_impact_results") > 0L)
  }

  test("snapshot pinning: a half-fanned-out edit cannot fuse mismatched corpus views") {
    // the r10 verdict ask: hybridServe resolves each lake independently, so
    // an edit that reached only ONE store fuses its new text against the
    // other store's old state. currentSnapshot reads both pointers once;
    // hybridServeAt serves the pinned pair's COMMITTED generations (the
    // lex arm skips the uncommitted root overlays), so the torn window is
    // invisible to a pinned serve and explicit in an unpinned one.
    import spark.implicits._
    def unit(deg: Double, scale: Float = 1f): Array[Float] = {
      val r = math.toRadians(deg)
      Array((math.cos(r) * scale).toFloat, (math.sin(r) * scale).toFloat)
    }
    val base = java.nio.file.Files.createTempDirectory("retsnap").toString
    val (vroot, lroot) = (s"$base/vector", s"$base/lex")
    VectorLake.init(spark, vroot, Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)))
    VectorLake.ingest(spark, vroot, Seq(
      (1L, unit(0)), (2L, unit(45, 14f)), (3L, unit(90)))
      .toDF("vec_id", "embedding"))
    LexLake.ingest(spark, lroot, Seq(
      (1L, "alpha beta gamma"),
      (2L, "old second body here"),
      (3L, "third unrelated entry")).toDF("doc_id", "text"), nBuckets = 4)
    // commit the lexical state: the snapshot pins generations, and a
    // never-reconciled lex store has none yet
    LexLake.reconcile(spark, lroot)
    val probe = Seq((7L, unit(10), Seq("marker")))
      .toDF("probe_id", "embedding", "terms")
    val snap = graft.Engine.retrievalSnapshot(spark, vroot, lroot)
    assert(snap == Retrieval.Snapshot(Some(0L), Some(0L)))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val pinnedBefore = rows(graft.Engine.hybridServeAt(
      spark, vroot, lroot, snap, probe, k = 5))
    // the torn fan-out: the edit lands in the LEX lake only (a LakeSync
    // propagate crashed before the other arm) — new text says "marker"
    LexLake.upsert(spark, lroot,
      Seq((2L, "zzz special marker words")).toDF("doc_id", "text"))
    val pinned = graft.Engine.hybridServeAt(
      spark, vroot, lroot, snap, probe, k = 5)
    val unpinned = graft.Engine.hybridServe(
      spark, vroot, lroot, probe, k = 5)
    // pinned pair: byte-identical to the pre-edit serve — the half-landed
    // edit is invisible, both arms agree on the committed corpus
    assert(rows(pinned) == pinnedBefore,
      "the pinned pair must serve the committed state on both arms")
    // unpinned serve: the window, explicit — doc 2 gains exactly the
    // lexical rank-1 reciprocal (floor(1e6/(60+1)) = 16393 micros) from
    // text the vector arm has never seen
    def rrfOf(s: Set[(Long, Long, Long, Long)], nid: Long): Long =
      s.collectFirst { case (_, n, m, _) if n == nid => m }.get
    assert(rrfOf(rows(unpinned), 2L) == rrfOf(pinnedBefore, 2L) + 16393L)
  }

  test("a propagate landing mid-pinned-batch leaves the pinned serve byte-identical on BOTH arms") {
    // the r11 verdict's top ask, closed: VectorLake.upsert used to rewrite
    // the CURRENT generation's leaves in place, so a pinned snapshot froze
    // the lexical arm but served the doc's NEW embedding against the
    // pinned OLD text — the exact mismatched view the pin exists to
    // prevent, inverted. Both lakes now route deletes AND upserts through
    // root overlays that pinned reads skip: a full LakeSync.propagate
    // (purge + paired re-embed/re-text) lands mid-batch and the pinned
    // pair's answers do not move by a byte; the unpinned serve sees both
    // mutations immediately; a post-fold re-pin serves the folded state.
    import spark.implicits._
    import graft.domain.LakeSync
    def unit(deg: Double, scale: Float = 1f): Array[Float] = {
      val r = math.toRadians(deg)
      Array((math.cos(r) * scale).toFloat, (math.sin(r) * scale).toFloat)
    }
    val base = java.nio.file.Files.createTempDirectory("retprop").toString
    val (vroot, lroot) = (s"$base/vector", s"$base/lex")
    val (sroot, droot) = (s"$base/sync", s"$base/dedup")
    graft.domain.DedupLake.ingest(spark, droot, Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "old second body here"),
      (3L, "third unrelated entry")).toDF("doc_id", "text"))
    VectorLake.init(spark, vroot, Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)))
    VectorLake.ingest(spark, vroot, Seq(
      (1L, unit(0)), (2L, unit(45, 14f)), (3L, unit(90)))
      .toDF("vec_id", "embedding"))
    LexLake.ingest(spark, lroot, Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "old second body here"),
      (3L, "third unrelated entry")).toDF("doc_id", "text"), nBuckets = 4)
    // commit BOTH stores so the snapshot pins real generations
    VectorLake.reconcile(spark, vroot, k = 2, iters = 3)
    LexLake.reconcile(spark, lroot)
    val probe = Seq((7L, unit(10), Seq("marker")))
      .toDF("probe_id", "embedding", "terms")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val snap = Retrieval.currentSnapshot(spark, vroot, lroot)
    val pinnedBefore = rows(Retrieval.hybridServeAt(
      spark, vroot, lroot, snap, probe, k = 5))
    // the phrase-gated pinned serve reads the SAME pinned view (gate
    // included): frozen across the propagate too
    val pinnedPhraseBefore = rows(Retrieval.hybridServeAt(
      spark, vroot, lroot, snap, probe, k = 5,
      phrase = Seq("second", "body")))
    assert(pinnedPhraseBefore.nonEmpty, "the committed corpus carries the quote")
    // the propagate, mid-pinned-batch: purge doc 3 AND re-embed+re-text
    // doc 2 (its new embedding is the probe's own direction; its new text
    // carries the probe's term)
    LakeSync.requestDelete(spark, sroot, Seq(3L).toDF("doc_id"))
    LakeSync.requestUpsert(spark, sroot,
      Seq((2L, "zzz special marker words", unit(10, 14f)))
        .toDF("doc_id", "text", "embedding"))
    val rep = LakeSync.propagate(spark, sroot, droot, vroot,
      lexRoot = Some(lroot))
    assert(rep.requested == 1L && rep.upsertsApplied == 1L
      && rep.vectorDeleted == 1L && rep.lexDeleted == 1L)
    // the pinned pair: byte-identical on BOTH arms — the vector arm did
    // not see the re-embed (the old leaf-rewrite design failed exactly
    // here), the lex arm did not see the purge or the new text
    assert(rows(Retrieval.hybridServeAt(
        spark, vroot, lroot, snap, probe, k = 5)) == pinnedBefore,
      "a propagate mid-pinned-batch must not move the pinned pair by a byte")
    assert(rows(Retrieval.hybridServeAt(
        spark, vroot, lroot, snap, probe, k = 5,
        phrase = Seq("second", "body"))) == pinnedPhraseBefore,
      "the pinned phrase gate must read the pinned view too — the re-text " +
        "(which removed the quote) is invisible until the fold")
    // the UNPINNED serve carries both mutations immediately: doc 3 gone,
    // doc 2 at vector rank 1 (cos 1 with the probe) AND lexical rank 1
    val unpinned = rows(Retrieval.hybridServe(spark, vroot, lroot,
      probe, k = 5))
    assert(!unpinned.exists(_._2 == 3L), "the purge serves immediately")
    assert(unpinned.exists { case (_, n, _, r) => n == 2L && r == 1L },
      s"the re-embedded+re-texted doc must fuse first: $unpinned")
    // both folds commit; a re-taken snapshot serves the folded mutations
    VectorLake.reconcile(spark, vroot, k = 2, iters = 3)
    LexLake.reconcile(spark, lroot)
    val snap2 = Retrieval.currentSnapshot(spark, vroot, lroot)
    assert(rows(Retrieval.hybridServeAt(
        spark, vroot, lroot, snap2, probe, k = 5))
      == rows(Retrieval.hybridServe(spark, vroot, lroot, probe, k = 5)),
      "with overlays folded, the re-pinned pair equals the unpinned serve")
  }

  test("streaming hybrid serve: one pinned snapshot per epoch, re-resolved across a reconcile") {
    // the r10 ask: the per-lake serve twins existed, nothing served the
    // FUSED endpoint per micro-batch. Each epoch pins one (vectorGen,
    // lexGen) pair; a half-landed edit (overlay) is invisible until its
    // fold commits, and the fold is picked up at the NEXT epoch — the
    // epoch-level pointer re-resolution, proven mid-stream.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def unit(deg: Double, scale: Float = 1f): Array[Float] = {
      val r = math.toRadians(deg)
      Array((math.cos(r) * scale).toFloat, (math.sin(r) * scale).toFloat)
    }
    val base = java.nio.file.Files.createTempDirectory("retstream").toString
    val (vroot, lroot) = (s"$base/vector", s"$base/lex")
    VectorLake.init(spark, vroot, Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)))
    VectorLake.ingest(spark, vroot, Seq(
      (1L, unit(0)), (2L, unit(45, 14f)), (3L, unit(90)))
      .toDF("vec_id", "embedding"))
    LexLake.ingest(spark, lroot, Seq(
      (1L, "alpha beta gamma"),
      (2L, "old second body here"),
      (3L, "third unrelated entry")).toDF("doc_id", "text"), nBuckets = 4)
    LexLake.reconcile(spark, lroot)
    // (neighbor, rrf_micros, rank) modulo the probe id — the probe vector
    // and terms are identical across epochs, only the id differs
    def shape(rs: Iterable[(Long, Long, Long, Long)]): Set[(Long, Long, Long)] =
      rs.map { case (_, n, m, r) => (n, m, r) }.toSet
    val input = MemoryStream[(Long, Array[Float], Seq[String])]
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long, Long)]]
    val q = graft.streaming.Streams.retrievalServeStream(
        input.toDF().toDF("probe_id", "embedding", "terms"),
        vroot, lroot, k = 5) { (_, df) =>
      val rs = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      got.synchronized {
        for ((pid, grp) <- rs.groupBy(_._1)) got(pid) = grp.toSet
        ()
      }
    }.start()
    try {
      input.addData((7L, unit(10), Seq("marker")))
      q.processAllAvailable()
      // parity with the batch serve on the identical probe batch
      val batch = Retrieval.hybridServe(spark, vroot, lroot,
          Seq((7L, unit(10), Seq("marker")))
            .toDF("probe_id", "embedding", "terms"), k = 5)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got(7L) == batch, "epoch serve == batch hybridServe, no overlays pending")
      // a half-landed cross-lake edit: pinned epochs must not see it
      LexLake.upsert(spark, lroot,
        Seq((2L, "zzz special marker words")).toDF("doc_id", "text"))
      input.addData((8L, unit(10), Seq("marker")))
      q.processAllAvailable()
      assert(shape(got(8L)) == shape(got(7L)),
        "an uncommitted overlay is invisible to the pinned epoch")
      // the fold commits the edit; the NEXT epoch re-resolves the pointers
      LexLake.reconcile(spark, lroot)
      input.addData((9L, unit(10), Seq("marker")))
      q.processAllAvailable()
      def rrfOf(s: Set[(Long, Long, Long)], nid: Long): Long =
        s.collectFirst { case (n, m, _) if n == nid => m }.get
      assert(rrfOf(shape(got(9L)), 2L)
        == rrfOf(shape(got(7L)), 2L) + 16393L,
        "the folded edit serves at the next epoch: lexical rank-1 joins the fusion")
    } finally q.stop()
  }

  test("streaming hybrid serve carries the FULL surface: PRF + phrase arms at batch parity across a mid-stream reconcile") {
    // r12 verdict ask #3: batch hybridServe grew PRF/phrase/quantized arms
    // in r11-r12 while the streaming endpoint served plain hybrid. The
    // arms now ride through per epoch — every epoch must equal batch
    // hybridServeAt on the SAME pinned snapshot with the SAME arms, an
    // uncommitted overlay stays invisible, and a mid-stream reconcile is
    // picked up at the next epoch's re-pin.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def unit(deg: Double, scale: Float = 1f): Array[Float] = {
      val r = math.toRadians(deg)
      Array((math.cos(r) * scale).toFloat, (math.sin(r) * scale).toFloat)
    }
    val base = java.nio.file.Files.createTempDirectory("retfull").toString
    val (vroot, lroot) = (s"$base/vector", s"$base/lex")
    VectorLake.init(spark, vroot, Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)))
    VectorLake.ingest(spark, vroot, Seq(
      (1L, unit(0)), (2L, unit(45, 14f)), (3L, unit(90)))
      .toDF("vec_id", "embedding"))
    LexLake.ingest(spark, lroot, Seq(
      (1L, "alpha beta gamma marker"),
      (2L, "old second body here marker beta"),
      (3L, "third unrelated entry")).toDF("doc_id", "text"), nBuckets = 4)
    LexLake.reconcile(spark, lroot)
    val arms = (2, 2, Seq("second", "body")) // (prfFbDocs, prfFbTerms, phrase)
    def batchAt(pid: Long): Set[(Long, Long, Long, Long)] =
      Retrieval.hybridServeAt(spark, vroot, lroot,
          Retrieval.currentSnapshot(spark, vroot, lroot),
          Seq((pid, unit(10), Seq("marker")))
            .toDF("probe_id", "embedding", "terms"),
          k = 5, prfFbDocs = arms._1, prfFbTerms = arms._2,
          phrase = arms._3)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def shape(rs: Iterable[(Long, Long, Long, Long)]): Set[(Long, Long, Long)] =
      rs.map { case (_, n, m, r) => (n, m, r) }.toSet
    val input = MemoryStream[(Long, Array[Float], Seq[String])]
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long, Long)]]
    val q = graft.streaming.Streams.retrievalServeStream(
        input.toDF().toDF("probe_id", "embedding", "terms"),
        vroot, lroot, k = 5,
        prfFbDocs = arms._1, prfFbTerms = arms._2,
        phrase = arms._3) { (_, df) =>
      val rs = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      got.synchronized {
        for ((pid, grp) <- rs.groupBy(_._1)) got(pid) = grp.toSet
        ()
      }
    }.start()
    try {
      input.addData((7L, unit(10), Seq("marker")))
      q.processAllAvailable()
      assert(got.contains(7L), "the phrase-bearing doc must serve")
      assert(got(7L) == batchAt(7L),
        "epoch serve == batch hybridServeAt with identical arms")
      // a half-landed edit (doc 2 re-text, quote kept, tf shifted): the
      // pinned epoch must not see it
      LexLake.upsert(spark, lroot,
        Seq((2L, "second body marker marker zzz")).toDF("doc_id", "text"))
      input.addData((8L, unit(10), Seq("marker")))
      q.processAllAvailable()
      assert(shape(got(8L)) == shape(got(7L)),
        "an uncommitted overlay is invisible to the pinned epoch")
      // the fold commits; the next epoch re-pins and equals batch-at-snap2
      LexLake.reconcile(spark, lroot)
      input.addData((9L, unit(10), Seq("marker")))
      q.processAllAvailable()
      assert(got(9L) == batchAt(9L),
        "post-reconcile epoch == batch hybridServeAt at the re-pinned snapshot")
    } finally q.stop()
  }
}
