package graft.cli

import graft.SparkSpec

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
  }
}
