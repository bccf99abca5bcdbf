package graft.cli

import graft.SparkSpec

/** The composed reference-day smoke: every stage of the end-to-end run
  * (wire -> warehouse -> marts -> CDC -> notify log -> curation) produces
  * exactly the fixture-determined row counts. */
class ReferenceDaySpec extends SparkSpec {

  test("reference day: all stages flow, with fixture-exact counts") {
    val workDir = java.nio.file.Files.createTempDirectory("refday").toString
    val r = ReferenceDay.run(spark, workDir, "/root/testdata/sf0.001")
    assert(r("warehouse_games") == 3, "three games auto-inserted off the wire")
    assert(r("warehouse_prices") == 4, "3 morning ticks + 1 afternoon discount")
    assert(r("warehouse_crawl_state") == 3)
    assert(r("mart_dim_games") == 3)
    assert(r("mart_fact_reviews") == 3)
    assert(r("mart_game_quality_metrics") == 3)
    assert(r("quality_failures") == 0, "clean fixtures pass the dbt-test suite")
    // 4 envelopes: insert (no notify), change (notify), its replay (dedup),
    // no-op (filtered) -> exactly one logged delivery
    assert(r("cdc_notifications") == 1)
    assert(r("curation_chunks") > 0, "q75 composition yields training chunks")
  }
}
