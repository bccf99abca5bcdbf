package graft.domain

import graft.SparkSpec
import graft.quality.DataQuality
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** FIXTURES.md §1 warehouse: games spanning the edge cases (empty title,
  * out-of-range age, 0/1/many devs, duplicate dim names, orphan crawl_state). */
class SteamModelsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  lazy val w: SteamModels.Warehouse = {
    val games = Seq(
      (1, "Half-Life", "d1", java.sql.Date.valueOf("1998-11-19"), "w", "m", "l", 16, "Award"),
      (2, "Portal", "d2", java.sql.Date.valueOf("2007-10-10"), "w", "m", "l", 0, ""),
      (3, "", "empty title -> filtered", null, null, null, null, 0, null),
      (4, "NoDims", "no bridge rows", null, null, null, null, 21, null) // age out of range
    ).toDF("game_id", "title", "description", "release_date", "windows_req",
      "mac_req", "linux_req", "required_age", "awards")
    val devs = Seq((1, "Valve"), (2, "Gearbox"), (3, "")).toDF("dev_id", "name")
    val pubs = Seq((1, "Valve"), (2, "Sierra")).toDF("pub_id", "name")
    val genres = Seq((1, "FPS"), (2, "Puzzle")).toDF("genre_id", "name")
    val langs = Seq((1, "English"), (2, "French")).toDF("lang_id", "name")
    val gd = Seq((1, 1), (1, 2), (1, 3), (2, 1)).toDF("game_id", "dev_id")
    val gp = Seq((1, 1), (1, 2), (2, 1)).toDF("game_id", "pub_id")
    val gg = Seq((1, 1), (2, 2)).toDF("game_id", "genre_id")
    val gl = Seq((1, 1), (1, 2), (2, 1)).toDF("game_id", "lang_id")
    val prices = Seq(
      (1L, 1, BigDecimal("9.99"), 50, BigDecimal("19.99"), ts("2024-01-01 10:00:00")),
      (2L, 1, BigDecimal("19.99"), 0, BigDecimal("19.99"), ts("2024-01-02 10:00:00")),
      (3L, 2, BigDecimal("-1.00"), 0, BigDecimal("0.00"), ts("2024-01-01 10:00:00")), // filtered
      (4L, 2, BigDecimal("4.99"), 75, BigDecimal("19.99"), ts("2024-01-03 10:00:00"))
    ).toDF("price_id", "game_id", "price", "discount", "initial_price", "timestamp")
    val crawl = Seq(
      (1, ts("2024-01-01 00:00:00"), ts("2024-01-02 10:00:00")),
      (999, null.asInstanceOf[java.sql.Timestamp], ts("2024-01-01 00:00:00")) // orphan
    ).toDF("game_appid", "last_review_timestamp", "last_price_timestamp")
    val reviewRows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("r1", Row("s1", 10, 2, 100, 5, 50, 1700000000L), "english", "great game",
          1700000100L, 1700000100L, true, 5, 1, "0.9", 0, true, false, false, false, 1, "2024-01-01"),
        Row("r2", Row("s2", 3, 1, 20, 0, 10, 1700000000L), "english", "ok",
          1700000200L, 1700000200L, false, 1, 0, "0.5", 0, true, false, false, false, 1, "2024-01-01"),
        Row("r3", Row("s3", 7, 4, 30, 2, 15, 1700000000L), "french", "bon",
          1700000300L, 1700000300L, true, 2, 0, "0.7", 1, false, true, false, false, 2, "2024-01-01"))),
      Schemas.review)
    SteamModels.Warehouse(games, devs, pubs, genres, langs, gd, gp, gg, gl,
      prices, crawl, reviewRows)
  }

  test("staging filters drop empty titles / names / negative prices (P1/P2)") {
    assert(SteamModels.stgGames(w).count() == 3) // game 3 filtered
    assert(SteamModels.stgDevelopers(w).count() == 2) // '' name filtered
    assert(SteamModels.stgPrices(w).count() == 3) // negative price filtered
  }

  test("dim_games assembles sorted distinct concat per family (J1+A1)") {
    val dg = SteamModels.dimGames(w).orderBy("game_id").collect()
    assert(dg.length == 3)
    val hl = dg(0)
    assert(hl.getAs[String]("developers") == "Gearbox,Valve") // sorted, '' dev filtered
    assert(hl.getAs[String]("publishers") == "Sierra,Valve")
    assert(hl.getAs[String]("languages") == "English,French")
    val noDims = dg(2)
    assert(noDims.getAs[String]("developers") == null) // MySQL NULL semantics
  }

  test("fact_reviews annotates per-appid counts, epoch converted once (W1/P4)") {
    val fr = SteamModels.factReviews(w)
    assert(fr.count() == 3)
    assert(fr.filter(col("appid") === 1).head().getAs[Long]("review_count") == 2L)
    val t = fr.filter(col("appid") === 2).head().getAs[java.sql.Timestamp]("review_timestamp")
    assert(t == ts("2023-11-14 22:18:20")) // 1700000300 epoch s, UTC
  }

  test("game_quality_metrics reproduces declared fan-out semantics (J2+A2)") {
    val m = SteamModels.gameQualityMetrics(w)
    val hl = m.filter(col("game_id") === 1).head()
    assert(hl.getAs[Long]("review_count") == 2L)
    // game 1: 2 reviews x 2 price rows fan-out; avg over 4 rows = avg over 2 distinct
    assert(hl.getAs[java.math.BigDecimal]("avg_price").doubleValue() == 14.99)
    val noReviews = m.filter(col("game_id") === 4).head()
    assert(noReviews.get(m.columns.indexOf("review_count")) == null)
  }

  test("data-quality suite flags exactly the planted violations (§5)") {
    val failures = DataQuality.run(DataQuality.steamSuite(w)).map(_.name)
    assert(failures.exists(_.startsWith("accepted_range(required_age)"))) // 21
    assert(failures.exists(_.startsWith("relationships(game_id"))) // orphan 999 + price of filtered game 2? no: game 2 passes
    // nothing else fails
    assert(failures.size == 2, failures.mkString(", "))
  }
}
