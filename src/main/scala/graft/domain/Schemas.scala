package graft.domain

import org.apache.spark.sql.types._

/** Explicit schemas for the Steam-domain datasets — no inference in production
  * paths (SURVEY §1.2 decision). Mirrors the reference DDL (sql/init_db.sql:5-79)
  * and the review document shape (data/raw/price/review/reviews_part0000.json).
  */
object Schemas {

  // ---- relational warehouse (init_db.sql) ----
  val games: StructType = StructType(Seq(
    StructField("game_id", IntegerType, nullable = false),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("release_date", DateType),
    StructField("windows_req", StringType),
    StructField("mac_req", StringType),
    StructField("linux_req", StringType),
    StructField("required_age", IntegerType),
    StructField("awards", StringType)))

  def namedDim(idCol: String): StructType = StructType(Seq(
    StructField(idCol, IntegerType, nullable = false),
    StructField("name", StringType)))

  def bridge(idCol: String): StructType = StructType(Seq(
    StructField("game_id", IntegerType, nullable = false),
    StructField(idCol, IntegerType, nullable = false)))

  val prices: StructType = StructType(Seq(
    StructField("price_id", LongType),
    StructField("game_id", IntegerType, nullable = false),
    StructField("price", DecimalType(10, 2)),
    StructField("discount", IntegerType),
    StructField("initial_price", DecimalType(10, 2)),
    StructField("timestamp", TimestampType)))

  val crawlState: StructType = StructType(Seq(
    StructField("game_appid", IntegerType, nullable = false),
    StructField("last_review_timestamp", TimestampType),
    StructField("last_price_timestamp", TimestampType)))

  // ---- review documents (Mongo-shaped JSON) ----
  val reviewAuthor: StructType = StructType(Seq(
    StructField("steamid", StringType),
    StructField("num_games_owned", IntegerType),
    StructField("num_reviews", IntegerType),
    StructField("playtime_forever", IntegerType),
    StructField("playtime_last_two_weeks", IntegerType),
    StructField("playtime_at_review", IntegerType),
    StructField("last_played", LongType)))

  val review: StructType = StructType(Seq(
    StructField("recommendationid", StringType),
    StructField("author", reviewAuthor),
    StructField("language", StringType),
    StructField("review", StringType),
    StructField("timestamp_created", LongType),
    StructField("timestamp_updated", LongType),
    StructField("voted_up", BooleanType),
    StructField("votes_up", IntegerType),
    StructField("votes_funny", IntegerType),
    // Steam sometimes sends STRING here — read as string, cast downstream
    StructField("weighted_vote_score", StringType),
    StructField("comment_count", IntegerType),
    StructField("steam_purchase", BooleanType),
    StructField("received_for_free", BooleanType),
    StructField("written_during_early_access", BooleanType),
    StructField("primarily_steam_deck", BooleanType),
    StructField("appid", IntegerType),
    StructField("crawl_date", StringType)))

  // ---- CSV staging files ----
  /** price_raw{ddMMyyyy}.csv (tasks/steam_tasks_improved.py:199-206): string
    * money/discount columns, parsed by MoneyFunctions downstream. */
  val priceRawCsv: StructType = StructType(Seq(
    StructField("appid", IntegerType),
    StructField("discount", StringType),
    StructField("price", StringType)))

  /** price_processed CSV (steam_transform_price.py:106). */
  val priceProcessedCsv: StructType = StructType(Seq(
    StructField("appid", IntegerType),
    StructField("discount", StringType),
    StructField("initial_price", StringType),
    StructField("price", StringType)))

  /** game metadata crawler CSV (steam_game_crawler.py:43-46). */
  val gameCsv: StructType = StructType(Seq(
    StructField("appid", IntegerType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("developer", StringType),
    StructField("publisher", StringType),
    StructField("release_date", StringType),
    StructField("genres", StringType),
    StructField("languages", StringType),
    StructField("content", StringType)))

  // ---- Kafka message shapes ----
  /** price tick message (tasks/steam_tasks_improved.py:396-403). */
  val priceTickMsg: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("appid", IntegerType),
    StructField("discount", StringType),
    StructField("price", StringType),
    StructField("initial_price", StringType),
    StructField("timestamp", DoubleType)))

  /** Debezium CDC envelope for prices (config/debezium_connector.json;
    * consumer contract tasks/steam_tasks_improved.py:563-599). */
  val cdcPriceRow: StructType = StructType(Seq(
    StructField("game_id", IntegerType),
    StructField("discount", IntegerType),
    StructField("price", DoubleType),
    StructField("initial_price", DoubleType),
    StructField("timestamp", DoubleType)))

  val cdcEnvelope: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", cdcPriceRow),
      StructField("after", cdcPriceRow))))))
}
