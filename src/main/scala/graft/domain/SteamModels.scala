package graft.domain

import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The analytics model graph — the dbt layer of the reference re-expressed as
  * DataFrame builders (staging = cheap views, marts = materialized tables).
  * Semantics follow the *compiled intent* of steam_analytics/models:
  *
  *  - stg_* (staging/stg_*.sql): projections + non-empty/range filters.
  *  - stg_reviews (stg_reviews.sql:3-9): the reference's get_reviews() macro is
  *    undefined and the model never compiled; we implement the evident intent —
  *    reviews from the document store, appid cast to int, epoch seconds
  *    converted ONCE to review_timestamp (fact_reviews.sql:7 re-converting the
  *    already-renamed column is the second latent bug; not reproduced).
  *  - dim_games (marts/core/dim_games.sql:3-22): 8-way left join +
  *    GROUP_CONCAT(DISTINCT) per dim family. MySQL's concat order is
  *    nondeterministic; we sort (documented divergence, SURVEY §7.4).
  *  - fact_reviews (marts/core/fact_reviews.sql): per-review rows annotated
  *    with COUNT(*) OVER (PARTITION BY appid).
  *  - game_quality_metrics (marts/business/game_quality_metrics.sql:3-15):
  *    declared semantics reproduced including the reviews × prices fan-out in
  *    AVG(p.price) (noted in SURVEY header fact 3).
  *
  * Scale notes: dims and bridges are tiny next to games -> broadcast joins;
  * dim_games groups on the games PK so the concat aggregation shuffles once;
  * fact_reviews' window shuffles on appid (AQE handles hot titles).
  */
object SteamModels {

  /** Source tables, by init_db.sql name. */
  final case class Warehouse(
    games: DataFrame,
    developers: DataFrame, publishers: DataFrame,
    genres: DataFrame, languages: DataFrame,
    gameDevelopers: DataFrame, gamePublishers: DataFrame,
    gameGenres: DataFrame, gameLanguages: DataFrame,
    prices: DataFrame, crawlState: DataFrame,
    reviews: DataFrame)

  // ---- staging ----
  def stgGames(w: Warehouse): DataFrame =
    w.games.filter(col("title").isNotNull && col("title") =!= "")

  private def stgNamedDim(dim: DataFrame): DataFrame =
    dim.filter(col("name").isNotNull && col("name") =!= "")

  def stgDevelopers(w: Warehouse): DataFrame = stgNamedDim(w.developers)
  def stgPublishers(w: Warehouse): DataFrame = stgNamedDim(w.publishers)
  def stgGenres(w: Warehouse): DataFrame = stgNamedDim(w.genres)
  def stgLanguages(w: Warehouse): DataFrame = stgNamedDim(w.languages)

  def stgPrices(w: Warehouse): DataFrame =
    w.prices.filter(col("price") >= 0 && col("discount") >= 0 && col("initial_price") >= 0)

  def stgCrawlState(w: Warehouse): DataFrame =
    w.crawlState.select("game_appid", "last_review_timestamp", "last_price_timestamp")

  /** Reviews from the document store (Schemas.review shape). */
  def stgReviews(w: Warehouse): DataFrame =
    w.reviews.select(
      col("appid").cast("int").as("appid"),
      col("author.steamid").as("author_steamid"),
      col("review"),
      timestamp_seconds(col("timestamp_created")).as("review_timestamp"),
      col("language"))

  // ---- marts ----
  def dimGames(w: Warehouse): DataFrame = {
    val g = stgGames(w)
    // each family: bridge -> dim, both broadcast (dims are small by nature)
    def family(bridge: DataFrame, dim: DataFrame, key: String, outName: String): DataFrame =
      bridge.join(broadcast(stgNamedDim(dim)), Seq(key))
        .groupBy("game_id")
        .agg(Relational.groupConcatDistinct(col("name")).as(outName))
    val dev = family(w.gameDevelopers, w.developers, "dev_id", "developers")
    val pub = family(w.gamePublishers, w.publishers, "pub_id", "publishers")
    val gen = family(w.gameGenres, w.genres, "genre_id", "genres")
    val lan = family(w.gameLanguages, w.languages, "lang_id", "languages")
    // pre-aggregating each family before the join avoids the row-multiplying
    // 8-way fan-out the reference's GROUP BY absorbs (same result, one pass
    // over games instead of |dev|×|pub|×|genre|×|lang| intermediate rows)
    g.select("game_id", "title", "description", "release_date", "required_age")
      .join(broadcast(dev), Seq("game_id"), "left")
      .join(broadcast(pub), Seq("game_id"), "left")
      .join(broadcast(gen), Seq("game_id"), "left")
      .join(broadcast(lan), Seq("game_id"), "left")
  }

  def factReviews(w: Warehouse): DataFrame = {
    val r = stgReviews(w)
    r.select(col("appid"), col("author_steamid"), col("review"),
      col("review_timestamp"), col("language"),
      count(lit(1)).over(Window.partitionBy(col("appid"))).as("review_count"))
  }

  def gameQualityMetrics(w: Warehouse): DataFrame = {
    val dg = dimGames(w)
    val fr = factReviews(w)
    val p = stgPrices(w)
    dg.join(fr.select(col("appid"), col("review_count")),
        dg("game_id") === fr("appid"), "left")
      .join(p, dg("game_id") === p("game_id"), "left")
      .groupBy(dg("game_id"), col("title"), col("developers"), col("genres"),
        col("review_count"))
      .agg(
        avg(col("price")).as("avg_price"),
        avg(col("discount")).as("avg_discount"),
        min(col("initial_price")).as("min_initial_price"))
  }

  /** The full DAG in dependency order, for run-all entry points. */
  def allModels(w: Warehouse): Seq[(String, DataFrame)] = Seq(
    "stg_games" -> stgGames(w),
    "stg_developers" -> stgDevelopers(w),
    "stg_publishers" -> stgPublishers(w),
    "stg_genres" -> stgGenres(w),
    "stg_languages" -> stgLanguages(w),
    "stg_prices" -> stgPrices(w),
    "stg_crawl_state" -> stgCrawlState(w),
    "stg_reviews" -> stgReviews(w),
    "dim_games" -> dimGames(w),
    "fact_reviews" -> factReviews(w),
    "game_quality_metrics" -> gameQualityMetrics(w))
}
