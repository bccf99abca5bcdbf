package graft.domain

import graft.functions.{TextFunctions => TF}
import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The crawler-CSV -> relational warehouse load path
  * (etl/load/load_game_mysql.py:37-129 + etl/transform/transform_game.py),
  * fully distributed:
  *
  *  - games: cleaned projection, `%d %b, %Y` date parse with null-on-fail
  *    (F5), left-merge of the more-info CSV (J3)
  *  - dims: distinct names exploded from the ", "-joined columns (the §2.10
  *    generator: explode∘split — the inverse of dim_games' GROUP_CONCAT),
  *    surrogate ids via lookup-or-create (J10, deterministic dense ids)
  *  - bridges: (game_id, dim_id) pairs by joining names back to the dim
  *
  * One pass over the CSV per dim family; dims broadcast everywhere. */
object CsvWarehouseLoader {

  /** Split a stringified-list column into trimmed non-empty rows:
    * game_id, name — exploding the cleaned array directly, not a re-split
    * of the ", "-joined string (that re-did the trim/filter per row). */
  private def explodeNames(gameCsv: DataFrame, srcCol: String,
                           isLanguage: Boolean = false): DataFrame =
    gameCsv.select(col("appid").as("game_id"),
      explode(TF.cleanArray(col(srcCol), isLanguage)).as("name"))

  final case class Loaded(games: DataFrame,
                          dims: Map[String, DataFrame],    // family -> (id, name)
                          bridges: Map[String, DataFrame]) // family -> (game_id, id)

  /** @param gameCsv  Schemas.gameCsv shape (appid,title,...,developer,publisher,genres,languages)
    * @param moreInfo Schemas shape appid,windows_req,mac_req,linux_req,required_age,awards
    * @param existingDims family -> existing (idCol, name) dim to extend (empty = fresh) */
  def load(gameCsv: DataFrame, moreInfo: DataFrame,
           existingDims: Map[String, DataFrame] = Map.empty): Loaded = {
    val spark = gameCsv.sparkSession
    import spark.implicits._

    // re-crawled CSVs repeat appids; the reference's row-by-row ODKU loader
    // absorbed them last-writer-wins. Dedup ONCE at entry in scan order
    // (monotonically_increasing_id reflects file order for a fresh read) so
    // the enrichment join below can't multiply rows and `games` stays
    // unique per game_id — DataQuality.unique(games) fired otherwise.
    def lastPerApp(df: DataFrame): DataFrame =
      Relational.dedupKeepLast(
        df.withColumn("__ord", monotonically_increasing_id()),
        Seq("appid"), Seq(col("__ord"))).drop("__ord")
    val gameRows = lastPerApp(gameCsv)
    val infoRows = lastPerApp(moreInfo)

    val games = gameRows.select(
      col("appid").as("game_id"),
      col("title"), col("description"),
      to_date(col("release_date"), "d MMM, yyyy").as("release_date")) // F5: coerce -> NULL
      .join(infoRows.select(col("appid").as("game_id"), col("windows_req"),
        col("mac_req"), col("linux_req"), col("required_age"), col("awards")),
        Seq("game_id"), "left") // J3 enrichment merge

    val families = Seq(
      ("developers", "dev_id", "developer", false),
      ("publishers", "pub_id", "publisher", false),
      ("genres", "genre_id", "genres", false),
      ("languages", "lang_id", "languages", true))

    val dimsAndBridges = families.map { case (family, idCol, srcCol, isLang) =>
      val names = explodeNames(gameRows, srcCol, isLang)
      val existing = existingDims.getOrElse(family,
        Seq.empty[(Int, String)].toDF(idCol, "name"))
      val dim = Relational.lookupOrCreate(existing, idCol, "name", names.select("name"))
      val bridge = names.join(broadcast(dim), Seq("name")).select("game_id", idCol).distinct()
      family -> (dim, bridge)
    }.toMap

    Loaded(games,
      dimsAndBridges.map { case (f, (d, _)) => f -> d },
      dimsAndBridges.map { case (f, (_, b)) => f -> b })
  }
}
