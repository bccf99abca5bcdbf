package graft.domain

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class CsvWarehouseLoaderSpec extends SparkSpec {
  import spark.implicits._

  test("CSV -> warehouse: dims, deterministic ids, bridges, date coercion") {
    val gameCsv = Seq(
      (10, "Half-Life", "d", "Valve, Gearbox", "Valve", "1 Nov, 1998",
        "['FPS', 'Action']", "['English*', 'French']", "c"),
      (20, "Portal", "d", "Valve", "Valve", "not a date",
        "['Puzzle']", "['English']", "c"))
      .toDF("appid", "title", "description", "developer", "publisher",
        "release_date", "genres", "languages", "content")
    val moreInfo = Seq((10, "w", "m", "l", 16, "Award"))
      .toDF("appid", "windows_req", "mac_req", "linux_req", "required_age", "awards")

    val loaded = CsvWarehouseLoader.load(gameCsv, moreInfo)

    val games = loaded.games.orderBy("game_id").collect()
    assert(games(0).getAs[java.sql.Date]("release_date").toString == "1998-11-01")
    assert(games(1).get(games(1).fieldIndex("release_date")) == null) // coerce -> NULL
    assert(games(1).get(games(1).fieldIndex("required_age")) == null) // left merge miss

    val devs = loaded.dims("developers").orderBy("dev_id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(devs == Seq((1, "Gearbox"), (2, "Valve"))) // dense sorted ids
    assert(loaded.bridges("developers").count() == 3) // (10,Valve)(10,Gearbox)(20,Valve)

    val langs = loaded.dims("languages").select("name").as[String].collect().toSet
    assert(langs == Set("English", "French")) // '*' stripped, distinct

    // round-trip: dim_games group-concat over the loaded bridges reproduces
    // the sorted source lists
    val w = SteamModels.Warehouse(
      games = loaded.games.withColumn("title", col("title")),
      developers = loaded.dims("developers").withColumnRenamed("dev_id", "dev_id"),
      publishers = loaded.dims("publishers"),
      genres = loaded.dims("genres"),
      languages = loaded.dims("languages"),
      gameDevelopers = loaded.bridges("developers"),
      gamePublishers = loaded.bridges("publishers"),
      gameGenres = loaded.bridges("genres"),
      gameLanguages = loaded.bridges("languages"),
      prices = Seq.empty[(Long, Int, BigDecimal, Int, BigDecimal, java.sql.Timestamp)]
        .toDF("price_id", "game_id", "price", "discount", "initial_price", "timestamp"),
      crawlState = Seq.empty[(Int, java.sql.Timestamp, java.sql.Timestamp)]
        .toDF("game_appid", "last_review_timestamp", "last_price_timestamp"),
      reviews = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.review))
    val dg = SteamModels.dimGames(w).orderBy("game_id").collect()
    assert(dg(0).getAs[String]("developers") == "Gearbox,Valve")
    assert(dg(0).getAs[String]("languages") == "English,French")
  }

  test("re-crawled CSV with duplicate appids: last row wins, no join multiplication") {
    val gameCsv = Seq(
      (10, "Half-Life", "d", "Valve", "Valve", "1 Nov, 1998", "['FPS']", "['English']", "c"),
      (10, "Half-Life GOTY", "d", "Valve", "Valve", "1 Nov, 1998", "['FPS']", "['English']", "c"))
      .toDF("appid", "title", "description", "developer", "publisher",
        "release_date", "genres", "languages", "content")
    val moreInfo = Seq((10, "w", "m", "l", 16, "A"), (10, "w2", "m2", "l2", 18, "B"))
      .toDF("appid", "windows_req", "mac_req", "linux_req", "required_age", "awards")
    val loaded = CsvWarehouseLoader.load(gameCsv, moreInfo)
    val games = loaded.games.collect()
    // one row (the reference's ODKU last-writer-wins), not 2 or 4
    assert(games.length == 1)
    assert(games(0).getAs[String]("title") == "Half-Life GOTY")
    assert(games(0).getAs[Int]("required_age") == 18)
    assert(loaded.bridges("developers").count() == 1)
  }

  test("incremental load extends existing dims without renumbering") {
    val existing = Seq((1, "Valve")).toDF("dev_id", "name")
    val gameCsv = Seq((30, "New", "d", "Valve, Zachtronics", "P", "1 Jan, 2020", "['x']", "['English']", "c"))
      .toDF("appid", "title", "description", "developer", "publisher",
        "release_date", "genres", "languages", "content")
    val moreInfo = Seq.empty[(Int, String, String, String, Int, String)]
      .toDF("appid", "windows_req", "mac_req", "linux_req", "required_age", "awards")
    val loaded = CsvWarehouseLoader.load(gameCsv, moreInfo,
      existingDims = Map("developers" -> existing))
    val devs = loaded.dims("developers").orderBy("dev_id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(devs == Seq((1, "Valve"), (2, "Zachtronics"))) // Valve keeps id 1
  }

  test("jaccard bitmap and inverted-index strategies produce identical results") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bitmap = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inverted = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.2,
      maxBitmapVocab = 0) // force the inverted-index path
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bitmap == inverted && bitmap.nonEmpty)
  }
}
