package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S14/S15 export edge: the mongoimport-compatible extended-JSON bridge. */
class MongoExportSpec extends SparkSpec {
  import spark.implicits._

  test("mongoExtendedJsonl: deterministic $oid, $date timestamps, null keys dropped") {
    val dir = java.nio.file.Files.createTempDirectory("mongo_export").toString + "/reviews"
    val df = Seq(
      (Some(10L), "great game", "2024-03-01 12:30:45.123"),
      (Some(11L), "meh", "2024-03-02 00:00:00.000"),
      (None: Option[Long], "orphan", "2024-03-03 00:00:00.000")
    ).toDF("appid", "review", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    Writers.mongoExtendedJsonl(df, Seq("appid"), dir)

    val lines = spark.read.text(dir).as[String].collect().sorted
    assert(lines.length === 2) // the null-key row dropped
    // every document leads with a 24-hex ObjectId and renders ts as $date
    val oidRe = """^\{"_id":\{"\$oid":"[0-9a-f]{24}"\}.*""".r
    assert(lines.forall(l => oidRe.matches(l)))
    assert(lines.exists(_.contains(""""ts":{"$date":"2024-03-01T12:30:45.123Z"}""")))

    // determinism: a re-export produces byte-identical documents
    val dir2 = java.nio.file.Files.createTempDirectory("mongo_export2").toString + "/reviews"
    Writers.mongoExtendedJsonl(df, Seq("appid"), dir2)
    assert(spark.read.text(dir2).as[String].collect().sorted.toSeq === lines.toSeq)

    // the payload is valid JSON with the expected content
    val parsed = spark.read.json(dir)
    assert(parsed.select("review").as[String].collect().toSet === Set("great game", "meh"))
  }

  test("mongoExtendedJsonl: null timestamp renders as an absent field, never {}") {
    val dir = java.nio.file.Files.createTempDirectory("mongo_export_null").toString + "/t"
    val df = Seq((1L, Some("2024-03-01 00:00:00")), (2L, None: Option[String]))
      .toDF("id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    Writers.mongoExtendedJsonl(df, Seq("id"), dir)
    val lines = spark.read.text(dir).as[String].collect()
    val nullRow = lines.find(!_.contains("$date")).get
    // a null wrapped type must not leave an empty subdocument behind
    assert(!nullRow.contains(""""ts""""), nullRow)
    assert(lines.exists(_.contains(""""ts":{"$date":""")))
  }

  test("mongoExtendedJsonl: binary columns render as extended-JSON $binary") {
    val dir = java.nio.file.Files.createTempDirectory("mongo_export_bin").toString + "/media"
    val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("media_id", "content")
    Writers.mongoExtendedJsonl(df, Seq("media_id"), dir)
    val line = spark.read.text(dir).as[String].head()
    assert(line.contains(""""content":{"$binary":{"base64":"AQID","subType":"00"}}"""), line)
  }

  test("mongoExtendedJsonl: DateType renders as $date midnight, not a bare string") {
    val dir = java.nio.file.Files.createTempDirectory("mongo_export_date").toString + "/g"
    val df = Seq((1L, "2012-08-21")).toDF("id", "d_s")
      .withColumn("release_date", to_date(col("d_s"))).drop("d_s")
    Writers.mongoExtendedJsonl(df, Seq("id"), dir)
    val line = spark.read.text(dir).as[String].head()
    assert(line.contains(""""release_date":{"$date":"2012-08-21T00:00:00.000Z"}"""), line)
  }
}
