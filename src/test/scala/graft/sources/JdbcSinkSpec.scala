package graft.sources

import graft.SparkSpec
import graft.operators.Relational
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** JDBC sink semantics against a REAL embedded database (Derby ships in
  * /opt/spark/jars): last-writer-wins parity between the JDBC MERGE path and
  * the parquet merge path, insert-ignore, and replay idempotency.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("upsertBatch: last-writer-wins parity with Relational.upsert (S11)") {
    val existing = Seq((1, "old", 10L), (2, "keep", 20L)).toDF("id", "name", "v")
    val batch = Seq((1, "newA", 11L), (1, "newB", 12L), (3, "ins", 30L))
      .toDF("id", "name", "v")
    // seed the JDBC table with the existing rows
    JdbcSink.upsertBatch(existing, url, "games_u", Seq("id"), Seq(col("v")))
    // merge the batch both ways
    JdbcSink.upsertBatch(batch, url, "games_u", Seq("id"), Seq(col("v")))
    val viaJdbc = JdbcSink.readTable(spark, url, "games_u")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val viaParquetPath = Relational.upsert(existing, batch, Seq("id"), Seq(col("v")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(viaJdbc == viaParquetPath)
    assert(viaJdbc == Set((1, "newB", 12L), (2, "keep", 20L), (3, "ins", 30L)))
    // at-least-once replay of the same batch is a no-op
    JdbcSink.upsertBatch(batch, url, "games_u", Seq("id"), Seq(col("v")))
    assert(JdbcSink.readTable(spark, url, "games_u")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet == viaJdbc)
  }

  test("insertIgnoreBatch: first wins, existing untouched (S12)") {
    val existing = Seq((1, "orig")).toDF("id", "name")
    JdbcSink.upsertBatch(existing, url, "sum_i", Seq("id"), Seq(col("name")))
    val batch = Seq((1, "clobber"), (2, "first"), (2, "second")).toDF("id", "name")
    JdbcSink.insertIgnoreBatch(batch, url, "sum_i", Seq("id"), Seq(col("name")))
    val out = JdbcSink.readTable(spark, url, "sum_i")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // row 1 kept its original value; within-batch dup picked deterministically
    assert(out == Set((1, "orig"), (2, "first")))
    // parity with the parquet-path semantics
    val parquetPath = Streams.reviewSummariesMerge(
      existing.withColumnRenamed("id", "recommendationid"),
      batch.withColumnRenamed("id", "recommendationid"), col("name"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(parquetPath == out.map { case (i, n) => (i, n) })
  }

  test("appendBatch with dedupKeys: replayed batch inserts nothing (S13)") {
    val b1 = Seq((1, 100L), (2, 200L)).toDF("id", "ts")
    JdbcSink.appendBatch(b1, url, "prices_a", dedupKeys = Seq("id", "ts"),
      order = Seq(col("ts")))
    JdbcSink.appendBatch(b1, url, "prices_a", dedupKeys = Seq("id", "ts"),
      order = Seq(col("ts"))) // replay
    val b2 = Seq((1, 101L)).toDF("id", "ts")
    JdbcSink.appendBatch(b2, url, "prices_a", dedupKeys = Seq("id", "ts"),
      order = Seq(col("ts")))
    assert(JdbcSink.readTable(spark, url, "prices_a").count() == 3)
  }

  test("appendBatch with dedupKeys and the DEFAULT order no longer throws") {
    // order = Nil used to build row_number over an unordered window ->
    // AnalysisException; the all-columns fallback makes the documented
    // default usable
    val b = Seq((1, 100L), (2, 200L)).toDF("id", "ts")
    JdbcSink.appendBatch(b, url, "prices_d", dedupKeys = Seq("id"))
    JdbcSink.appendBatch(b, url, "prices_d", dedupKeys = Seq("id")) // replay
    assert(JdbcSink.readTable(spark, url, "prices_d").count() == 2)
  }

  test("dialect selection: jdbc:mysql gets the reference spelling, others ANSI MERGE") {
    assert(JdbcSink.dialectFor("jdbc:mysql://db:3306/steam") eq JdbcSink.MySqlDialect)
    assert(JdbcSink.dialectFor("JDBC:MySQL://db/steam") eq JdbcSink.MySqlDialect)
    assert(JdbcSink.dialectFor("jdbc:derby:memory:x") eq JdbcSink.AnsiDialect)
    assert(JdbcSink.dialectFor("jdbc:postgresql://h/d") eq JdbcSink.AnsiDialect)
  }

  test("MySQL dialect: statement text matches the reference loader's SQL shape") {
    // reference: load_game_mysql.py:84-91 — INSERT .. ON DUPLICATE KEY
    // UPDATE col=VALUES(col); INSERT IGNORE for key-absent-only inserts
    val up = JdbcSink.MySqlDialect.upsertSql("games", "games__stage_x",
      cols = Seq("game_id", "title", "price"), keys = Seq("game_id"))
    assert(up ===
      "INSERT INTO games (`game_id`, `title`, `price`) " +
        "SELECT `game_id`, `title`, `price` FROM games__stage_x " +
        "ON DUPLICATE KEY UPDATE `title`=VALUES(`title`), `price`=VALUES(`price`)")
    val ig = JdbcSink.MySqlDialect.insertIgnoreSql("seen", "seen__stage_x",
      cols = Seq("game_id"), keys = Seq("game_id"))
    assert(ig === "INSERT IGNORE INTO seen (`game_id`) SELECT `game_id` FROM seen__stage_x")
    // pure-key upsert: the no-op SET must qualify the RHS with the target
    // table, else MySQL flags the column ambiguous vs the staging SELECT
    val pk = JdbcSink.MySqlDialect.upsertSql("k", "k__s", Seq("id"), Seq("id"))
    assert(pk.endsWith("ON DUPLICATE KEY UPDATE `id`=k.`id`"))
  }
}
