package graft.sources

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame, SaveMode}

/** JDBC sink adapter: the reference's MySQL upsert / insert-ignore / append
  * loaders (etl/load/load_game_mysql.py:84-91 `INSERT ... ON DUPLICATE KEY
  * UPDATE`, kafka consumers' per-message commits) as set-based batch merges
  * against any JDBC database.
  *
  * Pattern: each micro-batch (foreachBatch) is bulk-written to a staging
  * table through Spark's parallel JDBC writer, then ONE server-side MERGE
  * applies it atomically — no per-row round trips, no driver-side loop, and
  * the merge cost is proportional to the batch, not the target table. The
  * SQL is ANSI MERGE (Derby/Postgres/Oracle/SQL Server; MySQL spells it
  * INSERT .. ON DUPLICATE KEY UPDATE — swap `mergeSql` for that dialect).
  *
  * Replay contract (foreachBatch is at-least-once): upsert and insertIgnore
  * re-apply identical values on replay — idempotent. append is the raw
  * reference semantics; give `dedupKeys` to make replays no-ops.
  */
object JdbcSink {

  private def q(ident: String): String = "\"" + ident + "\""

  /** Ensure `table` exists with the batch's schema (no rows written). */
  private def ensureTable(batch: DataFrame, url: String, table: String,
                          props: java.util.Properties): Unit =
    batch.limit(0).write.mode(SaveMode.Ignore).jdbc(url, table, props)

  private def withConnection[A](url: String, props: java.util.Properties)(
      f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Stage the batch under a per-invocation unique name (two concurrent
    * writers to one target must not overwrite each other's staging mid-merge),
    * run `merge`, and drop the staging table afterwards. */
  private def withStaging(batch: DataFrame, url: String, table: String,
                          props: java.util.Properties)(
      merge: (java.sql.Connection, String) => Unit): Unit = {
    val staging = table + "__stage_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      batch.write.mode(SaveMode.Overwrite).jdbc(url, staging, props)
      withConnection(url, props)(conn => merge(conn, staging))
    } finally {
      // best-effort cleanup on EVERY path — a staging write that failed
      // mid-way must not leak a uniquely-named partial table per retry
      try withConnection(url, props)(
        _.createStatement().executeUpdate(s"DROP TABLE $staging"))
      catch { case _: java.sql.SQLException => () }
    }
  }

  /** S11 upsert (INSERT .. ON DUPLICATE KEY UPDATE): last-writer-wins merge
    * of the batch into `table` by `keys`; `order` breaks ties within the
    * batch (MERGE requires a unique source key). Parity with the parquet
    * path: Relational.upsert(existing, batch, keys, order). */
  def upsertBatch(batch: DataFrame, url: String, table: String,
                  keys: Seq[String], order: Seq[Column],
                  props: java.util.Properties = new java.util.Properties): Unit = {
    val deduped = Relational.dedupKeepLast(batch, keys, order)
    ensureTable(deduped, url, table, props)
    val cols = deduped.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val setSql = nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
    val insCols = cols.map(q).mkString(", ")
    val insVals = cols.map(c => s"s.${q(c)}").mkString(", ")
    val matched = if (nonKeys.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setSql " else ""
    withStaging(deduped, url, table, props) { (conn, staging) =>
      conn.createStatement().executeUpdate(
        s"MERGE INTO $table t USING $staging s ON $on " +
          matched +
          s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)")
    }
  }

  /** S12 insert-ignore: insert only rows whose key is absent; existing rows
    * untouched (MySQL INSERT IGNORE). Parity: Relational.insertIgnore. */
  def insertIgnoreBatch(batch: DataFrame, url: String, table: String,
                        keys: Seq[String], order: Seq[Column],
                        props: java.util.Properties = new java.util.Properties): Unit = {
    val deduped = Relational.dedupKeepFirst(batch, keys, order)
    ensureTable(deduped, url, table, props)
    val cols = deduped.columns.toSeq
    val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val insCols = cols.map(q).mkString(", ")
    val insVals = cols.map(c => s"s.${q(c)}").mkString(", ")
    withStaging(deduped, url, table, props) { (conn, staging) =>
      conn.createStatement().executeUpdate(
        s"MERGE INTO $table t USING $staging s ON $on " +
          s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)")
    }
  }

  /** S13 append: plain parallel JDBC insert. With `dedupKeys`, rows already
    * present (by those keys) are skipped via the insert-ignore merge, which
    * makes at-least-once replays no-ops. */
  def appendBatch(batch: DataFrame, url: String, table: String,
                  dedupKeys: Seq[String] = Nil, order: Seq[Column] = Nil,
                  props: java.util.Properties = new java.util.Properties): Unit =
    if (dedupKeys.isEmpty) batch.write.mode(SaveMode.Append).jdbc(url, table, props)
    else insertIgnoreBatch(batch, url, table, dedupKeys, order, props)

  /** Read a JDBC table back as a DataFrame (verification / downstream joins). */
  def readTable(spark: org.apache.spark.sql.SparkSession, url: String, table: String,
                props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)
}
