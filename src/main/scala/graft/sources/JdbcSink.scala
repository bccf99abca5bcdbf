package graft.sources

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame, SaveMode}

/** JDBC sink adapter: the reference's MySQL upsert / insert-ignore / append
  * loaders (etl/load/load_game_mysql.py:84-91 `INSERT ... ON DUPLICATE KEY
  * UPDATE`, kafka consumers' per-message commits) as set-based batch merges
  * against any JDBC database.
  *
  * Pattern: each micro-batch (foreachBatch) is bulk-written to a staging
  * table through Spark's parallel JDBC writer, then ONE server-side merge
  * statement applies it atomically — no per-row round trips, no driver-side
  * loop, and the merge cost is proportional to the batch, not the target
  * table. The statement text is DIALECT-selected from the JDBC URL:
  * `jdbc:mysql:` gets the reference's own spelling (`INSERT .. ON DUPLICATE
  * KEY UPDATE col=VALUES(col)` / `INSERT IGNORE`, backtick identifiers —
  * load_game_mysql.py:84-91); everything else gets ANSI MERGE
  * (Derby/Postgres/Oracle/SQL Server, double-quote identifiers). The Derby
  * e2e spec drives the ANSI branch against a live embedded database; the
  * MySQL branch is text-pinned (no MySQL server ships in this sandbox) —
  * its statements are byte-comparable to the reference's own SQL.
  *
  * Replay contract (foreachBatch is at-least-once): upsert and insertIgnore
  * re-apply identical values on replay — idempotent. append is the raw
  * reference semantics; give `dedupKeys` to make replays no-ops.
  */
object JdbcSink {

  /** Merge-statement dialect, chosen from the JDBC URL. MySQL's upsert relies
    * on the TARGET TABLE's unique/primary key (there is no ON clause), so the
    * caller's `keys` must match a unique constraint on `table` — exactly the
    * contract the reference's loader assumes for `games.game_id`. */
  sealed trait Dialect {
    def quote(ident: String): String
    def upsertSql(table: String, staging: String,
                  cols: Seq[String], keys: Seq[String]): String
    def insertIgnoreSql(table: String, staging: String,
                        cols: Seq[String], keys: Seq[String]): String
  }

  object AnsiDialect extends Dialect {
    def quote(ident: String): String = "\"" + ident + "\""
    def upsertSql(table: String, staging: String,
                  cols: Seq[String], keys: Seq[String]): String = {
      val nonKeys = cols.filterNot(keys.contains)
      val on = keys.map(k => s"t.${quote(k)} = s.${quote(k)}").mkString(" AND ")
      val setSql = nonKeys.map(c => s"${quote(c)} = s.${quote(c)}").mkString(", ")
      val insCols = cols.map(quote).mkString(", ")
      val insVals = cols.map(c => s"s.${quote(c)}").mkString(", ")
      val matched = if (nonKeys.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setSql " else ""
      s"MERGE INTO $table t USING $staging s ON $on " + matched +
        s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"
    }
    def insertIgnoreSql(table: String, staging: String,
                        cols: Seq[String], keys: Seq[String]): String = {
      val on = keys.map(k => s"t.${quote(k)} = s.${quote(k)}").mkString(" AND ")
      val insCols = cols.map(quote).mkString(", ")
      val insVals = cols.map(c => s"s.${quote(c)}").mkString(", ")
      s"MERGE INTO $table t USING $staging s ON $on " +
        s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"
    }
  }

  /** The reference's own dialect: VALUES(col) update form (still the 5.7/8.0
    * spelling its loader uses) and INSERT IGNORE keyed on the table's unique
    * constraint. */
  object MySqlDialect extends Dialect {
    def quote(ident: String): String = "`" + ident + "`"
    def upsertSql(table: String, staging: String,
                  cols: Seq[String], keys: Seq[String]): String = {
      val nonKeys = cols.filterNot(keys.contains)
      val insCols = cols.map(quote).mkString(", ")
      val setSql =
        if (nonKeys.nonEmpty)
          nonKeys.map(c => s"${quote(c)}=VALUES(${quote(c)})").mkString(", ")
        else
          // pure-key table: MySQL still needs a SET clause; the no-op
          // assignment must QUALIFY the right-hand side with the target
          // table — an unqualified column is ambiguous between the target
          // and the SELECT's staging table (MySQL error 1052)
          keys.take(1).map(k => s"${quote(k)}=$table.${quote(k)}").mkString
      s"INSERT INTO $table ($insCols) SELECT $insCols FROM $staging " +
        s"ON DUPLICATE KEY UPDATE $setSql"
    }
    def insertIgnoreSql(table: String, staging: String,
                        cols: Seq[String], keys: Seq[String]): String = {
      val insCols = cols.map(quote).mkString(", ")
      s"INSERT IGNORE INTO $table ($insCols) SELECT $insCols FROM $staging"
    }
  }

  def dialectFor(url: String): Dialect =
    if (url != null && url.toLowerCase(java.util.Locale.ROOT)
        .startsWith("jdbc:mysql")) MySqlDialect
    else AnsiDialect

  /** Ensure `table` exists with the batch's schema (no rows written). On
    * MySQL the merge statements key off the TABLE's unique constraint, and
    * Spark's auto-created table has none — without adding one, ON DUPLICATE
    * KEY / INSERT IGNORE silently degrade to plain appends and replays
    * duplicate. The ALTER is idempotent-by-catch: error 1061 (duplicate key
    * name) means a prior run already added it. Only runs on the MySQL
    * dialect; the ANSI branch carries an explicit ON clause. */
  private def ensureTable(batch: DataFrame, url: String, table: String,
                          keys: Seq[String],
                          props: java.util.Properties): Unit = {
    batch.limit(0).write.mode(SaveMode.Ignore).jdbc(url, table, props)
    dialectFor(url) match {
      case d @ MySqlDialect if keys.nonEmpty =>
        val cols = keys.map(d.quote).mkString(", ")
        // idempotent-by-catch, but ONLY for MySQL error 1061 (ER_DUP_KEYNAME:
        // a prior run already added the constraint). Swallowing every
        // SQLException here — pre-existing duplicate rows (1062), missing
        // ALTER privilege, dropped connection — would leave the table KEYLESS,
        // silently degrading ON DUPLICATE KEY / INSERT IGNORE to plain appends
        // that duplicate on at-least-once replay: the exact bug this method
        // exists to prevent. Anything else propagates.
        try withConnection(url, props)(_.createStatement().executeUpdate(
          s"ALTER TABLE $table ADD CONSTRAINT ${d.quote("graft_upsert_key")} UNIQUE ($cols)"))
        catch {
          case e: java.sql.SQLException if e.getErrorCode == 1061 => ()
        }
      case _ => ()
    }
  }

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
    // 12 hex chars of uniqueness: the full 32-char UUID pushed any target
    // name over 24 chars past MySQL's 64-char identifier limit
    val staging = table + "__stage_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
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
    ensureTable(deduped, url, table, keys, props)
    val dialect = dialectFor(url)
    val cols = deduped.columns.toSeq
    withStaging(deduped, url, table, props) { (conn, staging) =>
      conn.createStatement().executeUpdate(
        dialect.upsertSql(table, staging, cols, keys))
    }
  }

  /** S12 insert-ignore: insert only rows whose key is absent; existing rows
    * untouched (MySQL INSERT IGNORE). Parity: Relational.insertIgnore. */
  def insertIgnoreBatch(batch: DataFrame, url: String, table: String,
                        keys: Seq[String], order: Seq[Column],
                        props: java.util.Properties = new java.util.Properties): Unit = {
    // order = Nil (the documented default via appendBatch) used to throw:
    // row_number demands an ordered window. All columns = a deterministic
    // total order; rows equal on every column are interchangeable anyway.
    val effOrder = if (order.nonEmpty) order else batch.columns.toSeq.map(org.apache.spark.sql.functions.col)
    val deduped = Relational.dedupKeepFirst(batch, keys, effOrder)
    ensureTable(deduped, url, table, keys, props)
    val dialect = dialectFor(url)
    val cols = deduped.columns.toSeq
    withStaging(deduped, url, table, props) { (conn, staging) =>
      conn.createStatement().executeUpdate(
        dialect.insertIgnoreSql(table, staging, cols, keys))
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
