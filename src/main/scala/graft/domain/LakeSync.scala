package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.Writers

/** CROSS-LAKE mutation sync — the fan-out a real purge or edit request
  * needs when the same document lives in BOTH stores (the dedup lake holds
  * its text, the vector lake its embedding, one id space — the testdata
  * contract and the usual production shape): mutating one lake and
  * crashing before the other leaves the content half-purged (or
  * half-refreshed), silently.
  *
  * The design is a tiny write-ahead INTENT LOG per mutation kind plus
  * idempotent fan-out:
  *  - `requests/` under the sync root — (doc_id) rows, the durable record
  *    that a purge was ORDERED. [[requestDelete]] appends (anti-joined, so
  *    an exact replay appends nothing).
  *  - `upserts/` — (doc_id, text, embedding) rows, the durable record of a
  *    cross-lake EDIT (the paired-payload contract). [[requestUpsert]]
  *    swap-replaces last-writer-wins per id.
  *  - The logs are DISJOINT by construction: each request call commits its
  *    OWN log first, THEN cancels the other log's rows for its ids (newer
  *    intent wins). Own-intent-first is load-bearing: cancelling first
  *    opened a crash window where the old intent was destroyed before the
  *    new one was durable — NEITHER survived (the r10 advice). A crash
  *    between the two steps now leaves an id in BOTH logs, and propagate
  *    resolves the intersection DELETE-WINS: for requestDelete's window
  *    the delete genuinely is the newer intent; for requestUpsert's the
  *    caller saw a FAILED call and retries (which re-cancels). Resolving
  *    the other way would silently cancel a durable purge, the one
  *    unacceptable loss.
  *  - [[propagate]] applies the WHOLE of both logs to both lakes (purges,
  *    then edits) and retires them. Both lakes' `delete` are no-ops for
  *    absent or already-tombstoned ids and both `upsert`s are idempotent
  *    as wholes, so re-applying after any crash is safe: the logs ARE the
  *    recovery plan, not cursors to maintain.
  *  - [[deleteDocs]]/[[upsertDocs]] = request + propagate, the one-call
  *    forms.
  *
  * Crash matrix (all replay-repaired by the next [[propagate]], scheduled
  * or manual): crash after a log append → the fan-out replays; crash
  * between the two lake deletes (or the two lake upserts) → the done side
  * no-ops, the missed side applies; crash before the retire → full
  * replay, all no-ops. Retirement is correct WITHOUT an applied-marker
  * because under the sync lease the whole log was just applied to both
  * lakes — from that moment the lakes' own tombstones/overlays carry the
  * pending physical work.
  *
  * Caveats, documented loudly: (1) ID REUSE — re-INGESTING a purged id is
  * safe only after the id's log entry is retired AND both lakes reclaimed
  * the tombstone (each lake's own caveat, plus this log's replay: a
  * crashed propagate's replay would re-delete content re-ingested under
  * the purged id in the window). [[pending]]/[[pendingUpserts]] are the
  * operator's checks; [[upsertDocs]] is the sanctioned resurrection (it
  * cancels the pending purge and the lakes' upserts drop the tombstones).
  * (2) LOCK ORDER — propagate holds the sync lease while taking each
  * lake's lease in turn (dedup, then vector); never call into LakeSync
  * while holding a lake lease, or two writers can deadlock-by-timeout.
  * (3) The logs are mutation-request-sized (rare by contract), never
  * corpus-sized — every operation here assumes that and stays bounded
  * (the upsert log is ENFORCED via maxLogRows). */
object LakeSync {

  val requestsSchema: StructType =
    StructType(Seq(StructField("doc_id", LongType)))
  val upsertsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", org.apache.spark.sql.types.StringType),
    StructField("embedding", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType))))

  final case class SyncReport(requested: Long, dedupDeleted: Long,
                              vectorDeleted: Long, retired: Long,
                              upsertsApplied: Long = 0L,
                              lexDeleted: Long = 0L)

  private def withSyncLock[T](spark: SparkSession, syncRoot: String,
                              waitMs: Long)(f: => T): T =
    graft.sources.StateLock.withRootLock(spark, syncRoot, waitMs = waitMs)(f)

  /** Durably record a purge order for `ids` (any frame with a `doc_id`
    * column). Append-only, anti-joined — an exact replay appends nothing.
    * Returns the number of ids newly logged. Does NOT touch the lakes:
    * pair with [[propagate]] (or call [[deleteDocs]]). */
  def requestDelete(spark: SparkSession, syncRoot: String, ids: DataFrame,
                    lockWaitMs: Long = 0L,
                    failpointAfterCommit: () => Unit = () => ()): Long =
    withSyncLock(spark, syncRoot, lockWaitMs) {
      val del = ids.select(col("doc_id").cast("long").as("doc_id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // COMMIT OUR OWN INTENT FIRST, cancel the opposite log second (the
        // r10 advice): the reverse order had a crash window — upserts
        // cancelled, requests not yet appended — that silently destroyed a
        // durably-committed edit while recording no purge (NEITHER intent
        // survived). With this order the torn state is an id in BOTH logs,
        // which propagate's delete-wins intersection resolves correctly:
        // here the delete genuinely IS the newer intent.
        val existing = Writers.readOrEmpty(spark, s"$syncRoot/requests",
          requestsSchema)
        val toWrite = del.join(existing, Seq("doc_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = try {
          // count while pinned, BEFORE the append — afterwards the plan's
          // requests read would see its own rows
          val n0 = toWrite.count()
          if (n0 > 0)
            toWrite.write.mode("append").parquet(s"$syncRoot/requests")
          n0
        } finally { toWrite.unpersist(blocking = false); () }
        failpointAfterCommit()
        // a newer purge CANCELS a pending edit for the same id: applying
        // both in either order would be wrong (edit-then-purge loses the
        // ordering guarantee on replay; purge-then-edit resurrects purged
        // content) — the two logs stay DISJOINT by construction instead
        val ups = Writers.readOrEmpty(spark, s"$syncRoot/upserts",
          upsertsSchema)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (ups.join(broadcast(del), Seq("doc_id"), "left_semi")
              .limit(1).count() > 0)
            Writers.swapReplace(spark, s"$syncRoot/upserts",
              ups.join(broadcast(del), Seq("doc_id"), "left_anti"))
        } finally { ups.unpersist(blocking = false); () }
        n
      } finally { del.unpersist(blocking = false); () }
    }

  /** Durably record a cross-lake EDIT for `docs` — (doc_id, text,
    * embedding) rows, the one-id-space contract: the dedup lake gets the
    * text, the vector lake the embedding, BOTH through their own
    * [[DedupLake.upsert]]/[[VectorLake.upsert]] at the next [[propagate]].
    * Last-writer-wins per id (the overlay merge), and a pending PURGE for
    * the same id is cancelled — this edit is newer intent, and replaying a
    * crashed purge after it would silently undo the edit (the id-reuse
    * window of the delete log, closed for the sanctioned path). A
    * text-only or embedding-only refresh is a SINGLE-lake operation — call
    * that lake's upsert directly; this log carries the paired payload by
    * contract. The log is edit-request-sized (ENFORCED via `maxLogRows`,
    * the lakes' own serving bounds apply at propagate). Returns the batch
    * row count. */
  def requestUpsert(spark: SparkSession, syncRoot: String, docs: DataFrame,
                    maxLogRows: Long = 1L << 20,
                    lockWaitMs: Long = 0L): Long =
    withSyncLock(spark, syncRoot, lockWaitMs) {
      val batch = docs.select(col("doc_id").cast("long").as("doc_id"),
        col("text"),
        col("embedding").cast(upsertsSchema("embedding").dataType)
          .as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val counts = batch
          .agg(count(lit(1)), count_distinct(col("doc_id"))).head()
        val n = counts.getLong(0)
        require(n == counts.getLong(1),
          s"upsert request carries duplicate doc_id values ($n rows, " +
            s"${counts.getLong(1)} distinct) — two payloads would race " +
            "for one id. Deduplicate the batch first.")
        val merged = Writers.readOrEmpty(spark, s"$syncRoot/upserts",
            upsertsSchema)
          .join(broadcast(batch.select("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(batch)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val m = merged.count()
          require(m <= maxLogRows,
            s"upsert log would grow to $m rows > maxLogRows=$maxLogRows — " +
              "the log is edit-request-sized by contract. Run propagate to " +
              "drain it, then resume.")
          if (n > 0) {
            Writers.swapReplace(spark, s"$syncRoot/upserts", merged)
            // the newer edit cancels a pending purge for the same id (see
            // requestDelete's mirror-image cancellation)
            val reqs = Writers.readOrEmpty(spark, s"$syncRoot/requests",
                requestsSchema)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              if (reqs.join(broadcast(batch.select("doc_id")),
                  Seq("doc_id"), "left_semi").limit(1).count() > 0)
                Writers.swapReplace(spark, s"$syncRoot/requests",
                  reqs.join(broadcast(batch.select("doc_id")),
                    Seq("doc_id"), "left_anti"))
            } finally { reqs.unpersist(blocking = false); () }
          }
          n
        } finally { merged.unpersist(blocking = false); () }
      } finally { batch.unpersist(blocking = false); () }
    }

  /** The logged-but-unapplied purge orders — read-only (no lease), the
    * operator's "is id reuse safe yet" check. Empty means every ordered
    * purge reached both lakes (their tombstones/reconciles own the
    * physical reclaim from there). */
  def pending(spark: SparkSession, syncRoot: String): DataFrame =
    Writers.readOrEmptyReadOnly(spark, s"$syncRoot/requests", requestsSchema)

  /** Apply the WHOLE intent log to both lakes, then retire it — the
    * fan-out and the crash repair in one idempotent pass (see the object
    * doc's crash matrix). `failpointAfterDedup` runs between the two lake
    * deletes and `failpointBeforeRetire` after both, before the log drop —
    * the two torn windows the spec drives. */
  def propagate(spark: SparkSession, syncRoot: String, dedupRoot: String,
                vectorRoot: String, lockWaitMs: Long = 0L,
                failpointAfterDedup: () => Unit = () => (),
                failpointBeforeRetire: () => Unit = () => (),
                failpointAfterDedupUpsert: () => Unit = () => (),
                lexRoot: Option[String] = None): SyncReport =
    withSyncLock(spark, syncRoot, lockWaitMs) {
      val reqs = Writers.readOrEmpty(spark, s"$syncRoot/requests",
          requestsSchema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // DELETE WINS on a (torn-request-only) intersection of the two logs:
      // the request calls cancel the other log BEFORE/AFTER their own
      // commit such that an id in both can only mean a requestUpsert
      // crashed between its commit and its cancellation — that caller saw
      // the failure and retries (which re-cancels), so applying the purge
      // here is the honest reading of the durable state
      val ups = Writers.readOrEmpty(spark, s"$syncRoot/upserts",
          upsertsSchema)
        .join(reqs, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = reqs.count()
        val nu = ups.count()
        if (n == 0L && nu == 0L) SyncReport(0L, 0L, 0L, 0L)
        else {
          val (nd, nv, nl) = if (n == 0L) (0L, 0L, 0L) else {
            val d = DedupLake.delete(spark, dedupRoot, reqs, lockWaitMs)
            failpointAfterDedup()
            val v = VectorLake.delete(spark, vectorRoot,
              reqs.select(col("doc_id").as("vec_id")), lockWaitMs)
            // the lexical index is the third store a purge must reach —
            // content absent from both content lakes but still SERVABLE
            // from the postings would be the silent leak this log exists
            // to prevent. Same idempotent-delete contract, same replay.
            val l = lexRoot.fold(0L)(lr =>
              LexLake.delete(spark, lr, reqs, lockWaitMs))
            (d, v, l)
          }
          // edits fan out AFTER purges (delete-wins order); every lake
          // upsert is idempotent as a whole, so any crash in between is
          // repaired by the next propagate replaying the still-resident log
          if (nu > 0L) {
            DedupLake.upsert(spark, dedupRoot,
              ups.select("doc_id", "text"), lockWaitMs = lockWaitMs)
            failpointAfterDedupUpsert()
            VectorLake.upsert(spark, vectorRoot,
              ups.select(col("doc_id").as("vec_id"), col("embedding")),
              lockWaitMs = lockWaitMs)
            // a ZERO-TOKEN text is a legal dedup-lake redaction but has no
            // lexical content — LexLake.upsert refuses it ("an empty
            // replacement is a delete"), and feeding it through would turn
            // one redaction into a poison pill that wedges every propagate
            // after the dedup+vector arms (the r10 advice). Route those
            // ids to LexLake.delete (idempotent, absent-id-safe); the
            // token-bearing rest takes the upsert path.
            for (lr <- lexRoot) {
              val toked = ups.withColumn("__tok",
                graft.functions.TextFunctions.tokenCount(col("text")))
              LexLake.delete(spark, lr,
                toked.filter(col("__tok") === 0).select("doc_id"),
                lockWaitMs = lockWaitMs)
              LexLake.upsert(spark, lr,
                toked.filter(col("__tok") > 0).select("doc_id", "text"),
                lockWaitMs = lockWaitMs)
            }
            ()
          }
          failpointBeforeRetire()
          // every logged id is now applied to every lake — the logs have
          // nothing left to recover
          GenStore.deleteDir(spark, s"$syncRoot/requests")
          GenStore.deleteDir(spark, s"$syncRoot/upserts")
          SyncReport(n, nd, nv, n, nu, nl)
        }
      } finally {
        ups.unpersist(blocking = false)
        reqs.unpersist(blocking = false); ()
      }
    }

  /** The logged-but-unapplied EDITS — read-only, the upsert mirror of
    * [[pending]]. */
  def pendingUpserts(spark: SparkSession, syncRoot: String): DataFrame =
    Writers.readOrEmptyReadOnly(spark, s"$syncRoot/upserts", upsertsSchema)

  /** Purge `ids` from BOTH lakes, durably: log the intent, then fan out.
    * Returns the propagate report (its `requested` covers any earlier
    * crashed orders replayed alongside this one). */
  def deleteDocs(spark: SparkSession, syncRoot: String, dedupRoot: String,
                 vectorRoot: String, ids: DataFrame,
                 lockWaitMs: Long = 0L,
                 lexRoot: Option[String] = None): SyncReport = {
    requestDelete(spark, syncRoot, ids, lockWaitMs)
    propagate(spark, syncRoot, dedupRoot, vectorRoot, lockWaitMs,
      lexRoot = lexRoot)
  }

  /** EDIT `docs` in BOTH lakes, durably: log the (doc_id, text, embedding)
    * payload, then fan out — the cross-lake re-encode a model/content
    * refresh issues when one document lives in both stores. Returns the
    * propagate report (`upsertsApplied` covers any earlier crashed edits
    * replayed alongside this one). */
  def upsertDocs(spark: SparkSession, syncRoot: String, dedupRoot: String,
                 vectorRoot: String, docs: DataFrame,
                 lockWaitMs: Long = 0L,
                 lexRoot: Option[String] = None): SyncReport = {
    requestUpsert(spark, syncRoot, docs, lockWaitMs = lockWaitMs)
    propagate(spark, syncRoot, dedupRoot, vectorRoot, lockWaitMs,
      lexRoot = lexRoot)
  }

  /** The catch-up [[propagate]] as a cron [[Scheduler.Deployment]] —
    * closes any crashed fan-out on a schedule (default daily 01:00, before
    * the lakes' own compaction/reconcile slots, so a replay lands while
    * the original tombstones are still cheap no-ops). Waits behind a
    * running lake writer instead of failing the scheduled run. */
  def deployment(spark: SparkSession, syncRoot: String, dedupRoot: String,
                 vectorRoot: String, cron: String = "0 1 * * *",
                 lockWaitMs: Long = 10 * 60 * 1000L,
                 lexRoot: Option[String] = None): Scheduler.Deployment =
    Scheduler.Deployment("lake_delete_sync", Scheduler.parse(cron),
      () => { propagate(spark, syncRoot, dedupRoot, vectorRoot, lockWaitMs,
        lexRoot = lexRoot); () })
}
