package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.Writers

/** CROSS-LAKE deletion sync — the fan-out a real purge request needs when
  * the same document lives in BOTH stores (the dedup lake holds its text,
  * the vector lake its embedding, one id space — the testdata contract and
  * the usual production shape): deleting from one lake and crashing before
  * the other leaves the content half-purged, silently.
  *
  * The design is a tiny write-ahead INTENT LOG plus idempotent fan-out:
  *  - `requests/` under the sync root — (doc_id) rows, the durable record
  *    that a purge was ORDERED. [[requestDelete]] appends (anti-joined, so
  *    an exact replay appends nothing).
  *  - [[propagate]] applies the WHOLE log to both lakes and then retires
  *    it. Both lakes' `delete` are no-ops for absent or already-tombstoned
  *    ids, so re-applying after any crash is safe: the log IS the recovery
  *    plan, not a cursor to maintain.
  *  - [[deleteDocs]] = request + propagate, the one-call form.
  *
  * Crash matrix (all replay-repaired by the next [[propagate]], scheduled
  * or manual): crash after the log append → both deletes replay; crash
  * between the two lake deletes → the done side no-ops, the missed side
  * applies; crash before the retire → full replay, all no-ops. Retirement
  * is correct WITHOUT an applied-marker because under the sync lease the
  * whole log was just applied to both lakes — from that moment the lakes'
  * own tombstones carry the pending physical reclaim.
  *
  * Caveats, documented loudly: (1) ID REUSE — re-ingesting a purged id is
  * safe only after the id's log entry is retired AND both lakes reclaimed
  * the tombstone (each lake's own caveat, plus this log's replay: a
  * crashed propagate's replay would re-delete content re-ingested under
  * the purged id in the window). [[pending]] is the operator's check.
  * (2) LOCK ORDER — propagate holds the sync lease while taking each
  * lake's lease in turn (dedup, then vector); never call into LakeSync
  * while holding a lake lease, or two writers can deadlock-by-timeout.
  * (3) The log is purge-request-sized (rare by contract), never
  * corpus-sized — every operation here assumes that and stays bounded. */
object LakeSync {

  val requestsSchema: StructType =
    StructType(Seq(StructField("doc_id", LongType)))

  final case class SyncReport(requested: Long, dedupDeleted: Long,
                              vectorDeleted: Long, retired: Long)

  private def withSyncLock[T](spark: SparkSession, syncRoot: String,
                              waitMs: Long)(f: => T): T =
    graft.sources.StateLock.withRootLock(spark, syncRoot, waitMs = waitMs)(f)

  /** Durably record a purge order for `ids` (any frame with a `doc_id`
    * column). Append-only, anti-joined — an exact replay appends nothing.
    * Returns the number of ids newly logged. Does NOT touch the lakes:
    * pair with [[propagate]] (or call [[deleteDocs]]). */
  def requestDelete(spark: SparkSession, syncRoot: String, ids: DataFrame,
                    lockWaitMs: Long = 0L): Long =
    withSyncLock(spark, syncRoot, lockWaitMs) {
      val del = ids.select(col("doc_id").cast("long").as("doc_id")).distinct()
      val existing = Writers.readOrEmpty(spark, s"$syncRoot/requests",
        requestsSchema)
      val toWrite = del.join(existing, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // count while pinned, BEFORE the append — afterwards the plan's
        // requests read would see its own rows
        val n = toWrite.count()
        if (n > 0)
          toWrite.write.mode("append").parquet(s"$syncRoot/requests")
        n
      } finally { toWrite.unpersist(blocking = false); () }
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
                failpointBeforeRetire: () => Unit = () => ()): SyncReport =
    withSyncLock(spark, syncRoot, lockWaitMs) {
      val reqs = Writers.readOrEmpty(spark, s"$syncRoot/requests",
          requestsSchema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = reqs.count()
        if (n == 0L) SyncReport(0L, 0L, 0L, 0L)
        else {
          val nd = DedupLake.delete(spark, dedupRoot, reqs, lockWaitMs)
          failpointAfterDedup()
          val nv = VectorLake.delete(spark, vectorRoot,
            reqs.select(col("doc_id").as("vec_id")), lockWaitMs)
          failpointBeforeRetire()
          // every logged id is now applied to both lakes (tombstoned or
          // already absent) — the log has nothing left to recover
          GenStore.deleteDir(spark, s"$syncRoot/requests")
          SyncReport(n, nd, nv, n)
        }
      } finally { reqs.unpersist(blocking = false); () }
    }

  /** Purge `ids` from BOTH lakes, durably: log the intent, then fan out.
    * Returns the propagate report (its `requested` covers any earlier
    * crashed orders replayed alongside this one). */
  def deleteDocs(spark: SparkSession, syncRoot: String, dedupRoot: String,
                 vectorRoot: String, ids: DataFrame,
                 lockWaitMs: Long = 0L): SyncReport = {
    requestDelete(spark, syncRoot, ids, lockWaitMs)
    propagate(spark, syncRoot, dedupRoot, vectorRoot, lockWaitMs)
  }

  /** The catch-up [[propagate]] as a cron [[Scheduler.Deployment]] —
    * closes any crashed fan-out on a schedule (default daily 01:00, before
    * the lakes' own compaction/reconcile slots, so a replay lands while
    * the original tombstones are still cheap no-ops). Waits behind a
    * running lake writer instead of failing the scheduled run. */
  def deployment(spark: SparkSession, syncRoot: String, dedupRoot: String,
                 vectorRoot: String, cron: String = "0 1 * * *",
                 lockWaitMs: Long = 10 * 60 * 1000L): Scheduler.Deployment =
    Scheduler.Deployment("lake_delete_sync", Scheduler.parse(cron),
      () => { propagate(spark, syncRoot, dedupRoot, vectorRoot, lockWaitMs); () })
}
