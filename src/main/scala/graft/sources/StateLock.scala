package graft.sources

import org.apache.spark.sql.SparkSession

/** Exclusive writer lease over lake-resident mutable state (dedup indexes,
  * keep sets), behind a pluggable [[StateLock.LockProvider]].
  *
  * The default provider is a lock FILE created with overwrite=false — atomic
  * on HDFS (namenode-serialized create); on the local filesystem Hadoop's
  * ChecksumFileSystem implements it as exists-then-create, a narrow TOCTOU
  * best effort that is fine for tests and single-host tools. Object stores
  * WITHOUT atomic create must not use the file protocol at all: inject a
  * [[StateLock.LockProvider]] backed by a CAS-capable service (DynamoDB
  * conditional put, a database row, ZooKeeper) — the protocol logic here
  * (lease expiry, ownership checks, bounded waiting) is provider-agnostic.
  *
  * Why it exists: read-probe-append state (incremental dedup) is only
  * correct when each batch's probe sees every prior batch's append. Two
  * concurrent writers interleaving probe-before-append both keep a pair of
  * near-dup twins — silent divergence that only a reconcile pass repairs.
  * Serializing mutators through this lease turns that race into either a
  * short wait (`waitMs` > 0, the streaming-twins case) or a loud refusal
  * (`waitMs` = 0, the fail-fast case).
  *
  * The lock payload is `<acquisition-epoch-millis>:<unique-token>`: the
  * timestamp drives stale-lease expiry after `leaseMs`, and the token makes
  * every delete OWNERSHIP-CHECKED — release only removes the lock if the
  * payload still carries this holder's token (a holder that overran its
  * lease and was broken must NOT delete the new holder's lock), and a stale
  * break goes through [[StateLock.LockProvider.deleteIfMatches]], which on
  * a CAS provider is atomic compare-and-delete and on the file provider
  * re-reads immediately before deleting (shrinking the unowned-delete
  * window from "any time after a stale read" to the instants between a
  * re-read and its delete).
  *
  * Read-failure policy (the r7 advice race): a lock that EXISTS but whose
  * payload cannot be read after retries is classified LIVE, never stale —
  * two transient IO errors against a healthy holder must not delete its
  * lease and admit a second writer. Readable-but-garbage payloads (torn
  * write, the empty create-window file) still classify stale: no valid
  * holder wrote them. The cost of the live-on-read-error rule is that a
  * lock orphaned UNREADABLE blocks contenders until `leaseMs` expiry — the
  * safe side of the trade, and self-healing.
  *
  * Clock and sleeper are injected (the Scheduler contract) so lease expiry
  * and bounded waiting unit-test in simulated time. */
object StateLock {

  /** The minimal primitive set a lock backend must provide. Contracts:
    *  - [[tryCreate]] MUST be atomic create-if-absent (CAS). The Hadoop
    *    file provider approximates this with create(overwrite=false) — see
    *    the class doc for where that approximation is exact.
    *  - [[read]] returns the current payload; `None` means ABSENT OR the
    *    read failed (callers retry and then treat persistent None on an
    *    existing lock as live).
    *  - [[deleteIfMatches]] removes the lock iff its payload equals
    *    `observed` — atomic where the store supports compare-and-delete,
    *    read-then-delete best effort otherwise. */
  trait LockProvider {
    def tryCreate(payload: String): Boolean
    def read(): Option[String]
    def deleteIfMatches(observed: String): Boolean
    def exists(): Boolean
  }

  /** The Hadoop-filesystem protocol (HDFS/local): atomic-create lock file,
    * read-confirm-delete breaks. The create leaves the file VISIBLE with an
    * empty payload between create and write — [[withLock]]'s post-create
    * verify handles that window. */
  final class HadoopFileLockProvider(spark: SparkSession, lockPath: String)
      extends LockProvider {
    private val lock = new org.apache.hadoop.fs.Path(lockPath)
    private val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    Option(lock.getParent).foreach(fs.mkdirs)

    def tryCreate(payload: String): Boolean =
      try {
        val out = fs.create(lock, /*overwrite=*/ false)
        try out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }

    def read(): Option[String] =
      try {
        val in = fs.open(lock)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim)
        finally in.close()
      } catch { case _: Exception => None }

    def deleteIfMatches(observed: String): Boolean =
      // no filesystem compare-and-delete exists: re-read (retried — a
      // transient error here must not abort a legitimate break, r7 advice)
      // immediately before the delete and only remove the exact payload
      // the caller observed
      if (readRetry(this).contains(observed)) fs.delete(lock, false)
      else false

    def exists(): Boolean = fs.exists(lock)
  }

  private def payloadTs(p: String): Option[Long] =
    p.split(":", 2).headOption.flatMap(s => scala.util.Try(s.toLong).toOption)

  // a transient IO hiccup must not be mistaken for a missing/garbage
  // payload at ANY decision point — stale classification, acquire verify,
  // and release all decide lease fate from this read (r7 advice: the
  // single-attempt stale read was the unowned-delete race)
  private def readRetry(p: LockProvider, attempts: Int = 3): Option[String] =
    Iterator.range(0, attempts).map(_ => p.read())
      .find(_.isDefined).flatten

  def withLock[T](spark: SparkSession, lockPath: String,
                  leaseMs: Long = 30 * 60 * 1000L,
                  waitMs: Long = 0L,
                  pollMs: Long = 200L,
                  now: () => Long = System.currentTimeMillis _,
                  sleep: Long => Unit = Thread.sleep(_: Long),
                  provider: Option[LockProvider] = None)(f: => T): T = {
    val lock = provider.getOrElse(new HadoopFileLockProvider(spark, lockPath))
    val uuid = java.util.UUID.randomUUID().toString
    // the payload actually written on the successful acquire — its timestamp
    // is taken AT acquisition, not at withLock entry: a contender that spent
    // most of waitMs polling must not start with a lease that already looks
    // that much older (it would be prematurely breakable)
    var written: String = null

    def tryAcquire(): Boolean = {
      // break a stale lease BEFORE trying to acquire. Classification reads
      // are retried; a lock that exists but stays UNREADABLE is LIVE (see
      // object doc) — only a readable payload can be stale: garbage/empty
      // (no valid holder wrote it) or a parsed timestamp past the lease.
      if (lock.exists()) {
        val observed = readRetry(lock)
        val stale = observed.exists(p =>
          payloadTs(p).forall(t => now() - t > leaseMs))
        if (stale) lock.deleteIfMatches(observed.get)
      }
      val payload = s"${now()}:$uuid"
      if (!lock.tryCreate(payload)) false
      else readRetry(lock) match {
        // the file protocol leaves the lock VISIBLE with an empty payload
        // between create and write — a contender reading in that window
        // classifies it stale and may have deleted or replaced it.
        // Acquisition only counts once a read confirms OUR payload survived.
        case Some(p) if p == payload => written = payload; true
        // a contender broke our create-window file and owns the lock now
        case Some(_) => false
        case None =>
          // persistent transient failure reading our own fresh write: one
          // more retry round — if it confirms ownership, acquire (leaving a
          // fresh VALID lease orphaned here would block every fail-fast
          // writer for the full leaseMs, r7 advice). If it reads a
          // contender's payload, theirs; if still unreadable after six
          // attempts, give up WITHOUT deleting (we cannot confirm the file
          // is still ours) — the orphan blocks until lease expiry, the safe
          // side of an unowned delete.
          if (readRetry(lock).contains(payload)) { written = payload; true }
          else false
      }
    }

    val deadline = now() + waitMs
    var acquired = tryAcquire()
    while (!acquired && now() < deadline) {
      sleep(pollMs)
      acquired = tryAcquire()
    }
    require(acquired,
      s"state at $lockPath is locked by another writer (lease not expired" +
        (if (waitMs > 0) s"; waited ${waitMs} ms" else "") +
        ") — concurrent mutators would interleave index probes with appends. " +
        "Retry after the holder finishes, or raise waitMs to serialize behind it.")
    try f finally {
      // release ONLY our own lock: if this holder overran its lease and a
      // contender broke it and acquired, the payload no longer carries our
      // token and the new holder's lock must stay. deleteIfMatches performs
      // the ownership check (retried read on the file provider, atomic CAS
      // on capable stores); a still-unreadable payload deletes NOTHING —
      // unreadable ⇒ the next acquirer cannot classify it stale either, so
      // it blocks until lease expiry rather than risking an unowned delete.
      if (written != null) { lock.deleteIfMatches(written); () }
    }
  }

  /** The lake-writer convention shared by DedupLake and VectorLake: one
    * `_LOCK` under the store's root, fail-fast by default (an ingest and a
    * reconcile must never interleave, so a BATCH contender refuses instead
    * of queueing). `waitMs` > 0 is the STREAMING-ingest stance: a
    * micro-batch that collides with the scheduled reconcile should stall
    * behind it and then proceed, not crash the query. */
  def withRootLock[T](spark: SparkSession, root: String,
                      leaseMs: Long = 30 * 60 * 1000L,
                      now: () => Long = System.currentTimeMillis _,
                      waitMs: Long = 0L)(f: => T): T =
    withLock(spark, s"$root/_LOCK", leaseMs, waitMs = waitMs, now = now)(f)
}
