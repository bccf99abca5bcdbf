package graft.sources

import org.apache.spark.sql.SparkSession

/** Exclusive writer lease over lake-resident mutable state (dedup indexes,
  * keep sets): a lock FILE created with overwrite=false — atomic on HDFS
  * (namenode-serialized create); on the local filesystem Hadoop's
  * ChecksumFileSystem implements it as exists-then-create, a narrow TOCTOU
  * best effort that is fine for tests and single-host tools. Object stores
  * without atomic create should front this with an external lock service.
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
  * break re-reads the payload immediately before deleting and only proceeds
  * if it still matches the observed-stale value (a fresh lock created in
  * the read-delete window survives). Neither check is atomic
  * compare-and-delete — that primitive doesn't exist on a filesystem — but
  * together they shrink the unowned-delete window from "any time after a
  * stale read" to the instants between a re-read and its delete.
  *
  * Clock and sleeper are injected (the Scheduler contract) so lease expiry
  * and bounded waiting unit-test in simulated time. */
object StateLock {

  private def readPayload(fs: org.apache.hadoop.fs.FileSystem,
                          lock: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = fs.open(lock)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    } catch { case _: Exception => None }

  private def payloadTs(p: String): Option[Long] =
    p.split(":", 2).headOption.flatMap(s => scala.util.Try(s.toLong).toOption)

  // a transient IO hiccup must not be mistaken for a missing/garbage
  // payload at either verify point (acquire or release) — both decide
  // whether a lease is OURS from this read
  private def readPayloadRetry(fs: org.apache.hadoop.fs.FileSystem,
                               lock: org.apache.hadoop.fs.Path,
                               attempts: Int = 3): Option[String] =
    Iterator.range(0, attempts).map(_ => readPayload(fs, lock))
      .find(_.isDefined).flatten

  def withLock[T](spark: SparkSession, lockPath: String,
                  leaseMs: Long = 30 * 60 * 1000L,
                  waitMs: Long = 0L,
                  pollMs: Long = 200L,
                  now: () => Long = System.currentTimeMillis _,
                  sleep: Long => Unit = Thread.sleep(_: Long))(f: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(lockPath)
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    Option(lock.getParent).foreach(fs.mkdirs)
    val uuid = java.util.UUID.randomUUID().toString
    // the payload actually written on the successful acquire — its timestamp
    // is taken AT acquisition, not at withLock entry: a contender that spent
    // most of waitMs polling must not start with a lease that already looks
    // that much older (it would be prematurely breakable)
    var written: String = null

    def tryAcquire(): Boolean = {
      // break a stale lease BEFORE trying to acquire; an unreadable payload
      // (torn write, garbage) counts as stale — no valid holder wrote it.
      // Ownership-checked: re-read right before the delete and only remove
      // the exact payload observed stale, so a fresh lock created in the
      // window survives the break.
      if (fs.exists(lock)) {
        val observed = readPayload(fs, lock)
        val stale = observed.flatMap(payloadTs).forall(t => now() - t > leaseMs)
        if (stale && readPayload(fs, lock) == observed) fs.delete(lock, false)
      }
      try {
        val out = fs.create(lock, /*overwrite=*/ false)
        val payload = s"${now()}:$uuid"
        try out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        // the file was VISIBLE with an empty payload between create and
        // write — a contender reading in that window classifies it stale
        // (unreadable ⇒ no valid holder) and may have deleted or replaced
        // it. Acquisition only counts if our payload survived the window;
        // otherwise fall back to the poll loop like any other lost race.
        // Retried read: a single transient error here would orphan our own
        // fresh lease. If the read stays unreadable, not acquiring is still
        // safe — OUR payload being unreadable means the next acquirer
        // classifies the lock stale and breaks it immediately.
        if (readPayloadRetry(fs, lock).contains(payload)) { written = payload; true }
        else false
      } catch { case _: java.io.IOException => false }
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
      // token and the new holder's lock must stay. The read is retried (a
      // single transient error would leak a valid-lease lock that blocks
      // fail-fast writers until expiry), but a still-unreadable result
      // deletes NOTHING: the reads may have raced a contender's
      // break-and-recreate (every read landing in its delete→create
      // window), and an exists-then-delete here would remove the new
      // holder's live lock. Leaving an unreadable lock behind is safe —
      // unreadable ⇒ the next acquirer classifies it stale and breaks it
      // without waiting out the lease.
      if (readPayloadRetry(fs, lock).contains(written)) fs.delete(lock, false)
    }
  }

  /** The lake-writer convention shared by DedupLake and VectorLake: one
    * `_LOCK` under the store's root, fail-fast (an ingest and a reconcile
    * must never interleave, so a contender refuses instead of queueing). */
  def withRootLock[T](spark: SparkSession, root: String,
                      leaseMs: Long = 30 * 60 * 1000L,
                      now: () => Long = System.currentTimeMillis _)(f: => T): T =
    withLock(spark, s"$root/_LOCK", leaseMs, waitMs = 0L, now = now)(f)
}
