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
  * The lock payload is the acquisition epoch-millis, so a crashed holder's
  * lease expires after `leaseMs` and the next writer breaks it. Clock and
  * sleeper are injected (the Scheduler contract) so lease expiry and
  * bounded waiting unit-test in simulated time. Delete-then-create on a
  * stale break is not atomic, but racing breakers both observed an expired
  * holder — whichever create wins holds a fresh valid lease, the loser
  * keeps polling or fails. */
object StateLock {

  def withLock[T](spark: SparkSession, lockPath: String,
                  leaseMs: Long = 30 * 60 * 1000L,
                  waitMs: Long = 0L,
                  pollMs: Long = 200L,
                  now: () => Long = System.currentTimeMillis _,
                  sleep: Long => Unit = Thread.sleep(_: Long))(f: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(lockPath)
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    Option(lock.getParent).foreach(fs.mkdirs)

    def tryAcquire(): Boolean = {
      // break a stale lease BEFORE trying to acquire; an unreadable payload
      // (torn write, garbage) counts as stale — no valid holder wrote it
      if (fs.exists(lock)) {
        val ts: Option[Long] =
          try {
            val in = fs.open(lock)
            try Some(new String(
              org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
              java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
            finally in.close()
          } catch { case _: Exception => None }
        if (ts.forall(t => now() - t > leaseMs)) fs.delete(lock, false)
      }
      try {
        val out = fs.create(lock, /*overwrite=*/ false)
        try out.write(now().toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
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
    try f finally fs.delete(lock, false)
  }
}
