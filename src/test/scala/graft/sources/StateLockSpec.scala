package graft.sources

import graft.SparkSpec

/** The shared writer-lease contract behind DedupLake and the streaming
  * media-ingest index: bounded waiting serializes a contender behind the
  * holder; expiry breaks a crashed holder's lease; timeout fails loudly.
  * All in simulated time (injected now/sleep). */
class StateLockSpec extends SparkSpec {

  private def fs(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def holdLock(dir: String, ts: Long): org.apache.hadoop.fs.Path = {
    val lock = new org.apache.hadoop.fs.Path(dir, "__LOCK")
    val out = fs(dir).create(lock, false)
    out.write(ts.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    lock
  }

  private def plant(path: String, payload: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = fs(path).create(p, true)
    out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  test("heartbeat extends a live holder's lease: contender refuses past base expiry") {
    val dir = java.nio.file.Files.createTempDirectory("lock-hb-live").toString
    plant(s"$dir/__LOCK", "1000000:tokA")
    plant(s"$dir/__LOCK.hb", "5000000:tokA") // renewed 4000 s later
    val t = 5000500L // lock ts is long stale; the hb is 500 ms old
    intercept[IllegalArgumentException] {
      StateLock.withLock(spark, s"$dir/__LOCK", leaseMs = 1000L,
        now = () => t) { fail("must not enter: the heartbeat renewed the lease") }
    }
  }

  test("token-mismatched / garbage heartbeats are ignored in classification") {
    // a leftover hb from a PREVIOUS broken holder must not extend a new
    // holder's (here: stale) lease; unparseable beats likewise
    for (hbPayload <- Seq("5000000:tokB", "not-a-heartbeat")) {
      val dir = java.nio.file.Files.createTempDirectory("lock-hb-mm").toString
      plant(s"$dir/__LOCK", "1000000:tokA")
      plant(s"$dir/__LOCK.hb", hbPayload)
      var entered = false
      StateLock.withLock(spark, s"$dir/__LOCK", leaseMs = 1000L,
        now = () => 1002000L) { entered = true }
      assert(entered, s"hb '$hbPayload' wrongly extended a stale lease")
    }
  }

  test("breaking a dead holder also cleans its token-matched heartbeat") {
    val dir = java.nio.file.Files.createTempDirectory("lock-hb-dead").toString
    plant(s"$dir/__LOCK", "1000000:tokA")
    plant(s"$dir/__LOCK.hb", "2000000:tokA") // last beat, then crash
    var entered = false
    // 1500 ms after the LAST BEAT (not the lock ts): expired -> broken
    StateLock.withLock(spark, s"$dir/__LOCK", leaseMs = 1000L,
      now = () => 2001500L) { entered = true }
    assert(entered)
    assert(!fs(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/__LOCK.hb")),
      "the dead holder's heartbeat must be swept with its lock")
  }

  test("e2e: a slow holder outlives its base lease via real heartbeats") {
    val dir = java.nio.file.Files.createTempDirectory("lock-hb-e2e").toString
    val lockPath = s"$dir/__LOCK"
    @volatile var holderDone = false
    @volatile var holderErr: Throwable = null
    // the contender must measure its 900 ms from the holder's ACQUISITION,
    // not from thread start — provider init latency made a start-relative
    // sleep race the acquire itself (observed flaky)
    val acquired = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      try {
        StateLock.withLock(spark, lockPath, leaseMs = 500L, heartbeatMs = 100L) {
          acquired.countDown()
          Thread.sleep(1500) // 3x the base lease
        }
        holderDone = true
      } catch { case t: Throwable => holderErr = t }
    })
    holder.start()
    try {
      assert(acquired.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "holder never acquired")
      Thread.sleep(900) // base lease long expired; beats keep it live
      intercept[IllegalArgumentException] {
        StateLock.withLock(spark, lockPath, leaseMs = 500L) {
          fail("must not enter while the holder is beating")
        }
      }
    } finally holder.join(10000)
    assert(holderErr == null, String.valueOf(holderErr))
    assert(holderDone)
    assert(!fs(dir).exists(new org.apache.hadoop.fs.Path(s"$lockPath.hb")),
      "release must remove the holder's own heartbeat")
    var entered = false
    StateLock.withLock(spark, lockPath, leaseMs = 500L) { entered = true }
    assert(entered, "after release the lock is free")
  }

  test("bounded wait: a contender enters once the holder releases mid-wait") {
    val dir = java.nio.file.Files.createTempDirectory("lock-wait").toString
    var t = 1000000L
    val lock = holdLock(dir, t)
    var polls = 0
    var entered = false
    StateLock.withLock(spark, lock.toString, leaseMs = 3600000L,
      waitMs = 2000L, pollMs = 100L,
      now = () => t,
      sleep = ms => { t += ms; polls += 1; if (polls == 3) fs(dir).delete(lock, false); () }) {
      entered = true
    }
    assert(entered && polls >= 3)
  }

  test("timeout: waiting past waitMs on a live lease fails with the wait in the message") {
    val dir = java.nio.file.Files.createTempDirectory("lock-timeout").toString
    var t = 1000000L
    holdLock(dir, t)
    val ex = intercept[IllegalArgumentException] {
      StateLock.withLock(spark, s"$dir/__LOCK", leaseMs = 3600000L,
        waitMs = 500L, pollMs = 100L,
        now = () => t, sleep = ms => { t += ms; () }) { fail("must not enter") }
    }
    assert(ex.getMessage.contains("waited 500 ms"), ex.getMessage)
  }

  test("stale lease: an expired holder is broken during the wait loop") {
    val dir = java.nio.file.Files.createTempDirectory("lock-stale").toString
    var t = 1000000L
    holdLock(dir, t)
    var entered = false
    // lease is 1 s; the first poll advances past expiry, the second acquires
    StateLock.withLock(spark, s"$dir/__LOCK", leaseMs = 1000L,
      waitMs = 5000L, pollMs = 1500L,
      now = () => t, sleep = ms => { t += ms; () }) { entered = true }
    assert(entered)
  }

  test("release is ownership-checked: an overrun holder must not delete a successor's lock") {
    val dir = java.nio.file.Files.createTempDirectory("lock-own").toString
    val lock = new org.apache.hadoop.fs.Path(dir, "__LOCK")
    var t = 1000000L
    StateLock.withLock(spark, lock.toString, leaseMs = 1000L, now = () => t) {
      // simulate: this holder overran its lease, a contender broke the lock
      // and acquired with its own payload
      fs(dir).delete(lock, false)
      val out = fs(dir).create(lock, false)
      out.write(s"${t + 5000}:successor-token".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
    // the overrun holder's release must have left the successor's lock alone
    val in = fs(dir).open(lock)
    val payload = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    assert(payload.endsWith(":successor-token"), payload)
  }

  test("lease timestamp is taken at acquisition, not at withLock entry") {
    val dir = java.nio.file.Files.createTempDirectory("lock-acq-ts").toString
    val lock = new org.apache.hadoop.fs.Path(dir, "__LOCK")
    var t = 1000000L
    holdLock(dir, t)
    var leaseTs = -1L
    // holder releases after 3 polls; contender acquires at t + 3*pollMs.
    // If the payload carried entry-time, the new lease would already look
    // 1500 ms old — premature-break bait for the next contender.
    var polls = 0
    StateLock.withLock(spark, lock.toString, leaseMs = 3600000L,
      waitMs = 5000L, pollMs = 500L,
      now = () => t,
      sleep = ms => { t += ms; polls += 1; if (polls == 3) fs(dir).delete(lock, false); () }) {
      val in = fs(dir).open(lock)
      val payload = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      in.close()
      leaseTs = payload.split(":", 2)(0).toLong
    }
    assert(leaseTs == t, s"lease ts $leaseTs should be acquisition time $t")
  }

  test("unreadable lock payload counts as stale and is broken") {
    val dir = java.nio.file.Files.createTempDirectory("lock-garbage").toString
    val lock = new org.apache.hadoop.fs.Path(dir, "__LOCK")
    val out = fs(dir).create(lock, false)
    out.write("not-a-number".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    var entered = false
    StateLock.withLock(spark, lock.toString, leaseMs = 60000L,
      now = () => 42L) { entered = true }
    assert(entered)
  }

  /** In-memory CAS lock state — what a DynamoDB conditional put / ZooKeeper
    * node gives on stores whose file CREATE is not atomic. tryCreate and
    * deleteIfMatches are genuine compare-and-swap. */
  private class CasProvider(
      state: java.util.concurrent.atomic.AtomicReference[String])
      extends StateLock.LockProvider {
    def tryCreate(payload: String): Boolean = state.compareAndSet(null, payload)
    def read(): Option[String] = Option(state.get())
    def deleteIfMatches(observed: String): Boolean =
      state.compareAndSet(observed, null)
    def exists(): Boolean = state.get() != null
  }

  test("a transient heartbeat read error must not break a live renewing holder") {
    // the renewing holder's LOCK timestamp is old by design — only its
    // heartbeat proves it alive. One flaky hb read classified as
    // no-heartbeat would break the lease; the hb read must retry (the r7
    // single-attempt-read race, hb edition).
    val lockState = new java.util.concurrent.atomic.AtomicReference[String](
      "1000000:tokA") // written long ago
    val hbReads = new java.util.concurrent.atomic.AtomicInteger(0)
    val hbState = new java.util.concurrent.atomic.AtomicReference[String](
      "9000000:tokA") // fresh beat
    val flakyHb = new StateLock.LockProvider {
      def tryCreate(p: String): Boolean = false
      def read(): Option[String] =
        if (hbReads.incrementAndGet() == 1) None // one transient failure
        else Option(hbState.get())
      def deleteIfMatches(o: String): Boolean = hbState.compareAndSet(o, null)
      def exists(): Boolean = hbState.get() != null
    }
    intercept[IllegalArgumentException] {
      StateLock.withLock(spark, "(cas)", leaseMs = 1000L,
        now = () => 9000500L,
        provider = Some(new CasProvider(lockState)),
        hbProvider = Some(flakyHb)) { fail("a renewing holder was broken") }
    }
    assert(hbReads.get() >= 2, "the hb classification read must be retried")
    assert(lockState.get() == "1000000:tokA", "the live holder's lock survived")
  }

  test("injected CAS provider serializes writers on a non-atomic-create store") {
    // the simulated object store: file create is NOT exclusive, so the file
    // protocol would admit two holders — the CAS provider is the lock
    val state = new java.util.concurrent.atomic.AtomicReference[String](null)
    val inCritical = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    var counter = 0L // deliberately unsynchronized: lost updates expose overlap
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try {
          for (_ <- 1 to 25)
            StateLock.withLock(spark, "(cas)", leaseMs = 60000L,
              waitMs = 30000L, pollMs = 1L,
              provider = Some(new CasProvider(state))) {
              val c = inCritical.incrementAndGet()
              maxSeen.getAndUpdate(m => math.max(m, c))
              val v = counter; Thread.sleep(0, 200000); counter = v + 1
              inCritical.decrementAndGet(); ()
            }
        } catch { case t: Throwable => errors.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, errors.toString)
    assert(maxSeen.get() == 1, s"concurrent holders: ${maxSeen.get()}")
    assert(counter == 100L, s"lost updates: $counter / 100")
    assert(state.get() == null, "lock leaked after all releases")
  }

  test("a lock that exists but stays unreadable is LIVE: fail-fast refuses, never breaks") {
    // two transient IO errors against a healthy holder must not delete its
    // lease (the r7 advice race) — even past lease expiry, an unreadable
    // payload is not evidence of staleness
    var deleted = false
    val p = new StateLock.LockProvider {
      def tryCreate(payload: String): Boolean = false
      def read(): Option[String] = None // persistent read error
      def deleteIfMatches(observed: String): Boolean = { deleted = true; true }
      def exists(): Boolean = true
    }
    val ex = intercept[IllegalArgumentException] {
      StateLock.withLock(spark, "(flaky)", leaseMs = 10L,
        now = () => 1000000L, provider = Some(p)) { fail("must not enter") }
    }
    assert(ex.getMessage.contains("locked by another writer"))
    assert(!deleted, "an unreadable live lock was broken")
  }

  test("heartbeat writes are atomic for readers: no torn/empty payload is ever visible") {
    // the r8 medium: create(overwrite=true) is truncate-then-write, and a
    // contender classifying during the window reads Some("") — readable
    // garbage that falls back to the lock's by-design-old timestamp and
    // breaks a LIVE renewing holder. writeReplace must rename a fully
    // written sibling over the hb path, so a racing reader sees the old
    // beat or the new one, never a torn one.
    val dir = java.nio.file.Files.createTempDirectory("lock-hb-atomic").toString
    val hbPath = s"$dir/__LOCK.hb"
    val p = new StateLock.HadoopFileLockProvider(spark, hbPath)
    assert(p.writeReplace("1000:tokA"), "first beat must succeed")
    @volatile var stop = false
    val torn = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val reader = new Thread(() => {
      while (!stop) p.read().foreach { s =>
        if (!s.matches("\\d+:tok[AB]")) { torn.add(s"'$s'"); () }
      }
    })
    reader.start()
    for (i <- 2 to 300) assert(p.writeReplace(s"${i * 1000}:tokB"))
    stop = true
    reader.join(10000)
    assert(torn.isEmpty, s"readers saw torn heartbeat payloads: $torn")
    assert(p.read().contains("300000:tokB"))
    assert(!fs(dir).exists(new org.apache.hadoop.fs.Path(s"$hbPath.tmp")),
      "writeReplace must not strand its tmp sibling")
  }

  test("a broken holder's beater stops once the lock carries a successor's token") {
    // the r8 low: all holders share one hb path, so after a (wrongful or
    // overrun) break the OLD holder's still-running beater would keep
    // overwriting the NEW holder's heartbeats with token-mismatched
    // payloads — silently disabling the new lease's renewal. The beater
    // re-reads the lock and stops once its token no longer matches.
    val lockState = new java.util.concurrent.atomic.AtomicReference[String](null)
    val hbState = new java.util.concurrent.atomic.AtomicReference[String](null)
    val hbP = new StateLock.LockProvider {
      def tryCreate(p: String): Boolean = hbState.compareAndSet(null, p)
      def read(): Option[String] = Option(hbState.get())
      def deleteIfMatches(o: String): Boolean = hbState.compareAndSet(o, null)
      def exists(): Boolean = hbState.get() != null
      override def writeReplace(p: String): Boolean = { hbState.set(p); true }
    }
    StateLock.withLock(spark, "(cas)", leaseMs = 600L, heartbeatMs = 30L,
      provider = Some(new CasProvider(lockState)),
      hbProvider = Some(hbP)) {
      // wait for the beater to prove it's alive
      val t0 = System.currentTimeMillis()
      while (hbState.get() == null &&
        System.currentTimeMillis() - t0 < 5000) Thread.sleep(5)
      assert(hbState.get() != null, "beater never beat")
      // simulate a contender breaking this lease and acquiring: the lock now
      // carries the successor's token, and the successor starts beating
      lockState.set("999999:successor-token")
      hbState.set("123456:successor-token")
      // the old beater must stop, leaving the successor's beat untouched
      Thread.sleep(300)
      assert(hbState.get() == "123456:successor-token",
        s"stale beater stomped the successor's heartbeat: ${hbState.get()}")
    }
    // release was ownership-checked: the successor's lock and beat survive
    assert(lockState.get() == "999999:successor-token")
    assert(hbState.get() == "123456:successor-token")
  }

  test("transient verify-read failure does not orphan a fresh lease") {
    // the r7 advice low: verify reads fail transiently right after our own
    // create — the retried second round must confirm ownership and acquire
    // (an orphaned valid lease would block fail-fast writers for leaseMs)
    val state = new java.util.concurrent.atomic.AtomicReference[String](null)
    val failures = new java.util.concurrent.atomic.AtomicInteger(4)
    val p = new CasProvider(state) {
      override def read(): Option[String] =
        if (failures.getAndDecrement() > 0) None else super.read()
    }
    var entered = false
    StateLock.withLock(spark, "(verify-flaky)", leaseMs = 60000L,
      provider = Some(p)) { entered = true }
    assert(entered, "retried verify should have confirmed ownership")
    assert(state.get() == null, "lock not released")
  }
}
