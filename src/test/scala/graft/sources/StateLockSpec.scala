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
}
