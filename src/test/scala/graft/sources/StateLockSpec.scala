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
