package graft.domain

import org.apache.spark.sql.SparkSession

import graft.sources.Writers

/** The shared GENERATION lifecycle of a versioned lake store (the r8 ask to
  * factor the common lake contract, done structurally rather than only as a
  * shared spec harness): pointer resolution, atomic promotion of a fully
  * written gen-(N+1) tree, two-generation retention, and legacy-layout
  * migration — ONE implementation behind [[VectorLake]] and [[DedupLake]],
  * inherited by the next lake. The pointer-file crash protocol itself is
  * [[Writers]]' (readPointerReadOnly / writePointer / recoverPointer).
  *
  * Contract: a store's mutable dirs live under `root/gen-N/`; the `GEN`
  * pointer names the current generation. Readers resolve the pointer ONCE
  * per operation, so every read under the returned root comes from one
  * generation — a promotion landing mid-operation can never mix
  * generations. Writers promote by writing the WHOLE new generation first
  * and flipping the pointer as the commit; a crash anywhere before the
  * flip leaves readers on gen-N with only an orphan dir (overwritten by
  * the next attempt). A pointer-less root (a store created before
  * versioning, or one that has never reconciled) works at the root layout
  * and is migrated by its first promotion. */
private[domain] object GenStore {

  def pointer(root: String): String = s"$root/GEN"

  def currentGen(spark: SparkSession, root: String): Option[Long] =
    Writers.readPointerReadOnly(spark, pointer(root)).map(_.toLong)

  def dataRootOf(root: String, gen: Option[Long]): String =
    gen.map(g => s"$root/gen-$g").getOrElse(root)

  /** READER-side: one resolution per operation. */
  def dataRoot(spark: SparkSession, root: String): String =
    dataRootOf(root, currentGen(spark, root))

  def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** WRITER-side promotion (call under the store's lease, with `cur` read
    * AFTER [[Writers.recoverPointer]]): `write` fills a fresh gen-(N+1)
    * root completely — an orphan from a crashed previous attempt is
    * deleted first — then the pointer flip COMMITS it. Retention: the
    * displaced generation survives one more promotion for in-flight
    * readers; older generations, and (once the first versioned generation
    * is itself displaced) the `legacyDirs` of the pre-versioning root
    * layout, are dropped. */
  def promote(spark: SparkSession, root: String, cur: Option[Long],
              legacyDirs: Seq[String])(write: String => Unit): Unit = {
    val newGen = cur.map(_ + 1).getOrElse(0L)
    val ngRoot = s"$root/gen-$newGen"
    deleteDir(spark, ngRoot)
    write(ngRoot)
    Writers.writePointer(spark, pointer(root), newGen.toString)
    for (g <- 0L until math.max(0L, newGen - 1))
      deleteDir(spark, s"$root/gen-$g")
    if (newGen >= 1)
      for (d <- legacyDirs; suf <- Seq("", "__tmp", "__old"))
        deleteDir(spark, s"$root/$d$suf")
  }
}
