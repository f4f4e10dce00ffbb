package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ATOMICITY PRIMITIVE behind snapshot-table commits, pluggable
  * per session via `spark.graft.logStore.class` (a class name with a
  * no-arg constructor; default [[HdfsLogStore]]).
  *
  * The whole commit protocol rests on one guarantee: for a given
  * manifest path, AT MOST ONE writer's createAtomic returns true.
  * Winning the name IS winning the version slot; every conflict,
  * retry and rebase decision upstream assumes it.
  *
  * [[HdfsLogStore]] implements the guarantee with create-exclusive
  * (`fs.create(target, overwrite = false)`), which is atomic on HDFS
  * and posix-like stores — the deployments the sandbox exercises.
  * Plain S3 has NO atomic create-if-absent through the Hadoop
  * FileSystem API, so an object-store deployment MUST configure a
  * store that supplies mutual exclusion another way, or corruption
  * under concurrent writers is silent (both "win", last PUT wins the
  * name). The documented contract for such a store (Delta's LogStore
  * precedent):
  *   - conditional PUT (`If-None-Match: *` — S3 supports this since
  *     2024, GCS/Azure natively): return false on precondition
  *     failure, true on 200;
  *   - or an external lock/lease (DynamoDB-style): acquire on the
  *     target name, re-check absence, PUT, release.
  * Content must be INVISIBLE until complete (PUT is all-or-nothing on
  * object stores, so the in-manifest end-of-transaction marker's
  * torn-write spin never fires there).
  */
trait GraftLogStore {
  /** Atomically publish `content` at `target` iff nothing exists
    * there. true = won the slot (content fully visible or recoverable
    * per the torn-marker protocol); false = LOST THE RACE (a
    * competing manifest owns the name). Any other failure — including
    * a write failure after winning the name that leaves a torn file
    * the store cannot remove — must THROW, never return false: a
    * false triggers a retry at the next version, and retrying past an
    * unremovable torn manifest would let a reader inherit its partial
    * file list. */
  def createAtomic(fs: FileSystem, target: Path,
      content: Array[Byte]): Boolean
}

/** Create-exclusive implementation for HDFS/posix-compatible stores
  * (atomic name acquisition; content visibility guarded by the
  * manifest's end-of-transaction marker). */
class HdfsLogStore extends GraftLogStore {
  override def createAtomic(fs: FileSystem, target: Path,
      content: Array[Byte]): Boolean = {
    val out =
      try fs.create(target, false) // exclusive: one winner per version
      catch {
        case e: java.io.IOException =>
          // Only a LOST RACE is non-fatal, and a lost race is
          // observable: the winner's manifest exists. Any create
          // failure without a winning manifest (permissions, disk
          // full, bad mount) would fail every retry identically —
          // rethrow it as what it is.
          if (fs.exists(target)) return false else throw e
      }
    try {
      out.write(content)
      out.close()
      true
    } catch {
      // we WON the name but failed to fill it (disk full, I/O error
      // mid-write): remove the torn manifest so no reader or retrying
      // committer ever parses a partial file list, then surface the
      // real failure
      case e: Throwable =>
        try out.close() catch { case _: Throwable => () }
        // the delete MUST succeed: if the torn manifest lingers, a
        // retrying committer would classify it as a lost race and
        // inherit its partial file list — fail hard instead
        if (fs.exists(target) && !fs.delete(target, false))
          sys.error(s"snapshot commit: manifest write to $target " +
            s"failed AND the torn manifest could not be removed — " +
            s"manual cleanup required before any further commit " +
            s"(cause: $e)")
        throw new java.io.IOException(
          s"snapshot commit: manifest write to $target failed", e)
    }
  }
}

/** Object-store-shaped commit guard — the PRODUCTION template for
  * buckets without atomic create-exclusive (plain S3/GCS/Azure),
  * runnable and stress-tested in this sandbox. It performs the exact
  * two-step commit a cloud deployment performs:
  *
  *   1. [[stage]]: upload the COMPLETE manifest body as a hidden,
  *      uniquely-named staging object (`staged-<uuid>.obj`). Object
  *      PUTs are all-or-nothing, so no reader can ever observe a
  *      partial manifest — a writer dying here leaves only an
  *      invisible orphan ([[SnapshotTable.vacuum]] reclaims it past
  *      the grace window; version listings match `v*.manifest` and
  *      never see it).
  *   2. [[publishIfAbsent]]: bind the staged content to the target
  *      name iff the name is unclaimed. On S3 this is
  *      `PUT ... If-None-Match: *` (supported since 2024) or
  *      CopyObject with the same precondition; on GCS
  *      `x-goog-if-generation-match: 0`; on Azure `If-None-Match: *`.
  *      This instance emulates the precondition with an atomic POSIX
  *      hard link — link(2) fails with EEXIST iff the name exists and
  *      is atomic against every concurrent linker, the same
  *      at-most-one-winner semantics — so the protocol around it is
  *      exercised unchanged; a bucket deployment swaps ONLY the body
  *      of [[publishIfAbsent]] for the real conditional PUT.
  *
  * Failure contract (same as the trait's): a lost precondition
  * returns false; everything else throws. The staging name is
  * unlinked on every path — after a successful publish the content
  * survives under the target name (the inode has two names until the
  * unlink), after a loss or failure nothing visible remains. */
class ObjectStoreLogStore extends GraftLogStore {

  /** Step 1: the all-or-nothing upload. FS-agnostic (uses the Hadoop
    * stream API); any failure cleans the orphan best-effort and
    * rethrows — the target name was never touched. */
  protected def stage(fs: FileSystem, target: Path,
      content: Array[Byte]): Path = {
    val staged = new Path(target.getParent,
      s"staged-${java.util.UUID.randomUUID()}.obj")
    val out = fs.create(staged, false)
    try { out.write(content); out.close() }
    catch {
      case e: Throwable =>
        try out.close() catch { case _: Throwable => () }
        try fs.delete(staged, false) catch { case _: Throwable => () }
        throw new java.io.IOException(
          s"snapshot commit: staging object upload to $staged failed", e)
    }
    staged
  }

  /** Step 2: the conditional publish. true = claimed the name;
    * false = precondition failed (a competing manifest owns it). */
  protected def publishIfAbsent(fs: FileSystem, staged: Path,
      target: Path): Boolean = {
    val local = (p: Path) => {
      val u = p.toUri
      require(u.getScheme == null || u.getScheme == "file",
        s"ObjectStoreLogStore's sandbox publish emulates the " +
          s"conditional PUT with a POSIX hard link and needs a local " +
          s"path (got $p); deploy against a bucket by overriding " +
          s"publishIfAbsent with the store's real conditional PUT")
      java.nio.file.Paths.get(u.getPath)
    }
    try {
      java.nio.file.Files.createLink(local(target), local(staged))
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  override def createAtomic(fs: FileSystem, target: Path,
      content: Array[Byte]): Boolean = {
    val staged = stage(fs, target, content)
    try publishIfAbsent(fs, staged, target)
    finally {
      // drop the staging NAME; published content lives on under the
      // target name. A failure here leaves a harmless orphan that
      // vacuum reclaims — never worth failing a won commit over.
      try fs.delete(staged, false) catch { case _: Throwable => () }
    }
  }
}

private[graft] object GraftLogStore {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, GraftLogStore]()

  /** The session's configured store ([[HdfsLogStore]] by default),
    * instantiated once per class name per JVM. */
  def forSession(spark: org.apache.spark.sql.SparkSession): GraftLogStore = {
    val name = spark.conf.getOption("spark.graft.logStore.class")
      .getOrElse(classOf[HdfsLogStore].getName)
    // resolve via the thread context classloader (Spark's
    // Utils.classForName pattern): a custom store shipped via --jars
    // lives in the session's user classloader, which the defining
    // classloader of this class cannot see
    cache.computeIfAbsent(name, n =>
      Class.forName(n, true,
          Option(Thread.currentThread.getContextClassLoader)
            .getOrElse(getClass.getClassLoader))
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[GraftLogStore])
  }
}
