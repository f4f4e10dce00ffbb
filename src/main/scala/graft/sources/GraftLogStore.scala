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
