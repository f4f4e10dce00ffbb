package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/** A [[graft.sources.GraftLogStore]] for the pluggability spec: an
  * in-memory putIfAbsent registry supplies the mutual exclusion — the
  * conditional-PUT shape an object-store deployment would configure —
  * so the spec can prove the commit guard refuses a double-commit
  * even if the underlying filesystem's create were NOT atomic (the
  * registry, not create-exclusive, decides the winner here). */
class ConditionalPutLogStore extends graft.sources.HdfsLogStore {
  override def createAtomic(fs: FileSystem, target: Path,
      content: Array[Byte]): Boolean = {
    ConditionalPutLogStore.calls.incrementAndGet()
    // the conditional half: at most one caller claims a given name,
    // everyone else is told they lost — BEFORE any byte is written
    if (ConditionalPutLogStore.claimed
        .putIfAbsent(target.toString, java.lang.Boolean.TRUE) != null)
      return false
    super.createAtomic(fs, target, content)
  }
}

object ConditionalPutLogStore {
  val calls = new java.util.concurrent.atomic.AtomicInteger
  val claimed =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
}
