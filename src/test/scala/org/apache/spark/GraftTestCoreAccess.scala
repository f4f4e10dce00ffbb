package org.apache.spark

/** Test-only access to `private[spark]` context state. */
object GraftTestCoreAccess {
  /** Clear the context's checkpoint dir: a spec that set one must not
    * leave it behind, or Barrier's mode default would silently flip to
    * `checkpoint` for every later suite in the shared-session JVM. */
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
