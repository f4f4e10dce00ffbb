package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Gates for the versioned snapshot table: commit visibility, time
  * travel, optimize-as-commit, vacuum, and the create-exclusive
  * conflict path. */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snap$tag").toString + "/t"

  test("create / append / overwrite version and time-travel correctly") {
    val path = freshPath("basic")
    val v0 = SnapshotTable.create(spark.range(10).toDF("id"), path)
    assert(v0 === 0)
    val v1 = SnapshotTable.append(spark.range(10, 15).toDF("id"), path)
    assert(v1 === 1)
    // latest sees both commits, v0 is frozen
    assert(SnapshotTable.read(spark, path).count() === 15)
    assert(SnapshotTable.read(spark, path, Some(0)).count() === 10)
    val v2 = SnapshotTable.overwrite(
      spark.range(100, 103).toDF("id"), path)
    assert(v2 === 2)
    assert(SnapshotTable.read(spark, path)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(100L, 101L, 102L))
    // every prior version still reads exactly as committed
    assert(SnapshotTable.read(spark, path, Some(1)).count() === 15)
    assert(SnapshotTable.versions(spark, path) === Seq(0, 1, 2))
    // double-create refuses
    intercept[IllegalArgumentException] {
      SnapshotTable.create(spark.range(1).toDF("id"), path)
    }
  }

  test("optimize publishes a compacted NEW version; old files survive") {
    val path = freshPath("opt")
    SnapshotTable.create(
      spark.range(4000).toDF("id").repartition(16), path)
    val before = SnapshotTable.read(spark, path)
      .agg(sum(col("id"))).collect()(0).getLong(0)
    val v = SnapshotTable.optimize(spark, path,
      targetFileBytes = 256L * 1024 * 1024, sortCols = Seq("id"))
    assert(v === 1)
    // compacted to one file, content identical
    val filesOf = (ver: Int) => SnapshotTable.read(spark, path, Some(ver))
      .inputFiles.length
    assert(filesOf(1) === 1 && filesOf(0) === 16)
    assert(SnapshotTable.read(spark, path)
      .agg(sum(col("id"))).collect()(0).getLong(0) === before)
  }

  test("vacuum drops unreferenced files and old manifests only") {
    val path = freshPath("vac")
    SnapshotTable.create(spark.range(100).toDF("id").repartition(4), path)
    SnapshotTable.overwrite(spark.range(50).toDF("id").repartition(2), path)
    SnapshotTable.append(spark.range(50, 60).toDF("id"), path)
    val deleted = SnapshotTable.vacuum(spark, path, keep = 2)
    assert(deleted === 4) // exactly v0's four files are unreferenced
    assert(SnapshotTable.versions(spark, path) === Seq(1, 2))
    assert(SnapshotTable.read(spark, path).count() === 60)
    assert(SnapshotTable.read(spark, path, Some(1)).count() === 50)
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, path, Some(0))
    }
  }

  test("a committer losing the manifest race retries on the next version") {
    val path = freshPath("race")
    SnapshotTable.create(spark.range(5).toDF("id"), path)
    // steal version 1: simulate a concurrent committer winning the
    // create-exclusive write first (an overwrite referencing no files)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stolen = new org.apache.hadoop.fs.Path(path,
      "_graft_log/v00000001.manifest")
    val out = fs.create(stolen, false)
    out.write("".getBytes("UTF-8")); out.close()
    // append must lose against v1, retry, and land on v2 — still on
    // top of the CURRENT latest manifest's files (v1's empty list)
    val v = SnapshotTable.append(spark.range(5, 8).toDF("id"), path)
    assert(v === 2)
    assert(SnapshotTable.read(spark, path).count() === 3)
    assert(SnapshotTable.read(spark, path, Some(0)).count() === 5)
  }

  test("a crash between vacuum's manifest and data phases is recoverable") {
    val path = freshPath("crash")
    SnapshotTable.create(spark.range(100).toDF("id").repartition(4), path)
    SnapshotTable.overwrite(spark.range(50).toDF("id").repartition(2), path)
    SnapshotTable.append(spark.range(50, 60).toDF("id"), path)
    // simulate vacuum(keep=2) crashing right after phase 1: the v0
    // manifest is gone, v0's four data files are still on disk
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(path,
      "_graft_log/v00000000.manifest"), false))
    // time travel to the vacuumed version fails with the CLEAN log
    // error (the manifest-first ordering guarantees no manifest can
    // ever reference deleted files)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, path, Some(0))
    }
    assert(e.getMessage.contains("version 0 not in"))
    // surviving versions are untouched, and the NEXT vacuum reclaims
    // exactly the four orphans the crash left behind
    assert(SnapshotTable.read(spark, path).count() === 60)
    assert(SnapshotTable.vacuum(spark, path, keep = 2) === 4)
    assert(SnapshotTable.read(spark, path).count() === 60)
    assert(SnapshotTable.read(spark, path, Some(1)).count() === 50)
  }

  test("a persistent manifest-write failure rethrows, not 'gave up after conflicts'") {
    // route the table through a FileSystem whose manifest creates fail
    // like a dead disk: data staging works, the commit create throws,
    // and no winning manifest appears — commit must surface the I/O
    // failure immediately instead of burning 50 'conflict' retries
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.faulty.impl", classOf[FaultyManifestFs].getName)
    conf.set("fs.faulty.impl.disable.cache", "true")
    val path = "faulty://" + freshPath("fault")
    val e = intercept[java.io.IOException] {
      SnapshotTable.create(spark.range(5).toDF("id"), path)
    }
    assert(e.getMessage.contains("simulated disk failure") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("simulated disk failure")))
  }
}

/** Local filesystem that fails every exclusive manifest create the way
  * a full or dead disk would, while all other operations (parquet
  * staging, listing, renames) succeed — exercises commit()'s
  * race-vs-failure distinction. */
class FaultyManifestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FSDataOutputStream, Path}
  import org.apache.hadoop.fs.permission.FsPermission
  import org.apache.hadoop.util.Progressable

  override def getUri: java.net.URI = java.net.URI.create("faulty:///")

  private def maybeFail(f: Path): Unit =
    if (f.getName.endsWith(".manifest"))
      throw new java.io.IOException(s"simulated disk failure writing $f")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    maybeFail(f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    maybeFail(f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}
