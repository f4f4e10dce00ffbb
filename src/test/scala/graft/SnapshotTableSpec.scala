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
}
