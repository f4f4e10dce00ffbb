package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Catalyst-integrated manifest pruning: a snapshot version's file
  * list as a Spark [[FileIndex]], so skipping happens at PLANNING
  * time from whatever predicates Catalyst pushes to the scan —
  * `.filter`, SQL `WHERE`, filters inferred through joins — not just
  * the explicit argument of [[SnapshotTable.readWhere]]. This is the
  * lakehouse-native architecture (Delta's TahoeFileIndex shape): the
  * planner calls [[listFiles]] with the pushed filters and the same
  * conservative evaluator that powers readWhere decides per entry
  * from cached ranges, string byte bounds, and bloom items.
  *
  * One row-group of metadata per FILE lives on the driver (the
  * manifest is already driver-resident by design); at 100 TB the
  * listing cost is O(#files) expression evaluations, zero I/O.
  *
  * Scope: flat, mapping-free, DV-free versions ([[SnapshotTable
  * .readCatalyst]] enforces and documents the fallback) — partition
  * values, renamed physical names, and deletion-vector masks each
  * need the wrapping projections of the classic reader.
  */
private[graft] class GraftFileIndex(
    tablePath: String,
    entries: Seq[(FileStatus,
      Map[String, (Long, Long)],
      Map[String, (Array[Byte], Array[Byte])],
      Map[String, (Int, Int, Array[Byte])])])
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = entries.map(_._1.getLen).sum

  override def inputFiles: Array[String] =
    entries.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pred = (partitionFilters ++ dataFilters).reduceOption(And)
    val kept = pred match {
      case None => entries
      case Some(p) => entries.filter { case (_, st, ss, bl) =>
        SnapshotTable.mayMatch(p, Map.empty, st, ss, bl)
      }
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
  }
}
