package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * Hive-partitioned versions surface a real [[partitionSchema]] with
  * per-file partition values decoded from the manifest rel paths, so
  * Catalyst's partition pruning — INCLUDING runtime dynamic partition
  * pruning through joins, the decisive 100 TB star-join optimization —
  * operates on the manifest with zero listing I/O.
  *
  * One row-group of metadata per FILE lives on the driver (the
  * manifest is already driver-resident by design); at 100 TB the
  * listing cost is O(#files) expression evaluations, zero I/O.
  *
  * Composes with deletion vectors and column mapping:
  * [[SnapshotTable.readCatalyst]] layers the DV anti-join mask and
  * the physical→logical projection ABOVE the relation this index
  * serves, and Catalyst pushes predicates through both wrappers down
  * to [[listFiles]] — verified (with DPP metric pins) by the
  * compose spec. The index itself therefore always sees PHYSICAL
  * column names in both its stat keys and the pushed filters.
  */
private[graft] class GraftFileIndex(
    tablePath: String,
    partSchema: StructType,
    entries: Seq[(FileStatus,
      Map[String, String],
      Map[String, (Long, Long)],
      Map[String, (Array[Byte], Array[Byte])],
      Map[String, (Int, Int, Array[Byte])])],
    zoneId: java.time.ZoneId = java.time.ZoneOffset.UTC)
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def partitionSchema: StructType = partSchema

  override def sizeInBytes: Long = entries.map(_._1.getLen).sum

  override def inputFiles: Array[String] =
    entries.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // stats/bloom skipping from the data filters; entry partition
    // values ride along so mixed predicates (part-col OR data-col)
    // prune too — same conservative evaluator as readWhere
    val dataPred = dataFilters.reduceOption(And)
    val statKept = dataPred match {
      case None => entries
      case Some(p) => entries.filter { case (_, pv, st, ss, bl) =>
        SnapshotTable.mayMatch(p, pv, st, ss, bl)
      }
    }
    if (partSchema.isEmpty)
      return Seq(PartitionDirectory(InternalRow.empty,
        statKept.map(_._1).toArray))
    // group files by partition tuple, decode dir strings to typed
    // catalyst values, and evaluate the pushed partition filters
    // directly on the rows (FileSourceScanExec trusts the index for
    // the static filters; DYNAMIC filters are re-evaluated by the
    // scan itself over these same rows at execution time)
    val dirs = statKept.groupBy(_._2).toSeq.map { case (pv, es) =>
      val row = InternalRow.fromSeq(partSchema.fields.toSeq.map(f =>
        GraftFileIndex.partValueToCatalyst(
          pv.getOrElse(f.name, SnapshotTable.HiveDefaultPartition),
          f.dataType, zoneId)))
      (row, es)
    }
    val kept = partitionFilters.reduceOption(And) match {
      case None => dirs
      case Some(p) =>
        val bound = p.transform {
          case a: AttributeReference =>
            val i = partSchema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
            require(i >= 0, s"partition filter references unknown column ${a.name}")
            BoundReference(i, partSchema.fields(i).dataType, nullable = true)
        }
        val pred = Predicate.create(bound)
        pred.initialize(0)
        dirs.filter { case (row, _) => pred.eval(row) }
    }
    kept.map { case (row, es) =>
      PartitionDirectory(row, es.map(_._1).toArray)
    }
  }
}

private[graft] object GraftFileIndex {

  /** Partition column types [[partValueToCatalyst]] can decode from a
    * directory string; readCatalyst falls back to the classic reader
    * for layouts outside this set. */
  def supportedPartType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         BooleanType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Hive `%XX` path unescape — exact inverse of
    * [[SnapshotTable.partitionPathValue]]. */
  private def unescapePath(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** A manifest partition-dir value (escaped path form) as the typed
    * catalyst-internal value of the partition column. Timestamp dirs
    * are rendered by Spark's partitioned writer via a cast-to-string
    * in the SESSION zone ('yyyy-MM-dd HH:mm:ss[.micros]'), so decoding
    * with the same zone round-trips the instant exactly; NTZ values
    * are zone-free wall-clock text either way. */
  def partValueToCatalyst(raw: String, dt: DataType,
      zoneId: java.time.ZoneId = java.time.ZoneOffset.UTC): Any = {
    if (raw == SnapshotTable.HiveDefaultPartition) return null
    val s = unescapePath(raw)
    dt match {
      case StringType => UTF8String.fromString(s)
      case IntegerType => s.toInt
      case LongType => s.toLong
      case ShortType => s.toShort
      case ByteType => s.toByte
      case BooleanType => s.toBoolean
      case DateType => DateTimeUtils.stringToDate(UTF8String.fromString(s))
        .getOrElse(sys.error(s"unparseable DATE partition value '$s'"))
      case TimestampType =>
        DateTimeUtils.stringToTimestamp(UTF8String.fromString(s), zoneId)
          .getOrElse(sys.error(
            s"unparseable TIMESTAMP partition value '$s'"))
      case TimestampNTZType =>
        DateTimeUtils.stringToTimestampWithoutTimeZone(
            UTF8String.fromString(s))
          .getOrElse(sys.error(
            s"unparseable TIMESTAMP_NTZ partition value '$s'"))
      case other => sys.error(s"unsupported partition type $other")
    }
  }
}
