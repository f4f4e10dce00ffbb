package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BasePredicate, BoundReference, Expression, Predicate}
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
  * conservative evaluator that powers readWhere decides from cached
  * ranges, string byte bounds, and bloom items.
  *
  * LAZY over SEGMENTED manifests: the index holds [[GraftFileIndex
  * .Segment]]s — inline entries parse eagerly (count 1), `@seg=`
  * references carry their MERGED aggregates (ranges, byte bounds, a
  * uniform partition tuple when the segment is partition-aligned,
  * total bytes) and parse their entries only on first demand. A
  * pushed filter that refutes a segment's aggregates — or a
  * partition filter that refutes its uniform tuple — drops the whole
  * segment without parsing one entry, so planning latency scales
  * with SURVIVING metadata, not table size. [[sizeInBytes]] answers
  * from the `b=` aggregates alone. Dynamic partition pruning
  * re-invokes [[listFiles]] with the runtime filters, so DPP prunes
  * segments the same way.
  *
  * Hive-partitioned versions surface a real [[partitionSchema]] with
  * per-file partition values decoded from the manifest rel paths, so
  * Catalyst's partition pruning — INCLUDING runtime DPP through
  * joins, the decisive 100 TB star-join optimization — operates on
  * the manifest with zero listing I/O.
  *
  * Composes with deletion vectors and column mapping:
  * [[SnapshotTable.readCatalyst]] layers the DV anti-join mask and
  * the physical→logical projection ABOVE the relation this index
  * serves, and Catalyst pushes predicates through both wrappers down
  * to [[listFiles]] — verified (with DPP metric pins) by the compose
  * spec. The index's stat keys are therefore always PHYSICAL column
  * names; pushed filters arrive physical under [[SnapshotTable
  * .readCatalyst]]'s wrappers, but LOGICAL through the front-door
  * relation of a column-mapped version (whose dataSchema must expose
  * logical names for analysis) — `log2phys` translates those
  * references before stat matching, so renamed columns keep their
  * planning-time skipping.
  */
private[graft] class GraftFileIndex(
    tablePath: String,
    partSchema: StructType,
    segments: Seq[GraftFileIndex.Segment],
    zoneId: java.time.ZoneId = java.time.ZoneOffset.UTC,
    log2phys: Map[String, String] = Map.empty)
  extends FileIndex {

  /** This index with pushed data filters translated from logical to
    * physical column names — the front-door shape for column-mapped
    * versions. Shares the segments, so lazily-parsed entries and
    * sidecar blooms stay memoized across both views. */
  private[graft] def withLogicalNames(
      m: Map[String, String]): GraftFileIndex =
    if (m.isEmpty) this
    else new GraftFileIndex(tablePath, partSchema, segments, zoneId, m)

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def partitionSchema: StructType = partSchema

  override def sizeInBytes: Long = segments.map(_.bytes).sum

  override def inputFiles: Array[String] =
    segments.flatMap(_.entries).map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  /** Segments whose entries have been parsed — the observable the
    * laziness spec pins (pruned segments must stay unparsed). */
  private[graft] def loadedSegmentCount: Int = segments.count(_.isLoaded)

  private[graft] def segmentCount: Int = segments.size

  private def partRow(pv: Map[String, String]): InternalRow =
    InternalRow.fromSeq(partSchema.fields.toSeq.map(f =>
      GraftFileIndex.partValueToCatalyst(
        pv.getOrElse(f.name, SnapshotTable.HiveDefaultPartition),
        f.dataType, zoneId)))

  private def boundPartPredicate(filters: Seq[Expression])
      : Option[BasePredicate] =
    filters.reduceOption(And).map { p =>
      val bound = p.transform {
        case a: AttributeReference =>
          val i = partSchema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
          require(i >= 0, s"partition filter references unknown column ${a.name}")
          BoundReference(i, partSchema.fields(i).dataType, nullable = true)
      }
      val pred = Predicate.create(bound)
      pred.initialize(0)
      pred
    }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // stat keys are physical; front-door filters on a mapped version
    // arrive logical — translate references before matching
    val physFilters =
      if (log2phys.isEmpty) dataFilters
      else dataFilters.map(_.transform {
        case a: AttributeReference if log2phys.contains(a.name) =>
          a.withName(log2phys(a.name))
      })
    val dataPred = physFilters.reduceOption(And)
    // the pushed predicate compiles ONCE per listFiles call; the
    // per-segment and per-entry loops below evaluate the compiled
    // form (plain map lookups), never re-walking the Expression tree
    val dataCp = dataPred.map(SnapshotTable.compilePred)
    val partPred = boundPartPredicate(partitionFilters)
    // SEGMENT-level prune first: typed partition eval on the uniform
    // tuple, conservative compiled evaluator on the merged
    // aggregates — a refuted segment's entries are never parsed
    val liveSegs = segments.filter { s =>
      val partOk = (partPred, s.partValues) match {
        case (Some(pr), Some(pv)) if partSchema.nonEmpty =>
          pr.eval(partRow(pv))
        case _ => true
      }
      partOk && dataCp.forall(_.evalN(
        s.partValues.getOrElse(Map.empty), s.stats, s.strStats,
        s.blooms, s.nulls))
    }
    // then ENTRY-level: same conservative evaluator per parsed entry.
    // EAGER (inline) segments skip it — their segment-level test
    // already ran on the entry's own maps, so re-evaluating would
    // double the O(#files) driver cost on legacy flat manifests.
    // Sidecar bloom bitsets load only when an equality probe can use
    // them (never for range-only predicates), per surviving segment.
    val needBloom = dataPred.exists(SnapshotTable.predHasEquality)
    val statKept = liveSegs.flatMap { s =>
      if (s.eager) s.entries
      else {
        val side =
          if (needBloom) s.sideBlooms
          else Map.empty[String, Map[String, (Int, Int, Array[Byte])]]
        // probe the sidecar BEFORE parsing entries: a point lookup on
        // a bloom-indexed key refutes whole segments from their
        // sidecar alone — the entries of a fully-refuted segment are
        // never parsed (at 1M files this is the difference between
        // decoding 1 GB of bitsets and ALSO building 1M entry tuples)
        def fileRefuted(bl: Map[String, (Int, Int, Array[Byte])]) =
          !dataCp.forall(_.eval(Map.empty, Map.empty, Map.empty, bl))
        // common case first, with no per-file Set: every covered file
        // refuted and every file covered → drop the whole segment
        if (side.nonEmpty && side.size >= s.count &&
            side.valuesIterator.forall(fileRefuted)) Nil
        else {
          val refuted: Set[String] =
            if (side.isEmpty) Set.empty
            else side.iterator.filter(kv => fileRefuted(kv._2))
              .map(_._1).toSet
          s.entries.filter { case (fst, pv, st, ss, bl, nu, _) =>
            !refuted.contains(fst.getPath.getName) &&
              dataCp.forall(_.evalN(pv, st, ss, bl, nu))
          }
        }
      }
    }
    if (partSchema.isEmpty)
      return Seq(PartitionDirectory(InternalRow.empty,
        statKept.map(GraftFileIndex.withMeta)))
    // group surviving files by partition tuple, decode dir strings to
    // typed catalyst values, evaluate the pushed partition filters
    val dirs = statKept.groupBy(_._2).toSeq.map { case (pv, es) =>
      (partRow(pv), es)
    }
    val kept = partPred match {
      case None => dirs
      case Some(pr) => dirs.filter { case (row, _) => pr.eval(row) }
    }
    kept.map { case (row, es) =>
      PartitionDirectory(row, es.map(GraftFileIndex.withMeta))
    }
  }
}

private[graft] object GraftFileIndex {

  /** One parsed manifest entry: file status, partition values, the
    * three stat families, the null metadata (col → (nullCount,
    * rowCount), rowCount -1 when untracked) the evaluator consumes —
    * all four ride the same single-pass
    * [[SnapshotTable.parseEntryStats]] scan — plus the entry's
    * QUALIFIED per-file deletion-vector descriptor(s)
    * ([[DvSidecar]]), which [[GraftFileIndex.listFiles]] attaches to
    * the file's listing metadata so the scan task can load its own
    * blob executor-side. */
  type EntryInfo = (FileStatus,
    Map[String, String],
    Map[String, (Long, Long)],
    Map[String, (Array[Byte], Array[Byte])],
    Map[String, (Int, Int, Array[Byte])],
    Map[String, (Long, Long)],
    Option[String])

  /** A unit of lazily-parsed manifest metadata: an inline entry
    * (eager, count 1) or a segment reference (aggregates up front,
    * entries parsed on first demand, memoized). */
  final class Segment(
      val partValues: Option[Map[String, String]],
      val stats: Map[String, (Long, Long)],
      val strStats: Map[String, (Array[Byte], Array[Byte])],
      val blooms: Map[String, (Int, Int, Array[Byte])],
      val count: Int,
      bytesOpt: Option[Long],
      loader: () => Seq[EntryInfo],
      /** true iff this "segment" IS one inline entry whose own stat
        * maps back the segment-level test — the entry-level pass can
        * skip it. A lazy 1-entry segment is NOT eager: its ref
        * aggregates can be weaker than the entry's (no blooms). */
      val eager: Boolean = false,
      /** per-file bloom bitsets from the segment's SIDECAR (file
        * name → column → bloom), loaded on first demand and only
        * when a pushed equality probe can use them. */
      bloomLoader: () => Map[String,
        Map[String, (Int, Int, Array[Byte])]] = () => Map.empty,
      /** null metadata for the segment-level test — populated only
        * for EAGER (inline-entry) segments, whose segment-level maps
        * ARE the entry's own; `@seg=` refs carry no null aggregate
        * (empty = unknown = keep, sound). */
      val nulls: Map[String, (Long, Long)] = Map.empty) {
    @volatile private var loaded: Seq[EntryInfo] = null
    @volatile private var loadedBlooms: Map[String,
      Map[String, (Int, Int, Array[Byte])]] = null
    def isLoaded: Boolean = loaded != null
    def entries: Seq[EntryInfo] = {
      if (loaded == null) loaded = loader()
      loaded
    }
    def sideBlooms: Map[String, Map[String, (Int, Int, Array[Byte])]] = {
      if (loadedBlooms == null) loadedBlooms = bloomLoader()
      loadedBlooms
    }
    /** Data bytes from the `b=` aggregate; a legacy ref without one
      * (pre-`len=` entries) ESTIMATES conservatively high (count ×
      * 128 MB) instead of resolving — sizeInBytes runs on every plan,
      * and an overestimate merely disables a broadcast while a
      * resolve-per-plan would re-read O(#segments) files and defeat
      * laziness (an already-loaded segment reports exactly). */
    def bytes: Long = bytesOpt.getOrElse(
      if (isLoaded) entries.map(_._1.getLen).sum
      else count.toLong * (128L << 20))
  }

  def eager(info: EntryInfo): Segment =
    new Segment(Some(info._2), info._3, info._4, info._5, 1,
      Some(info._1.getLen), () => Seq(info), eager = true,
      nulls = info._6)

  /** An entry's file as the listing element Spark splits into scan
    * tasks — carrying its per-file dv descriptor (if any) in the
    * metadata map, which Spark copies verbatim onto every
    * [[org.apache.spark.sql.execution.datasources.PartitionedFile]]
    * split of the file. */
  private def withMeta(info: EntryInfo)
      : org.apache.spark.sql.execution.datasources.FileStatusWithMetadata =
    org.apache.spark.sql.execution.datasources.FileStatusWithMetadata(
      info._1,
      info._7 match {
        case Some(d) => Map(DvSidecar.MetaKey -> d)
        case None => Map.empty
      })

  /** Partition column types [[partValueToCatalyst]] can decode from a
    * directory string; readCatalyst falls back to the classic reader
    * for layouts outside this set. */
  def supportedPartType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         BooleanType | DateType | TimestampType | TimestampNTZType |
         FloatType | DoubleType => true
    case _: DecimalType => true
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
      // fractional/decimal layouts: the writer renders via cast-to-
      // string (Java canonical text, incl. scientific notation for
      // extreme doubles), which the JDK parsers invert exactly
      case FloatType => s.toFloat
      case DoubleType => s.toDouble
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(s), d.precision, d.scale)
      case other => sys.error(s"unsupported partition type $other")
    }
  }
}
