package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** COLUMNAR manifest segments (`seg-<uuid>.entriesp`): the entry
  * lines of a segment encoded as a parquet file instead of plain
  * text — Iceberg's metadata-is-just-more-data move applied to the
  * graft log, shipped as an OPT-IN
  * (`spark.graft.manifest.segmentFormat=parquet`).
  *
  * Measured honestly (SegReadProbe, NOTES r14): at the 512-entry
  * segment granularity the reuse model wants, parquet is NOT the
  * planning win the r13 notes hypothesized. The 10M-entry full-parse
  * floor was Spark's file-source scan MACHINERY over tiny files, not
  * text bytes or parse cost — direct task-side FileSystem reads of
  * the same text segments run ~30× faster than the wholetext scan,
  * while parquet's per-file footer + reader-init overhead leaves it
  * ~13× slower than direct text at this file size (and object stores
  * pay 2-3 ranged GETs per parquet segment vs one for text). The
  * engine therefore keeps text as the default segment format and
  * reads ALL segment formats with direct task-side I/O; this codec
  * remains fully supported for its real benefits — typed stat
  * columns as a user-queryable metadata table, and a better shape if
  * segment granularity is ever raised 100×.
  *
  * Schema: one row per entry.
  *   - `line`     the COMPLETE entry line, verbatim. Lossless by
  *                construction: every consumer that needs entry lines
  *                (write-path segment reuse, dirty-segment re-staging,
  *                the lazy FileIndex loaders) reads this one column
  *                and behaves byte-identically to the text format.
  *   - typed planning columns parsed ONCE at write time with the SAME
  *     parsers the readers use ([[SnapshotTable.parseEntryStats]] et
  *     al., so eval parity is by construction): `rel`, `dv`,
  *     `len`/`mtime`/`rows`, and three parallel-array stat families
  *     (numeric ranges, string byte bounds, null counts). Bloom
  *     bitsets stay in their text sidecars — segment entry lines
  *     never carry them.
  *
  * Arrays use parquet's legacy repeated-primitive encoding (what
  * parquet-protobuf writes); Spark's vectorized reader maps them to
  * `array<...>` natively, so the segments double as a user-readable
  * metadata table via `spark.read.parquet` on the `_graft_log`
  * `.entriesp` files.
  *
  * Text segments (`.entries`) remain fully readable and reusable —
  * old tables plan and commit unchanged, and one manifest may
  * reference both formats. */
private[graft] object SegmentCodec {
  import org.apache.parquet.schema.MessageTypeParser
  import org.apache.parquet.example.data.simple.SimpleGroup
  import org.apache.parquet.io.api.Binary

  val Extension = ".entriesp"

  def isParquetSeg(rel: String): Boolean = rel.endsWith(Extension)

  private val SchemaText =
    """message graft_segment_entry {
      |  required binary line (UTF8);
      |  required binary rel (UTF8);
      |  optional binary dv (UTF8);
      |  optional int64 len;
      |  optional int64 mtime;
      |  optional int64 rows;
      |  repeated binary num_col (UTF8);
      |  repeated int64 num_lo;
      |  repeated int64 num_hi;
      |  repeated binary str_col (UTF8);
      |  repeated binary str_lo;
      |  repeated binary str_hi;
      |  repeated binary null_col (UTF8);
      |  repeated int64 null_cnt;
      |}""".stripMargin

  private lazy val messageType =
    MessageTypeParser.parseMessageType(SchemaText)

  /** The planning projection the distributed job reads — everything
    * the conservative evaluator consumes, and NOT the verbatim line
    * text (decoding 10M full lines is the cost this format removes).
    * Field order is fixed; [[PlanRow]] indexes into it. */
  val planProjection: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("rel", StringType), StructField("dv", StringType),
      StructField("rows", LongType),
      StructField("num_col", ArrayType(StringType)),
      StructField("num_lo", ArrayType(LongType)),
      StructField("num_hi", ArrayType(LongType)),
      StructField("str_col", ArrayType(StringType)),
      StructField("str_lo", ArrayType(BinaryType)),
      StructField("str_hi", ArrayType(BinaryType)),
      StructField("null_col", ArrayType(StringType)),
      StructField("null_cnt", ArrayType(LongType))))
  }

  /** A planning row decoded back into the exact shapes
    * [[SnapshotTable.parseEntryStats]] returns for the same entry
    * line, plus the minimal kept-line rendering downstream readers
    * need (rel + dv item — [[SnapshotTable.readEntriesDv]] consumes
    * nothing else). */
  final case class PlanRow(
      rel: String, dv: String,
      num: Map[String, (Long, Long)],
      str: Map[String, (Array[Byte], Array[Byte])],
      nulls: Map[String, (Long, Long)]) {
    def minimalLine: String = if (dv == null) rel else s"$rel\tdv=$dv"
  }

  def planRow(r: org.apache.spark.sql.Row): PlanRow = {
    val rows = if (r.isNullAt(2)) -1L else r.getLong(2)
    val numC = r.getSeq[String](3)
    val numL = r.getSeq[Long](4); val numH = r.getSeq[Long](5)
    val strC = r.getSeq[String](6)
    val strL = r.getSeq[Array[Byte]](7)
    val strH = r.getSeq[Array[Byte]](8)
    val nulC = r.getSeq[String](9); val nulN = r.getSeq[Long](10)
    PlanRow(r.getString(0), if (r.isNullAt(1)) null else r.getString(1),
      numC.iterator.zipWithIndex
        .map { case (c, i) => c -> (numL(i), numH(i)) }.toMap,
      strC.iterator.zipWithIndex
        .map { case (c, i) => c -> (strL(i), strH(i)) }.toMap,
      nulC.iterator.zipWithIndex
        .map { case (c, i) => c -> (nulN(i), rows) }.toMap)
  }

  /** Write `lines` as one parquet segment at `path` (create-exclusive
    * like the text writer — uuid names never collide). Typed columns
    * are parsed from each line with the reader-side parsers, so the
    * planning job sees EXACTLY what a text read would have parsed. */
  def write(path: Path, lines: Seq[String], conf: Configuration): Unit = {
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    val wconf = new Configuration(conf)
    GroupWriteSupport.setSchema(messageType, wconf)
    val w = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(path, wconf))
      .withConf(wconf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try lines.foreach { l =>
      val g = new SimpleGroup(messageType)
      g.add("line", l)
      g.add("rel", SnapshotTable.entryPath(l))
      SnapshotTable.entryDv(l).foreach(d => g.add("dv", d))
      SnapshotTable.entryFileMeta(l).foreach { case (len, mt) =>
        g.add("len", len); g.add("mtime", mt)
      }
      SnapshotTable.entryRows(l).foreach(n => g.add("rows", n))
      val (num, str, _, nulls) = SnapshotTable.parseEntryStats(l)
      num.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
        g.add("num_col", c); g.add("num_lo", lo); g.add("num_hi", hi)
      }
      str.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
        g.add("str_col", c)
        g.add("str_lo", Binary.fromConstantByteArray(lo))
        g.add("str_hi", Binary.fromConstantByteArray(hi))
      }
      nulls.toSeq.sortBy(_._1).foreach { case (c, (nc, _)) =>
        g.add("null_col", c); g.add("null_cnt", nc)
      }
      w.write(g)
    } finally w.close()
  }

  /** A segment's verbatim entry lines, EITHER format, read directly
    * through the FileSystem API — usable from the driver (lazy
    * FileIndex loads) and from task closures (the distributed
    * planning job reads its segments this way; the SegReadProbe A/B
    * measured direct task-side reads at 20-30× the file-source scan
    * for these tiny-file listings). */
  def readAnyLines(path: Path, conf: Configuration): Seq[String] =
    if (isParquetSeg(path.getName)) readLines(path, conf)
    else {
      val fs = path.getFileSystem(conf)
      val in = fs.open(path)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, "UTF-8").split("\n").toSeq
          .map(_.trim).filter(_.nonEmpty)
      } finally in.close()
    }

  /** Driver-side read of a segment's verbatim entry lines — the ONE
    * projected column, through parquet-hadoop's Group reader (no
    * Spark job at planning time, same as the text path's direct
    * FileSystem read). */
  def readLines(path: Path, conf: Configuration): Seq[String] = {
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val rconf = new Configuration(conf)
    rconf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      "message p { required binary line (UTF8); }")
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(), path).withConf(rconf).build()
    val out = Seq.newBuilder[String]
    try {
      var g = reader.read()
      while (g != null) {
        out += g.getString("line", 0)
        g = reader.read()
      }
    } finally reader.close()
    out.result()
  }
}
