package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) locality layout for multi-dimensional data
  * skipping.
  *
  * `writePartitioned` + `sortCols` gives row-group min/max skipping on
  * ONE leading dimension; a query filtering on a different column
  * still scans everything. Interleaving the bits of k normalized
  * dimensions into one 64-bit z-value and range-partitioning + sorting
  * on it bounds EVERY dimension's span within each file/row-group, so
  * parquet footer stats prune scans for filters on any of the k
  * columns — the standard lakehouse OPTIMIZE ZORDER layout, built here
  * from public Spark primitives only.
  *
  * Scale shape: one 1-row min/max aggregate (O(k) driver scalars —
  * bounded collect), then pure codegen'd bit math in the scan stage,
  * one range exchange on the z-value, one local sort. No sampling
  * beyond what repartitionByRange itself does.
  */
object ZOrder {

  private val Bits = 16 // per-dimension resolution; k * Bits <= 63

  /** `c` min-max normalized to [0, 2^Bits); nulls and degenerate
    * (lo == hi) dimensions map to 0 so they never split files. */
  private def norm16(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else {
      val scaled = (coalesce(c.cast(DoubleType), lit(lo)) - lit(lo)) /
        lit(hi - lo) * lit((1 << Bits) - 1)
      round(scaled).cast(LongType)
    }

  /** The interleaved z-value column for `cols` given per-column
    * (lo, hi) bounds: bit i of dimension j lands at position
    * i * k + j. Pure column math — stays inside whole-stage codegen. */
  def zValue(cols: Seq[Column], bounds: Seq[(Double, Double)]): Column = {
    require(cols.nonEmpty && cols.size * Bits <= 63,
      s"1..${63 / Bits} z-order columns supported, got ${cols.size}")
    val k = cols.size
    val normed = cols.zip(bounds).map { case (c, (lo, hi)) => norm16(c, lo, hi) }
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      normed.zipWithIndex.foldLeft(acc) { case (a, (n, j)) =>
        a.bitwiseOR(shiftleft(shiftright(n, i).bitwiseAND(lit(1L)), i * k + j))
      }
    }
  }

  /** `df` re-laid-out along the z-curve of `zCols` (numeric/date/
    * timestamp): range-partitioned into `numFiles` and sorted within
    * partitions, so each output file covers a compact z-range — every
    * zCol's min/max span per file shrinks ~k-th-root-wise instead of
    * one column taking all the benefit. */
  def zOrderBy(df: DataFrame, zCols: Seq[String], numFiles: Int): DataFrame =
    df.withColumn("__z", zValueFor(df, zCols))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  private def numericOf(df: DataFrame, n: String): Column =
    df.schema(n).dataType match {
      case _: NumericType => col(n)
      case DateType => unix_date(col(n))
      case TimestampType => unix_micros(col(n))
      // NTZ: cast via session TZ (pinned UTC everywhere in graft,
      // so this is the identity on the stored micros)
      case TimestampNTZType => unix_micros(col(n).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"z-order column $n has unsupported type $other")
    }

  /** Z-order WITHIN partition groups — the production lakehouse
    * layout (partition by the coarse categorical key, z-cluster the
    * numeric/time dimensions inside each partition). Rows are
    * range-partitioned on (partCols..., z) and sorted the same way,
    * so a partitioned writer emits files that each hold ONE partition
    * value's compact z-range: a conjunctive predicate on the
    * partition column AND any z dimension prunes MULTIPLICATIVELY
    * (partition dirs × per-file z bounds). Same bounded-collect scale
    * shape as [[zOrderBy]]; z bounds are global, which costs nothing
    * when partitions share the value space and keeps this one pass. */
  def zOrderWithin(df: DataFrame, partCols: Seq[String],
      zCols: Seq[String], numFiles: Int): DataFrame = {
    require(partCols.nonEmpty, "zOrderWithin needs partition columns")
    df.withColumn("__z", zValueFor(df, zCols))
      .repartitionByRange(numFiles,
        (partCols.map(col) :+ col("__z")): _*)
      .sortWithinPartitions((partCols.map(col) :+ col("__z")): _*)
      .drop("__z")
  }

  /** The z-value column for `df`'s `zCols` with bounds computed from
    * `df` itself (one scan, 2k driver scalars — bounded collect). */
  private def zValueFor(df: DataFrame, zCols: Seq[String]): Column = {
    val asNum = zCols.map(numericOf(df, _))
    val boundsRow = df.select(
      asNum.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(c.cast(DoubleType)).as(s"lo$i"),
          max(c.cast(DoubleType)).as(s"hi$i"))
      }: _*).head()
    val bounds = zCols.indices.map { i =>
      (Option(boundsRow.get(2 * i)).fold(0.0)(_ =>
        boundsRow.getDouble(2 * i)),
        Option(boundsRow.get(2 * i + 1)).fold(0.0)(_ =>
          boundsRow.getDouble(2 * i + 1)))
    }
    zValue(asNum, bounds)
  }

  /** Z-ordered parquet sink: `numFiles` files, each covering a compact
    * hyper-rectangle of the zCols space (footer min/max prune filters
    * on ANY zCol, not just a leading sort key). */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int): Unit =
    zOrderBy(df, zCols, numFiles)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Skew-robust variant: dimensions are quantile-bucketized before
    * interleaving instead of min-max scaled. Min-max normalization
    * collapses under outliers — one row at 10¹² stretches the scale so
    * the bulk of the data lands in a handful of buckets and the curve
    * degenerates to a 1-D sort on the surviving dimensions. Equi-depth
    * buckets from `approxQuantile` (one pass, `buckets`+1 scalars per
    * dimension to the driver — bounded collect) give every dimension
    * its full 2^bits resolution over the data that actually exists.
    *
    * The per-row bucket lookup runs through `ml.feature.Bucketizer`
    * (public Spark API, binary-search over the splits). It is not
    * whole-stage-codegen'd — acceptable on a WRITE path executed once,
    * in exchange for a layout that keeps pruning under skew. */
  def zOrderByQuantiles(df: DataFrame, zCols: Seq[String], numFiles: Int,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << Bits),
      s"buckets must be in [2, ${1 << Bits}]")
    val numd = zCols.map { n =>
      val c = df.schema(n).dataType match {
        case _: NumericType => col(n)
        case DateType => unix_date(col(n))
        case TimestampType => unix_micros(col(n))
        // NTZ: cast via session TZ (pinned UTC everywhere in graft,
        // so this is the identity on the stored micros)
        case TimestampNTZType => unix_micros(col(n).cast(TimestampType))
        case other => throw new IllegalArgumentException(
          s"z-order column $n has unsupported type $other")
      }
      c.cast(DoubleType).as(s"__zq_$n")
    }
    val probs = (0 to buckets).map(_.toDouble / buckets).toArray
    val staged = df.select(col("*") +: numd: _*)
    val quantiles = staged.stat.approxQuantile(
      zCols.map(n => s"__zq_$n").toArray, probs, 0.001)
    // strictly-increasing splits with open ends (ties collapse under
    // skew: a hot value occupies several quantiles — dedupe keeps the
    // bucket count honest rather than failing)
    val splitsPerCol = quantiles.map { qs =>
      val inner = qs.distinct.sorted
      (Double.NegativeInfinity +: inner :+ Double.PositiveInfinity).distinct
    }
    val bucketizer = new org.apache.spark.ml.feature.Bucketizer()
      .setInputCols(zCols.map(n => s"__zq_$n").toArray)
      .setOutputCols(zCols.map(n => s"__zb_$n").toArray)
      .setSplitsArray(splitsPerCol)
      .setHandleInvalid("keep") // nulls → extra top bucket
    val bucketed = bucketizer.transform(staged)
    // handleInvalid("keep") sends null/NaN rows to the EXTRA bucket
    // index splits.length-1, one past the declared bound — clamp into
    // the top regular bucket, else norm16 scales them past 2^16-1 and
    // the overflow bit corrupts another dimension's interleave slot
    val zin = zCols.zip(splitsPerCol).map { case (n, s) =>
      least(col(s"__zb_$n"), lit((s.length - 2).toDouble))
    }
    val bounds = splitsPerCol.map(s => (0.0, (s.length - 2).toDouble)).toSeq
    bucketed
      .withColumn("__z", zValue(zin, bounds))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop(zCols.flatMap(n => Seq(s"__zq_$n", s"__zb_$n")) :+ "__z": _*)
  }
}
