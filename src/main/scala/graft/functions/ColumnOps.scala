package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar column helpers covering the reference's expression surface
  * (reference: src/sf_datalake/utils.py:75-98, transform.py:365-468,
  * SURVEY.md §2.8). All pure `Column` expressions — codegen'd, no UDFs.
  */
object ColumnOps {

  /** Clip a column into [lower, upper] (reference utils.py:75-98 uses
    * chained F.when; least/greatest is the codegen-friendly form). */
  def clip(c: Column, lower: Option[Column], upper: Option[Column]): Column = {
    val lo = lower.map(l => greatest(c, l)).getOrElse(c)
    upper.map(u => least(lo, u)).getOrElse(lo)
  }

  /** Zero-left-pad an identifier to `width` chars
    * (reference transform.py:365-418 IdentifierNormalizer). */
  def padId(c: Column, width: Int): Column =
    lpad(c.cast(StringType), width, "0")

  /** 9-char siren from any int/string representation. */
  def padSiren(c: Column): Column = padId(c, 9)

  /** siren = first 9 chars of the zero-padded 14-char siret
    * (reference transform.py:421-468 SiretToSiren). */
  def siretToSiren(c: Column): Column = substring(padId(c, 14), 1, 9)

  /** Parse a string date column with an explicit format
    * (reference transform.py:106-112 DateParser). */
  def parseDate(c: Column, fmt: String): Column = to_date(c, fmt)

  /** Per-row count of nulls across `cols` (reference
    * extract_financial_DGFiP.py:213-216 builds this to rank duplicate
    * declarations by completeness). */
  def nullCount(cols: Seq[Column]): Column =
    cols.map(c => when(c.isNull, 1).otherwise(0)).reduce(_ + _)

  /** Row-wise sum of columns, nulls treated as 0 (reference chains `+`
    * over fillna'd columns, e.g. tva_dataset.py:93-94). */
  def rowSum(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c, lit(0))).reduce(_ + _)

  /** Integer month index of a date relative to a reference date
    * (reference transform.py:663,751 uses
    * months_between(période, 2014-01-01).cast(int); exact on
    * first-of-month dates). */
  def monthIndex(c: Column, ref: String = "2014-01-01"): Column =
    months_between(c, to_date(lit(ref))).cast(IntegerType)

  /** Exact-decimal sum of a double column, returned as double.
    * Casting each value to DECIMAL(18,2) makes the aggregation
    * order-independent (decimal addition is exact), so results are
    * bit-identical across engines and partitionings — used by oracle
    * queries where a plain double sum would drift with shuffle order. */
  def exactSum2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
}
