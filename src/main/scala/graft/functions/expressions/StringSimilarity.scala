package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlAccess
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity — the string-similarity primitive
  * Spark lacks (it ships only levenshtein), needed by fuzzy-match
  * dedup verification. Standard definition: Jaro over matches within
  * a floor(max(|a|,|b|)/2)-1 window with half-transposition counting,
  * Winkler prefix boost p=0.1 over at most 4 common leading
  * characters gated on jaro > 0.7 (the standard boost_threshold) —
  * the same algorithm DuckDB's `jaro_winkler_similarity` (rapidfuzz
  * port) implements, so results agree cross-engine for ALL pairs,
  * including low-similarity common-prefix ones (oracles round to 6
  * decimals to absorb any last-ulp ordering difference).
  *
  * Codegen: the generated code is one static call into
  * [[JaroWinklerImpl.compute]] — the same shape Spark's own string
  * expressions use (the loop lives in a JIT-friendly static method;
  * the expression stays inside whole-stage codegen, no interpreted
  * fallback, no boxing). Comparison is over UTF-16 code units —
  * identical to byte semantics for ASCII text, which is what the
  * normalized dedup path feeds it. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"jaro_winkler expects (string, string), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaroWinklerImpl" +
        s".compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

/** Cheap O(|a|+|b|) UPPER BOUND on [[JaroWinklerSimilarity]] — the
  * verify-stage prefilter for high-threshold fuzzy matching: Jaro
  * matches are a one-to-one pairing of equal characters, so
  * m ≤ the character-multiset intersection c, and
  * jaro ≤ (c/|a| + c/|b| + 1)/3; the Winkler boost (l ≤ 4, p = 0.1)
  * lifts any jaro to at most 0.6·jaro + 0.4. Counting is done in 256
  * hash buckets (char & 0xFF) — collisions only INCREASE c, so the
  * bound stays an upper bound at O(1) memory. Computing this before
  * the exact O(|a|·window) scan prunes most non-matches at a fraction
  * of the cost (the same shape as levenshtein's threshold early-exit). */
case class JaroWinklerUpperBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"jaro_winkler_upper_bound expects (string, " +
        s"string), got ${left.dataType.catalogString} / " +
        s"${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.upperBound(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaroWinklerImpl" +
        s".upperBound($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerUpperBound =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler_upper_bound"
}

object JaroWinklerImpl {
  /** Static kernel the generated code calls (public, stable name). */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2.0) / md) / 3.0
    // Winkler boost: p = 0.1 over at most 4 common leading chars,
    // applied only when jaro > 0.7 (the standard boost_threshold,
    // matching DuckDB/rapidfuzz — an unconditional boost diverges for
    // low-similarity pairs sharing a prefix)
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(la, lb)) &&
      a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Upper bound on compute(a, b): see [[JaroWinklerUpperBound]]. */
  def upperBound(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    // 256-bucket char histograms; intersection of the bucketed
    // multisets dominates the true character-multiset intersection,
    // which dominates the Jaro match count m
    val ca = new Array[Int](256)
    val cb = new Array[Int](256)
    var i = 0
    while (i < la) { ca(a.charAt(i) & 0xFF) += 1; i += 1 }
    i = 0
    while (i < lb) { cb(b.charAt(i) & 0xFF) += 1; i += 1 }
    var c = 0
    i = 0
    while (i < 256) { c += math.min(ca(i), cb(i)); i += 1 }
    if (c == 0) return 0.0
    val cd = c.toDouble
    val jaroUpper = (cd / la + cd / lb + 1.0) / 3.0
    // boost lifts jaro to at most 0.6·jaro + 0.4 (l ≤ 4, p = 0.1);
    // jaroUpper ≤ 1 because c ≤ min(la, lb)
    0.6 * jaroUpper + 0.4
  }
}

object StringSimilarity {
  /** Column form: `jaro_winkler(a, b)` → double in [0, 1]. */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftSqlAccess.column(JaroWinklerSimilarity(
      GraftSqlAccess.expression(a), GraftSqlAccess.expression(b)))

  /** Column form: cheap upper bound on `jaro_winkler(a, b)` — use as
    * `jaro_winkler_upper_bound(a, b) >= t` before the exact measure. */
  def jaro_winkler_upper_bound(a: Column, b: Column): Column =
    GraftSqlAccess.column(JaroWinklerUpperBound(
      GraftSqlAccess.expression(a), GraftSqlAccess.expression(b)))
}
