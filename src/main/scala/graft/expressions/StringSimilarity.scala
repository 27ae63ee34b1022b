package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990) over the raw UTF-8 bytes —
  * the record-linkage verify primitive (pairs short name-scale
  * strings; [[graft.ops.Linkage]] blocks candidates, this scores
  * them). Standard semantics: match window `max(|a|,|b|)/2 - 1`,
  * half-transpositions, prefix boost `l·0.1·(1−jaro)` with `l ≤ 4`
  * applied only when jaro > 0.7; either side empty → 0. Byte-based
  * (not code-point) so scores are bit-identical to engines that score
  * UTF-8 directly; identical for ASCII. A tight primitive loop under
  * whole-stage codegen — the composable alternative (positional
  * explode + window matching) shuffles per character. NULL in →
  * NULL out. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs strings, got ${left.dataType}/${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    StringSimilarity.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.expressions.StringSimilarity.jaroWinkler($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Unrestricted Damerau–Levenshtein distance (Damerau 1964; the FULL
  * variant with the last-occurrence table, where a transposed pair
  * may be edited between — `CA→ABC` is 2, not the OSA 3) over the raw
  * UTF-8 bytes. Complements Spark's built-in `levenshtein` for
  * linkage verify where swapped adjacent characters are one typo,
  * not two. O(|a|·|b|) ints per evaluation — name-scale strings;
  * use [[graft.ops.Linkage]]'s banded Levenshtein for long text.
  * NULL in → NULL out. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein needs strings, got ${left.dataType}/${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    StringSimilarity.damerau(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.expressions.StringSimilarity.damerau($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  import org.apache.spark.sql.graftbridge.Bridge

  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  def damerauLevenshtein(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))

  /** Static so generated code can call it directly. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val ba = a.getBytes
    val bb = b.getBytes
    val (s1, s2) = if (ba.length <= bb.length) (ba, bb) else (bb, ba)
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(n2 / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: walk the two matched subsequences in order
    var halfT = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / n1 + m / n2 + (m - halfT / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, n1) && s1(l) == s2(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Full (unrestricted) Damerau–Levenshtein over bytes, with the
    * classic `da[256]` last-occurrence table. Static so generated
    * code can call it directly. */
  def damerau(a: UTF8String, b: UTF8String): Long = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0) return n2.toLong
    if (n2 == 0) return n1.toLong
    val inf = n1 + n2
    // (n1+2) x (n2+2) matrix with a sentinel border row/col at `inf`
    val w = n2 + 2
    val d = new Array[Int]((n1 + 2) * w)
    d(0) = inf
    var j = 0
    while (j <= n2) { d(0 * w + j + 1) = inf; d(1 * w + j + 1) = j; j += 1 }
    var i = 0
    while (i <= n1) { d((i + 1) * w + 0) = inf; d((i + 1) * w + 1) = i; i += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= n1) {
      var db = 0
      j = 1
      while (j <= n2) {
        val k = da(s2(j - 1) & 0xFF)
        val l = db
        val cost = if (s1(i - 1) == s2(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(s1(i - 1) & 0xFF) = i
      i += 1
    }
    d((n1 + 1) * w + n2 + 1).toLong
  }
}
