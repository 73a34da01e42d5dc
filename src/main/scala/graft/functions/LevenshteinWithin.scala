package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded Levenshtein (Ukkonen 1985): the exact edit distance when it is
  * ≤ `bound`, else `bound + 1`. The DP touches only the diagonal band
  * |i − j| ≤ bound — O(len·bound) cells instead of O(len²) — so a
  * similarity gate "keep pairs with lev ≤ 20% of max length" pays a 5×
  * narrower DP and early-exits entirely on length mismatch. Any row the
  * gate keeps has distance ≤ bound, where the band is EXACT, so swapping
  * this in under such a filter is lossless (and rows it rejects report a
  * sentinel > bound, failing the same filter).
  *
  * Distance is over Unicode code points, matching Spark's `levenshtein`.
  * `bound` is per-row (a column) — the built-in's threshold variant only
  * accepts a literal, which cannot express "20% of THIS pair's length".
  * CodegenFallback: the O(len·bound) DP dominates per-row interpretation
  * overhead at verification volumes.
  */
case class LevenshteinWithin(left: Expression, right: Expression,
    bound: Expression)
  extends TernaryExpression with CodegenFallback {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = bound
  override def dataType: DataType = LongType
  override def nullable: Boolean =
    left.nullable || right.nullable || bound.nullable

  override protected def nullSafeEval(l: Any, r: Any, b: Any): Any = {
    val a = codePoints(l.asInstanceOf[UTF8String].toString)
    val c = codePoints(r.asInstanceOf[UTF8String].toString)
    val k = math.max(b.asInstanceOf[Number].longValue(), 0L)
      .min(Int.MaxValue - 2).toInt
    // Ukkonen's doubling schedule: a band of width d suffices when the
    // true distance is d, so near-duplicates (the common case behind a
    // similarity gate) finish in O(len·d) instead of O(len·bound). Each
    // escalation's result is exact when ≤ its band, so the first
    // in-band hit IS the distance; the final full-bound pass preserves
    // the exact/sentinel contract.
    var band = math.min(8, k)
    while (band < k) {
      val r = banded(a, c, band)
      if (r <= band) return r.toLong
      band = math.min(band * 4, k)
    }
    banded(a, c, k).toLong
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0; var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp; j += 1; i += Character.charCount(cp)
    }
    out
  }

  /** exact distance if ≤ k, else k + 1 */
  private def banded(a: Array[Int], b: Array[Int], k: Int): Int = {
    val n = a.length; val m = b.length
    if (math.abs(n - m) > k) return k + 1
    if (k == 0) return if (java.util.Arrays.equals(a, b)) 0 else 1
    val inf = k + 1
    val width = 2 * k + 1
    var prev = new Array[Int](width)
    var cur = new Array[Int](width)
    // row i = 0: dp[0][j] = j at offset d = j + k
    var d = 0
    while (d < width) {
      val j = d - k
      prev(d) = if (j >= 0 && j <= m && j <= k) j else inf
      d += 1
    }
    var i = 1
    while (i <= n) {
      var best = inf
      d = 0
      while (d < width) {
        val j = i + d - k
        cur(d) =
          if (j < 0 || j > m) inf
          else if (j == 0) math.min(i, inf)
          else {
            val sub = prev(d) +
              (if (a(i - 1) == b(j - 1)) 0 else 1)
            val del = (if (d + 1 < width) prev(d + 1) else inf) + 1
            val ins = (if (d > 0) cur(d - 1) else inf) + 1
            math.min(inf, math.min(sub, math.min(del, ins)))
          }
        if (cur(d) < best) best = cur(d)
        d += 1
      }
      if (best >= inf) return inf // whole band saturated: distance > k
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m - n + k)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LevenshteinWithin =
    copy(left = newFirst, right = newSecond, bound = newThird)
  override def prettyName: String = "levenshtein_within"
}
