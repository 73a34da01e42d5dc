package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975) — the
  * single-pass kernel behind blocklist/badword content gating (the C4
  * "banned word list" filter): ONE scan of the document counts every
  * word-boundary-respecting occurrence of ANY pattern, instead of one
  * regex/contains pass per pattern. Patterns may be multi-word phrases
  * (spaces are ordinary bytes to the automaton).
  *
  * Matching contract (shared with the SQL oracle's `\bpat\b` regex per
  * pattern): ASCII case-insensitive; an occurrence ending at byte j with
  * length ℓ counts iff the byte before position j−ℓ+1 and the byte after
  * j are both non-word ([a-zA-Z0-9_] are word bytes — RE2's `\w`).
  * Distinct patterns are counted independently even when their spans
  * overlap; a single pattern's own occurrences at distinct end positions
  * each count (for self-overlap-free patterns this equals the regex's
  * non-overlapping count).
  *
  * The automaton is built ONCE on the driver from the pattern list and
  * shipped as a plan reference object — match cost is O(bytes) per row
  * independent of pattern count, and the expression participates in
  * whole-stage codegen (one virtual call per row, no per-pattern column
  * fan-out, no regex backtracking).
  */
final class AhoMatcher(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoMatcher: empty pattern list")
  require(patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "AhoMatcher: patterns must be non-empty ASCII")

  private val Alpha = 128

  // goto/fail/output tables, built with the classic BFS construction.
  private val (goto_, fail, outLens) = {
    val lower = patterns.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val gotoB = scala.collection.mutable.ArrayBuffer(new Array[Int](Alpha))
    java.util.Arrays.fill(gotoB(0), -1)
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for (p <- lower) {
      var s = 0
      for (ch <- p) {
        val c = ch.toInt
        if (gotoB(s)(c) == -1) {
          gotoB += { val a = new Array[Int](Alpha); java.util.Arrays.fill(a, -1); a }
          outB += Nil
          gotoB(s)(c) = gotoB.size - 1
        }
        s = gotoB(s)(c)
      }
      outB(s) = p.length :: outB(s)
    }
    val failB = new Array[Int](gotoB.size)
    val q = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until Alpha) {
      val nxt = gotoB(0)(c)
      if (nxt == -1) gotoB(0)(c) = 0
      else { failB(nxt) = 0; q += nxt }
    }
    while (q.nonEmpty) {
      val s = q.dequeue()
      for (c <- 0 until Alpha) {
        val nxt = gotoB(s)(c)
        if (nxt == -1) gotoB(s)(c) = gotoB(failB(s))(c)
        else {
          failB(nxt) = gotoB(failB(s))(c)
          outB(nxt) = outB(nxt) ++ outB(failB(nxt))
          q += nxt
        }
      }
    }
    (gotoB.map(_.clone()).toArray, failB, outB.map(_.toArray).toArray)
  }

  @inline private def isWordByte(b: Byte): Boolean = {
    val c = b & 0xff
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
  }

  /** Total word-boundary occurrences of any pattern in `s` — one pass. */
  def countIn(s: UTF8String): Long = {
    if (s == null) return 0L
    val b = s.getBytes
    var state = 0
    var cnt = 0L
    var i = 0
    while (i < b.length) {
      var c = b(i) & 0xff
      if (c >= 'A' && c <= 'Z') c += 32
      state = if (c < Alpha) goto_(state)(c) else 0
      val outs = outLens(state)
      if (outs.length > 0) {
        val rightOk = i == b.length - 1 || !isWordByte(b(i + 1))
        if (rightOk) {
          var o = 0
          while (o < outs.length) {
            val start = i - outs(o) + 1
            if (start == 0 || !isWordByte(b(start - 1))) cnt += 1
            o += 1
          }
        }
      }
      i += 1
    }
    cnt
  }
}

/** `multi_pattern_count(text)` over a plan-time pattern list — LongType
  * count of word-boundary blocklist hits; 0 ⇒ the document passes the
  * gate. See [[AhoMatcher]] for the matching contract.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  @transient private lazy val matcher = new AhoMatcher(patterns)

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"multi_pattern_count needs STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    matcher.countIn(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ahoMatcher", matcher,
      classOf[AhoMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$m.countIn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)

  override def prettyName: String = "multi_pattern_count"
}
