package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst Generator (UDTF) exposing the GA session→events explosion
  * (SURVEY §2.6 X1) to SQL:
  *
  *   SELECT s.*, e.event, e.time_s
  *   FROM sessions s
  *   LATERAL VIEW explode_session(visit_start_sec, hits) e AS event, time_s
  *
  * `hits` is array<struct<name:string, offset_ms:long>>. Emits one
  * "session begins" row at start, one row per hit (offset 0 → +1 s bump —
  * reference gaToMixpanel.js:167-178), and one "session ends" row at
  * last-hit + 1 s. Typed-Dataset pipelines use
  * [[graft.operators.GaTransform.explodeSession]]; this Generator is the
  * SQL-surface rendering of the same operator (SURVEY §2.12).
  *
  * Generators are driven row-at-a-time by GenerateExec (not fused into
  * WholeStageCodegen) — CodegenFallback is the idiomatic cost here, same
  * as Spark's own non-explode generators.
  */
case class ExplodeSession(start: Expression, hits: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(start, hits)

  override def elementSchema: StructType = StructType(Seq(
    StructField("event", StringType, nullable = false),
    StructField("time_s", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = start.dataType == LongType &&
      (hits.dataType match {
        case ArrayType(StructType(fields), _) =>
          fields.length >= 2 && fields(0).dataType == StringType &&
            fields(1).dataType == LongType
        case _ => false
      })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "explode_session(start_sec BIGINT, hits ARRAY<STRUCT<name STRING, offset_ms BIGINT>>)")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val startSec = start.eval(input).asInstanceOf[Long]
    val arr = hits.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val startMs = startSec * 1000L
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](arr.numElements() + 2)
    out += InternalRow(UTF8String.fromString("session begins"), startMs / 1000L)
    var endMs = startMs
    var i = 0
    while (i < arr.numElements()) {
      val hit = arr.getStruct(i, 2)
      val name = hit.getUTF8String(0)
      val offset = hit.getLong(1)
      val tMs = if (offset == 0L) startMs + 1000L else startMs + offset
      if (tMs > endMs) endMs = tMs
      out += InternalRow(name, tMs / 1000L)
      i += 1
    }
    out += InternalRow(UTF8String.fromString("session ends"), (endMs + 1000L) / 1000L)
    out
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ExplodeSession =
    copy(start = newChildren(0), hits = newChildren(1))

  override def prettyName: String = "explode_session"
}
