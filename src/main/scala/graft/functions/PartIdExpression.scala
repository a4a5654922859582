package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code: binary
  * search over the broadcast partition bounds. Comparison is UTF8String's
  * byte-wise order — the SAME order Spark's sort and min/max aggregates
  * use — so the persisted partition key ranges always agree with the
  * actual assignment (Java String UTF-16 ordering diverges for
  * supplementary-plane code points).
  */
object PartIdKernels {
  def assign(bounds: Array[UTF8String], docId: UTF8String): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (docId.compareTo(bounds(mid)) > 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** `part_id_for_bounds(doc_id)` — the range-partition assignment for the
  * encode exchange, as a codegen'd Catalyst expression. Replaces the
  * round-1 Scala UDF that forced a Catalyst↔Scala boundary crossing per
  * input row and blocked whole-stage codegen in the hottest projection of
  * the job. Bounds travel as a broadcast so the per-task plan stays small
  * even at 10^5 partitions.
  */
case class PartIdForBounds(child: Expression, bounds: Broadcast[Array[UTF8String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"part_id_for_bounds needs string, got $t")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "part_id_for_bounds"

  override protected def nullSafeEval(input: Any): Any =
    PartIdKernels.assign(bounds.value, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("boundsBc", bounds,
      classOf[Broadcast[Array[UTF8String]]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.PartIdKernels.assign(
         |  (org.apache.spark.unsafe.types.UTF8String[]) $bcRef.value(), $c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PartIdForBounds =
    copy(child = newChild)
}
