package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Slots

/**
 * `crc16_slot(key)` — Redis-cluster slot of a string key
 * (CRC16(hashtag) mod 16384; reference: src/cluster.c:1820-1843).
 *
 * Native Catalyst expression with whole-stage codegen (no UDF
 * serialization, no boxing in the hot path): the generated code calls
 * the static [[Crc16SlotExpr.slotOf]] directly on the UTF8String's
 * bytes.
 */
case class Crc16SlotExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "crc16_slot"

  override protected def nullSafeEval(input: Any): Any =
    Crc16SlotExpr.slotOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Crc16SlotExpr.slotOf($c)")

  override protected def withNewChildInternal(newChild: Expression): Crc16SlotExpr =
    copy(child = newChild)
}

object Crc16SlotExpr {
  /** Called from generated code — operates on UTF8String bytes directly. */
  def slotOf(s: UTF8String): Int = Slots.slot(s.toString)
}
