package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native expression: Shannon entropy (bits/byte, 0..8) of a binary
  * payload's byte histogram in one compiled pass — the
  * compressibility probe a multimodal block store routes on (an
  * already-compressed or encrypted payload sits near 8, structured
  * text near 4, padding near 0; recompressing the former wastes CPU
  * for nothing, the m09 capacity math wants to know).
  *
  * One narrow loop per row (256-long histogram on the stack, no
  * allocation per byte), no shuffle; the alternative — explode bytes
  * + a 256-bucket aggregate — shuffles |payload| rows per document.
  * Empty payloads score 0. Deterministic: fixed accumulation order
  * over the fixed-size histogram.
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_byte_entropy"

  override def nullSafeEval(input: Any): Any =
    ByteEntropy.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ByteEntropy.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteEntropy {
  private val LOG2 = math.log(2.0)

  def compute(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) return 0.0
    val hist = new Array[Long](256)
    var i = 0
    while (i < n) { hist(bytes(i) & 0xff) += 1L; i += 1 }
    val nd = n.toDouble
    var h = 0.0
    var b = 0
    while (b < 256) {
      if (hist(b) > 0L) {
        val p = hist(b) / nd
        h -= p * (math.log(p) / LOG2)
      }
      b += 1
    }
    h
  }
}
