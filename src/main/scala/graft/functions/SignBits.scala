package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Native expression: 1-bit BINARY quantization of a float vector —
  * bit i = 1 iff x_i > 0, packed into ceil(dim/8) BYTES. The coarsest
  * rung of the quantization ladder (floats 1× → SQ8 4× → PQ ~32× by
  * codes → sign bits 32× with a 1-instruction distance): for
  * zero-centered embeddings the Hamming distance between sign
  * patterns is a monotone proxy for angle (Charikar's hyperplane
  * bound with the coordinate axes as hyperplanes), so an 8-byte code
  * per 64-dim vector supports a shortlist scan that is pure XOR +
  * POPCNT — the "binary quantization" hot tier Faiss/vector-DBs use
  * before exact re-rank. One compiled loop per row, no allocation
  * beyond the code itself, no shuffle. Empty vectors encode to an
  * empty code. */
case class SignBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_signbits"

  override def nullSafeEval(input: Any): Any =
    SignBits.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SignBits.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBits {
  def compute(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte]((n + 7) >>> 3)
    var i = 0
    while (i < n) {
      if (vec.getFloat(i) > 0f) out(i >>> 3) = (out(i >>> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }
}

/** Native expression: Hamming distance between two packed bit codes
  * (BINARY), i.e. popcount of the bytewise XOR — the whole scoring
  * kernel of the binary-quantization scan. Codes of unequal length
  * count the longer tail's set bits (a missing byte reads as 0), so
  * mixed-dim inputs degrade gracefully instead of erroring. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingDistance.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HammingDistance.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HammingDistance {
  def compute(a: Array[Byte], b: Array[Byte]): Int = {
    val shared = math.min(a.length, b.length)
    var h = 0
    var i = 0
    while (i < shared) {
      h += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    val longer = if (a.length > b.length) a else b
    i = shared
    while (i < longer.length) {
      h += java.lang.Integer.bitCount(longer(i) & 0xff)
      i += 1
    }
    h
  }
}
