package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Native Catalyst expression: 8-bit scalar quantization (the FAISS
  * `SQ8` codec) of a float vector — per-dimension affine encode
  * code_i = round((x_i − lo_i)/scale_i) clamped to [0,255], emitted as
  * BINARY so an encoded vector costs dim bytes instead of 4·dim
  * (the 4× that decides whether a corpus-resident scan index fits in
  * executor memory). The trained (lo, scale) arrays ride as codegen
  * reference objects, never in plan text. A zero scale (constant
  * dimension) encodes 0 and decodes to exactly lo_i.
  */
case class Sq8Encode(child: Expression, lo: Array[Float], scale: Array[Float])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sq8_encode"

  override def nullSafeEval(input: Any): Any =
    Sq8Encode.compute(input.asInstanceOf[ArrayData], lo, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val l = ctx.addReferenceObj("sq8Lo", lo, "float[]")
      val s = ctx.addReferenceObj("sq8Scale", scale, "float[]")
      s"${ev.value} = graft.functions.Sq8Encode.compute($v, $l, $s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8Encode {
  def compute(vec: ArrayData, lo: Array[Float], scale: Array[Float]): Array[Byte] = {
    val n = math.min(vec.numElements(), lo.length)
    val out = new Array[Byte](lo.length)
    var i = 0
    while (i < n) {
      val s = scale(i)
      val code =
        if (s == 0f) 0
        else {
          val c = math.round((vec.getFloat(i) - lo(i)) / s)
          if (c < 0) 0 else if (c > 255) 255 else c
        }
      out(i) = (code & 0xFF).toByte
      i += 1
    }
    out
  }
}

/** Native Catalyst expression: asymmetric SQ8 cosine — exact float
  * query against an SQ8-encoded candidate, dequantizing
  * y_i = lo_i + scale_i·code_i inline in one compiled loop (no
  * intermediate float array materializes per row). Same sequential
  * left-to-right double accumulation as [[CosineSimilarity]].
  */
case class Sq8Cosine(left: Expression, right: Expression,
                     lo: Array[Float], scale: Array[Float])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Cosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]], lo, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val l = ctx.addReferenceObj("sq8Lo", lo, "float[]")
      val s = ctx.addReferenceObj("sq8Scale", scale, "float[]")
      s"${ev.value} = graft.functions.Sq8Cosine.compute($a, $b, $l, $s);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Sq8Cosine {
  def compute(q: ArrayData, codes: Array[Byte],
              lo: Array[Float], scale: Array[Float]): Double = {
    val n = math.min(q.numElements(), codes.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = q.getFloat(i).toDouble
      val yi = lo(i).toDouble + scale(i).toDouble * (codes(i) & 0xFF)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
