package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expression: product-quantization encoding of a
  * float vector — for each of `m` contiguous `subDim`-wide subspaces,
  * the id of the nearest (L2) sub-codebook centroid, returned as
  * array<int> of length m. One codegen'd pass per row; the trained
  * codebook rides along as a codegen reference object, never in the
  * plan text (m*ksub*subDim floats would otherwise bloat every SQL
  * string and Janino compile).
  *
  * Ties break to the LOWEST centroid id (strict < comparison), so
  * encoding is deterministic for any codebook.
  */
case class PqEncode(child: Expression, codebook: Array[Float],
                    m: Int, ksub: Int, subDim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebook, m, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
      s"${ev.value} = graft.functions.PqEncode.compute($v, $cb, $m, $ksub, $subDim);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** codebook layout: ((sub * ksub) + cid) * subDim + d. */
  def compute(vec: ArrayData, codebook: Array[Float],
              m: Int, ksub: Int, subDim: Int): ArrayData = {
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var cid = 0
      while (cid < ksub) {
        val base = (sub * ksub + cid) * subDim
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val diff = vec.getFloat(sub * subDim + d).toDouble - codebook(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = cid }
        cid += 1
      }
      out(sub) = best
      sub += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
