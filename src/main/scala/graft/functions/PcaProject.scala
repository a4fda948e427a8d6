package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native Catalyst expression: project a float vector onto a trained
  * PCA basis — reduced_j = Σ_i (x_i − mean_i)·w_{j,i} for the top-k
  * components, one compiled loop per row (no intermediate centered
  * array, no per-component column explosion). The trained mean and
  * the k×dim row-major component matrix ride as codegen reference
  * objects, never in plan text — the [[Sq8Encode]] protocol.
  *
  * Accumulation is sequential left-to-right in double per component,
  * output cast to float — dim-byte→k-float reduction is the point:
  * at k=8 over dim=64 a projected corpus is 8× smaller than the float
  * original, which is what makes a billion-vector index (or a
  * brute-force rerank shortlist) memory-resident.
  */
case class PcaProject(child: Expression, mean: Array[Float],
                      components: Array[Float], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pca_project"

  override def nullSafeEval(input: Any): Any =
    PcaProject.compute(input.asInstanceOf[ArrayData], mean, components, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("pcaMean", mean, "float[]")
      val c = ctx.addReferenceObj("pcaComps", components, "float[]")
      s"${ev.value} = graft.functions.PcaProject.compute($v, $m, $c, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcaProject {
  def compute(vec: ArrayData, mean: Array[Float],
              components: Array[Float], k: Int): ArrayData = {
    val d = mean.length
    val n = math.min(vec.numElements(), d)
    val out = new Array[Float](k)
    var j = 0
    while (j < k) {
      val base = j * d
      var s = 0.0
      var i = 0
      while (i < n) {
        s += (vec.getFloat(i) - mean(i)).toDouble * components(base + i)
        i += 1
      }
      out(j) = s.toFloat
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
