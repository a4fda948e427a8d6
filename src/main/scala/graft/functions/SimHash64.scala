package graft.functions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native expression: 60-bit SimHash of a token array in one compiled
  * pass — per-token hash = top 60 bits of md5 (engine-portable: the
  * DuckDB oracle recomputes it as `substr(md5(tok), 1, 15)` parsed as
  * hex), per-bit +-1 vote, sign fold.
  *
  * Replaces an explode + 60-column conditional-sum aggregate: that
  * pipeline shuffles every (doc, token) row into 60 agg buffers and
  * pays a multi-second Janino compile; this is a narrow per-document
  * loop with no shuffle at all.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SimHash64.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      // same value as Spark SQL's conv(substring(md5(tok),1,15),16,10):
      // md5 of the token's UTF-8 bytes, first 15 hex digits as a long
      val h = java.lang.Long.parseLong(
        DigestUtils.md5Hex(toks.getUTF8String(i).getBytes).substring(0, 15), 16)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
