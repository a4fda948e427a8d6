package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native expression: the DISTINCT 64-bit hashes of word `n`-grams of
  * a token array taken every `stride` positions, in one compiled pass.
  * stride=1 (`graft_shingle_hashes`) is the overlapping shingle-set
  * builder of the near-dup operators; stride=n (`graft_span_hashes`)
  * is the non-overlapping span fingerprinter of the substring-dedup
  * operator.
  *
  * The equivalent `array_distinct(transform(sequence(...), xxhash64))`
  * formulation runs on Spark 4's INTERPRETED higher-order-function
  * path (per-element lambda eval, boxed), ~10x slower at corpus scale;
  * this loops over the unsafe token array, chains XXH64 over the n
  * tokens of each shingle (same construction as the built-in
  * xxhash64(t1, t2, t3): each token's hash seeds the next), and
  * dedupes via sort — no boxing, no per-element plan eval.
  *
  * `dedup = false` (`graft_span_pos_hashes`) keeps the hashes in span
  * POSITION order with repeats — the form the span-scrub operator
  * (t17) needs, where array index i IS the span's position in the doc.
  * `dedup = false, stride = 1` (`graft_rolling_span_hashes`) is the
  * shift-invariant variant: EVERY overlapping n-token window, in
  * position order — array index i is the window's token offset (t20).
  */
case class ShingleHashes(child: Expression, n: Int, stride: Int = 1,
                         dedup: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (!dedup && stride == 1) "graft_rolling_span_hashes"
    else if (!dedup) "graft_span_pos_hashes"
    else if (stride == 1) "graft_shingle_hashes" else "graft_span_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n, stride, dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($v, $n, $stride, $dedup);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Shared by eval and codegen: one call per row keeps the enclosing
    * projection inside whole-stage codegen. */
  def compute(toks: ArrayData, n: Int, stride: Int, dedup: Boolean = true): ArrayData = {
    if (toks.numElements() < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val cnt = (toks.numElements() - n) / stride + 1
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 42L
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(i * stride + j)
        h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    if (!dedup) return UnsafeArrayData.fromPrimitiveArray(out)
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < cnt) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }
}
