package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native expression: 64-bit BLOCK-MEAN perceptual hash of a binary
  * payload — the byte-level analog of the block-mean image hash
  * (bit i = 1 iff the mean of the i-th of 64 equal spans exceeds the
  * global mean). Near-identical payloads (a few edited bytes, a
  * re-muxed header) differ in few bits, unrelated payloads in ~32 —
  * the NEAR-dup signal the exact-hash tier (m05/m06) structurally
  * cannot give. In the full pipeline the hash runs over DECODED
  * frames/samples (the m08 decode seam); the byte-level form is what
  * an opaque store can compute without codecs.
  *
  * Exact integer arithmetic throughout: block-vs-global mean compares
  * as the cross-multiplication sums[b]·n > total·count[b] — no float
  * division, no rounding protocol needed (safe for payloads to ~1.5
  * GB before the cross product nears Long range; chunk bigger blobs
  * first, m02's job). One compiled loop per row, no allocation per
  * byte, no shuffle. Empty payloads hash to 0. */
case class BlockMeanHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_blockhash"

  override def nullSafeEval(input: Any): Any =
    BlockMeanHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BlockMeanHash.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BlockMeanHash {
  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = (bytes(i) & 0xff).toLong
      val b = ((i.toLong * 64L) / n).toInt
      sums(b) += v; cnts(b) += 1L; total += v
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (cnts(b) > 0L && sums(b) * n > total * cnts(b)) h |= (1L << b)
      b += 1
    }
    h
  }
}
