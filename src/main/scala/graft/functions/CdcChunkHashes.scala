package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform

/** Native expression: CONTENT-DEFINED chunking (the FastCDC/LBFS gear
  * pattern) of a binary payload into XXH64 chunk fingerprints, in one
  * compiled pass. Fixed-stride blocks (m02/m06) are shift-VARIANT: one
  * inserted byte re-aligns every later block and all fingerprints
  * change — the exact failure t17's fixed span grid had for text,
  * which t20's rolling windows repaired. CDC repairs it for binary:
  * chunk boundaries are cut where a gear rolling hash of the recent
  * bytes masks to zero, so boundaries are a function of local CONTENT,
  * not position — after an insertion the boundary sequence
  * re-synchronizes and every later chunk fingerprints identically.
  *
  * Gear hash: h = (h << 1) + GEAR(byte) — the shift ages a byte out of
  * influence after 64 steps, giving an effective 64-byte window; GEAR
  * is 256 longs derived from the seed-42 splitmix LCG (the
  * HyperplaneBuckets constants). A boundary needs `minLen` bytes since
  * the last cut (no degenerate slivers) and is forced at 4·minLen·
  * (mask density) … pragmatically at `maxLen` = 8·minLen so one
  * boundary-free run (zero pages, encrypted blocks) cannot produce an
  * unbounded chunk. The tail emits only when it carries at least
  * `minLen` bytes: a shorter sliver is weak near-dup evidence that
  * birthday-collides across a large corpus (10^4 random payloads
  * produced >10^3 spurious single-chunk pairs from 1-15-byte tails
  * before this guard — measured, now spec-pinned), so payloads under
  * `minLen` carry no fingerprints at all — the sub-3-token shingle
  * convention applied to binary. Chunk fingerprints are XXH64 over
  * the chunk's bytes, seed 42 — Spark's own xxhash64 construction on
  * the slice.
  */
case class CdcChunkHashes(child: Expression, minLen: Int, maskBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cdc_hashes"

  override def nullSafeEval(input: Any): Any =
    CdcChunkHashes.compute(input.asInstanceOf[Array[Byte]], minLen, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CdcChunkHashes.compute($v, $minLen, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunkHashes {
  /** 256-entry gear table from the seed-42 splitmix LCG (the
    * HyperplaneBuckets constants) — fixed so fingerprints are stable
    * across sessions and versions. */
  private[functions] def gear(b: Int): Long = GEAR(b)

  private val GEAR: Array[Long] = {
    val out = new Array[Long](256)
    var s = 42L
    var i = 0
    while (i < 256) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = s
      i += 1
    }
    out
  }

  /** Shared by eval and codegen: one call per row keeps the enclosing
    * projection inside whole-stage codegen. */
  def compute(bytes: Array[Byte], minLen: Int, maskBits: Int): UnsafeArrayData = {
    val n = bytes.length
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val mask = (1L << maskBits) - 1L
    val maxLen = 8 * minLen
    val hashes = new java.util.ArrayList[java.lang.Long]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + GEAR(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        hashes.add(XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, len, 42L))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (n - start >= minLen)
      hashes.add(XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, n - start, 42L))
    val out = new Array[Long](hashes.size())
    var j = 0
    while (j < out.length) { out(j) = hashes.get(j); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native expression: CDC chunk BOUNDS — the same gear-hash cut
  * points as [[CdcChunkHashes]], emitted as flat
  * [start₀, len₀, start₁, len₁, …] (ints) so a content-addressed
  * STORE can slice the actual chunk bytes out of the payload. Two
  * deliberate differences from the fingerprint variant: the tail
  * chunk is ALWAYS emitted (a store must cover every byte — the
  * fingerprint drops sub-minLen tails as noise, a store cannot), and
  * positions come back instead of hashes (the store hashes the
  * sliced bytes itself, so chunk identity and chunk content come
  * from the same slice by construction). Empty payloads emit no
  * bounds. */
case class CdcChunkBounds(child: Expression, minLen: Int, maskBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_bounds"

  override def nullSafeEval(input: Any): Any =
    CdcChunkBounds.compute(input.asInstanceOf[Array[Byte]], minLen, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CdcChunkBounds.compute($v, $minLen, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunkBounds {
  def compute(bytes: Array[Byte], minLen: Int, maskBits: Int): UnsafeArrayData = {
    val n = bytes.length
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    val mask = (1L << maskBits) - 1L
    val maxLen = 8 * minLen
    val bounds = new java.util.ArrayList[Integer]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + CdcChunkHashes.gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        bounds.add(start); bounds.add(len)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) { bounds.add(start); bounds.add(n - start) }
    val out = new Array[Int](bounds.size())
    var j = 0
    while (j < out.length) { out(j) = bounds.get(j); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
