package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native expression: SIGNED FEATURE HASHING ("hashing trick",
  * Weinberger et al. 2009) of a token array into a dense L2-normalized
  * float vector, in one compiled pass — the model-free text→vector
  * bridge: each token's XXH64 picks a bucket (`hash mod dim`) and a
  * sign (the hash's top bit), signs accumulate per bucket, and the
  * count vector is L2-normalized. The sign bit makes collisions cancel
  * in expectation instead of biasing upward, so cosine between hashed
  * vectors estimates token-multiset similarity.
  *
  * The token hash is exactly Spark's `xxhash64(token)` construction
  * (XXH64 over the UTF8 bytes, default seed 42) — engine-checkable:
  * the spec recomputes a small vector from `xxhash64` SQL literals and
  * matches it float-for-float.
  *
  * All-token docs stream through one primitive loop (no explode, no
  * shuffle, no boxed lambda); an empty/whitespace doc yields the zero
  * vector rather than NaN (norm guard).
  */
case class HashEmbed(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  override def nullSafeEval(input: Any): Any =
    HashEmbed.compute(input.asInstanceOf[ArrayData], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HashEmbed.compute($v, $dim, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashEmbed {
  /** Shared by eval and codegen: one call per row keeps the enclosing
    * projection inside whole-stage codegen. */
  def compute(toks: ArrayData, dim: Int, seed: Long): ArrayData = {
    val acc = new Array[Double](dim)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      // a zero-byte token (split of an empty/whitespace doc) carries no
      // signal — skipping it makes such docs embed to the zero vector
      if (t.numBytes > 0) {
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, seed)
        // low bits pick the bucket (floorMod: Java % keeps the
        // dividend's sign), the sign bit picks the direction
        val idx = (((h % dim) + dim) % dim).toInt
        acc(idx) += (if (h < 0) -1.0 else 1.0)
      }
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += acc(j) * acc(j); j += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
