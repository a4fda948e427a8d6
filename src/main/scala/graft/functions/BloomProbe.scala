package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expressions probing a PRE-BUILT Bloom filter — the
  * probe half of graft's bloom-accelerated set membership. The filter
  * is built distributed (`DataFrameStatFunctions.bloomFilter`, a
  * treeAggregate whose driver residue is the fixed-size bitset, never
  * the keys) and rides into codegen as a reference object exactly like
  * [[PqEncode]]'s codebook: the serialized bytes travel with the
  * expression, the deserialized `BloomFilter` is rebuilt lazily once
  * per executor instance, and the generated code calls straight into
  * `mightContainLong` — one compiled map-side pass, no join, no
  * shuffle, no false negatives (the Bloom guarantee).
  *
  * Spark itself ships this machinery as the *internal* runtime-filter
  * pair `BloomFilterAggregate`/`BloomFilterMightContain` (not in the
  * public function registry); these expressions expose the same
  * technique as an explicit, parameterizable operator surface.
  */

/** `graft_bloom_contains(keyHash)` — boolean might-contain for one
  * 64-bit key. False positives at the built filter's fpp; false
  * negatives never. */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bf: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("graftBloom", bf,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bloom_hit_count(hashArray)` — how many elements of an
  * array<bigint> might be in the filter. The per-document probe for
  * bloom decontamination: one traversal of the already-computed
  * shingle hashes, an upper bound on the true shared count (Bloom
  * one-sidedness lifts pointwise to the count). */
case class BloomHitCount(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bloom_hit_count"

  @transient private lazy val bf: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override def nullSafeEval(input: Any): Any =
    BloomHitCount.compute(input.asInstanceOf[ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("graftBloom", bf,
        classOf[BloomFilter].getName)
      s"${ev.value} = graft.functions.BloomHitCount.compute($v, $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomHitCount {
  def compute(hashes: ArrayData, bf: BloomFilter): Int = {
    var hits = 0
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      if (bf.mightContainLong(hashes.getLong(i))) hits += 1
      i += 1
    }
    hits
  }
}
