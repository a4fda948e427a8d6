package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native expression: banded MinHash signature of a shingle-hash set
  * in one compiled pass — `numHashes` permutation minima folded into
  * `bands` band hashes, returned as array<long> of length `bands`.
  *
  * Replaces an explode + numHashes-column min-aggregate + band-fold
  * pipeline: that formulation shuffles |shingles| rows into numHashes
  * aggregation buffers and pays one Janino compile per agg column
  * (~2 s at 64 columns); this is a narrow per-document loop, no
  * shuffle, constant compile cost.
  *
  * Hash construction matches the SQL formulation it replaced exactly:
  * permutation i of shingle v = xxhash64(v, i) (XXH64 long-then-int
  * chain from seed 42), band b = xxhash64(m_{b*r}, ..., m_{b*r+r-1}).
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.MinHashBands.compute($v, $numHashes, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {
  def compute(sh: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val rows = numHashes / bands
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = sh.numElements()
    var s = 0
    while (s < n) {
      val base = XXH64.hashLong(sh.getLong(s), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var j = 0
      while (j < rows) { h = XXH64.hashLong(mins(b * rows + j), h); j += 1 }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
