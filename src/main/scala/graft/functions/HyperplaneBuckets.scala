package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expression: all random-hyperplane LSH bucket ids of
  * a float vector in one codegen'd pass — `tables` independent hash
  * tables of `bits` sign bits each, returned as array<int> of length
  * `tables` (entry t = the bucket id of table t).
  *
  * The plane matrix is derived deterministically from `seed` by a
  * splitmix-style LCG (this is its canonical definition; the a02
  * oracle generator in graft.Oracles reproduces it for DuckDB), so
  * nothing large lives in the SQL plan text: building the buckets for
  * 32 tables x 4 bits is one expression call per row instead of 128
  * `graft_cosine` calls, which keeps Janino compile time flat.
  *
  * Only the SIGN of each plane dot product matters, so no
  * normalization is needed (sign(dot) == sign(cosine)).
  */
case class HyperplaneBuckets(child: Expression, seed: Long, tables: Int,
                             bits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"

  /** Flattened (tables*bits) x dim plane matrix; generated once per
    * expression instance (driver + each executor after deserialize). */
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var s = seed
    var i = 0
    while (i < out.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = ((s >>> 33).toDouble / (1L << 31).toDouble) - 0.5
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v.getFloat(d) * planes(base + d); d += 1 }
        if (dot > 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($t * $bits + $j) * $dim;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += (double) $v.getFloat($d) * $pl[$base + $d];
         |    }
         |    if ($dot > 0) $bucket |= (1 << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
