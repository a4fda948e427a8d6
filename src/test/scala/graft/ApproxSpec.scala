package graft

import graft.operators.FlowAnalytics

class ApproxSpec extends SparkSpecBase {

  test("approx_count_distinct lands within rsd bounds of the exact count") {
    val d = "/root/testdata/sf0.001"
    val exact = FlowAnalytics.distinctCount(Tables.orders(spark, d), Tables.customer(spark, d))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = FlowAnalytics.approxDistinct(Tables.orders(spark, d), Tables.customer(spark, d))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (seg, n) =>
      val a = approx(seg)
      assert(math.abs(a - n).toDouble / n < 0.1, s"$seg: approx $a vs exact $n")
    }
  }
}
