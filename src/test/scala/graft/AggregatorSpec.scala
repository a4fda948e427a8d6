package graft

import graft.functions.TypedAggregators
import graft.operators.FlowAnalytics

class AggregatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("group_concat_distinct UDAF matches the built-in q06 path") {
    TypedAggregators.register(spark)
    val customer = Seq(
      (1L, "BUILDING", 1), (2L, "AUTOMOBILE", 1), (3L, "BUILDING", 1),
      (4L, "MACHINERY", 2)
    ).toDF("c_custkey", "c_mktsegment", "c_nationkey")
    val nation = Seq((1, "FRANCE", 0), (2, "GERMANY", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")

    val builtin = FlowAnalytics.groupConcat(customer, nation).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap

    customer.createOrReplaceTempView("agg_cust")
    nation.createOrReplaceTempView("agg_nat")
    val viaUdaf = spark.sql(
      """SELECT n_name, group_concat_distinct(c_mktsegment) AS segments
         FROM agg_cust JOIN agg_nat ON c_nationkey = n_nationkey
         GROUP BY n_name""").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap

    assert(viaUdaf == builtin)
    assert(builtin("FRANCE") == "AUTOMOBILE,BUILDING")
  }

  test("FreqSketch honors the Misra-Gries guarantees against exact t06 on real documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = graft.text.TextStats.wordFreq(docs, topN = 1000000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 64
    val sketch = graft.text.TextStats.frequentTerms(docs, k = k, topN = k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.nonEmpty && sketch.size <= k)
    // one-sided under-count, bounded by N/(k+1) — independent of merge order
    sketch.foreach { case (w, est) =>
      val truth = exact.getOrElse(w, 0L)
      assert(est <= truth, s"'$w' over-counted: $est > $truth")
      assert(truth - est <= n / (k + 1), s"'$w' under-count ${truth - est} > ${n / (k + 1)}")
    }
    // every guaranteed-heavy term (true freq > N/(k+1)) must survive
    exact.filter(_._2 > n / (k + 1)).keys.foreach { w =>
      assert(sketch.contains(w), s"heavy term '$w' missing from the sketch")
    }
  }

  test("top_k_values keeps a bounded buffer of the k largest") {
    TypedAggregators.register(spark)
    Seq(("a", 1.0), ("a", 5.0), ("a", 3.0), ("a", 9.0), ("b", 2.0))
      .toDF("k", "v").createOrReplaceTempView("agg_topk")
    val out = spark.sql("SELECT k, top_k_values(v) AS top FROM agg_topk GROUP BY k")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(9.0, 5.0, 3.0))
    assert(out("b") == Seq(2.0))
  }

  test("KmvSketch: merge-order independence, exact below k, bounded at k") {
    val kmv = new graft.functions.TypedAggregators.KmvSketch(8)
    val values = (1L to 100L).map(v => v * 7919L % 1000L).distinct
    // any partitioning + merge order yields the same buffer
    def fold(vs: Seq[Long]) = vs.foldLeft(kmv.zero)(kmv.reduce)
    val whole = fold(values)
    val split = kmv.merge(fold(values.take(30)), fold(values.drop(30)))
    val reversed = kmv.merge(fold(values.drop(30).reverse), fold(values.take(30).reverse))
    assert(whole == split && split == reversed,
      "KMV buffer must be a function of the input SET")
    assert(whole == values.distinct.sorted.take(8))
    // idempotent: merging a sketch with itself changes nothing
    assert(kmv.merge(whole, whole) == whole)
    // below k the sketch IS the set
    val small = fold(Seq(5L, 3L, 9L, 3L))
    assert(small == Seq(3L, 5L, 9L))
    assert(whole.length == 8)
  }

  test("QuantileSketch: exact below capacity, weight-conserving, bounded rank error at scale") {
    import graft.functions.TypedAggregators.QuantileSketch
    val ps = Seq(0.5, 0.9, 0.99)
    val qs = new QuantileSketch(64, ps)
    def fold(vs: Seq[Double]) = vs.foldLeft(qs.zero)(qs.reduce)
    // n < 2b: no collapse ever fires, estimates are exact order stats
    val small = (1 to 100).map(_.toDouble)
    val exactSmall = qs.finish(fold(scala.util.Random.shuffle(small)))
    assert(exactSmall == Seq(50.0, 90.0, 99.0), s"got $exactSmall")
    // at scale: 20k values, three different partition/merge shapes —
    // every estimate must sit within the rank-error envelope
    val n = 20000
    val big = (1 to n).map(_.toDouble)
    val shuffled = new scala.util.Random(42).shuffle(big)
    val whole = fold(shuffled)
    val halves = qs.merge(fold(shuffled.take(n / 2)), fold(shuffled.drop(n / 2)))
    val chunks = shuffled.grouped(997).map(fold).reduce(qs.merge)
    // weight conservation: the sketch always represents exactly n items
    def weightOf(levels: Seq[Seq[Double]]): Long =
      levels.zipWithIndex.map { case (items, i) => items.length.toLong << i }.sum
    assert(Seq(whole, halves, chunks).forall(weightOf(_) == n.toLong),
      "collapse/merge must conserve represented weight exactly")
    // bounded state: every level buffer stays under 2b
    assert(Seq(whole, halves, chunks).forall(_.forall(_.length < 128)),
      "level buffers must stay bounded by 2b")
    for (levels <- Seq(whole, halves, chunks); (p, est) <- ps.zip(qs.finish(levels))) {
      val rankErr = math.abs(est - p * n) / n // values ARE ranks here
      assert(rankErr <= 0.05, s"p$p estimate $est off by rank fraction $rankErr")
    }
    // empty input yields NaNs, not a crash
    assert(qs.finish(qs.zero).forall(_.isNaN))
  }
}
