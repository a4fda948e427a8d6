package graft

import graft.operators.FlowAnalytics
import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpecBase {

  test("fuzzyJoin: gram-blocked pairs equal all-pairs levenshtein, incl. the short-string fallback") {
    import spark.implicits._
    // ab/cd qualify at dist 2 but share NO bigram — only the
    // length-banded short block can find them (the exactness seam the
    // scaladoc documents); platinum gear/gears exercises the
    // insert-at-the-end case the count bound must keep
    val part = Seq(
      (1L, "old bolt"), (2L, "cold bolt"), (3L, "red bolt"),
      (4L, "ab"), (5L, "cd"), (6L, "abc"),
      (7L, "platinum gear"), (8L, "platinum gears"), (9L, "titanium gear")
    ).toDF("p_partkey", "p_name")
    val out = graft.operators.RelationalOps.fuzzyJoin(part, maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = part.select("p_name").distinct.as[String].collect()
    val expect = (for {
      a <- names; b <- names if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd.toLong)).toSet
    assert(out == expect, s"got $out expected $expect")
    // the fallback case really is in the result set (guards against a
    // refactor silently narrowing the short block)
    assert(expect.contains(("ab", "cd", 2L)))
    assert(expect.contains(("platinum gear", "platinum gears", 1L)))
  }

  test("basketAffinity: hand-computed support/confidence/lift on planted baskets") {
    import spark.implicits._
    // 4 orders: {1,2} x3 co-orders, part 3 alone in one basket, and a
    // duplicate line (same order+part twice) that distinct() must fold
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val out = graft.operators.RelationalOps.basketAffinity(li, minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    graft.Caches.release()
    // only {1,2} clears minCount=2: n_both=3, n_1=3, n_2=3, N=4
    // support 3/4, conf both 1.0, lift 3*4/(3*3) = 1.3333
    assert(out.keySet == Set((1L, 2L)), s"got ${out.keySet}")
    assert(out((1L, 2L)) == ((3L, 3L, 3L, 0.75, 1.0, 1.0, 1.3333)),
      s"got ${out((1L, 2L))}")
  }

  test("spendDeciles: hierarchical rank equals the single-window formulation on a skewed domain") {
    import spark.implicits._
    // heavy spend ties across customers so the custkey tiebreak is
    // load-bearing, plus one hot whale dominating the top tier
    val orders = ((1L to 97L).map(i => (i % 37, ((i % 5) * 100) + 0.25)) ++
      Seq((99L, 9999.75), (99L, 9999.75)))
      .toDF("o_custkey", "o_totalprice")
    val got = graft.operators.RelationalOps.spendDeciles(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // single-window twin (the oracle's formulation, in Spark)
    val cust = orders.groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val ranked = cust.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("cents", "o_custkey")))
      .crossJoin(cust.agg(count(lit(1)).as("n_cust"), sum("cents").as("total_cents")))
      .withColumn("tier", expr("((rnk - 1) * 10) div n_cust"))
    val expect = ranked.groupBy("tier")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("tier_cents"),
        first("total_cents").as("total_cents"))
      .withColumn("tier_spend", col("tier_cents").cast("double") / 100.0)
      .withColumn("spend_share",
        col("tier_cents").cast("double") / col("total_cents").cast("double"))
      .select("tier", "n_customers", "tier_spend", "spend_share")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSet == expect.toSet)
    assert(got.map(_._2).sum == 38L) // 37 regulars + the whale
    // top tier carries the whale: its share dominates
    assert(got.maxBy(_._1)._4 > 0.4)
  }

  test("percentile_approx sketch lands within 2% of the exact percentiles") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val exact = graft.operators.RelationalOps.percentiles(li)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.operators.RelationalOps.percentilesApprox(li)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, (p50q, p90q, p50p)) =>
      val (a50q, a90q, a50p) = approx(flag)
      // percentile_approx returns an actual data value, percentile
      // interpolates — allow the neighbouring-value gap
      assert(math.abs(a50q - p50q) / p50q < 0.02, s"$flag p50_qty $a50q vs $p50q")
      assert(math.abs(a90q - p90q) / p90q < 0.02, s"$flag p90_qty $a90q vs $p90q")
      assert(math.abs(a50p - p50p) / p50p < 0.02, s"$flag p50_price $a50p vs $p50p")
    }
  }

  test("equiDepth sketch boundaries bucket within 5% of the exact histogram") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val n = li.count()
    val exact = graft.operators.RelationalOps.equiDepth(li)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val approx = graft.operators.RelationalOps.equiDepth(li, exact = false)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(exact.keySet == (0 until 10).toSet)
    assert(approx.keySet == (0 until 10).toSet, "sketch path keeps all 10 buckets")
    assert(approx.values.sum == n, "every row lands in exactly one bucket")
    // rank error of the sketch boundary shifts rows between adjacent
    // buckets — per-bucket counts stay near the n/10 equi-depth target
    approx.values.foreach(c =>
      assert(math.abs(c - n / 10.0) / n < 0.05, s"bucket count $c vs ${n / 10.0}"))
  }

  test("tableStats sketch NDVs land within 5% of exact; all other stats identical") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    def byCol(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val exact = byCol(graft.operators.RelationalOps.tableStats(li))
    val approx = byCol(graft.operators.RelationalOps.tableStats(li, exact = false))
    assert(exact.keySet == Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nRows, nn, nulls, ndv, mn, mx)) =>
      val (aRows, ann, anulls, andv, amn, amx) = approx(c)
      assert((aRows, ann, anulls, amn, amx) == (nRows, nn, nulls, mn, mx),
        s"$c: only the NDV may differ on the sketch path")
      assert(math.abs(andv - ndv) / ndv.toDouble < 0.05, s"$c ndv $andv vs $ndv")
      assert(mn <= mx && nn + nulls == nRows && ndv <= nn, s"$c stats inconsistent")
    }
  }

  test("priceBand density guard: hot bucket reported up front, capped out of the pair join") {
    import spark.implicits._
    // planted skew: 50 parts of one brand at the SAME price point — one
    // band bucket carrying 50·49/2 candidate pairs — plus a few spread
    // parts whose pairs must survive the cap untouched
    val hot = (1L to 50L).map(i => (i, "B1", 100.00))
    val spread = Seq((101L, "B1", 5.00), (102L, "B1", 5.40), (103L, "B1", 7.00),
      (104L, "B2", 9.00), (105L, "B2", 9.30))
    val part = (hot ++ spread).toDF("p_partkey", "p_brand", "p_retailprice")
    // pre-flight report: the planted cell leads, with its quadratic
    // candidate mass visible BEFORE any pair enumerates
    val top = graft.operators.RelationalOps.priceBandStats(part).collect().head
    assert(top.getString(0) == "B1" && top.getLong(2) == 50L &&
      top.getLong(3) == 50L * 49 / 2, s"got $top")
    // uncapped default: the exact contract — hot pairs all materialize
    val full = graft.operators.RelationalOps.priceBand(part).count()
    assert(full == 50L * 49 / 2 + 2, s"expected 1227 pairs, got $full")
    // capped: the hot bucket's rows emit no pairs; both spread pairs
    // ((101,102) at Δ0.40 and (104,105) at Δ0.30) survive exactly
    val capped = graft.operators.RelationalOps.priceBand(part, maxBucketRows = Some(10))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set(("B1", 101L, 102L), ("B2", 104L, 105L)), s"got $capped")
  }

  test("keySkew sketch median lands within 5% of exact; all other columns identical") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getLong(6)))
    val exact = graft.operators.RelationalOps.keySkew(li)
    val approx = graft.operators.RelationalOps.keySkew(li, exact = false)
    assert(exact.schema == approx.schema,
      "both paths must share one output schema (sketch median cast to double)")
    val (e, a) = (rows(exact), rows(approx))
    assert(e.length == a.length)
    e.zip(a).foreach { case ((cnt, sh, nk, nr, p50e, mx), (acnt, ash, ank, anr, p50a, amx)) =>
      assert((acnt, ash, ank, anr, amx) == (cnt, sh, nk, nr, mx),
        "only the median (and its skew_ratio) may differ on the sketch path")
      assert(math.abs(p50a - p50e) / p50e < 0.05, s"sketch p50 $p50a vs exact $p50e")
    }
  }

  test("robustOutliers sketch medians keep the exact flag counts (within boundary slack)") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val exact = graft.operators.RelationalOps.robustOutliers(o)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    val approx = graft.operators.RelationalOps.robustOutliers(o, exact = false)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (grp, (n, flags)) =>
      assert(approx(grp)._1 == n, s"$grp group size must not change")
      // a sketch median shifts the band edge by at most the rank error;
      // only rows hugging the k·MAD boundary can flip
      assert(math.abs(approx(grp)._2 - flags) <= math.max(2L, n / 100),
        s"$grp flags ${approx(grp)._2} vs exact $flags")
    }
  }

  test("q49 sliding-HLL rolling distinct lands within 5% of exact q45 (windowDays=7)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = graft.operators.TrackAnalytics.rollingDistinct(ev, windowDays = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = graft.operators.TrackAnalytics.rollingDistinctHll(ev, windowDays = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet, "same report days as the exact twin")
    exact.foreach { case (day, (win, dayN)) =>
      val (aWin, aDay) = approx(day)
      // lgConfigK=12 → ~1.6% stderr; DataSketches HLL is exact in
      // sparse mode at these cardinalities, so 5% is generous slack
      assert(math.abs(aWin - win).toDouble / win < 0.05, s"$day win $aWin vs $win")
      assert(math.abs(aDay - dayN).toDouble / dayN < 0.05, s"$day day $aDay vs $dayN")
    }
  }

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

  test("kmvOverlap estimates track exact typeOverlap on planted partial overlaps") {
    import spark.implicits._
    import graft.operators.TrackAnalytics
    // planted audiences well above k=64: A = 0..4999, B = 2500..7499
    // (J = 1/3), C = 0..499 (C ⊂ A, J(A,C) = 0.1); each user one event
    val rows = (0L until 5000L).map(u => ("A", u)) ++
      (2500L until 7500L).map(u => ("B", u)) ++
      (0L until 500L).map(u => ("C", u))
    val ev = rows.toDF("event_type", "user_id")
    val exact = TrackAnalytics.typeOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    graft.Caches.release()
    assert(exact(("A", "B")) == ((5000L, 5000L, 2500L, 0.3333)))
    assert(exact(("A", "C"))._3 == 500L)
    assert(!exact.contains(("B", "C")), "disjoint pair must carry no exact row")
    val est = TrackAnalytics.kmvOverlap(ev, k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // k=64 → ~12.5% union stderr, ~0.06 jaccard stderr; 3σ-generous
    val (abU, abBoth, abJ) = est(("A", "B"))
    assert(math.abs(abU - 7500) / 7500.0 < 0.4, s"union est $abU")
    assert(math.abs(abJ - 1.0 / 3) < 0.2, s"jaccard est $abJ")
    assert(math.abs(abBoth - 2500) / 2500.0 < 0.6, s"both est $abBoth")
    val (_, _, bcJ) = est(("B", "C"))
    assert(bcJ == 0.0, "disjoint sketches must estimate J = 0 exactly")
    assert(est(("A", "C"))._3 > 0.0, "the contained audience must register overlap")
    // determinism: the sketch table is a function of the input set
    val again = TrackAnalytics.kmvOverlap(ev, k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(again == est)
  }
}
