package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Quality, RelationalOps}
import graft.operators.Quality._

/** q73/q74/q75 — the data-quality and cohort layer: hand-computed
  * verdicts on constructed inputs (both verdict branches, null keys,
  * null predicate results) plus the single-scan plan pin for the
  * fused row-predicate pass. */
class QualitySpec extends SparkSpecBase {

  import spark.implicits._

  test("q73 dqProfile: counts, nulls, distincts and canonical extrema on a constructed table") {
    val df = Seq[(java.lang.Long, Option[String], Option[Double])](
      (1L, Some("b"), Some(2.505)),
      (2L, Some("a"), Some(10.0)),
      (3L, None, Some(2.505)),
      (4L, Some("a"), None)
    ).toDF("id", "tag", "price")
    val out = Quality.dqProfile(df, Seq("id", "tag", "price")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("id", "price", "tag"))
    val byCol = out.map(r => r.getString(0) -> r).toMap
    // id: 4 rows, 0 null, 4 distinct, min "1" max "4"
    assert(byCol("id") == Row("id", 4L, 0L, 4L, "1", "4"))
    // tag: 1 null, 2 distinct non-null values, min "a" max "b"
    assert(byCol("tag") == Row("tag", 4L, 1L, 2L, "a", "b"))
    // price: cents protocol — floor(2.505*100+0.5) = 251, 10.0 → 1000
    assert(byCol("price") == Row("price", 4L, 1L, 2L, "251", "1000"))
  }

  test("q73 dqProfile rejects unknown columns") {
    val df = Seq((1L, "x")).toDF("id", "tag")
    intercept[IllegalArgumentException] {
      Quality.dqProfile(df, Seq("id", "nope"))
    }
  }

  test("q74 dqConstraints: every check shape, both verdict branches, null keys and null predicates") {
    val users = Seq[(java.lang.Long, Option[Double])](
      (1L, Some(5.0)), (2L, Some(-1.0)), (2L, Some(3.0)),
      (null, Some(2.0)), (null, None)
    ).toDF("uid", "score")
    val orders = Seq[(Long, Long)]((10L, 1L), (11L, 2L), (12L, 99L))
      .toDF("oid", "uid")
    val out = Quality.dqConstraints(
      Map("users" -> users, "orders" -> orders),
      Seq(
        // 2 violations: -1.0 fails, NULL score counts as violation
        RowPredicate("score_nonneg", "users", col("score") >= 0),
        // passes: every uid in orders is non-null
        RowPredicate("order_uid_notnull", "orders", col("uid").isNotNull),
        // uid=2 twice (+1), uid=NULL twice (+1: null keys group together)
        Unique("uid_unique", "users", Seq("uid")),
        // orders.uid=99 has no user; NULL user uids never match
        RefIntegrity("order_uid_ri", "orders", Seq("uid"), "users", Seq("uid")),
        // joined rows: oid 10 (score 5.0 ok), oid 11 ×2 (scores -1.0, 3.0:
        // one violation); oid 12 doesn't join
        JoinPredicate("order_user_score_pos", "orders", Seq("uid"),
          "users", Seq("uid"), col("score") > 0)))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("score_nonneg") == Row("score_nonneg", 5L, 2L, "fail"))
    assert(out("order_uid_notnull") == Row("order_uid_notnull", 3L, 0L, "pass"))
    assert(out("uid_unique") == Row("uid_unique", 5L, 2L, "fail"))
    assert(out("order_uid_ri") == Row("order_uid_ri", 3L, 1L, "fail"))
    assert(out("order_user_score_pos") == Row("order_user_score_pos", 3L, 1L, "fail"))
  }

  test("q74 dqConstraints on an empty table: checked 0, violations 0, pass") {
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val out = Quality.dqConstraints(Map("t" -> empty), Seq(
      RowPredicate("p", "t", col("id") > 0),
      Unique("u", "t", Seq("id")))).collect().map(r => r.getString(0) -> r).toMap
    assert(out("p") == Row("p", 0L, 0L, "pass"))
    assert(out("u") == Row("u", 0L, 0L, "pass"))
  }

  test("q74 plan pin: all row predicates on one table fold into a single scan") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val onlyRow = Quality.dqConstraints(Map("orders" -> orders), Seq(
      RowPredicate("a", "orders", col("o_totalprice") > 0),
      RowPredicate("b", "orders", col("o_orderstatus").isin("F", "O", "P")),
      RowPredicate("c", "orders", col("o_custkey").isNotNull)))
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case f: FileSourceScanExec => Seq(f)
                  case a: AdaptiveSparkPlanExec => scans(a.initialPlan) }.flatten
    val scanned = scans(onlyRow.queryExecution.executedPlan)
    assert(scanned.size == 1,
      s"3 row predicates must share ONE scan of orders, found ${scanned.size}")
  }

  test("q74 inventory instance surfaces the data's genuine violations") {
    val dir = "/root/testdata/sf0.001"
    val out = Quality.ordersLineitemChecks(
        Tables.orders(spark, dir), Tables.lineitem(spark, dir))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out.size == 8)
    // clean domains pass at every SF
    assert(out("orders_totalprice_positive") == "pass")
    assert(out("lineitem_orderkey_ri") == "pass")
    // the generator's duplicate (orderkey, linenumber) pairs and
    // ship-before-order rows exist at every SF — both branches visible
    assert(out("lineitem_line_unique") == "fail")
    assert(out("lineitem_ship_after_order") == "fail")
  }

  test("q75 cohortRevenue: hand-computed cohort matrix") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val orders = Seq(
      (100L, 1L, "O", 10.00, ts("2024-01-05 00:00:00"), "x"),
      (101L, 1L, "O", 20.50, ts("2024-03-09 00:00:00"), "x"), // offset 2
      (102L, 2L, "O", 5.25, ts("2024-01-20 00:00:00"), "x"),
      (103L, 3L, "O", 7.00, ts("2024-02-11 00:00:00"), "x"),
      (104L, 2L, "O", 1.75, ts("2024-01-28 00:00:00"), "x")  // same month as cohort
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val out = RelationalOps.cohortRevenue(orders).collect()
    assert(out.toSeq == Seq(
      Row("2024-01", 0, 2L, 1700L, 17.00),  // cust 1: 10.00, cust 2: 5.25+1.75
      Row("2024-01", 2, 1L, 2050L, 20.50),  // cust 1's march order
      Row("2024-02", 0, 1L, 700L, 7.00)))   // cust 3
  }
}
