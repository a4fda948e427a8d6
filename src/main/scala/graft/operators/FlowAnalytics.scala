package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flow-statistics surface of the reference (TrafficTeach
  * `com.bjsxt.spark.skynet.MonitorFlowAnalyze`, `SpeedTopNMonitor`,
  * `MonitorAndCameraStateAccumulator`, `areaRoadFlow.*`), re-expressed
  * as declarative Spark plans over the star schema. The reference
  * hand-schedules these with `mapToPair`/`groupByKey`/accumulators; we
  * declare the logical plan and let Catalyst pick partial aggregation,
  * broadcast joins and AQE coalescing.
  *
  * Scale notes: every aggregation here is map-side-combinable
  * (sum/count/CASE); the only shuffles are the final groupBys on the
  * grouping keys, and every dimension join is broadcast.
  */
object FlowAnalytics {

  /** The cents-exact money-sum protocol (SURVEY §5): a money column
    * terminates at 2 decimals, so round(x·100) is an EXACT integer;
    * sums run in BIGINT — order-independent, overflow-safe to ~9e18
    * cents — and ONE final IEEE division restores the decimal scale
    * bit-equal across engines. The old round(sum(double),4) form was
    * only deterministic while the accumulated float error stayed
    * under the rounding grain: at sf1 (6M rows, sums ~5e10) the
    * engines' different summation orders drifted the 4th decimal. */
  private def centsExact(c: Column): Column = round(c * 100).cast("long")

  /** q01_flow_agg — multi-metric grouped aggregation (per-checkpoint
    * flow stats; TPC-H Q1 shape). Partial-agg friendly; one shuffle on
    * the (tiny-cardinality) group key. */
  def flowAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        (sum(centsExact(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        // price·(1−disc) in integer cents·basis-points: exact at any SF
        (sum(centsExact(col("l_extendedprice")) *
          (lit(100L) - centsExact(col("l_discount")))) / 10000.0).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q02_topn_flow — global top-N groups by count (top checkpoints by
    * car flow). Aggregation shrinks to |group| rows before the
    * driver-side limit, so the sort is on pre-aggregated data. */
  def topNFlow(lineitem: DataFrame, n: Int = 10): DataFrame =
    lineitem
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("flow_cnt"))
      .orderBy(col("flow_cnt").desc, col("l_suppkey"))
      .limit(n)

  /** q03_speed_buckets — conditional aggregation into value buckets
    * (the reference's high/medium/low speed classification per
    * monitor). One pass, no extra shuffle vs a plain count. */
  def speedBuckets(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_suppkey")
      .agg(
        count(when(col("l_quantity") > 40, 1)).as("high_cnt"),
        count(when(col("l_quantity") > 20 && col("l_quantity") <= 40, 1)).as("mid_cnt"),
        count(when(col("l_quantity") <= 20, 1)).as("low_cnt"),
        count(lit(1)).as("total_cnt"))
      .orderBy("l_suppkey")

  /** q04_group_topn — per-group top-N via ranked window (top speeding
    * cars per checkpoint). Single shuffle on the partition key; the
    * rank prunes before any downstream join. */
  def groupTopN(lineitem: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    lineitem
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
      .orderBy("l_suppkey", "rn")
  }

  /** q05_star_join_flow — multi-way star join + agg (the reference's
    * area/road flow report). All four dimensions broadcast; the fact
    * table is scanned once with only the needed columns. */
  def starJoinFlow(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                   nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(broadcast(orders.select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_regionkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("flow_cnt"),
        // cents-exact revenue: see flowAgg — float sums drift at sf1
        (sum(centsExact(col("l_extendedprice")) *
          (lit(100L) - centsExact(col("l_discount")))) / 10000.0).as("revenue"))
      .orderBy("r_name", "n_name")

  /** q06_group_concat — ordered distinct string concat per group. The
    * reference implements this as a custom `GroupConcatDistinctUDAF`;
    * collect_set + array_sort + array_join is the codegen-friendly
    * equivalent and stays inside whole-stage codegen. */
  def groupConcat(customer: DataFrame, nation: DataFrame): DataFrame =
    customer
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        count(lit(1)).as("cust_cnt"))
      .orderBy("n_name")

  /** q07_distinct_count — count-distinct per group (distinct cars per
    * area). Exact distinct: Spark plans a two-stage partial distinct.
    * At 100 TB swap in approx_count_distinct for a single-pass HLL. */
  def distinctCount(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("o_custkey")).as("cust_cnt"),
        count(lit(1)).as("order_cnt"))
      .orderBy("c_mktsegment")

  /** q24_monitor_health — abnormal-checkpoint detection (TrafficTeach
    * `MonitorAndCameraStateAccumulator` semantics): compare each
    * registered unit (supplier ≈ monitor) against observed traffic;
    * units below the activity floor are flagged. Left join from the
    * dim so silent units still appear. */
  def monitorHealth(supplier: DataFrame, lineitem: DataFrame, minFlow: Long = 30): DataFrame =
    supplier.select("s_suppkey", "s_name")
      .join(lineitem.groupBy("l_suppkey").agg(count(lit(1)).as("flow_cnt")),
        col("s_suppkey") === col("l_suppkey"), "left_outer")
      .select(
        col("s_suppkey"), col("s_name"),
        coalesce(col("flow_cnt"), lit(0L)).as("flow_cnt"),
        (coalesce(col("flow_cnt"), lit(0L)) < minFlow).as("abnormal"))
      .orderBy("s_suppkey")

  /** q25_global_stats — the reference's accumulator report as a
    * one-row declarative aggregate: global counts of units, records
    * and health states in a single pass over pre-aggregated flows. */
  def globalStats(supplier: DataFrame, lineitem: DataFrame, minFlow: Long = 30): DataFrame =
    monitorHealth(supplier, lineitem, minFlow)
      .agg(
        count(lit(1)).as("n_monitors"),
        count(when(col("abnormal"), 1)).as("n_abnormal"),
        count(when(!col("abnormal"), 1)).as("n_normal"),
        sum("flow_cnt").as("total_flow"))

  /** q26_json_extract — typed extraction from a JSON string column
    * (the reference string-splits its record payloads; Spark parses
    * them columnar-side) + aggregation on the extracted field. */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      // from_json parses once into a typed struct (get_json_object
      // re-parses per extraction path)
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k"))
      .groupBy("event_type")
      .agg(
        count(when(col("k").isNotNull, 1)).as("n_with_k"),
        sum("k").as("k_sum"),
        min("k").as("k_min"),
        max("k").as("k_max"))
      .orderBy("event_type")

  /** q28_approx_distinct — single-pass HLL distinct counting, the
    * 100 TB form of q07: mergeable sketch, no two-stage exact-distinct
    * expansion. Spec-checked within rsd bounds against the exact count
    * (sketches aren't bit-comparable across engines). */
  def approxDistinct(orders: DataFrame, customer: DataFrame, rsd: Double = 0.02): DataFrame =
    orders
      .join(broadcast(customer.select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        approx_count_distinct(col("o_custkey"), rsd).as("cust_cnt_approx"),
        count(lit(1)).as("order_cnt"))
      .orderBy("c_mktsegment")

  /** q23_broadcast_dim — explicit broadcast-hash dim join: the fact
    * side never shuffles for the join, only for the final agg. */
  def broadcastDim(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .select("l_suppkey", "l_extendedprice")
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("item_cnt"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("n_name")
}
