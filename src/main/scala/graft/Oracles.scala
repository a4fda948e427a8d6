package graft

/** DuckDB oracle SQL for every SQL-expressible query in SURVEY.md §2.
  * Column aliases, rounding and ordering match the Spark plans exactly
  * (see SURVEY.md §5 for the determinism protocol).
  */
object Oracles {

  val relational: Map[String, String] = Map(
    "q01_flow_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q02_topn_flow" ->
      """SELECT l_suppkey, count(*) AS flow_cnt FROM lineitem
         GROUP BY l_suppkey ORDER BY flow_cnt DESC, l_suppkey LIMIT 10""",

    "q03_speed_buckets" ->
      """SELECT l_suppkey,
         count(*) FILTER (WHERE l_quantity > 40) AS high_cnt,
         count(*) FILTER (WHERE l_quantity > 20 AND l_quantity <= 40) AS mid_cnt,
         count(*) FILTER (WHERE l_quantity <= 20) AS low_cnt,
         count(*) AS total_cnt
         FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",

    "q04_group_topn" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                  row_number() OVER (PARTITION BY l_suppkey
                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem)
         WHERE rn <= 3 ORDER BY l_suppkey, rn""",

    "q05_star_join_flow" ->
      """SELECT r_name, n_name, count(*) AS flow_cnt,
         round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q06_group_concat" ->
      """SELECT n_name,
         string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
         count(*) AS cust_cnt
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "q07_distinct_count" ->
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS cust_cnt,
         count(*) AS order_cnt
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q08_car_track" ->
      """SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS track,
         count(*) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q09_funnel_step" ->
      """SELECT event_type AS from_type, to_type, count(*) AS cnt FROM (
           SELECT event_type,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
           FROM events)
         WHERE to_type IS NOT NULL
         GROUP BY from_type, to_type ORDER BY from_type, to_type""",

    "q10_collision" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase'
         ORDER BY user_id""",

    "q11_sessionize" ->
      """WITH l AS (
           SELECT user_id, event_id, epoch_ms(ts) AS cur_ms,
                  lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
           FROM events),
         s AS (
           SELECT user_id,
                  sum(CASE WHEN prev_ms IS NULL OR cur_ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY cur_ms, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
           FROM l)
         SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
         FROM s GROUP BY user_id ORDER BY user_id""",

    "q12_rollup" ->
      """SELECT coalesce(r_name,'ALL') AS r_name, coalesce(n_name,'ALL') AS n_name,
         count(*) AS cust_cnt, round(sum(c_acctbal),2) AS acctbal_sum
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name) ORDER BY r_name, n_name""",

    "q13_running_total" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING),2) AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q14_stratified_sample" ->
      """SELECT event_id, user_id, event_type FROM (
           SELECT event_id, user_id, event_type,
                  row_number() OVER (PARTITION BY date_trunc('day', ts)
                    ORDER BY (event_id*2654435761)%4294967296, event_id) AS rn
           FROM events)
         WHERE rn <= 5 ORDER BY event_id""",

    "q15_pivot" ->
      """SELECT c_mktsegment,
         count(*) FILTER (WHERE o_orderstatus='O') AS cnt_o,
         count(*) FILTER (WHERE o_orderstatus='F') AS cnt_f,
         count(*) FILTER (WHERE o_orderstatus='P') AS cnt_p
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q16_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",

    "q17_semi_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_partkey = p_partkey AND l_quantity >= 48)
         ORDER BY p_partkey""",

    "q18_set_ops" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
         EXCEPT
         SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
         ORDER BY custkey""",

    "q19_salted_agg" ->
      """SELECT o_orderpriority, count(*) AS order_cnt,
         round(sum(o_totalprice),2) AS total_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q20_time_window" ->
      """SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
         count(*) AS n_events, round(sum(value),2) AS sum_value
         FROM events GROUP BY event_type, hour_ms ORDER BY event_type, hour_ms""",

    "q21_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5),2) AS p50_qty,
         round(quantile_cont(l_quantity, 0.9),2) AS p90_qty,
         round(quantile_cont(l_extendedprice, 0.5),3) AS p50_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q22_orders_histogram" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON o_custkey = c_custkey
           GROUP BY c_custkey)
         GROUP BY c_count ORDER BY c_count""",

    "q23_broadcast_dim" ->
      """SELECT n_name, count(*) AS item_cnt, round(sum(l_extendedprice),2) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name"""
  )

  def all: Map[String, String] = relational
}
