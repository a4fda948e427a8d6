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
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0
           AS sum_base_price,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0
           AS sum_disc_price,
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
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0
           AS revenue
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
      """WITH c AS (
           SELECT event_type AS from_type, to_type, count(*) AS cnt FROM (
             SELECT event_type,
                    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             FROM events)
           WHERE to_type IS NOT NULL
           GROUP BY from_type, to_type)
         SELECT from_type, to_type, cnt,
                floor((cnt*1.0/sum(cnt) OVER (PARTITION BY from_type))*10000 + 0.5)/10000 AS conv_rate
         FROM c ORDER BY from_type, to_type""",

    "q10_collision" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase'
         ORDER BY user_id""",

    "q11_sessionize" ->
      """WITH l AS (
           SELECT user_id, event_id, epoch_ms(ts) AS cur_ms, epoch_us(ts) AS cur_us,
                  lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
           FROM events),
         s AS (
           SELECT user_id,
                  sum(CASE WHEN prev_ms IS NULL OR cur_ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY cur_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
           FROM l)
         SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
         FROM s GROUP BY user_id ORDER BY user_id""",

    // q53: session derivation identical to q11; rn <= 8 mirrors the
    // Spark slice; LIMIT after the (count DESC, path) tiebreak
    "q53_session_paths" ->
      """WITH l AS (
           SELECT user_id, event_id, event_type,
                  epoch_ms(ts) AS cur_ms, epoch_us(ts) AS cur_us,
                  lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
           FROM events),
         s AS (
           SELECT user_id, event_id, event_type, cur_us,
                  sum(CASE WHEN prev_ms IS NULL OR cur_ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY cur_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
           FROM l),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                                        ORDER BY cur_us, event_id) AS rn
           FROM s),
         p AS (
           SELECT user_id, session_id,
                  string_agg(event_type, '>' ORDER BY cur_us, event_id) AS path
           FROM r WHERE rn <= 8 GROUP BY user_id, session_id)
         SELECT path, count(*) AS n_sessions
         FROM p GROUP BY path
         ORDER BY n_sessions DESC, path LIMIT 20""",

    "q34_session_window" ->
      """WITH l AS (
           SELECT user_id, event_id, epoch_us(ts) AS cur_us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         s AS (
           SELECT user_id, cur_us,
                  sum(CASE WHEN prev_us IS NULL OR cur_us - prev_us >= 1800000000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY cur_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
           FROM l)
         SELECT user_id, CAST(min(cur_us) // 1000 AS BIGINT) AS session_start_ms,
                count(*) AS n_events
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_start_ms""",

    "q12_rollup" ->
      """SELECT coalesce(r_name,'ALL') AS r_name, coalesce(n_name,'ALL') AS n_name,
         count(*) AS cust_cnt, round(sum(c_acctbal),2) AS acctbal_sum
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name) ORDER BY r_name, n_name""",

    "q31_cube" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
         coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
         count(*) AS order_cnt, round(sum(o_totalprice), 2) AS total_price
         FROM orders
         GROUP BY CUBE(o_orderpriority, o_orderstatus)
         ORDER BY o_orderpriority, o_orderstatus""",

    "q40_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
         coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
         count(*) AS order_cnt, round(sum(o_totalprice), 2) AS total_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                 (o_orderstatus), (o_orderpriority))
         ORDER BY o_orderstatus, o_orderpriority""",

    "q32_moving_window" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2) AS recent_spend,
         count(*) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS recent_orders
         FROM orders ORDER BY o_custkey, o_orderkey""",

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

    // the salted replicated join must equal the plain join exactly
    "q35_salted_join" ->
      """SELECT s_nationkey, round(sum(l_quantity),2) AS sum_qty,
         count(*) AS n_li
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey ORDER BY s_nationkey""",

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

    // the plain inequality self-join IS the oracle's formulation; the
    // Spark side runs the bucket-key hash join with an exact
    // post-filter — same pairs by construction
    "q48_price_band" ->
      """SELECT a.p_brand AS brand,
                a.p_partkey AS k_a, b.p_partkey AS k_b,
                floor(abs(a.p_retailprice - b.p_retailprice)*100 + 0.5)/100 AS price_gap
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand
          AND a.p_partkey < b.p_partkey
          AND abs(a.p_retailprice - b.p_retailprice) <= 0.50
         ORDER BY brand, k_a, k_b""",

    // the plain all-pairs edit-distance predicate IS the oracle; the
    // Spark side runs q-gram blocking + count-bound pruning + exact
    // verify — same pairs by the Gravano pigeonhole bound
    "q54_fuzzy_join" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part)
         SELECT a.name AS name_a, b.name AS name_b,
                CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
         FROM names a JOIN names b ON a.name < b.name
         WHERE levenshtein(a.name, b.name) <= 2
         ORDER BY name_a, name_b""",

    // the global rank SPEC (one window) — the Spark side computes the
    // same rank hierarchically (t16's prefix-sum formulation); sums
    // cast away HUGEINT; shares are single IEEE divisions of
    // integer-exact cents (bit-equal cross-engine)
    "q55_spend_deciles" ->
      """WITH cust AS (
           SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         ranked AS (
           SELECT cents,
                  row_number() OVER (ORDER BY cents, o_custkey) AS rnk,
                  count(*) OVER () AS n_cust,
                  CAST(sum(cents) OVER () AS BIGINT) AS total_cents
           FROM cust)
         SELECT ((rnk - 1) * 10) // n_cust AS tier,
                count(*) AS n_customers,
                CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS tier_spend,
                CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
                  / CAST(total_cents AS DOUBLE) AS spend_share
         FROM ranked GROUP BY 1, total_cents ORDER BY tier""",

    // transition counts are exact; prob is one IEEE division of two
    // exact longs per cell (cast away HUGEINT on the window sum)
    "q56_transition_matrix" ->
      """WITH l AS (
           SELECT user_id, event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, count(*) AS cnt
               FROM l WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, cnt,
                CAST(cnt AS DOUBLE) /
                  CAST(CAST(sum(cnt) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE)
                  AS prob
         FROM c ORDER BY from_type, to_type""",

    // q58: q56 with the lead window partitioned on (user, session) —
    // the session derivation mirrors q53's oracle exactly
    "q58_session_transitions" ->
      """WITH l AS (
           SELECT user_id, event_id, event_type,
                  epoch_ms(ts) AS cur_ms, epoch_us(ts) AS cur_us,
                  lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
           FROM events),
         s AS (
           SELECT user_id, event_id, event_type, cur_us,
                  sum(CASE WHEN prev_ms IS NULL OR cur_ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY cur_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
           FROM l),
         tr AS (
           SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id, session_id
                    ORDER BY cur_us, event_id) AS to_type
           FROM s),
         c AS (SELECT from_type, to_type, count(*) AS cnt
               FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, cnt,
                CAST(cnt AS DOUBLE) /
                  CAST(CAST(sum(cnt) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE)
                  AS prob
         FROM c ORDER BY from_type, to_type""",

    // q59: exact integer-micros dwell sums; the mean is the identical
    // fixed-parenthesization division chain on both engines
    "q59_dwell_time" ->
      """WITH l AS (
           SELECT event_type, epoch_us(ts) AS us,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_us
           FROM events)
         SELECT event_type, count(*) AS n_stays,
                CAST(sum(next_us - us) AS BIGINT) AS total_dwell_us,
                CAST(CAST(sum(next_us - us) AS BIGINT) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) / 1000000.0 AS avg_dwell_s
         FROM l WHERE next_us IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    // the windowed arg-max SPEC — the Spark side computes the same
    // verdict with a min-of-struct two-stage aggregation (no window)
    "q57_modal_event" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
                    FROM events GROUP BY 1, 2),
         r AS (SELECT user_id, event_type, cnt,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY cnt DESC, event_type) AS rn
               FROM c)
         SELECT user_id, event_type AS mode_type, cnt AS mode_cnt
         FROM r WHERE rn = 1 ORDER BY user_id""",

    // bucket = how many boundaries x strictly exceeds — spelled as
    // nine explicit comparisons (no list lambda, engine-portable)
    // q52: sum(cnt) casts away HUGEINT; share/skew_ratio are single
    // IEEE divisions of integer-exact values (bit-equal cross-engine);
    // quantile_cont matches Spark's percentile interpolation (q46)
    "q52_key_skew" ->
      """WITH c AS (SELECT l_partkey AS key, count(*) AS cnt
                    FROM lineitem GROUP BY 1),
         s AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
                      quantile_cont(cnt, 0.5) AS p50_cnt, max(cnt) AS max_cnt
               FROM c)
         SELECT key, cnt,
                CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS share,
                n_keys, n_rows, p50_cnt, max_cnt,
                CAST(max_cnt AS DOUBLE) / p50_cnt AS skew_ratio
         FROM c CROSS JOIN s
         ORDER BY cnt DESC, key LIMIT 20""",

    // q51: the Bloom prefilter is invisible to semantics — the oracle
    // is the plain semi-join aggregate; sum(BIGINT) casts away HUGEINT
    "q51_bloom_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_totalprice > 350000)
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    // q50: count/count(DISTINCT) are BIGINT in DuckDB (no HUGEINT
    // leak); min/max cast explicitly (l_linenumber is INTEGER)
    "q50_table_stats" ->
      """SELECT 'l_orderkey' AS column_name, count(*) AS n_rows,
                count(l_orderkey) AS n_non_null,
                count(*) - count(l_orderkey) AS n_nulls,
                count(DISTINCT l_orderkey) AS n_distinct,
                CAST(min(l_orderkey) AS BIGINT) AS min_val,
                CAST(max(l_orderkey) AS BIGINT) AS max_val FROM lineitem
         UNION ALL
         SELECT 'l_partkey', count(*), count(l_partkey),
                count(*) - count(l_partkey), count(DISTINCT l_partkey),
                CAST(min(l_partkey) AS BIGINT),
                CAST(max(l_partkey) AS BIGINT) FROM lineitem
         UNION ALL
         SELECT 'l_suppkey', count(*), count(l_suppkey),
                count(*) - count(l_suppkey), count(DISTINCT l_suppkey),
                CAST(min(l_suppkey) AS BIGINT),
                CAST(max(l_suppkey) AS BIGINT) FROM lineitem
         UNION ALL
         SELECT 'l_linenumber', count(*), count(l_linenumber),
                count(*) - count(l_linenumber), count(DISTINCT l_linenumber),
                CAST(min(l_linenumber) AS BIGINT),
                CAST(max(l_linenumber) AS BIGINT) FROM lineitem
         ORDER BY column_name""",

    "q47_equi_depth" ->
      """WITH b AS (SELECT quantile_cont(l_extendedprice,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bnd
           FROM lineitem),
         r AS (SELECT l_extendedprice AS x FROM lineitem)
         SELECT CAST((x > bnd[1]) AS INT) + CAST((x > bnd[2]) AS INT)
              + CAST((x > bnd[3]) AS INT) + CAST((x > bnd[4]) AS INT)
              + CAST((x > bnd[5]) AS INT) + CAST((x > bnd[6]) AS INT)
              + CAST((x > bnd[7]) AS INT) + CAST((x > bnd[8]) AS INT)
              + CAST((x > bnd[9]) AS INT) AS bucket,
                count(*) AS n_rows,
                floor(min(x)*100 + 0.5)/100 AS lo,
                floor(max(x)*100 + 0.5)/100 AS hi
         FROM r CROSS JOIN b
         GROUP BY 1 ORDER BY bucket""",

    "q46_robust_outliers" ->
      """WITH v AS (SELECT o_orderpriority AS grp, o_totalprice AS x FROM orders),
         m AS (SELECT grp, quantile_cont(x, 0.5) AS med FROM v GROUP BY grp),
         dv AS (SELECT v.grp, abs(x - med) AS adev, med
                FROM v JOIN m USING (grp)),
         md AS (SELECT grp, quantile_cont(adev, 0.5) AS mad FROM dv GROUP BY grp)
         SELECT dv.grp AS o_orderpriority,
                count(*) AS n,
                floor(min(med)*100 + 0.5)/100 AS med,
                floor(min(mad)*100 + 0.5)/100 AS mad,
                CAST(sum(CASE WHEN adev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_outliers
         FROM dv JOIN md USING (grp)
         GROUP BY dv.grp ORDER BY o_orderpriority""",

    "q33_division" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority <> '1-URGENT')
         ORDER BY c_custkey""",

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
         GROUP BY n_name ORDER BY n_name""",

    "q24_monitor_health" ->
      """SELECT s_suppkey, s_name,
         coalesce(flow_cnt, 0) AS flow_cnt,
         coalesce(flow_cnt, 0) < 30 AS abnormal
         FROM supplier LEFT JOIN (
           SELECT l_suppkey, count(*) AS flow_cnt FROM lineitem GROUP BY l_suppkey
         ) ON s_suppkey = l_suppkey
         ORDER BY s_suppkey""",

    "q25_global_stats" ->
      """WITH h AS (
           SELECT s_suppkey, coalesce(flow_cnt, 0) AS flow_cnt,
                  coalesce(flow_cnt, 0) < 30 AS abnormal
           FROM supplier LEFT JOIN (
             SELECT l_suppkey, count(*) AS flow_cnt FROM lineitem GROUP BY l_suppkey
           ) ON s_suppkey = l_suppkey)
         SELECT count(*) AS n_monitors,
                count(*) FILTER (WHERE abnormal) AS n_abnormal,
                count(*) FILTER (WHERE NOT abnormal) AS n_normal,
                CAST(sum(flow_cnt) AS BIGINT) AS total_flow
         FROM h""",

    "q27_range_join" ->
      """SELECT s.event_id AS signup_id, count(c.event_id) AS clicks_30m
         FROM (SELECT * FROM events WHERE event_type = 'signup') s
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON s.user_id = c.user_id AND c.ts > s.ts
              AND epoch_ns(c.ts) - epoch_ns(s.ts) <= 1800000000000
         GROUP BY signup_id ORDER BY signup_id""",

    "t05_stopword_ratio" ->
      """SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS n_stop,
         floor((len(list_filter(toks, x -> x IN ('the','a','of','and','is')))*1.0/len(toks))*10000 + 0.5)/10000 AS stop_ratio
         FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
               FROM documents)
         WHERE len(toks) > 0 ORDER BY doc_id""",

    "t06_word_freq" ->
      """SELECT word, count(*) AS freq
         FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
               FROM documents)
         WHERE word != ''
         GROUP BY word ORDER BY freq DESC, word LIMIT 20""",

    "m03_media_manifest" ->
      """SELECT source, count(*) AS n_docs,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         min(octet_length(encode(text))) AS min_bytes,
         max(octet_length(encode(text))) AS max_bytes
         FROM documents GROUP BY source ORDER BY source""",

    "q30_asof_join" ->
      """WITH t AS (
           SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns
           FROM events WHERE event_type IN ('click', 'signup')),
         w AS (
           SELECT event_id, user_id, event_type, ts_ns,
                  last_value(CASE WHEN event_type = 'click' THEN ts_ns END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ns,
                  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id
           FROM t)
         SELECT event_id AS signup_id, user_id, click_id,
                (ts_ns // 1000) - (click_ns // 1000) AS gap_us
         FROM w WHERE event_type = 'signup' ORDER BY signup_id""",

    "q26_json_extract" ->
      """SELECT event_type,
         count(*) FILTER (WHERE k IS NOT NULL) AS n_with_k,
         CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events)
         GROUP BY event_type ORDER BY event_type""",

    // q36: the correlated avg is exact — l_quantity is integer-valued,
    // so sum-in-double is order-independent and avg = an exact IEEE
    // division both engines share; the boundary predicate cannot flip.
    "q36_correlated_subquery" ->
      """SELECT p_brand, count(*) AS n_small,
         floor(sum(l_extendedprice)*100 + 0.5)/100 AS small_revenue
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                             FROM lineitem l2
                             WHERE l2.l_partkey = p_partkey)
         GROUP BY p_brand ORDER BY p_brand""",

    "q37_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         isl AS (SELECT user_id,
                   day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                              AS INTEGER) AS island
                 FROM days),
         st AS (SELECT user_id, count(*) AS streak_len FROM isl
                GROUP BY user_id, island)
         SELECT user_id, count(*) AS n_streaks, max(streak_len) AS longest_streak,
                CAST(sum(streak_len) AS BIGINT) AS n_active_days
         FROM st GROUP BY user_id ORDER BY user_id""",

    "q38_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         coh AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
         SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
                CAST(day - cohort_day AS INTEGER) AS day_offset,
                count(DISTINCT days.user_id) AS n_users
         FROM days JOIN coh ON days.user_id = coh.user_id
         WHERE day - cohort_day <= 14
         GROUP BY 1, 2
         ORDER BY 1, 2""",

    // q39: greedy-first funnel matching is a chain of per-user min-aggs
    // — identical CTE chain here; timestamps compare at micros (DuckDB's
    // parquet nanos are micro-truncated; epoch_ns(ts)//1000 = Spark's
    // ts_ns div 1000)
    "q39_window_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
         s1 AS (SELECT user_id, min(us) AS t1 FROM ev
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT ev.user_id, min(t1) AS t1, min(us) AS t2
                FROM ev JOIN s1 USING (user_id)
                WHERE event_type = 'click' AND us > t1 AND us <= t1 + 86400000000
                GROUP BY ev.user_id),
         s3 AS (SELECT ev.user_id, min(us) AS t3
                FROM ev JOIN s2 USING (user_id)
                WHERE event_type = 'purchase' AND us > t2 AND us <= t1 + 86400000000
                GROUP BY ev.user_id),
         u AS (SELECT DISTINCT user_id FROM ev),
         l AS (SELECT u.user_id,
                      CASE WHEN s3.user_id IS NOT NULL THEN 3
                           WHEN s2.user_id IS NOT NULL THEN 2
                           WHEN s1.user_id IS NOT NULL THEN 1
                           ELSE 0 END AS level
               FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                      LEFT JOIN s3 USING (user_id))
         SELECT level, count(*) AS n_users FROM l GROUP BY level ORDER BY level""",

    "q68_dwell_percentiles" ->
      """WITH l AS (
           SELECT event_type, epoch_us(ts) AS us,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_us
           FROM events),
         g AS (SELECT event_type, next_us - us AS dwell_us
               FROM l WHERE next_us IS NOT NULL)
         SELECT event_type, count(*) AS n_stays,
                floor(quantile_cont(dwell_us, 0.5)*100 + 0.5)/100 AS p50_dwell_us,
                floor(quantile_cont(dwell_us, 0.9)*100 + 0.5)/100 AS p90_dwell_us,
                floor(quantile_cont(dwell_us, 0.99)*100 + 0.5)/100 AS p99_dwell_us
         FROM g GROUP BY event_type ORDER BY event_type""",

    "q69_ewma_volume" ->
      """WITH d AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         w AS (
           SELECT a.event_type, a.day,
                  CAST(sum(b.n_events *
                    (CAST(1 AS BIGINT) << (15 - date_diff('day', b.day, a.day))))
                    AS BIGINT) AS wsum
           FROM d a JOIN d b
             ON a.event_type = b.event_type
            AND b.day <= a.day AND b.day >= a.day - 15
           GROUP BY a.event_type, a.day)
         SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n_events,
                floor((w.wsum / 65535.0)*10000 + 0.5)/10000 AS ewma
         FROM d JOIN w ON d.event_type = w.event_type AND d.day = w.day
         ORDER BY d.event_type, d.day""",

    "q70_touch_attribution" ->
      """WITH p AS (
           SELECT event_id AS pid, user_id, epoch_us(ts) AS p_us,
                  CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
         t AS (SELECT user_id, epoch_us(ts) AS t_us, event_id AS tid, event_type
               FROM events WHERE event_type <> 'purchase'),
         j AS (SELECT p.pid, p.cents, t.event_type, t.t_us, t.tid
               FROM p JOIN t ON p.user_id = t.user_id
                AND t.t_us < p.p_us AND t.t_us >= p.p_us - 604800000000),
         per AS (
           SELECT pid, cents,
                  first(event_type ORDER BY t_us, tid) AS first_tt,
                  last(event_type ORDER BY t_us, tid) AS last_tt
           FROM j GROUP BY pid, cents),
         f AS (SELECT first_tt AS touch_type, count(*) AS n_first,
                      CAST(sum(cents) AS BIGINT) AS rev_first_cents
               FROM per GROUP BY first_tt),
         l AS (SELECT last_tt AS touch_type, count(*) AS n_last,
                      CAST(sum(cents) AS BIGINT) AS rev_last_cents
               FROM per GROUP BY last_tt)
         SELECT touch_type,
                coalesce(n_first, 0) AS n_first,
                coalesce(rev_first_cents, 0) AS rev_first_cents,
                coalesce(n_last, 0) AS n_last,
                coalesce(rev_last_cents, 0) AS rev_last_cents
         FROM f FULL OUTER JOIN l USING (touch_type)
         ORDER BY touch_type""",

    "t32_rake_keyphrases" ->
      """WITH d AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents
           WHERE len(string_split_regex(lower(trim(text)), '\s+')) > 0),
         tk AS (
           SELECT doc_id,
                  unnest(generate_series(1, len(toks))) AS pos,
                  unnest(toks) AS w
           FROM d),
         sg AS (
           SELECT doc_id, pos, w,
                  (w IN ('the','a','of','and','is')) AS is_stop,
                  sum(CASE WHEN w IN ('the','a','of','and','is')
                           THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS phrase_id
           FROM tk),
         ph AS (
           SELECT doc_id, phrase_id,
                  string_agg(w, ' ' ORDER BY pos) AS phrase,
                  list(w ORDER BY pos) AS words,
                  count(*) AS len
           FROM sg WHERE NOT is_stop GROUP BY doc_id, phrase_id),
         ws AS (
           SELECT w, count(*) AS freq, CAST(sum(len) AS BIGINT) AS degree
           FROM (SELECT unnest(words) AS w, len FROM ph)
           GROUP BY w),
         sc AS (
           SELECT pw.doc_id, pw.phrase_id, pw.phrase,
                  floor(sum(CAST(ws.degree AS DOUBLE) / ws.freq
                            ORDER BY ws.w)*10000 + 0.5)/10000 AS score
           FROM (SELECT doc_id, phrase_id, phrase, unnest(words) AS pw_w
                 FROM ph) pw
           JOIN ws ON ws.w = pw.pw_w
           GROUP BY pw.doc_id, pw.phrase_id, pw.phrase),
         rk AS (
           SELECT doc_id, phrase, score,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, phrase) AS rnk
           FROM sc)
         SELECT doc_id, rnk, phrase, score FROM rk
         WHERE rnk <= 3 ORDER BY doc_id, rnk""",

    "q72_basket_affinity" ->
      """WITH bk AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM bk),
         pc AS (SELECT l_partkey, count(*) AS n_part FROM bk GROUP BY l_partkey),
         pr AS (
           SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  count(*) AS n_both
           FROM bk a JOIN bk b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
           GROUP BY a.l_partkey, b.l_partkey
           HAVING count(*) >= 3)
         SELECT part_a, part_b, n_both,
                pa.n_part AS n_a, pb.n_part AS n_b,
                floor((n_both*1.0 / n.n_orders)*1000000 + 0.5)/1000000 AS support,
                floor((n_both*1.0 / pa.n_part)*10000 + 0.5)/10000 AS conf_a_to_b,
                floor((n_both*1.0 / pb.n_part)*10000 + 0.5)/10000 AS conf_b_to_a,
                floor(((n_both*1.0*n.n_orders) / (pa.n_part*1.0*pb.n_part))*10000 + 0.5)/10000
                  AS lift
         FROM pr JOIN pc pa ON pa.l_partkey = part_a
                 JOIN pc pb ON pb.l_partkey = part_b
                 CROSS JOIN n
         ORDER BY part_a, part_b""",

    "q71_rfm_segments" ->
      """WITH p AS (
           SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
                  count(*) AS frequency,
                  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
                    AS monetary_cents
           FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         b AS (
           SELECT user_id,
                  CAST(date_diff('day', last_day,
                    (SELECT max(last_day) FROM p)) AS BIGINT) AS recency_days,
                  frequency, monetary_cents
           FROM p),
         r AS (
           SELECT b.*,
                  row_number() OVER (ORDER BY recency_days, user_id) AS rr,
                  row_number() OVER (ORDER BY frequency, user_id) AS rf,
                  row_number() OVER (ORDER BY monetary_cents, user_id) AS rm,
                  count(*) OVER () AS n FROM b),
         s AS (
           SELECT user_id, recency_days, frequency, monetary_cents,
                  5 - ((rr - 1) * 5) // n AS r_score,
                  1 + ((rf - 1) * 5) // n AS f_score,
                  1 + ((rm - 1) * 5) // n AS m_score
           FROM r)
         SELECT user_id, recency_days, frequency, monetary_cents,
                CAST(r_score AS BIGINT) AS r_score,
                CAST(f_score AS BIGINT) AS f_score,
                CAST(m_score AS BIGINT) AS m_score,
                CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                     WHEN r_score >= 4 THEN 'recent'
                     WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                     WHEN r_score <= 2 AND f_score <= 2 THEN 'lost'
                     ELSE 'regular' END AS segment
         FROM s ORDER BY user_id""",

    "q66_bounce_rate" ->
      """WITH l AS (
           SELECT user_id, event_id, event_type,
                  epoch_ms(ts) AS cur_ms, epoch_us(ts) AS cur_us,
                  lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev_ms
           FROM events),
         s AS (
           SELECT user_id, event_id, event_type, cur_us,
                  sum(CASE WHEN prev_ms IS NULL OR cur_ms - prev_ms > 1800000
                           THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY cur_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
           FROM l),
         g AS (
           SELECT user_id, session_id,
                  first(event_type ORDER BY cur_us, event_id) AS entry_type,
                  count(*) AS n_ev
           FROM s GROUP BY user_id, session_id)
         SELECT entry_type, count(*) AS n_sessions,
                CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_bounced,
                floor((sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)*1.0/count(*))*10000 + 0.5)/10000
                  AS bounce_rate
         FROM g GROUP BY entry_type ORDER BY entry_type""",

    "q67_volume_autocorr" ->
      """WITH d AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         p AS (
           SELECT a.event_type, a.n AS x, b.n AS y
           FROM d a JOIN d b
             ON a.event_type = b.event_type AND b.day = a.day + 1),
         g AS (
           SELECT event_type, count(*) AS n_pairs,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x*y) AS BIGINT) AS sxy,
                  CAST(sum(x*x) AS BIGINT) AS sxx,
                  CAST(sum(y*y) AS BIGINT) AS syy
           FROM p GROUP BY event_type)
         SELECT event_type, n_pairs,
                CASE WHEN n_pairs >= 3 AND (n_pairs*sxx - sx*sx) > 0
                          AND (n_pairs*syy - sy*sy) > 0 THEN
                  floor((sign(CAST(n_pairs*sxy - sx*sy AS DOUBLE)) *
                         (CAST(n_pairs*sxy - sx*sy AS DOUBLE)
                          * CAST(n_pairs*sxy - sx*sy AS DOUBLE))
                         / (CAST(n_pairs*sxx - sx*sx AS DOUBLE)
                            * CAST(n_pairs*syy - sy*sy AS DOUBLE)))*10000 + 0.5)/10000
                END AS r2_lag1
         FROM g ORDER BY event_type""",

    "q64_type_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
         s AS (SELECT event_type, count(*) AS n FROM tu GROUP BY event_type),
         p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                      count(*) AS n_users_both
               FROM tu a JOIN tu b USING (user_id)
               WHERE a.event_type < b.event_type
               GROUP BY a.event_type, b.event_type)
         SELECT type_a, type_b, sa.n AS n_users_a, sb.n AS n_users_b,
                n_users_both,
                floor((n_users_both*1.0/(sa.n + sb.n - n_users_both))*10000 + 0.5)/10000
                  AS jaccard
         FROM p JOIN s sa ON sa.event_type = type_a
                JOIN s sb ON sb.event_type = type_b
         ORDER BY type_a, type_b""",

    "q62_ohlc_downsample" ->
      """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                first(value ORDER BY ts, event_id) AS open,
                max(value) AS high, min(value) AS low,
                last(value ORDER BY ts, event_id) AS close,
                count(*) AS volume
         FROM events GROUP BY event_type, CAST(ts AS DATE)
         ORDER BY event_type, day""",

    "q63_conversion_lag" ->
      """WITH f AS (SELECT user_id, min(epoch_us(ts)) AS t_from
                    FROM events WHERE event_type = 'click' GROUP BY user_id),
         t AS (SELECT user_id, min(epoch_us(ts)) AS t_to
               FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         l AS (SELECT t_to - t_from AS lag_us
               FROM f JOIN t USING (user_id) WHERE t_to > t_from)
         SELECT count(*) AS n_converted,
                floor(quantile_cont(lag_us, 0.5)*100 + 0.5)/100 AS p50_lag_us,
                floor(quantile_cont(lag_us, 0.9)*100 + 0.5)/100 AS p90_lag_us,
                floor(quantile_cont(lag_us, 0.99)*100 + 0.5)/100 AS p99_lag_us,
                floor((CAST(sum(lag_us) AS DOUBLE)/CAST(count(*) AS DOUBLE))*10000 + 0.5)/10000
                  AS mean_lag_us
         FROM l""",

    "q61_hourly_profile" ->
      """WITH h AS (
           SELECT event_type, hour(ts) AS hour, count(*) AS n_events
           FROM events GROUP BY event_type, hour(ts))
         SELECT event_type, hour, n_events,
                floor((n_events*1.0
                       / sum(n_events) OVER (PARTITION BY event_type))*10000 + 0.5)/10000
                  AS share,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY n_events DESC, hour) AS rnk
         FROM h ORDER BY event_type, hour""",

    "q60_event_anomaly" ->
      """WITH d AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         m AS (SELECT event_type, quantile_cont(n_events, 0.5) AS med
               FROM d GROUP BY event_type),
         dv AS (SELECT d.*, med, abs(n_events - med) AS adev
                FROM d JOIN m USING (event_type)),
         md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                FROM dv GROUP BY event_type)
         SELECT dv.event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
                med, mad,
                CASE WHEN mad > 0 THEN
                  floor(((n_events - med)/(1.4826*mad))*10000 + 0.5)/10000
                END AS robust_z,
                CASE WHEN mad > 0 THEN abs((n_events - med)/(1.4826*mad)) > 3.0
                     ELSE n_events <> med END AS is_anomaly
         FROM dv JOIN md USING (event_type)
         ORDER BY event_type, day""",

    "q43_period_delta" ->
      """WITH d AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         l AS (
           SELECT event_type, day, n_events,
                  lag(n_events) OVER (PARTITION BY event_type ORDER BY day) AS prev_events
           FROM d)
         SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events, prev_events,
                n_events - prev_events AS delta,
                floor(((n_events - prev_events) * 1.0 / prev_events) * 10000 + 0.5) / 10000
                  AS pct_change
         FROM l ORDER BY event_type, day""",

    // the global running sum IS the oracle's formulation; the Spark
    // side computes the same sweep hierarchically (within-day window +
    // day-level offsets). Both engines' default window frame is the
    // peer-inclusive RANGE ... CURRENT ROW, and starts sort before
    // ends at equal timestamps (delta DESC), so the peak is
    // permutation-independent.
    "q44_peak_concurrency" ->
      """WITH l AS (
           SELECT user_id, event_id, epoch_ms(ts) AS cur_ms, epoch_us(ts) AS cur_us,
                  lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
           FROM events),
         s AS (
           SELECT user_id, cur_us,
                  sum(CASE WHEN prev_ms IS NULL OR cur_ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY cur_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
           FROM l),
         iv AS (
           SELECT user_id, session_id, min(cur_us) AS start_us, max(cur_us) AS end_us
           FROM s GROUP BY user_id, session_id),
         b AS (
           SELECT start_us AS t_us, 1 AS delta FROM iv
           UNION ALL
           SELECT end_us AS t_us, -1 AS delta FROM iv),
         r AS (
           SELECT t_us, delta,
                  sum(delta) OVER (ORDER BY t_us, delta DESC) AS open_now
           FROM b)
         SELECT strftime(CAST(make_timestamp(t_us) AS DATE), '%Y-%m-%d') AS day,
                CAST(max(open_now) AS BIGINT) AS peak_concurrent,
                CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS sessions_started
         FROM r GROUP BY 1 ORDER BY day""",

    // the range-join formulation is the oracle's; the Spark side
    // fans each (day, user) pair out to its <=7 report days instead
    // (equi key, no nested-loop join)
    "q45_rolling_distinct" ->
      """WITH pairs AS (
           SELECT DISTINCT CAST(ts AS DATE) AS a_day, user_id FROM events),
         days AS (SELECT DISTINCT a_day AS day FROM pairs)
         SELECT strftime(d.day, '%Y-%m-%d') AS day,
                count(DISTINCT p.user_id) AS uniq_win,
                count(DISTINCT CASE WHEN p.a_day = d.day THEN p.user_id END) AS uniq_day
         FROM pairs p JOIN days d
           ON p.a_day <= d.day AND p.a_day >= d.day - 6
         GROUP BY d.day ORDER BY day""",

    "q42_funnel_steps" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
         s1 AS (SELECT user_id, min(us) AS t1 FROM ev
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT ev.user_id, min(t1) AS t1, min(us) AS t2
                FROM ev JOIN s1 USING (user_id)
                WHERE event_type = 'click' AND us > t1 AND us <= t1 + 43200000000
                GROUP BY ev.user_id),
         s3 AS (SELECT ev.user_id, min(t1) AS t1, min(us) AS t3
                FROM ev JOIN s2 USING (user_id)
                WHERE event_type = 'signup' AND us > t2 AND us <= t1 + 43200000000
                GROUP BY ev.user_id),
         s4 AS (SELECT ev.user_id, min(us) AS t4
                FROM ev JOIN s3 USING (user_id)
                WHERE event_type = 'purchase' AND us > t3 AND us <= t1 + 43200000000
                GROUP BY ev.user_id),
         u AS (SELECT DISTINCT user_id FROM ev),
         l AS (SELECT u.user_id,
                      CASE WHEN s4.user_id IS NOT NULL THEN 4
                           WHEN s3.user_id IS NOT NULL THEN 3
                           WHEN s2.user_id IS NOT NULL THEN 2
                           WHEN s1.user_id IS NOT NULL THEN 1
                           ELSE 0 END AS level
               FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                      LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id))
         SELECT level, count(*) AS n_users FROM l GROUP BY level ORDER BY level""",

    "m05_payload_dedup" ->
      """SELECT min(doc_id) AS keep_doc_id, sha256(text) AS payload_sha,
         count(*) AS n_copies,
         (count(*) - 1) * max(octet_length(encode(text))) AS bytes_saved
         FROM documents GROUP BY sha256(text) ORDER BY keep_doc_id""",

    // t36: the header/footer wrap mirrors the SparkEntry binding;
    // reassembly is string_agg ORDER BY position ≡ Spark's
    // position-sorted array_join
    "t36_boilerplate_scrub" ->
      """WITH docs AS (
           SELECT doc_id, source,
                  'HEADER: ACME CRAWL' || chr(10) || text || chr(10)
                    || 'footer terms apply' AS text
           FROM documents),
         l AS (
           SELECT doc_id, source, unnest(ls) AS line,
                  generate_subscripts(ls, 1) AS pos
           FROM (SELECT doc_id, source, string_split(text, chr(10)) AS ls
                 FROM docs)),
         b AS (
           SELECT source, trim(line) AS bkey
           FROM (SELECT DISTINCT source, trim(line) AS line, doc_id
                 FROM l WHERE length(trim(line)) >= 5)
           GROUP BY source, trim(line) HAVING count(*) >= 3),
         k AS (
           SELECT l.doc_id, l.pos, l.line,
                  (b.bkey IS NOT NULL) AS is_boiler
           FROM l LEFT JOIN b
             ON l.source = b.source AND trim(l.line) = b.bkey)
         SELECT doc_id, count(*) AS n_lines,
                CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_boiler_lines,
                coalesce(string_agg(CASE WHEN NOT is_boiler THEN line END,
                  chr(10) ORDER BY pos), '') AS clean_text
         FROM k GROUP BY doc_id ORDER BY doc_id""",

    // t35: the planted-code union mirrors the SparkEntry binding
    // exactly; counts via the same length-replace recipe, the one
    // division is integer/integer in double on both engines
    "t35_code_detect" ->
      """WITH docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 3000000,
                  'def main(args): { return os.path.join(a, b); } // x => y && z'
           FROM documents WHERE doc_id % 40 = 0),
         c AS (
           SELECT doc_id, length(text) AS n_chars,
                  (length(text) - length(replace(text, '{', '')))
                + (length(text) - length(replace(text, '}', '')))
                + (length(text) - length(replace(text, ';', '')))
                + (length(text) - length(replace(text, '(', '')))
                + (length(text) - length(replace(text, ')', '')))
                + (length(text) - length(replace(text, '=', '')))
                + (length(text) - length(replace(text, '<', '')))
                + (length(text) - length(replace(text, '>', '')))
                + (length(text) - length(replace(text, '[', '')))
                + (length(text) - length(replace(text, ']', '')))
                + (length(text) - length(replace(text, '#', ''))) AS n_symbols,
                  (length(p) - length(replace(p, ' def ', ''))) // 5
                + (length(p) - length(replace(p, ' return ', ''))) // 8
                + (length(p) - length(replace(p, ' import ', ''))) // 8
                + (length(p) - length(replace(p, ' void ', ''))) // 6
                + (length(p) - length(replace(p, ' function ', ''))) // 10
                + (length(p) - length(replace(p, '#include', ''))) // 8
                + (length(p) - length(replace(p, ' class ', ''))) // 7
                + (length(p) - length(replace(p, '=>', ''))) // 2
                + (length(p) - length(replace(p, '&&', ''))) // 2
                + (length(p) - length(replace(p, '||', ''))) // 2
                + (length(p) - length(replace(p, '();', ''))) // 3 AS n_keywords
           FROM (SELECT doc_id, text, ' ' || text || ' ' AS p FROM docs)),
         s AS (
           SELECT doc_id, n_chars, n_symbols, n_keywords,
                  floor((CAST(n_symbols AS DOUBLE)*1000.0
                         /CAST(n_chars AS DOUBLE))*10000 + 0.5)/10000
                    AS sym_per_kchar
           FROM c)
         SELECT doc_id, n_chars, n_symbols, n_keywords, sym_per_kchar,
                CASE WHEN sym_per_kchar >= 30.0 OR n_keywords >= 2
                     THEN 'code' ELSE 'prose' END AS verdict
         FROM s ORDER BY doc_id""",

    "t34_kwic" ->
      """WITH d AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         tc AS (
           SELECT term FROM (
             SELECT unnest(toks) AS term FROM d) u
           WHERE term NOT IN ('the','a','of','and','is') AND term <> ''
           GROUP BY term ORDER BY count(*) DESC, term LIMIT 3),
         h AS (
           SELECT doc_id, toks, unnest(toks) AS tok,
                  generate_subscripts(toks, 1) AS p1
           FROM d)
         SELECT h.doc_id, CAST(h.p1 - 1 AS INT) AS pos, tc.term,
                -- list_slice yields NULL (not []) when begin exceeds the
                -- list; Spark's slice yields [] — coalesce to ''
                coalesce(array_to_string(list_slice(h.toks,
                  greatest(h.p1 - 3, 1), h.p1 - 1), ' '), '') AS left_ctx,
                coalesce(array_to_string(
                  list_slice(h.toks, h.p1 + 1, h.p1 + 3), ' '), '') AS right_ctx
         FROM h JOIN tc ON h.tok = tc.term
         ORDER BY doc_id, pos, term""",

    // q73: per-column canonical renderings — integrals as decimal
    // strings, doubles under the cents protocol, timestamps via
    // strftime — so one VARCHAR pair carries every column's extrema
    "q73_dq_profile" ->
      """SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
                CAST(min(o_orderkey) AS VARCHAR) AS min_repr,
                CAST(max(o_orderkey) AS VARCHAR) AS max_repr
         FROM orders
         UNION ALL
         SELECT 'o_custkey', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(o_custkey) AS BIGINT),
                CAST(count(DISTINCT o_custkey) AS BIGINT),
                CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
         FROM orders
         UNION ALL
         SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(o_orderstatus) AS BIGINT),
                CAST(count(DISTINCT o_orderstatus) AS BIGINT),
                min(o_orderstatus), max(o_orderstatus)
         FROM orders
         UNION ALL
         SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(o_totalprice) AS BIGINT),
                CAST(count(DISTINCT o_totalprice) AS BIGINT),
                CAST(CAST(floor(min(o_totalprice)*100 + 0.5) AS BIGINT) AS VARCHAR),
                CAST(CAST(floor(max(o_totalprice)*100 + 0.5) AS BIGINT) AS VARCHAR)
         FROM orders
         UNION ALL
         SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(o_orderdate) AS BIGINT),
                CAST(count(DISTINCT o_orderdate) AS BIGINT),
                strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
                strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
         FROM orders
         UNION ALL
         SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(o_orderpriority) AS BIGINT),
                CAST(count(DISTINCT o_orderpriority) AS BIGINT),
                min(o_orderpriority), max(o_orderpriority)
         FROM orders
         ORDER BY col_name""",

    // q74: violations formulated exactly as the Spark checks — row
    // predicates as conditional sums, uniqueness as rows − groups
    // (GROUP BY null semantics, not COUNT DISTINCT's), RI as
    // not-exists, the cross-table rule over the inner join
    "q74_dq_constraints" ->
      """WITH v AS (
           SELECT 'orders_totalprice_positive' AS check_name,
                  CAST(count(*) AS BIGINT) AS checked,
                  CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
                    AS violations
           FROM orders
           UNION ALL
           SELECT 'orders_status_domain', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END)
                    AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'lineitem_quantity_range', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                           THEN 0 ELSE 1 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN l_discount >= 0
                                 AND l_discount <= CAST(0.1 AS DOUBLE)
                           THEN 0 ELSE 1 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'orders_orderkey_unique',
                  CAST((SELECT count(*) FROM orders) AS BIGINT),
                  CAST((SELECT count(*) FROM orders)
                       - (SELECT count(*) FROM
                           (SELECT DISTINCT o_orderkey FROM orders) g) AS BIGINT)
           UNION ALL
           SELECT 'lineitem_line_unique',
                  CAST((SELECT count(*) FROM lineitem) AS BIGINT),
                  CAST((SELECT count(*) FROM lineitem)
                       - (SELECT count(*) FROM
                           (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem) g)
                    AS BIGINT)
           UNION ALL
           SELECT 'lineitem_orderkey_ri',
                  CAST((SELECT count(*) FROM lineitem) AS BIGINT),
                  CAST((SELECT count(*) FROM lineitem l
                        WHERE NOT EXISTS (SELECT 1 FROM orders o
                                          WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
           UNION ALL
           SELECT 'lineitem_ship_after_order',
                  CAST((SELECT count(*) FROM lineitem l
                        JOIN orders o ON l.l_orderkey = o.o_orderkey) AS BIGINT),
                  CAST((SELECT count(*) FROM lineitem l
                        JOIN orders o ON l.l_orderkey = o.o_orderkey
                        WHERE NOT (l.l_shipdate >= o.o_orderdate)) AS BIGINT))
         SELECT check_name, checked, violations,
                CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
         FROM v ORDER BY check_name""",

    "q75_cohort_revenue" ->
      """WITH o AS (
           SELECT o_custkey, date_trunc('month', o_orderdate) AS om,
                  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         a AS (SELECT o_custkey, min(om) AS cohort FROM o GROUP BY o_custkey)
         SELECT strftime(a.cohort, '%Y-%m') AS cohort_month,
                CAST(date_diff('month', a.cohort, o.om) AS INT) AS month_offset,
                CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
                CAST(sum(o.cents) AS BIGINT) AS rev_cents,
                CAST(sum(o.cents) AS DOUBLE)/100.0 AS revenue
         FROM o JOIN a USING (o_custkey)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // q78: CUSUM — median/MAD via quantile_cont (≡ the exact
    // interpolated percentile machinery), then the same sequential
    // recurrence protocol as q76/q77; the shifted flag compares the
    // ROUNDED cusum columns (the m11 display-consistency rule)
    "q78_cusum_shift" ->
      """WITH RECURSIVE
         d AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1),
         m AS (SELECT quantile_cont(n_events, 0.5) AS med FROM d),
         md AS (SELECT quantile_cont(abs(n_events - med), 0.5) AS mad FROM d, m),
         o AS (SELECT day, n_events, med, mad,
                      row_number() OVER (ORDER BY day) AS rn
               FROM d, m, md),
         c(rn, day, n_events, med, mad, sp, sn) AS (
           SELECT rn, day, n_events, med, mad,
                  greatest(CAST(0 AS DOUBLE), (CAST(n_events AS DOUBLE) - med - mad/2)),
                  greatest(CAST(0 AS DOUBLE), (med - CAST(n_events AS DOUBLE) - mad/2))
           FROM o WHERE rn = 1
           UNION ALL
           SELECT o.rn, o.day, o.n_events, o.med, o.mad,
                  greatest(CAST(0 AS DOUBLE),
                    c.sp + (CAST(o.n_events AS DOUBLE) - o.med - o.mad/2)),
                  greatest(CAST(0 AS DOUBLE),
                    c.sn + (o.med - CAST(o.n_events AS DOUBLE) - o.mad/2))
           FROM c JOIN o ON o.rn = c.rn + 1),
         r AS (SELECT day, n_events, med, mad,
                      floor(sp*10000 + 0.5)/10000 AS cusum_up,
                      floor(sn*10000 + 0.5)/10000 AS cusum_down
               FROM c)
         SELECT strftime(day, '%Y-%m-%d') AS day, n_events, cusum_up, cusum_down,
                (cusum_up > 5.0*mad OR cusum_down > 5.0*mad) AS shifted
         FROM r ORDER BY day""",

    // q77: Holt — same sequential-recurrence protocol as q76: the
    // recursive CTE applies the dyadic update in ascending-day order,
    // bit-identical to Spark's window-ordered prefix fold
    "q77_holt_trend" ->
      """WITH RECURSIVE
         d AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1),
         o AS (SELECT day, n_events, row_number() OVER (ORDER BY day) AS rn FROM d),
         h(rn, day, n_events, l, b) AS (
           SELECT rn, day, n_events, CAST(n_events AS DOUBLE), CAST(0 AS DOUBLE)
           FROM o WHERE rn = 1
           UNION ALL
           SELECT o.rn, o.day, o.n_events,
                  0.5 * CAST(o.n_events AS DOUBLE) + 0.5 * (h.l + h.b),
                  0.5 * ((0.5 * CAST(o.n_events AS DOUBLE) + 0.5 * (h.l + h.b)) - h.l)
                    + 0.5 * h.b
           FROM h JOIN o ON o.rn = h.rn + 1)
         SELECT strftime(day, '%Y-%m-%d') AS day, n_events,
                floor(l*10000 + 0.5)/10000 AS level,
                floor(b*10000 + 0.5)/10000 AS trend,
                floor((l+b)*10000 + 0.5)/10000 AS forecast_next
         FROM h ORDER BY day""",

    // q76: Kaplan–Meier — the recursive CTE multiplies each day's
    // (n_risk − d)/n_risk factor in ASCENDING day order, the exact
    // operation sequence of the Spark side's window-ordered fold, so
    // the survival doubles are bit-identical before the cosmetic round
    "q76_survival_curve" ->
      """WITH RECURSIVE
         f AS (SELECT user_id, min(epoch_us(ts)) AS t_from
               FROM events WHERE event_type = 'click' GROUP BY user_id),
         t AS (SELECT user_id, min(epoch_us(ts)) AS t_to
               FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         h AS (SELECT max(epoch_us(ts)) AS horizon FROM events),
         subj AS (
           SELECT CASE WHEN t.t_to IS NOT NULL
                       THEN (t.t_to - f.t_from) // 86400000000
                       ELSE (h.horizon - f.t_from) // 86400000000 END AS dur_day,
                  CASE WHEN t.t_to IS NOT NULL THEN 1 ELSE 0 END AS conv
           FROM f LEFT JOIN t USING (user_id) CROSS JOIN h
           WHERE t.t_to IS NULL OR t.t_to > f.t_from),
         daily AS (SELECT dur_day, CAST(sum(conv) AS BIGINT) AS d,
                          CAST(count(*) AS BIGINT) AS total_at
                   FROM subj GROUP BY dur_day),
         risk AS (SELECT dur_day, d, total_at,
                         CAST((SELECT count(*) FROM subj)
                           - coalesce(sum(total_at) OVER (ORDER BY dur_day
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS BIGINT) AS n_risk,
                         row_number() OVER (ORDER BY dur_day) AS rn
                  FROM daily),
         km(rn, dur_day, d, total_at, n_risk, s) AS (
           SELECT rn, dur_day, d, total_at, n_risk,
                  CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)
           FROM risk WHERE rn = 1
           UNION ALL
           SELECT r.rn, r.dur_day, r.d, r.total_at, r.n_risk,
                  km.s * (CAST(r.n_risk - r.d AS DOUBLE) / CAST(r.n_risk AS DOUBLE))
           FROM km JOIN risk r ON r.rn = km.rn + 1)
         SELECT dur_day, n_risk, d AS n_events,
                total_at - d AS n_censored,
                floor(s*10000 + 0.5)/10000 AS survival
         FROM km ORDER BY dur_day"""
  )

  /** d02 and d03 share one oracle: LSH + exact verification must equal
    * the exact all-pairs computation at the same threshold. */
  private val ngramJaccardSql =
    """WITH t AS (
         SELECT doc_id,
                list_distinct([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, len(toks)-1)]) AS sh
         FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
               FROM documents)
         WHERE len(toks) >= 3),
       e AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS shingle FROM t),
       p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.nsh AS na, b.nsh AS nb, count(*) AS shared
             FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
       SELECT doc_a, doc_b,
              floor((shared*1.0/(na+nb-shared))*10000 + 0.5)/10000 AS jaccard
       FROM p WHERE shared*1.0/(na+nb-shared) >= 0.8
       ORDER BY doc_a, doc_b"""

  /** d11: the exact cross-side Jaccard (batch = src0 docs, corpus =
    * the rest) — the asymmetric-LSH path must reproduce it exactly,
    * the d02=d03 equality argument applied to the incremental shape. */
  /** d20/d21: cross-side directional containment (batch = src0);
    * shingle STRINGS stand in for the 64-bit hashes (d09/d11
    * convention) and the plain cross join is the oracle — prefix
    * recall is exact on the live side, and the at-rest probe is
    * result-identical to it. */
  private val containmentAgainstSql =
    """WITH t AS (
         SELECT doc_id, source,
                list_distinct([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, len(toks)-1)]) AS sh
         FROM (SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS toks
               FROM documents)
         WHERE len(toks) >= 3),
       e AS (SELECT doc_id, source, len(sh) AS nsh, unnest(sh) AS shingle FROM t),
       p AS (SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc,
                    a.nsh AS nsh, count(*) AS shared
             FROM e a JOIN e b ON a.shingle = b.shingle
              AND a.source = 'src0' AND b.source <> 'src0'
             GROUP BY 1, 2, 3)
       SELECT new_doc, corpus_doc, shared, nsh,
              floor((shared/nsh)*10000 + 0.5)/10000 AS containment
       FROM p WHERE nsh >= 5 AND shared/nsh >= 0.8
       ORDER BY new_doc, corpus_doc"""

  private val dedupAgainstSql =
    """WITH t AS (
         SELECT doc_id, source,
                list_distinct([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, len(toks)-1)]) AS sh
         FROM (SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS toks
               FROM documents)
         WHERE len(toks) >= 3),
       e AS (SELECT doc_id, source, len(sh) AS nsh, unnest(sh) AS shingle FROM t),
       p AS (SELECT a.doc_id AS new_doc, b.doc_id AS corpus_doc,
                    a.nsh AS na, b.nsh AS nb, count(*) AS shared
             FROM e a JOIN e b ON a.shingle = b.shingle
                                AND a.source = 'src0' AND b.source <> 'src0'
             GROUP BY 1, 2, 3, 4)
       SELECT new_doc, corpus_doc,
              floor((shared*1.0/(na+nb-shared))*10000 + 0.5)/10000 AS jaccard
       FROM p WHERE shared*1.0/(na+nb-shared) >= 0.8
       ORDER BY new_doc, corpus_doc"""

  /** d12/d15: d11's cross-side Jaccard plus the batch-internal leg,
    * rolled up to per-doc admission verdicts. */
  private val ingestAdmitSql =
    """WITH t AS (
         SELECT doc_id, source,
                list_distinct([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, len(toks)-1)]) AS sh
         FROM (SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS toks
               FROM documents)
         WHERE len(toks) >= 3),
       e AS (SELECT doc_id, source, len(sh) AS nsh, unnest(sh) AS shingle FROM t),
       cp AS (SELECT a.doc_id AS d, b.doc_id AS cdoc, a.nsh AS na, b.nsh AS nb,
                     count(*) AS shared
              FROM e a JOIN e b ON a.shingle = b.shingle
                                 AND a.source = 'src0' AND b.source <> 'src0'
              GROUP BY 1, 2, 3, 4),
       cdup AS (SELECT DISTINCT d AS doc_id FROM cp
                WHERE shared*1.0/(na+nb-shared) >= 0.8),
       bp AS (SELECT b.doc_id AS d, a.nsh AS na, b.nsh AS nb, count(*) AS shared
              FROM e a JOIN e b ON a.shingle = b.shingle
                                 AND a.source = 'src0' AND b.source = 'src0'
                                 AND a.doc_id < b.doc_id
              GROUP BY b.doc_id, a.doc_id, a.nsh, b.nsh),
       bdup AS (SELECT DISTINCT d AS doc_id FROM bp
                WHERE shared*1.0/(na+nb-shared) >= 0.8),
       batch AS (SELECT doc_id FROM documents WHERE source = 'src0')
       SELECT batch.doc_id,
              (cdup.doc_id IS NULL AND bdup.doc_id IS NULL) AS admitted,
              CASE WHEN cdup.doc_id IS NOT NULL THEN 'corpus_dup'
                   WHEN bdup.doc_id IS NOT NULL THEN 'batch_dup'
                   ELSE 'admitted' END AS reason
       FROM batch LEFT JOIN cdup USING (doc_id) LEFT JOIN bdup USING (doc_id)
       ORDER BY batch.doc_id"""

  /** a04 and a15 share one oracle: IVF search math is identical
    * whether the cell assignment is computed live (a04) or read back
    * from the saved index layout (a15's sink_ann_index +
    * ivfKnnIndexed). */
  private lazy val ivfKnnSql =
    s"""WITH $centroidBuildCte,
         nv AS (
           SELECT vec_id, [CAST(e AS DOUBLE) for e in embedding] AS vd,
                  sqrt(list_reduce(list_prepend(0.0,
                    [CAST(e AS DOUBLE)*CAST(e AS DOUBLE) for e in embedding]),
                    (a, b) -> a + b)) AS nrm
           FROM embeddings),
         simc AS (
           SELECT nv.vec_id, c.c_label,
                  list_reduce(list_prepend(0.0,
                      [nv.vd[i] * CAST(c.centroid[i] AS DOUBLE) for i in range(1, 65)]),
                    (x, y) -> x + y)
                  / (nv.nrm * sqrt(list_reduce(list_prepend(0.0,
                       [CAST(e AS DOUBLE)*CAST(e AS DOUBLE) for e in c.centroid]),
                       (x, y) -> x + y))) AS sim
           FROM nv CROSS JOIN c),
         rankc AS (
           SELECT vec_id, c_label,
                  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_label) AS rn
           FROM simc),
         cand AS (SELECT vec_id, c_label FROM rankc WHERE rn = 1 AND vec_id >= 10),
         qry AS (SELECT vec_id, c_label FROM rankc WHERE rn <= 2 AND vec_id < 10),
         scored AS (
           SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
                  list_reduce(list_prepend(0.0,
                      [qv.vd[i] * av.vd[i] for i in range(1, 65)]),
                    (x, y) -> x + y) / (qv.nrm * av.nrm) AS sim
           FROM qry q
           JOIN cand a ON q.c_label = a.c_label
           JOIN nv qv ON qv.vec_id = q.vec_id
           JOIN nv av ON av.vec_id = a.vec_id),
         r AS (
           SELECT query_id, neighbor_id, sim,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
           FROM scored)
         SELECT query_id, neighbor_id,
                floor(sim*10000 + 0.5)/10000 AS cos_sim, rn
         FROM r WHERE rn <= 3 ORDER BY query_id, rn"""

  /** d05 and d06 share one oracle shape: candidates + exact cosine
    * verify must equal the brute-force pairs at the same threshold
    * (the d02/d03 pattern for embeddings). Parametric: d05 runs the
    * natural table at 0.5; d06's LSH-regime row runs at 0.75 over the
    * PLANTED union (the testdata has no natural pairs above cos 0.7,
    * so an id-offset copy of every vector plants cos=1.0 pairs the
    * banded LSH must recall — same construction on both engines). */
  private def embedDedupSql(threshold: Double, planted: Boolean): String = {
    val src =
      if (planted)
        """(SELECT vec_id, embedding FROM embeddings
            UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings)"""
      else "embeddings"
    s"""WITH v AS (
           SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vd
           FROM $src),
         n AS (
           SELECT vec_id, vd,
                  sqrt(list_reduce(list_prepend(0.0, [x*x for x in vd]),
                       (a, b) -> a + b)) AS nrm
           FROM v)
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                floor((list_reduce(list_prepend(0.0,
                        [a.vd[i]*b.vd[i] for i in range(1, 65)]),
                      (x, y) -> x + y) / (a.nrm*b.nrm))*10000 + 0.5)/10000 AS cos_sim
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE list_reduce(list_prepend(0.0,
                 [a.vd[i]*b.vd[i] for i in range(1, 65)]),
               (x, y) -> x + y) / (a.nrm*b.nrm) >= $threshold
         ORDER BY vec_a, vec_b"""
  }

  /** d10: the d02/d03 pair set rolled up to source pairs (unordered,
    * least/greatest-normalized). */
  private lazy val sourceOverlapSql =
    s"""WITH ndp AS (
          ${ngramJaccardSql.replace("ORDER BY doc_a, doc_b", "")}),
        srcs AS (SELECT doc_id, source FROM documents)
        SELECT least(sa.source, sb.source) AS source_a,
               greatest(sa.source, sb.source) AS source_b,
               count(*) AS n_pairs
        FROM ndp JOIN srcs sa ON ndp.doc_a = sa.doc_id
                 JOIN srcs sb ON ndp.doc_b = sb.doc_id
        GROUP BY source_a, source_b ORDER BY source_a, source_b"""

  /** Shared by d07/d08: cluster labels over the d02/d03 pair graph via
    * recursive transitive closure (pair graphs at verify scale are
    * tiny; Spark's resolution strategies must agree). */
  private val clusterLabelCtes =
    s"""WITH RECURSIVE ndpairs AS (
          ${ngramJaccardSql.replace("ORDER BY doc_a, doc_b", "")}),
        ndedges AS (SELECT doc_a AS ea, doc_b AS eb FROM ndpairs
                    UNION SELECT doc_b, doc_a FROM ndpairs),
        ndreach(ra, rb) AS (SELECT ea, eb FROM ndedges
                            UNION SELECT ndreach.ra, ndedges.eb
                                  FROM ndreach JOIN ndedges ON ndreach.rb = ndedges.ea),
        ndmin AS (SELECT ra AS doc_id, least(ra, min(rb)) AS cluster_id
                  FROM ndreach GROUP BY ra)"""

  private val dedupClustersSql =
    s"""$clusterLabelCtes
        SELECT d.doc_id,
               coalesce(ndmin.cluster_id, d.doc_id) AS cluster_id,
               (coalesce(ndmin.cluster_id, d.doc_id) = d.doc_id) AS is_canonical
        FROM documents d LEFT JOIN ndmin ON d.doc_id = ndmin.doc_id
        ORDER BY d.doc_id"""

  /** d08: keep-best materialization over the d07 labels — longest doc
    * survives (doc_id tiebreak), plus per-cluster reclaim stats. */
  private val dedupApplySql =
    s"""$clusterLabelCtes,
        lab AS (
          SELECT d.doc_id, coalesce(ndmin.cluster_id, d.doc_id) AS cluster_id, d.n_chars
          FROM documents d LEFT JOIN ndmin ON d.doc_id = ndmin.doc_id),
        rk AS (
          SELECT doc_id, cluster_id, n_chars,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY n_chars DESC, doc_id) AS rk
          FROM lab)
        SELECT cluster_id,
               max(CASE WHEN rk = 1 THEN doc_id END) AS survivor_id,
               count(*) AS n_docs,
               CAST(sum(n_chars) - max(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT)
                 AS chars_removed
        FROM rk GROUP BY cluster_id ORDER BY cluster_id"""

  /** Shared by the a03/a04/a06 oracles: per-label mean centroids with
    * the float cast that absorbs summation-order ulp noise (any change
    * to the centroid math lives HERE, once). */
  private val centroidBuildCte =
    """x AS (
         SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
         FROM embeddings),
       c AS (
         SELECT label AS c_label, list(CAST(cx AS FLOAT) ORDER BY pos) AS centroid
         FROM (SELECT label, pos, avg(v) AS cx FROM x GROUP BY label, pos)
         GROUP BY label)"""

  val pipeline: Map[String, String] = Map(
    "d07_dedup_clusters" -> dedupClustersSql,
    "d08_dedup_apply" -> dedupApplySql,

    "d01_exact_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt FROM documents
         GROUP BY text ORDER BY doc_id""",

    "d02_ngram_jaccard" -> ngramJaccardSql,
    "d03_minhash_lsh" -> ngramJaccardSql,

    // d18: directional containment over the same shingle universe as
    // d02 (shingle STRINGS stand in for Spark's 64-bit hashes — the
    // d09/d11 equality-only convention); each unordered pair feeds
    // both directions, filtered at containment >= 0.8 and nsh >= 5
    "d18_containment" ->
      """WITH t AS (
           SELECT doc_id,
                  list_distinct([array_to_string(toks[i:i+2], ' ')
                                 for i in range(1, len(toks)-1)]) AS sh
           FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                 FROM documents)
           WHERE len(toks) >= 3),
         e AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS shingle FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.nsh AS na, b.nsh AS nb, count(*) AS shared
               FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4),
         d AS (SELECT id_a AS doc_id, id_b AS in_doc, na AS nsh, shared FROM p
               UNION ALL
               SELECT id_b AS doc_id, id_a AS in_doc, nb AS nsh, shared FROM p)
         SELECT doc_id, in_doc, shared, nsh,
                floor((shared/nsh)*10000 + 0.5)/10000 AS containment
         FROM d WHERE nsh >= 5 AND shared/nsh >= 0.8
         ORDER BY doc_id, in_doc""",

    // d21 shares d20's oracle: the at-rest probe is result-identical
    // to the live containmentAgainst over the same corpus (the
    // d14/d15 convention)
    "d21_containment_probe_indexed" -> containmentAgainstSql,

    // d22: the dominance rule (larger set, then smaller id) is a
    // strict total order, so the windowed best-dominator spec below
    // equals Spark's struct-max fold; keep is a plain NULL test
    "d22_containment_apply" ->
      """WITH t AS (
           SELECT doc_id,
                  list_distinct([array_to_string(toks[i:i+2], ' ')
                                 for i in range(1, len(toks)-1)]) AS sh
           FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                 FROM documents)
           WHERE len(toks) >= 3),
         e AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS shingle FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.nsh AS na, b.nsh AS nb, count(*) AS shared
               FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4),
         d AS (SELECT id_a AS doc_id, id_b AS in_doc, na AS nsh, nb AS n_in, shared FROM p
               UNION ALL
               SELECT id_b AS doc_id, id_a AS in_doc, nb AS nsh, na AS n_in, shared FROM p),
         q AS (SELECT doc_id, in_doc, shared/nsh AS c FROM d
               WHERE nsh >= 5 AND shared/nsh >= 0.8
                 AND (n_in > nsh OR (n_in = nsh AND in_doc < doc_id))),
         best AS (SELECT doc_id, in_doc, c FROM (
                    SELECT doc_id, in_doc, c,
                           row_number() OVER (PARTITION BY doc_id
                             ORDER BY c DESC, in_doc) AS rn
                    FROM q) WHERE rn = 1)
         SELECT docs.doc_id, best.in_doc IS NULL AS keep,
                coalesce(best.in_doc, -1) AS kept_into,
                floor(coalesce(best.c, 0.0)*10000 + 0.5)/10000 AS containment
         FROM documents docs LEFT JOIN best ON docs.doc_id = best.doc_id
         ORDER BY docs.doc_id""",

    // d20: cross-side directional containment (batch = src0, the d11
    // convention); prefix recall is exact, so the plain cross join of
    // shingle strings IS the oracle
    "d20_containment_against" -> containmentAgainstSql,

    // d19 = d18 under prefix filtering — exact recall by the prefix
    // principle, so the same oracle (the d02/d03 twin convention)
    "d19_containment_prefix" ->
      """WITH t AS (
           SELECT doc_id,
                  list_distinct([array_to_string(toks[i:i+2], ' ')
                                 for i in range(1, len(toks)-1)]) AS sh
           FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                 FROM documents)
           WHERE len(toks) >= 3),
         e AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS shingle FROM t),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.nsh AS na, b.nsh AS nb, count(*) AS shared
               FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4),
         d AS (SELECT id_a AS doc_id, id_b AS in_doc, na AS nsh, shared FROM p
               UNION ALL
               SELECT id_b AS doc_id, id_a AS in_doc, nb AS nsh, shared FROM p)
         SELECT doc_id, in_doc, shared, nsh,
                floor((shared/nsh)*10000 + 0.5)/10000 AS containment
         FROM d WHERE nsh >= 5 AND shared/nsh >= 0.8
         ORDER BY doc_id, in_doc""",
    "d11_dedup_against" -> dedupAgainstSql,

    // d12: the same exact cross-side Jaccard as d11 plus a batch-
    // internal leg; shingle STRINGS stand in for Spark's 64-bit hashes
    // (the d11 convention). Sub-3-token batch docs carry no shingles,
    // cannot pair, and are admitted — both engines agree.
    // d14/d15 share d11's/d12's oracles: the at-rest probes
    // (sink_dedup_index + dedupAgainstIndex / ingestAdmitIndexed) are
    // result-identical to their live twins over the same corpus.
    "d12_ingest_admit" -> ingestAdmitSql,
    "d14_dedup_probe_indexed" -> dedupAgainstSql,
    "d15_ingest_admit_indexed" -> ingestAdmitSql,
    "d10_source_overlap" -> sourceOverlapSql,

    "d05_embed_dedup" -> embedDedupSql(0.5, planted = false),
    "d06_embed_dedup_lsh" -> embedDedupSql(0.75, planted = true),

    // d09: shingle EQUALITY is all that matters, so the oracle counts
    // shared 3-gram STRINGS where Spark counts shared 64-bit shingle
    // hashes — identical results absent a hash collision (~|sh|²/2^64)
    "d09_decontaminate" ->
      """WITH t AS (
           SELECT doc_id, source,
                  list_distinct([array_to_string(toks[i:i+2], ' ')
                                 for i in range(1, len(toks)-1)]) AS sh
           FROM (SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS toks
                 FROM documents)
           WHERE len(toks) >= 3),
         ev AS (SELECT DISTINCT unnest(sh) AS shingle FROM t WHERE source = 'src0'),
         corp AS (SELECT doc_id, sh FROM t WHERE source != 'src0'),
         sc AS (SELECT doc_id, count(*) AS n_shared
                FROM (SELECT doc_id, unnest(sh) AS shingle FROM corp) c
                JOIN ev USING (shingle)
                GROUP BY doc_id)
         SELECT corp.doc_id, coalesce(sc.n_shared, 0) AS n_shared,
                coalesce(sc.n_shared, 0) >= 8 AS contaminated
         FROM corp LEFT JOIN sc ON corp.doc_id = sc.doc_id
         ORDER BY corp.doc_id""",

    // SimHash is fully SQL-expressible with an engine-portable token
    // hash (top 60 bits of md5): per-bit +-1 sums over the distinct
    // token set, sign fold, 4x15-bit pigeonhole chunks, popcount.
    "d04_simhash" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS tok
           FROM documents),
         h AS (
           SELECT doc_id,
                  list_reduce(list_prepend(CAST(0 AS BIGINT),
                      [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
                       for c in string_split(substr(md5(tok), 1, 15), '')]),
                    (a, b) -> a * 16 + b) AS h
           FROM toks),
         b AS (
           SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
           FROM h, range(60) t(j) GROUP BY doc_id, j),
         fp AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
           FROM b GROUP BY doc_id),
         ch AS (
           SELECT doc_id, simhash, c, (simhash >> (c*15)) & 32767 AS cv
           FROM fp, range(4) t(c))
         SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
         FROM ch x JOIN ch y ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id
         WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         ORDER BY doc_a, doc_b""",

    // Nearest-centroid assignment: per-label float-cast mean centroids
    // (the float cast absorbs summation-order ulp noise), then argmax
    // cosine with the same sequential-double arithmetic as
    // graft_cosine and a c_label tiebreak.
    "a03_centroid_assign" ->
      s"""WITH $centroidBuildCte,
         n AS (
           SELECT vec_id, label, [CAST(e AS DOUBLE) for e in embedding] AS vd
           FROM embeddings),
         s AS (
           SELECT n.vec_id, n.label, c.c_label,
                  list_reduce(list_prepend(0.0,
                      [n.vd[i] * CAST(c.centroid[i] AS DOUBLE) for i in range(1, 65)]),
                    (x, y) -> x + y)
                  / (sqrt(list_reduce(list_prepend(0.0, [e*e for e in n.vd]), (x, y) -> x + y))
                     * sqrt(list_reduce(list_prepend(0.0,
                         [CAST(e AS DOUBLE)*CAST(e AS DOUBLE) for e in c.centroid]),
                       (x, y) -> x + y))) AS sim
           FROM n CROSS JOIN c),
         r AS (
           SELECT vec_id, label, c_label,
                  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_label) AS rn
           FROM s)
         SELECT vec_id, label, c_label AS assigned_label, (label = c_label) AS is_match
         FROM r WHERE rn = 1 ORDER BY vec_id""",

    // t12: the pattern is lookaround-free with identical leftmost-first
    // alternation on Java regex and RE2; whitespace is an explicit
    // class (Java \s has \x0B, RE2's does not); '' doubles the SQL-quote
    "t12_bpe_tokens" ->
      """SELECT doc_id,
         len(regexp_extract_all(lower(trim(text)),
             '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \t\n\f\r\x0B]+|[ \t\n\f\r\x0B]+')) AS n_bpe_tokens,
         len(string_split_regex(lower(trim(text)), '[ \t\n\f\r\x0B]+')) AS n_ws_tokens
         FROM documents ORDER BY doc_id""",

    // t13: shared n-gram EQUALITY again lets the oracle count strings
    // where Spark counts 64-bit hashes (the d09 argument); the mean is
    // exact-integer-sum / exact-integer-count — IEEE-identical
    "t13_ngram_novelty" ->
      """WITH t AS (
           SELECT doc_id,
                  list_distinct([array_to_string(toks[i:i+1], ' ')
                                 for i in range(1, len(toks))]) AS bg
           FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                 FROM documents)
           WHERE len(toks) >= 2),
         e AS (SELECT doc_id, unnest(bg) AS b FROM t),
         dfq AS (SELECT b, count(*) AS df FROM e GROUP BY b)
         SELECT doc_id, count(*) AS n_ngrams,
                floor((CAST(sum(df) AS DOUBLE)/count(*))*10000 + 0.5)/10000 AS mean_ngram_df
         FROM e JOIN dfq USING (b)
         GROUP BY doc_id ORDER BY doc_id""",

    // t18: composes the PROVEN t02 quality and t07 repetition
    // formulas; thresholds compare the rounded signals so the CASE
    // arms cannot flip between engines
    "t18_quality_filter" ->
      """WITH b AS (
           SELECT doc_id,
                  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                  floor((least(1.0, len(string_split_regex(trim(text), '\s+'))/100.0)*0.4
                        + (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))*1.0/length(text))*0.4
                        + (1.0 - length(regexp_replace(text, '[^ ]', '', 'g'))*1.0/length(text))*0.2)*10000 + 0.5)/10000 AS quality,
                  CASE WHEN len(toks) >= 2 THEN
                    floor((1.0 - len(list_distinct([array_to_string(toks[i:i+1], ' ')
                                     for i in range(1, len(toks))]))*1.0/(len(toks)-1))*10000 + 0.5)/10000
                  ELSE 0.0 END AS rep_ratio
           FROM (SELECT doc_id, text,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
                 FROM documents WHERE length(text) > 0)),
         r AS (
           SELECT *, CASE WHEN n_tokens < 20 THEN 'too_short'
                          WHEN n_tokens > 2048 THEN 'too_long'
                          WHEN quality < 0.6 THEN 'low_quality'
                          WHEN rep_ratio > 0.1 THEN 'repetitive'
                          ELSE 'pass' END AS reason
           FROM b)
         SELECT doc_id, n_tokens, quality, rep_ratio,
                (reason = 'pass') AS keep, reason
         FROM r ORDER BY doc_id""",

    // t14: tf·N/df is a ratio of exact integers — the product stays
    // far under 2^53, so the double division is bit-identical in both
    // engines and the rank cut (score DESC, term) cannot flip
    "t14_term_salience" ->
      """WITH tf AS (
           SELECT doc_id, t AS term, count(*) AS tf
           FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
                 FROM documents)
           GROUP BY doc_id, t),
         dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         s AS (SELECT doc_id, term, tf, df,
                      CAST(tf * n_docs AS DOUBLE) / df AS sal
               FROM tf JOIN dfc USING (term) CROSS JOIN n),
         r AS (SELECT doc_id, term, tf, df, sal,
                      CAST(row_number() OVER (PARTITION BY doc_id
                                              ORDER BY sal DESC, term) AS INTEGER) AS rnk
               FROM s)
         SELECT doc_id, term, tf, df,
                floor(sal*10000 + 0.5)/10000 AS salience, rnk
         FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""",

    // t15: the keep-rate is one fixed left-assoc double chain
    // (total·share / n_sources / src_tokens) from exact integers, and
    // the Bernoulli trial is the q14 LCG hash — both engine-exact
    "t15_source_mix" ->
      """WITH toks AS (
           SELECT doc_id, source,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
           FROM documents),
         ps AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_tokens
                FROM toks GROUP BY source),
         tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
                        count(*) AS n_sources FROM ps),
         rates AS (SELECT source,
                          least(1.0, CAST(total_tokens AS DOUBLE) * 0.5
                                     / n_sources / src_tokens) AS rate
                   FROM ps CROSS JOIN tot)
         SELECT doc_id, source, n_toks
         FROM toks JOIN rates USING (source)
         WHERE CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) < rate * 4294967296.0
         ORDER BY doc_id""",

    // t27: p is the identical parenthesization of IEEE ops over exact
    // integer inputs on both engines ((rate·n)·w)/Σw, so the LCG coin
    // and the kept set are bit-equal; stableRound guards the emitted p
    "t27_weighted_sample" ->
      """WITH tot AS (SELECT count(*) AS n_docs,
                             CAST(sum(n_chars) AS BIGINT) AS sum_w
                      FROM documents),
         p AS (SELECT doc_id, source, n_chars,
                      least(1.0, 0.3 * CAST(n_docs AS DOUBLE)
                                 * CAST(n_chars AS DOUBLE)
                                 / CAST(sum_w AS DOUBLE)) AS pk
               FROM documents CROSS JOIN tot)
         SELECT doc_id, source, n_chars,
                floor(pk*1000000 + 0.5)/1000000 AS p_keep
         FROM p
         WHERE CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) < pk * 4294967296.0
         ORDER BY doc_id""",

    "t30_chunk_split" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, toks, len(toks) AS n_toks,
                  CASE WHEN len(toks) <= 64 THEN 1
                       ELSE 1 + CAST(floor((len(toks) - 64 + 47)/48.0) AS BIGINT)
                  END AS n_chunks
           FROM t WHERE len(toks) > 0),
         c AS (
           SELECT doc_id, toks, n_toks,
                  unnest(range(0, n_chunks)) AS chunk_id
           FROM s)
         SELECT doc_id, chunk_id, chunk_id*48 AS start_tok,
                len(list_slice(toks, chunk_id*48 + 1, chunk_id*48 + 64))
                  AS n_chunk_toks,
                array_to_string(list_slice(toks, chunk_id*48 + 1, chunk_id*48 + 64), ' ')
                  AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",

    "t31_percolate" ->
      """WITH qd AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> x <> '') AS toks
           FROM documents WHERE doc_id % 97 = 0 AND doc_id < 97*32),
         qterm AS (
           SELECT query_id, term FROM (
             SELECT doc_id AS query_id, term,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY list_position(toks, term)) AS rk
             FROM (SELECT doc_id, toks, unnest(list_distinct(toks)) AS term
                   FROM qd))
           WHERE rk <= 4),
         qsize AS (SELECT query_id, count(*) AS n_query_terms
                   FROM qterm GROUP BY query_id),
         dt AS (
           SELECT DISTINCT doc_id, term FROM (
             SELECT doc_id,
                    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                       x -> x <> '')) AS term
             FROM documents)),
         hits AS (
           SELECT dt.doc_id, qterm.query_id, count(*) AS n_hit_terms
           FROM dt JOIN qterm USING (term) GROUP BY dt.doc_id, qterm.query_id)
         SELECT doc_id, query_id, n_hit_terms, n_query_terms
         FROM hits JOIN qsize USING (query_id)
         WHERE n_hit_terms >= ceil(1.0 * n_query_terms - 0.000000001)
         ORDER BY doc_id, query_id""",

    "t23_source_upsample" ->
      """WITH toks AS (
           SELECT doc_id, source,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
           FROM documents),
         ps AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_tokens
                FROM toks GROUP BY source),
         mx AS (SELECT max(src_tokens) AS max_tokens FROM ps),
         ep AS (SELECT source,
                       least(3.0, CAST(max_tokens AS DOUBLE) / src_tokens) AS epochs
                FROM ps CROSS JOIN mx),
         nc AS (SELECT doc_id, t.source,
                       CAST(floor(epochs) AS BIGINT)
                       + CASE WHEN CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
                                   < (epochs - floor(epochs)) * 4294967296.0
                              THEN 1 ELSE 0 END AS n_copies
                FROM toks t JOIN ep USING (source))
         SELECT doc_id, source,
                CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS copy
         FROM nc ORDER BY doc_id, copy""",

    // t16: the oracle states the SPEC (one global rank per shard); the
    // Spark side computes it hierarchically — hash-match proves the
    // prefix-sum formulation equals the global window
    "t16_shard_assign" ->
      """WITH b AS (SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h
                    FROM documents)
         SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
                row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
         FROM b ORDER BY doc_id""",

    // t19: the oracle states the pair semantics as a position-range
    // self-join; Spark computes the same pairs via lead columns.
    // least/greatest on ASCII tokens compare identically; the
    // (count, word_a, word_b) total order makes LIMIT deterministic
    "t19_cooccurrence" ->
      """WITH e AS (
           SELECT doc_id,
                  unnest(range(1, len(toks)+1)) AS pos,
                  unnest(toks) AS tok
           FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                 FROM documents)),
         p AS (
           SELECT least(a.tok, b.tok) AS word_a, greatest(a.tok, b.tok) AS word_b
           FROM e a JOIN e b
             ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos+1 AND a.pos+3)
         SELECT word_a, word_b, count(*) AS n_cooc
         FROM p GROUP BY 1, 2
         ORDER BY n_cooc DESC, word_a, word_b LIMIT 20""",

    // t17: span-string equality stands in for span-hash equality (the
    // d09/t13 argument); first-occurrence rank and the kept-token
    // rejoin are deterministic under (doc_id, spos) ordering
    "t17_span_scrub" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
         s AS (
           SELECT doc_id,
                  unnest(range(0, len(toks)//10)) AS spos,
                  unnest([array_to_string(toks[i*10+1:i*10+10], ' ')
                          for i in range(0, len(toks)//10)]) AS span
           FROM t),
         r AS (
           SELECT doc_id, spos, span,
                  row_number() OVER (PARTITION BY span ORDER BY doc_id, spos) AS rn
           FROM s),
         k AS (
           SELECT doc_id,
                  count(*) FILTER (WHERE rn > 1) AS n_dropped,
                  string_agg(span, ' ' ORDER BY spos) FILTER (WHERE rn = 1) AS kept
           FROM r GROUP BY doc_id)
         SELECT t.doc_id,
                CAST(len(toks)//10 AS BIGINT) AS n_spans,
                CAST(coalesce(k.n_dropped, 0) AS BIGINT) AS n_dropped,
                concat_ws(' ', k.kept,
                          nullif(array_to_string(toks[(len(toks)//10)*10+1:], ' '), '')) AS clean_text
         FROM t LEFT JOIN k USING (doc_id) ORDER BY doc_id""",

    "t20_rolling_scrub" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
         s AS (
           SELECT doc_id,
                  unnest(range(0, greatest(len(toks)-9, 0))) AS spos,
                  unnest([array_to_string(toks[i+1:i+10], ' ')
                          for i in range(0, greatest(len(toks)-9, 0))]) AS span
           FROM t),
         r AS (
           SELECT doc_id, spos,
                  row_number() OVER (PARTITION BY span ORDER BY doc_id, spos) AS rn
           FROM s),
         cov AS (
           SELECT DISTINCT doc_id, unnest(range(spos, spos+10)) AS pos
           FROM r WHERE rn > 1),
         nd AS (SELECT doc_id, count(*) AS n_dropped FROM cov GROUP BY doc_id),
         tok AS (
           SELECT doc_id, unnest(range(0, len(toks))) AS pos, unnest(toks) AS tok FROM t),
         cl AS (
           SELECT tok.doc_id, string_agg(tok.tok, ' ' ORDER BY tok.pos) AS clean_text
           FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.pos = tok.pos
           WHERE cov.pos IS NULL
           GROUP BY tok.doc_id)
         SELECT t.doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CAST(coalesce(nd.n_dropped, 0) AS BIGINT) AS n_dropped_tokens,
                coalesce(cl.clean_text, '') AS clean_text
         FROM t LEFT JOIN nd USING (doc_id) LEFT JOIN cl USING (doc_id)
         ORDER BY t.doc_id""",

    "t21_source_drift" ->
      """WITH tok AS (
           SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
           FROM documents),
         cnt AS (SELECT source, tok, count(*) AS c FROM tok WHERE tok <> ''
                 GROUP BY source, tok),
         tot AS (SELECT tok, sum(c) AS c_all FROM cnt GROUP BY tok),
         topk AS (SELECT tok, c_all FROM tot ORDER BY c_all DESC, tok LIMIT 50),
         st AS (SELECT source, sum(c) AS t_s FROM cnt GROUP BY source),
         g AS (SELECT sum(c) AS t FROM cnt),
         pairs AS (
           SELECT st.source, st.t_s, k.tok, k.c_all, g.t,
                  coalesce(cnt.c, 0) * g.t - k.c_all * st.t_s AS signed
           FROM st CROSS JOIN topk k CROSS JOIN g
           LEFT JOIN cnt ON cnt.source = st.source AND cnt.tok = k.tok),
         r AS (
           SELECT source, t_s, t, tok, signed,
                  row_number() OVER (PARTITION BY source
                    ORDER BY signed DESC, tok) AS rn
           FROM pairs)
         SELECT source,
                CAST(max(t_s) AS BIGINT) AS src_tokens,
                floor((CAST(sum(abs(signed)) AS DOUBLE)
                       / (CAST(max(t_s) AS DOUBLE) * CAST(max(t) AS DOUBLE)))
                      * 10000 + 0.5) / 10000 AS drift_l1,
                max(CASE WHEN rn = 1 THEN tok END) AS top_over_token
         FROM r GROUP BY source ORDER BY source""",

    "t01_token_stats" ->
      """SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_uniq_tokens,
         length(text) AS n_chars_actual, n_chars
         FROM documents ORDER BY doc_id""",

    "t02_quality_score" ->
      """SELECT doc_id,
         floor((length(regexp_replace(text, '[^A-Za-z]', '', 'g'))*1.0/length(text))*10000 + 0.5)/10000 AS alpha_ratio,
         floor((length(regexp_replace(text, '[^ ]', '', 'g'))*1.0/length(text))*10000 + 0.5)/10000 AS space_ratio,
         floor((length(text)*1.0/len(string_split_regex(trim(text), '\s+')))*100 + 0.5)/100 AS chars_per_tok,
         floor((least(1.0, len(string_split_regex(trim(text), '\s+'))/100.0)*0.4
               + (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))*1.0/length(text))*0.4
               + (1.0 - length(regexp_replace(text, '[^ ]', '', 'g'))*1.0/length(text))*0.2)*10000 + 0.5)/10000 AS quality
         FROM documents WHERE length(text) > 0 ORDER BY doc_id""",

    "t07_repetition" ->
      """SELECT doc_id,
         len(toks) - 1 AS n_bigrams,
         len(list_distinct([array_to_string(toks[i:i+1], ' ')
                            for i in range(1, len(toks))])) AS n_uniq_bigrams,
         floor((1.0 - len(list_distinct([array_to_string(toks[i:i+1], ' ')
                            for i in range(1, len(toks))]))*1.0/(len(toks)-1))*10000 + 0.5)/10000 AS rep_ratio
         FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
               FROM documents)
         WHERE len(toks) >= 2 ORDER BY doc_id""",

    "t08_pii_scrub" ->
      """SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         len(regexp_extract_all(text, 'https?://[^ \t\n\x0B\f\r]+')) AS n_urls,
         md5(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^ \t\n\x0B\f\r]+', '<URL>', 'g')) AS scrubbed_md5
         FROM documents ORDER BY doc_id""",

    "m04_modality_route" ->
      """SELECT route, count(*) AS n_docs,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
         FROM (SELECT text,
                 CASE WHEN unicode(substr(text, 1, 1)) = 123 THEN 'json'
                      WHEN unicode(substr(text, 1, 1)) = 60 THEN 'markup'
                      WHEN unicode(substr(text, 1, 1)) BETWEEN 48 AND 57 THEN 'numeric'
                      WHEN unicode(substr(text, 1, 1)) BETWEEN 65 AND 90
                        OR unicode(substr(text, 1, 1)) BETWEEN 97 AND 122 THEN 'prose'
                      ELSE 'other' END AS route
               FROM documents)
         GROUP BY route ORDER BY route""",

    "t09_corpus_stats" ->
      """SELECT count(*) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         floor((sum(n_toks)*1.0/count(*))*100 + 0.5)/100 AS mean_tokens,
         round(quantile_cont(n_toks, 0.5), 2) AS p50_tokens,
         round(quantile_cont(n_toks, 0.95), 2) AS p95_tokens,
         count(*) FILTER (WHERE n_toks < 20) AS n_short
         FROM (SELECT len(string_split_regex(trim(text), '\s+')) AS n_toks
               FROM documents)""",

    // Pack-then-chunk layout: the oracle's single global window cumsum
    // must equal Spark's hierarchical (bucketed) prefix sum exactly.
    "t10_seq_pack" ->
      """WITH t AS (
           SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
                  CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS end_off
           FROM t)
         SELECT doc_id, n_tokens, end_off - n_tokens AS start_off,
                (end_off - n_tokens) // 2048 AS first_chunk,
                (end_off - 1) // 2048 AS last_chunk,
                (end_off - 1) // 2048 - (end_off - n_tokens) // 2048 + 1 AS n_chunks
         FROM c ORDER BY doc_id""",

    // Span strings in DuckDB vs 64-bit span hashes in Spark: document
    // frequencies agree unless xxhash64 collides (~|spans|^2/2^64).
    "t11_span_dedup" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         i AS (SELECT doc_id, toks, unnest(range(0, len(toks) // 10)) AS si FROM t),
         sp AS (SELECT DISTINCT doc_id,
                  array_to_string(toks[si*10+1 : si*10+10], ' ') AS span
                FROM i),
         ns AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id),
         dfq AS (SELECT span, count(*) AS span_df FROM sp GROUP BY span)
         SELECT sp.doc_id, ns.n_spans,
                count(CASE WHEN dfq.span_df > 1 THEN 1 END) AS dup_spans,
                floor((count(CASE WHEN dfq.span_df > 1 THEN 1 END) * 1.0 / ns.n_spans)
                      * 10000 + 0.5) / 10000 AS dup_share
         FROM sp
         JOIN dfq USING (span)
         JOIN ns ON ns.doc_id = sp.doc_id
         GROUP BY sp.doc_id, ns.n_spans
         ORDER BY sp.doc_id""",

    "a06_outlier_score" ->
      s"""WITH $centroidBuildCte,
         n AS (
           SELECT vec_id, [CAST(e AS DOUBLE) for e in embedding] AS vd
           FROM embeddings),
         s AS (
           SELECT n.vec_id, c.c_label,
                  list_reduce(list_prepend(0.0,
                      [n.vd[i] * CAST(c.centroid[i] AS DOUBLE) for i in range(1, 65)]),
                    (x, y) -> x + y)
                  / (sqrt(list_reduce(list_prepend(0.0, [e*e for e in n.vd]), (x, y) -> x + y))
                     * sqrt(list_reduce(list_prepend(0.0,
                         [CAST(e AS DOUBLE)*CAST(e AS DOUBLE) for e in c.centroid]),
                       (x, y) -> x + y))) AS sim
           FROM n CROSS JOIN c),
         r AS (
           SELECT vec_id, c_label, sim,
                  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_label) AS rn
           FROM s)
         SELECT vec_id, c_label AS assigned_label,
                floor(sim*10000 + 0.5)/10000 AS centroid_sim,
                sim < 0.5 AS is_outlier
         FROM r WHERE rn = 1 ORDER BY vec_id""",

    // marker lists and the (score DESC, lang DESC) tiebreak mirror
    // TextStats.markers / greatest(struct) exactly; every score is an
    // integer so the argmax is engine-deterministic
    "t03_langid" ->
      """WITH p AS (
           SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t FROM documents),
         sc AS (
           SELECT doc_id, lang,
             (length(t)-length(replace(t,' the ','')))//5 + (length(t)-length(replace(t,' and ','')))//5
               + (length(t)-length(replace(t,' of ','')))//4 + (length(t)-length(replace(t,' is ','')))//4
               + (length(t)-length(replace(t,' to ','')))//4 AS s_en,
             (length(t)-length(replace(t,' der ','')))//5 + (length(t)-length(replace(t,' die ','')))//5
               + (length(t)-length(replace(t,' und ','')))//5 + (length(t)-length(replace(t,' ist ','')))//5
               + (length(t)-length(replace(t,' das ','')))//5 AS s_de,
             (length(t)-length(replace(t,' el ','')))//4 + (length(t)-length(replace(t,' la ','')))//4
               + (length(t)-length(replace(t,' que ','')))//5 + (length(t)-length(replace(t,' los ','')))//5
               + (length(t)-length(replace(t,' es ','')))//4 AS s_es,
             (length(t)-length(replace(t,' le ','')))//4 + (length(t)-length(replace(t,' la ','')))//4
               + (length(t)-length(replace(t,' et ','')))//4 + (length(t)-length(replace(t,' les ','')))//5
               + (length(t)-length(replace(t,' est ','')))//5 AS s_fr,
             (length(t)-length(replace(t,'的','')))//1 + (length(t)-length(replace(t,'是','')))//1
               + (length(t)-length(replace(t,'在','')))//1 + (length(t)-length(replace(t,'了','')))//1
               + (length(t)-length(replace(t,'我','')))//1 AS s_zh
           FROM p),
         un AS (
           SELECT doc_id, lang,
                  unnest([{'s': s_en, 'l': 'en'}, {'s': s_de, 'l': 'de'},
                          {'s': s_es, 'l': 'es'}, {'s': s_fr, 'l': 'fr'},
                          {'s': s_zh, 'l': 'zh'}]) AS c
           FROM sc),
         r AS (
           SELECT doc_id, lang, c.s AS s, c.l AS l,
                  row_number() OVER (PARTITION BY doc_id ORDER BY c.s DESC, c.l DESC) AS rn
           FROM un)
         SELECT doc_id,
                CASE WHEN s > 0 THEN l ELSE 'und' END AS pred_lang,
                lang,
                (CASE WHEN s > 0 THEN l ELSE 'und' END = lang) AS correct
         FROM r WHERE rn = 1 ORDER BY doc_id""",

    "t04_fingerprint" ->
      """SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             [unicode(c) for c in string_split(text, '')]),
           (a, b) -> (a*31 + b) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""",

    // a10: a01's cosine formulation with a threshold instead of top-k;
    // the raw-double compare is engine-exact (a03 already proves raw
    // sim ORDERING matches, a stronger property than ≥ τ)
    "a10_range_search" ->
      """WITH v AS (
           SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vd
           FROM embeddings),
         n AS (
           SELECT vec_id, vd,
                  sqrt(list_reduce(list_prepend(0.0, [x*x for x in vd]),
                       (a, b) -> a + b)) AS nrm
           FROM v),
         s AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_reduce(list_prepend(0.0,
                      [q.vd[i]*c.vd[i] for i in range(1, 65)]),
                    (x, y) -> x + y) / (q.nrm*c.nrm) AS sim
           FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id >= 10)
         SELECT query_id, neighbor_id,
                floor(sim*10000 + 0.5)/10000 AS cos_sim
         FROM s WHERE sim >= 0.3 ORDER BY query_id, neighbor_id""",

    "a01_knn_brute" ->
      """WITH v AS (
           SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vd
           FROM embeddings),
         n AS (
           SELECT vec_id, vd,
                  sqrt(list_reduce(list_prepend(0.0, [x*x for x in vd]),
                       (a, b) -> a + b)) AS nrm
           FROM v),
         s AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_reduce(list_prepend(0.0,
                      [q.vd[i]*c.vd[i] for i in range(1, 65)]),
                    (x, y) -> x + y) / (q.nrm*c.nrm) AS sim
           FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id >= 10),
         r AS (
           SELECT query_id, neighbor_id, sim,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
           FROM s)
         SELECT query_id, neighbor_id,
                floor(sim*10000 + 0.5)/10000 AS cos_sim, rn
         FROM r WHERE rn <= 3 ORDER BY query_id, rn""",

    // a25: a01's cosine protocol with the label equi-join — the
    // pre-filter constraint IS the join condition in both engines
    "a25_knn_filtered" ->
      """WITH v AS (
           SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS vd
           FROM embeddings),
         n AS (
           SELECT vec_id, label, vd,
                  sqrt(list_reduce(list_prepend(0.0, [x*x for x in vd]),
                       (a, b) -> a + b)) AS nrm
           FROM v),
         s AS (
           SELECT q.vec_id AS query_id, q.label AS label,
                  c.vec_id AS neighbor_id,
                  list_reduce(list_prepend(0.0,
                      [q.vd[i]*c.vd[i] for i in range(1, 65)]),
                    (x, y) -> x + y) / (q.nrm*c.nrm) AS sim
           FROM n q JOIN n c
             ON q.vec_id < 10 AND c.vec_id >= 10 AND q.label = c.label),
         r AS (
           SELECT query_id, label, neighbor_id, sim,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
           FROM s)
         SELECT query_id, label, neighbor_id,
                floor(sim*10000 + 0.5)/10000 AS cos_sim, rn
         FROM r WHERE rn <= 3 ORDER BY query_id, rn""",

    "a13_knn_classify" ->
      """WITH v AS (
           SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vd
           FROM embeddings),
         n AS (
           SELECT vec_id, vd,
                  sqrt(list_reduce(list_prepend(0.0, [x*x for x in vd]),
                       (a, b) -> a + b)) AS nrm
           FROM v),
         s AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_reduce(list_prepend(0.0,
                      [q.vd[i]*c.vd[i] for i in range(1, 65)]),
                    (x, y) -> x + y) / (q.nrm*c.nrm) AS sim
           FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id >= 10),
         r AS (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
           FROM s),
         vt AS (
           SELECT r.query_id, e.label AS n_label, count(*) AS votes
           FROM r JOIN embeddings e ON e.vec_id = r.neighbor_id
           WHERE r.rn <= 5
           GROUP BY r.query_id, e.label),
         p AS (
           SELECT query_id, n_label, votes,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY votes DESC, n_label) AS prn
           FROM vt)
         SELECT p.query_id, p.n_label AS pred_label, p.votes,
                e.label AS true_label, (p.n_label = e.label) AS is_match
         FROM p JOIN embeddings e ON e.vec_id = p.query_id
         WHERE p.prn = 1 ORDER BY p.query_id""",

    "a02_knn_lsh" -> a02Sql,

    // IVF search is deterministic SQL given the a03-proven centroid
    // math: store each candidate in its rn=1 cell, probe each query's
    // top-2 cells (nprobe=2, the Spark default), score cell-locally.
    // a15 shares this oracle: the at-rest probe (sink_ann_index +
    // ivfKnnIndexed) is result-identical to the live a04 search under
    // the same centroids — the index only changes WHERE the cell
    // assignment lives, not what it computes.
    "a04_ivf_knn" -> ivfKnnSql,
    "a15_ivf_probe_indexed" -> ivfKnnSql,

    // Full kNN self-join over the same IVF index as a04: storage
    // assignment = rn=1 cell for every vector, every vector queries
    // its top-2 cells, self excluded. A pair meets at most once
    // because storage assignment is unique.
    "a07_knn_join" ->
      s"""WITH $centroidBuildCte,
         nv AS (
           SELECT vec_id, [CAST(e AS DOUBLE) for e in embedding] AS vd,
                  sqrt(list_reduce(list_prepend(0.0,
                    [CAST(e AS DOUBLE)*CAST(e AS DOUBLE) for e in embedding]),
                    (a, b) -> a + b)) AS nrm
           FROM embeddings),
         simc AS (
           SELECT nv.vec_id, c.c_label,
                  list_reduce(list_prepend(0.0,
                      [nv.vd[i] * CAST(c.centroid[i] AS DOUBLE) for i in range(1, 65)]),
                    (x, y) -> x + y)
                  / (nv.nrm * sqrt(list_reduce(list_prepend(0.0,
                       [CAST(e AS DOUBLE)*CAST(e AS DOUBLE) for e in c.centroid]),
                       (x, y) -> x + y))) AS sim
           FROM nv CROSS JOIN c),
         rankc AS (
           SELECT vec_id, c_label,
                  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_label) AS rn
           FROM simc),
         cand AS (SELECT vec_id, c_label FROM rankc WHERE rn = 1),
         qry AS (SELECT vec_id, c_label FROM rankc WHERE rn <= 2),
         scored AS (
           SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
                  list_reduce(list_prepend(0.0,
                      [qv.vd[i] * av.vd[i] for i in range(1, 65)]),
                    (x, y) -> x + y) / (qv.nrm * av.nrm) AS sim
           FROM qry q
           JOIN cand a ON q.c_label = a.c_label AND q.vec_id <> a.vec_id
           JOIN nv qv ON qv.vec_id = q.vec_id
           JOIN nv av ON av.vec_id = a.vec_id),
         r AS (
           SELECT query_id, neighbor_id, sim,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
           FROM scored)
         SELECT query_id, neighbor_id,
                floor(sim*10000 + 0.5)/10000 AS cos_sim, rn
         FROM r WHERE rn <= 3 ORDER BY query_id, rn""",

    "m01_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         length(text) AS n_chars_actual,
         sha256(text) AS payload_sha,
         unicode(substr(text, 1, 1)) AS first_code
         FROM documents ORDER BY doc_id""",

    // m06: chunk-string equality stands in for chunk-hash equality;
    // char-indexed substr equals Spark's byte-indexed binary substring
    // on this corpus (the m02 precedent)
    // m09: blocks group on CONTENT here vs the 64-bit content hash in
    // Spark (the m06 convention — counts agree modulo ~|blocks|²/2⁶⁴
    // collisions); sums cast away HUGEINT; dedup_ratio is one IEEE
    // division of integer-exact values
    "m09_storage_savings" ->
      """WITH r AS (
           SELECT doc_id, text,
                  CASE WHEN ascii(substr(text,1,1)) = 123 THEN 'json'
                       WHEN ascii(substr(text,1,1)) = 60 THEN 'markup'
                       WHEN ascii(substr(text,1,1)) BETWEEN 48 AND 57 THEN 'numeric'
                       WHEN (ascii(substr(text,1,1)) BETWEEN 65 AND 90)
                         OR (ascii(substr(text,1,1)) BETWEEN 97 AND 122) THEN 'prose'
                       ELSE 'other' END AS route
           FROM documents WHERE length(text) > 0),
         b AS (SELECT DISTINCT route, substr(text, i*64 + 1, 64) AS blk
               FROM (SELECT route, text,
                       unnest(range(0, CAST(floor((length(text)-1)/64) AS BIGINT) + 1)) AS i
                     FROM r)),
         u AS (SELECT route, count(*) AS n_unique_blocks,
                      CAST(sum(length(blk)) AS BIGINT) AS unique_bytes
               FROM b GROUP BY route),
         p AS (SELECT route, count(*) AS n_docs,
                      CAST(sum(length(text)) AS BIGINT) AS total_bytes
               FROM r GROUP BY route)
         SELECT p.route, n_docs, total_bytes, n_unique_blocks, unique_bytes,
                CAST(total_bytes AS DOUBLE) / CAST(unique_bytes AS DOUBLE) AS dedup_ratio
         FROM p JOIN u USING (route) ORDER BY route""",

    "m06_chunk_dedup" ->
      """WITH c AS (
           SELECT DISTINCT doc_id, substr(text, i*64 + 1, 64) AS chunk
           FROM (SELECT doc_id, text,
                   unnest(range(0, CAST(floor((length(text)-1)/64) AS BIGINT) + 1)) AS i
                 FROM documents)),
         g AS (SELECT chunk FROM c GROUP BY chunk HAVING count(*) BETWEEN 2 AND 1000),
         j AS (SELECT c.doc_id, c.chunk FROM c JOIN g USING (chunk))
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         FROM j a JOIN j b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY doc_a, doc_b""",

    "m02_chunk_sample" ->
      """SELECT doc_id, chunk_idx,
         length(substr(text, chunk_idx*64 + 1, 64)) AS chunk_bytes,
         sha256(substr(text, chunk_idx*64 + 1, 64)) AS chunk_sha
         FROM (SELECT doc_id, text,
                 unnest(range(0, CAST(floor((length(text)-1)/64) AS BIGINT) + 1)) AS chunk_idx
               FROM documents)
         WHERE chunk_idx % 4 = 0
         ORDER BY doc_id, chunk_idx"""
  )

  /** a02: the hyperplane LSH oracle is GENERATED — the plane matrix is
    * deterministic from seed 42 (same LCG as HyperplaneBuckets), so
    * its values are embedded as literals and DuckDB rebuilds the exact
    * buckets: bit j of table t = sign of the plane-dot (sign(dot) ==
    * sign(cosine)), candidates = distinct cross-table bucket
    * collisions, then the a01-pattern exact scoring. */
  private lazy val a02Sql: String = {
    val tables = 4; val bits = 6; val dim = 64
    val planes = {
      var s = 42L
      Array.fill(tables * bits * dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33).toDouble / (1L << 31).toDouble) - 0.5
      }
    }
    def planeList(t: Int, j: Int): String =
      (0 until dim).map(d => planes((t * bits + j) * dim + d).toString)
        .mkString("[", ",", "]")
    def dot(t: Int, j: Int): String =
      s"list_reduce(list_prepend(0.0, [nv.vd[i] * (${planeList(t, j)})[i] " +
        s"for i in range(1, ${dim + 1})]), (x, y) -> x + y)"
    def bucket(t: Int): String =
      (0 until bits).map(j => s"(CASE WHEN ${dot(t, j)} > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
    val bucketStructs = (0 until tables)
      .map(t => s"{'t': $t, 'b': ${bucket(t)}}").mkString("[", ", ", "]")
    s"""WITH nv AS (
          SELECT vec_id, [CAST(e AS DOUBLE) for e in embedding] AS vd,
                 sqrt(list_reduce(list_prepend(0.0,
                   [CAST(e AS DOUBLE)*CAST(e AS DOUBLE) for e in embedding]),
                   (a, b) -> a + b)) AS nrm
          FROM embeddings),
        bk AS (SELECT vec_id, unnest($bucketStructs) AS b FROM nv),
        bk2 AS (SELECT vec_id, b.t AS bt, b.b AS bb FROM bk),
        pr AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM bk2 q JOIN bk2 c ON q.bt = c.bt AND q.bb = c.bb
          WHERE q.vec_id < 10 AND c.vec_id >= 10),
        scored AS (
          SELECT p.query_id, p.neighbor_id,
                 list_reduce(list_prepend(0.0,
                   [qv.vd[i]*cv.vd[i] for i in range(1, ${dim + 1})]),
                   (x, y) -> x + y) / (qv.nrm*cv.nrm) AS sim
          FROM pr p
          JOIN nv qv ON qv.vec_id = p.query_id
          JOIN nv cv ON cv.vec_id = p.neighbor_id),
        r AS (
          SELECT query_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id) AS rn
          FROM scored)
        SELECT query_id, neighbor_id,
               floor(sim*10000 + 0.5)/10000 AS cos_sim, rn
        FROM r WHERE rn <= 3 ORDER BY query_id, rn"""
  }

  def all: Map[String, String] = relational ++ pipeline
}
