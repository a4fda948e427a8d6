package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan-shape regression guards for the scale-critical properties
  * PLANS.md claims: column pruning, filter pushdown, shuffle counts.
  * Read off `queryExecution.sparkPlan` (the compiled pre-AQE physical
  * plan — deterministic at planning time, no job runs). A refactor
  * that silently widens a scan or adds a shuffle fails here, not in a
  * 100 TB deployment. */
class PlanSpec extends SparkSpecBase {
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
  /** File scans of a plan INCLUDING those inside persisted subtrees
    * (operators persist shared relations, which hides their scans
    * behind InMemoryRelation). */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec => Seq(f)
                case a: AdaptiveSparkPlanExec => scans(a.initialPlan)
                case i: InMemoryTableScanExec => scans(i.relation.cachedPlan) }.flatten

  test("t16_shard_assign scans read ONLY doc_id (full column pruning)") {
    val ss = scans(plan("t16_shard_assign"))
    assert(ss.nonEmpty)
    assert(ss.forall(_.requiredSchema.fieldNames.sameElements(Array("doc_id"))),
      ss.map(_.requiredSchema.fieldNames.mkString(",")).mkString("; "))
  }

  test("q50_table_stats: one aggregation pass; sketch path drops the multi-distinct Expand") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = graft.operators.RelationalOps.tableStats(li).queryExecution.sparkPlan
    // exact: the 4 count-distincts share ONE Expand-based aggregation —
    // partial agg + final agg + the output sort, never a pass per column
    val exchanges = exact.collect { case s: ShuffleExchangeExec => s }
    assert(exchanges.size <= 2, s"agg + sort exchanges only, got ${exchanges.size}")
    assert(scans(exact).size == 1, "the table is scanned once")
    val sketch = graft.operators.RelationalOps.tableStats(li, exact = false).queryExecution.sparkPlan
    assert(!sketch.toString.contains("Expand"),
      "approx NDVs must aggregate as mergeable sketches, not Expand rows")
    assert(scans(sketch).size == 1)
  }

  test("q51_bloom_semi_join: the bloom probe filters BELOW the join, on the probe subtree") {
    val p = plan("q51_bloom_semi_join")
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, "a semi join must survive planning")
    val semi = joins.head
    // the probe (lineitem) side carries the compiled bloom filter —
    // rows die before any exchange, not after the join
    assert(semi.left.toString.contains("graft_bloom_contains"),
      s"bloom probe missing from the probe subtree:\n${semi.left}")
    // (InferFiltersFromConstraints also mirrors the predicate onto the
    // build side through the equi-join constraint — harmless: build
    // keys all pass by construction, and the probe-side placement is
    // what moves the shuffle volume)
  }

  /** Exchange count from the EXECUTED plan (EnsureRequirements has
    * run there; sparkPlan carries no Exchange nodes yet), recursing
    * through the AQE wrapper. */
  private def executedShuffles(name: String): Seq[ShuffleExchangeExec] = {
    def collect(p: SparkPlan): Seq[ShuffleExchangeExec] = p.collect {
      case s: ShuffleExchangeExec => Seq(s)
      case a: AdaptiveSparkPlanExec => collect(a.initialPlan)
    }.flatten
    collect(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
  }

  test("q53_session_paths: events shuffle once (user_id); only path partials move after") {
    // the session window's hashpartitioning(user_id) is the only
    // EVENT-GRAIN exchange — hash(user_id) already co-locates
    // (user_id, session_id) for the path aggregation; the second
    // exchange moves (path, partial count) pairs at path-vocabulary
    // grain, and the top-K plans as TakeOrderedAndProject (bounded
    // heap), never a sort+limit exchange
    val shuffles = executedShuffles("q53_session_paths")
    assert(shuffles.size == 2, s"got ${shuffles.size} exchanges")
    assert(shuffles.exists(_.outputPartitioning.toString.contains("user_id")),
      "the event-grain exchange must partition on user_id")
    val pathEx = shuffles.filter(_.outputPartitioning.toString.contains("path"))
    assert(pathEx.nonEmpty &&
      pathEx.forall(_.output.map(_.name).forall(Set("path", "count").contains)),
      s"the path exchange may move only partial counts: ${pathEx.map(_.output)}")
    assert(plan("q53_session_paths").toString.contains("TakeOrderedAndProject"),
      "global top-K must be a bounded heap, not a global sort")
  }

  test("m09_storage_savings: text reads only through the cache; no payload crosses a shuffle") {
    val p = plan("m09_storage_savings")
    // plain collect does NOT descend into InMemoryRelation subtrees:
    // zero hits = every text read goes through the ONE cached
    // materialization of the routed payload frame
    val uncached = p.collect { case f: FileSourceScanExec => f }
    assert(uncached.isEmpty,
      s"raw document scans outside the cache: ${uncached.size}")
    // no exchange may carry the payload: shuffles move per-route
    // partials and (route, hash, length) triples only
    executedShuffles("m09_storage_savings").foreach { s =>
      val cols = s.output.map(_.name.toLowerCase)
      assert(!cols.exists(c => c.contains("payload") || c.contains("text")),
        s"payload bytes crossing an exchange: $cols")
    }
  }

  test("a10_range_search: one broadcast scan pass, no shuffle except the output sort") {
    val p = plan("a10_range_search")
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1, s"expected only the order-by exchange, got ${shuffles.size}")
    assert(scans(p).size == 2, "queries + corpus scans")
  }

  test("q39_window_funnel pushes each step's event_type filter into its scan") {
    val pushed = scans(plan("q39_window_funnel"))
      .flatMap(_.metadata.get("PushedFilters"))
      .count(_.contains("EqualTo(event_type"))
    assert(pushed >= 3, s"only $pushed scans carry a pushed step filter")
  }

  test("t17_span_scrub: document text is read by exactly two scans (spans + rewrite)") {
    val textScans = scans(plan("t17_span_scrub"))
      .count(_.requiredSchema.fieldNames.contains("text"))
    assert(textScans == 2, s"got $textScans text scans")
  }

  test("t20_rolling_scrub: document text is read by exactly two scans (windows + rewrite)") {
    val textScans = scans(plan("t20_rolling_scrub"))
      .count(_.requiredSchema.fieldNames.contains("text"))
    assert(textScans == 2, s"got $textScans text scans")
  }

  test("t21_source_drift: text is read only inside the single cached (source,token) aggregate") {
    val p = plan("t21_source_drift")
    // no consumer reads the file directly — all four references go
    // through the tracked cache, so text is scanned once per run
    val direct = p.collect { case f: FileSourceScanExec => f }
      .count(_.requiredSchema.fieldNames.contains("text"))
    assert(direct == 0, s"$direct text scans bypass the cached aggregate")
    val cachedSubtrees = p.collect { case i: InMemoryTableScanExec => i.relation.cachedPlan }
      .distinct
    assert(cachedSubtrees.size == 1, s"expected one shared cache, got ${cachedSubtrees.size}")
    assert(scans(cachedSubtrees.head).count(_.requiredSchema.fieldNames.contains("text")) == 1)
  }

  test("q44_peak_concurrency: 3-column scan; only the day-grain offset window is global") {
    val p = plan("q44_peak_concurrency")
    val ss = scans(p)
    assert(ss.nonEmpty)
    assert(ss.forall(_.requiredSchema.fieldNames.toSet == Set("ts", "event_id", "user_id")),
      ss.map(_.requiredSchema.fieldNames.mkString(",")).mkString("; "))
    // the hierarchical sweep's contract: the within-day running sum and
    // the sessionization windows are all partitioned; the single
    // unpartitioned window runs over the one-row-per-day aggregate
    def windows(sp: SparkPlan): Seq[org.apache.spark.sql.execution.window.WindowExec] =
      sp.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
        case a: AdaptiveSparkPlanExec => windows(a.initialPlan)
        case i: InMemoryTableScanExec => windows(i.relation.cachedPlan)
      }.flatten
    val unpart = windows(p).filter(_.partitionSpec.isEmpty)
    assert(unpart.size == 1, s"expected exactly the day-offset global window, got ${unpart.size}")
  }

  test("q45_rolling_distinct: events scan pruned to (ts, user_id)") {
    val ss = scans(plan("q45_rolling_distinct"))
    assert(ss.nonEmpty)
    assert(ss.forall(_.requiredSchema.fieldNames.toSet == Set("ts", "user_id")),
      ss.map(_.requiredSchema.fieldNames.mkString(",")).mkString("; "))
  }

  test("t24_unigram_surprisal: text is read only inside the single cached (doc,term) tf table") {
    val p = plan("t24_unigram_surprisal")
    // both the corpus-frequency aggregate and the probe side read the
    // tracked tf cache — one tokenize pass per run (the t14/t21 shape)
    val direct = p.collect { case f: FileSourceScanExec => f }
      .count(_.requiredSchema.fieldNames.contains("text"))
    assert(direct == 0, s"$direct text scans bypass the cached tf table")
    val cachedSubtrees = p.collect { case i: InMemoryTableScanExec => i.relation.cachedPlan }
      .distinct
    assert(cachedSubtrees.size == 1, s"expected one shared cache, got ${cachedSubtrees.size}")
    assert(scans(cachedSubtrees.head).count(_.requiredSchema.fieldNames.contains("text")) == 1)
  }

  test("q49_rolling_distinct_hll: windowDays=90 fans out day-grain sketch rows, never (day,user) pairs") {
    val df = graft.operators.TrackAnalytics.rollingDistinctHll(
      Tables.events(spark, sfDir), windowDays = 90)
    val p = df.queryExecution.sparkPlan
    val gens = p.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.size == 1, s"expected exactly one explode, got ${gens.size}")
    // the 90× multiplier must apply AFTER the day-grain sketch
    // aggregation: the explode's input rows carry the sketch column,
    // and user_id is already aggregated away
    val childCols = gens.head.child.output.map(_.name).toSet
    assert(childCols.contains("sk"), s"explode input must be per-day sketches, got $childCols")
    assert(!childCols.contains("user_id"), "explode input must be day-grain, not user-grain")
  }

  test("t23_source_upsample: text is read once (inside the cached rate table)") {
    val p = plan("t23_source_upsample")
    // the corpus-sized pass carries only (doc_id, source); text feeds
    // the source-grain token totals exactly once, behind the cache
    val direct = p.collect { case f: FileSourceScanExec => f }
      .count(_.requiredSchema.fieldNames.contains("text"))
    assert(direct == 0, s"$direct text scans bypass the cached rate table")
    val cached = p.collect { case i: InMemoryTableScanExec => i.relation.cachedPlan }.distinct
    assert(cached.size == 1, s"expected one shared cache, got ${cached.size}")
    assert(scans(cached.head).count(_.requiredSchema.fieldNames.contains("text")) == 1)
  }

  test("t22_hash_embed: scan-speed map-side pass — no shuffle except the output sort") {
    val p = plan("t22_hash_embed")
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1, s"expected only the order-by exchange, got ${shuffles.size}")
    val ss = scans(p)
    assert(ss.nonEmpty)
    assert(ss.forall(_.requiredSchema.fieldNames.toSet == Set("doc_id", "text")),
      ss.map(_.requiredSchema.fieldNames.mkString(",")).mkString("; "))
  }

  test("near-dup joins never degenerate to cartesian/nested-loop") {
    for (name <- Seq("d03_minhash_lsh", "d11_dedup_against", "d12_ingest_admit",
                     "m06_chunk_dedup", "m07_cdc_dedup", "q48_price_band")) {
      val p = plan(name)
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty, s"$name: cartesian")
      assert(p.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty, s"$name: bnlj")
    }
  }

  test("q21/q47: exact percentiles stay distributed — value-grain partial agg, no holistic buffer") {
    // exactGroupPercentiles (RelationalOps) is load-bearing for
    // q21/q46/q47/q52; a refactor back to the built-in `percentile`
    // would silently reintroduce the one-task-buffers-every-raw-value
    // plan that OOMs at 100 TB. Pin its shape on both consumers:
    for (name <- Seq("q21_percentile", "q47_equi_depth")) {
      assert(!plan(name).toString.contains("percentile("),
        s"$name: the holistic percentile aggregate is back in the plan")
      // the widest exchange must carry one row per DISTINCT
      // (group, value) — i.e. partition on the value column (Catalyst
      // rewrites the `__v` cast alias to `_groupingexpression`) AND sit
      // above a map-side partial aggregation, so raw fact rows never
      // cross the wire un-combined
      val valueGrain = executedShuffles(name).filter(s =>
        s.outputPartitioning.toString.contains("_groupingexpression") ||
          s.outputPartitioning.toString.contains("__v"))
      assert(valueGrain.nonEmpty,
        s"$name: the (group, value)-grain partial-agg exchange is gone")
      assert(valueGrain.forall(_.child.toString.contains("HashAggregate")),
        s"$name: rows must partial-aggregate map-side before the value-grain exchange")
    }
  }

  test("events scan: ts predicates push to parquet; derived ts_ns does not (documented)") {
    import org.apache.spark.sql.functions.{col, lit}
    // the loader contract (Tables.events) keeps `ts` PUSHABLE on both
    // micros vintages: native TimestampType trivially, and TIMESTAMP_NTZ
    // because Catalyst unwraps the UTC-session NTZ→TZ cast into an NTZ
    // literal comparison at the scan. `ts_ns` is derived post-scan on
    // these vintages, so filters against it stay above the scan. No
    // inventory query filters on ts_ns at scan level (windows/
    // sessionization consume it after the scan) — this row documents the
    // asymmetry so a future time-filtered operator is written against
    // `ts`, and breaks loudly if a loader change makes ts unpushable.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val rawType = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assume(rawType == TimestampType || rawType == TimestampNTZType,
      s"pushdown pin targets the micros vintages; got $rawType")
    val ev = Tables.events(spark, sfDir)
    val cut = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val tsScans = scans(ev.filter(col("ts") >= lit(cut))
      .select("user_id").queryExecution.sparkPlan)
    assert(tsScans.nonEmpty)
    assert(tsScans.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("GreaterThanOrEqual(ts"))),
      s"ts predicate must reach parquet: ${tsScans.map(_.metadata.get("PushedFilters"))}")
    assert(tsScans.forall(_.requiredSchema.fieldNames.toSet.subsetOf(Set("ts", "user_id"))),
      "the pruned scan may read only (ts, user_id)")
    val nsScans = scans(ev.filter(col("ts_ns") >= lit(1704153600000000000L))
      .queryExecution.sparkPlan)
    assert(nsScans.exists(_.metadata.get("PushedFilters")
        .forall(f => !f.contains("GreaterThanOrEqual"))),
      "a ts_ns comparison cannot push below the derivation — if this starts " +
        "passing as a pushed filter, the loader contract changed")
  }

  test("q54_fuzzy_join: gram candidates flow through an equi hash join; nest-loop only in the bounded short block") {
    val p = plan("q54_fuzzy_join")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      "no unconditioned cartesian anywhere")
    // the main candidate path joins on gram EQUALITY — hash-joinable,
    // bucket-local at scale (the d03-band shape)
    val gramJoin = p.collect {
      case j: org.apache.spark.sql.execution.joins.HashJoin => j }
      .filter(_.leftKeys.exists(_.toString.contains("gram")))
    assert(gramJoin.nonEmpty, "the gram-keyed equi join must survive planning")
    // the short-string fallback is the ONLY permitted nested loop, and
    // both of its inputs are the len-filtered short slice
    val bnl = p.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.size <= 1, s"one short-block nest loop at most, got ${bnl.size}")
    bnl.foreach { j =>
      assert(j.left.toString.contains("len#") && j.left.toString.contains("<= 5") &&
        j.right.toString.contains("len#") && j.right.toString.contains("<= 5"),
        "nest-loop inputs must be the length-bounded short slices")
    }
  }

  test("q55_spend_deciles: the only unpartitioned window runs at bucket grain") {
    val p = plan("q55_spend_deciles")
    val wins = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    val unpart = wins.filter(_.partitionSpec.isEmpty)
    // exactly one global window — the running bucket offsets — and its
    // input is the ≤1024-row bucket-count aggregate, never customers
    assert(unpart.size == 1, s"got ${unpart.size} unpartitioned windows")
    val aggBelow = unpart.head.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
    assert(aggBelow.exists(_.groupingExpressions.exists(_.toString.contains("bucket"))),
      "the global window must consume the bucket-grain aggregate")
    // the customer-grain rank window stays partitioned (by bucket)
    assert(wins.exists(_.partitionSpec.nonEmpty), "within-bucket rank window missing")
  }

  test("q56_transition_matrix: one entity-grain exchange; events scan pruned to 4 columns") {
    val ss = scans(plan("q56_transition_matrix"))
    assert(ss.nonEmpty && ss.forall(
      _.requiredSchema.fieldNames.toSet == Set("event_id", "ts", "user_id", "event_type")),
      ss.map(_.requiredSchema.fieldNames.mkString(",")).mkString("; "))
    // user_id lead window, (from,to) agg, k²-row prob window, final
    // sort — only the FIRST moves event-grain rows
    val shuffles = executedShuffles("q56_transition_matrix")
    val entityGrain = shuffles.filter(_.outputPartitioning.toString.contains("user_id"))
    assert(entityGrain.size == 1,
      s"exactly one event-grain exchange, got ${entityGrain.size}")
  }

  test("d19_containment_prefix: df attaches via a window, never a broadcast of the df table") {
    // the grouped df relation's post-explode size estimate would make
    // the planner broadcast it at ANY SF (the d02 lesson) — the
    // count-window formulation must keep the candidate join the only
    // join in the prefix subtree, planned shuffle-hash
    val p = SparkEntry.queries("d19_containment_prefix")(spark, sfDir)
      .queryExecution.executedPlan
    def all(q: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (q +: q.children.flatMap(all)) ++ (q match {
        case a: AdaptiveSparkPlanExec => all(a.initialPlan)
        case i: InMemoryTableScanExec => all(i.relation.cachedPlan)
        case _ => Seq.empty
      })
    val nodes = all(p)
    val shj = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
    assert(shj.nonEmpty, "the prefix candidate probe must plan as a shuffled hash join")
    // the only permitted broadcasts carry the per-doc set relations of
    // the verify (sets by id); no broadcast may MATERIALIZE a df
    // column — that would mean the shingle-grain df table got built on
    // the driver after all
    val bx = nodes.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b }
    assert(!bx.exists(_.output.exists(_.name == "df")),
      s"df table must never broadcast:\n${bx.map(_.output).mkString("\n")}")
  }

  test("t27_weighted_sample: scan-speed map+filter — no shuffle before the presentational sort") {
    val shuffles = executedShuffles("t27_weighted_sample")
    // one tiny single-row aggregate exchange (n, Σw) + the output
    // sort; the corpus itself never hash-partitions
    assert(shuffles.size <= 2, s"got ${shuffles.size} exchanges")
    // the output ORDER BY range-partitions — fine; what must never
    // appear is a HASH repartitioning of the corpus
    assert(!shuffles.exists(_.outputPartitioning.toString.contains("hashpartitioning(doc_id")),
      "the corpus scan must not hash-shuffle on doc_id")
  }

  test("t28_bm25_search: every term-keyed join broadcasts the query side") {
    // the corpus-side tf relation must never hash-shuffle against the
    // queries: qt broadcasts into the df relation, the resulting qdf
    // broadcasts into the tf scan. Only the candidate↔doclens join
    // (doc_id) and the partial aggs may exchange.
    val p = plan("t28_bm25_search")
    val termJoins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.leftKeys.exists(_.references.exists(_.name == "term")) => j }
    assert(termJoins.nonEmpty, "the term-keyed candidate joins must survive planning")
    assert(termJoins.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"term joins must broadcast the query side:\n${termJoins.map(_.nodeName)}")
    graft.Caches.release()
  }

  test("t30_chunk_split: scan-speed narrow generate — only the output sort exchanges") {
    val shuffles = executedShuffles("t30_chunk_split")
    assert(shuffles.size <= 1, s"got ${shuffles.size} exchanges")
    assert(!shuffles.exists(_.outputPartitioning.toString.contains("hashpartitioning")),
      "chunking must not hash-shuffle the corpus")
  }

  test("t31_percolate: standing queries broadcast; the corpus never hash-shuffles against them") {
    val p = plan("t31_percolate")
    val termJoins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.leftKeys.exists(_.references.exists(_.name == "term")) => j }
    assert(termJoins.nonEmpty)
    assert(termJoins.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"term joins must broadcast the standing-query side:\n${termJoins.map(_.nodeName)}")
    graft.Caches.release()
  }

  test("q61/q62: events scan pruned; one event-grain exchange to the aggregated grain") {
    Seq("q61_hourly_profile" -> Set("ts", "event_type"),
        "q62_ohlc_downsample" -> Set("ts", "event_type", "event_id", "value")).foreach {
      case (name, cols) =>
        val ss = scans(plan(name))
        assert(ss.nonEmpty && ss.forall(_.requiredSchema.fieldNames.toSet == cols),
          s"$name: ${ss.map(_.requiredSchema.fieldNames.mkString(","))}")
    }
    // q62: the (type, day) partial agg is the ONLY exchange before the
    // output sort — open/close fold as aggregation state, no window
    val shuffles = executedShuffles("q62_ohlc_downsample")
    assert(shuffles.size <= 2, s"agg + sort only, got ${shuffles.size}")
    assert(!plan("q62_ohlc_downsample").toString.contains("Window"),
      "OHLC picks must fold in the aggregate, never via a window buffer")
  }

  test("q60_event_anomaly: events scan pruned to (ts, event_type); windows run at day grain") {
    val ss = scans(plan("q60_event_anomaly"))
    assert(ss.nonEmpty)
    assert(ss.forall(_.requiredSchema.fieldNames.toSet == Set("ts", "event_type")),
      ss.map(_.requiredSchema.fieldNames.mkString(",")).mkString("; "))
    // the raw events cross exactly one exchange (the (type, day)
    // partial agg); every later exchange moves type/day-grain rows
    val shuffles = executedShuffles("q60_event_anomaly")
    val eventGrain = shuffles.filter(
      _.outputPartitioning.toString.contains("hashpartitioning(event_type, day"))
    assert(eventGrain.size <= 1,
      s"only the daily partial agg may shuffle event-grain rows, got ${shuffles.size} total")
    graft.Caches.release()
  }
}
