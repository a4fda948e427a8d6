package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` surface — the modern form of the reference's
  * custom UDAF registration (TrafficTeach `GroupConcatDistinctUDAF`,
  * registered as `group_concat_distinct`). Both aggregators are
  * mergeable (associative reduce + merge), so Spark keeps map-side
  * partial aggregation — the property the reference's row-at-a-time
  * UDAF also had, preserved here with compile-time types.
  *
  * Note: for the common cases, built-ins beat custom aggregators
  * (q06 uses collect_set + array_sort + array_join); these exist for
  * the API surface and for semantics built-ins can't express.
  */
object TypedAggregators {

  /** Distinct ordered group-concat, the reference UDAF's semantics:
    * buffer = distinct set, finish = sorted comma-join. */
  object GroupConcatDistinct extends Aggregator[String, Set[String], String] {
    override def zero: Set[String] = Set.empty
    override def reduce(b: Set[String], a: String): Set[String] =
      if (a == null) b else b + a
    override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 ++ b2
    override def finish(r: Set[String]): String = r.toSeq.sorted.mkString(",")
    override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Bounded top-k collector: the scale-safe alternative to
    * rank-window top-N when k is small — the buffer never exceeds k
    * elements, so a 10^9-row group costs O(k) memory instead of a
    * windowed sort. */
  class TopK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(b: Seq[Double], a: Double): Seq[Double] =
      (b :+ a).sorted(Ordering[Double].reverse).take(k)
    override def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] =
      (b1 ++ b2).sorted(Ordering[Double].reverse).take(k)
    override def finish(r: Seq[Double]): Seq[Double] = r
    override def bufferEncoder: Encoder[Seq[Double]] = Encoders.kryo[Seq[Double]]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Bounded top-k of (key, id, payload) rows under ascending
    * (key, id) — the aggregate-fold replacement for the
    * `row_number() OVER (PARTITION BY query ORDER BY sim DESC, id)`
    * top-k idiom of the retrieval family. The window formulation
    * plans Sort + WindowGroupLimit on BOTH sides of the exchange —
    * two full sorts of the candidate product per query batch; this
    * fold is mergeable with a buffer that never exceeds k rows, so
    * map-side partial aggregation reduces each partition to ≤ k rows
    * per group BEFORE the shuffle (guide §2.3/§2.4: shuffle k·|groups|
    * rows instead of the candidate product, no candidate-sized sort
    * anywhere). Callers encode the window's exact ordering contract
    * into `key` (see Ann.topKNeighbors) and carry the raw payload in
    * the third slot, which never participates in the comparison.
    * Determinism: (key, id) is a total order with unique ids per
    * group, so the kept set and its order are input-order-independent. */
  class NeighborTopK(k: Int)
      extends Aggregator[(Double, Long, Double),
        Seq[(Double, Long, Double)], Seq[(Double, Long, Double)]] {
    require(k >= 1, s"NeighborTopK: k must be >= 1, got $k")
    private val ord =
      Ordering.by[(Double, Long, Double), (Double, Long)](t => (t._1, t._2))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    override def zero: Seq[(Double, Long, Double)] = Vector.empty
    override def reduce(b: Seq[(Double, Long, Double)],
                        a: (Double, Long, Double)): Seq[(Double, Long, Double)] =
      // common case first: a full buffer rejects a non-improving row in O(1)
      if (b.length == k && ord.gteq(a, b.last)) b
      else ((b :+ a).sorted(ord)).take(k)
    override def merge(b1: Seq[(Double, Long, Double)],
                       b2: Seq[(Double, Long, Double)]): Seq[(Double, Long, Double)] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[(Double, Long, Double)]): Seq[(Double, Long, Double)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long, Double)]] =
      Encoders.kryo[Seq[(Double, Long, Double)]]
    override def outputEncoder: Encoder[Seq[(Double, Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Double)]]()
  }

  /** Misra–Gries heavy-hitters sketch: at most `k` counters however
    * wide the true vocabulary, mergeable with the Agarwal et al.
    * offset-merge (sum counters pairwise, subtract the (k+1)-th
    * largest, keep positives). Guarantees, independent of merge
    * order: every estimate is an UNDER-count by at most N/(k+1)
    * (N = stream length), so every term with true frequency >
    * N/(k+1) is guaranteed present — the one-sidedness the spec
    * pins. This is the bounded-state scale path for vocabulary-sized
    * aggregations: map-side state and shuffle rows are O(k) per
    * partition regardless of how much typo/noise long-tail a 100 TB
    * crawl carries, where an exact word count shuffles the full
    * per-partition vocabulary. */
  class FreqSketch(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"FreqSketch: k must be >= 1, got $k")
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b
      else if (b.contains(a) || b.size < k) b.updated(a, b.getOrElse(a, 0L) + 1L)
      else b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val combined = b2.foldLeft(b1) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        val offset = combined.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (t, c) =>
          if (c - offset > 0L) Some(t -> (c - offset)) else None
        }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** KMV (k-minimum-values / bottom-k theta) distinct sketch: the
    * buffer is the k SMALLEST distinct hash values seen — a uniform
    * sample of the distinct hash space whose kth value estimates the
    * domain density. Unlike HLL it supports SET ALGEBRA: the union
    * sketch is the merged bottom-k, and the Jaccard of two sets is
    * estimated by the fraction of the union's bottom-k present in
    * both inputs' sketches — which is what audience-overlap questions
    * (how many users did BOTH) need and HLL structurally can't give.
    * Merge = distinct-sort-take(k): associative, commutative,
    * idempotent, so estimates are merge-order-independent (unlike MG
    * counts) — the buffer is exact while the domain fits in k and
    * O(k) forever after. Inputs are pre-hashed longs whose NATURAL
    * order must equal the uniform order (callers XOR-shift
    * xxhash64 by Long.MinValue). */
  class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2, s"KmvSketch: k must be >= 2, got $k")
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.length == k && a >= b.last) b
      else (b :+ a).distinct.sorted.take(k)
    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      (b1 ++ b2).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Munro–Paterson multilevel quantile sketch: bounded-state
    * mergeable quantiles — the streaming/shuffle-frugal scale path
    * beside the EXACT q21 machinery (which must see every value) and
    * Spark's approx_percentile (whose buffer isn't exposed as an
    * aggregation state you can bound and reason about). State is a
    * small stack of level buffers: level i holds items each standing
    * for 2^i originals, a full level (2b items) sorts and COLLAPSES —
    * odd-indexed survivors promote to level i+1 — so memory is
    * O(b·log(n/b)) however long the stream runs, and the per-item
    * rank perturbation of each collapse is ≤ its weight, giving the
    * classic ε ≈ log²(n/b)/b rank error. Deterministic by design (the
    * odd-index choice replaces KLL's coin flips): identical input in
    * identical order reproduces bit-identical estimates; merge order
    * only shifts estimates within the same rank-error envelope (the
    * MG trade, spec-pinned). Merge concatenates levels pairwise, then
    * re-collapses any overfull level — collapse only ever consumes an
    * EVEN count (one straggler stays behind), so total represented
    * weight is conserved exactly: sum(weights) == n always, the
    * invariant the spec pins. finish() sorts the ~b·levels weighted
    * survivors and reads the requested quantiles off cumulative
    * weights. At 100 TB: per-partition state and shuffle bytes are
    * O(b log n) instead of the full column q21 shuffles — this is the
    * per-key latency-percentile monitor (p50/p90/p99) you can run as
    * unbounded streaming aggregation state. */
  class QuantileSketch(b: Int, ps: Seq[Double])
      extends Aggregator[Double, Seq[Seq[Double]], Seq[Double]] {
    require(b >= 8, s"QuantileSketch: buffer size must be >= 8, got $b")
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p < 1.0),
      s"QuantileSketch: quantiles must lie in (0,1), got $ps")

    override def zero: Seq[Seq[Double]] = Vector(Vector.empty)

    /** Sort a full buffer, promote odd-indexed items (1,3,5,…) of an
      * even-size prefix one level up; an odd straggler stays. */
    private def collapseUp(levels: Seq[Seq[Double]], i: Int): Seq[Seq[Double]] = {
      val sorted = levels(i).sorted
      val even = sorted.length - (sorted.length % 2)
      val promoted = (1 until even by 2).map(sorted)
      val kept = sorted.drop(even)
      val padded = if (i + 1 < levels.length) levels
        else levels :+ Vector.empty[Double]
      val next = padded.updated(i, kept)
      next.updated(i + 1, next(i + 1) ++ promoted)
    }

    private def normalize(levels0: Seq[Seq[Double]]): Seq[Seq[Double]] = {
      var levels = levels0
      var i = 0
      while (i < levels.length) {
        if (levels(i).length >= 2 * b) levels = collapseUp(levels, i)
        else i += 1
      }
      levels
    }

    override def reduce(buf: Seq[Seq[Double]], a: Double): Seq[Seq[Double]] =
      normalize(buf.updated(0, buf(0) :+ a))

    override def merge(b1: Seq[Seq[Double]], b2: Seq[Seq[Double]]): Seq[Seq[Double]] = {
      val depth = math.max(b1.length, b2.length)
      normalize(Vector.tabulate(depth) { i =>
        (if (i < b1.length) b1(i) else Vector.empty) ++
          (if (i < b2.length) b2(i) else Vector.empty)
      })
    }

    override def finish(levels: Seq[Seq[Double]]): Seq[Double] = {
      val weighted = levels.zipWithIndex.flatMap { case (items, i) =>
        val w = 1L << i; items.map(v => (v, w))
      }.sortBy(_._1)
      if (weighted.isEmpty) return ps.map(_ => Double.NaN)
      val total = weighted.iterator.map(_._2).sum
      ps.map { p =>
        val target = p * total
        var cum = 0L
        var ans = weighted.last._1
        val it = weighted.iterator
        var found = false
        while (it.hasNext && !found) {
          val (v, w) = it.next(); cum += w
          if (cum >= target) { ans = v; found = true }
        }
        ans
      }
    }

    override def bufferEncoder: Encoder[Seq[Seq[Double]]] =
      Encoders.kryo[Seq[Seq[Double]]]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Second-moment accumulator backing PCA (a22): one pass over the
    * corpus folding count, per-dimension sums and the upper-triangular
    * raw second moments into one flat double buffer — mergeable
    * (element-wise add), so map-side partial aggregation holds and
    * the only thing that crosses the exchange is the O(d²) buffer
    * (d=64 → 2145 doubles), never the vectors themselves. Layout:
    * [n, sum_0..d-1, m_{0,0}, m_{0,1}, …, m_{d-1,d-1}] with the
    * second moments upper-triangle row-major. Vectors shorter than d
    * are zero-padded by construction of the loop bound. */
  class MomentMatrix(d: Int) extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    require(d >= 1 && d <= 1024,
      s"MomentMatrix: dim $d outside [1,1024] — the O(d²) buffer must stay broadcast-tiny")
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      if (v == null) return b
      val x = new Array[Double](d)
      val n = math.min(d, v.length)
      var p = 0
      while (p < n) { x(p) = v(p).toDouble; p += 1 }
      b(0) += 1
      var i = 0; var t = 1 + d
      while (i < d) {
        b(1 + i) += x(i)
        var j = i
        while (j < d) { b(t) += x(i) * x(j); j += 1; t += 1 }
        i += 1
      }
      b
    }
    override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { b1(i) += b2(i); i += 1 }
      b1
    }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Register as SQL functions (mirrors the reference's
    * sqlContext.udf.register of its UDAF). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("group_concat_distinct", udaf(GroupConcatDistinct))
    spark.udf.register("top_k_values", udaf(new TopK(3)))
    spark.udf.register("freq_sketch", udaf(new FreqSketch(64)))
    spark.udf.register("kmv_sketch", udaf(new KmvSketch(256)))
    spark.udf.register("quantile_sketch",
      udaf(new QuantileSketch(512, Seq(0.5, 0.9, 0.99))))
  }
}
