package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Num.stableRound
import graft.functions.GraftFunctions

/** Similarity search over embedding columns (SURVEY.md §2
  * "Similarity search").
  *
  * Scale posture: brute force is the correctness baseline — queries
  * broadcast, candidates scored map-side with the codegen'd
  * `graft_cosine` expression, top-k via per-query window. The LSH and
  * IVF variants bound the candidate set so the scoring join is
  * bucket-local: at 100 TB only the bucket/centroid assignment of each
  * vector shuffles, never the all-pairs product.
  */
object Ann {

  /** a01_knn_brute — exact top-k cosine neighbours for each query
    * vector (vec_id < nQueries) among the rest. */
  def knnBrute(embeddings: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val q = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = embeddings.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).crossJoin(c)
      .withColumn("sim", expr("graft_cosine(qe, ce)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        stableRound(col("sim"), 4).as("cos_sim"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** Deterministic random hyperplanes (splitmix-style LCG, seed 42) so
    * LSH buckets are reproducible across runs and engines. */
  private[ann] def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var s = 42L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33).toDouble / (1L << 31).toDouble) - 0.5
    }
    Array.fill(nPlanes, dim)(next())
  }

  /** a02_knn_lsh — random-hyperplane LSH ANN, multi-table
    * OR-construction: `tables` independent hash tables of `planesPerTable`
    * sign bits each; a candidate is any vector sharing a bucket with the
    * query in ANY table, then exact cosine + top-k over candidates only.
    * Recall vs a01 is asserted in the spec; at 100 TB add tables (or
    * multi-probe) for recall — the scoring join stays bucket-local. */
  def knnLsh(embeddings: DataFrame, nQueries: Int = 10, k: Int = 3,
             tables: Int = 4, planesPerTable: Int = 6, dim: Int = 64): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val planes = hyperplanes(tables * planesPerTable, dim)
    // sign(dot) == sign(cosine), so the codegen'd graft_cosine gives
    // the hyperplane side without interpreted lambda math
    def side(p: Array[Double]) = expr("graft_cosine(embedding, " +
      p.map(x => s"CAST($x AS FLOAT)").mkString("array(", ",", ")") + ")") > 0
    def bucket(t: Int) = (0 until planesPerTable).map { j =>
      when(side(planes(t * planesPerTable + j)), lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val buckets = array((0 until tables).map(t =>
      struct(lit(t).as("t"), bucket(t).as("b"))): _*)
    val withB = embeddings
      .withColumn("bucket", explode(buckets))
      .select(col("vec_id"), col("embedding"), col("bucket.t").as("bt"), col("bucket.b").as("bb"))
    val q = withB.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bt"), col("bb"))
    val c = withB.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("bt"), col("bb"))
    val cand = q.join(c, Seq("bt", "bb"))
      .select(col("query_id"), col("qe"), col("neighbor_id"), col("ce"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .withColumn("sim", expr("graft_cosine(qe, ce)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        stableRound(col("sim"), 4).as("cos_sim"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** Per-label centroids: elementwise mean via posexplode + two narrow
    * groupBys — the coarse-quantizer build of an IVF index. */
  private[ann] def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("cx"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        s => s.getField("cx").cast("float")).as("centroid"))
      .select(col("label").as("c_label"), col("centroid"))

  /** Nearest-centroid assignment by cosine (broadcast centroid table,
    * one ranked window over vec x centroid scores). */
  private[ann] def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("c_label"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("sim", expr("graft_cosine(embedding, centroid)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "sim", "centroid")
  }

  /** a03_centroid_assign — IVF-style coarse quantization: build one
    * centroid per label, then assign every vector to its nearest
    * centroid by cosine. */
  def centroidAssign(embeddings: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    assign(embeddings, labelCentroids(embeddings))
      .select(col("vec_id"), col("label"),
        col("c_label").as("assigned_label"),
        (col("label") === col("c_label")).as("is_match"))
      .orderBy("vec_id")
  }

  /** a05_kmeans_build — unlabeled IVF coarse-quantizer build: k-means
    * with deterministic seeding (the k vectors with the smallest
    * scrambled ids) and a fixed iteration count. Each iteration is one
    * broadcast-assign pass + one narrow elementwise-mean rebuild — at
    * 100 TB that's `iters` scans with only (cell, pos, partial-sum)
    * shuffles, never a vector-vector product. Returns (vec_id, cell). */
  def kmeansAssign(embeddings: DataFrame, k: Int = 10, iters: Int = 3): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val vecs = embeddings.select(col("vec_id"), col("embedding")).persist()
    val seeds = vecs
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .orderBy("vec_id")
      .select(row_number().over(Window.orderBy("vec_id")).as("c_label"), col("embedding").as("centroid"))
    var centroids = seeds
    for (_ <- 1 to iters) {
      val assigned = assign(vecs, centroids)
      centroids = assigned
        .select(col("c_label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("c_label", "pos").agg(avg("x").as("cx"))
        .groupBy("c_label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          s => s.getField("cx").cast("float")).as("centroid"))
    }
    assign(vecs, centroids)
      .select(col("vec_id"), col("c_label").as("cell"))
      .orderBy("vec_id")
  }

  /** a04_ivf_knn — IVF search: queries and candidates are both
    * assigned to their nearest centroid; scoring happens only within a
    * query's cell (nprobe=1). At 100 TB the cell id is the shuffle
    * key — the all-pairs product never materializes. Recall depends on
    * cluster structure; the spec asserts it on clustered data. */
  def ivfKnn(embeddings: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val assigned = assign(embeddings, labelCentroids(embeddings))
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("c_label"))
    val c = assigned.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("c_label"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    q.join(c, "c_label")
      .withColumn("sim", expr("graft_cosine(qe, ce)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        stableRound(col("sim"), 4).as("cos_sim"), col("rn"))
      .orderBy("query_id", "rn")
  }
}
