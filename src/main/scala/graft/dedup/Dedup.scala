package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Num.stableRound

/** Deduplication operators for LLM-training-data pipelines (beyond the
  * reference's surface; SURVEY.md §2 "Deduplication").
  *
  * Scale posture (100 TB): exact dedup groups on a 128-bit content
  * hash, never the full text; near-dup candidate generation goes
  * through shingle/band buckets so the only fact-fact join is
  * bucket-local. At production scale add a document-frequency cap on
  * shingles (drop shingles appearing in >p docs) — that bounds bucket
  * fan-out at a small recall cost; left uncapped here because the
  * oracle checks exact-equivalence.
  */
object Dedup {

  /** d01_exact_dedup — exact duplicate removal: keep the smallest
    * doc_id per identical text. Groups on md5(text) so the shuffle
    * carries 16-byte keys, not documents. */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
      .select("doc_id", "dup_cnt")
      .orderBy("doc_id")

  /** Word n-gram shingle sets: lowercase, whitespace-tokenize, distinct
    * 3-gram shingles. Shared by the Jaccard/MinHash operators. */
  def withShingles(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", array_distinct(transform(
        sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ",
          element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2),
          element_at(col("toks"), i + 3)))))

  /** d02_ngram_jaccard — exact all-pairs near-dup detection: explode
    * shingles, self-join on shingle (the inverted-index join), count
    * shared shingles per pair, exact Jaccard >= threshold.
    * This is the correctness baseline the LSH path must reproduce. */
  def ngramJaccard(documents: DataFrame, threshold: Double = 0.8): DataFrame = {
    val e = withShingles(documents)
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("shingle"))
    val pairs = e.as("a")
      .join(e.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), stableRound(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** d03_minhash_lsh — MinHash + banded LSH near-dup detection, the
    * scale path: 128 minhashes per doc from two base hashes
    * (Carter-Wegman h1 + i*h2), 32 bands x 4 rows, candidate pairs
    * from band-bucket collisions only, then exact-Jaccard verification
    * so the output equals d02's at the same threshold
    * (P[miss] < 1e-7 per true pair at j >= 0.8).
    * The pair join touches only band-bucket collisions — at 100 TB the
    * band table is the only shuffled artifact (doc_id + 2 longs). */
  def minHashLsh(documents: DataFrame, threshold: Double = 0.8,
                 numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val rows = numHashes / bands
    val shingled = withShingles(documents)
    val sig = shingled
      .withColumn("hs", transform(col("sh"),
        s => struct(xxhash64(s).as("h1"), hash(s).cast("long").as("h2"))))
      .withColumn("sig", transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(col("hs"),
          p => p.getField("h1") + i.cast("long") * p.getField("h2")))))
      .withColumn("band", explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("bi"), xxhash64(slice(col("sig"), b * rows + 1, lit(rows))).as("bh")))))
      .select(col("doc_id"), col("band.bi").as("bi"), col("band.bh").as("bh"))
    val cand = sig.as("x")
      .join(sig.as("y"),
        col("x.bi") === col("y.bi") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sets = shingled.select(col("doc_id"), col("sh"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared") / (size(col("sh_a")) + size(col("sh_b")) - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), stableRound(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** d04_simhash — 64-bit SimHash over the distinct word set, near-dup
    * pairs by Hamming distance. Candidate generation: 4 x 16-bit
    * chunks (pigeonhole: hamming <= 3 pairs must share a chunk), so
    * the join is chunk-bucket-local, then exact popcount verify. */
  def simHash(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = documents
      .withColumn("toks", array_distinct(split(lower(col("text")), "\\s+")))
      .filter(size(col("toks")) > 0)
      .withColumn("hs", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("bitsums", expr(
        """aggregate(hs, array_repeat(0L, 64),
           (acc, h) -> zip_with(acc, sequence(0, 63),
             (a, j) -> a + IF((shiftright(h, j) & 1) = 1, 1, -1)))"""))
      .withColumn("simhash", expr(
        """aggregate(zip_with(bitsums, sequence(0, 63),
             (s, j) -> IF(s > 0, shiftleft(1L, j), 0L)),
           0L, (a, x) -> a + x)"""))
      .select(col("doc_id"), col("simhash"))
    val chunks = fp.withColumn("chunk", explode(expr(
        "transform(sequence(0, 3), c -> struct(c AS ci, shiftright(simhash, c*16) & 65535 AS cv))")))
      .select(col("doc_id"), col("simhash"), col("chunk.ci").as("ci"), col("chunk.cv").as("cv"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** d05_embed_dedup — embedding-cosine near-dup pairs. Brute-force
    * all-pairs is the correctness baseline (the oracle); the
    * bucketed-ANN scale path lives in graft.ann. All arithmetic is
    * sequential double so the oracle reproduces it bit-for-bit. */
  def embedDedup(embeddings: DataFrame, threshold: Double = 0.5): DataFrame = {
    val v = embeddings
      .withColumn("vd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr("sqrt(aggregate(vd, 0.0D, (a, x) -> a + x*x))"))
      .select(col("vec_id"), col("vd"), col("nrm"))
    v.select(col("vec_id").as("vec_a"), col("vd").as("va"), col("nrm").as("na"))
      .join(v.select(col("vec_id").as("vec_b"), col("vd").as("vb"), col("nrm").as("nb")),
        col("vec_a") < col("vec_b"))
      .withColumn("sim",
        expr("aggregate(zip_with(va, vb, (x, y) -> x*y), 0.0D, (a, p) -> a + p)") /
          (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), stableRound(col("sim"), 4).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }
}
