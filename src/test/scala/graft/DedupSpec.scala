package graft

import graft.dedup.Dedup
import org.apache.spark.sql.Row

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("exactDedup keeps min doc_id per identical text with dup count") {
    val d = docs(0L -> "a b c", 1L -> "a b c", 2L -> "x y z", 3L -> "a b c")
    val out = Dedup.exactDedup(d).collect()
    assert(out.toSeq == Seq(Row(0L, 3L), Row(2L, 1L)))
  }

  test("ngramJaccard finds the planted near-dup pair and nothing else") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val other = "completely different words forming another document entirely here now"
    val d = docs(0L -> base, 1L -> near, 2L -> other)
    val out = Dedup.ngramJaccard(d, threshold = 0.5).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 0L && out(0).getLong(1) == 1L)
    assert(out(0).getDouble(2) > 0.5 && out(0).getDouble(2) < 1.0)
  }

  test("minHashLsh reproduces the exact ngramJaccard result") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val other = "completely different words forming another document entirely here now"
    val d = docs(0L -> base, 1L -> near, 2L -> other, 3L -> (base + " extra"))
    val exact = Dedup.ngramJaccard(d, threshold = 0.5).collect().toSeq
    val lsh = Dedup.minHashLsh(d, threshold = 0.5, numHashes = 128, bands = 32).collect().toSeq
    assert(lsh == exact)
  }

  test("simHash: identical docs at hamming 0, disjoint docs filtered out") {
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight")
    val out = Dedup.simHash(d, maxHamming = 3).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 0L && out(0).getLong(1) == 1L && out(0).getInt(2) == 0)
  }

  test("embedDedup flags only the high-cosine pair") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embedDedup(vecs, threshold = 0.95).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 0L && out(0).getLong(1) == 1L)
    assert(out(0).getDouble(2) > 0.99)
  }
}
