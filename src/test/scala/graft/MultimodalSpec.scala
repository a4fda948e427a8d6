package graft

import graft.multimodal.BinaryPipeline

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("binaryMeta extracts byte-level metadata") {
    val d = Seq((0L, "hello")).toDF("doc_id", "text")
    val r = BinaryPipeline.binaryMeta(d).collect()(0)
    assert(r.getInt(1) == 5)
    assert(r.getString(3) ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    assert(r.getInt(4) == 'h'.toInt)
  }

  test("chunkSample keeps every 4th 64-byte chunk") {
    val text = "x" * 300 // chunks 0..4 -> keep 0 and 4
    val d = Seq((0L, text)).toDF("doc_id", "text")
    val rows = BinaryPipeline.chunkSample(d).collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 4))
    assert(rows(0).getInt(2) == 64)
    assert(rows(1).getInt(2) == 300 - 4 * 64)
  }

  test("empty payloads produce no chunks (sequence(0,-1) would descend)") {
    val d = Seq((0L, ""), (1L, "x" * 64)).toDF("doc_id", "text")
    assert(BinaryPipeline.chunkSample(d).collect().forall(_.getLong(0) == 1L))
    assert(BinaryPipeline.chunkDedup(d).collect().isEmpty)
  }

  test("chunkDedup pairs payloads sharing enough distinct blocks, dfCap drops hot blocks") {
    val bX = "x" * 64; val bY = "y" * 64; val bZ = "z" * 64; val bW = "w" * 64
    val d = Seq(
      (0L, bX + bY),       // shares X,Y with doc 1 → pair
      (1L, bX + bY + bZ),
      (2L, bX + bW),       // shares only X → below minShared
      (3L, "unique " * 20)
    ).toDF("doc_id", "text")
    val pairs = BinaryPipeline.chunkDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((0L, 1L, 2L)), s"got ${pairs.toSeq}")
    // dfCap = 1: the shared X/Y blocks are all hotter than the cap → no pairs
    assert(BinaryPipeline.chunkDedup(d, dfCap = 1L).collect().isEmpty)
  }

  test("cdcDedup catches the one-byte-prefixed copy that fixed-stride chunkDedup misses") {
    // deterministic non-repetitive content, long enough for ~8 CDC chunks
    val rnd = new scala.util.Random(7)
    val base = Iterator.continually(rnd.alphanumeric.head).take(400).mkString
    val d = Seq(
      (0L, base),
      (1L, "X" + base), // one inserted byte: every fixed 64-byte block shifts
      (2L, Iterator.continually(rnd.alphanumeric.head).take(400).mkString)
    ).toDF("doc_id", "text")
    // boundary re-sync on the raw hashes: the shifted copy shares chunks
    graft.functions.GraftFunctions.register(spark)
    val Array(ha, hb, hc) = d.orderBy("doc_id")
      .selectExpr("graft_cdc_hashes(cast(text AS BINARY), 16, 5) AS h")
      .collect().map(_.getSeq[Long](0).toSet)
    assert((ha intersect hb).size >= 2,
      s"CDC chunks must re-synchronize after the prefix: ${(ha intersect hb).size} shared")
    assert((ha intersect hc).isEmpty, "unrelated payloads share nothing")
    // the operator pair-level contrast: m07 pairs (0,1); m06 cannot
    val cdc = BinaryPipeline.cdcDedup(d).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cdc.toSeq == Seq((0L, 1L)), s"got ${cdc.toSeq}")
    val fixed = BinaryPipeline.chunkDedup(d).collect()
    assert(fixed.isEmpty, s"fixed-stride blocks must all shift dark, got ${fixed.toSeq}")
  }

  test("cdcDedup candidate volume stays near-zero on 1e4 distinct random payloads") {
    import org.apache.spark.sql.functions._
    // 10^4 unrelated 256-byte payloads (hex of chained xxhash64): CDC
    // chunks of unrelated content must not collide, so the pair join
    // stays empty-ish — a degenerate boundary rule (e.g. every forced
    // cut emitting an identical sliver) would blow this up n²-style
    val n = 10000L
    val d = spark.range(n).select(col("id").as("doc_id"),
      expr("array_join(transform(sequence(0, 15), j -> hex(xxhash64(id * 16 + j))), '')")
        .as("text"))
    val pairs = BinaryPipeline.cdcDedup(d, minShared = 1).count()
    assert(pairs < n / 20, s"CDC pair volume $pairs degenerated for n=$n")
  }

  test("storageSavings sizes the block store: planted copies collapse, empties excluded") {
    val blockA = "a" * 64
    val blockB = "b" * 64
    // three prose docs: two identical (128 B), one half-shared, plus
    // an empty doc that must be invisible to every column
    val d = Seq(
      (0L, blockA + blockB), (1L, blockA + blockB), (2L, blockA + ("c" * 64)),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = BinaryPipeline.storageSavings(d).collect()
    assert(r.length == 1 && r(0).getString(0) == "prose", "empty doc must not route")
    val row = r(0)
    assert(row.getLong(1) == 3, "n_docs counts non-empty docs only")
    assert(row.getLong(2) == 384, s"logical bytes: ${row.getLong(2)}")
    // distinct blocks: aaa, bbb, ccc
    assert(row.getLong(3) == 3 && row.getLong(4) == 192,
      s"store holds 3 x 64B blocks: ${row.getLong(3)} / ${row.getLong(4)}")
    assert(row.getDouble(5) == 2.0, s"dedup ratio: ${row.getDouble(5)}")
    // a short tail block is stored at its true length
    val tail = BinaryPipeline.storageSavings(
      Seq((0L, blockA + "zz")).toDF("doc_id", "text")).collect()(0)
    assert(tail.getLong(4) == 66, s"tail bytes: ${tail.getLong(4)}")
  }

  test("modalityRoute dispatches payloads by leading byte class") {
    val d = Seq(
      (0L, """{"k": 1}"""),
      (1L, "<html>hi</html>"),
      (2L, "42 is a number"),
      (3L, "plain prose text"),
      (4L, "  leading space")
    ).toDF("doc_id", "text")
    val out = graft.multimodal.BinaryPipeline.modalityRoute(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("json" -> 1L, "markup" -> 1L, "numeric" -> 1L,
      "prose" -> 1L, "other" -> 1L))
  }

  test("decoded features feed the ANN index: multimodal -> embedding pipeline composes") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = graft.multimodal.BinaryPipeline.decodeFeatures(docs, featureDim = 8)
      .selectExpr("doc_id AS vec_id", "feature AS embedding")
    val cells = graft.ann.Ann.kmeansAssign(feats, k = 4, iters = 2).collect()
    assert(cells.length == docs.count())
    assert(cells.map(_.getInt(1)).distinct.length > 1, "all docs in one cell")
  }

  test("featureDedup manifests every payload; byte-identical payloads are mutual NNs at cos 1.0") {
    // docs 0/2 are byte-identical (the re-upload case); 1 and 3 differ
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "completely different content with its own byte pattern here"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "yet another unrelated payload of distinct bytes entirely")
    ).toDF("doc_id", "text")
    val rows = BinaryPipeline.featureDedup(d, threshold = 0.999).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L), "one manifest row per payload")
    // identical bytes -> identical stub features -> same IVF cell ->
    // mutual nearest neighbours at exactly 1.0, flagged dup
    assert(rows(0L) == (2L, 1.0, true), s"got ${rows(0L)}")
    assert(rows(2L) == (0L, 1.0, true), s"got ${rows(2L)}")
  }

  test("decodeFeatures produces the stub feature schema per row") {
    val d = Seq((0L, "hello"), (1L, "world")).toDF("doc_id", "text")
    val out = BinaryPipeline.decodeFeatures(d, featureDim = 4).collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "text/plain")
    assert(out(0).getInt(2) == 5)
    assert(out(0).getSeq[Float](3).length == 4)
    // deterministic: same input -> same features
    val again = BinaryPipeline.decodeFeatures(d, featureDim = 4).collect()
    assert(out(0).getSeq[Float](3) == again(0).getSeq[Float](3))
  }

  test("chunkContainment flags the appended-tail lineage direction m07 cannot express") {
    import spark.implicits._
    // doc 1 = doc 0 + a long appended tail: every chunk of 0 except
    // possibly its FINAL one (whose forced end-cut lands mid-content
    // once the tail continues) recurs in 1, so C(0→1) ≈ 1 while
    // C(1→0) dilutes under threshold
    val rnd = new scala.util.Random(11)
    val base = Iterator.continually(rnd.alphanumeric.head).take(400).mkString
    val tail = Iterator.continually(rnd.alphanumeric.head).take(400).mkString
    val d = Seq(
      (0L, base), (1L, base + tail),
      (2L, Iterator.continually(rnd.alphanumeric.head).take(400).mkString)
    ).toDF("doc_id", "text")
    val out = BinaryPipeline.chunkContainment(d, threshold = 0.8, minChunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((0L, 1L)), s"got ${out.toSeq}")
    assert(out(0)._3 >= 0.85, s"contained version must score near 1: ${out.toSeq}")
    graft.Caches.release()
  }

  test("payloadEntropy matches the hand twin; power-of-two cases are exact; routing thresholds") {
    import spark.implicits._
    val d = Seq(
      (0L, "aaaaaaaa"),          // one symbol → exactly 0 bits
      (1L, "abababab"),          // two equal symbols → exactly 1 bit
      (2L, "abcd"),              // four equal → exactly 2 bits
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "")                   // empty → 0, degenerate
    ).toDF("doc_id", "text")
    val out = BinaryPipeline.payloadEntropy(d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getString(3)))).toMap
    assert(out(0L) == ((8, 0.0, "degenerate")))
    assert(out(1L) == ((8, 1.0, "degenerate")))
    assert(out(2L) == ((4, 2.0, "compress")))
    assert(out(4L)._2 == 0.0 && out(4L)._3 == "degenerate")
    // float-for-float twin of the compiled loop on real text
    val text3 = "the quick brown fox jumps over the lazy dog"
    val twin = {
      val bytes = text3.getBytes("UTF-8")
      val hist = new Array[Long](256)
      bytes.foreach(b => hist(b & 0xff) += 1)
      var h = 0.0
      (0 until 256).foreach { b =>
        if (hist(b) > 0) {
          val p = hist(b) / bytes.length.toDouble
          h -= p * (math.log(p) / math.log(2.0))
        }
      }
      math.floor(h * 10000 + 0.5) / 10000
    }
    assert(out(3L)._2 == twin && out(3L)._3 == "compress", s"got ${out(3L)} vs $twin")
    assert(out(3L)._2 > 3.5 && out(3L)._2 < 5.0, "english text sits near 4 bits/byte")
    // a uniform 256-symbol payload scores exactly 8 (the max)
    val uniform = (0 until 256).map(_.toByte).toArray
    assert(graft.functions.ByteEntropy.compute(uniform) == 8.0)
    assert(graft.functions.ByteEntropy.compute(Array.empty[Byte]) == 0.0)
  }

  test("m12 blockhash pairs lightly-edited payloads and ignores unrelated ones") {
    import spark.implicits._
    val base = ("The quick brown fox jumps over the lazy dog. " * 40)
    // doc 2 = doc 1 with a few edited bytes; doc 3 unrelated; doc 4 = exact copy
    val docs = Seq(
      (1L, base, "en", "s", base.length.toLong),
      (2L, base.updated(100, 'X').updated(700, 'Y'), "en", "s", base.length.toLong),
      (3L, scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .alphanumeric.take(base.length).mkString, "en", "s", base.length.toLong),
      (4L, base, "en", "s", base.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = graft.multimodal.BinaryPipeline.payloadBlockhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 0, "exact copy: hamming 0")
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 3, "light edit within radius")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L), "unrelated payload unpaired")
  }

  test("m13 blockhash clusters resolve the pair graph transitively with min-id canonicals") {
    import spark.implicits._
    val base = ("The quick brown fox jumps over the lazy dog. " * 40)
    // 1 ~ 2 (light edit), 1 ~ 4 (exact copy): one cluster {1,2,4};
    // 3 unrelated singleton; 5 another exact pair with 6
    val other = ("Pack my box with five dozen liquor jugs today. " * 40)
    val docs = Seq(
      (1L, base), (2L, base.updated(100, 'X').updated(700, 'Y')),
      (3L, scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .alphanumeric.take(base.length).mkString),
      (4L, base), (5L, other), (6L, other)
    ).toDF("doc_id", "text")
    val out = graft.multimodal.BinaryPipeline.blockhashClusters(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // transitive closure: 2 and 4 never paired directly against each
    // other in any asserted order, yet all three share min-id label 1
    assert(Seq(1L, 2L, 4L).forall(out(_)._1 == 1L), s"got $out")
    assert(out(1L)._2 && !out(2L)._2 && !out(4L)._2, "min-id member is the one canonical")
    assert(out(3L) == ((3L, true)), "unrelated payload is its own canonical singleton")
    assert(out(5L) == ((5L, true)) && out(6L) == ((5L, false)), "second cluster intact")
  }

  test("m14 chunk store roundtrips every byte; shared chunks store once; bounds cover payloads") {
    import spark.implicits._
    // non-repetitive content: CDC re-sync needs natural gear cuts —
    // perfectly periodic text degenerates to fixed-stride forced cuts
    // (no content signal to re-anchor on), the documented CDC caveat
    val rnd = new scala.util.Random(11)
    val base = Iterator.continually(rnd.alphanumeric.head).take(2700).mkString
    // doc 2 = exact copy (shares ALL chunks); doc 3 = one byte inserted
    // mid-payload (shift-invariance: most chunks still shared); doc 4
    // empty; doc 5 shorter than minLen (single tail chunk)
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, base.substring(0, 1000) + "X" + base.substring(1000)),
      (4L, ""), (5L, "tiny")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_m14").toString
    val out = graft.multimodal.BinaryPipeline.chunkStoreRoundtrip(docs, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    // every payload roundtrips byte-for-byte, including empty and tiny
    assert(out.values.forall(_._3), s"roundtrip failures: $out")
    assert(out(4L)._1 == 0L && out(4L)._2 == 0, "empty payload: no chunks")
    assert(out(5L)._1 == 1L, "sub-minLen payload must still land as its tail chunk")
    // content addressing: the exact copy adds ZERO new chunks, and the
    // one-byte edit shares most of its chunks with the original
    val recipes = spark.read.parquet(dir + "/recipes")
    val chunks = spark.read.parquet(dir + "/chunks").count()
    val refs = recipes.count()
    assert(chunks < refs, s"store must dedup: $chunks distinct vs $refs refs")
    val h1 = recipes.filter($"doc_id" === 1L).select("chunk_hash")
      .collect().map(_.getLong(0)).toSet
    val h2 = recipes.filter($"doc_id" === 2L).select("chunk_hash")
      .collect().map(_.getLong(0)).toSet
    val h3 = recipes.filter($"doc_id" === 3L).select("chunk_hash")
      .collect().map(_.getLong(0)).toSet
    assert(h2 == h1, "exact copy shares every chunk")
    assert((h3 intersect h1).size * 2 > h1.size,
      s"CDC shift-invariance: the one-byte edit must share most chunks (${(h3 intersect h1).size}/${h1.size})")
    // bounds law: compiled bounds tile the payload exactly
    val b = graft.functions.CdcChunkBounds.compute(base.getBytes("UTF-8"), 32, 6)
    val pairs = (0 until b.numElements() by 2)
      .map(i => (b.getInt(i), b.getInt(i + 1)))
    assert(pairs.head._1 == 0 && pairs.map(_._2).sum == base.length,
      "bounds must cover every byte")
    assert(pairs.sliding(2).forall { case Seq((s1, l1), (s2, _)) => s1 + l1 == s2
      case _ => true }, "bounds must be contiguous")
  }

  test("chunk store re-ingest: a later batch's version of a doc_id supersedes the old recipes") {
    import spark.implicits._
    import graft.multimodal.BinaryPipeline
    val rnd = new scala.util.Random(23)
    val v1 = Iterator.continually(rnd.alphanumeric.head).take(1500).mkString
    val v2 = v1.substring(0, 700) + "EDITED-REUPLOAD" + v1.substring(700)
    val dir = java.nio.file.Files.createTempDirectory("graft_m14r").toString
    BinaryPipeline.writeChunkStore(
      Seq((1L, v1), (2L, v1)).toDF("doc_id", "text"), dir, batchId = Some(-1L))
    // re-upload doc 1 with edited content in a LATER batch: the old
    // batch's recipe rows stay on disk (append only overwrites its own
    // partition) — reassembly must keep ONLY the latest version, not
    // concatenate both versions' chunks
    BinaryPipeline.appendChunkStore(Seq((1L, v2)).toDF("doc_id", "text"), dir, 0L)
    val rebuilt = BinaryPipeline.readChunkStore(spark, dir).collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(rebuilt(1L) == v2, "re-uploaded doc must reassemble to its LATEST version")
    assert(rebuilt(2L) == v1, "untouched doc keeps its seeded version")
    // replay of the re-upload batch changes nothing (overwrite-own-partition)
    BinaryPipeline.appendChunkStore(Seq((1L, v2)).toDF("doc_id", "text"), dir, 0L)
    val again = BinaryPipeline.readChunkStore(spark, dir).collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(again == rebuilt, "replayed re-upload must be a no-op")
  }

  test("m15 vacuum reclaims superseded versions' chunks; store still roundtrips; idempotent") {
    import spark.implicits._
    import graft.multimodal.BinaryPipeline
    val rnd = new scala.util.Random(31)
    val v1 = Iterator.continually(rnd.alphanumeric.head).take(1600).mkString
    val v2 = Iterator.continually(rnd.alphanumeric.head).take(1600).mkString // fully fresh content
    val keepV1 = Iterator.continually(rnd.alphanumeric.head).take(1200).mkString
    val dir = java.nio.file.Files.createTempDirectory("graft_m15").toString
    BinaryPipeline.writeChunkStore(
      Seq((1L, v1), (2L, keepV1)).toDF("doc_id", "text"), dir, batchId = Some(-1L))
    // re-upload doc 1 with ENTIRELY new content: every old doc-1 chunk
    // becomes garbage (none shared with doc 2's distinct content)
    BinaryPipeline.appendChunkStore(Seq((1L, v2)).toDF("doc_id", "text"), dir, 0L)
    val rep = BinaryPipeline.vacuumChunkStore(spark, dir).collect().head
    val (before, after, bytes, recs) =
      (rep.getLong(0), rep.getLong(1), rep.getLong(2), rep.getLong(3))
    assert(before > after && bytes > 0L && recs > 0L,
      s"superseded v1 chunks must reclaim: before=$before after=$after bytes=$bytes recs=$recs")
    // the survivor set is exactly what a FRESH store of the live
    // corpus would hold (content-defined boundaries are replayable)
    val freshDir = java.nio.file.Files.createTempDirectory("graft_m15f").toString
    BinaryPipeline.writeChunkStore(
      Seq((1L, v2), (2L, keepV1)).toDF("doc_id", "text"), freshDir)
    assert(after == spark.read.parquet(freshDir + "/chunks").count(),
      "vacuum must keep exactly the live corpus's chunk set")
    // the vacuumed store still reassembles the LATEST versions exactly
    val rebuilt = BinaryPipeline.readChunkStore(spark, dir).collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(rebuilt == Map(1L -> v2, 2L -> keepV1),
      "post-vacuum reassembly must serve the live versions byte-exactly")
    // idempotent: a second vacuum finds nothing to reclaim
    val rep2 = BinaryPipeline.vacuumChunkStore(spark, dir).collect().head
    assert(rep2.getLong(2) == 0L && rep2.getLong(3) == 0L,
      s"second vacuum must be a no-op: $rep2")
    // replay-after-vacuum convergence: the re-upload trigger re-fires,
    // re-landing its partition; the store reads the same
    BinaryPipeline.appendChunkStore(Seq((1L, v2)).toDF("doc_id", "text"), dir, 0L)
    val again = BinaryPipeline.readChunkStore(spark, dir).collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(again == rebuilt, "replayed trigger after vacuum must converge")
  }

  test("m15 vacuum crash safety: unpublished snapshot generations are invisible; publish is one pointer; GC keeps a grace copy") {
    import spark.implicits._
    import graft.multimodal.BinaryPipeline
    val rnd = new scala.util.Random(37)
    val v1 = Iterator.continually(rnd.alphanumeric.head).take(1500).mkString
    val v2 = Iterator.continually(rnd.alphanumeric.head).take(1500).mkString
    val dir = java.nio.file.Files.createTempDirectory("graft_m15c").toString
    BinaryPipeline.writeChunkStore(
      Seq((1L, v1)).toDF("doc_id", "text"), dir, batchId = Some(-1L))
    BinaryPipeline.appendChunkStore(Seq((1L, v2)).toDF("doc_id", "text"), dir, 0L)
    // simulate a vacuum that crashed MID-STAGING: a partial survivor
    // copy sits under the next snapshot generation, UNMARKED — no
    // reader ever resolves into it, originals untouched
    spark.read.parquet(dir + "/chunks").limit(1)
      .write.parquet(dir + "/snapshot=1/chunks")
    val mid = BinaryPipeline.readChunkStore(spark, dir).collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(mid == Map(1L -> v2), "crashed-vacuum staging must not affect readers")
    // a rerun clears the stale staging generation and publishes whole
    val rep = BinaryPipeline.vacuumChunkStore(spark, dir).collect().head
    assert(rep.getLong(2) > 0L, s"rerun vacuum must reclaim the superseded v1: $rep")
    val post = BinaryPipeline.readChunkStore(spark, dir).collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(post == Map(1L -> v2), "post-rerun store must serve the live version")
    // the legacy (pre-publish) copy is RETAINED as the racing-reader
    // grace window: a reader that resolved generation 0 just before
    // the publish still reads a complete, consistent store
    val root = new java.io.File(dir)
    assert(new java.io.File(root, "chunks").isDirectory &&
      new java.io.File(root, "recipes").isDirectory,
      "the previous generation must survive one publish as the grace copy")
    assert(new java.io.File(root, "_snapshot.1").isFile,
      "publish must be the single marker-file create")
    // the NEXT maintenance pass GCs it: after a second vacuum only the
    // two newest generations exist and the store still reads the same
    BinaryPipeline.appendChunkStore(Seq((1L, v1)).toDF("doc_id", "text"), dir, 1L)
    BinaryPipeline.vacuumChunkStore(spark, dir).collect()
    assert(!new java.io.File(root, "chunks").exists &&
      !new java.io.File(root, "recipes").exists,
      "the second publish must GC the generation-0 legacy copy")
    assert(!new java.io.File(root, "_snapshot.0").exists &&
      new java.io.File(root, "_snapshot.2").isFile)
    val after2 = BinaryPipeline.readChunkStore(spark, dir).collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(after2 == Map(1L -> v1), "store must serve the latest append after GC")
  }

  test("m16 payload sweep: one planted positive per regime lights exactly its flag; survivors keep") {
    import spark.implicits._
    import graft.multimodal.BinaryPipeline
    val rnd = new scala.util.Random(53)
    def blob(n: Int) = Iterator.continually(rnd.alphanumeric.head).take(n).mkString
    val a = blob(600)
    val sharedTail = blob(300); val x = blob(400); val y = blob(400)
    val c6 = blob(900); val c5 = c6.substring(0, 500)
    val p7 = blob(600)
    // perceptual twin: alternate +1/−1 every 12th byte — every CDC
    // chunk (minLen 16) is touched so ZERO chunks survive shared, but
    // block means barely move and the global mean cancels → the
    // block-mean hash stays within the hamming radius
    val p8 = p7.zipWithIndex.map { case (ch, i) =>
      if (i % 12 == 0) (if ((i / 12) % 2 == 0) (ch + 1) else (ch - 1)).toChar
      else ch
    }.mkString
    val docs = Seq(
      (1L, a), (2L, a),                   // exact pair
      (3L, x + sharedTail), (4L, y + sharedTail), // near: shared block, C < t both ways
      (5L, c5), (6L, c6),                 // lineage: 5 is a strict prefix of 6
      (7L, p7), (8L, p8)                  // perceptual: in-place light edit
    ).toDF("doc_id", "text")
    val out = BinaryPipeline.payloadSweep(docs).collect().map(r =>
      r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getString(5)))).toMap
    // survivors of every regime keep — including the lineage CONTAINER
    // (the near-regime routing: a truncation pair must never let the
    // min-id canonical remove the container)
    for (id <- Seq(1L, 3L, 6L, 7L))
      assert(out(id)._5 == "keep", s"doc $id: ${out(id)}")
    // exact copy: digest, mutual-containment dominance and perceptual
    // all fire; the pair routes OUT of near clustering (lineage owns
    // identical/asymmetric pairs); precedence = exact
    assert(out(2L) == ((true, false, true, true, "exact")), s"got ${out(2L)}")
    assert(out(4L) == ((false, true, false, false, "near")), s"got ${out(4L)}")
    assert(out(5L) == ((false, false, true, false, "contained")), s"got ${out(5L)}")
    assert(out(8L) == ((false, false, false, true, "perceptual")), s"got ${out(8L)}")
    graft.Caches.release()
  }

  test("m12 blockhash laws: compiled = Scala compute; empty hashes to 0; pigeonhole is recall-exact to h<=3") {
    import graft.functions.BlockMeanHash
    assert(BlockMeanHash.compute(Array.empty[Byte]) == 0L)
    val bytes = Array.tabulate(1000)(i => ((i * 31 + 7) % 256).toByte)
    // flipping high-value bytes in one block moves at most a few bits
    val edited = bytes.clone(); edited(10) = 0; edited(11) = 0
    val h1 = BlockMeanHash.compute(bytes); val h2 = BlockMeanHash.compute(edited)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 3)
    // recall exactness of the 4-block keys: any pair at hamming <= 3
    // shares at least one untouched 16-bit block (pigeonhole)
    for (seedFlips <- Seq(Seq(0), Seq(1, 17), Seq(2, 21, 63))) {
      val flipped = seedFlips.foldLeft(h1)((h, b) => h ^ (1L << b))
      val shares = (0 until 4).exists(b =>
        ((h1 >> (16 * b)) & 0xffffL) == ((flipped >> (16 * b)) & 0xffffL))
      assert(shares, s"flips $seedFlips must leave one key block intact")
    }
  }
}
