package graft

import graft.sources.Sources
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("grp", StringType)))

  private def sample = Seq((1L, "a", "g1"), (2L, "b", "g2"), (3L, "c", "g1"))
    .toDF("id", "name", "grp")

  test("csv roundtrip with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Sources.readCsv(spark, dir, schema)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(back.schema == schema)
  }

  test("json roundtrip with explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = Sources.readJson(spark, dir, schema)
    assert(back.count() == 3)
  }

  test("upsertPartitioned replaces keys and rewrites only touched partitions") {
    val dir = Files.createTempDirectory("graft_upsert").toString
    val base = Seq((1L, "old1", "p1"), (2L, "old2", "p1"), (3L, "keep3", "p2"))
      .toDF("id", "name", "grp")
    Sources.writePartitioned(base, dir, Seq("grp"))
    val p2 = new java.io.File(s"$dir/grp=p2")
    val before = p2.listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified, f.length)).toSet
    val updates = Seq((2L, "new2", "p1"), (4L, "new4", "p1")).toDF("id", "name", "grp")
    Sources.upsertPartitioned(spark, dir, updates, "grp", "id")
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(out == Map(1L -> "old1", 2L -> "new2", 3L -> "keep3", 4L -> "new4"), s"got $out")
    val after = p2.listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified, f.length)).toSet
    assert(after == before, "untouched partition must not be rewritten")
  }

  test("partitioned parquet write produces partition dirs and prunes") {
    val dir = Files.createTempDirectory("graft_part").toString
    Sources.writePartitioned(sample, dir, Seq("grp"))
    assert(new java.io.File(dir).list().exists(_.startsWith("grp=")))
    val pruned = Sources.readParquet(spark, dir).filter($"grp" === "g1")
    assert(pruned.count() == 2)
    // partition pruning visible in the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.count() == 2)
  }

  test("jdbc write + predicate-parallel read roundtrip via embedded Derby") {
    // Derby ships on Spark's classpath (the Hive-metastore engine), so
    // the JDBC path is exercisable fully in-JVM — the same code reaches
    // MySQL/Postgres by swapping the url.
    val dbDir = Files.createTempDirectory("graft_derby").toString
    val url = s"jdbc:derby:$dbDir/graftdb;create=true"
    Sources.writeJdbc(sample, url, "graft_results")
    val back = Sources.readJdbc(spark, url, "graft_results",
      partitionColumn = "id", lowerBound = 1L, upperBound = 4L, numPartitions = 3)
    assert(back.rdd.getNumPartitions == 3, "predicate-parallel read should split")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // append mode lands new rows without dropping the table
    Sources.writeJdbc(Seq((4L, "d", "g2")).toDF("id", "name", "grp"),
      url, "graft_results", mode = "append")
    assert(Sources.readJdbc(spark, url, "graft_results", "id", 1L, 5L, 2).count() == 4)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sources.writeBucketed(sample, "graft_bucketed_a", "id", 4)
      Sources.writeBucketed(sample.selectExpr("id", "name AS name2"),
        "graft_bucketed_b", "id", 4)
      val j = Sources.readTable(spark, "graft_bucketed_a")
        .join(Sources.readTable(spark, "graft_bucketed_b"), "id")
      assert(j.count() == 3)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writeSorted produces range-disjoint, internally sorted files (data-skipping layout)") {
    val dir = Files.createTempDirectory("graft_sorted").toString
    // ids arrive scrambled across partitions — the layout must impose order
    val d = (0L until 400L).map(i => ((i * 2654435761L) % 400L, s"v$i"))
      .toDF("id", "v").repartition(8)
    Sources.writeSorted(d, dir, "id", numFiles = 4)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f).collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"file $f not sorted within itself")
      (ids.min, ids.max)
    }
    // key ranges must be pairwise disjoint: that is what lets min/max
    // stats skip whole files for a selective predicate
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlapping ranges: ${ranges.toSeq}")
      case _ =>
    }
    // and the layout loses nothing
    assert(spark.read.parquet(dir).count() == d.count())
  }

  test("writeZordered confines EVERY clustered column per file; single-column sort cannot") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val rnd = new scala.util.Random(42)
    val d = Seq.fill(4000)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y").repartition(8)
    Sources.writeZordered(d, dir, Seq("x", "y"), numFiles = 16)
    def spreads(f: String) = {
      val rows = spark.read.parquet(f).collect()
      val xs = rows.map(_.getLong(0)); val ys = rows.map(_.getLong(1))
      ((xs.max - xs.min).toDouble / 999, (ys.max - ys.min).toDouble / 999)
    }
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 16)
    val sp = files.map(spreads)
    val mx = sp.map(_._1).sum / sp.length
    val my = sp.map(_._2).sum / sp.length
    // 16 z-range files pin the top z bits = the top bits of BOTH
    // columns' bucket ids — each column is confined to ~a quarter of
    // its range per file (0.5 allows range-boundary straddle)
    assert(mx < 0.5, s"x mean per-file spread $mx — not clustered")
    assert(my < 0.5, s"y mean per-file spread $my — not clustered")
    // contrast: the single-column layout leaves y unclustered —
    // that is the gap z-ordering exists to close
    val dirS = Files.createTempDirectory("graft_sorted1").toString
    Sources.writeSorted(d, dirS, "x", numFiles = 16)
    val spS = new java.io.File(dirS).listFiles
      .filter(_.getName.endsWith(".parquet")).map(f => spreads(f.toString))
    assert(spS.map(_._2).sum / spS.length > 0.75,
      "y per-file spread should stay ~global under a single-column sort")
    // and the layout loses nothing
    assert(spark.read.parquet(dir).count() == 4000)
  }

  test("writeZordered stays correct past 31 z-bits (long shifts, no int wrap)") {
    // 4 cols x 10 bits = 40 z-bits: column 3's top bucket bit lands at
    // z-bit 39 — an int shiftleft would mask it to bit 7 and scramble
    // the interleave (the pre-fix failure). With correct long shifts,
    // EVERY column is still confined per file.
    val dir = Files.createTempDirectory("graft_zorder40").toString
    val rnd = new scala.util.Random(7)
    val d = Seq.fill(4000)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("a", "b", "c", "e").repartition(8)
    Sources.writeZordered(d, dir, Seq("a", "b", "c", "e"),
      numFiles = 16, bitsPerCol = 10)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    val spreads = files.map { f =>
      val rows = spark.read.parquet(f).collect()
      (0 until 4).map(i => {
        val v = rows.map(_.getLong(i)); (v.max - v.min).toDouble / 999
      })
    }
    val means = (0 until 4).map(i => spreads.map(_(i)).sum / spreads.length)
    // 16 files pin the top 4 z-bits = each column's TOP bucket bit;
    // plain Morton straddle smears the low-z-bit columns more (cell-
    // boundary crossings flip column 0's bit most often), so correct
    // interleave measures ~(0.83, 0.63, 0.55, 0.50) here while the
    // int-wrap bug (top bits masked onto z-bits 0..7) measured
    // ~(0.96, 0.90, 0.89, 0.87) — every column near-global. The
    // thresholds sit between the two regimes.
    assert(means.sum / 4 < 0.75, s"overall mean ${means.sum / 4}: $means")
    assert(means(2) < 0.7 && means(3) < 0.65,
      s"high-z columns must confine tightly: $means")
    assert(spark.read.parquet(dir).count() == 4000)
  }

  test("compactParquet rewrites a many-small-files directory to the sized file count") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val d = (0L until 1000L).map(i => (i, s"name$i")).toDF("id", "name")
    d.repartition(20).write.mode("overwrite").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles.length == 20)
    // target far above the data size → everything fits one file
    val n = Sources.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    assert(n == 1 && parquetFiles.length == 1,
      s"expected 1 file after compaction, got ${parquetFiles.length}")
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.collect().map(_.getLong(0)).sorted.sameElements(0L until 1000L))
    // a small target splits the rewrite into multiple files again
    val n2 = Sources.compactParquet(spark, dir, targetFileBytes = 4096L,
      repartition = true)
    assert(n2 > 1 && parquetFiles.length == n2,
      s"expected $n2 files, got ${parquetFiles.length}")
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("staged-swap crash debris self-heals: stranded targets roll back, completed-swap leftovers clean up") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    // window 1: crash BETWEEN the renames — the original sits behind
    // its -old name, the target is gone; a rerun of the verb must
    // restore it instead of failing on the missing directory
    val dir1 = Files.createTempDirectory("graft_repair1").toString + "/t"
    (0L until 100L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(5).write.parquet(dir1)
    val t1 = new Path(dir1)
    assert(fs.rename(t1, new Path(t1.getParent, s".${t1.getName}.compact-old")))
    val n = Sources.compactParquet(spark, dir1, targetFileBytes = 1L << 30)
    assert(n == 1 && spark.read.parquet(dir1).count() == 100,
      "compact rerun must roll the stranded original back and complete")
    // window 2: crash AFTER the swap, before cleanup — target live,
    // -old is debris; repair deletes it and touches nothing else
    val dir2 = Files.createTempDirectory("graft_repair2").toString
    val leafParent = new java.io.File(dir2, "postings")
    (0L until 50L).map(i => (i, i % 4)).toDF("id", "bkt")
      .write.partitionBy("bkt").parquet(leafParent.toString)
    val leaf = new Path(leafParent.toString, "bkt=1")
    // plant BOTH debris shapes under one index root
    fs.rename(new Path(leafParent.toString, "bkt=2"),
      new Path(leafParent.toString, ".bkt=2.optimizeIndex-old"))
    fs.mkdirs(new Path(leafParent.toString, ".bkt=1.optimizeIndex-old"))
    assert(fs.exists(leaf))
    val repaired = Sources.repairStaged(spark, dir2)
    assert(repaired == 2, s"expected 2 repairs, got $repaired")
    assert(fs.exists(new Path(leafParent.toString, "bkt=2")),
      "stranded leaf must be rolled back")
    assert(!fs.exists(new Path(leafParent.toString, ".bkt=1.optimizeIndex-old")),
      "completed-swap debris must be cleaned")
    val back = spark.read.parquet(leafParent.toString)
    assert(back.count() == 50 &&
      back.select("bkt").distinct().count() == 4,
      "all four partitions must be probe-visible after repair")
    // idempotent: nothing left to repair
    assert(Sources.repairStaged(spark, dir2) == 0)
  }

  test("maybeOptimizeIndex: listing-only check fires the compaction past the leaf file-count threshold, holds below") {
    // an appended partitioned layout: 10 file sets per leaf (the
    // streaming-trigger decay shape)
    val dir = Files.createTempDirectory("graft_moi").toString + "/idx"
    (1 to 10).foreach { b =>
      (0L until 40L).map(i => (i + b * 1000L, (i % 4).toInt)).toDF("id", "bkt")
        .repartition(2)
        .write.mode("append").partitionBy("bkt").parquet(dir)
    }
    def leafFiles(b: Int) = new java.io.File(s"$dir/bkt=$b").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(leafFiles(0) > 16, s"fixture must decay past the threshold: ${leafFiles(0)}")
    val pre = spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // above the observed count: the policy holds, nothing rewrites
    assert(Sources.maybeOptimizeIndex(spark, dir, maxLeafFiles = 1000).isEmpty)
    assert(leafFiles(0) > 16, "a held policy must not touch the layout")
    // below it: fires, compacts every decayed leaf, content identical
    val fired = Sources.maybeOptimizeIndex(spark, dir, maxLeafFiles = 16,
      targetFileBytes = 1L << 30)
    assert(fired.contains(4), s"all 4 leaves were decayed: $fired")
    assert((0 to 3).forall(leafFiles(_) == 1), "each leaf collapses to one file")
    assert(spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet == pre,
      "content must be identical across the policy-fired compaction")
    // repaired layout holds on the next check — exactly-once per decay
    assert(Sources.maybeOptimizeIndex(spark, dir, maxLeafFiles = 16).isEmpty)
    // a leaf stranded behind its -old name by a crashed swap must not
    // hide from the check: the policy heals it first, then decides
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(s"$dir/bkt=2"),
      new Path(s"$dir/.bkt=2.optimizeIndex-old")))
    assert(Sources.maybeOptimizeIndex(spark, dir, maxLeafFiles = 16).isEmpty,
      "the stranded leaf heals and the compacted layout still holds")
    assert(new java.io.File(s"$dir/bkt=2").isDirectory,
      "the policy check must roll the stranded leaf back")
    assert(spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet == pre)
  }

  test("versioned table: snapshot reads, file-pruned MERGE, time travel") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt").toString + "/t"
    val base = (0L until 100L).map(i => (i, s"name$i")).toDF("id", "name")
    assert(VersionedTable.create(base.repartition(4, $"id"), dir) == 1L)
    // a reader planned against v1 survives a concurrent commit intact
    val snapshotReader = VersionedTable.read(spark, dir)
    val updates = Seq((7L, "SEVEN"), (200L, "fresh")).toDF("id", "name")
    assert(VersionedTable.upsert(spark, dir, Seq("id"), updates) == 2L)
    assert(snapshotReader.filter($"id" === 7L).collect()(0).getString(1) == "name7",
      "v1 reader must not see the v2 merge (snapshot isolation)")
    // v2: key replaced, insert landed, untouched rows intact
    val v2 = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2.size == 101 && v2(7L) == "SEVEN" && v2(200L) == "fresh" && v2(8L) == "name8")
    // file pruning: files without key 7 carry over by reference
    val f1 = VersionedTable.filesOf(dir, 1L).toSet
    val f2 = VersionedTable.filesOf(dir, 2L).toSet
    assert((f1 intersect f2).nonEmpty, "untouched files must carry over, not rewrite")
    assert((f1 diff f2).nonEmpty, "the touched file must be replaced")
    // time travel: v1 is still fully readable
    val v1 = VersionedTable.read(spark, dir, asOf = Some(1L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1.size == 100 && v1(7L) == "name7")
  }

  test("versioned table: restore rolls back as a new commit; history and CDC survive") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_restore").toString + "/t"
    val base = (0L until 20L).map(i => (i, s"name$i")).toDF("id", "name")
    VersionedTable.create(base, dir)
    VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((3L, "BAD"), (100L, "junk")).toDF("id", "name"))      // v2: the bad merge
    VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((5L, "WORSE")).toDF("id", "name"))                    // v3: more damage
    val v4 = VersionedTable.restore(dir, 1L)
    assert(v4 == 4L, s"restore must commit at latest+1, got $v4")
    // the live table IS v1 again — zero data movement, same files
    val now = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(now.size == 20 && now(3L) == "name3" && now(5L) == "name5" &&
      !now.contains(100L))
    assert(VersionedTable.filesOf(dir, 4L).toSet ==
      VersionedTable.filesOf(dir, 1L).toSet,
      "restore must re-point at the target's files, not rewrite them")
    // the rolled-back history stays time-travelable
    val v3 = VersionedTable.read(spark, dir, asOf = Some(3L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v3(3L) == "BAD" && v3(5L) == "WORSE" && v3(100L) == "junk")
    // a change-feed consumer synced at v3 sees the rollback as one
    // ordinary delta: the bad rows revert, the junk insert deletes
    val cdc = VersionedTable.changesBetween(spark, dir, Seq("id"), 3L, 4L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cdc.get(3L).contains("update") && cdc.get(5L).contains("update") &&
      cdc.get(100L).contains("delete"), s"got $cdc")
    // restoring a version whose log entry is gone fails loudly
    intercept[IllegalArgumentException] {
      VersionedTable.restore(dir, 99L)
    }
  }

  test("versioned table: shallow clone is zero-copy, diverges copy-on-write, vacuum-safe") {
    import graft.sources.VersionedTable
    val root = Files.createTempDirectory("graft_vt_clone")
    val src = root.toString + "/src"
    val dst = root.toString + "/dst"
    val base = (0L until 50L).map(i => (i, s"name$i")).toDF("id", "name")
    VersionedTable.create(base.repartition(4, $"id"), src)
    VersionedTable.upsert(spark, src, Seq("id"),
      Seq((7L, "SEVEN")).toDF("id", "name")) // src v2
    assert(VersionedTable.cloneTable(src, dst) == 1L)
    // zero-copy: the clone's own directory holds NO data files, and
    // its log references the source's files absolutely
    val cloneFiles = VersionedTable.filesOf(dst, 1L)
    assert(cloneFiles.nonEmpty && cloneFiles.forall(_.startsWith("/")),
      s"clone entries must be absolute refs, got ${cloneFiles.take(2)}")
    val ownDirs = Files.list(Paths.get(dst)).iterator()
    val hasData = scala.jdk.CollectionConverters.IteratorHasAsScala(ownDirs).asScala
      .exists(_.getFileName.toString.startsWith("data-"))
    assert(!hasData, "shallow clone must not copy data")
    // clone read ≡ source snapshot read
    val srcRows = VersionedTable.read(spark, src).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val dstRows = VersionedTable.read(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dstRows == srcRows)
    // copy-on-write divergence: a clone-side upsert rewrites only the
    // touched slice into the CLONE's directory; the source never moves
    VersionedTable.upsert(spark, dst, Seq("id"),
      Seq((3L, "CLONED"), (500L, "new")).toDF("id", "name"))
    val d2 = VersionedTable.read(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2.size == 51 && d2(3L) == "CLONED" && d2(500L) == "new" && d2(7L) == "SEVEN")
    val s2 = VersionedTable.read(spark, src).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s2(3L) == "name3" && !s2.contains(500L),
      "clone writes must never reach the source")
    val f2 = VersionedTable.filesOf(dst, 2L)
    assert(f2.exists(!_.startsWith("/")), "rewritten slice must live in the clone dir")
    assert(f2.count(_.startsWith("/")) < cloneFiles.size,
      "the touched imported ref must drop out of the clone's list")
    // clone-side vacuum never deletes outside the clone root: source
    // files all survive and the source still reads
    VersionedTable.vacuum(dst, retainVersions = 1, minAgeMs = 0L)
    assert(VersionedTable.read(spark, src).count() == 50L)
    assert(VersionedTable.read(spark, dst, asOf = Some(2L)).count() == 51L)
    // a clone pinned to a historical version sees that snapshot
    val dstV1 = root.toString + "/dst_v1"
    VersionedTable.cloneTable(src, dstV1, asOf = Some(1L))
    assert(VersionedTable.read(spark, dstV1).collect()
      .map(r => r.getString(1)).toSet.contains("name7"), "v1 clone predates the SEVEN merge")
    // clone refuses an existing target (create semantics)
    intercept[IllegalStateException](VersionedTable.cloneTable(src, dst))
  }

  test("versioned table: zone maps prune range reads to intersecting files, conservatively") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_zone").toString + "/t"
    // v1 lands BEFORE opt-in: its files carry no stats (conservative path)
    VersionedTable.create(Seq((0L, 0)).toDF("id", "v"), dir)
    VersionedTable.setStatsColumns(dir, Seq("v"))
    VersionedTable.upsert(spark, dir, Seq("id"),
      (1L to 400L).map(i => (i, i.toInt)).toDF("id", "v"))
    // sorted OPTIMIZE makes file ranges disjoint — the layout lever —
    // and records fresh stats for the re-clustered files
    VersionedTable.optimize(spark, dir, Seq("v"), numFiles = 8)
    val all = VersionedTable.read(spark, dir)
      .filter($"v" >= 100 && $"v" <= 120).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val prunedDf = VersionedTable.readPruned(spark, dir, "v", 100.0, 120.0)
    val pruned = prunedDf.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(pruned == all && all.size == 21, s"pruned ≠ full filter: ${pruned.size} vs ${all.size}")
    // the prune is real: far fewer files open than the snapshot holds
    val snapFiles = VersionedTable.read(spark, dir).inputFiles.length
    val prunedFiles = prunedDf.inputFiles.length
    assert(prunedFiles < snapFiles && prunedFiles <= 3,
      s"zone map must prune: $prunedFiles of $snapFiles files read")
    // out-of-range query over stats-covered files: zero rows, and only
    // the conservative no-stats files (if any remain) are touched
    assert(VersionedTable.readPruned(spark, dir, "v", 5000.0, 6000.0).count() == 0)
    // a column with no stats prunes nothing but stays correct
    val byId = VersionedTable.readPruned(spark, dir, "id", 7.0, 9.0).collect()
      .map(_.getLong(0)).toSet
    assert(byId == Set(7L, 8L, 9L))
  }

  test("versioned table: CHECK constraints refuse violating writes, SQL-null passes") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_check").toString + "/t"
    val base = Seq((1L, 10), (2L, 20)).toDF("id", "qty")
    VersionedTable.create(base, dir)
    // a constraint the snapshot violates cannot be added
    intercept[IllegalArgumentException](
      VersionedTable.addConstraint(spark, dir, "qty_big", "qty > 15"))
    VersionedTable.addConstraint(spark, dir, "qty_pos", "qty > 0")
    intercept[IllegalArgumentException](
      VersionedTable.addConstraint(spark, dir, "qty_pos", "qty > 0")) // dup name
    // violating upsert refuses BEFORE writing: version stays put
    val v0 = VersionedTable.latestVersion(dir).get
    intercept[IllegalArgumentException](VersionedTable.upsert(spark, dir,
      Seq("id"), Seq((3L, -5)).toDF("id", "qty")))
    assert(VersionedTable.latestVersion(dir).contains(v0),
      "refused upsert must not advance the version")
    // clean upsert lands; merge enforces the same gate
    assert(VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((3L, 30)).toDF("id", "qty")) == v0 + 1)
    intercept[IllegalArgumentException](VersionedTable.merge(spark, dir,
      Seq("id"), Seq((4L, 0)).toDF("id", "qty"), Seq.empty[Long].toDF("id")))
    // NULL predicate result passes (SQL-standard CHECK): rows that
    // null out a constraint's input column are not violations —
    // including the CARRIED pre-evolution rows addConstraint scans
    val widened = Seq((5L, 50, "ok")).toDF("id", "qty", "note")
    assert(VersionedTable.upsert(spark, dir, Seq("id"), widened) == v0 + 2)
    VersionedTable.addConstraint(spark, dir, "note_len", "length(note) < 100")
    val nullNote = Seq((6L, 60, null.asInstanceOf[String])).toDF("id", "qty", "note")
    assert(VersionedTable.upsert(spark, dir, Seq("id"), nullNote) == v0 + 3,
      "null CHECK result must pass")
    // dropped constraint stops gating
    assert(VersionedTable.dropConstraint(dir, "qty_pos"))
    assert(VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((7L, -1, "neg")).toDF("id", "qty", "note")) == v0 + 4)
  }

  test("versioned table: manifest export gives external engines the exact snapshot") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_manifest").toString + "/t"
    val base = (0L until 40L).map(i => (i, s"name$i")).toDF("id", "name")
    VersionedTable.create(base.repartition(3, $"id"), dir)
    VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((5L, "FIVE")).toDF("id", "name"))
    val paths = VersionedTable.writeManifest(dir)
    assert(paths.nonEmpty && paths.forall(_.startsWith("/")))
    // a plain parquet read of the manifest's paths ≡ the snapshot read
    // — the external-engine contract (no commit-log awareness needed)
    val external = spark.read.parquet(paths: _*).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val snapshot = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(external == snapshot && external(5L) == "FIVE")
    // per-version manifests coexist: v1's export names v1's files
    val v1Paths = VersionedTable.writeManifest(dir, asOf = Some(1L))
    val v1Ext = spark.read.parquet(v1Paths: _*).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1Ext(5L) == "name5", "v1 manifest must predate the FIVE merge")
    val mDir = Paths.get(dir, "_graft_manifest")
    assert(scala.jdk.CollectionConverters.IteratorHasAsScala(
      Files.list(mDir).iterator()).asScala.size == 2, "one manifest file per version")
  }

  test("versioned table: timestamp time-travel resolves commit instants, refuses pre-history") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_asof").toString + "/t"
    VersionedTable.create(Seq((1L, "a")).toDF("id", "name"), dir)
    Thread.sleep(20) // commit instants must be separable at ms grain
    val betweenV1V2 = System.currentTimeMillis()
    Thread.sleep(20)
    VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((1L, "A2"), (2L, "b")).toDF("id", "name"))
    // an instant between the publishes addresses v1; "now" addresses v2
    assert(VersionedTable.versionAsOf(dir, betweenV1V2).contains(1L))
    val old = VersionedTable.readAsOf(spark, dir, betweenV1V2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old == Map(1L -> "a"), s"got $old")
    val now = VersionedTable.readAsOf(spark, dir, System.currentTimeMillis())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(now == Map(1L -> "A2", 2L -> "b"), s"got $now")
    // before the table existed: an error, never silently-latest
    assert(VersionedTable.versionAsOf(dir, 0L).isEmpty)
    intercept[IllegalArgumentException] {
      VersionedTable.readAsOf(spark, dir, 0L)
    }
    // the restore/rsync scenario: clobber every log file's mtime (a copy
    // without preserved mtimes) — resolution must NOT change, because the
    // commit instant is stamped INSIDE the entry payload, not the inode
    val logDir = Paths.get(dir, "_graft_log")
    scala.jdk.CollectionConverters.IteratorHasAsScala(Files.list(logDir).iterator())
      .asScala.foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 86400000L)))
    assert(VersionedTable.versionAsOf(dir, betweenV1V2).contains(1L),
      "commitTs payload stamp must survive an mtime-clobbering restore")
    assert(VersionedTable.versionAsOf(dir, 0L).isEmpty)
  }

  test("versioned table: commit instants are monotone under clock step-back; schema keys cannot shadow the stamp") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.col
    // a table whose column METADATA embeds a numeric commitTs key — the
    // schema JSON lands verbatim in the log payload, so a naive
    // first-occurrence parse would read 123 as the commit instant
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("commitTs", 123L).build()
    val dir = Files.createTempDirectory("graft_vt_mono").toString + "/t"
    VersionedTable.create(
      Seq((1L, "a")).toDF("id", "name").select(col("id"), col("name").as("name", meta)),
      dir)
    val t1 = VersionedTable.commitInstant(dir, 1L)
    assert(t1 > 1000000000000L,
      s"schema-embedded commitTs key must not shadow the real stamp, got $t1")
    // clock step-back: v1's entry claims an instant an hour in the
    // future (as a stepped-back wall clock would make it relative to
    // the next commit); v2's stamp must clamp to it, never regress
    val v1File = Paths.get(dir, "_graft_log").resolve(f"v${1L}%020d.json")
    val future = System.currentTimeMillis() + 3600000L
    val patched = new String(Files.readAllBytes(v1File), "UTF-8")
      .replaceFirst("\"commitTs\":\\d+", s""""commitTs":$future""")
    Files.write(v1File, patched.getBytes("UTF-8"))
    assert(VersionedTable.commitInstant(dir, 1L) == future)
    VersionedTable.upsert(spark, dir, Seq("id"), Seq((2L, "b")).toDF("id", "name"))
    val t2 = VersionedTable.commitInstant(dir, 2L)
    assert(t2 >= future,
      s"v2's instant must clamp to max(now, v1's instant): $t2 < $future")
    // resolution at v1's (future) instant addresses the LARGEST version
    // at or before it — both, under the clamp — never skips v1
    assert(VersionedTable.versionAsOf(dir, future).contains(if (t2 == future) 2L else 1L))
    assert(VersionedTable.versionAsOf(dir, t2).contains(2L))
  }

  test("commit log tokenizer: adversarial schema metadata shadows nothing; txn stamp after schema parses") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.col
    // every key the log itself writes, embedded in column METADATA with
    // hostile values — the schema JSON lands RAW in the payload, so a
    // marker-scan parser could land inside it; the structural parse
    // surfaces top-level fields only
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("commitTs", 123L)
      .putString("files", "evil.parquet")
      .putString("tsLog", "1:1")
      .putString("txnApp", "impostor")
      .putLong("txnV", 999L)
      .putBoolean("dataChange", false)
      .build()
    val dir = Files.createTempDirectory("graft_vt_tok").toString + "/t"
    VersionedTable.create(
      Seq((1L, "a")).toDF("id", "name").select(col("id"), col("name").as("name", meta)),
      dir)
    assert(VersionedTable.commitInstant(dir, 1L) > 1000000000000L,
      "metadata commitTs must not shadow the stamp")
    assert(VersionedTable.isDataChange(dir, 1L),
      "metadata dataChange:false must not mark the commit layout-only")
    assert(VersionedTable.lastTxn(dir, "impostor").isEmpty,
      "metadata txnApp/txnV must not surface as a txn stamp")
    val files1 = VersionedTable.filesOf(dir, 1L)
    assert(files1.nonEmpty && !files1.contains("evil.parquet"),
      s"metadata files key must not leak into the snapshot list: $files1")
    // MERGE writes the txn stamp AFTER the raw-embedded schema: the
    // schema span must end at the schema object, not run to payload end
    val v = VersionedTable.merge(spark, dir, Seq("id"),
      Seq((1L, "A2")).toDF("id", "name"),
      Seq.empty[Long].toDF("id"), txn = Some(("loader", 7L)))
    val sch = VersionedTable.schemaOf(dir, v)
    assert(sch.exists(_.fieldNames.toSeq == Seq("id", "name")),
      s"schemaOf must parse a schema followed by a txn stamp, got $sch")
    assert(VersionedTable.lastTxn(dir, "loader").contains(7L))
    // and the table still reads through the committed schema
    val out = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "A2"))
  }

  test("timestamp travel: a legacy instant regression is detected and falls back to the exact downward scan") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_reg").toString + "/t"
    VersionedTable.create(Seq((1L, "v1")).toDF("id", "name"), dir)
    (2L to 12L).foreach { v =>
      VersionedTable.upsert(spark, dir, Seq("id"), Seq((1L, s"v$v")).toDF("id", "name"))
    }
    val logDir = Paths.get(dir, "_graft_log")
    // rewrite the stamps into a LEGACY shape the clamp never produced:
    // monotone through the v10 checkpoint, then a step-back at v12
    def restamp(p: java.nio.file.Path, f: String => String): Unit =
      Files.write(p, f(new String(Files.readAllBytes(p), "UTF-8")).getBytes("UTF-8"))
    def instant(v: Long): Long =
      if (v <= 10L) 1000L * v else if (v == 11L) 10500L else 9500L
    (1L to 12L).foreach { v =>
      restamp(logDir.resolve(f"v$v%020d.json"),
        _.replaceFirst("\"commitTs\":\\d+", s""""commitTs":${instant(v)}"""))
    }
    restamp(logDir.resolve(f"checkpoint.v${10L}%020d.json"),
      _.replaceFirst("\"tsLog\":\\[\"10:\\d+\"\\]", """"tsLog":["10:10000"]"""))
    // anchored probe alone would stop at v11 (10500 > ts) and answer
    // v10 — but v12's instant 9500 regressed below the ask; the exact
    // semantics (largest version with instant ≤ ts) demand v12
    assert(VersionedTable.versionAsOf(dir, 10200L).contains(12L),
      "regression in the probed range must trigger the exact downward scan")
    assert(VersionedTable.versionAsOf(dir, 9400L).contains(9L),
      "pre-anchor instants keep resolving exactly")
    // monotone logs keep the anchored fast path (same table shape,
    // stamps restored to a clean ramp)
    (1L to 12L).foreach { v =>
      restamp(logDir.resolve(f"v$v%020d.json"),
        _.replaceFirst("\"commitTs\":\\d+", s""""commitTs":${1000L * v}"""))
    }
    assert(VersionedTable.versionAsOf(dir, 10200L).contains(10L))
    assert(VersionedTable.versionAsOf(dir, 12000L).contains(12L))
  }

  test("versioned table: commits are CAS — one winner, losers retry into the next version") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_cas").toString + "/t"
    VersionedTable.create(Seq((1L, "x"), (2L, "y")).toDF("id", "name"), dir)
    // raw CAS: two writers publish version 2 — exactly one wins
    val files = VersionedTable.filesOf(dir, 1L)
    assert(VersionedTable.tryCommit(dir, 2L, files))
    assert(!VersionedTable.tryCommit(dir, 2L, files), "second v2 commit must lose")
    // a writer that loses the race re-derives and lands on top: the
    // conflicting v2 above carried v1's files, so this merge must see
    // them, lose v2, and commit v3 with BOTH changes visible
    val v = VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((2L, "Y2")).toDF("id", "name"))
    assert(v == 3L, s"expected the retried commit at v3, got $v")
    val out = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "x", 2L -> "Y2"))
  }

  test("versioned table: change feed reads only rewritten files; vacuum keeps the horizon") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_cdc").toString + "/t"
    val base = (0L until 50L).map(i => (i, s"v$i")).toDF("id", "name")
    VersionedTable.create(base.repartition(4, $"id"), dir)
    VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((3L, "CHANGED"), (100L, "NEW")).toDF("id", "name"))
    val changes = VersionedTable.changesBetween(spark, dir, Seq("id"), 1L, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes(3L) == "update" && changes(100L) == "insert", s"got $changes")
    // carried files are excluded, so only the rewritten slice's keys
    // can even appear — every reported change is a real one
    assert(changes.size == 2 || changes.keySet.subsetOf(Set(3L, 100L) ++
      // rows co-resident in the rewritten file surface as unchanged
      // and are filtered; nothing outside the touched file may leak
      (0L until 50L).filter(i => i % 4 == 3L % 4).toSet), s"got $changes")
    // a no-op merge commits a version with an unchanged file list; its
    // change feed must be EMPTY WITH THE DOCUMENTED SCHEMA, not a
    // zero-column frame
    VersionedTable.upsert(spark, dir, Seq("id"),
      spark.emptyDataFrame.selectExpr("CAST(1 AS BIGINT) AS id", "'x' AS name").limit(0))
    val noop = VersionedTable.changesBetween(spark, dir, Seq("id"), 2L, 3L)
    assert(noop.columns.toSeq == Seq("id", "change_type", "_before", "_after"))
    assert(noop.count() == 0)
    // vacuum to the latest version: old-only files die, v3 stays whole.
    // minAgeMs=0 for the test; the default grace period exists so a
    // concurrent writer's uncommitted batch is never reclaimed
    val deleted = VersionedTable.vacuum(dir, retainVersions = 1, minAgeMs = 0L)
    assert(deleted > 0, "the rewritten v1 file must be reclaimed")
    val after = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 51 && after(3L) == "CHANGED" && after(100L) == "NEW")
    intercept[Exception](
      VersionedTable.read(spark, dir, asOf = Some(1L)).collect())
  }

  test("versioned table: the commit log streams as a change feed, one partition per version") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_vt_stream").toString
    val dir = s"$root/t"; val out = s"$root/changes"
    VersionedTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    val q = VersionedTable.streamChanges(spark, dir, Seq("id"), out, s"$root/ckpt")
    try {
      q.processAllAvailable()
      VersionedTable.upsert(spark, dir, Seq("id"),
        Seq((2L, "B2"), (3L, "c")).toDF("id", "name"))
      q.processAllAvailable()
      val feed = spark.read.parquet(out)
        .select(col("version").cast("long"), col("id"), col("change_type")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
      assert(feed((1L, 1L)) == "insert" && feed((1L, 2L)) == "insert",
        s"v1 snapshot must stream as inserts: $feed")
      assert(feed((2L, 2L)) == "update" && feed((2L, 3L)) == "insert",
        s"v2 merge must stream as its delta: $feed")
      assert(!feed.contains((2L, 1L)), "untouched key must not appear in the v2 delta")
    } finally q.stop()
  }

  test("versioned table: optimize re-clusters the snapshot losslessly as a new commit") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_opt").toString + "/t"
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(2000)((rnd.nextInt(100000).toLong,
        rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "x", "y").repartition(6)
    VersionedTable.create(base, dir)
    // a few merge batches decay the layout
    (0 until 3).foreach { i =>
      VersionedTable.upsert(spark, dir, Seq("id"),
        Seq((i.toLong, 500L, 500L)).toDF("id", "x", "y"))
    }
    val before = VersionedTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val v = VersionedTable.optimize(spark, dir, Seq("x", "y"), numFiles = 16)
    assert(v == 5L, s"optimize must commit the next version, got $v")
    val after = VersionedTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(after == before, "optimize must not change content")
    // the new layout actually clusters: per-file x-spread shrinks well
    // below global (the sink_zorder property, through the table seam)
    val files = VersionedTable.filesOf(dir, v).map(f => s"$dir/$f")
    assert(files.size == 16)
    val spreads = files.map { f =>
      val xs = spark.read.parquet(f).collect().map(_.getLong(1))
      (xs.max - xs.min).toDouble / 999
    }
    assert(spreads.sum / spreads.size < 0.5,
      s"optimized files must confine x: $spreads")
    // pre-optimize versions still read (time travel unaffected)
    assert(VersionedTable.read(spark, dir, asOf = Some(4L)).count() == before.size)
    // layout-only commit: flagged so the change feed skips it instead
    // of self-diffing two identical snapshots (the Delta dataChange
    // convention); merge commits stay data-changing
    assert(!VersionedTable.isDataChange(dir, v), "optimize must flag dataChange=false")
    assert(VersionedTable.isDataChange(dir, 4L), "merges must stay dataChange=true")
  }

  test("versioned table: concurrent writers all land via OCC retry, no lost updates") {
    import graft.sources.VersionedTable
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val dir = Files.createTempDirectory("graft_vt_conc").toString + "/t"
    val base = (0L until 64L).map(i => (i, "orig")).toDF("id", "name")
    VersionedTable.create(base.repartition(4, $"id"), dir)
    // 4 threads x 4 keyed merges race the commit log; every one must
    // land (serialized by CAS + retry), none may clobber another's key
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 4).map { t =>
      Future {
        (0 until 4).foreach { i =>
          val key = (t * 4 + i).toLong
          VersionedTable.upsert(spark, dir, Seq("id"),
            Seq((key, s"w$t-$i")).toDF("id", "name"), maxRetries = 64)
        }
      }
    }
    try Await.result(Future.sequence(futures), 300.seconds)
    finally pool.shutdown()
    assert(VersionedTable.latestVersion(dir).contains(17L),
      s"16 merges over v1 must serialize to v17, got ${VersionedTable.latestVersion(dir)}")
    val out = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 64)
    (0 until 16).foreach { k =>
      assert(out(k.toLong) == s"w${k / 4}-${k % 4}", s"key $k lost its update: ${out(k.toLong)}")
    }
    ((16 until 64)).foreach(k => assert(out(k.toLong) == "orig"))
  }

  test("versioned table: auto-optimize policy re-clusters after threshold, feed unaffected") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_vt_auto").toString
    val dir = s"$root/t"; val out = s"$root/changes"
    val base = (0L until 200L).map(i => (i, i % 17, s"n$i")).toDF("id", "x", "name")
    VersionedTable.create(base.repartition(4, $"id"), dir)
    val policy = VersionedTable.OptimizePolicy(
      clusterCols = Seq("x"), numFiles = 4, maxSnapshotFiles = 8)
    val q = VersionedTable.streamChanges(spark, dir, Seq("id"), out, s"$root/ckpt")
    try {
      // small merges decay the layout; below threshold nothing fires
      var optimized: Option[Long] = None
      (0 until 6).foreach { i =>
        val (_, opt) = VersionedTable.upsertAuto(spark, dir, Seq("id"),
          Seq((i.toLong, i.toLong % 17, s"U$i")).toDF("id", "x", "name"), policy)
        opt.foreach(v => optimized = Some(v))
      }
      assert(optimized.nonEmpty,
        "six one-file merges over a 4-file base must cross maxSnapshotFiles=8")
      val optV = optimized.get
      assert(!VersionedTable.isDataChange(dir, optV),
        "the auto-fired optimize must be a layout-only commit")
      // the snapshot it produced collapsed back to the policy size
      assert(VersionedTable.filesOf(dir, optV).size == 4)
      // content survives the whole sequence
      val now = VersionedTable.read(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(now.size == 200 && now(3L) == "U3" && now(199L) == "n199")
      // the feed saw every merge and SKIPPED the optimize version
      q.processAllAvailable()
      val feedVs = spark.read.parquet(out)
        .select(col("version").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(!feedVs.contains(optV), s"feed must skip layout commit $optV: $feedVs")
      assert(feedVs.exists(_ > optV) || feedVs.contains(optV - 1),
        s"feed must still carry the data commits around it: $feedVs")
    } finally q.stop()
  }

  test("versioned table: schema evolution — widening upsert, history and CDC intact") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_evo").toString + "/t"
    val base = (0L until 30L).map(i => (i, s"n$i")).toDF("id", "name")
    VersionedTable.create(base.repartition(3, $"id"), dir)
    // v2 appends `score`: the updated key carries a value; carried
    // pre-evolution files read the new column as NULL
    VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((4L, "FOUR", 0.9), (100L, "new", 0.5)).toDF("id", "name", "score"))
    val v2 = VersionedTable.read(spark, dir)
    assert(v2.columns.toSeq == Seq("id", "name", "score"))
    val m = v2.collect().map(r => r.getLong(0) ->
      (r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(m.size == 31)
    assert(m(4L) == (("FOUR", Some(0.9))) && m(100L) == (("new", Some(0.5))))
    assert(m(7L) == (("n7", None)),
      "old readers' rows must surface the added column as NULL, not error")
    // time travel: the pre-evolution version keeps its OWN schema
    assert(VersionedTable.read(spark, dir, asOf = Some(1L)).columns.toSeq
      == Seq("id", "name"))
    // CDC across the schema boundary aligns the sides and classifies
    val ch = VersionedTable.changesBetween(spark, dir, Seq("id"), 1L, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ch(4L) == "update" && ch(100L) == "insert", s"got $ch")
    assert(!ch.values.exists(_ == "delete"),
      s"a widening merge deletes nothing: $ch")
    // type changes are refused with the actual conflict named
    intercept[IllegalArgumentException](VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((1L, 5L, 0.1)).toDF("id", "name", "score")))
    // partial-column updates are refused (no silent NULL overwrite)
    intercept[IllegalArgumentException](VersionedTable.upsert(spark, dir, Seq("id"),
      Seq((1L, "x")).toDF("id", "name")))
  }

  test("versioned table hardening: encoded roots, duplicate update keys, vacuum grace, sidecars") {
    import graft.sources.VersionedTable
    import java.nio.file.Paths
    // a URL-encodable table root: input_file_name() URI-encodes the
    // space, so the touched-file match must DECODE before comparing —
    // or the touched file is carried AND rewritten (duplicate keys)
    val dir = Files.createTempDirectory("graft_vt enc").toString + "/t v"
    val base = (0L until 40L).map(i => (i, s"n$i")).toDF("id", "name")
    VersionedTable.create(base.repartition(4, $"id"), dir)
    VersionedTable.upsert(spark, dir, Seq("id"), Seq((5L, "FIVE")).toDF("id", "name"))
    val rows = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.length == 40, s"encoded-root merge duplicated keys: ${rows.length} rows")
    assert(rows.toMap.apply(5L) == "FIVE")
    val f1 = VersionedTable.filesOf(dir, 1L).toSet
    val f2 = VersionedTable.filesOf(dir, 2L).toSet
    assert((f1 diff f2).nonEmpty, "the touched file must still be detected and replaced")
    // two update rows for one key are an ambiguous MERGE: refuse
    intercept[IllegalArgumentException](
      VersionedTable.upsert(spark, dir, Seq("id"),
        Seq((1L, "a"), (1L, "b")).toDF("id", "name")))
    // the grace period protects superseded LOG entries too, so a
    // lagging change feed can still resolve a version it just saw
    assert(VersionedTable.vacuum(dir, retainVersions = 1, minAgeMs = 3600000L) == 0)
    assert(VersionedTable.hasVersion(dir, 1L), "log entry inside the grace must survive")
    // zero-grace vacuum reclaims v1 but leaves retained dirs' _SUCCESS
    // markers alone (sidecars die only with their whole directory)
    VersionedTable.vacuum(dir, retainVersions = 1, minAgeMs = 0L)
    val keptDirs = VersionedTable.filesOf(dir, 2L).map(_.split('/').head).distinct
    keptDirs.foreach { d =>
      assert(Files.exists(Paths.get(dir, d, "_SUCCESS")),
        s"retained dir $d must keep its _SUCCESS marker")
    }
    // all-null clustering column: a clear error, not an NPE
    val nulls = Seq((1L, null.asInstanceOf[java.lang.Long]),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("id", "x")
    intercept[IllegalArgumentException](
      Sources.writeZordered(nulls,
        Files.createTempDirectory("graft_zn").toString + "/z", Seq("id", "x"), 2))
  }

  test("versioned table: a feed started after vacuum resyncs the snapshot instead of crashing") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_vt_resync").toString
    val dir = s"$root/t"; val out = s"$root/changes"
    VersionedTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    VersionedTable.upsert(spark, dir, Seq("id"), Seq((3L, "c")).toDF("id", "name"))
    // v1's log entry dies; a consumer then starts a FRESH feed at v2
    VersionedTable.vacuum(dir, retainVersions = 1, minAgeMs = 0L)
    val q = VersionedTable.streamChanges(spark, dir, Seq("id"), out, s"$root/ckpt")
    try {
      q.processAllAvailable()
      val feed = spark.read.parquet(out)
        .select(col("version").cast("long"), col("id"), col("change_type")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
      // no v1 to diff against: v2 streams as a full-snapshot resync
      assert(feed == Map((2L, 1L) -> "insert", (2L, 2L) -> "insert",
        (2L, 3L) -> "insert"), s"got $feed")
    } finally q.stop()
  }

  test("streaming jdbc sink: batch-id idempotence commits each batch exactly once") {
    val dbDir = Files.createTempDirectory("graft_derby_stream").toString
    val url = s"jdbc:derby:$dbDir/streamdb;create=true"
    val dir = Files.createTempDirectory("graft_stream_jdbc_in").toString
    val ckpt = Files.createTempDirectory("graft_stream_jdbc_ck").toString
    def stored = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "stream_results").load()
    // end-to-end: one micro-batch through the checkpointed stream
    val q = Sources.writeStreamJdbc(
      Sources.readStreamJson(spark, dir, schema), url, "stream_results", ckpt)
    try {
      sample.coalesce(1).write.mode("append").json(dir)
      q.processAllAvailable()
    } finally q.stop()
    assert(stored.count() == 3)
    // replay the SAME batch id (the post-failure retry): no duplicates
    Sources.jdbcBatchWriter(url, "stream_results")(sample, 0L)
    assert(stored.count() == 3, "re-run of batch 0 must not duplicate rows")
    // a new batch id appends
    Sources.jdbcBatchWriter(url, "stream_results")(
      Seq((4L, "d", "g2")).toDF("id", "name", "grp"), 1L)
    assert(stored.count() == 4)
    assert(stored.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("readStreamSource is config-swappable between file formats") {
    val dir = Files.createTempDirectory("graft_streamsrc").toString
    sample.coalesce(1).write.mode("append").json(dir)
    val q = Sources.readStreamSource(spark, "json", Map("path" -> dir), Some(schema))
      .groupBy("grp").count()
      .writeStream.format("memory").queryName("srcfmt_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val counts = spark.table("srcfmt_out").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("g1" -> 2L, "g2" -> 1L))
    } finally q.stop()
  }

  test("streaming file source reads new json files as micro-batches") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val q = Sources.readStreamJson(spark, dir, schema)
      .groupBy("grp").count()
      .writeStream.format("memory").queryName("src_out").outputMode("complete").start()
    try {
      sample.coalesce(1).write.mode("append").json(dir)
      q.processAllAvailable()
      val counts = spark.table("src_out").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("g1" -> 2L, "g2" -> 1L))
    } finally q.stop()
  }

  test("versioned table: checkpointed log bounds read cost at 100 commits") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_ckpt").toString + "/t"
    // v1 is a real table; v2..v100 drive the LOG protocol through raw
    // CAS commits with synthetic file names — the read-cost contract is
    // about log objects, and 99 Spark write jobs would add nothing
    VersionedTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    val v1Files = VersionedTable.filesOf(dir, 1L)
    (2L to 100L).foreach { v =>
      val files = (v1Files :+ s"synth/f$v.parquet").sorted
      assert(VersionedTable.tryCommit(dir, v, files), s"commit v$v must win unopposed")
    }
    // tip resolution: pointer + forward probes, never an O(versions)
    // dir listing (the 10⁴-commit scale killer)
    VersionedTable.logReads.set(0); VersionedTable.logListings.set(0)
    assert(VersionedTable.latestVersion(dir).contains(100L))
    assert(VersionedTable.logListings.get == 0,
      "latestVersion must probe forward from _last_checkpoint, not list the log dir")
    // snapshot resolution at a non-checkpoint version: ≤ 1 checkpoint +
    // (interval−1) delta entries — NOT a walk to v1
    VersionedTable.logReads.set(0)
    val f99 = VersionedTable.filesOf(dir, 99L)
    assert(f99.toSet == (v1Files :+ "synth/f99.parquet").toSet,
      s"delta replay must reconstruct v99's list, got $f99")
    assert(VersionedTable.logReads.get <= VersionedTable.CheckpointInterval,
      s"filesOf(99) must cost ≤ 1 checkpoint + ${VersionedTable.CheckpointInterval - 1} " +
        s"deltas, read ${VersionedTable.logReads.get} log objects")
    // a checkpoint version resolves in one read
    VersionedTable.logReads.set(0)
    assert(VersionedTable.filesOf(dir, 100L).contains("synth/f100.parquet"))
    assert(VersionedTable.logReads.get <= 1,
      s"filesOf at a checkpoint version must be one read, was ${VersionedTable.logReads.get}")
    // TIMESTAMP travel rides the checkpoint's tsLog pairs: pointer +
    // one checkpoint + ≤ interval forward probes — never the
    // O(versions) downward payload scan it replaced
    val instants = (1L to 100L).map(v => v -> VersionedTable.commitInstant(dir, v))
    VersionedTable.logReads.set(0); VersionedTable.logListings.set(0)
    val mid = VersionedTable.versionAsOf(dir, instants(93)._2)
    assert(VersionedTable.logReads.get <= VersionedTable.CheckpointInterval + 3,
      s"versionAsOf must anchor on the checkpoint tsLog and probe ≤ interval " +
        s"entries, read ${VersionedTable.logReads.get} log objects")
    assert(VersionedTable.logListings.get == 0,
      "versionAsOf must never list the log dir")
    // exactness sweep: the anchored fast path ≡ the downward-scan
    // semantics (largest v with instant ≤ ts) at EVERY commit boundary,
    // equal-millisecond stamps included
    instants.foreach { case (v, t) =>
      val expect = instants.filter(_._2 <= t).map(_._1).max
      assert(VersionedTable.versionAsOf(dir, t).contains(expect),
        s"asOf(instant of v$v) must resolve to v$expect")
    }
    val preTable = instants.head._2 - 1
    assert(VersionedTable.versionAsOf(dir, preTable).isEmpty ==
      instants.forall(_._2 > preTable))
    assert(mid == Some(instants.filter(_._2 <= instants(93)._2).map(_._1).max))
  }

  test("versioned table: reads and history survive a checkpoint boundary end-to-end") {
    import graft.sources.VersionedTable
    val dir = Files.createTempDirectory("graft_vt_ckpt_e2e").toString + "/t"
    VersionedTable.create((0L until 20L).map(i => (i, s"name$i"))
      .toDF("id", "name").repartition(2, $"id"), dir)
    // ten real merges: v11 sits one past the v10 checkpoint, so the
    // final read replays checkpoint + one delta; every intermediate
    // version stays time-travelable through mixed complete/delta entries
    (1L to 10L).foreach { i =>
      assert(VersionedTable.upsert(spark, dir, Seq("id"),
        Seq((i, s"UP$i")).toDF("id", "name")) == i + 1)
    }
    val tip = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tip.size == 20 && (1L to 10L).forall(i => tip(i) == s"UP$i") &&
      tip(0L) == "name0" && tip(15L) == "name15", s"got $tip")
    // time travel below the checkpoint (pure delta walk to v1)
    val v4 = VersionedTable.read(spark, dir, asOf = Some(4L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v4(3L) == "UP3" && v4(4L) == "name4", s"got $v4")
    // the change feed's pruned-file diff is unaffected by delta entries
    val changes = VersionedTable.changesBetween(spark, dir, Seq("id"), 10L, 11L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes(10L) == "update", s"got $changes")
    // vacuum re-anchors at the horizon: retained versions keep reading
    // (v10 via its checkpoint, v11 via checkpoint + delta), pruned ones
    // fail fast, and the tip probe still never lists the log dir
    VersionedTable.vacuum(dir, retainVersions = 2, minAgeMs = 0L)
    assert(VersionedTable.read(spark, dir, asOf = Some(10L)).count() == 20)
    assert(VersionedTable.read(spark, dir).count() == 20)
    intercept[Exception](
      VersionedTable.read(spark, dir, asOf = Some(5L)).collect())
    VersionedTable.logListings.set(0)
    assert(VersionedTable.latestVersion(dir).contains(11L))
    assert(VersionedTable.logListings.get == 0,
      "post-vacuum tip resolution must still come from the pointer")
  }
}
