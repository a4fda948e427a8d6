package graft

import graft.sources.{AggView, VersionedTable}
import java.nio.file.Files

/** sink_delete + merge + the incrementally maintained aggregate view:
  * copy-on-write deletion, single-commit merge with txn stamps, and
  * the maintained-≡-recomputed invariant across inserts, value
  * updates, group migrations, deletions and replayed refreshes. */
class AggViewSpec extends SparkSpecBase {
  import spark.implicits._

  private def srcRows(ids: Seq[Long]) =
    ids.map(i => (i, s"g${i % 3}", i * 1.25)).toDF("id", "grp", "value")

  test("delete: rows removed copy-on-write, untouched files carried, old snapshot intact") {
    val dir = Files.createTempDirectory("graft_del").toString + "/t"
    VersionedTable.create(srcRows(0L until 100L).repartition(4, $"id"), dir)
    val keys = Seq(7L, 13L, 999L).toDF("id") // 999 matches nothing
    assert(VersionedTable.delete(spark, dir, Seq("id"), keys) == 2L)
    val live = VersionedTable.read(spark, dir).select("id").as[Long].collect().toSet
    assert(live.size == 98 && !live(7L) && !live(13L))
    val f1 = VersionedTable.filesOf(dir, 1L).toSet
    val f2 = VersionedTable.filesOf(dir, 2L).toSet
    assert((f1 intersect f2).nonEmpty, "files without deleted keys must carry by reference")
    assert((f1 diff f2).nonEmpty, "files holding deleted keys must be rewritten")
    assert(VersionedTable.read(spark, dir, asOf = Some(1L)).count() == 100,
      "the pre-delete snapshot stays readable (copy-on-write)")
  }

  test("merge: update + delete in ONE commit; txn stamp rides it; ambiguous keys rejected") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    VersionedTable.create(srcRows(0L until 10L), dir)
    val updates = Seq((1L, "gX", 99.0), (300L, "gNew", 3.0)).toDF("id", "grp", "value")
    val dels = Seq(Tuple1(2L)).toDF("id")
    val v = VersionedTable.merge(spark, dir, Seq("id"), updates, dels,
      txn = Some(("myapp", 42L)))
    assert(v == 2L)
    val live = VersionedTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live.size == 10 && live(1L) == "gX" && live(300L) == "gNew" && !live.contains(2L))
    assert(VersionedTable.lastTxn(dir, "myapp").contains(42L))
    assert(VersionedTable.lastTxn(dir, "otherapp").isEmpty)
    intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, dir, Seq("id"),
        Seq((5L, "g", 1.0)).toDF("id", "grp", "value"), Seq(Tuple1(5L)).toDF("id"))
    }
  }

  test("no-op merge over an EMPTY table still commits its txn stamp (stamp-only version)") {
    val dir = Files.createTempDirectory("graft_mergestamp").toString + "/t"
    VersionedTable.create(srcRows(0L until 3L), dir)
    // v2: a tip with ZERO data files (the empty-view shape AggView.refresh
    // can present after every group empties out)
    assert(VersionedTable.tryCommit(dir, 2L, Seq.empty,
      schemaJson = Some(srcRows(Seq.empty).schema.json)))
    val noUpdates = srcRows(Seq.empty)
    val noDeletes = Seq.empty[Tuple1[Long]].toDF("id")
    // pre-fix this returned the base version WITHOUT committing, so the
    // stamp never advanced and the maintainer re-derived (and eventually
    // broke once the consumed source log entries were vacuumed)
    val v = VersionedTable.merge(spark, dir, Seq("id"), noUpdates, noDeletes,
      txn = Some(("sync-app", 7L)))
    assert(v == 3L, "a txn-stamped no-op merge must still commit")
    assert(VersionedTable.lastTxn(dir, "sync-app").contains(7L))
    assert(VersionedTable.read(spark, dir).isEmpty)
    // withOUT a stamp the same no-op stays commit-free (no version churn)
    assert(VersionedTable.merge(spark, dir, Seq("id"), noUpdates, noDeletes) == 3L)
    assert(VersionedTable.latestVersion(dir).contains(3L))
  }

  private def viewEqualsRecompute(srcDir: String, viewDir: String): Unit = {
    val got = AggView.read(spark, viewDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = AggView.recompute(spark, srcDir, Seq("grp"), "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"maintained view != recompute\n got: $got\nwant: $want")
  }

  test("agg view: maintained ≡ recomputed across inserts, updates, group moves, deletes") {
    val base = Files.createTempDirectory("graft_aggview").toString
    val src = base + "/src"; val view = base + "/view"
    VersionedTable.create(srcRows(0L until 30L).repartition(3, $"id"), src)
    AggView.create(spark, src, view, Seq("grp"), "value")
    viewEqualsRecompute(src, view)
    // value update + GROUP MIGRATION (id 2: g2 → g0) + inserts into a
    // brand-new group — one upsert commit
    val up1 = Seq((1L, "g1", 1000.0), (2L, "g0", 2.5),
      (100L, "g9", 7.0), (101L, "g9", 8.0)).toDF("id", "grp", "value")
    VersionedTable.upsert(spark, src, Seq("id"), up1)
    AggView.refresh(spark, src, view, Seq("id"), Seq("grp"), "value")
    viewEqualsRecompute(src, view)
    // source deletion emptying group g9 entirely: the view row must
    // DISAPPEAR (zero-count groups are deleted, not zeroed)
    VersionedTable.delete(spark, src, Seq("id"), Seq(100L, 101L).toDF("id"))
    AggView.refresh(spark, src, view, Seq("id"), Seq("grp"), "value")
    viewEqualsRecompute(src, view)
    assert(!AggView.read(spark, view).collect().map(_.getString(0)).contains("g9"))
    // two source commits folded into ONE refresh
    VersionedTable.upsert(spark, src, Seq("id"), Seq((200L, "g0", 1.0)).toDF("id", "grp", "value"))
    VersionedTable.upsert(spark, src, Seq("id"), Seq((200L, "g1", 2.0)).toDF("id", "grp", "value"))
    AggView.refresh(spark, src, view, Seq("id"), Seq("grp"), "value")
    viewEqualsRecompute(src, view)
  }

  test("agg view: refresh replay is a no-op; the txn stamp tracks the consumed source tip") {
    val base = Files.createTempDirectory("graft_aggview2").toString
    val src = base + "/src"; val view = base + "/view"
    VersionedTable.create(srcRows(0L until 12L), src)
    AggView.create(spark, src, view, Seq("grp"), "value")
    VersionedTable.upsert(spark, src, Seq("id"),
      Seq((3L, "g0", 50.0)).toDF("id", "grp", "value"))
    val v1 = AggView.refresh(spark, src, view, Seq("id"), Seq("grp"), "value")
    assert(VersionedTable.lastTxn(view, s"graft-aggview:$src")
      .contains(VersionedTable.latestVersion(src).get))
    // replay (the crash-recovery path): stamp says current → no commit
    val v2 = AggView.refresh(spark, src, view, Seq("id"), Seq("grp"), "value")
    assert(v2 == v1, "replayed refresh must not re-apply the delta")
    assert(VersionedTable.latestVersion(view).contains(v1))
    viewEqualsRecompute(src, view)
  }

  test("s34 stream agg view: live maintenance converges to recompute across triggers and replay") {
    val base = Files.createTempDirectory("graft_aggview_s").toString
    val src = base + "/src"; val view = base + "/view"
    VersionedTable.create(srcRows(0L until 20L).repartition(2, $"id"), src)
    AggView.create(spark, src, view, Seq("grp"), "value")
    val q = graft.streaming.StreamingFlow.streamAggView(
      spark, src, view, Seq("id"), Seq("grp"), "value", base + "/ckpt")
    try {
      q.processAllAvailable() // replays v1's log entry: stamped no-op
      viewEqualsRecompute(src, view)
      VersionedTable.upsert(spark, src, Seq("id"),
        Seq((2L, "g0", 77.0), (50L, "gN", 5.0)).toDF("id", "grp", "value"))
      q.processAllAvailable()
      viewEqualsRecompute(src, view)
      // two commits before the next trigger: one refresh syncs to tip
      VersionedTable.upsert(spark, src, Seq("id"),
        Seq((51L, "gN", 6.0)).toDF("id", "grp", "value"))
      VersionedTable.delete(spark, src, Seq("id"), Seq(50L, 51L).toDF("id"))
      q.processAllAvailable()
      viewEqualsRecompute(src, view)
      assert(!AggView.read(spark, view).collect().map(_.getString(0)).contains("gN"))
    } finally q.stop()
    // restart from the same checkpoint: recovery replays without damage
    val q2 = graft.streaming.StreamingFlow.streamAggView(
      spark, src, view, Seq("id"), Seq("grp"), "value", base + "/ckpt")
    try {
      VersionedTable.upsert(spark, src, Seq("id"),
        Seq((3L, "g1", 8.5)).toDF("id", "grp", "value"))
      q2.processAllAvailable()
      viewEqualsRecompute(src, view)
    } finally q2.stop()
  }

  test("agg view: refresh on a foreign table fails loudly (no silent full reapply)") {
    val base = Files.createTempDirectory("graft_aggview3").toString
    val src = base + "/src"; val notView = base + "/nv"
    VersionedTable.create(srcRows(0L until 5L), src)
    VersionedTable.create(Seq(("g0", 1L, 1L)).toDF("grp", "n_rows", "sum_cents"), notView)
    intercept[IllegalStateException] {
      AggView.refresh(spark, src, notView, Seq("id"), Seq("grp"), "value")
    }
  }
}
