package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pointer-published snapshot generations for multi-relation stores —
  * the publish protocol behind `refreezeContainmentIndex` and
  * `vacuumChunkStore`, the two maintenance verbs that must rewrite
  * SEVERAL co-versioned relations (order+postings; chunks+recipes) as
  * one atomic unit.
  *
  * Why the staged-swap (rename) publish was not enough for these: a
  * swap per relation means a window between the renames where a
  * racing reader resolves NEW postings against the OLD order — and
  * the PPJoin positional bound is recall-exact only when both sides
  * share one total order, so a mixed read silently DROPS true pairs
  * on a serving path (the s24 admission loop probes every
  * micro-batch). Each rename pair also has an instant where the
  * target directory does not exist at all. Both windows are
  * structural to directory-identity; this protocol replaces it with
  * pointer-identity, the same move the commit log makes
  * ([[VersionedTable]]'s checkpoint pointer):
  *
  *  - every generation `g` of the co-versioned relations lives
  *    complete and IMMUTABLE-once-published under `root/snapshot=g/`
  *    (generation 0 is the legacy layout: the relations directly
  *    under `root` — so every pre-r20 store on disk reads unchanged);
  *  - generation `g` is live iff the marker file `root/_snapshot.g`
  *    exists; the CURRENT generation is the max marker. Publishing is
  *    ONE atomic file creation — there is no instant with zero or two
  *    half-published generations, and a crash before the marker
  *    leaves an unreferenced directory readers never resolve;
  *  - readers resolve ALL their relations from ONE generation read
  *    ([[resolve]]), so a probe racing a publish reads old-everything
  *    or new-everything, never a mix;
  *  - GC runs inside [[publish]]: generations ≤ g−2 are deleted,
  *    g−1 is retained as a grace copy for readers that resolved just
  *    before the publish (a reader slower than a FULL maintenance
  *    cycle is the documented operational bound — maintenance verbs
  *    are spaced hours apart at 100 TB, reads are seconds);
  *    unmarked staging debris from a crashed attempt is cleared by
  *    the next attempt's [[stageNext]].
  *
  * Single-writer like every maintenance verb (two concurrent
  * refreezes of one index make no more sense than two OPTIMIZEs of
  * one table); what this protocol adds is that CONCURRENT READERS
  * need no quiescing — the guarantee the r19 design documented as an
  * operational hope and this round makes mechanical. On an object
  * store without atomic create, the marker write routes through the
  * same commit-service seam the log's CAS link already needs
  * (documented there); on HDFS/POSIX it is atomic as-is. */
private[graft] object Snapshots {

  private val MarkerPrefix = "_snapshot."
  private val DirPrefix = "snapshot="

  private def markerGen(name: String): Option[Long] =
    if (!name.startsWith(MarkerPrefix)) None
    else scala.util.Try(name.stripPrefix(MarkerPrefix).toLong).toOption

  private def dirGen(name: String): Option[Long] =
    if (!name.startsWith(DirPrefix)) None
    else scala.util.Try(name.stripPrefix(DirPrefix).toLong).toOption

  /** The current published generation — max marker, 0 when no marker
    * has ever been published (legacy root layout). */
  def currentGen(fs: FileSystem, root: Path): Long =
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).iterator
      .flatMap(s => markerGen(s.getPath.getName)).foldLeft(0L)(math.max)

  private def base(root: Path, gen: Long): Path =
    if (gen == 0L) root else new Path(root, DirPrefix + gen)

  /** Resolve co-versioned relations from ONE generation read — the
    * consistency contract: every path in the result belongs to the
    * same generation, so a caller that reads them all sees one
    * coherent snapshot no matter how many publishes race it. */
  def resolve(fs: FileSystem, root: Path, names: Seq[String]): (Long, Seq[Path]) = {
    val gen = currentGen(fs, root)
    (gen, names.map(n => new Path(base(root, gen), n)))
  }

  /** Staging base for generation `gen + 1`; clears the debris of any
    * crashed previous attempt at the same generation (unmarked, so no
    * reader ever resolved into it). */
  def stageNext(fs: FileSystem, root: Path, gen: Long): Path = {
    val d = new Path(root, DirPrefix + (gen + 1))
    fs.delete(d, true)
    d
  }

  /** Atomically publish generation `gen` (single marker-file create),
    * then GC generations ≤ gen−2 — markers first, then their dirs,
    * and at gen ≥ 2 the legacy root relations (`legacyNames`), which
    * were generation 0's copy. The gen−1 copy stays as the racing-
    * reader grace window. */
  def publish(fs: FileSystem, root: Path, gen: Long,
              legacyNames: Seq[String]): Unit = {
    require(gen >= 1, s"snapshot generations start at 1, got $gen")
    fs.create(new Path(root, MarkerPrefix + gen), true).close()
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val stale = markerGen(n).exists(_ <= gen - 2) ||
        dirGen(n).exists(_ <= gen - 2)
      if (stale) fs.delete(st.getPath, true)
    }
    if (gen >= 2)
      legacyNames.foreach(n => fs.delete(new Path(root, n), true))
  }

  /** Seed reset: a mode-overwrite reseed writes the legacy root
    * layout, so every marker and snapshot dir from the store's
    * previous life must go first — a stale marker would silently
    * redirect readers to pre-reseed data. */
  def clear(fs: FileSystem, root: Path): Unit =
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (markerGen(n).isDefined || dirGen(n).isDefined)
          fs.delete(st.getPath, true)
      }
}
