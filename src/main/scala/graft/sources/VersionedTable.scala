package graft.sources

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** sink_versioned_upsert — a MINIMAL transactional table format over
  * plain parquet: the clean-room core of what Delta Lake / Iceberg
  * add to `upsertPartitioned` (Sources.scala), implementable without
  * their jars. A table is a directory of immutable parquet data files
  * plus a commit log (`_graft_log/v<N>.json` — v1 lists the COMPLETE
  * file set, later entries the add/remove DELTA, with a complete
  * checkpoint + `_last_checkpoint` pointer re-anchoring the log every
  * `CheckpointInterval` commits). The two transactional properties
  * live entirely in the log protocol:
  *
  *  - SNAPSHOT READS: a reader resolves the latest committed version
  *    ONCE and plans against that version's file list. Writers never
  *    mutate or delete data files (copy-on-write), so a plan stays
  *    consistent however many commits land mid-query — and any
  *    historical version stays readable (time travel via `asOf`).
  *  - OPTIMISTIC CONCURRENCY: a commit is an atomic compare-and-swap
  *    on the next version file — the payload is written to a temp
  *    file and PUBLISHED via `Files.createLink` (POSIX link(2) is
  *    atomic and fails with EEXIST if the version already landed).
  *    A losing writer re-reads the new snapshot, re-derives its
  *    merge, and retries: MERGEs serialize without locks.
  *
  * MERGE does file-level pruning, not blind rewrite: update keys
  * left-semi-join the snapshot (tagged with `input_file_name`) to
  * find the files that actually contain replaced keys; untouched
  * files CARRY OVER into the next version by reference, only touched
  * files rewrite. At 100 TB with sink_sorted/sink_zorder layout, a
  * keyed update touches few files — this is exactly Delta's MERGE
  * cost model. Object stores without atomic link/rename need the
  * format's own commit service (the documented environment seam);
  * HDFS and POSIX filesystems get the full protocol as-is.
  * Data-file GC (vacuum) is deliberately separate: old versions stay
  * readable until a retention pass unlinks files no retained version
  * references. */
object VersionedTable {

  private def logDir(path: String): Path = Paths.get(path, "_graft_log")
  private def versionFile(path: String, v: Long): Path =
    logDir(path).resolve(f"v$v%020d.json")

  /** CHECKPOINTED LOG (the Delta _last_checkpoint recipe): commits after
    * v1 store add/remove DELTAS, and every `CheckpointInterval`-th commit
    * also writes `checkpoint.v<N>.json` — the complete file list + schema
    * of that snapshot — and advances the `_last_checkpoint` pointer.
    * Without this, a merge-heavy table at version 10⁴ with 10⁵ files paid
    * O(versions) dir listing per `latestVersion` and O(files) JSON per
    * COMMIT; now a read costs one pointer read + ≤interval probes, and a
    * commit writes only its touched-file delta. Checkpoint and pointer
    * writes are best-effort (reads fall back to delta replay / full
    * listing), so a crash between commit and checkpoint never corrupts. */
  private[graft] val CheckpointInterval = 10
  private def checkpointFile(path: String, v: Long): Path =
    logDir(path).resolve(f"checkpoint.v$v%020d.json")
  private def pointerFile(path: String): Path =
    logDir(path).resolve("_last_checkpoint")

  /** Test hooks: reads of log objects (entries + checkpoints) and full
    * log-dir listings — the spec pins the checkpointed read cost with
    * these (≤ 1 checkpoint + interval−1 entries, zero full listings). */
  private[graft] val logReads = new java.util.concurrent.atomic.AtomicLong
  private[graft] val logListings = new java.util.concurrent.atomic.AtomicLong

  private def readPayload(p: Path): String = {
    logReads.incrementAndGet()
    new String(Files.readAllBytes(p), "UTF-8")
  }

  /** A named string array in a log payload — structural parse via
    * [[LogJson]], so a `files`/`add`/`tsLog` key embedded in schema
    * metadata can never shadow the log's own top-level field (the
    * pre-r20 fixed-shape scan stopped at the first `]` after an
    * `indexOf` marker hit, which was correct for the log's own writes
    * but one adversarial schema away from not being). */
  private def strArray(payload: String, field: String): Option[Seq[String]] =
    LogJson.strings(payload, field)

  private def readPointer(path: String): Option[Long] = {
    val p = pointerFile(path)
    if (!Files.exists(p)) None
    else try Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
    catch { case _: Exception => None } // torn/garbled pointer: advisory only
  }

  /** Monotonic advisory advance of `_last_checkpoint` via atomic rename.
    * Losing a concurrent advance, or crashing before it, is harmless:
    * `latestVersion` probes FORWARD from wherever the pointer points. */
  private def advancePointer(path: String, v: Long): Unit = try {
    if (!readPointer(path).exists(_ >= v)) {
      // temp lives in the TABLE ROOT, not _graft_log: the change-feed
      // stream tails the log dir as a file source, and a transient temp
      // deleted between its listing and read would kill the query
      val tmp = Files.createTempFile(Paths.get(path), ".graft-ptr-", ".tmp")
      Files.write(tmp, v.toString.getBytes("UTF-8"))
      Files.move(tmp, pointerFile(path),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  } catch { case _: Exception => () }

  /** Idempotent checkpoint publish (same link-then-EEXIST discipline as
    * commits); best-effort — a missing checkpoint only means reads walk
    * further back through deltas.
    *
    * Each checkpoint also carries `tsLog`: the (version, commitTs)
    * pairs of every checkpoint up to and including this one (the
    * previous pointer's pairs plus this version's instant). That keeps
    * TIMESTAMP resolution inside the checkpointed read-cost contract:
    * [[versionAsOf]] reads one pointer + one checkpoint, anchors on
    * the last pair at or before the asked instant, and probes forward
    * ≤ interval entries — instead of an O(versions) downward payload
    * scan. One pair per checkpoint (not per commit) keeps the field's
    * growth at versions/interval — the same cost class as the complete
    * file list the checkpoint already carries. */
  private[graft] def writeCheckpoint(path: String, v: Long, files: Seq[String],
                                     schemaJson: Option[String]): Unit = try {
    val cp = checkpointFile(path, v)
    if (!Files.exists(cp)) {
      val prevPairs = readPointer(path).map(c => checkpointFile(path, c))
        .filter(Files.exists(_))
        .flatMap(p => parseTsLog(readPayload(p)))
        .getOrElse(Seq.empty)
        .filter(_._1 < v)
      val pairs = prevPairs :+ (v -> commitInstant(path, v))
      val tsField = pairs.map { case (pv, t) => s"\"$pv:$t\"" }.mkString(",")
      val schemaField = schemaJson.map(j => s""","schema":$j""").getOrElse("")
      val payload =
        s"""{"version":$v,"tsLog":[$tsField],"files":[${files.map(f => s"\"$f\"").mkString(",")}]$schemaField}"""
      val tmp = Files.createTempFile(Paths.get(path), ".graft-cp-", ".tmp")
      Files.write(tmp, payload.getBytes("UTF-8"))
      try Files.createLink(cp, tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally Files.delete(tmp)
    }
    advancePointer(path, v)
  } catch { case _: Exception => () }

  /** The checkpoint's (version, commitTs) pairs, ascending — None for
    * checkpoints written before the field existed. */
  private def parseTsLog(payload: String): Option[Seq[(Long, Long)]] =
    strArray(payload, "tsLog").map(_.map { s =>
      val i = s.indexOf(':')
      (s.substring(0, i).toLong, s.substring(i + 1).toLong)
    }.sortBy(_._1))

  /** `Files.list` requires an explicit close (each open stream holds a
    * directory fd) — every listing in this object funnels through
    * here. */
  private def listDir[T](dir: Path)(f: Iterator[Path] => T): T = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Latest committed version, or None for a non-table directory.
    * With a `_last_checkpoint` pointer this is one pointer read plus
    * ≤(commits since checkpoint) existence probes — versions are dense
    * by the CAS protocol, so probing forward from the pointer finds the
    * tip without listing the log dir. The full O(versions) listing is
    * only the fallback for pre-checkpoint tables (or a stale pointer
    * whose entry vacuum already pruned). */
  def latestVersion(path: String): Option[Long] = {
    val dir = logDir(path)
    if (!Files.isDirectory(dir)) None
    else readPointer(path).filter(c => Files.exists(versionFile(path, c))) match {
      case Some(c) =>
        var v = c
        while (Files.exists(versionFile(path, v + 1))) v += 1
        Some(v)
      case None =>
        logListings.incrementAndGet()
        val vs = listDir(dir)(_.map(_.getFileName.toString)
          .filter(n => n.startsWith("v") && n.endsWith(".json"))
          .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
          .toSeq)
        if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Whether `v`'s log entry still exists (vacuum prunes old ones). */
  def hasVersion(path: String, v: Long): Boolean =
    Files.exists(versionFile(path, v))

  /** The largest committed version published at or before wall-clock
    * `tsMillis` — Delta's `timestampAsOf` contract. The commit instant
    * is read from the entry's own `commitTs` payload field (stamped at
    * [[tryCommit]] time — the authoritative record, because it survives
    * copies/rsync/restores that rewrite file mtimes); entries committed
    * before the field existed fall back to the log file's modification
    * time, which is the commit instant as long as the directory was
    * never copied without preserved mtimes. None when the table has no
    * version that old (asking for "before the table existed" must be
    * an error at the caller, not silently-latest). Versions whose log
    * entry vacuum pruned are skipped — their snapshots are gone, so
    * they are not addressable by timestamp either. */
  def versionAsOf(path: String, tsMillis: Long): Option[Long] = {
    latestVersion(path).flatMap { latest =>
      // exact fallback: downward payload scan (pre-tsLog logs, or an
      // instant below every checkpointed pair)
      def scanDown(from: Long): Option[Long] = {
        var best: Option[Long] = None
        var v = math.min(from, latest)
        while (v >= 1 && best.isEmpty) {
          if (hasVersion(path, v) && commitInstant(path, v) <= tsMillis)
            best = Some(v)
          v -= 1
        }
        best
      }
      val pairs = readPointer(path).map(c => checkpointFile(path, c))
        .filter(Files.exists(_))
        .flatMap(p => parseTsLog(readPayload(p)))
        .filter(_.nonEmpty)
      pairs match {
        // the anchored fast path assumes monotone non-decreasing
        // instants — true for every commit the tryCommit clamp
        // stamped, but LEGACY entries (pre-clamp stamps, or mtime
        // fallbacks rewritten by a copy) can regress. Any regression
        // visible in the checkpoint pairs themselves disqualifies the
        // whole anchor strategy up front; the probe below re-checks
        // within the interval it reads. (A regression strictly inside
        // a LATER interval, invisible to both checks, is the one
        // residual — it requires a legacy step-back that dips below
        // `ts` between two checkpoints whose own instants are
        // monotone; such logs should be vacuumed or re-stamped.)
        case Some(ps) if ps.iterator.sliding(2).withPartial(false)
            .exists(w => w(1)._2 < w(0)._2) =>
          scanDown(latest)
        case Some(ps) =>
          ps.filter(_._2 <= tsMillis).lastOption match {
            case None =>
              // predates every checkpointed instant: the answer (if any)
              // is below the first checkpoint — ≤ interval−1 entries on
              // a log checkpointed from birth
              scanDown(ps.head._1 - 1)
            case Some((v0, t0)) =>
              // anchor on the last checkpoint at or before the instant
              // and probe ITS WHOLE INTERVAL — up to the next
              // checkpointed version (exclusive) or the tip. Probing
              // the full interval instead of stopping at the first
              // instant > ts costs the same bounded ≤ interval reads
              // and lets a mid-interval instant REGRESSION be
              // detected instead of silently truncating the search;
              // on detection the exact downward scan restores the
              // largest-version-with-instant-≤-ts semantics legacy
              // logs were promised. Pruned entries skip on an
              // existence check alone.
              val bound = ps.find(_._1 > v0).map(_._1 - 1)
                .getOrElse(latest).min(latest)
              var best: Option[Long] =
                if (hasVersion(path, v0)) Some(v0) else None
              var lastInstant = t0
              var regressed = false
              var next = v0 + 1
              while (!regressed && next <= bound) {
                if (hasVersion(path, next)) {
                  val t = commitInstant(path, next)
                  if (t < lastInstant) regressed = true
                  else {
                    if (t <= tsMillis) best = Some(next)
                    lastInstant = t
                  }
                }
                next += 1
              }
              // a step-back AT the interval boundary shows as the next
              // checkpoint's instant undercutting the interval's last
              if (!regressed)
                regressed = ps.find(_._1 > v0).exists(_._2 < lastInstant)
              if (regressed) scanDown(latest) else best
          }
        case None => scanDown(latest)
      }
    }
  }

  /** A version's commit instant (epoch millis): the `commitTs` field
    * stamped into the log entry at commit time, or — for legacy
    * entries that predate the field — the log file's mtime. The
    * structural parse reads only TOP-LEVEL fields, so a `commitTs`
    * key inside schema column metadata (numeric or not) can never
    * shadow the stamp, and a pre-r18 entry whose schema embeds one
    * falls back to mtime instead of parsing the impostor — the two
    * residual holes the r19 ADVICE found in the marker scan. */
  private[graft] def commitInstant(path: String, v: Long): Long = {
    val f = versionFile(path, v)
    LogJson.long(readPayload(f), "commitTs")
      .getOrElse(Files.getLastModifiedTime(f).toMillis)
  }

  /** [[read]] addressed by wall-clock instant instead of version
    * number (the "what did the table look like yesterday 18:00" read
    * an audit or a reproducible-training-run wants). */
  def readAsOf(spark: SparkSession, path: String, tsMillis: Long): DataFrame =
    read(spark, path, Some(versionAsOf(path, tsMillis).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no version committed at or before $tsMillis"))))

  /** The file list of a version (paths relative to the table root).
    * Three payload shapes resolve here: a checkpoint at exactly `v`
    * (fast path), a complete `files` entry (v1 / legacy logs), or a
    * delta entry — for which the walk continues backward to the nearest
    * complete base and replays `add`/`remove` forward. Bounded by the
    * checkpoint interval on a healthy log; a missing checkpoint only
    * lengthens the walk (never fails it — v1 is always complete). */
  /** Resolve a log entry to a readable location. Entries are
    * table-root-relative except CLONE-imported ones ([[cloneTable]]),
    * which are absolute (leading "/" or an explicit scheme) and
    * resolve as themselves — the Delta shallow-clone convention
    * (absolute `add.path` entries in an otherwise relative log). */
  private[graft] def resolve(path: String, f: String): String =
    if (f.startsWith("/") || f.contains("://")) f else s"$path/$f"

  private[graft] def filesOf(path: String, v: Long): Seq[String] = {
    val deltas = scala.collection.mutable.ListBuffer.empty[(Seq[String], Seq[String])]
    var cursor = v
    var base: Seq[String] = null
    while (base == null) {
      val cp = checkpointFile(path, cursor)
      if (Files.exists(cp))
        base = strArray(readPayload(cp), "files").getOrElse(Seq.empty)
      else {
        val payload = readPayload(versionFile(path, cursor))
        strArray(payload, "files") match {
          case Some(fs) => base = fs
          case None =>
            if (cursor <= 1L) throw new IllegalStateException(
              s"$path: v$cursor is a delta entry with no complete base below it")
            deltas.prepend((strArray(payload, "add").getOrElse(Seq.empty),
              strArray(payload, "remove").getOrElse(Seq.empty)))
            cursor -= 1
        }
      }
    }
    deltas.foldLeft(base.toSet) { case (acc, (add, rem)) => acc -- rem ++ add }
      .toSeq.sorted
  }

  /** The schema a version was committed with (None for pre-evolution
    * logs, which fall back to parquet inference). Stored as the
    * StructType's own JSON, embedded RAW — the structural parse
    * returns exactly the nested object's span, so fields AFTER the
    * schema (the txn stamp a MERGE writes) no longer bleed into the
    * span the way the old "substring to payload end" slice did. */
  private[graft] def schemaOf(path: String, v: Long): Option[StructType] = {
    LogJson.raw(readPayload(versionFile(path, v)), "schema")
      .map(s => DataType.fromJson(s).asInstanceOf[StructType])
  }

  /** Snapshot read: latest version by default, `asOf` for history.
    * Files are read with the version's COMMITTED schema, so after a
    * widening upsert the carried (pre-evolution) files surface the
    * added columns as NULL — old data stays readable through every
    * later schema, the mergeSchema contract. */
  def read(spark: SparkSession, path: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"$path is not a versioned table"))
    val files = filesOf(path, v)
    val schema = schemaOf(path, v)
    if (files.isEmpty)
      schema.map(s => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s))
        .getOrElse(spark.emptyDataFrame)
    else {
      val reader = schema.map(spark.read.schema).getOrElse(spark.read)
      reader.parquet(files.map(f => resolve(path, f)): _*)
    }
  }

  /** Whether a version's commit changed table CONTENT (false for
    * layout-only commits like optimize — Delta's dataChange flag):
    * change-feed consumers skip those instead of self-diffing two
    * identical snapshots. Absent field (pre-flag logs) = true. */
  private[graft] def isDataChange(path: String, v: Long): Boolean =
    !LogJson.raw(readPayload(versionFile(path, v)), "dataChange").contains("false")

  /** Atomic CAS publish of version `v`: true = this writer won.
    * `files` is the COMPLETE snapshot list; the entry persists only the
    * add/remove delta against v−1 (v1, or a v−1 that cannot be resolved,
    * falls back to a complete entry), so commit cost tracks the touched
    * slice, not table size. Every `CheckpointInterval`-th winner also
    * publishes the complete list as a checkpoint. */
  private[graft] def tryCommit(path: String, v: Long, files: Seq[String],
                               dataChange: Boolean = true,
                               schemaJson: Option[String] = None,
                               txn: Option[(String, Long)] = None): Boolean = {
    Files.createDirectories(logDir(path))
    val txnField = txn.map { case (app, tv) =>
      require(!app.contains('"'), s"txn app id must not contain quotes: $app")
      s""","txnApp":${"\"" + app + "\""},"txnV":$tv"""
    }.getOrElse("")
    // The commit instant rides IN the payload: mtimes do not survive
    // copies/rsync/restores, so timestamp resolution must not lean on
    // them (versionAsOf falls back to mtime only for pre-r18 entries).
    // The stamp is clamped to be non-decreasing across versions (the
    // Delta in-commit-timestamp rule): a wall-clock step-back between
    // commits must not give v an earlier instant than v−1, or
    // versionAsOf (largest v with instant ≤ ts) would resolve a
    // timestamp to a later version while skipping the one actually
    // current at that instant. It rides as the FIRST field after the
    // version — BEFORE the embedded schema JSON — so the fixed-shape
    // parse can never confuse it with a schema-metadata key.
    val commitTs = {
      val now = System.currentTimeMillis()
      if (v <= 1L) now
      else try math.max(now, commitInstant(path, v - 1))
      catch { case _: Exception => now }
    }
    val schemaField = schemaJson.map(j => s""","schema":$j""").getOrElse("") + txnField
    val prev: Option[Seq[String]] =
      if (v <= 1L) None
      else try Some(filesOf(path, v - 1)) catch { case _: Exception => None }
    val payload = prev match {
      case Some(p) =>
        val pSet = p.toSet; val fSet = files.toSet
        val add = files.filterNot(pSet)
        val remove = p.filterNot(fSet)
        s"""{"version":$v,"commitTs":$commitTs,"dataChange":$dataChange,"add":[${add.map(f => s"\"$f\"").mkString(",")}],"remove":[${remove.map(f => s"\"$f\"").mkString(",")}]$schemaField}"""
      case None =>
        s"""{"version":$v,"commitTs":$commitTs,"dataChange":$dataChange,"files":[${files.map(f => s"\"$f\"").mkString(",")}]$schemaField}"""
    }
    val tmp = Files.createTempFile(logDir(path), ".tmp-", ".json")
    Files.write(tmp, payload.getBytes("UTF-8"), StandardOpenOption.TRUNCATE_EXISTING)
    try {
      Files.createLink(versionFile(path, v), tmp) // atomic; EEXIST on conflict
      if (v % CheckpointInterval == 0) writeCheckpoint(path, v, files, schemaJson)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.delete(tmp)
  }

  /** The parquet part files of one commit directory, relative to the
    * table root — the ONE listing convention every commit path uses. */
  private def listDataFiles(path: String, sub: String): Seq[String] =
    listDir(Paths.get(path, sub))(_.map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet"))
      .map(n => s"$sub/$n").toSeq.sorted)

  private def writeBatch(df: DataFrame, path: String): Seq[String] = {
    val sub = "data-" + java.util.UUID.randomUUID().toString
    df.write.parquet(s"$path/$sub")
    listDataFiles(path, sub)
  }

  /** Create the table at version 1 (its schema pins the log); an
    * optional [[lastTxn]] stamp rides the same commit. */
  def create(df: DataFrame, path: String,
             txn: Option[(String, Long)] = None): Long = {
    val files = writeBatch(df, path)
    if (!tryCommit(path, 1L, files, schemaJson = Some(df.schema.json), txn = txn))
      throw new IllegalStateException(s"$path already exists as a versioned table")
    recordStats(df.sparkSession, path, files)
    1L
  }

  /** Change-data feed between two committed versions, derived from
    * the snapshots themselves (no extra write-side bookkeeping): a
    * full-outer join on the key columns classifies every row as
    * inserted / deleted / updated / unchanged — the "what changed
    * since the version I last synced" read a downstream incremental
    * consumer runs. Cost is both snapshots' PRUNED file sets: files
    * carried by reference between the versions are identical by
    * construction, so they are excluded before any read — only
    * rewritten/new/dropped files scan (at 100 TB, the merge-touched
    * slice, not the table). */
  def changesBetween(spark: SparkSession, path: String, keyCols: Seq[String],
                     fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"changesBetween: need fromV < toV, got $fromV >= $toV")
    val fromFiles = filesOf(path, fromV).toSet
    val toFiles = filesOf(path, toV).toSet
    val common = fromFiles intersect toFiles // carried — identical rows
    // a side whose files all carried over contributes an EMPTY frame
    // with the table schema (never a zero-column emptyDataFrame — the
    // documented output shape must hold even for a no-op commit)
    val schemaFiles = (toFiles ++ fromFiles).toSeq.sorted
    if (schemaFiles.isEmpty) {
      throw new IllegalArgumentException(
        s"changesBetween: versions $fromV and $toV of $path list no files")
    }
    def readSide(files: Set[String], v: Long): DataFrame = {
      val own = (files -- common).toSeq.sorted
      val reader = schemaOf(path, v).map(spark.read.schema).getOrElse(spark.read)
      if (own.isEmpty)
        reader.parquet(schemaFiles.map(f => resolve(path, f)): _*).limit(0)
      else reader.parquet(own.map(f => resolve(path, f)): _*)
    }
    // schema evolution: the two versions may not share a schema — pad
    // BOTH sides to the union column set (missing columns as typed
    // NULLs, toV's order first) so the struct compare is well-typed
    // and a widening commit classifies rows instead of failing. An
    // old row whose only difference is the padded NULL equals itself.
    val bRaw = readSide(fromFiles, fromV)
    val aRaw = readSide(toFiles, toV)
    val unionFields = aRaw.schema.fields ++
      bRaw.schema.fields.filterNot(f => aRaw.columns.contains(f.name))
    def pad(df: DataFrame): DataFrame = df.select(unionFields.map(f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    val b = pad(bRaw)
      .select(keyCols.map(col) :+ struct(col("*")).as("_before"): _*)
    val a = pad(aRaw)
      .select(keyCols.map(col) :+ struct(col("*")).as("_after"): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("_before").isNull, "insert")
          .when(col("_after").isNull, "delete")
          .when(col("_before") =!= col("_after"), "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(keyCols.map(col) :+ col("change_type") :+
        col("_before") :+ col("_after"): _*)
  }

  /** OPTIMIZE: rewrite the CURRENT snapshot into a clustered layout
    * (sink_zorder's multi-column interleave, or sink_sorted's single
    * column) and publish it as a new commit — the compaction +
    * re-clustering pass a merge-heavy table needs, because every
    * upsert lands its rewritten rows as fresh unclustered files and
    * data-skipping decays with each one. Readers are untouched
    * (copy-on-write + CAS like any commit); a concurrent upsert that
    * wins the race simply makes this attempt retry on the newer
    * snapshot. Content is IDENTICAL before and after (spec-pinned) —
    * only layout changes; old files age out via vacuum. */
  def optimize(spark: SparkSession, path: String, clusterCols: Seq[String],
               numFiles: Int, bitsPerCol: Int = 8, maxRetries: Int = 5): Long = {
    require(clusterCols.nonEmpty, "optimize: need at least one cluster column")
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      val base = latestVersion(path).getOrElse(
        throw new IllegalArgumentException(s"$path is not a versioned table"))
      // an empty snapshot has nothing to cluster (and a zero-column
      // frame would not even resolve the cluster columns): no-op
      if (filesOf(path, base).isEmpty) return base
      val snap = read(spark, path, asOf = Some(base))
      val sub = "data-" + java.util.UUID.randomUUID().toString
      if (clusterCols.size == 1)
        Sources.writeSorted(snap, s"$path/$sub", clusterCols.head, numFiles)
      else
        Sources.writeZordered(snap, s"$path/$sub", clusterCols, numFiles, bitsPerCol)
      // layout-only commit: content identical, so the change feed
      // must skip it (dataChange=false, the Delta convention); the
      // schema carries through unchanged
      if (tryCommit(path, base + 1, listDataFiles(path, sub), dataChange = false,
          schemaJson = Some(snap.schema.json))) {
        recordStats(spark, path, listDataFiles(path, sub))
        return base + 1
      }
    }
    throw new IllegalStateException(s"optimize lost $maxRetries commit races on $path")
  }

  /** Auto-OPTIMIZE policy: re-cluster when a snapshot's file count
    * crosses `maxSnapshotFiles`. File count is the honest trigger for
    * merge decay — every upsert lands its rewritten slice as fresh
    * unclustered files, so the count grows monotonically with commits
    * until an optimize collapses it back to `numFiles`. */
  final case class OptimizePolicy(clusterCols: Seq[String], numFiles: Int,
                                  maxSnapshotFiles: Int = 64, bitsPerCol: Int = 8)

  /** Run [[optimize]] iff the CURRENT snapshot breaches the policy's
    * file-count threshold; returns the optimize commit's version when
    * it ran. Cost of the check is one log-entry read — no data scan. */
  def maybeOptimize(spark: SparkSession, path: String,
                    policy: OptimizePolicy): Option[Long] = {
    val latest = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"$path is not a versioned table"))
    if (filesOf(path, latest).size <= policy.maxSnapshotFiles) None
    else Some(optimize(spark, path, policy.clusterCols, policy.numFiles,
      policy.bitsPerCol))
  }

  /** MERGE with the table maintaining itself: after the upsert
    * commits, the policy check re-clusters if the snapshot has
    * decayed past the threshold — so a merge-heavy table keeps
    * data-skipping without an operator remembering to run OPTIMIZE.
    * The optimize commit is dataChange=false like any other, so the
    * change feed streams only the merge. Returns (merge version,
    * optimize version if one ran). */
  def upsertAuto(spark: SparkSession, path: String, keyCols: Seq[String],
                 updates: DataFrame, policy: OptimizePolicy,
                 maxRetries: Int = 10): (Long, Option[Long]) = {
    val v = upsert(spark, path, keyCols, updates, maxRetries)
    (v, maybeOptimize(spark, path, policy))
  }

  /** Streaming change-data feed (src_stream_versioned): tail the
    * commit log itself as a file stream — every committed version
    * file is exactly one immutable, atomically-published object, so
    * the log dir IS a well-formed streaming source with no extra
    * bookkeeping. Each micro-batch resolves its new versions in
    * order and appends that version's [[changesBetween]] rows
    * (version 1 = the initial snapshot as inserts) to `outPath`,
    * partitioned by version with dynamic overwrite — a replayed
    * trigger rewrites only its own versions' partitions (the s14
    * idempotence recipe). This is the downstream-sync surface: a
    * consumer materializes deltas continuously instead of diffing
    * snapshots on a schedule. */
  def streamChanges(spark: SparkSession, tablePath: String, keyCols: Seq[String],
                    outPath: String, checkpoint: String
                   ): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(s"$tablePath/_graft_log")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val vs = batch.collect().flatMap { r =>
          val s = r.getString(0)
          val m = "\"version\":(\\d+)".r.findFirstMatchIn(s)
          m.map(_.group(1).toLong)
        }.sorted
        // a vacuum racing a lagging feed can have pruned v's own log
        // entry by the time this trigger runs: skip it — the next
        // retained version resyncs (its v-1 is missing → full-snapshot
        // inserts below), instead of NoSuchFileException killing the
        // query
        vs.filter(v => hasVersion(tablePath, v) &&
            (v == 1L || isDataChange(tablePath, v))).foreach { v =>
          // v==1 and "previous version vacuumed away" share a shape:
          // no predecessor to diff against, so the full snapshot
          // streams as a RESYNC of inserts (the consumer's recovery
          // point) instead of crashing the query on a missing log
          val changes =
            if (v == 1L || !hasVersion(tablePath, v - 1))
              read(spark, tablePath, asOf = Some(v))
                .select(keyCols.map(col) :+ lit("insert").as("change_type"): _*)
            else
              changesBetween(spark, tablePath, keyCols, v - 1, v)
                .select(keyCols.map(col) :+ col("change_type"): _*)
          changes.withColumn("version", lit(v))
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("version").parquet(outPath)
        }
      }
      .start()
  }

  /** Retention pass: unlink data files no retained version references
    * and drop the superseded log entries — the GC the copy-on-write
    * protocol defers. Keeps the newest `retainVersions` snapshots
    * readable; time travel and the streaming change feed shrink to
    * that horizon (a read of a vacuumed version fails; the feed
    * resyncs). Two race guards, both the standard table-format
    * recipe: `minAgeMs` skips unreferenced files younger than the
    * grace period, so a concurrent upsert's already-written but
    * NOT-yet-committed batch is never reclaimed out from under its
    * commit (size the grace above the longest write+commit window,
    * as Delta's retention check does) — and readers of RETAINED
    * versions are untouched because Spark re-opens files at action
    * time from a file list vacuum preserved. Returns the deleted
    * file count. */
  def vacuum(path: String, retainVersions: Int = 1,
             minAgeMs: Long = 24L * 3600 * 1000): Int = {
    require(retainVersions >= 1, "vacuum: must retain at least the latest version")
    val latest = latestVersion(path).getOrElse(return 0)
    val keepVs = ((latest - retainVersions + 1L) max 1L) to latest
    val keep = keepVs.flatMap(v => filesOf(path, v)).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    val dataDirs = listDir(Paths.get(path))(
      _.filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("data-")).toSeq)
    var deleted = 0
    dataDirs.foreach { d =>
      val entries = listDir(d)(_.toSeq)
      // sidecars (_SUCCESS/.crc) only go once NO parquet in the dir is
      // referenced by a retained version — deleting a live dir's
      // markers would surprise tooling that checks them
      val dirRetained = entries.exists(f =>
        f.getFileName.toString.endsWith(".parquet") &&
          keep.contains(s"${d.getFileName}/${f.getFileName}"))
      entries.foreach { f =>
        val rel = s"${d.getFileName}/${f.getFileName}"
        val isData = f.getFileName.toString.endsWith(".parquet")
        val oldEnough = Files.getLastModifiedTime(f).toMillis <= cutoff
        if (isData && !keep.contains(rel) && oldEnough) {
          Files.delete(f); deleted += 1
        } else if (!isData && oldEnough && !dirRetained) Files.delete(f)
      }
      if (listDir(d)(_.isEmpty)) Files.delete(d)
    }
    // Re-anchor the checkpointed log BEFORE pruning: the oldest retained
    // version becomes a checkpoint (its complete list is still derivable
    // here — the entries below it are about to go) and the pointer moves
    // up, so post-vacuum reads of any retained version never need a
    // pruned entry and `latestVersion`'s forward probe starts inside the
    // retained range.
    if (keepVs.head > 1L)
      writeCheckpoint(path, keepVs.head, filesOf(path, keepVs.head),
        schemaOf(path, keepVs.head).map(_.json))
    // checkpoint publish is best-effort — but pruning the entries BELOW
    // the horizon is only safe once the horizon's complete list is
    // durable; if the write failed, keep the log (retry next vacuum)
    if (keepVs.head > 1L && !Files.exists(checkpointFile(path, keepVs.head)))
      return deleted
    // drop superseded log entries so asOf fails fast instead of
    // resolving to missing files — with the SAME minAgeMs grace as the
    // data files, so a lagging change feed can still resolve a version
    // it just saw land in the log stream
    listDir(logDir(path))(_.filter(_.getFileName.toString.startsWith("v"))
      .filter(p => p.getFileName.toString.stripPrefix("v")
        .stripSuffix(".json").toLong < keepVs.head)
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff).toSeq)
      .foreach(Files.delete)
    // checkpoints below the retained horizon are equally superseded
    listDir(logDir(path))(_.filter(_.getFileName.toString.startsWith("checkpoint.v"))
      .filter(p => p.getFileName.toString.stripPrefix("checkpoint.v")
        .stripSuffix(".json").toLong < keepVs.head)
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff).toSeq)
      .foreach(Files.delete)
    deleted
  }

  /** Transactional MERGE: rows of `updates` replace snapshot rows with
    * equal `keyCols`; everything else is untouched. Retries the
    * derive-write-commit cycle on conflict until it lands (bounded by
    * `maxRetries`). Returns the committed version.
    *
    * SCHEMA EVOLUTION (widening only, the Delta mergeSchema rule):
    * `updates` must cover every existing column at its committed type
    * — a type change is refused — and may APPEND new columns, which
    * join the committed schema. Carried (unrewritten) files simply
    * lack the new columns on disk; every later read plans with the
    * commit's schema, so those rows surface the additions as NULL.
    * Time travel to pre-evolution versions keeps their own schema. */
  /** sink_restore — roll the table back to an earlier version as a
    * NEW commit (the Delta RESTORE verb): `toVersion`'s complete file
    * list and schema re-commit at latest+1. History is preserved —
    * the rolled-back commits stay time-travelable until vacuum — and
    * a downstream change feed sees the restore as one ordinary delta
    * between latest and latest+1, so incremental consumers converge
    * without special-casing. Zero data movement: the commit is a
    * file-list pointer, whatever the table size — the undo path for
    * a bad merge at 100 TB costs one log write.
    *
    * The target must still be materializable: every file it
    * references must exist (vacuum may have pruned beyond the
    * retention horizon) — checked up front so a restore can never
    * commit dangling references. CAS-raced like every commit: a
    * concurrent writer advances the version, the restore retries on
    * top (last-writer-wins, standard restore semantics). */
  def restore(path: String, toVersion: Long, maxRetries: Int = 10): Long = {
    val latest = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"restore: $path is not a versioned table"))
    require(hasVersion(path, toVersion),
      s"restore: version $toVersion is not in the log (vacuumed or never committed)")
    val files = filesOf(path, toVersion)
    val missing = files.filterNot(f => Files.exists(Paths.get(resolve(path, f))))
    require(missing.isEmpty,
      s"restore: version $toVersion references vacuumed files: ${missing.take(3).mkString(", ")}")
    val schema = schemaOf(path, toVersion).map(_.json)
    var v = latest + 1
    var tries = 0
    while (!tryCommit(path, v, files, dataChange = true, schemaJson = schema)) {
      tries += 1
      if (tries > maxRetries)
        throw new IllegalStateException(s"restore: lost the commit race $maxRetries times")
      v = latestVersion(path).getOrElse(v) + 1
    }
    v
  }

  /** sink_clone — ZERO-COPY shallow clone (Delta `CLONE`): `dstPath`
    * becomes a new versioned table whose v1 references the SOURCE
    * snapshot's data files by ABSOLUTE path — one log entry, no data
    * movement, however large the source. The clone then lives its own
    * life: upserts/merges copy-on-write divergent slices into the
    * CLONE's directory (absolute refs drop out of the list as their
    * keys rewrite), `optimize` fully materializes it (re-clusters
    * every row locally, ending the source dependency), and clone-side
    * `vacuum` only ever deletes files under the clone root — imported
    * refs live outside it and are structurally untouchable. The one
    * shared-fate hazard is the Delta one, documented not hidden:
    * SOURCE-side vacuum can prune files a clone still references
    * (clones are invisible to the source's retention), so pin source
    * retention or materialize long-lived clones. The 100 TB use is
    * dev/test branching and schema-migration rehearsal: an
    * experiment's writes land in the clone at the cost of its diff,
    * while the production table stays untouched. */
  def cloneTable(srcPath: String, dstPath: String,
                 asOf: Option[Long] = None): Long = {
    val v = asOf.orElse(latestVersion(srcPath)).getOrElse(
      throw new IllegalArgumentException(s"clone: $srcPath is not a versioned table"))
    require(hasVersion(srcPath, v),
      s"clone: version $v is not in $srcPath's log (vacuumed or never committed)")
    val srcAbs = Paths.get(srcPath).toAbsolutePath.normalize.toString
    val files = filesOf(srcPath, v).map(f => resolve(srcAbs, f))
    val missing = files.filterNot(f => Files.exists(Paths.get(f)))
    require(missing.isEmpty,
      s"clone: version $v references vacuumed files: ${missing.take(3).mkString(", ")}")
    val schema = schemaOf(srcPath, v).map(_.json)
    // target-exists check via the log tip, not the v1 CAS alone: a
    // vacuumed target may have pruned its v1 entry, which would let a
    // blind v1 commit silently fork history under live readers
    if (latestVersion(dstPath).isDefined)
      throw new IllegalStateException(s"clone: $dstPath already exists as a versioned table")
    Files.createDirectories(Paths.get(dstPath))
    if (!tryCommit(dstPath, 1L, files, schemaJson = schema))
      throw new IllegalStateException(s"clone: $dstPath already exists as a versioned table")
    1L
  }

  /** sink_manifest — SYMLINK-style manifest export (the Delta
    * `symlink_format_manifest` / Hive external-table bridge): writes
    * `_graft_manifest/manifest-v<N>.txt` holding the ABSOLUTE path of
    * every data file in the snapshot, one per line, published
    * atomically (temp + rename) so a concurrent reader sees the old
    * manifest or the new one, never a torn list. Engines that can't
    * speak the commit log (DuckDB, Trino/Presto external tables, a
    * plain `spark.read.parquet`) get an exact snapshot by reading the
    * manifest's paths — the interop seam that makes the table format
    * consumable outside this library without its jars. Re-export after
    * commits you want visible externally; each version's manifest is
    * its own file, so external definitions pin a version by name.
    * Returns the absolute paths it wrote. */
  def writeManifest(path: String, asOf: Option[Long] = None): Seq[String] = {
    val v = asOf.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"manifest: $path is not a versioned table"))
    require(hasVersion(path, v),
      s"manifest: version $v is not in the log (vacuumed or never committed)")
    val abs = Paths.get(path).toAbsolutePath.normalize.toString
    val files = filesOf(path, v).map(f => resolve(abs, f))
    val dir = Paths.get(path, "_graft_manifest")
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, ".tmp-", ".txt")
    Files.write(tmp, files.mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, dir.resolve(f"manifest-v$v%020d.txt"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    files
  }

  /** sink_table_constraints — write-time CHECK constraints (the Delta
    * `ALTER TABLE ADD CONSTRAINT` contract): a constraint is a SQL
    * boolean expression persisted next to the commit log
    * (`_graft_log/constraints/<name>.check`, atomic link publish);
    * every subsequent [[upsert]]/[[merge]] validates its UPDATE ROWS
    * against all persisted constraints BEFORE writing anything and
    * refuses the commit on violation — quality enforcement moves from
    * "audit later" (q74's verdict report) to "bad rows can't land".
    * Scope matches Delta exactly: only newly-written data validates
    * per commit (carried files were validated by their own commits),
    * and [[addConstraint]] scans the CURRENT snapshot first so a
    * constraint can never be born already-violated. NULL predicate
    * results PASS (the SQL-standard CHECK rule — a constraint on a
    * column some rows null out is not a violation; use IS NOT NULL
    * explicitly for that). Enforcement cost at 100 TB: one fused agg
    * over the update slice per commit — never the table. */
  private def constraintsDir(path: String): Path =
    logDir(path).resolve("constraints")

  def addConstraint(spark: SparkSession, path: String, name: String,
                    exprSql: String): Unit = {
    require(name.matches("[A-Za-z0-9_-]+"),
      s"constraint name must be [A-Za-z0-9_-]+, got '$name'")
    val p = constraintsDir(path).resolve(s"$name.check")
    require(!Files.exists(p), s"constraint '$name' already exists on $path")
    // the existing snapshot must satisfy the new constraint (Delta's
    // ADD CONSTRAINT rule): strictly-false rows refuse, null passes
    val bad = read(spark, path).filter(expr(exprSql) === false).count()
    require(bad == 0,
      s"addConstraint '$name': $bad existing rows violate ($exprSql)")
    Files.createDirectories(constraintsDir(path))
    val tmp = Files.createTempFile(constraintsDir(path), ".tmp-", ".check")
    Files.write(tmp, exprSql.getBytes("UTF-8"), StandardOpenOption.TRUNCATE_EXISTING)
    try Files.createLink(p, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(s"constraint '$name' already exists on $path")
    } finally Files.delete(tmp)
  }

  def dropConstraint(path: String, name: String): Boolean =
    Files.deleteIfExists(constraintsDir(path).resolve(s"$name.check"))

  def constraintsOf(path: String): Seq[(String, String)] = {
    val dir = constraintsDir(path)
    if (!Files.isDirectory(dir)) Seq.empty
    else listDir(dir)(_.filter(_.getFileName.toString.endsWith(".check"))
      .filterNot(_.getFileName.toString.startsWith("."))
      .map(p => (p.getFileName.toString.stripSuffix(".check"),
        new String(Files.readAllBytes(p), "UTF-8"))).toSeq.sortBy(_._1))
  }

  /** One fused aggregate over the slice: per constraint, the count of
    * STRICTLY FALSE rows (null passes). Throws before any write. */
  private def enforceConstraints(path: String, rows: DataFrame,
                                 what: String): Unit = {
    val cs = constraintsOf(path)
    if (cs.nonEmpty) {
      val aggs = cs.map { case (n, e) =>
        sum(when(expr(e) === false, 1L).otherwise(0L)).as(s"__c_$n") }
      val r = rows.agg(aggs.head, aggs.tail: _*).collect()(0)
      val viols = cs.zipWithIndex.collect {
        case ((n, e), i) if !r.isNullAt(i) && r.getLong(i) > 0 =>
          s"$n (${r.getLong(i)} rows): $e"
      }
      if (viols.nonEmpty) throw new IllegalArgumentException(
        s"$what refused — CHECK constraint violations: ${viols.mkString("; ")}")
    }
  }

  /** sink_zonemap — LOG-LEVEL file-skipping statistics (the Delta
    * `dataSkippingNumIndexedCols` / Iceberg manifest-stats idea):
    * once a table opts in via [[setStatsColumns]], every subsequent
    * commit records per-new-file min/max of those NUMERIC columns in
    * an append-only `_graft_stats` sidecar, and [[readPruned]] plans
    * a range query against ONLY the files whose [min,max] intersects
    * it — files never open, footers never read, the prune happens on
    * the driver from log metadata. This is the layer ABOVE parquet's
    * own row-group stats: at 100 TB with 10⁵ files, parquet pruning
    * still opens every footer; the zone map touches none. Composes
    * multiplicatively with sink_sorted/sink_zorder + OPTIMIZE (which
    * make file ranges DISJOINT, so the intersection set is tight);
    * unsorted tables get overlapping ranges and correspondingly
    * weaker skipping — layout is the lever, the map just exploits
    * it. Conservative by construction: files with no stats row (pre-
    * opt-in commits, non-stat columns) are ALWAYS read; stale rows
    * for vacuumed files are never consulted (pruning starts from the
    * snapshot's file list). Numeric columns only — range-prune
    * strings with the sorted layout instead. */
  private def statsColsFile(path: String): Path =
    logDir(path).resolve("stats_columns")
  private def statsDir(path: String): String = s"$path/_graft_stats"

  def setStatsColumns(path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty && cols.forall(_.matches("[A-Za-z0-9_]+")),
      s"setStatsColumns: need plain column names, got $cols")
    Files.createDirectories(logDir(path))
    val tmp = Files.createTempFile(logDir(path), ".tmp-", ".cols")
    Files.write(tmp, cols.mkString(",").getBytes("UTF-8"),
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, statsColsFile(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def statsColumns(path: String): Seq[String] = {
    val p = statsColsFile(path)
    if (!Files.exists(p)) Seq.empty
    else new String(Files.readAllBytes(p), "UTF-8").split(",").toSeq
      .filter(_.nonEmpty)
  }

  /** Record per-file min/max for the table's stat columns over this
    * commit's NEW files (one narrow scan of the new slice, at commit
    * grain — never the table). Best-effort: a stats failure must not
    * fail the commit that already landed. */
  private def recordStats(spark: SparkSession, path: String,
                          newFiles: Seq[String]): Unit = try {
    val cols = statsColumns(path)
    if (cols.nonEmpty && newFiles.nonEmpty) {
      val df = spark.read.parquet(newFiles.map(f => resolve(path, f)): _*)
      val numeric = cols.filter(c => df.schema.fields.exists(f =>
        f.name == c && f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]))
      if (numeric.nonEmpty) {
        val prefix = Paths.get(path).toAbsolutePath.normalize.toString + "/"
        val withFile = df.withColumn("_af", input_file_name())
          .withColumn("file", regexp_replace(
            url_decode(col("_af")), lit("^file:(//)?" +
              java.util.regex.Pattern.quote(prefix)), lit("")))
        val aggs = numeric.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"__lo_$c"),
          max(col(c).cast("double")).as(s"__hi_$c")))
        val perFile = withFile.groupBy("file").agg(aggs.head, aggs.tail: _*)
        val rows = numeric.map(c => struct(lit(c).as("col"),
          col(s"__lo_$c").as("vmin"), col(s"__hi_$c").as("vmax")))
        perFile.select(col("file"), explode(array(rows: _*)).as("s"))
          .select(col("file"), col("s.col"), col("s.vmin"), col("s.vmax"))
          .write.mode("append").parquet(statsDir(path))
      }
    }
  } catch { case _: Exception => () }

  /** Range query planned against the zone map: only files whose
    * recorded [vmin, vmax] intersects [lo, hi] — plus every file with
    * no stats row (conservative) — are read; the precise filter still
    * applies on top. Result ≡ read(...).filter(col between lo hi). */
  def readPruned(spark: SparkSession, path: String, column: String,
                 lo: Double, hi: Double, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(latestVersion(path)).getOrElse(
      throw new IllegalArgumentException(s"$path is not a versioned table"))
    val files = filesOf(path, v)
    val keep: Seq[String] =
      if (!graft.Fs.exists(spark, statsDir(path))) files
      else {
        val stats = spark.read.parquet(statsDir(path))
          .filter(col("col") === column)
          .groupBy("file").agg(min("vmin").as("vmin"), max("vmax").as("vmax"))
          .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
        files.filter(f => stats.get(f) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true // no stats: must read (conservative)
        })
      }
    val schema = schemaOf(path, v)
    val pruned =
      if (keep.isEmpty)
        schema.map(s => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s))
          .getOrElse(spark.emptyDataFrame)
      else {
        val reader = schema.map(spark.read.schema).getOrElse(spark.read)
        reader.parquet(keep.map(f => resolve(path, f)): _*)
      }
    pruned.filter(col(column) >= lo && col(column) <= hi)
  }

  def upsert(spark: SparkSession, path: String, keyCols: Seq[String],
             updates: DataFrame, maxRetries: Int = 10): Long = {
    require(keyCols.nonEmpty, "upsert: need at least one key column")
    enforceConstraints(path, updates, "upsert")
    val up = updates.localCheckpoint(true) // one derivation, retried cheaply
    // Two update rows for one key would make the MERGE ambiguous (and
    // leave duplicate keys in the committed snapshot) — fail fast, the
    // Delta "multiple source rows matched" rule, instead of silently
    // committing both.
    val upRows = up.count()
    val upKeys = up.select(keyCols.map(col): _*).distinct().count()
    require(upRows == upKeys,
      s"upsert: updates hold ${upRows - upKeys} duplicate rows for key (${keyCols.mkString(",")})")
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      val base = latestVersion(path).getOrElse(
        throw new IllegalArgumentException(s"$path is not a versioned table"))
      val files = filesOf(path, base)
      val absOf = files.map(f => resolve(path, f))
      val baseReader = schemaOf(path, base).map(spark.read.schema).getOrElse(spark.read)
      val snap = baseReader.parquet(absOf: _*)
        .withColumn("_file", input_file_name())
      val baseSchema = snap.drop("_file").schema
      // widening-only evolution: existing columns keep their type,
      // updates-only columns append to the committed schema
      require(keyCols.forall(up.columns.contains),
        s"upsert: updates lack key column(s) ${keyCols.filterNot(up.columns.contains).mkString(",")}")
      baseSchema.fields.foreach { b =>
        require(up.columns.contains(b.name),
          s"upsert: updates lack existing column '${b.name}' — partial-column merges are not supported")
        val u = up.schema(b.name)
        require(u.dataType == b.dataType,
          s"upsert: column '${b.name}' type ${u.dataType.simpleString} conflicts " +
            s"with committed type ${b.dataType.simpleString} — type changes are not supported")
      }
      val merged = StructType(baseSchema.fields ++
        up.schema.fields.filterNot(f => baseSchema.fieldNames.contains(f.name)))
      // carried old files lack appended columns on disk: the snapshot
      // side pads them as typed NULLs so the rewritten slice conforms
      def conform(df: DataFrame): DataFrame = df.select(merged.fields.map(f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
      // file pruning: only files holding a replaced key rewrite
      val touchedAbs = snap
        .join(up.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")
        .select("_file").distinct().collect().map(_.getString(0)).toSet
      // input_file_name() returns URI-encoded paths (space → %20 …)
      // while `files` holds raw directory-listing names: decode before
      // comparing, or a URL-encodable table root would mark a touched
      // file as carried AND commit its rewrite — duplicate stale keys.
      val touchedPaths = touchedAbs.map(a =>
        try new java.net.URI(a).getPath catch { case _: Exception => a })
      def isTouched(rel: String) = touchedPaths.exists(p =>
        p == rel || p.endsWith("/" + rel))
      val carried = files.filterNot(isTouched)
      val rewritten = conform(snap
          .filter(col("_file").isin(touchedAbs.toSeq: _*))
          .drop("_file")
          .join(up.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti"))
        .unionByName(conform(up))
      val newFiles =
        if (touchedAbs.isEmpty && up.isEmpty) Seq.empty
        else writeBatch(rewritten, path)
      if (tryCommit(path, base + 1, (carried ++ newFiles).sorted,
          schemaJson = Some(merged.json))) {
        recordStats(spark, path, newFiles)
        return base + 1
      }
      // lost the race: orphan this attempt's files (vacuum's job) and
      // re-derive against the winner's snapshot
    }
    throw new IllegalStateException(
      s"upsert lost $maxRetries commit races on $path")
  }

  /** Latest transaction marker for `app` — the Delta SetTransaction
    * idempotence recipe: a writer that stamps each commit with the
    * source version it consumed can, after ANY crash, read back the
    * last stamped version and know exactly where to resume; the stamp
    * rides the SAME atomic commit as the data, so "applied but
    * unrecorded" cannot exist. Walks back from the tip through
    * retained log entries (for a stamping writer the tip commit
    * usually carries it — the walk is ~1 read); entries pruned by
    * vacuum end the walk, so retain at least one stamped commit. */
  def lastTxn(path: String, app: String): Option[Long] = {
    require(!app.contains('"'), s"txn app id must not contain quotes: $app")
    var v = latestVersion(path).getOrElse(return None)
    while (v >= 1L && hasVersion(path, v)) {
      val payload = readPayload(versionFile(path, v))
      // top-level fields only: a txnApp/txnV pair a schema's column
      // metadata embeds is nested and invisible here
      if (LogJson.raw(payload, "txnApp").contains("\"" + app + "\""))
        LogJson.long(payload, "txnV").foreach(t => return Some(t))
      v -= 1
    }
    None
  }

  /** MERGE: replace `updates` keys and remove `deleteKeys` keys in ONE
    * commit — upsert's copy-on-write file pruning (only files holding
    * a touched key rewrite) extended with row deletion, plus an
    * optional [[lastTxn]] stamp so an incremental maintainer gets
    * exactly-once application. The one-commit shape matters: a
    * separate upsert-then-delete pair could crash in between and leave
    * the stamp claiming work a second commit never did. */
  def merge(spark: SparkSession, path: String, keyCols: Seq[String],
            updates: DataFrame, deleteKeys: DataFrame,
            txn: Option[(String, Long)] = None, maxRetries: Int = 10): Long = {
    require(keyCols.nonEmpty, "merge: need at least one key column")
    require(keyCols.forall(updates.columns.contains),
      s"merge: updates lack key column(s) ${keyCols.filterNot(updates.columns.contains).mkString(",")}")
    require(keyCols.forall(deleteKeys.columns.contains),
      s"merge: deleteKeys lack key column(s) ${keyCols.filterNot(deleteKeys.columns.contains).mkString(",")}")
    enforceConstraints(path, updates, "merge")
    val up = updates.localCheckpoint(true)
    val del = deleteKeys.select(keyCols.map(col): _*).distinct().localCheckpoint(true)
    val upRows = up.count()
    val upKeys = up.select(keyCols.map(col): _*).distinct()
    require(upRows == upKeys.count(),
      s"merge: updates hold duplicate rows for key (${keyCols.mkString(",")})")
    require(upKeys.join(del, keyCols, "left_semi").isEmpty,
      "merge: a key appears in BOTH updates and deleteKeys — ambiguous")
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      val base = latestVersion(path).getOrElse(
        throw new IllegalArgumentException(s"$path is not a versioned table"))
      val files = filesOf(path, base)
      val absOf = files.map(f => resolve(path, f))
      val baseReader = schemaOf(path, base).map(spark.read.schema).getOrElse(spark.read)
      // A no-op merge may still need to COMMIT: when a txn stamp is
      // provided, the caller (AggView.refresh) relies on the stamp
      // advancing to mark the source range as applied — returning
      // `base` would re-derive the same delta every call and break
      // once the source log entries in (synced, tip] are vacuumed.
      // Only skip the commit when there is no stamp to record.
      if (absOf.isEmpty && upRows == 0L && txn.isEmpty) return base
      val snap = (if (absOf.isEmpty) up.limit(0) else baseReader.parquet(absOf: _*))
        .withColumn("_file", input_file_name())
      val baseSchema = snap.drop("_file").schema
      baseSchema.fields.foreach { b =>
        require(up.columns.contains(b.name),
          s"merge: updates lack existing column '${b.name}' — partial-column merges are not supported")
        require(up.schema(b.name).dataType == b.dataType,
          s"merge: column '${b.name}' type mismatch with committed schema")
      }
      val touchedKeys = upKeys.unionByName(del).distinct()
      val touchedAbs = snap
        .join(touchedKeys, keyCols, "left_semi")
        .select("_file").distinct().collect().map(_.getString(0)).toSet
      val touchedPaths = touchedAbs.map(a =>
        try new java.net.URI(a).getPath catch { case _: Exception => a })
      def isTouched(rel: String) = touchedPaths.exists(p =>
        p == rel || p.endsWith("/" + rel))
      val carried = files.filterNot(isTouched)
      val rewritten = snap
        .filter(col("_file").isin(touchedAbs.toSeq: _*))
        .drop("_file")
        .join(touchedKeys, keyCols, "left_anti")
        .select(baseSchema.fieldNames.map(col).toSeq: _*)
        .unionByName(up.select(baseSchema.fieldNames.map(col).toSeq: _*))
      val newFiles =
        if (touchedAbs.isEmpty && upRows == 0L) Seq.empty
        else writeBatch(rewritten, path)
      if (tryCommit(path, base + 1, (carried ++ newFiles).sorted,
          schemaJson = Some(baseSchema.json), txn = txn)) {
        recordStats(spark, path, newFiles)
        return base + 1
      }
    }
    throw new IllegalStateException(s"merge lost $maxRetries commit races on $path")
  }

  /** sink_delete — remove every row matching `keys` (the GDPR /
    * right-to-be-forgotten verb a lakehouse cannot ship without):
    * copy-on-write at FILE grain — only files holding a matching key
    * rewrite, everything else carries by reference, old snapshots
    * stay readable until vacuum. One CAS commit like any other. */
  def delete(spark: SparkSession, path: String, keyCols: Seq[String],
             keys: DataFrame, maxRetries: Int = 10): Long = {
    val schema = read(spark, path).schema
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    merge(spark, path, keyCols, empty, keys, txn = None, maxRetries = maxRetries)
  }
}
